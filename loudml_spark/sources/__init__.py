from loudml_spark.sources.base import (  # noqa: F401
    Bucket,
    BucketRegistry,
    load_bucket,
)
from loudml_spark.sources.tables import load_table, load_tables, TABLES  # noqa: F401
