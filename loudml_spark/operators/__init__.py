from loudml_spark.operators.bucketize import bucketize  # noqa: F401
from loudml_spark.operators.align import align_features  # noqa: F401
