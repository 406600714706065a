from loudml_spark.functions.metrics import (  # noqa: F401
    METRICS,
    is_supported_metric,
    normalize_metric,
)
