from loudml_spark.ml.scoring import with_scores, normal_cdf_col  # noqa: F401
from loudml_spark.ml.detect import detect_anomalies, anomaly_windows  # noqa: F401
