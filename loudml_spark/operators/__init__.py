from loudml_spark.operators.bucketize import bucketize  # noqa: F401
from loudml_spark.operators.align import align_features  # noqa: F401
from loudml_spark.operators.tsmath import (  # noqa: F401
    brown_forecast,
    changepoint_mean,
    conformal_naive,
    cross_correlation,
    forecast_backtest,
    holt_winters_forecast,
    naive_forecast,
    theil_sen,
    winsorize,
)
from loudml_spark.operators.funnel import survival_curve  # noqa: F401
from loudml_spark.operators.validate import validate  # noqa: F401
