"""loudml_spark — a PySpark-native time-series analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
regel/loudml (time-series feature aggregation, anomaly detection,
forecasting, streaming evaluation) expressed as Spark DataFrame plans,
plus large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Design notes
------------
The reference (``/root/reference``) pushes every query down to an
external TSDB as a vendor query string and merges per-feature result
streams in NumPy.  Here Spark plays both roles: the store *and* the
aggregation engine.  Every operator is declared through the DataFrame /
SQL API so Catalyst handles predicate pushdown, column pruning and join
selection; Python-side work is confined to plan construction and
(rarely) Arrow-vectorized pandas UDFs.
"""

__version__ = "0.2.0"

from loudml_spark.features import Feature, parse_expression  # noqa: F401
from loudml_spark.operators.bucketize import bucketize  # noqa: F401


def __getattr__(name):
    # lazy heavyweight surface (avoid importing the ml/server stacks
    # for users who only bucketize)
    if name == "Engine":
        from loudml_spark.api import Engine

        return Engine
    raise AttributeError(name)
