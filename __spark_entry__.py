"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship bucketized multi-feature query at sf0.001.
queries()      — name → (spark, sf_dir) -> DataFrame, one per operator
                 implemented from SURVEY.md §2.
oracle_sql()   — name → DuckDB-runnable ANSI SQL equivalent.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from loudml_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: multi-feature
    bucketized aggregation with tag filters, fills and empty-bucket
    materialization — the reference's `POST /buckets/<n>/_read`."""
    return catalog.q_ts_multi_metric_6h(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """Data-derived oracles (IVF centroids) train from ``sf_dir``;
    the driver compares at sf0.01 (the default).  Callers comparing
    at another scale factor must pass the matching dir."""
    return catalog.oracle_sql(sf_dir)
