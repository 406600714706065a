"""Bucketed-table layout — co-located joins and aggregations.

Spark's hash bucketing (`bucketBy` + `saveAsTable`) persists a table
pre-partitioned by a key: every file holds one hash bucket of the
key, recorded in the catalog. A join or aggregation on that key then
needs NO shuffle — the scan itself satisfies the hash-partitioning
requirement, so the Exchange disappears from the plan (verified in
tests/test_bucketed.py).

At 100 TB this is the difference between re-shuffling the fact table
for every join in every job and paying the shuffle ONCE at write
time: land `events` bucketed by `user_id` and every subsequent
enrichment join, sessionization, or per-user aggregation reads
straight into the final stage.  Both sides of a join must be
bucketed by the same key into the same bucket count (or one side's
bucket count a divisor of the other's).

Rules of thumb for choosing ``n_buckets``:

* target 100–500 MB of data per bucket file per partition;
* match the cluster's parallelism (a multiple of executor cores);
* keep it STABLE — changing the bucket count forces a full rewrite
  before co-location returns.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from loudml_spark import errors


def save_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed table (catalog-managed): one hash
    bucket per file group on ``key``, optionally sorted within
    buckets (``sort_by`` — lets merge-style operators skip the sort
    too)."""
    key = list(key)
    if not key:
        raise errors.Invalid("need at least one bucketing key")
    if n_buckets < 1:
        raise errors.Invalid("n_buckets must be >= 1")
    w = df.write.format(format).mode(mode).bucketBy(n_buckets, *key)
    if sort_by:
        w = w.sortBy(*list(sort_by))
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; Catalyst knows the layout, so
    joins/aggs on the bucket key skip their Exchange."""
    return spark.table(table)
