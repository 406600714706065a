"""Hierarchical rollup — multi-resolution continuous aggregates.

Computes the same aggregate at a cascade of widening intervals
(e.g. 1h → 6h → 1d), re-aggregating PARTIAL aggregates instead of
rescanning the raw table per level — the "continuous aggregate" /
hypertable-rollup pattern.

Scale design — structurally single-scan:

1. ONE scan + ONE shuffle computes the finest-level partials
   (count / DECIMAL sum / min / max per base bucket) — the only pass
   whose cost depends on raw volume;
2. each partial row explodes into its (interval, coarse-bucket) label
   for every requested level (k rows each, k = #levels, over an
   input already reduced a few-thousand-fold);
3. ONE more shuffle re-aggregates the exploded partials: SUM of
   SUMs, SUM of COUNTs, MIN of MINs, MAX of MAXes.

A naive per-level union would scan the raw table once per level
(Spark's exchange reuse across union branches is not guaranteed under
AQE); the explode makes the reuse structural — the plan cannot rescan.

Correctness of re-aggregation relies on the partials being
decomposable; sums are carried as DECIMAL so re-association is exact
(float sums would drift between a cascaded and a direct computation).
AVG is derived at the end as sum/count in double.

Each level's interval must be an integer multiple of the base
interval, so every fine bucket nests inside exactly one coarse bucket.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from loudml_spark import errors


def _floor_to(col: str, step: int) -> str:
    """SQL for negative-safe integer floor of `col` to multiples of
    ``step`` (see operators/bucketize.py — `/` would round through
    double, inexact above 2^53)."""
    return f"((`{col}` - pmod(`{col}`, {step}L)) div {step}L) * {step}L"


def rollup_partials(
    df: DataFrame,
    *,
    value_col: str,
    interval: int,
    ts_col: str = "ts",
    ts_scale: int = 1,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Decomposable partial aggregates per bucket — the persisted
    state of an incrementally-maintained rollup: ``group_by…``,
    ``bucket_ts`` (epoch seconds), ``n``, ``sum_dec`` (DECIMAL,
    exact), ``min_value``, ``max_value``."""
    if interval <= 0:
        raise errors.Invalid("interval must be positive")
    if ts_col not in df.columns:
        raise errors.Invalid(f"missing column {ts_col!r}")
    step = interval * ts_scale
    bucket = F.expr(
        f"({_floor_to(ts_col, step)}) div {ts_scale}L"
    ).cast("long")
    return (
        df.withColumn("bucket_ts", bucket)
        .groupBy(*group_by, "bucket_ts")
        .agg(
            F.count(value_col).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_dec"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def rollup_merge(
    *partials: DataFrame,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Merge partial-aggregate frames (``rollup_partials`` schema)
    into one — the incremental-refresh step: when a new raw partition
    lands, roll up ONLY its rows and merge with the stored partials
    instead of rescanning history.  Exact by construction (DECIMAL
    sums re-associate losslessly); unit tests pin
    ``merge(partials(A), partials(B)) == partials(A ∪ B)``."""
    if not partials:
        raise errors.Invalid("nothing to merge")
    unioned = partials[0]
    for p in partials[1:]:
        unioned = unioned.unionByName(p)
    return (
        unioned.groupBy(*group_by, "bucket_ts")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def rollup_cascade(
    df: DataFrame,
    *,
    value_col: str,
    intervals: Sequence[int],
    ts_col: str = "ts",
    ts_scale: int = 1,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Cascaded rollup of ``value_col`` at each interval in
    ``intervals`` (seconds, ascending, each a multiple of the first).

    ``ts_col`` holds integer time in units of ``1/ts_scale`` seconds
    (pass ``ts_scale=10**9`` for nanoseconds).  Returns one row per
    (interval, bucket) — columns ``interval_s``, ``bucket_ts``
    (epoch seconds, left edge), ``group_by…``, ``n``, ``sum_value``,
    ``min_value``, ``max_value``, ``avg_value``.  Buckets with no
    rows don't appear (rollups compress; spines are bucketize's job).
    """
    intervals = list(intervals)
    if not intervals:
        raise errors.Invalid("need at least one interval")
    if sorted(intervals) != intervals or len(set(intervals)) != len(intervals):
        raise errors.Invalid("intervals must be strictly ascending")
    base_int = intervals[0]
    for iv in intervals[1:]:
        if iv % base_int:
            raise errors.Invalid(
                f"interval {iv} is not a multiple of {base_int}"
            )
    if ts_col not in df.columns:
        raise errors.Invalid(f"missing column {ts_col!r}")
    gb = list(group_by)

    step = base_int * ts_scale
    bucket0 = F.expr(
        f"({_floor_to(ts_col, step)}) div {ts_scale}L"
    ).cast("long")
    partials = (
        df.withColumn("__bucket", bucket0)
        .groupBy(*gb, "__bucket")
        .agg(
            F.count(value_col).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__sum"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    levels = F.array(*[
        F.struct(
            F.lit(iv).cast("long").alias("interval_s"),
            F.expr(_floor_to("__bucket", iv)).cast("long").alias("bucket_ts"),
        )
        for iv in intervals
    ])
    exploded = partials.select(
        F.explode(levels).alias("__lvl"),
        *gb, "n", "__sum", "min_value", "max_value",
    )
    out = (
        exploded.groupBy(
            F.col("__lvl.interval_s").alias("interval_s"),
            F.col("__lvl.bucket_ts").alias("bucket_ts"),
            *gb,
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("__sum").alias("__sum"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    return out.select(
        "interval_s", "bucket_ts", *gb, "n",
        F.col("__sum").cast("double").alias("sum_value"),
        "min_value", "max_value",
        (F.col("__sum").cast("double") / F.col("n")).alias("avg_value"),
    )
