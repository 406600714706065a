"""Irregular-sample time-series operators — no bucket grid required.

The bucketize family assumes a fixed interval grid (the reference's
only mode, /root/reference/loudml/bucket.py:157-194 get_times_data).
These three work directly on raw, unevenly spaced samples:

* ``time_weighted_avg`` — trapezoidal mean over the actual sample
  spacing: with a 1 s sample next to an hour-long gap, the plain AVG
  overweights the burst; TWA weights each value by the time it was
  "in effect".  InfluxDB/TimescaleDB expose this as
  ``time_weight('Linear')`` — standard TSDB surface.
* ``gap_report`` — heartbeat monitoring: intervals between
  consecutive samples exceeding a threshold, i.e. the downtime
  windows (the inverse of sessionize: sessions are where the gaps
  are NOT).
* ``trailing_count_range`` — per-event trailing counts/sums over a
  true RANGE frame (``rangeBetween``): "how many events from this
  key in the preceding N seconds, at every event" — the sliding
  rate-limit / burst-detection primitive.  A rows-frame cannot
  express this on irregular data.

Scale: each is ONE shuffle on ``by`` plus window passes sharing that
partitioning.  All are raw-sample ops — per-key timelines must fit a
partition's working set ordering (the same contract as sessionize);
key on the series identity, not on nothing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from loudml_spark import errors


def _need(df: DataFrame, *cols: str) -> None:
    for c in cols:
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")


def time_weighted_avg(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    by: Sequence[str] = (),
    order_col: str | None = None,
) -> DataFrame:
    """Trapezoidal time-weighted average per key:
    ``Σ (v_i + v_{i+1})/2 · (t_{i+1} − t_i)  /  (t_last − t_first)``.
    Output: (by…, twa, t_first, t_last, n_samples); keys whose span
    is zero (a single sample, or all samples at one instant) get a
    null ``twa``.  ``order_col`` breaks timestamp ties
    deterministically."""
    _need(df, ts_col, value_col, *by)
    by = list(by)
    order = [ts_col] + ([order_col] if order_col else [])
    w = (Window.partitionBy(*by).orderBy(*order) if by
         else Window.orderBy(*order))
    t, v = F.col(ts_col), F.col(value_col)
    pt, pv = F.lag(t).over(w), F.lag(v).over(w)
    seg = F.when(
        pt.isNotNull(),
        (pv + v) / F.lit(2.0) * (t - pt).cast("double"),
    )
    stepped = df.select(*by, t.alias("__t"), seg.alias("__seg"))
    agg = stepped.groupBy(*by).agg(
        F.sum("__seg").alias("__area"),
        F.min("__t").alias("t_first"),
        F.max("__t").alias("t_last"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    span = (F.col("t_last") - F.col("t_first")).cast("double")
    return agg.select(
        *by,
        F.when(span > 0, F.col("__area") / span).alias("twa"),
        "t_first", "t_last", "n_samples",
    )


def gap_report(
    df: DataFrame,
    *,
    ts_col: str,
    threshold,
    by: Sequence[str] = (),
) -> DataFrame:
    """Heartbeat gaps: one row per pair of consecutive samples whose
    spacing exceeds ``threshold`` (same units as ``ts_col``) —
    (by…, gap_start, gap_end, gap).  Leading/trailing silence has no
    bracketing pair and is the caller's range-edge concern."""
    _need(df, ts_col, *by)
    if threshold is None or threshold <= 0:
        raise errors.Invalid("threshold must be a positive duration")
    by = list(by)
    w = (Window.partitionBy(*by).orderBy(ts_col) if by
         else Window.orderBy(ts_col))
    t = F.col(ts_col)
    prev = F.lag(t).over(w)
    return (
        df.select(*by, prev.alias("gap_start"), t.alias("gap_end"))
        .withColumn("gap", F.col("gap_end") - F.col("gap_start"))
        .filter(F.col("gap") > F.lit(threshold))
    )


def trailing_count_range(
    df: DataFrame,
    *,
    ts_col: str,
    range_width,
    by: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Per-event trailing aggregates over a RANGE frame: for every
    row, the count (and DECIMAL-exact sum of ``value_col`` if given)
    of the key's events with ``ts ∈ [t − range_width, t]`` — a true
    range frame, so simultaneous events all see the same window
    regardless of row order (deterministic under ties by
    construction).  The burst-detection / rate-limit primitive."""
    _need(df, ts_col, *by)
    if range_width is None or range_width <= 0:
        raise errors.Invalid("range_width must be a positive duration")
    by = list(by)
    w = (
        (Window.partitionBy(*by) if by else Window.partitionBy())
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-int(range_width), 0)
    )
    out = df.withColumn("trailing_n", F.count(F.lit(1)).over(w))
    if value_col is not None:
        _need(df, value_col)
        out = out.withColumn(
            "trailing_sum",
            F.sum(F.col(value_col).cast("decimal(18,2)")).over(w)
            .cast("double"),
        )
    return out
