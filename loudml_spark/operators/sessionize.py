"""Gap-based sessionization — assign session ids to event streams.

A session is a maximal run of events (per key) where consecutive
events are no more than ``gap`` apart in the time column's own units.
The standard building block for clickstream / telemetry feature
pipelines ("events per visit", "session duration"), which the
reference's bucket model cannot express (fixed intervals only;
cf. /root/reference/loudml/misc.py time-bucket helpers).

Scale design: ONE shuffle on the ``by`` keys, then two window passes
over each key's ordered timeline —

1. ``lag(ts)`` marks rows whose gap from the previous event exceeds
   ``gap`` (or that start the key's timeline) as session starts;
2. a running sum of the start flags numbers sessions 1..n per key.

Session numbering is deterministic even under timestamp ties: equal
timestamps yield gap 0, so tied rows always land in the same session
regardless of their relative order, and exactly one first row per key
carries the initial start flag.

Without ``by`` the window is a single ordered partition — correct,
but pass keys at scale (per-key timelines parallelize; a global
timeline cannot).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from loudml_spark import errors


def sessionize(
    df: DataFrame,
    *,
    gap,
    ts_col: str = "ts",
    by: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Add ``session_col``: 1-based session index per ``by`` key,
    where a new session starts whenever the gap from the previous
    event (same key, ordered by ``ts_col``) exceeds ``gap`` (same
    units as ``ts_col``)."""
    by = list(by)
    for col in (ts_col, *by):
        if col not in df.columns:
            raise errors.Invalid(f"missing column {col!r}")
    if gap is None or gap <= 0:
        raise errors.Invalid("gap must be a positive duration")
    w_lag = (Window.partitionBy(*by).orderBy(ts_col) if by
             else Window.orderBy(ts_col))
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag(F.col(ts_col)).over(w_lag)
    is_start = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > F.lit(gap)), 1
    ).otherwise(0)
    return df.withColumn("__start", is_start).withColumn(
        session_col, F.sum("__start").over(w_run)
    ).drop("__start")


def session_stats_native(
    df: DataFrame,
    *,
    gap_seconds: int,
    ts_col: str = "ts",
    by: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Spark-native ``session_window`` variant of :func:`session_stats`
    — the streaming-compatible path (the same expression works under
    ``readStream`` + watermark, where the window-function formulation
    cannot run).

    Boundary semantics match :func:`sessionize` (verified by test):
    Spark merges a session window with an event landing EXACTLY at
    its end (``[ts, ts+gap]`` effectively closed), so ``diff > gap``
    splits in both formulations and both pair with the same oracle.

    ``ts_col`` must be a timestamp-typed column.  Returns ``by…``,
    ``session_start``/``session_end`` (epoch microseconds, min/max
    event time), ``n_events``, and ``sum_value`` when ``value_col``
    is given.
    """
    by = list(by)
    for col in (ts_col, *by):
        if col not in df.columns:
            raise errors.Invalid(f"missing column {col!r}")
    if gap_seconds is None or gap_seconds <= 0:
        raise errors.Invalid("gap_seconds must be a positive duration")
    from pyspark.sql import types as T

    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        # read the NTZ wall clock AS UTC under any session timezone
        # (a bare NTZ→TIMESTAMP cast shifts by the session offset)
        ts = F.expr(
            f"cast(convert_timezone('UTC', current_timezone(), "
            f"`{ts_col}`) as timestamp)"
        )
    else:
        ts = F.col(ts_col).cast("timestamp")
    us = F.unix_micros(ts)
    aggs = [
        F.min(us).alias("session_start"),
        F.max(us).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        df.groupBy(*by, F.session_window(ts, f"{gap_seconds} seconds"))
        .agg(*aggs)
        .drop("session_window")
    )


def session_stats(
    df: DataFrame,
    *,
    gap,
    ts_col: str = "ts",
    by: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Sessionize then collapse to one row per session: key columns,
    ``session_id``, ``session_start``/``session_end`` (min/max ts),
    ``duration`` (end − start), ``n_events``, and — when ``value_col``
    is given — ``sum_value``.

    The aggregate is invariant to tie order (bounds/count/sum over a
    set), so results are engine-deterministic even though row-level
    ordering under equal timestamps is not.
    """
    s = sessionize(df, gap=gap, ts_col=ts_col, by=by)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return s.groupBy(*by, "session_id").agg(*aggs)
