"""Model-input windowing: span assembly, abnormal masks, chrono split.

Reference semantics:

* span windows (/root/reference/loudml/donut.py:945-987): the bucket
  series becomes overlapping rows ``[v_{i-W+1} … v_i]`` (stride 1)
  plus a boolean ``missing`` mask; only full windows are kept;
* prediction over ``[from, to)`` must read ``(W-1)`` extra buckets of
  history on the left (donut.py:1210-1217) — widen the scan range
  before calling this;
* abnormal windows ``[[start, end]]`` mask buckets during training
  (donut.py:170-178);
* train/test split is **chronological** at ``round(n·train_size)``,
  not random (donut.py:989-997).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NAN = float("nan")


def span_windows(
    df: DataFrame,
    span: int,
    value_col: str,
    *,
    ts_col: str = "bucket_ts",
    key_cols: Sequence[str] | None = None,
    window_col: str = "window",
    missing_col: str = "missing",
) -> DataFrame:
    """Attach ``window: array<double>`` (missing = NaN) and
    ``missing: array<boolean>`` columns; rows with incomplete history
    are dropped (size < span)."""
    key_cols = list(key_cols or [])
    w = (
        Window.partitionBy(*key_cols).orderBy(ts_col)
        .rowsBetween(-(span - 1), 0)
        if key_cols
        else Window.orderBy(ts_col).rowsBetween(-(span - 1), 0)
    )
    # collect_list skips nulls, which would silently shrink windows —
    # encode missing as NaN first so position is preserved
    val = F.coalesce(F.col(value_col), F.lit(NAN))
    out = (
        df.withColumn(window_col, F.collect_list(val).over(w))
        .withColumn(
            missing_col,
            F.transform(F.col(window_col), lambda v: F.isnan(v)),
        )
        .filter(F.size(window_col) == span)
    )
    return out


def mask_abnormal(
    df: DataFrame,
    windows: Sequence[Sequence[float]],
    *,
    ts_col: str = "bucket_ts",
    out_col: str = "abnormal",
) -> DataFrame:
    """Boolean column: bucket ts falls inside any [start, end] window
    (inclusive, matching _format_windows donut.py:170-178)."""
    cond = F.lit(False)
    for start, end in windows:
        cond = cond | (
            (F.col(ts_col) >= F.lit(float(start)))
            & (F.col(ts_col) <= F.lit(float(end)))
        )
    return df.withColumn(out_col, cond)


def chrono_split(
    df: DataFrame,
    train_size: float = 0.67,
    *,
    ts_col: str = "bucket_ts",
) -> tuple[DataFrame, DataFrame]:
    """Chronological train/test split at round(n·train_size)."""
    n = df.count()
    k = round(n * train_size)
    w = Window.orderBy(ts_col)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    train = ranked.filter(F.col("__rn") <= k).drop("__rn")
    test = ranked.filter(F.col("__rn") > k).drop("__rn")
    return train, test
