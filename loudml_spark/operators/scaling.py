"""Per-feature scaling modes (SURVEY §2.6).

The reference declares ``scores: min_max | normalize | standardize``
per feature (loudml/model.py:97,129) and z-scales model inputs with
train-window statistics (donut.py:612-650).  Here each mode is a
column transform whose statistics come from a *fitting frame* (the
training range) so inference scaling is consistent — the stats ride
along as literals (no re-aggregation of the scored frame).

std=0 → 1.0 and max==min → span 1.0 follow the reference's
div-by-zero conventions (donut.py:650).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loudml_spark import errors

MODES = ("min_max", "normalize", "standardize")


def fit_scaler(fit_df: DataFrame, col: str, mode: str) -> dict:
    """Compute scaling stats over the fitting (training) frame."""
    if mode not in MODES:
        raise errors.Invalid(f"invalid scaling mode: {mode}")
    row = fit_df.agg(
        F.min(col).alias("mn"), F.max(col).alias("mx"),
        F.avg(col).alias("mean"),
        F.coalesce(F.stddev_pop(col), F.lit(0.0)).alias("std"),
        F.sqrt(F.avg(F.col(col) * F.col(col))).alias("rms"),
    ).collect()[0]
    std = row["std"] if row["std"] and row["std"] > 0 else 1.0
    span = (row["mx"] - row["mn"]) if row["mx"] is not None else None
    if not span:
        span = 1.0
    rms = row["rms"] if row["rms"] else 1.0
    return {
        "mode": mode, "min": row["mn"], "max": row["mx"], "span": span,
        "mean": row["mean"], "std": std, "rms": rms,
    }


def scale_col(col: Column, stats: dict) -> Column:
    mode = stats["mode"]
    if mode == "min_max":
        return (col - F.lit(stats["min"])) / F.lit(stats["span"])
    if mode == "normalize":
        return col / F.lit(stats["rms"])
    return (col - F.lit(stats["mean"])) / F.lit(stats["std"])


def unscale_col(col: Column, stats: dict) -> Column:
    mode = stats["mode"]
    if mode == "min_max":
        return col * F.lit(stats["span"]) + F.lit(stats["min"])
    if mode == "normalize":
        return col * F.lit(stats["rms"])
    return col * F.lit(stats["std"]) + F.lit(stats["mean"])


def apply_scaling(df: DataFrame, fit_df: DataFrame, col: str, mode: str,
                  out_col: str | None = None) -> tuple[DataFrame, dict]:
    """Scale ``col`` using stats fitted on ``fit_df``; returns the
    frame and the stats (persist them with the model state)."""
    stats = fit_scaler(fit_df, col, mode)
    return df.withColumn(out_col or col, scale_col(F.col(col), stats)), stats
