"""Anomaly scoring — pure Spark column math (JVM-side, codegen'd).

Semantics match the reference's compute_bucket_scores
(/root/reference/loudml/donut.py:899-924):

* ``mu = (lower + upper) / 2``, ``std = (upper - mu) / 3`` — the band
  is a ±3σ envelope;
* raw score = ``2·Φ(|observed − mu| / std) − 1`` ∈ [0, 1];
* sign flips when ``observed < predicted``; the per-feature
  ``anomaly_type`` (low / high / low_high) keeps only deviations in
  the direction of interest;
* final score = ``100 · clip(score, 0, 1)``.

Φ is the standard normal CDF.  Spark has no erf builtin and scipy is
not a dependency, so Φ uses the Abramowitz-Stegun 7.1.26 polynomial
(max abs error 1.5e-7 — invisible at score resolution) expressed as
Column arithmetic: the whole scoring pipeline stays inside
whole-stage codegen, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loudml_spark import errors

_A1, _A2, _A3, _A4, _A5 = (
    0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_P = 0.3275911
_SQRT2 = 2.0 ** 0.5


def erf_col(x: Column) -> Column:
    """Abramowitz-Stegun 7.1.26 erf approximation (|err| ≤ 1.5e-7)."""
    sign = F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_P) * ax)
    poly = (
        F.lit(_A1) * t
        + F.lit(_A2) * t * t
        + F.lit(_A3) * t * t * t
        + F.lit(_A4) * t * t * t * t
        + F.lit(_A5) * t * t * t * t * t
    )
    y = F.lit(1.0) - poly * F.exp(-ax * ax)
    return sign * y


def normal_cdf_col(x: Column) -> Column:
    """Standard normal CDF Φ(x)."""
    return F.lit(0.5) * (F.lit(1.0) + erf_col(x / F.lit(_SQRT2)))


def score_col(
    observed: Column,
    predicted: Column,
    lower: Column,
    upper: Column,
    anomaly_type: str = "low_high",
) -> Column:
    """Anomaly score 0-100 per bucket (donut.py:899-924 semantics)."""
    if anomaly_type not in ("low", "high", "low_high"):
        raise errors.Invalid(f"invalid anomaly_type: {anomaly_type}")
    mu = (lower + upper) / F.lit(2.0)
    # std=0 → 1.0 to avoid div-by-zero (donut.py:650 convention)
    std_raw = (upper - mu) / F.lit(3.0)
    std = F.when(std_raw == 0, F.lit(1.0)).otherwise(std_raw)
    raw = F.lit(2.0) * normal_cdf_col(F.abs(observed - mu) / std) - F.lit(1.0)
    signed = F.when(observed - predicted < 0, -raw).otherwise(raw)
    if anomaly_type == "low":
        directional = -F.least(signed, F.lit(0.0))
    elif anomaly_type == "high":
        directional = F.greatest(signed, F.lit(0.0))
    else:
        directional = F.abs(signed)
    return F.lit(100.0) * F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), directional)
    )


def with_scores(
    df: DataFrame,
    observed: str = "observed",
    predicted: str = "predicted",
    lower: str = "lower",
    upper: str = "upper",
    anomaly_type: str = "low_high",
    out_col: str = "score",
    mse_col_name: str | None = "mse",
) -> DataFrame:
    """Attach score (and per-bucket squared error) columns."""
    out = df.withColumn(
        out_col,
        score_col(
            F.col(observed), F.col(predicted),
            F.col(lower), F.col(upper), anomaly_type,
        ),
    )
    if mse_col_name:
        out = out.withColumn(
            mse_col_name, F.pow(F.col(observed) - F.col(predicted), 2)
        )
    return out
