"""Equal-width value histograms — distribution profiling.

The standard data-profiling primitive (quality dashboards, drift
detection between dataset snapshots): bin a numeric column into
fixed-width buckets and count per (group, bin).  One shuffle with
map-side partial aggregation; output is |groups|·|bins| rows however
large the input.  Bin labels are the bucket's LEFT edge, computed by
the same negative-safe integer-style floor used everywhere in this
repo so edges are engine-exact for integer-scaled data.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from loudml_spark import errors


def psi(
    expected: DataFrame,
    actual: DataFrame,
    *,
    by: Sequence[str] = (),
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two histogram frames
    (outputs of :func:`histogram` with the same binning):
    ``Σ (p_a − p_e) · ln(p_a / p_e)`` per ``by`` group — the standard
    dataset-drift score (rule of thumb: <0.1 stable, >0.25 shifted).

    Bins present in one side only get probability ``eps`` (the
    conventional smoothing), via a full-outer join on (by…, bin); a
    GROUP present in one side only (a category born or vanished
    between snapshots — maximal drift) keeps its rows, with the
    absent side's every probability at ``eps``, so it surfaces with
    a large PSI instead of silently disappearing.  All-Column math
    after small joins — inputs are already aggregated histograms, so
    cost is |groups|·|bins| regardless of the corpora the histograms
    came from.
    """
    by = list(by)
    for side, df in (("expected", expected), ("actual", actual)):
        for col in (*by, "bin", "n"):
            if col not in df.columns:
                raise errors.Invalid(
                    f"{side} side is missing column {col!r} "
                    "(pass histogram() outputs)")
    e = expected.withColumnRenamed("n", "__ne")
    a = actual.withColumnRenamed("n", "__na")
    if by:
        e_tot = expected.groupBy(*by).agg(F.sum("n").alias("__te"))
        a_tot = actual.groupBy(*by).agg(F.sum("n").alias("__ta"))
        joined = (
            e.join(a, [*by, "bin"], "full_outer")
            .join(e_tot, by, "left")
            .join(a_tot, by, "left")
        )
    else:
        # unkeyed: attach the scalar totals as literals (the inputs
        # are already-aggregated histograms, so the 1-row sums are
        # trivial) — a crossJoin here would plan as a
        # BroadcastNestedLoopJoin, tripping the repo's no-nested-loop
        # plan gate; same approach tf_idf uses for its doc-count
        te = expected.agg(F.sum("n")).first()[0]
        ta = actual.agg(F.sum("n")).first()[0]
        joined = (
            e.join(a, ["bin"], "full_outer")
            .withColumn("__te", F.lit(te).cast("double"))
            .withColumn("__ta", F.lit(ta).cast("double"))
        )
    pe = F.when(F.col("__te").isNull(), F.lit(eps)).otherwise(
        F.greatest(
            F.coalesce(F.col("__ne"), F.lit(0)) / F.col("__te"),
            F.lit(eps)))
    pa = F.when(F.col("__ta").isNull(), F.lit(eps)).otherwise(
        F.greatest(
            F.coalesce(F.col("__na"), F.lit(0)) / F.col("__ta"),
            F.lit(eps)))
    term = (pa - pe) * F.log(pa / pe)
    return (
        joined.groupBy(*by)
        .agg(F.sum(term).alias("psi"))
    )


def histogram(
    df: DataFrame,
    *,
    value_col: str,
    bin_width: float,
    by: Sequence[str] = (),
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Count rows per ``by`` group and ``bin`` (left edge, a multiple
    of ``bin_width``).  Rows outside ``[lo, hi)`` (when given) are
    clamped into the boundary bins so tails stay visible without
    unbounded bin cardinality.  Null values are dropped (they are a
    separate quality metric, not a bin)."""
    if bin_width <= 0:
        raise errors.Invalid("bin_width must be positive")
    if value_col not in df.columns:
        raise errors.Invalid(f"missing column {value_col!r}")
    by = list(by)
    v = F.col(value_col).cast("double")
    if lo is not None:
        v = F.greatest(v, F.lit(float(lo)))
    if hi is not None:
        # clamp to the LEFT EDGE of the last bin (the bin containing
        # values just below hi) — clamping to hi - width/2 misbins
        # in-range values whenever hi is not a multiple of bin_width
        w = float(bin_width)
        last_bin = math.floor(math.nextafter(float(hi), -math.inf) / w) * w
        if lo is not None:
            last_bin = max(last_bin, float(lo))
        v = F.least(v, F.lit(last_bin))
    bin_col = (F.floor(v / F.lit(float(bin_width)))
               * F.lit(float(bin_width)))
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("bin", bin_col)
        .groupBy(*by, "bin")
        .agg(F.count("*").alias("n"))
    )
