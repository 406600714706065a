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

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from loudml_spark import errors


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
        # hi itself belongs to the last bin (half-open range)
        v = F.least(v, F.lit(float(hi) - float(bin_width) / 2))
    bin_col = (F.floor(v / F.lit(float(bin_width)))
               * F.lit(float(bin_width)))
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("bin", bin_col)
        .groupBy(*by, "bin")
        .agg(F.count("*").alias("n"))
    )
