"""Binned range (interval) join — point-in-interval matching without
a nested-loop join.

Joins a "points" side (one time column) against an "intervals" side
(``[start, end)`` columns): each output row is a (point, interval)
pair with ``start <= point < end`` and equal ``by`` keys.  Spark has
no native range-join strategy — a raw theta-join
(``ev.ts >= w.start AND ev.ts < w.end``) plans as
BroadcastNestedLoopJoin, O(|L|·|R|) at scale.

Scale design — the classic *binning* rewrite:

1. pick a ``bin_width`` (ideally close to the typical interval
   length); every point belongs to exactly ONE bin
   (``floor(ts / bin)``);
2. explode each interval into the bins it overlaps
   (``sequence(floor(start/bin), floor(end/bin))``) — for intervals
   about one bin wide this is 1–2 rows each;
3. hash equi-join on ``(by…, bin)`` — shuffle or broadcast, Catalyst
   and AQE choose — then re-check the exact predicate to drop
   false bin-neighbors.

Each qualifying pair appears exactly once (the point's single bin
meets that interval's single matching bin-row), so no dedup pass is
needed.  Cost: |L| + |R|·(avg_len/bin + 1) shuffled rows instead of
the |L|·|R| comparisons of a nested loop.  The amplification factor
is ``interval_len / bin_width`` — callers with wildly varying
interval lengths should bin at the median length and accept a few
extra rows from the long tail.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from loudml_spark import errors


def _bin_of(df: DataFrame, col: str, bin_width) -> Column:
    """Floor-division bin index.  Integer time columns use pure
    integer arithmetic — ``/`` goes through double, which cannot
    represent ns epochs (~1.7e18 > 2^53) exactly; pmod-adjusted so
    pre-1970 epochs floor to their LEFT bin like the double path."""
    if isinstance(df.schema[col].dataType, (T.LongType, T.IntegerType)) \
            and float(bin_width).is_integer():
        b = int(bin_width)
        return F.expr(f"(`{col}` - pmod(`{col}`, {b}L)) div {b}L")
    return F.floor(F.col(col) / F.lit(bin_width))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: Sequence[str] = (),
    bin_width,
    suffix: str = "_right",
) -> DataFrame:
    """Inner join of ``points`` to every interval containing them:
    ``intervals.start <= points[on] < intervals.end`` (and equal
    ``by`` keys).  ``bin_width`` is in the units of the time columns.

    Returns all point columns plus the interval's columns (minus its
    ``by`` duplicates); interval columns whose names clash with a
    point column get ``suffix`` (same convention as asof_join), so
    the output never carries ambiguous duplicates.
    """
    by = list(by)
    for col in (on, *by):
        if col not in points.columns:
            raise errors.Invalid(f"points side is missing column {col!r}")
    for col in (start_col, end_col, *by):
        if col not in intervals.columns:
            raise errors.Invalid(
                f"intervals side is missing column {col!r}")
    if bin_width is None or bin_width <= 0:
        raise errors.Invalid("bin_width must be a positive duration")

    # de-clash interval-side payload BEFORE the join: shared non-key
    # names (e.g. both sides carrying `value`) would otherwise make
    # downstream F.col(...) references ambiguous at analysis time
    rename = {
        c: c + suffix
        for c in intervals.columns
        if c not in by and c in points.columns
    }
    if rename:
        intervals = intervals.withColumnsRenamed(rename)
        start_col = rename.get(start_col, start_col)
        end_col = rename.get(end_col, end_col)
        if set(rename.values()) & set(points.columns):
            raise errors.Invalid(
                f"suffix {suffix!r} does not resolve the column "
                f"clash: {sorted(set(rename.values()) & set(points.columns))}")

    p = points.withColumn("__bin", _bin_of(points, on, bin_width))
    # floor(end/bin) may add one trailing bin when `end` sits exactly
    # on a bin edge (half-open interval owns nothing there) — the
    # exact re-check below discards any false neighbors, so favoring
    # one spurious row per interval keeps the bin math type-agnostic
    # (ints and floats alike).
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin_of(intervals, start_col, bin_width),
                _bin_of(intervals, end_col, bin_width),
            )
        ),
    )
    joined = p.join(iv, [*by, "__bin"]).filter(
        (F.col(on) >= F.col(start_col)) & (F.col(on) < F.col(end_col))
    )
    return joined.drop("__bin")
