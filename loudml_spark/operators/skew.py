"""Skew mitigation — salted joins and two-phase aggregation.

A hash shuffle sends every row of a hot key to ONE reducer: a key
holding 10% of a 100 TB table serializes 10 TB through a single task.
AQE's skew-join handling splits oversized partitions at runtime and
is the first line of defense (bench enables it); these operators are
the *declarative* fallback for the cases AQE cannot rewrite —
skewed aggregations (AQE never splits a hash-aggregate's partition)
and joins whose skew survives AQE's post-shuffle granularity.

* ``salted_agg`` — two-phase aggregation: phase 1 groups on
  ``(keys…, salt)`` where the salt spreads each hot key over
  ``n_salt`` reducers; phase 2 re-aggregates the ≤ ``n_salt``
  partials per key.  Only decomposable aggregates qualify (sum,
  count, min, max — the same algebra the rollup cascade relies on).
* ``salted_join`` — the left (big, skewed) side gets a deterministic
  per-row salt in [0, n_salt); the right side replicates each row
  ``n_salt`` times; the equi-join on ``(key…, salt)`` then spreads
  each hot key's rows over ``n_salt`` reducers.  Right-side row
  count multiplies by ``n_salt`` — use for dimension-sized right
  sides when the optimizer chose a shuffle join (broadcast already
  immune to skew).

Results are bit-identical to the unsalted operation (oracle-verified
in the catalog); only the shuffle layout changes.

The salt must be DETERMINISTIC per row (here: a hash of a caller
named column) — ``rand()``/``monotonically_increasing_id`` change
under task retries and recomputation, silently corrupting results.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loudml_spark import errors


def _salt_col(col: str, n_salt: int) -> Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_salt))


def salted_agg(
    df: DataFrame,
    *,
    keys: Sequence[str],
    salt_on: str,
    n_salt: int,
    sums: Sequence[str] = (),
    counts: bool = True,
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
) -> DataFrame:
    """Two-phase skew-safe aggregation over ``keys``: per key,
    ``n`` (when ``counts``), ``sum_<c>``, ``min_<c>``, ``max_<c>``.
    ``salt_on`` names the column whose hash spreads rows (any
    high-cardinality column — an id, a timestamp)."""
    keys = list(keys)
    if n_salt < 2:
        raise errors.Invalid("n_salt must be >= 2")
    for col in (*keys, salt_on, *sums, *mins, *maxs):
        if col not in df.columns:
            raise errors.Invalid(f"missing column {col!r}")
    p_aggs, f_aggs = [], []
    if counts:
        p_aggs.append(F.count("*").alias("__n"))
        f_aggs.append(F.sum("__n").alias("n"))
    for c in sums:
        p_aggs.append(F.sum(c).alias(f"__sum_{c}"))
        f_aggs.append(F.sum(f"__sum_{c}").alias(f"sum_{c}"))
    for c in mins:
        p_aggs.append(F.min(c).alias(f"__min_{c}"))
        f_aggs.append(F.min(f"__min_{c}").alias(f"min_{c}"))
    for c in maxs:
        p_aggs.append(F.max(c).alias(f"__max_{c}"))
        f_aggs.append(F.max(f"__max_{c}").alias(f"max_{c}"))
    if not p_aggs:
        raise errors.Invalid("no aggregates requested")
    partial = (
        df.withColumn("__salt", _salt_col(salt_on, n_salt))
        .groupBy(*keys, "__salt")
        .agg(*p_aggs)
    )
    return partial.groupBy(*keys).agg(*f_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    salt_on: str,
    n_salt: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``n_salt``
    reducers; the right side is replicated ``n_salt`` times.  Output
    is row-identical to ``left.join(right, on, how)``.  ``salt_on``
    names a LEFT column whose hash assigns the salt."""
    on = list(on)
    if n_salt < 2:
        raise errors.Invalid("n_salt must be >= 2")
    if salt_on not in left.columns:
        raise errors.Invalid(f"left side is missing column {salt_on!r}")
    if how not in ("inner", "left"):
        raise errors.Invalid(
            "salted_join supports inner/left joins (right/full would "
            "duplicate unmatched right rows across salts)")
    lf = left.withColumn("__salt", _salt_col(salt_on, n_salt))
    rt = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast(
            "array<long>")),
    )
    return lf.join(rt, [*on, "__salt"], how).drop("__salt")
