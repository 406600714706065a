"""KMV (k-minimum-values) distinct-count sketch with a portable,
engine-exact estimator.

Complements the HLL anchor (catalog_ext.q_approx_distinct_users_daily):
Spark's HLL++ and DuckDB's HLL cannot produce the same raw estimate,
so that anchor can only value-match an error-bound verdict.  KMV
(Bar-Yossef et al., RANDOM 2002; Beyer et al., SIGMOD 2007 "distinct
sampling") is different — the estimate is a DETERMINISTIC function of
a portable hash (md5 → 60-bit integer), so the estimator itself
cross-checks bit-for-bit against an independent SQL reconstruction:

    E[distinct] = (k - 1) * 2^60 / h_(k)      (h_(k) = k-th smallest
                                               distinct hash value)

Scale note: production KMV is a bounded-memory mergeable aggregate
(keep the k smallest hashes per partition, merge by re-sorting 2k
values); Spark exposes that shape via ``approx_count_distinct``
(HLL++) rather than a user-pluggable KMV aggregate, so this operator
ranks distinct hashes with ONE shuffle + per-group window — the same
cost class as exact COUNT(DISTINCT), which the output carries anyway
for the relative-error column.  Its catalog role is proving the
estimator math; the 100 TB sketch path remains approx_count_distinct
(see SCALE.md "exact vs sketch").
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from loudml_spark import errors

_HASH_BITS = 60                     # 15 hex chars of md5
_HASH_SPAN = float(1 << _HASH_BITS)


def kmv_hash(col: Column) -> Column:
    """Portable 60-bit uniform hash: the first 15 hex chars of
    md5(string(col)) as an int64.  Both Spark and DuckDB produce the
    identical lowercase-hex md5 for the identical string, so the
    hash — unlike xxhash64 — reconstructs exactly in the oracle."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_distinct(
    df: DataFrame,
    *,
    key_col: str,
    by: Sequence[str],
    k: int = 32,
    round_to: int = 6,
) -> DataFrame:
    """Per-group KMV distinct-count estimate next to the exact count.

    Output: (*by, n_exact, kth_hash, est_kmv, rel_err) — kth_hash is
    NULL and est_kmv equals the exact count when a group has fewer
    than k distinct keys (the standard KMV small-set rule: with the
    whole hash set in hand, report its size).
    """
    by = list(by)
    if not by:
        raise errors.Invalid("kmv_distinct needs at least one group col")
    if k < 2:
        raise errors.Invalid(f"k must be >= 2, got {k}")
    for c in [key_col, *by]:
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")

    hashes = (
        df.select(*by, kmv_hash(F.col(key_col)).alias("__h"))
        .where(F.col("__h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*by).orderBy("__h")
    ranked = hashes.withColumn("__rn", F.row_number().over(w))
    per_group = ranked.groupBy(*by).agg(
        F.count("*").alias("n_exact"),
        F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("kth_hash"),
    )
    # (k-1) * 2^60 exceeds int64 — route through an exact double
    # literal (mantissa k-1, exponent 60: exactly representable)
    numer = F.lit(float(k - 1)) * F.lit(_HASH_SPAN)
    est = F.when(
        F.col("n_exact") < k, F.col("n_exact").cast("double")
    ).otherwise(numer / F.col("kth_hash").cast("double"))
    return per_group.select(
        *by,
        "n_exact",
        "kth_hash",
        F.round(est, round_to).alias("est_kmv"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"),
                round_to).alias("rel_err"),
    )


def sql_kmv_hash(expr: str) -> str:
    """DuckDB reconstruction of :func:`kmv_hash` — unrolled hex→int
    over the 15 md5 chars (DuckDB has no conv())."""
    digits = " + ".join(
        f"(strpos('0123456789abcdef', "
        f"substr(md5(CAST({expr} AS VARCHAR)), {i + 1}, 1)) - 1) "
        f"* {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"CAST({digits} AS BIGINT)"
