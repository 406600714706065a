"""Fuzzy record linkage: edit-distance joins without a cartesian.

Entity resolution over dirty identifiers (names, titles, SKUs) needs
"join where levenshtein(a, b) <= d" — naively an all-pairs product.
The scale-correct formulation is symmetric-delete blocking (the
SymSpell dictionary trick, generalized to a join): explode every
string into its deletion neighborhood — all variants reachable by
deleting UP TO ``d`` characters — and equi-join on the variant.

Recall is exact, by an alignment argument: an optimal edit script of
cost k <= d has at most k mismatch columns; deleting the non-gap
characters of those columns from EACH string leaves the same common
subsequence.  So ed(a, b) <= d implies the <=d-deletion
neighborhoods intersect, and every true pair survives the equi-join.
Precision comes from re-verifying candidates with the real
``levenshtein`` (threshold form — early exit above ``d``).

Shape at 100 TB:

* neighborhood generation is pure Column HOF math (transform /
  flatten / array_distinct) — map-only, no UDF, stays in codegen.
  Row amplification is ~C(len, d): len+1 variants at d=1,
  ~len^2/2 at d=2.  Practical for short keys and d <= 2 (same
  envelope SymSpell documents).
* the only shuffle moves (id, xxhash64(variant)) pairs — 16 bytes a
  row, never the strings.  Hash collisions are harmless: the
  levenshtein verify filters them.
* a hot variant key means a genuinely dense cluster (sharing a
  variant proves ed(a, b) <= 2d via the triangle through the
  variant), so quadratic candidate blow-up only happens where the
  OUTPUT is quadratic.  ``max_variant_df`` optionally caps postings
  (documented recall trade, same knob as the PPJoin/containment
  ``max_df``).
* verification joins the (small) candidate-pair set back to the
  strings by id — two hash joins keyed on ids.

No reference counterpart (loudml has no string joins); this is
§2-EXT surface for training-data curation (author/domain/source
canonicalization before dedup grouping).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loudml_spark import errors

__all__ = ["deletion_neighborhood", "fuzzy_self_pairs", "fuzzy_join"]


def _delete_one(s: Column) -> Column:
    """All strings reachable by deleting exactly one char of ``s``
    (empty array for the empty string — sequence(1, 0) would count
    DOWN in Spark, so the guard is load-bearing)."""
    return F.when(F.length(s) == 0, F.array().cast("array<string>")) \
        .otherwise(F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                F.substring(s, F.lit(1), i - 1),
                s.substr(i + 1, F.length(s)))))


def deletion_neighborhood(s: Column, d: int) -> Column:
    """Distinct variants of ``s`` reachable by up to ``d`` deletions,
    including ``s`` itself.  Pure Column expression (no UDF)."""
    if d < 0:
        raise errors.Invalid(f"deletion distance must be >= 0, got {d}")
    if d > 3:
        raise errors.Invalid(
            f"deletion neighborhood of d={d} is ~C(len,{d}) variants "
            "per row; use d <= 3 (SymSpell envelope)")
    out = F.array(s)
    for _ in range(d):
        out = F.array_distinct(F.concat(
            out, F.flatten(F.transform(out, _delete_one))))
    return out


def _variant_index(
    df: DataFrame, id_col: str, text_col: str, d: int, max_len: int,
) -> DataFrame:
    """(id, vh) posting list: one row per (row, deletion variant),
    variants carried only as 8-byte xxhash64 keys.  A row longer
    than ``max_len`` fails the job loudly (assert_true) instead of
    silently exploding ~C(len, d) variants per row — symmetric-
    delete blocking is for short keys; near-dup DOCUMENTS belong to
    minhash_lsh_pairs."""
    for c in (id_col, text_col):
        if c not in df.columns:
            raise errors.Invalid(f"column {c!r} not in frame")
    s = F.col(text_col)
    guard = F.assert_true(
        s.isNull() | (F.length(s) <= max_len),
        F.concat(
            F.lit(f"fuzzy join key longer than max_len={max_len} "
                  "chars (deletion neighborhood is ~C(len,d) rows; "
                  "use minhash_lsh_pairs for long text): "),
            F.substring(s, 1, 40)))
    neigh = F.when(guard.isNull(), deletion_neighborhood(s, d))
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(neigh).alias("__v"),
    ).select("id", F.xxhash64("__v").alias("vh"))


def _df_cut(posting: DataFrame, max_variant_df: int | None) -> DataFrame:
    if max_variant_df is None:
        return posting
    if max_variant_df < 1:
        raise errors.Invalid("max_variant_df must be >= 1")
    keep = posting.groupBy("vh").agg(F.count("*").alias("__df")) \
        .filter(F.col("__df") <= max_variant_df).select("vh")
    return posting.join(keep, "vh")


def fuzzy_self_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_distance: int = 1,
    max_variant_df: int | None = None,
    max_len: int = 64,
) -> DataFrame:
    """All pairs (id_a < id_b) with edit distance <= ``max_distance``.

    Returns ``(id_a, id_b, distance)`` — exact recall (deletion
    pigeonhole), exact precision (levenshtein verify).  Keys longer
    than ``max_len`` fail the job loudly (see _variant_index).
    """
    if max_distance < 1:
        raise errors.Invalid("max_distance must be >= 1")
    posting = _df_cut(
        _variant_index(df, id_col, text_col, max_distance, max_len),
        max_variant_df)
    # posting-list pair explosion, not a posting⋈posting self-join:
    # one shuffle on the variant hash (vs two join sides + the join),
    # pair expansion map-side, and the posting subtree evaluates once
    # (measured at 150k keys / 3.3M output pairs: 22 s → 8 s).  Hot
    # variants mean genuinely dense clusters (triangle through the
    # shared variant bounds the cluster's diameter at 2d), so the
    # per-list quadratic is output-bound; max_variant_df caps it, and
    # the streamed two-level explosion (posting_pairs) bounds per-row
    # memory at O(|ids|) even without the cap.
    from loudml_spark.pipeline.dedup import (posting_pairs,
                                             verify_spread)

    plist = posting.groupBy("vh").agg(
        F.collect_list("id").alias("ids")).filter(F.size("ids") >= 2)
    # keep the Levenshtein verify parallel: AQE coalesces the deduped
    # id-pair exchange by bytes and would serialize it (dedup.py
    # verify_spread)
    cand = verify_spread(posting_pairs(plist).distinct(),
                         "id_a", "id_b")
    names = df.select(F.col(id_col).alias("__id"),
                      F.col(text_col).alias("__t"))
    dist = F.levenshtein(
        F.col("na.__t"), F.col("nb.__t"), max_distance)
    return cand \
        .join(names.alias("na"), F.col("id_a") == F.col("na.__id")) \
        .join(names.alias("nb"), F.col("id_b") == F.col("nb.__id")) \
        .select("id_a", "id_b", dist.cast("long").alias("distance")) \
        .filter(F.col("distance") >= 0)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    max_distance: int = 1,
    max_variant_df: int | None = None,
    max_len: int = 64,
) -> DataFrame:
    """Two-table edit-distance join: ``(left_id, right_id, distance)``
    for every cross pair within ``max_distance``.  Same blocking,
    verify and max_len guard as :func:`fuzzy_self_pairs`."""
    if max_distance < 1:
        raise errors.Invalid("max_distance must be >= 1")
    if left_id == right_id:
        raise errors.Invalid(
            f"left_id and right_id are both {left_id!r}; the output "
            "carries one column per side — alias one of them")
    pl = _df_cut(
        _variant_index(left, left_id, left_text, max_distance, max_len),
        max_variant_df)
    pr = _df_cut(
        _variant_index(right, right_id, right_text, max_distance,
                       max_len),
        max_variant_df)
    cand = pl.alias("a").join(
        pr.alias("b"), F.col("a.vh") == F.col("b.vh")) \
        .select(F.col("a.id").alias("id_l"),
                F.col("b.id").alias("id_r")) \
        .distinct()
    from loudml_spark.pipeline.dedup import verify_spread

    cand = verify_spread(cand, "id_l", "id_r")
    nl = left.select(F.col(left_id).alias("__id"),
                     F.col(left_text).alias("__t"))
    nr = right.select(F.col(right_id).alias("__id"),
                      F.col(right_text).alias("__t"))
    dist = F.levenshtein(F.col("na.__t"), F.col("nb.__t"), max_distance)
    return cand \
        .join(nl.alias("na"), F.col("id_l") == F.col("na.__id")) \
        .join(nr.alias("nb"), F.col("id_r") == F.col("nb.__id")) \
        .select(F.col("id_l").alias(left_id),
                F.col("id_r").alias(right_id),
                dist.cast("long").alias("distance")) \
        .filter(F.col("distance") >= 0)
