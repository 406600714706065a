"""Fuzzy record linkage (pipeline/linkage.py): deletion-neighborhood
golden values, exact-recall property vs a brute-force oracle, the
two-table join, the df cut, and error paths."""

import random

import pytest
from pyspark.sql import functions as F

from loudml_spark import errors
from loudml_spark.pipeline.linkage import (
    deletion_neighborhood,
    fuzzy_join,
    fuzzy_self_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _neigh(spark, s, d):
    row = spark.range(1).select(
        deletion_neighborhood(F.lit(s), d).alias("n")).first()
    return set(row["n"])


def test_neighborhood_golden(spark):
    assert _neigh(spark, "abc", 0) == {"abc"}
    assert _neigh(spark, "abc", 1) == {"abc", "bc", "ac", "ab"}
    # d=2 adds every 1-char remnant
    assert _neigh(spark, "abc", 2) == {"abc", "bc", "ac", "ab",
                                       "a", "b", "c"}
    assert _neigh(spark, "", 2) == {""}
    assert _neigh(spark, "aaa", 1) == {"aaa", "aa"}  # distinct dedups


def test_neighborhood_size_bound(spark):
    s = "abcdefghij"  # 10 distinct chars: 1 + 10 + C(10,2) variants
    got = _neigh(spark, s, 2)
    assert len(got) == 1 + 10 + 45
    assert all(len(v) >= 8 for v in got)


def test_errors(spark):
    df = spark.createDataFrame([(1, "x")], "id long, t string")
    with pytest.raises(errors.Invalid):
        deletion_neighborhood(F.lit("x"), 4)
    with pytest.raises(errors.Invalid):
        fuzzy_self_pairs(df, id_col="nope", text_col="t")
    with pytest.raises(errors.Invalid):
        fuzzy_self_pairs(df, id_col="id", text_col="t", max_distance=0)
    with pytest.raises(errors.Invalid):
        fuzzy_self_pairs(df, id_col="id", text_col="t",
                         max_variant_df=0)
    with pytest.raises(errors.Invalid):
        fuzzy_join(df, df, left_id="id", left_text="t",
                   right_id="id", right_text="t")


@pytest.mark.parametrize("d", [1, 2])
def test_exact_recall_and_precision_vs_bruteforce(spark, d):
    """Seeded corpus of near-duplicate tokens: the blocked join must
    return EXACTLY the brute-force pair set, with true distances."""
    rng = random.Random(42)
    alpha = "abcdef"
    base = ["".join(rng.choice(alpha) for _ in range(rng.randint(4, 9)))
            for _ in range(12)]
    strings = list(base)
    for s in base:  # perturb: delete / insert / substitute
        for _ in range(2):
            i = rng.randrange(len(s))
            op = rng.choice("dis")
            if op == "d":
                strings.append(s[:i] + s[i + 1:])
            elif op == "i":
                strings.append(s[:i] + rng.choice(alpha) + s[i:])
            else:
                strings.append(s[:i] + rng.choice(alpha) + s[i + 1:])
    rows = list(enumerate(strings))
    want = {(i, j, _lev(a, b))
            for i, a in rows for j, b in rows
            if i < j and _lev(a, b) <= d}
    df = spark.createDataFrame(rows, "id long, t string")
    got = {(r["id_a"], r["id_b"], r["distance"])
           for r in fuzzy_self_pairs(
               df, id_col="id", text_col="t", max_distance=d).collect()}
    assert got == want


def test_fuzzy_join_two_tables(spark):
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "globex"), (3, "umbrella")],
        "lid long, name string")
    right = spark.createDataFrame(
        [(10, "acme corp."), (11, "initech"), (12, "umbrela")],
        "rid long, name string")
    got = {(r["lid"], r["rid"], r["distance"])
           for r in fuzzy_join(
               left, right, left_id="lid", left_text="name",
               right_id="rid", right_text="name",
               max_distance=1).collect()}
    assert got == {(1, 10, 1), (3, 12, 1)}


def test_max_variant_df_cut(spark):
    """A hot variant shared by every row: the df cut drops it, and
    pairs only surviving through that variant disappear (documented
    recall trade)."""
    df = spark.createDataFrame(
        [(i, "ab" + c) for i, c in enumerate("xyz")],
        "id long, t string")
    full = fuzzy_self_pairs(
        df, id_col="id", text_col="t", max_distance=1).count()
    # all three share variant "ab"; postings for it have df=3
    cut = fuzzy_self_pairs(
        df, id_col="id", text_col="t", max_distance=1,
        max_variant_df=2).count()
    assert full == 3 and cut == 0


def test_long_key_fails_loudly(spark):
    """A key past max_len must fail the job with a named error, not
    silently explode C(len, d) variants through the shuffle."""
    df = spark.createDataFrame(
        [(1, "x" * 100), (2, "short")], "id long, t string")
    with pytest.raises(Exception, match="max_len"):
        fuzzy_self_pairs(df, id_col="id", text_col="t").collect()
    # raising the limit opts in
    out = fuzzy_self_pairs(
        df, id_col="id", text_col="t", max_len=128).collect()
    assert out == []
