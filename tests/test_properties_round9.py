"""Property-based tests (hypothesis) for the round-9 curation
operators — each Spark implementation replayed against an
independent plain-Python reference on arbitrary inputs.

Driver-side properties (water-filling arithmetic, BPE fold ≡ greedy,
argmin semantics) run WITHOUT Spark where possible so hypothesis can
explore hundreds of cases; one pinned Spark case per operator proves
the Column expression computes the same function.
"""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# ------------------------------------------------------ water-filling


def _py_waterfill(tokens: list, budget: float, max_epochs: float):
    """Independent reference: exact greedy water-filling over unit
    weights, returns (alloc list aligned to tokens, saturated list)."""
    caps = [max_epochs * t for t in tokens]
    order = sorted(range(len(caps)), key=lambda i: (caps[i], i))
    rem_b, rem_n = budget, len(caps)
    alloc = [0.0] * len(caps)
    sat = [False] * len(caps)
    unsat = []
    for i in order:
        if caps[i] * rem_n <= rem_b:
            alloc[i] = caps[i]
            sat[i] = True
            rem_b -= caps[i]
            rem_n -= 1
        else:
            unsat.append(i)
            rem_n -= 0  # lam applies later
    if unsat:
        lam = rem_b / len(unsat)
        for i in unsat:
            alloc[i] = min(lam, caps[i])
    return alloc, sat


@given(
    tokens=st.lists(st.integers(min_value=1, max_value=10**6),
                    min_size=1, max_size=12),
    budget=st.integers(min_value=1, max_value=10**7),
    epochs=st.sampled_from([0.5, 1.0, 1.5, 2.0, 4.0]),
)
@settings(max_examples=300, deadline=None)
def test_waterfill_reference_invariants(tokens, budget, epochs):
    alloc, sat = _py_waterfill(tokens, float(budget), epochs)
    caps = [epochs * t for t in tokens]
    # never exceed a cap
    assert all(a <= c + 1e-9 for a, c in zip(alloc, caps))
    # budget met exactly when reachable, else everything caps
    if sum(caps) >= budget:
        assert math.isclose(sum(alloc), budget, rel_tol=1e-12)
    else:
        assert all(sat)
        assert math.isclose(sum(alloc), sum(caps), rel_tol=1e-12)
    # saturated <=> allocation equals cap at the water level
    for a, c, s in zip(alloc, caps, sat):
        if s:
            assert math.isclose(a, c, rel_tol=1e-12)
    # all unsaturated sources get the SAME allocation (the level)
    lams = [a for a, s in zip(alloc, sat) if not s]
    for x in lams:
        assert math.isclose(x, lams[0], rel_tol=1e-12)


@pytest.mark.usefixtures("spark")
@given(
    tokens=st.lists(st.integers(min_value=1, max_value=5000),
                    min_size=1, max_size=6),
    budget=st.integers(min_value=1, max_value=40000),
)
@settings(max_examples=12, deadline=None)
def test_token_budget_mix_matches_reference(spark, tokens, budget):
    from loudml_spark.pipeline.sampling import token_budget_mix

    rows = [(i, " ".join(["w"] * t), f"s{i:02d}")
            for i, t in enumerate(tokens)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in token_budget_mix(
        df, budget=budget, max_epochs=2.0).collect()}
    alloc, sat = _py_waterfill(tokens, float(budget), 2.0)
    for i, t in enumerate(tokens):
        r = out[f"s{i:02d}"]
        assert r["alloc"] == pytest.approx(alloc[i], abs=1e-5)
        assert bool(r["saturated"]) == sat[i]


# ------------------------------------------------------------ BPE fold


def _py_greedy_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_fold_merge(syms, a, b):
    """The fold the Spark Column implements, replayed in Python."""
    acc = []
    for x in syms:
        if acc and acc[-1] == a and x == b:
            acc[-1] = a + b
        else:
            acc.append(x)
    return acc


@given(
    word=st.text(alphabet="ab", min_size=0, max_size=14),
    pair=st.tuples(st.sampled_from("ab"), st.sampled_from("ab")),
)
@settings(max_examples=400, deadline=None)
def test_bpe_fold_equals_greedy_left_to_right(word, pair):
    a, b = pair
    syms = list(word)
    assert _py_fold_merge(syms, a, b) == _py_greedy_merge(syms, a, b)


@given(
    word=st.text(alphabet="abc", min_size=1, max_size=10),
    merges=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "ab", "bc", "abc"]),
                  st.sampled_from(["a", "b", "c", "ab", "bc"])),
        min_size=1, max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_bpe_fold_equals_greedy_on_merged_symbols(word, merges):
    # applying merges in sequence: the fold and the scanner must stay
    # equivalent even when earlier merges created multi-char symbols
    f = list(word)
    g = list(word)
    for a, b in merges:
        f = _py_fold_merge(f, a, b)
        g = _py_greedy_merge(g, a, b)
        assert f == g
    # the concatenation invariant: merging never changes the text
    assert "".join(f) == word


@pytest.mark.usefixtures("spark")
def test_bpe_merge_col_matches_python_fold(spark):
    from pyspark.sql import functions as F

    from loudml_spark.pipeline.corpus import bpe_merge_col

    words = ["", "a", "aa", "aaa", "aaaa", "abab", "baba", "abba",
             "bbaabb", "ababab"]
    df = spark.createDataFrame(
        [(w,) for w in words], "w string")
    # split("", "") yields [''] (a split artifact — real tokenizer
    # words are never empty), so feed the fold a CLEAN symbol array
    syms = F.filter(F.split("w", ""), lambda x: x != F.lit(""))
    out = df.select(
        "w", bpe_merge_col(syms, "a", "b").alias("m")
    ).collect()
    for r in out:
        assert list(r["m"]) == _py_fold_merge(list(r["w"]), "a", "b"), r


# ------------------------------------------------------------ k-means


@pytest.mark.usefixtures("spark")
@given(
    vecs=st.lists(
        st.tuples(st.integers(-5, 5), st.integers(-5, 5)),
        min_size=1, max_size=8),
)
@settings(max_examples=10, deadline=None)
def test_kmeans_assign_matches_numpy_argmin(spark, vecs):
    import numpy as np

    from loudml_spark.pipeline.embeddings import kmeans_assign

    cents = [[0.0, 0.0], [3.0, 3.0], [-3.0, 2.0]]
    df = spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["cluster"]
           for r in kmeans_assign(df, cents).collect()}
    X = np.array(vecs, dtype=float)
    C = np.array(cents)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    # ties break to the LOWEST cluster id — numpy argmin does too
    want = d2.argmin(axis=1)
    assert [out[i] for i in range(len(vecs))] == list(want)


# ------------------------------------------------- E-S weighted keys


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(1, 10**6)),
        min_size=1, max_size=40, unique_by=lambda t: t[0]),
    k=st.integers(min_value=1, max_value=10),
)
@settings(max_examples=200, deadline=None)
def test_es_key_selection_reference(rows, k):
    # reference replay of the selection rule: top-k by (key desc, id)
    P = 1_000_000_007
    keyed = []
    for fp, w in rows:
        u = ((fp * fp % P + fp) % P + 1) / (P + 1)
        keyed.append((round(u ** (1.0 / w), 12), fp, w))
    got = sorted(keyed, key=lambda t: (-t[0], t[1]))[:k]
    # invariants: keys in (0, 1]; heavier weight => key closer to 1
    for key, fp, w in keyed:
        assert 0.0 < key <= 1.0
    # same fp, larger weight gives a LARGER key (monotone in w)
    for _, fp, w in keyed:
        u = ((fp * fp % P + fp) % P + 1) / (P + 1)
        assert u ** (1.0 / (w + 1)) >= u ** (1.0 / w)
    assert len(got) == min(k, len(rows))
