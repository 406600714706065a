"""Round-10b operators: binary-sign ANN, rank fusion, semantic
decontamination, HLL sketch, text-audit and Kalman additions."""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                        "/root/testdata/sf0.001")


def _emb(spark, sf_dir=SF_DIR):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# ------------------------------------------------- sign codes / hamming


def test_sign_codes_hand_bits(spark):
    from loudml_spark.pipeline.similarity import sign_codes

    # dims 0, 2, 33 positive -> w0 = 1 + 4, w1 = 2
    vec = [0.0] * 64
    vec[0], vec[2], vec[33] = 1.0, 0.5, 3.0
    vec[1] = -2.0  # negative stays 0
    df = spark.createDataFrame(
        [(7, vec)], "vec_id long, embedding array<float>")
    row = sign_codes(df, 64).collect()[0]
    assert (row["vec_id"], row["w0"], row["w1"]) == (7, 5, 2)


def test_sign_codes_zero_is_not_set(spark):
    from loudml_spark.pipeline.similarity import sign_codes

    df = spark.createDataFrame(
        [(0, [0.0] * 64)], "vec_id long, embedding array<float>")
    row = sign_codes(df, 64).collect()[0]
    assert (row["w0"], row["w1"]) == (0, 0)


def test_sign_codes_all_positive_words(spark):
    from loudml_spark.pipeline.similarity import sign_codes

    df = spark.createDataFrame(
        [(1, [1.0] * 64)], "vec_id long, embedding array<float>")
    row = sign_codes(df, 64).collect()[0]
    # 32 set bits per word = 2^32 - 1, positive in int64
    assert (row["w0"], row["w1"]) == (2**32 - 1, 2**32 - 1)


def test_hamming_topk_hand_distances(spark):
    from loudml_spark.pipeline.similarity import hamming_topk

    def v(*pos):
        out = [-1.0] * 64
        for p in pos:
            out[p] = 1.0
        return out

    df = spark.createDataFrame(
        [(0, v(0, 1)), (1, v(0, 1, 5)),        # d(0,1) = 1
         (2, v(40, 41)), (3, v())],            # d(0,2) = 4, d(0,3) = 2
        "vec_id long, embedding array<float>")
    out = hamming_topk(df.filter("vec_id = 0"), df, k=3, dim=64)
    rows = {r["neighbor_id"]: (r["hamming"], r["rank"])
            for r in out.collect()}
    assert rows == {1: (1, 1), 3: (2, 2), 2: (4, 3)}


def test_hamming_topk_excludes_self_and_ranks_ties_by_id(spark):
    from loudml_spark.pipeline.similarity import hamming_topk

    same = [1.0] * 64
    df = spark.createDataFrame(
        [(0, same), (1, same), (2, same)],
        "vec_id long, embedding array<float>")
    out = hamming_topk(df.filter("vec_id = 0"), df, k=5, dim=64)
    rows = [(r["neighbor_id"], r["hamming"], r["rank"])
            for r in out.orderBy("rank").collect()]
    assert rows == [(1, 0, 1), (2, 0, 2)]


def test_hamming_recall_beats_chance_on_testdata(spark):
    """1-bit quantization keeps sign structure: direct recall@5 vs
    exact cosine is lossy (~0.16-0.24 measured) but must beat random
    chance (~5/500 = 0.01) by an order of magnitude."""
    from loudml_spark.pipeline.similarity import (
        ann_recall, cosine_topk, hamming_topk)

    emb = _emb(spark)
    q = emb.filter("vec_id < 10")
    rec = ann_recall(hamming_topk(q, emb, k=5, dim=64),
                     cosine_topk(q, emb, k=5))
    mean = rec.agg({"recall": "avg"}).collect()[0][0]
    assert mean > 0.1


def test_hamming_rerank_recovers_recall(spark):
    """The deployment shape: a Hamming shortlist re-ranked by exact
    cosine must strictly beat the direct sign index's recall, and
    with shortlist = corpus the result IS the exact top-k."""
    from loudml_spark.pipeline.similarity import (
        ann_recall, cosine_topk, hamming_rerank_topk, hamming_topk)

    emb = _emb(spark)
    q = emb.filter("vec_id < 10")
    exact = cosine_topk(q, emb, k=5)
    direct = ann_recall(
        hamming_topk(q, emb, k=5, dim=64), exact
    ).agg({"recall": "avg"}).collect()[0][0]
    rerank = ann_recall(
        hamming_rerank_topk(q, emb, k=5, shortlist=100, dim=64), exact
    ).agg({"recall": "avg"}).collect()[0][0]
    assert rerank > direct
    full = hamming_rerank_topk(q, emb, k=5, shortlist=10_000, dim=64)
    got = sorted(tuple(r) for r in full.collect())
    want = sorted(tuple(r) for r in exact.collect())
    assert got == want


def test_hamming_rerank_hand_values(spark):
    """Re-rank ordering is by exact cosine, not by hamming: a vector
    with a worse hamming distance but better cosine must win."""
    from loudml_spark.pipeline.similarity import hamming_rerank_topk

    # q = ones; a matches signs exactly but tiny magnitude on most
    # dims (cosine lower); b flips one sign but is otherwise aligned
    q = [1.0] * 64
    a = [0.01] * 32 + [1.0] * 32
    b = [1.0] * 63 + [-1.0]
    df = spark.createDataFrame(
        [(0, q), (1, a), (2, b)],
        "vec_id long, embedding array<float>")
    out = hamming_rerank_topk(
        df.filter("vec_id = 0"), df, k=2, shortlist=10, dim=64)
    rows = [(r["neighbor_id"], r["rank"])
            for r in out.orderBy("rank").collect()]
    assert rows == [(2, 1), (1, 2)]


# ------------------------------------------------------------ rrf_fuse


def test_rrf_fuse_hand_values(spark):
    from loudml_spark.pipeline.corpus import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame(
        [(2, 1), (1, 2), (4, 3)], "doc_id long, rank int")
    out = {r["doc_id"]: (r["n_runs"], r["rrf"], r["rank"])
           for r in rrf_fuse([a, b], k0=60).collect()}
    r61, r62, r63 = (round(1 / 61, 6), round(1 / 62, 6),
                     round(1 / 63, 6))
    assert out[1] == (2, round(r61 + r62, 6), 1)
    assert out[2] == (2, round(r62 + r61, 6), 2)  # tie -> id asc
    assert out[3] == (1, r63, 3)
    assert out[4] == (1, r63, 4)


def test_rrf_fuse_missing_run_contributes_zero(spark):
    from loudml_spark.pipeline.corpus import rrf_fuse

    a = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    b = spark.createDataFrame([(9, 1)], "doc_id long, rank int")
    rows = {r["doc_id"]: r["n_runs"]
            for r in rrf_fuse([a, b]).collect()}
    assert rows == {1: 1, 9: 1}


def test_rrf_fuse_three_runs_and_top_k(spark):
    from loudml_spark.pipeline.corpus import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(1, 1), (3, 2)], "doc_id long, rank int")
    c = spark.createDataFrame([(1, 2), (3, 1)], "doc_id long, rank int")
    out = rrf_fuse([a, b, c], top_k=1).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1
    assert out[0]["n_runs"] == 3


def test_rrf_fuse_validates(spark):
    from loudml_spark import errors
    from loudml_spark.pipeline.corpus import rrf_fuse

    a = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    with pytest.raises(errors.Invalid):
        rrf_fuse([])
    with pytest.raises(errors.Invalid):
        rrf_fuse([a], k0=0)


def test_rrf_fuse_rejects_bad_ranks_and_duplicate_ids(spark):
    from loudml_spark import errors
    from loudml_spark.pipeline.corpus import rrf_fuse

    ok = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    zero_rank = spark.createDataFrame(
        [(1, 0), (2, 1)], "doc_id long, rank int")
    null_rank = spark.createDataFrame(
        [(1, 1), (2, None)], "doc_id long, rank int")
    dup_id = spark.createDataFrame(
        [(1, 1), (1, 2)], "doc_id long, rank int")
    with pytest.raises(errors.Invalid, match="1-based rank"):
        rrf_fuse([ok, zero_rank])
    with pytest.raises(errors.Invalid, match="1-based rank"):
        rrf_fuse([null_rank])
    with pytest.raises(errors.Invalid, match="duplicate"):
        rrf_fuse([ok, dup_id])
    # validate=False skips the contract checks (replay escape hatch);
    # the duplicated id then fans out through the full-outer join —
    # 3 rows, exactly the silent double-count the default prevents
    assert rrf_fuse([ok, dup_id], validate=False).count() == 3


# ---------------------------------------- semantic decontamination


def test_semantic_decontaminate_flags_planted_leak(spark):
    from loudml_spark.pipeline.similarity import semantic_decontaminate

    bench_vec = [1.0] * 64
    near = [1.0] * 63 + [0.5]     # cosine ~0.996 -> contaminated
    far = ([1.0, -1.0] * 32)      # cosine 0 -> clean
    corpus = spark.createDataFrame(
        [(100, near), (101, far)],
        "vec_id long, embedding array<float>")
    bench = spark.createDataFrame(
        [(1, bench_vec)], "bench_id long, embedding array<float>")
    out = {r["vec_id"]: (r["matched_bench"], r["contaminated"])
           for r in semantic_decontaminate(
               corpus, bench, threshold=0.9).collect()}
    assert out[100] == (1, True)
    assert out[101] == (1, False)


def test_semantic_decontaminate_argmax_tie_breaks_low(spark):
    from loudml_spark.pipeline.similarity import semantic_decontaminate

    v = [1.0] * 64
    corpus = spark.createDataFrame(
        [(100, v)], "vec_id long, embedding array<float>")
    bench = spark.createDataFrame(
        [(2, v), (1, v)], "bench_id long, embedding array<float>")
    row = semantic_decontaminate(corpus, bench, threshold=0.5) \
        .collect()[0]
    assert row["matched_bench"] == 1 and row["contaminated"]


def test_semantic_decontaminate_validates(spark):
    from loudml_spark import errors
    from loudml_spark.pipeline.similarity import semantic_decontaminate

    df = spark.createDataFrame(
        [(0, [1.0] * 64)], "vec_id long, embedding array<float>")
    empty = spark.createDataFrame(
        [], "bench_id long, embedding array<float>")
    with pytest.raises(errors.Invalid):
        semantic_decontaminate(df, df, threshold=0.0)
    with pytest.raises(errors.Invalid):
        semantic_decontaminate(df, empty)


def test_semantic_decontaminate_rate_on_testdata(spark):
    """At the catalog threshold the synthetic corpus flags a small
    but non-empty fraction — the audit is neither trivial-clean nor
    flagging everything."""
    from pyspark.sql import functions as F

    from loudml_spark.pipeline.similarity import semantic_decontaminate

    emb = _emb(spark, "/root/testdata/sf0.001")
    out = semantic_decontaminate(
        emb.filter("vec_id >= 20"),
        emb.filter("vec_id < 20").selectExpr(
            "vec_id AS bench_id", "embedding"),
        threshold=0.35)
    frac = out.agg(
        F.avg(F.col("contaminated").cast("double"))).collect()[0][0]
    assert 0.0 < frac < 0.5


# ------------------------------------------------------------- HLL


def test_hll_small_group_uses_linear_counting(spark):
    """A 3-distinct-key group sits deep in the small-range regime:
    the linear-counting correction m*ln(m/zeros) applies and lands
    near the exact count."""
    from loudml_spark.operators.sketch import hll_distinct

    df = spark.createDataFrame(
        [("g", f"u{i}") for i in range(3)], "grp string, uid string")
    row = hll_distinct(df, key_col="uid", by=["grp"], p=4).collect()[0]
    assert row["n_exact"] == 3
    assert row["n_zero_regs"] >= 13
    assert abs(row["est_hll"] - 3) / 3 < 0.5
    assert row["rel_err"] == round(abs(row["est_hll"] - 3) / 3, 4)


def test_hll_estimate_within_error_bound(spark):
    """m=64 gives 1.04/8 = 13% standard error; at 1000 distinct keys
    one trial must land within 4 sigma (52%) and never collapse."""
    from loudml_spark.operators.sketch import hll_distinct

    df = spark.createDataFrame(
        [("g", f"user-{i}") for i in range(1000)],
        "grp string, uid string")
    row = hll_distinct(df, key_col="uid", by=["grp"], p=6).collect()[0]
    assert row["n_exact"] == 1000
    assert row["rel_err"] < 4 * 1.04 / 8.0  # 4 sigma at m=64
    assert row["est_hll"] > 0


def test_hll_deterministic_and_duplicate_insensitive(spark):
    """Duplicates of a key cannot move the registers: est over a
    frame with every key repeated 7x equals est over distinct keys."""
    from loudml_spark.operators.sketch import hll_distinct

    once = spark.createDataFrame(
        [("g", f"u{i}") for i in range(50)], "grp string, uid string")
    many = spark.createDataFrame(
        [("g", f"u{i}") for i in range(50)] * 7,
        "grp string, uid string")
    a = hll_distinct(once, key_col="uid", by=["grp"]).collect()[0]
    b = hll_distinct(many, key_col="uid", by=["grp"]).collect()[0]
    assert a["est_hll"] == b["est_hll"]
    assert a["n_exact"] == b["n_exact"] == 50


def test_hll_p_controls_registers(spark):
    from loudml_spark.operators.sketch import hll_distinct

    df = spark.createDataFrame(
        [("g", f"u{i}") for i in range(200)], "grp string, uid string")
    r4 = hll_distinct(df, key_col="uid", by=["grp"], p=4).collect()[0]
    r6 = hll_distinct(df, key_col="uid", by=["grp"], p=6).collect()[0]
    # more registers -> tighter error on the same data
    assert r6["rel_err"] <= r4["rel_err"] + 0.15


def test_hll_validates(spark):
    from loudml_spark import errors
    from loudml_spark.operators.sketch import hll_distinct

    df = spark.createDataFrame([("g", "u")], "grp string, uid string")
    with pytest.raises(errors.Invalid):
        hll_distinct(df, key_col="uid", by=[])
    with pytest.raises(errors.Invalid):
        hll_distinct(df, key_col="uid", by=["grp"], p=3)
    with pytest.raises(errors.Invalid):
        hll_distinct(df, key_col="nope", by=["grp"])


# ------------------------------------------------- lexical diversity


def test_lexical_diversity_hand_values(spark):
    from loudml_spark.pipeline.text import lexical_diversity

    df = spark.createDataFrame(
        [(0, "a b a c"),        # 4 tokens, 3 types, hapax {b, c}
         (1, "x x x"),          # 3 tokens, 1 type, no hapax
         (2, "")],              # empty -> 1 empty-string token
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in lexical_diversity(df).collect()}
    assert (out[0]["n_tokens"], out[0]["n_types"],
            out[0]["n_hapax"]) == (4, 3, 2)
    assert out[0]["ttr"] == 0.75
    assert out[0]["hapax_ratio"] == 2 / 3
    assert (out[1]["n_types"], out[1]["n_hapax"]) == (1, 0)
    assert out[1]["hapax_ratio"] == 0.0


def test_lexical_diversity_templated_vs_varied(spark):
    """The signal: looping text scores lower TTR than varied text of
    the same length."""
    from loudml_spark.pipeline.text import lexical_diversity

    df = spark.createDataFrame(
        [(0, " ".join(["spam"] * 40)),
         (1, " ".join(f"w{i}" for i in range(40)))],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in lexical_diversity(df).collect()}
    assert out[0]["ttr"] < 0.1 < 1.0 == out[1]["ttr"]
    assert out[1]["hapax_ratio"] == 1.0


def test_lexical_diversity_null_text_yields_nulls(spark):
    """NULL text must yield NULL counts/ratios (the DuckDB
    len(string_split(NULL)) semantics), not -1 / garbage — the
    engine-parity guard from the round-10 advice."""
    from loudml_spark.pipeline.text import lexical_diversity

    df = spark.createDataFrame(
        [(0, None), (1, "a b")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in lexical_diversity(df).collect()}
    assert all(out[0][c] is None for c in
               ("n_tokens", "n_types", "n_hapax", "ttr", "hapax_ratio"))
    assert out[1]["n_tokens"] == 2


# --------------------------------------------------------- kalman


def test_kalman_constant_series_converges_to_level(spark):
    from loudml_spark.operators.tsmath import kalman_level

    df = spark.createDataFrame(
        [("a", t, 10.0) for t in range(20)],
        "k string, bucket_ts long, value double")
    rows = kalman_level(df, by=["k"], q_var=0.1, r_var=1.0) \
        .orderBy("bucket_ts").collect()
    assert rows[0]["level"] == 10.0 and rows[0]["gain"] == 1.0
    assert rows[-1]["level"] == 10.0
    # variance relaxes to the steady state of the Riccati recursion
    assert rows[-1]["variance"] < rows[1]["variance"]


def test_kalman_gain_adapts_downward(spark):
    """Gain starts at 1 (trust first obs) and decreases toward the
    steady state — the property fixed-alpha EWMA lacks."""
    from loudml_spark.operators.tsmath import kalman_level

    df = spark.createDataFrame(
        [("a", t, float(t % 3)) for t in range(30)],
        "k string, bucket_ts long, value double")
    rows = kalman_level(df, by=["k"], q_var=0.01, r_var=1.0) \
        .orderBy("bucket_ts").collect()
    gains = [r["gain"] for r in rows]
    assert gains[0] == 1.0
    assert gains[1] > gains[5] > gains[20]
    # steady-state gain for q=0.01, r=1: K = (q + sqrt(q^2+4qr))/ ...
    # numerically ~0.0951; the tail must be near it
    assert abs(gains[-1] - 0.095125) < 1e-3


def test_kalman_step_change_tracks(spark):
    from loudml_spark.operators.tsmath import kalman_level

    vals = [0.0] * 15 + [100.0] * 15
    df = spark.createDataFrame(
        [("a", t, v) for t, v in enumerate(vals)],
        "k string, bucket_ts long, value double")
    rows = kalman_level(df, by=["k"], q_var=1.0, r_var=1.0) \
        .orderBy("bucket_ts").collect()
    assert rows[14]["level"] < 1.0
    assert rows[-1]["level"] > 95.0


def test_kalman_keys_filter_independently(spark):
    from loudml_spark.operators.tsmath import kalman_level

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 1.0), ("b", 0, 9.0), ("b", 1, 9.0)],
        "k string, bucket_ts long, value double")
    out = {(r["k"], r["bucket_ts"]): r["level"]
           for r in kalman_level(df, by=["k"]).collect()}
    assert out[("a", 1)] == 1.0 and out[("b", 1)] == 9.0


def test_kalman_validates(spark):
    from loudml_spark import errors
    from loudml_spark.operators.tsmath import kalman_level

    df = spark.createDataFrame(
        [("a", 0, 1.0)], "k string, bucket_ts long, value double")
    with pytest.raises(errors.Invalid):
        kalman_level(df, by=["k"], r_var=0.0)
    with pytest.raises(errors.Invalid):
        kalman_level(df, by=["k"], q_var=-1.0)
    with pytest.raises(errors.Invalid):
        kalman_level(df, by=["missing"])


# ------------------------------------------------ bigram perplexity


def test_bigram_ppl_transitions_beat_unigram_blindness(spark):
    """Two docs with IDENTICAL unigram distributions: one follows the
    corpus's dominant transition pattern, the other scrambles it.
    The bigram model must score the scrambled doc strictly higher
    (the unigram filter scores both the same by construction)."""
    from loudml_spark.pipeline.corpus import bigram_perplexity

    corpus = [(i, "a b a b a b a b") for i in range(10)]
    corpus.append((100, "a b a b a b a b"))   # typical transitions
    corpus.append((101, "a a b b a a b b"))   # same unigrams, odd
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["doc_id"]: r["ppl"]
           for r in bigram_perplexity(df).collect()}
    assert out[101] > out[100]


def test_bigram_ppl_hand_value(spark):
    """Single-doc corpus 'a b': one bigram, c(a,b)=1, c(a,.)=1,
    c(b)=1, N=2 -> P = lam*1 + (1-lam)*0.5."""
    import math

    from loudml_spark.pipeline.corpus import bigram_perplexity

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    row = bigram_perplexity(df, lam=0.75).collect()[0]
    p = 0.75 * 1.0 + 0.25 * 0.5
    want = round(math.exp(-round(math.log(p), 6)), 6)
    assert row["n_bigrams"] == 1
    assert row["ppl"] == want


def test_bigram_ppl_short_docs_drop(spark):
    from loudml_spark.pipeline.corpus import bigram_perplexity

    df = spark.createDataFrame(
        [(0, "solo"), (1, "two words")], "doc_id long, text string")
    ids = {r["doc_id"] for r in bigram_perplexity(df).collect()}
    assert ids == {1}


def test_bigram_ppl_validates(spark):
    from loudml_spark import errors
    from loudml_spark.pipeline.corpus import bigram_perplexity

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(errors.Invalid):
        bigram_perplexity(df, lam=1.0)
    with pytest.raises(errors.Invalid):
        bigram_perplexity(df, lam=0.0)


# ------------------------------------------------ rank normalization


def test_rank_normalize_same_fraction_per_group(spark):
    """The calibration property: a global threshold on pct_rank
    keeps the same fraction of EVERY source even when one source's
    raw scores dominate the other's entirely."""
    from loudml_spark.pipeline.sampling import rank_normalize

    rows = [(i, "lo", float(i)) for i in range(10)]          # 0..9
    rows += [(100 + i, "hi", 100.0 + i) for i in range(10)]  # 100..109
    df = spark.createDataFrame(rows, "doc_id long, src string, q double")
    out = rank_normalize(df, score_col="q", by=["src"], keep_frac=0.5)
    kept = out.filter("selected").groupBy("src").count().collect()
    assert {r["src"]: r["count"] for r in kept} == {"lo": 5, "hi": 5}


def test_rank_normalize_bounds_and_single_row_group(spark):
    from loudml_spark.pipeline.sampling import rank_normalize

    df = spark.createDataFrame(
        [(0, "a", 1.0), (1, "a", 2.0), (2, "b", 7.0)],
        "doc_id long, src string, q double")
    out = {r["doc_id"]: r["pct_rank"]
           for r in rank_normalize(
               df, score_col="q", by=["src"]).collect()}
    assert out[0] == 0.0 and out[1] == 1.0
    assert out[2] == 0.0  # single-row group


def test_rank_normalize_ties_share_rank(spark):
    from loudml_spark.pipeline.sampling import rank_normalize

    df = spark.createDataFrame(
        [(0, "a", 5.0), (1, "a", 5.0), (2, "a", 9.0)],
        "doc_id long, src string, q double")
    out = {r["doc_id"]: r["pct_rank"]
           for r in rank_normalize(
               df, score_col="q", by=["src"]).collect()}
    assert out[0] == out[1] == 0.0 and out[2] == 1.0


def test_rank_normalize_validates(spark):
    from loudml_spark import errors
    from loudml_spark.pipeline.sampling import rank_normalize

    df = spark.createDataFrame(
        [(0, "a", 1.0)], "doc_id long, src string, q double")
    with pytest.raises(errors.Invalid):
        rank_normalize(df, score_col="q", by=[])
    with pytest.raises(errors.Invalid):
        rank_normalize(df, score_col="nope", by=["src"])
    with pytest.raises(errors.Invalid):
        rank_normalize(df, score_col="q", by=["src"], keep_frac=0.0)


def test_hll_merge_equals_direct_with_overlapping_shards(spark):
    """The mergeability property: register-max over per-shard
    sketches equals the single-pass sketch even when the SAME user
    appears in many shards (a plain sum of per-shard estimates would
    double-count; the sketch cannot)."""
    from loudml_spark.operators.sketch import (
        hll_distinct, hll_distinct_merged)

    rows = []
    for i in range(300):
        rows.append(("d1", "click", f"u{i}"))
        if i % 2 == 0:
            rows.append(("d1", "view", f"u{i}"))   # overlap: same users
    df = spark.createDataFrame(
        rows, "day string, shard string, uid string")
    direct = hll_distinct(
        df, key_col="uid", by=["day"], p=4).collect()[0]
    merged = hll_distinct_merged(
        df, key_col="uid", by=["day"], shard_col="shard",
        p=4).collect()[0]
    assert merged["est_hll"] == direct["est_hll"]
    assert merged["n_zero_regs"] == direct["n_zero_regs"]


def test_hll_merged_validates(spark):
    from loudml_spark import errors
    from loudml_spark.operators.sketch import hll_distinct_merged

    df = spark.createDataFrame(
        [("d", "s", "u")], "day string, shard string, uid string")
    with pytest.raises(errors.Invalid):
        hll_distinct_merged(df, key_col="uid", by=[], shard_col="shard")
    with pytest.raises(errors.Invalid):
        hll_distinct_merged(
            df, key_col="uid", by=["day"], shard_col="nope")


def test_kalman_smooth_last_point_equals_filter(spark):
    """RTS boundary condition: the smoothed estimate at the final
    observation IS the filtered one (no future to borrow)."""
    from loudml_spark.operators.tsmath import kalman_smooth

    df = spark.createDataFrame(
        [("a", t, float(t)) for t in range(10)],
        "k string, bucket_ts long, value double")
    rows = kalman_smooth(df, by=["k"]).orderBy("bucket_ts").collect()
    assert rows[-1]["smoothed"] == rows[-1]["level"]


def test_kalman_smooth_beats_filter_midseries(spark):
    """On a step change the smoother anticipates the jump midway
    (it sees the future), so its error at the step must be smaller
    than the one-sided filter's."""
    from loudml_spark.operators.tsmath import kalman_smooth

    vals = [0.0] * 10 + [100.0] * 10
    df = spark.createDataFrame(
        [("a", t, v) for t, v in enumerate(vals)],
        "k string, bucket_ts long, value double")
    rows = kalman_smooth(df, by=["k"], q_var=1.0, r_var=4.0) \
        .orderBy("bucket_ts").collect()
    t = 9  # last pre-step point: truth 0, future says jump coming
    # smoothed moves toward the future step, filter cannot
    assert rows[t]["smoothed"] > rows[t]["level"]


def test_kalman_smooth_constant_series_is_flat(spark):
    from loudml_spark.operators.tsmath import kalman_smooth

    df = spark.createDataFrame(
        [("a", t, 5.0) for t in range(8)],
        "k string, bucket_ts long, value double")
    rows = kalman_smooth(df, by=["k"]).collect()
    assert all(r["smoothed"] == 5.0 for r in rows)


def test_stream_hll_rejects_batch_frame(spark):
    from loudml_spark import errors
    from loudml_spark.streaming.job import stream_hll_registers

    df = spark.createDataFrame(
        [("d", 1)], "day string, uid long")
    with pytest.raises(errors.Invalid):
        stream_hll_registers(df, key_col="uid", by=["day"])


def test_stream_hll_state_is_register_bounded(spark, tmp_path):
    """The scale claim itself: stream 5000 distinct keys through two
    micro-batches; the drained register frame has at most 2^p rows
    per group — not one per key."""
    from loudml_spark.operators.sketch import hll_distinct, hll_finish
    from loudml_spark.streaming.job import (
        drain_stream_to_df, stream_hll_registers)

    df = spark.createDataFrame(
        [("d1", i) for i in range(5000)], "day string, uid long")
    for half in (df.filter("uid < 2500"), df.filter("uid >= 2500")):
        half.coalesce(1).write.mode("append").parquet(str(tmp_path))
    stream = (spark.readStream.schema("day string, uid long")
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path)))
    regs = drain_stream_to_df(
        stream_hll_registers(stream, key_col="uid", by=["day"], p=4),
        ["day", "__reg", "__mrho"],
        output_mode="complete", prefix="t_hll")
    assert regs.count() <= 16
    got = hll_finish(regs, by=["day"], p=4).collect()[0]
    want = hll_distinct(df, key_col="uid", by=["day"], p=4).collect()[0]
    assert got["est_hll"] == want["est_hll"]


# -------------------------------------------------------- kmv jaccard


def test_kmv_jaccard_identical_and_disjoint(spark):
    from loudml_spark.operators.sketch import kmv_jaccard

    rows = [("a", f"k{i}") for i in range(50)]
    rows += [("b", f"k{i}") for i in range(50)]          # b == a
    rows += [("c", f"z{i}") for i in range(50)]          # c disjoint
    df = spark.createDataFrame(rows, "s string, key string")
    out = {(r["set_a"], r["set_b"]): r["est_jaccard"]
           for r in kmv_jaccard(
               df, key_col="key", set_col="s", k=64).collect()}
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == 0.0
    assert out[("b", "c")] == 0.0


def test_kmv_jaccard_estimates_known_overlap(spark):
    """200 shared of 300-per-set (J = 200/400 = 0.5): with k=128 the
    sketch estimate must land within the Beyer 2007 error regime."""
    from loudml_spark.operators.sketch import kmv_jaccard

    rows = [("a", f"s{i}") for i in range(200)]
    rows += [("a", f"x{i}") for i in range(100)]
    rows += [("b", f"s{i}") for i in range(200)]
    rows += [("b", f"y{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "s string, key string")
    row = kmv_jaccard(
        df, key_col="key", set_col="s", k=128).collect()[0]
    assert abs(row["est_jaccard"] - 0.5) < 0.15
    assert row["n_union_sketch"] == 128


def test_kmv_jaccard_small_sets_are_exact(spark):
    """Sets smaller than k: the union sketch IS the union, so the
    estimate equals exact Jaccard."""
    from loudml_spark.operators.sketch import kmv_jaccard

    rows = [("a", k) for k in ("p", "q", "r")]
    rows += [("b", k) for k in ("q", "r", "s")]
    df = spark.createDataFrame(rows, "s string, key string")
    row = kmv_jaccard(
        df, key_col="key", set_col="s", k=64).collect()[0]
    assert row["n_union_sketch"] == 4 and row["n_both"] == 2
    assert row["est_jaccard"] == 0.5


def test_kmv_jaccard_validates(spark):
    from loudml_spark import errors
    from loudml_spark.operators.sketch import kmv_jaccard

    df = spark.createDataFrame([("a", "k")], "s string, key string")
    with pytest.raises(errors.Invalid):
        kmv_jaccard(df, key_col="key", set_col="s", k=1)
    with pytest.raises(errors.Invalid):
        kmv_jaccard(df, key_col="key", set_col="s")  # one set only


def test_bigram_ppl_min_count_prunes_hapax_transitions(spark):
    """min_count=2: a doc whose transitions are corpus-hapax loses
    its bigram mass and scores strictly worse; docs on repeated
    transitions are untouched."""
    from loudml_spark.pipeline.corpus import bigram_perplexity

    df = spark.createDataFrame(
        [(0, "a b a b c d"), (1, "a b a b")],
        "doc_id long, text string")
    exact = {r["doc_id"]: r["ppl"]
             for r in bigram_perplexity(df).collect()}
    pruned = {r["doc_id"]: r["ppl"]
              for r in bigram_perplexity(df, min_count=2).collect()}
    assert pruned[0] > exact[0]
    assert pruned[1] == exact[1]


def test_bigram_ppl_min_count_validates(spark):
    from loudml_spark import errors
    from loudml_spark.pipeline.corpus import bigram_perplexity

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(errors.Invalid):
        bigram_perplexity(df, min_count=0)


# ------------------------------------------------- triangle stats


def test_triangle_stats_hand_graph(spark):
    """Triangle 1-2-3 plus a pendant 4: the triangle's nodes get
    T=1 with coefficient 1 (deg 2) except node 3 (deg 3 from the
    pendant) at 1/3; the pendant has none."""
    from loudml_spark.pipeline.graph import triangle_stats

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "id_a long, id_b long")
    out = {r["id"]: (r["degree"], r["n_triangles"], r["coeff"])
           for r in triangle_stats(pairs).collect()}
    assert out[1] == (2, 1, 1.0)
    assert out[2] == (2, 1, 1.0)
    assert out[3] == (3, 1, 1 / 3)
    assert out[4] == (1, 0, 0.0)


def test_triangle_stats_counts_each_triangle_once(spark):
    """Duplicate and reversed input edges collapse; K4 gives every
    node 3 triangles at coefficient 1."""
    from loudml_spark.pipeline.graph import triangle_stats

    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r["id"]: (r["degree"], r["n_triangles"], r["coeff"])
           for r in triangle_stats(pairs).collect()}
    assert all(v == (3, 3, 1.0) for v in out.values())


def test_triangle_stats_triangle_free_graph(spark):
    from loudml_spark.pipeline.graph import triangle_stats

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
    out = triangle_stats(pairs)
    assert out.agg({"n_triangles": "sum"}).collect()[0][0] == 0


def test_triangle_stats_validates(spark):
    from loudml_spark import errors
    from loudml_spark.pipeline.graph import triangle_stats

    pairs = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(errors.Invalid):
        triangle_stats(pairs)


# ------------------------------------------------- streaming kalman


def test_stream_kalman_matches_batch_across_batches(spark, tmp_path):
    """The filter state survives the micro-batch boundary: streaming
    over two files is bit-identical to the batch operator over the
    concatenated series."""
    from loudml_spark.operators.tsmath import kalman_level
    from loudml_spark.streaming.job import (
        drain_stream_to_df, stream_kalman_level)

    rows = [("a", t, float((t * 7) % 13)) for t in range(30)]
    rows += [("b", t, float(t % 5)) for t in range(30)]
    df = spark.createDataFrame(
        rows, "event_type string, bucket_ts long, value double")
    for part in (df.filter("bucket_ts < 15"),
                 df.filter("bucket_ts >= 15")):
        part.coalesce(1).write.mode("append").parquet(str(tmp_path))
    stream = (spark.readStream
              .schema("event_type string, bucket_ts long, value double")
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path)))
    got = drain_stream_to_df(
        stream_kalman_level(stream, q_var=0.1, r_var=1.0),
        ["event_type", "bucket_ts", "value", "level", "gain",
         "variance"],
        output_mode="append", prefix="t_kalman")
    want = kalman_level(
        df, by=["event_type"], q_var=0.1, r_var=1.0)
    assert (sorted(tuple(r) for r in got.collect())
            == sorted(tuple(r) for r in want.collect()))


def test_stream_kalman_validates(spark):
    from loudml_spark import errors
    from loudml_spark.streaming.job import stream_kalman_level

    df = spark.createDataFrame(
        [("a", 0, 1.0)], "event_type string, bucket_ts long, value double")
    with pytest.raises(errors.Invalid):
        stream_kalman_level(df, r_var=0.0)


# --------------------------------------------- recall-gate completion


def test_every_approximate_index_has_a_recall_gate(spark):
    """The acceptance-gate family is closed: each approximate ANN
    index in the catalog pairs with a measured recall query."""
    from loudml_spark.catalog import QUERIES

    for gate in ("ann_recall_ivf", "ann_recall_sq8",
                 "ann_recall_hamming", "ann_recall_hamming_rerank",
                 "ann_recall_lsh", "ann_recall_pq"):
        assert gate in QUERIES


def test_lsh_and_pq_recall_gates_are_well_formed(spark):
    """The gates report an honest number per query — recall in
    [0, 1] over the exact top-5 (LSH's 6-bit buckets measure LOW on
    this data; surfacing that is the gate's purpose, so no quality
    floor is asserted here)."""
    from loudml_spark.catalog import QUERIES

    for name in ("ann_recall_lsh", "ann_recall_pq"):
        rows = QUERIES[name]["fn"](spark, SF_DIR).collect()
        assert len(rows) == 10, name
        for r in rows:
            assert r["n_exact"] == 5
            assert 0.0 <= r["recall"] <= 1.0
            assert r["recall"] == r["n_hits"] / r["n_exact"]
