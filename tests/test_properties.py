"""Property-based tests (hypothesis) for the time/bucketize core —
invariants that must hold for ANY input, including pre-1970 epochs,
odd intervals, and arbitrary ranges."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from loudml_spark import timeutil
from loudml_spark.operators.bucketize import bucketize

ST_INTERVAL = st.integers(min_value=1, max_value=10**6)
ST_TS = st.integers(min_value=-(2**40), max_value=2**40)


@given(ts=ST_TS, interval=ST_INTERVAL)
def test_align_range_floor_ceil_invariants(ts, interval):
    lo, hi = timeutil.align_range(ts, ts + 1, interval)
    assert lo % interval == 0 and hi % interval == 0
    assert lo <= ts < hi
    assert lo == math.floor(ts / interval) * interval


@given(
    n=st.integers(min_value=0, max_value=400),
    unit=st.sampled_from(["s", "m", "h", "d", "w"]),
)
def test_parse_timedelta_roundtrip(n, unit):
    scale = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}[unit]
    assert timeutil.parse_timedelta(f"{n}{unit}") == n * scale


@pytest.mark.usefixtures("spark")
def test_bucket_floor_matches_python_floor(spark):
    # integer path must agree with Python floor division on a mix of
    # negative / boundary / positive epochs for several intervals
    cases = [-7201, -7200, -3601, -3600, -1, 0, 1, 3599, 3600, 7199]
    df = spark.createDataFrame(
        [(t, 1.0) for t in cases], "ts long, v double")
    for interval in (7, 60, 3600):
        out = bucketize(
            df, ["count(v)"], min(cases), max(cases) + 1, interval,
            ts_col="ts", ts_unit="s", spine=False,
        ).collect()
        got = {r["bucket_ts"] for r in out}
        want = {math.floor(t / interval) * interval for t in cases}
        assert got == want, interval


@settings(max_examples=25, deadline=None)
@given(
    points=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.floats(min_value=-1e6, max_value=1e6,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1, max_size=30,
    ),
    interval=st.integers(min_value=1, max_value=100),
)
def test_bucketize_spine_and_count_invariants(
        shared_spark, points, interval):
    """For any point set: the spine covers [floor(lo), ceil(hi)) with
    one row per bucket, counts are non-negative and sum to the number
    of in-range points."""
    spark = shared_spark
    lo = min(t for t, _ in points)
    hi = max(t for t, _ in points) + 1
    df = spark.createDataFrame(
        [(int(t), float(v)) for t, v in points], "ts long, v double")
    out = bucketize(
        df, ["count(v)"], lo, hi, interval, ts_col="ts", ts_unit="s",
    ).collect()
    from_b = math.floor(lo / interval) * interval
    to_b = math.ceil(hi / interval) * interval
    assert len(out) == (to_b - from_b) // interval
    assert [r["bucket_ts"] for r in sorted(out, key=lambda r: r["bucket_ts"])] \
        == list(range(from_b, to_b, interval))
    assert all(r["count_v"] >= 0 for r in out)
    assert sum(r["count_v"] for r in out) == len(points)


@pytest.fixture(scope="module")
def shared_spark(spark):
    return spark


@settings(max_examples=12, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=0, max_size=60,
    ),
)
def test_dedup_clusters_matches_union_find(spark, edges):
    """Star-contraction connected components ≡ a pure-Python
    union-find on arbitrary random graphs (self-loops, duplicates,
    multi-component, chains — whatever hypothesis throws)."""
    from loudml_spark.pipeline.dedup import dedup_clusters

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    # reference: union-find with min-label components
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(pairs).collect()}
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 500), min_size=1, max_size=40),
    budget=st.integers(100, 1000),
)
def test_pack_shards_invariants(spark, sizes, budget):
    """Every doc lands in exactly one shard; shard index equals
    floor(tokens-before / budget); offsets stay inside [0, budget)."""
    from loudml_spark.pipeline.sampling import pack_shards

    rows = [(i, "x", n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n long")
    out = sorted(
        pack_shards(df, token_col="n", budget=budget, by="lang").collect(),
        key=lambda r: r["doc_id"])
    assert len(out) == len(sizes)
    before = 0
    for r, n in zip(out, sizes):
        assert r["shard"] == before // budget
        assert r["shard_offset"] == before - (before // budget) * budget
        assert 0 <= r["shard_offset"] < budget
        before += n


@settings(max_examples=10, deadline=None)
@given(
    n_words=st.integers(1, 60),
    size=st.integers(1, 20),
    stride_frac=st.integers(1, 20),
)
def test_chunk_documents_full_coverage(spark, n_words, size, stride_frac):
    """Chunks cover every token at least once; chunk count equals
    ceil(n/stride) capped to start positions; all chunks within
    size."""
    from loudml_spark.pipeline.text import chunk_documents

    stride = max(1, min(size, stride_frac))
    text = " ".join(f"t{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(df, size=size, stride=stride).collect()
    n_starts = (n_words - 1) // stride + 1
    assert len(out) == n_starts
    seen = set()
    for r in out:
        toks = r["chunk_text"].split(" ")
        assert 1 <= len(toks) <= size
        assert r["n_tokens"] == len(toks)
        seen.update(toks)
    assert seen == {f"t{i}" for i in range(n_words)}


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.floats(-100, 100, allow_nan=False), min_size=1, max_size=200),
    k=st.floats(-10, 10, allow_nan=False),
)
def test_cusum_closed_form_equals_recursion(vals, k):
    """The prefix identity behind operators/tsmath.cusum:
    S_t = C_t - min(0, min_{i<=t} C_i) reproduces the textbook
    recursion S_t = max(0, S_{t-1} + x_t - k) (up to float
    reassociation — the two evaluate sums in different orders)."""
    c = 0.0
    runmin = 0.0
    s_rec = 0.0
    for x in vals:
        s_rec = max(0.0, s_rec + (x - k))
        c += x - k
        runmin = min(runmin, c)
        s_closed = c - min(runmin, 0.0)
        assert math.isclose(s_closed, s_rec, rel_tol=1e-9, abs_tol=1e-7)


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-50, 50, allow_nan=False)),
        min_size=2, max_size=30),
)
def test_interpolate_linear_bounded_by_neighbors(spark, vals):
    """Interpolated values lie within [min, max] of the bracketing
    observations; observed values pass through untouched; edge gaps
    stay null (operators/tsmath.interpolate_linear)."""
    from loudml_spark.operators.tsmath import interpolate_linear

    rows = [(1704067200 + i * 60, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "bucket_ts long, value double")
    out = [r["value"] for r in interpolate_linear(
        df, value_col="value").orderBy("bucket_ts").collect()]
    obs = [i for i, v in enumerate(vals) if v is not None]
    for i, v in enumerate(vals):
        if v is not None:
            assert out[i] == v
            continue
        prev = max((j for j in obs if j < i), default=None)
        nxt = min((j for j in obs if j > i), default=None)
        if prev is None or nxt is None:
            assert out[i] is None, i
        else:
            lo = min(vals[prev], vals[nxt])
            hi = max(vals[prev], vals[nxt])
            assert lo - 1e-9 <= out[i] <= hi + 1e-9, i


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2),             # user
                  st.integers(0, 50),            # ts
                  st.sampled_from(["A", "B", "C", "X"])),
        min_size=1, max_size=40),
)
def test_funnel_matches_bruteforce(spark, events):
    """operators/funnel.funnel against a per-user brute-force chain
    walk (strictly-increasing timestamps through A→B→C)."""
    from loudml_spark.operators.funnel import funnel

    rows = [(f"u{u}", t, s) for u, t, s in events]
    df = spark.createDataFrame(
        rows, "user_id string, ts long, event_type string")
    got = {r["step"]: r["n_users"]
           for r in funnel(df, steps=["A", "B", "C"]).collect()}

    per_user = {}
    for u, t, s in events:
        per_user.setdefault(u, []).append((t, s))
    want = {"A": 0, "B": 0, "C": 0}
    for evs in per_user.values():
        evs.sort()
        # earliest completion time of each chain prefix
        best = [None, None, None]
        for t, s in evs:
            for k, step in enumerate(["A", "B", "C"]):
                if s == step and (k == 0 or
                                  (best[k - 1] is not None
                                   and best[k - 1] < t)):
                    if best[k] is None or t < best[k]:
                        best[k] = t
        for k, step in enumerate(["A", "B", "C"]):
            if best[k] is not None:
                want[step] += 1
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    samples=st.lists(
        st.tuples(st.integers(0, 10_000),
                  st.floats(-100, 100, allow_nan=False)),
        min_size=2, max_size=30, unique_by=lambda p: p[0]),
)
def test_twa_bounded_and_even_spacing_is_mean(spark, samples):
    from loudml_spark.operators.irregular import time_weighted_avg

    rows = [("k", i, int(t), float(v))
            for i, (t, v) in enumerate(samples)]
    df = spark.createDataFrame(rows, "k string, id long, ts long, v double")
    out = time_weighted_avg(
        df, ts_col="ts", value_col="v", by=["k"], order_col="id",
    ).collect()[0]
    vals = [v for _, v in samples]
    assert min(vals) - 1e-9 <= out["twa"] <= max(vals) + 1e-9
    # evenly spaced samples: TWA == trapezoid mean == plain mean of
    # interior points + half-weight endpoints
    even = [("k", i, i * 10, float(v)) for i, (_, v) in enumerate(samples)]
    df2 = spark.createDataFrame(even, "k string, id long, ts long, v double")
    out2 = time_weighted_avg(
        df2, ts_col="ts", value_col="v", by=["k"], order_col="id",
    ).collect()[0]
    n = len(vals)
    want = (vals[0] / 2 + sum(vals[1:-1]) + vals[-1] / 2) / (n - 1)
    assert out2["twa"] == pytest.approx(want)


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "zz", " ", ""]),
                 min_size=0, max_size=5),
        min_size=1, max_size=8,
    ),
    max_df=st.integers(1, 3),
)
def test_dedup_lines_matches_bruteforce(spark, docs, max_df):
    """dedup_lines ≡ a pure-Python reference on arbitrary corpora
    (blank lines, empty docs, repeated lines): every input doc
    present, per-doc counts exact, kept lines in original order."""
    from loudml_spark.pipeline.text import dedup_lines

    corpus = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    # Python reference
    per_doc_lines = {
        i: [ln.strip() for ln in text.split("\n") if ln.strip()]
        for i, text in corpus
    }
    from collections import Counter
    dfreq = Counter()
    for lines in per_doc_lines.values():
        dfreq.update(set(lines))
    expected = {}
    for i, lines in per_doc_lines.items():
        kept = [ln for ln in lines if dfreq[ln] <= max_df]
        expected[i] = ("\n".join(kept), len(kept), len(lines) - len(kept))

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_lines_kept"],
                         r["n_lines_dropped"])
           for r in dedup_lines(df, max_doc_freq=max_df).collect()}
    assert got == expected


@settings(max_examples=25, deadline=None)
@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(1, 10**6), min_size=1, max_size=4),
    alpha=st.floats(0.0, 1.0, allow_nan=False),
)
def test_temperature_rates_invariants(counts, alpha):
    """Rates in (0, 1]; the smallest stratum keeps everything; larger
    strata never keep a higher rate; kept sizes n·r are ∝ n^alpha."""
    from loudml_spark.pipeline.sampling import temperature_rates

    rates = temperature_rates(counts, alpha)
    n_min = min(counts.values())
    assert all(0.0 < r <= 1.0 for r in rates.values())
    for s, n in counts.items():
        if n == n_min:
            assert rates[s] == 1.0
    ordered = sorted(counts, key=counts.get)
    for lo, hi in zip(ordered, ordered[1:]):
        assert rates[hi] <= rates[lo] + 1e-12
    # proportionality: n·r / n^alpha constant across strata
    ref = None
    for s, n in counts.items():
        q = (n * rates[s]) / (n ** alpha)
        ref = q if ref is None else ref
        assert math.isclose(q, ref, rel_tol=1e-9)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["p", "q"]), st.integers(0, 10**6)),
        min_size=1, max_size=30, unique_by=lambda t: t[1]),
    k=st.integers(1, 6),
)
def test_sample_exact_k_matches_bruteforce(spark, rows, k):
    """sample_exact_k ≡ python sort by (hash bucket, id) + head(k)
    per stratum."""
    from pyspark.sql import functions as F

    from loudml_spark.pipeline.sampling import sample_exact_k

    expected = {}
    for s, i in rows:
        expected.setdefault(s, []).append((i * 37 % 10_000, i))
    want = {
        (s, i)
        for s, lst in expected.items()
        for _, i in sorted(lst)[:k]
    }
    df = spark.createDataFrame(rows, "s string, doc_id long")
    got = {(r["s"], r["doc_id"]) for r in sample_exact_k(
        df, key=F.col("doc_id") * 37, k=k, order_col="doc_id",
        by=["s"]).collect()}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(st.integers(0, 400), min_size=1, max_size=30),
    seq_len=st.integers(16, 300),
)
def test_pack_sequences_matches_python_walk(spark, sizes, seq_len):
    """The windowed-SQL packing equals a straight Python walk of the
    concatenated token stream: same windows, same piece bounds, and
    pieces tile every non-empty document exactly."""
    from loudml_spark.pipeline.sampling import pack_sequences

    rows = [(i, "x", n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n long")
    got = sorted(
        pack_sequences(df, token_col="n", seq_len=seq_len, by="lang")
        .collect(),
        key=lambda r: (r["doc_id"], r["seq_id"]),
    )
    expect = []
    pos = 0
    for i, n in enumerate(sizes):
        start, end = pos, pos + n
        pos = end
        if n == 0:
            continue
        for s in range(start // seq_len, (end - 1) // seq_len + 1):
            lo, hi = max(start, s * seq_len), min(end, (s + 1) * seq_len)
            expect.append((i, s, lo - s * seq_len, lo - start, hi - start))
    assert [(r["doc_id"], r["seq_id"], r["offset_in_seq"],
             r["tok_begin"], r["tok_end"]) for r in got] == expect


@settings(max_examples=25, deadline=None)
@given(
    hashes=st.lists(st.integers(0, 10**15), min_size=1, max_size=200),
    probes=st.lists(st.integers(0, 10**15), min_size=1, max_size=50),
    k=st.integers(1, 5),
)
def test_bloom_words_python_mirror_no_false_negatives(hashes, probes, k):
    """Pure-arithmetic mirror of bloom_probe_col (same double-hash
    positions, same 32-bit word packing): every inserted hash probes
    positive, and any positive probe is explainable by the bit array
    (sanity of the packing arithmetic)."""
    from loudml_spark.pipeline.dedup import bloom_build

    m = 1 << 12
    words = bloom_build(hashes, m_bits=m, k=k)

    def probe(h):
        h1, h2 = h % m, 1 + h % (m - 1)
        for i in range(k):
            pos = (h1 + i * h2) % m
            if not (words[pos // 32] >> (pos % 32)) & 1:
                return False
        return True

    assert all(probe(h) for h in hashes)
    member_bits = set()
    for h in hashes:
        h1, h2 = h % m, 1 + h % (m - 1)
        member_bits.update((h1 + i * h2) % m for i in range(k))
    for p in probes:
        if probe(p):
            h1, h2 = p % m, 1 + p % (m - 1)
            assert all(
                (p_ in member_bits)
                for p_ in ((h1 + i * h2) % m for i in range(k)))


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=8),
        min_size=2, max_size=8),
)
def test_bm25_matches_bruteforce(spark, docs):
    """BM25 scores equal a from-the-formula python model for ANY
    small corpus; docs hitting no query term never appear."""
    import math

    from loudml_spark.pipeline.corpus import bm25_scores

    texts = {i + 1: " ".join(words) for i, words in enumerate(docs)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    terms = ["a", "b", "c"]
    got = {r["doc_id"]: r["score"] for r in
           bm25_scores(df, terms).collect()}

    n = len(texts)
    lens = {i: len(t.split()) for i, t in texts.items()}
    avgdl = sum(lens.values()) / n
    dfreq = {t: sum(1 for x in texts.values() if t in x.split())
             for t in terms}
    for i, t in texts.items():
        toks = t.split()
        s = 0.0
        hit = False
        for q in terms:
            tf = toks.count(q)
            if not tf:
                continue
            hit = True
            idf = math.log(1 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            s += round(idf * tf * 2.2
                       / (tf + 1.2 * (0.25 + 0.75 * lens[i] / avgdl)), 6)
        if hit:
            assert got[i] == pytest.approx(s, abs=2e-6), i
        else:
            assert i not in got


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=6),
        min_size=1, max_size=6),
)
def test_lm_perplexity_bounds(spark, docs):
    """Perplexity is bounded by the inverse extreme token
    probabilities of the smoothed LM for ANY corpus, and n_tokens
    reproduces doc length."""
    from loudml_spark.pipeline.corpus import lm_perplexity

    texts = {i + 1: " ".join(words) for i, words in enumerate(docs)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm_perplexity(df).collect()}

    corpus = [w for t in texts.values() for w in t.split()]
    total, vocab = len(corpus), len(set(corpus))
    denom = total + 0.5 * vocab
    probs = [(corpus.count(w) + 0.5) / denom for w in set(corpus)]
    lo, hi = 1.0 / max(probs), 1.0 / min(probs)
    for i, t in texts.items():
        assert got[i]["n_tokens"] == len(t.split())
        # geometric-mean inverse probability lies between the extremes
        assert lo - 1e-4 <= got[i]["ppl"] <= hi + 1e-4


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=2, max_size=6,
                 unique=True),
        min_size=2, max_size=6),
    iters=st.integers(min_value=1, max_value=4),
)
def test_textrank_mass_conservation(spark, docs, iters):
    """For ANY co-occurrence graph: rank mass sums to ~1 every run,
    scores are positive, and the node set equals the graph's."""
    from hypothesis import assume

    from loudml_spark import errors
    from loudml_spark.pipeline.corpus import textrank_keywords

    texts = {i + 1: " ".join(words) for i, words in enumerate(docs)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    try:
        got = textrank_keywords(
            df, min_pair_count=1, iterations=iters).collect()
    except errors.Invalid:
        # corpus of single-token docs -> empty graph, a valid outcome
        assume(False)
    assert all(r["score"] > 0 for r in got)
    assert sum(r["score"] for r in got) == pytest.approx(1.0, abs=1e-3)


@settings(max_examples=200, deadline=None)
@given(
    bins=st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 50)),
        min_size=1, max_size=60,
    ).map(lambda xs: [(min(p, n), n) for p, n in xs]),
)
def test_pav_fit_properties(bins):
    """pool-adjacent-violators invariants on arbitrary binned
    Bernoulli data: the fit is (a) non-decreasing, (b) mass
    preserving (Σ fitted·n = Σ pos exactly — PAV pools means, never
    moves mass), (c) bounded by [0, 1], and (d) idempotent on its
    own rounded output when already monotone."""
    from fractions import Fraction

    from loudml_spark.operators.calibrate import pav_fit

    pos = [p for p, _ in bins]
    n = [c for _, c in bins]
    fitted = pav_fit(pos, n)
    assert all(a <= b for a, b in zip(fitted, fitted[1:]))
    assert all(0.0 <= v <= 1.0 for v in fitted)
    # mass preservation in exact rationals (fitted = pooled p/c)
    total = sum(Fraction(v).limit_denominator(10**12) * c
                for v, c in zip(fitted, n))
    assert total == sum(pos)


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(st.integers(1, 10**6), min_size=2, max_size=80),
    scale=st.integers(1, 1000),
)
def test_gini_rank_form_scale_invariant_and_bounded(vals, scale):
    """The integer rank-weighted Gini closed form: scaling every
    value by a positive constant cannot change G (S and T scale
    together), and G is bounded by [0, (n-1)/n]."""
    def gini(xs):
        xs = sorted(xs)
        n = len(xs)
        t = sum(xs)
        s = sum((i + 1) * x for i, x in enumerate(xs))
        return (2 * s - (n + 1) * t), (n * t)

    num1, den1 = gini(vals)
    num2, den2 = gini([v * scale for v in vals])
    assert num1 * den2 == num2 * den1          # exact equality
    n = len(vals)
    assert 0 <= num1 * n <= (n - 1) * den1     # 0 <= G <= (n-1)/n


@settings(max_examples=40, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 1),
                  st.integers(0, 30)),
        min_size=4, max_size=60,
    ),
)
def test_auc_invariant_under_monotone_score_transform(spark, pts):
    """ROC-AUC is a rank statistic: any strictly increasing affine
    transform of the scores leaves (n_pos, n_neg, auc) identical —
    including through the distinct-score tie handling."""
    from loudml_spark.operators.calibrate import binary_auc

    from pyspark.sql import functions as F

    rows = [(float(s), bool(y)) for y, s in pts]
    df = spark.createDataFrame(rows, "score double, label boolean")
    a = binary_auc(df, score_col="score", label_col="label").collect()[0]
    df2 = df.withColumn("score", F.col("score") * 7 + 3)
    b = binary_auc(df2, score_col="score", label_col="label").collect()[0]
    assert (a["n_pos"], a["n_neg"], a["auc"]) == \
        (b["n_pos"], b["n_neg"], b["auc"])


@settings(max_examples=40, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 20)),
        min_size=4, max_size=80,
    ).filter(lambda xs: {g for g, _ in xs} == {"a", "b"}),
)
def test_ks_invariant_under_monotone_transform_and_bounded(spark, pts):
    """KS D is an ECDF statistic: strictly increasing affine
    transforms of the values change nothing, and 0 <= D <= 1 with
    D = 0 iff the two samples have identical value multisets."""
    from loudml_spark.operators.tsmath import ks_two_sample

    from pyspark.sql import functions as F

    rows = [(g, float(v)) for g, v in pts]
    df = spark.createDataFrame(rows, "g string, v double")
    a = ks_two_sample(df, value_col="v", group_col="g",
                      group_a="a", group_b="b").collect()[0]
    df2 = df.withColumn("v", F.col("v") * 5 - 11)
    b = ks_two_sample(df2, value_col="v", group_col="g",
                      group_a="a", group_b="b").collect()[0]
    assert (a["d"], a["reject"]) == (b["d"], b["reject"])
    assert 0.0 <= a["d"] <= 1.0
    # D = 0 iff the NORMALIZED distributions coincide (multisets may
    # differ in size: {0,0,0} vs {0} both have ECDF == 1 at 0)
    from collections import Counter
    from fractions import Fraction
    ca = Counter(v for g, v in pts if g == "a")
    cb = Counter(v for g, v in pts if g == "b")
    na, nb = sum(ca.values()), sum(cb.values())
    same_dist = (
        {v: Fraction(c, na) for v, c in ca.items()}
        == {v: Fraction(c, nb) for v, c in cb.items()})
    assert (a["d"] == 0.0) == same_dist


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=40),
        min_size=1, max_size=6),
    n=st.integers(2, 4),
    min_count=st.integers(2, 3),
)
def test_repeated_spans_excision_invariants(spark, docs, n, min_count):
    """Invariants of the span machinery on random corpora:
    (1) runs are pairwise disjoint and ordered with span bounds
        inside the doc;
    (2) excision removes exactly the tokens inside spans (count
        equality) and keeps the rest in order (list equality against
        a python mirror); clean docs pass through byte-identical.
    """
    from loudml_spark.pipeline.dedup import excise_spans, repeated_spans

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = repeated_spans(df, n=n, min_count=min_count).collect()
    lens = {i: len(ws) for i, ws in enumerate(docs)}
    per_doc: dict = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in per_doc.items():
        rs = sorted(rs, key=lambda r: r["run"])
        for r in rs:
            assert 0 <= r["span_start"] <= r["span_end"] < lens[d]
        for a, b in zip(rs, rs[1:]):
            assert a["span_end"] < b["span_start"]  # disjoint, ordered

    out = {r["doc_id"]: r for r in
           excise_spans(df, spark.createDataFrame(
               spans, "doc_id long, run long, span_start long, "
               "span_end long, n_matched_grams long")
               if spans else spark.createDataFrame(
                   [], "doc_id long, span_start long, span_end long")
           ).collect()}
    for i, ws in enumerate(rows):
        d, text = ws
        orig = text.split(" ") if text else [""]
        cut = set()
        for r in per_doc.get(d, []):
            cut.update(range(r["span_start"], r["span_end"] + 1))
        expect = [w for j, w in enumerate(orig) if j not in cut]
        got = out[d]["text"].split(" ") if out[d]["text"] else []
        if not per_doc.get(d):
            assert out[d]["text"] == text
            assert out[d]["n_tokens_removed"] == 0
        else:
            assert got == expect
            assert out[d]["n_tokens_removed"] == len(cut)
