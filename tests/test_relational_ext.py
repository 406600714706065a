"""Sessionize / range join / rollup / corpus operators vs hand goldens."""

import math

import pytest
from pyspark.sql import functions as F

from loudml_spark import errors
from loudml_spark.operators.rangejoin import range_join
from loudml_spark.operators.rollup import rollup_cascade
from loudml_spark.operators.sessionize import session_stats, sessionize
from loudml_spark.pipeline.corpus import tf_idf, tokens, vocabulary


# ------------------------------------------------------------ sessionize


def test_sessionize_gap_splits_per_key(spark):
    df = spark.createDataFrame(
        [("u", 0), ("u", 10), ("u", 200), ("u", 205), ("v", 0)],
        "k string, ts long",
    )
    out = {(r["k"], r["ts"]): r["session_id"]
           for r in sessionize(df, gap=100, by=["k"]).collect()}
    assert out[("u", 0)] == 1
    assert out[("u", 10)] == 1      # gap 10 <= 100
    assert out[("u", 200)] == 2     # gap 190 > 100
    assert out[("u", 205)] == 2
    assert out[("v", 0)] == 1       # numbering restarts per key


def test_sessionize_gap_boundary_is_exclusive(spark):
    df = spark.createDataFrame([("u", 0), ("u", 100)], "k string, ts long")
    out = sessionize(df, gap=100, by=["k"]).collect()
    assert {r["session_id"] for r in out} == {1}  # gap == 100 keeps session


def test_sessionize_ties_share_session(spark):
    df = spark.createDataFrame(
        [("u", 500), ("u", 500), ("u", 700)], "k string, ts long")
    out = sessionize(df, gap=100, by=["k"]).collect()
    by_ts = sorted((r["ts"], r["session_id"]) for r in out)
    assert by_ts == [(500, 1), (500, 1), (700, 2)]


def test_session_stats_golden(spark):
    df = spark.createDataFrame(
        [("u", 0, 1.0), ("u", 50, 2.0), ("u", 400, 4.0)],
        "k string, ts long, value double",
    )
    rows = {r["session_id"]: r for r in session_stats(
        df, gap=100, by=["k"], value_col="value").collect()}
    assert rows[1]["session_start"] == 0
    assert rows[1]["session_end"] == 50
    assert rows[1]["duration"] == 50
    assert rows[1]["n_events"] == 2
    assert rows[1]["sum_value"] == 3.0
    assert rows[2]["n_events"] == 1
    assert rows[2]["sum_value"] == 4.0


def test_session_native_boundary_matches_lag_based(spark):
    from loudml_spark.operators.sessionize import session_stats_native

    # event exactly `gap` after its predecessor MERGES in both
    # formulations (Spark session windows are boundary-inclusive);
    # one microsecond beyond splits
    df = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00"),
         ("u", "2024-01-01 00:30:00"),
         ("u", "2024-01-01 01:00:00.000001")],
        "k string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    native = session_stats_native(df, gap_seconds=1800, by=["k"])
    assert native.count() == 2
    lagged = session_stats(
        df.withColumn("ts", F.unix_micros("ts")), gap=1800 * 10**6,
        by=["k"])
    assert lagged.count() == 2


def test_session_native_merges_within_gap(spark):
    from loudml_spark.operators.sessionize import session_stats_native

    df = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00", 1.0),
         ("u", "2024-01-01 00:10:00", 2.0),
         ("u", "2024-01-01 02:00:00", 4.0),
         ("v", "2024-01-01 00:00:00", 8.0)],
        "k string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = session_stats_native(
        df, gap_seconds=1800, by=["k"], value_col="value").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    assert len(by_key["u"]) == 2 and len(by_key["v"]) == 1
    first = min(by_key["u"], key=lambda r: r["session_start"])
    assert first["n_events"] == 2 and first["sum_value"] == 3.0
    assert first["session_end"] - first["session_start"] == 600 * 10**6


def test_sessionize_validates_inputs(spark):
    df = spark.createDataFrame([("u", 0)], "k string, ts long")
    with pytest.raises(errors.Invalid):
        sessionize(df, gap=0, by=["k"])
    with pytest.raises(errors.Invalid):
        sessionize(df, gap=10, by=["nope"])


# ------------------------------------------------------------ range join


@pytest.fixture(scope="module")
def rj_frames(spark):
    pts = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 19), (4, 20), (5, 35)],
        "pid long, ts long",
    )
    iv = spark.createDataFrame(
        [(100, 0, 20), (200, 18, 25), (300, 30, 31)],
        "wid long, start long, end long",
    )
    return pts, iv


def brute_pairs(pts, iv):
    return {(p, w) for p, t in pts for w, s, e in iv if s <= t < e}


def test_range_join_matches_brute_force(spark, rj_frames):
    pts, iv = rj_frames
    pts_rows = [(r["pid"], r["ts"]) for r in pts.collect()]
    iv_rows = [(r["wid"], r["start"], r["end"]) for r in iv.collect()]
    for bin_width in (1, 7, 20, 100):
        out = range_join(
            pts, iv, on="ts", start_col="start", end_col="end",
            bin_width=bin_width,
        )
        got = {(r["pid"], r["wid"]) for r in out.collect()}
        assert got == brute_pairs(pts_rows, iv_rows), bin_width


def test_range_join_no_duplicate_pairs(spark, rj_frames):
    pts, iv = rj_frames
    out = range_join(pts, iv, on="ts", start_col="start",
                     end_col="end", bin_width=3).collect()
    pairs = [(r["pid"], r["wid"]) for r in out]
    assert len(pairs) == len(set(pairs))


def test_range_join_exact_for_ns_scale_epochs(spark):
    # ns epochs exceed 2^53: double bin math would misplace boundaries
    base = 1_704_067_200 * 10**9
    pts = spark.createDataFrame(
        [(1, base), (2, base + 1), (3, base + 7_199_999_999_999)],
        "pid long, ts long",
    )
    iv = spark.createDataFrame(
        [(9, base, base + 2 * 3600 * 10**9)], "wid long, start long, end long")
    out = range_join(pts, iv, on="ts", start_col="start", end_col="end",
                     bin_width=2 * 3600 * 10**9)
    assert {r["pid"] for r in out.collect()} == {1, 2, 3}


def test_range_join_validates_inputs(spark, rj_frames):
    pts, iv = rj_frames
    with pytest.raises(errors.Invalid):
        range_join(pts, iv, on="ts", start_col="start", end_col="end",
                   bin_width=0)
    with pytest.raises(errors.Invalid):
        range_join(pts, iv, on="nope", start_col="start", end_col="end",
                   bin_width=5)


# ------------------------------------------------------------ rollup


def test_rollup_cascade_equals_direct(spark):
    rows = [(t, float(t % 7)) for t in range(0, 86400 * 2, 977)]
    df = spark.createDataFrame(rows, "ts long, value double")
    out = rollup_cascade(
        df, value_col="value", intervals=[3600, 21600, 86400])
    got = {(r["interval_s"], r["bucket_ts"]):
           (r["n"], r["sum_value"], r["min_value"], r["max_value"])
           for r in out.collect()}
    # direct recomputation per level
    for iv in (3600, 21600, 86400):
        buckets = {}
        for t, v in rows:
            b = (t // iv) * iv
            buckets.setdefault(b, []).append(v)
        for b, vs in buckets.items():
            n, s, mn, mx = got[(iv, b)]
            assert n == len(vs)
            assert s == pytest.approx(sum(vs), abs=1e-9)
            assert mn == min(vs) and mx == max(vs)
    # avg derived from exact decimal sum
    r0 = next(r for r in out.collect() if r["interval_s"] == 86400)
    assert r0["avg_value"] == pytest.approx(
        r0["sum_value"] / r0["n"], abs=1e-12)


def test_rollup_validates_intervals(spark):
    df = spark.createDataFrame([(0, 1.0)], "ts long, value double")
    with pytest.raises(errors.Invalid):
        rollup_cascade(df, value_col="value", intervals=[3600, 5000])
    with pytest.raises(errors.Invalid):
        rollup_cascade(df, value_col="value", intervals=[])
    with pytest.raises(errors.Invalid):
        rollup_cascade(df, value_col="value", intervals=[60, 60])


def test_rollup_grouped(spark):
    df = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 3700, 2.0), ("b", 10, 5.0)],
        "k string, ts long, value double",
    )
    out = rollup_cascade(
        df, value_col="value", intervals=[3600, 7200], group_by=["k"])
    got = {(r["interval_s"], r["k"], r["bucket_ts"]): r["n"]
           for r in out.collect()}
    assert got[(3600, "a", 0)] == 1
    assert got[(3600, "a", 3600)] == 1
    assert got[(7200, "a", 0)] == 2
    assert got[(7200, "b", 0)] == 1


# ------------------------------------------------------------ corpus


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, "the cat sat"), (1, "the dog"), (2, "a cat! A CAT")],
        "doc_id long, text string",
    )


def test_tokens_lowercase_letters_only(spark, docs):
    t = sorted((r["doc_id"], r["token"]) for r in tokens(docs).collect())
    assert t == sorted([
        (0, "the"), (0, "cat"), (0, "sat"),
        (1, "the"), (1, "dog"),
        (2, "a"), (2, "cat"), (2, "a"), (2, "cat"),
    ])


def test_vocabulary_counts_and_order(spark, docs):
    v = vocabulary(docs).collect()
    as_map = {r["token"]: (r["tf"], r["df"]) for r in v}
    assert as_map["cat"] == (3, 2)
    assert as_map["the"] == (2, 2)
    assert as_map["a"] == (2, 1)
    assert as_map["sat"] == (1, 1)
    # deterministic ordering: tf desc then token asc
    assert [r["token"] for r in v] == ["cat", "a", "the", "dog", "sat"]
    assert [r["token"] for r in vocabulary(docs, top_k=2).collect()] == \
        ["cat", "a"]


def test_no_nested_loop_joins(spark, docs, rj_frames):
    pts, iv = rj_frames
    for df in (
        range_join(pts, iv, on="ts", start_col="start", end_col="end",
                   bin_width=7),
        tf_idf(docs),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_tf_idf_golden(spark, docs):
    out = {(r["doc_id"], r["token"]): r for r in tf_idf(docs).collect()}
    n_docs = 3
    r = out[(0, "cat")]
    assert r["tf"] == 1 and r["doc_len"] == 3 and r["df"] == 2
    expect = (1 / 3) * (math.log((1 + n_docs) / (1 + 2)) + 1)
    assert r["tfidf"] == pytest.approx(expect, rel=1e-12)
    r2 = out[(2, "cat")]
    assert r2["tf"] == 2 and r2["doc_len"] == 4


# ------------------------------------------------------------ sampling


def test_hash_split_deterministic_and_proportional(spark):
    from loudml_spark.pipeline.sampling import hash_split

    df = spark.range(10_000).withColumn("h", F.col("id") * 7919)
    out = hash_split(
        df, key=F.col("h"),
        weights={"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 10_000
    assert counts["train"] == pytest.approx(8000, abs=400)
    assert counts["val"] == pytest.approx(1000, abs=200)
    # stable across repartition
    again = hash_split(
        df.repartition(13), key=F.col("h"),
        weights={"train": 0.8, "val": 0.1, "test": 0.1})
    a = sorted((r["id"], r["split"]) for r in out.collect())
    b = sorted((r["id"], r["split"]) for r in again.collect())
    assert a == b


def test_hash_split_validates_weights(spark):
    from loudml_spark.pipeline.sampling import hash_split

    df = spark.range(10)
    with pytest.raises(errors.Invalid):
        hash_split(df, key=F.col("id"), weights={"a": 0.5, "b": 0.4})
    with pytest.raises(errors.Invalid):
        hash_split(df, key=F.col("id"), weights={})


def test_deterministic_sample(spark):
    from loudml_spark.pipeline.sampling import deterministic_sample

    df = spark.range(10_000).withColumn("h", F.col("id") * 104729)
    kept = deterministic_sample(df, key=F.col("h"), fraction=0.25)
    n = kept.count()
    assert n == pytest.approx(2500, abs=300)
    ids1 = {r["id"] for r in kept.collect()}
    ids2 = {r["id"] for r in deterministic_sample(
        df.repartition(7), key=F.col("h"), fraction=0.25).collect()}
    assert ids1 == ids2
    with pytest.raises(errors.Invalid):
        deterministic_sample(df, key=F.col("h"), fraction=0.0)


# ------------------------------------------------------------ skew ops


def test_salted_agg_equals_plain(spark):
    from loudml_spark.operators.skew import salted_agg

    # heavy skew: 90% of rows share key 0
    rows = [(i, 0 if i % 10 else i, float(i % 13)) for i in range(2000)]
    df = spark.createDataFrame(rows, "rid long, k long, value double") \
        .withColumn("vdec", F.col("value").cast("decimal(18,2)"))
    out = salted_agg(df, keys=["k"], salt_on="rid", n_salt=8,
                     sums=["vdec"], mins=["value"], maxs=["value"])
    got = {r["k"]: (r["n"], float(r["sum_vdec"]), r["min_value"],
                    r["max_value"]) for r in out.collect()}
    plain = df.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("vdec").alias("s"),
        F.min("value").alias("mn"), F.max("value").alias("mx"))
    want = {r["k"]: (r["n"], float(r["s"]), r["mn"], r["mx"])
            for r in plain.collect()}
    assert got == want


def test_salted_join_equals_plain(spark):
    from loudml_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(i, 0 if i % 5 else i % 3, float(i)) for i in range(500)],
        "rid long, k long, v double")
    right = spark.createDataFrame(
        [(0, "hot"), (1, "one"), (2, "two"), (99, "absent-left")],
        "k long, name string")
    for how in ("inner", "left"):
        got = sorted(
            (r["rid"], r["k"], r["name"])
            for r in salted_join(left, right, ["k"], salt_on="rid",
                                 n_salt=4, how=how).collect())
        want = sorted(
            (r["rid"], r["k"], r["name"])
            for r in left.join(right, ["k"], how).collect())
        assert got == want, how


def test_salted_join_validates(spark):
    from loudml_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, 2)], "k long, rid long")
    with pytest.raises(errors.Invalid):
        salted_join(df, df, ["k"], salt_on="rid", n_salt=1)
    with pytest.raises(errors.Invalid):
        salted_join(df, df, ["k"], salt_on="rid", n_salt=4, how="full")


def test_salting_flattens_pathological_skew(spark):
    """Layout proof, not just value parity: under a pathological key
    (50% of all rows on one key), hash-partitioning by the raw key
    sends half the table through ONE reducer, while the salted layout
    spreads it across n_salt reducers.  Measured via
    spark_partition_id() row counts on the exact shuffle layout the
    salted operators produce (repartition by (key) vs (key, salt) with
    the same deterministic xxhash64 salt as operators/skew.py).
    Measured ratio at 100k rows / 16 partitions / n_salt=8:
    max-partition share 0.53 → 0.16 (3.4×) — recorded in SCALE.md
    §skew."""
    from loudml_spark.operators.skew import _salt_col

    n = 100_000
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id")).alias("k"),
    )

    def max_share(frame, *cols):
        pid = frame.repartition(16, *[F.col(c) for c in cols]).select(
            F.spark_partition_id().alias("p"))
        counts = [
            r["c"]
            for r in pid.groupBy("p").agg(
                F.count("*").alias("c")).collect()
        ]
        return max(counts) / n

    plain = max_share(df, "k")
    salted = max_share(
        df.withColumn("__salt", _salt_col("rid", 8)), "k", "__salt")
    # the hot key owns 50% of the data: unsalted, one partition holds
    # at least that; salted, no partition should hold more than ~2
    # hot-key shards (2·50%/8) plus the uniform background
    assert plain >= 0.5, plain
    assert salted <= plain / 2.5, (plain, salted)


# ------------------------------------------------------------ rollup merge


def test_rollup_merge_equals_full_recompute(spark):
    from loudml_spark.operators.rollup import rollup_merge, rollup_partials

    rows_a = [(t, float(t % 11)) for t in range(0, 7200, 97)]
    rows_b = [(t, float(t % 5)) for t in range(7200, 14400, 101)]
    da = spark.createDataFrame(rows_a, "ts long, value double")
    db = spark.createDataFrame(rows_b, "ts long, value double")
    dall = spark.createDataFrame(rows_a + rows_b, "ts long, value double")
    merged = rollup_merge(
        rollup_partials(da, value_col="value", interval=3600),
        rollup_partials(db, value_col="value", interval=3600),
    )
    full = rollup_partials(dall, value_col="value", interval=3600)
    key = lambda r: r["bucket_ts"]
    got = sorted(((r["bucket_ts"], r["n"], float(r["sum_dec"]),
                   r["min_value"], r["max_value"])
                  for r in merged.collect()))
    want = sorted(((r["bucket_ts"], r["n"], float(r["sum_dec"]),
                    r["min_value"], r["max_value"])
                   for r in full.collect()))
    assert got == want


def test_inverted_index_golden(spark, docs):
    from loudml_spark.pipeline.corpus import inverted_index

    out = {r["token"]: (r["df"], r["postings"])
           for r in inverted_index(docs).collect()}
    assert out["cat"] == (2, [0, 2])
    assert out["the"] == (2, [0, 1])
    assert out["a"] == (1, [2])        # duplicate occurrences deduped
    assert out["dog"] == (1, [1])
    only_multi = {r["token"] for r in
                  inverted_index(docs, min_df=2).collect()}
    assert only_multi == {"cat", "the"}
    capped = {r["token"]: r["postings"] for r in
              inverted_index(docs, max_postings=1).collect()}
    assert capped["cat"] == [0]


# ------------------------------------------------------------ histogram


def test_histogram_bins_and_clamping(spark):
    from loudml_spark.operators.histogram import histogram

    df = spark.createDataFrame(
        [("a", -5.0), ("a", 3.0), ("a", 7.0), ("a", 15.0), ("a", 99.0),
         ("b", 3.0), ("b", None)],
        "k string, value double",
    )
    out = {(r["k"], r["bin"]): r["n"] for r in histogram(
        df, value_col="value", bin_width=10.0, by=["k"],
        lo=0.0, hi=20.0).collect()}
    assert out[("a", 0.0)] == 3   # -5 clamps up; 3 and 7 land here
    assert out[("a", 10.0)] == 2  # 15 plus 99 clamped into last bin
    assert out[("b", 0.0)] == 1   # null dropped
    assert sum(out.values()) == 6
    unclamped = {(r["k"], r["bin"]): r["n"] for r in histogram(
        df, value_col="value", bin_width=10.0, by=["k"]).collect()}
    assert unclamped[("a", -10.0)] == 1
    assert unclamped[("a", 90.0)] == 1


def test_histogram_validates(spark):
    from loudml_spark.operators.histogram import histogram

    df = spark.createDataFrame([(1.0,)], "value double")
    with pytest.raises(errors.Invalid):
        histogram(df, value_col="value", bin_width=0)
    with pytest.raises(errors.Invalid):
        histogram(df, value_col="nope", bin_width=1)


def test_psi_zero_for_identical_and_positive_for_shifted(spark):
    from loudml_spark.operators.histogram import histogram, psi

    base = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3, 11, 12, 21]],
        "k string, value double")
    shifted = spark.createDataFrame(
        [("a", float(v)) for v in [21, 22, 23, 31, 32, 41]],
        "k string, value double")
    h = histogram(base, value_col="value", bin_width=10.0, by=["k"])
    same = psi(h, h, by=["k"]).collect()[0]["psi"]
    assert same == pytest.approx(0.0, abs=1e-12)
    h2 = histogram(shifted, value_col="value", bin_width=10.0, by=["k"])
    moved = psi(h, h2, by=["k"]).collect()[0]["psi"]
    assert moved > 0.25  # fully shifted distribution


def test_psi_validates_inputs(spark):
    from loudml_spark.operators.histogram import psi

    df = spark.createDataFrame([("a", 0.0, 1)], "k string, bin double, n long")
    bad = spark.createDataFrame([("a", 1)], "k string, n long")
    with pytest.raises(errors.Invalid):
        psi(df, bad, by=["k"])


# ------------------------------------------------------ edge hardening


def test_range_join_with_by_keys(spark):
    pts = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 25), ("b", 3, 5)],
        "g string, pid long, ts long")
    iv = spark.createDataFrame(
        [("a", 10, 0, 10), ("b", 20, 0, 10), ("a", 30, 20, 30)],
        "g string, wid long, start long, end long")
    out = range_join(pts, iv, on="ts", start_col="start", end_col="end",
                     by=["g"], bin_width=10)
    got = {(r["g"], r["pid"], r["wid"]) for r in out.collect()}
    # key isolation: b's point never matches a's window
    assert got == {("a", 1, 10), ("a", 2, 30), ("b", 3, 20)}


def test_sessionize_unkeyed_global_timeline(spark):
    df = spark.createDataFrame([(0,), (50,), (500,)], "ts long")
    out = sessionize(df, gap=100)
    got = sorted((r["ts"], r["session_id"]) for r in out.collect())
    assert got == [(0, 1), (50, 1), (500, 2)]


def test_salted_agg_sums_only_no_counts(spark):
    from loudml_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(1, "k", 2.0), (2, "k", 3.0)], "rid long, k string, v double")
    out = salted_agg(df, keys=["k"], salt_on="rid", n_salt=2,
                     sums=["v"], counts=False).collect()
    assert out[0]["sum_v"] == 5.0
    assert "n" not in out[0].asDict()
    with pytest.raises(errors.Invalid):
        salted_agg(df, keys=["k"], salt_on="rid", n_salt=2, counts=False)


def test_rollup_cascade_negative_epochs(spark):
    # pre-1970 timestamps must floor to the LEFT bucket edge
    df = spark.createDataFrame(
        [(-1, 1.0), (-3600, 2.0), (0, 4.0)], "ts long, value double")
    out = rollup_cascade(df, value_col="value", intervals=[3600])
    got = {r["bucket_ts"]: r["n"] for r in out.collect()}
    assert got == {-3600: 2, 0: 1}


def test_hash_split_single_bucket_weights(spark):
    from loudml_spark.pipeline.sampling import hash_split

    df = spark.range(100)
    out = hash_split(df, key=F.col("id"), weights={"all": 1.0})
    assert {r["split"] for r in out.collect()} == {"all"}


def test_psi_surfaces_group_present_on_one_side_only(spark):
    from loudml_spark.operators.histogram import histogram, psi

    e = spark.createDataFrame([("a", float(v)) for v in (1, 2)],
                              "k string, value double")
    a = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "k string, value double")
    he = histogram(e, value_col="value", bin_width=10.0, by=["k"])
    ha = histogram(a, value_col="value", bin_width=10.0, by=["k"])
    got = {r["k"]: r["psi"] for r in psi(he, ha, by=["k"]).collect()}
    # the brand-new category must SURFACE (maximal drift), not vanish
    assert "b" in got
    assert got["b"] > 1.0
    assert got["a"] == pytest.approx(0.0, abs=1e-9)


def test_histogram_hi_not_multiple_of_bin_width(spark):
    # ADVICE r4: with bin_width=10, hi=14 the old clamp (hi - w/2 = 9)
    # pushed the in-range value 12 (true bin 10) into bin 0
    from loudml_spark.operators.histogram import histogram

    df = spark.createDataFrame(
        [(2.0,), (12.0,), (13.9,), (14.0,), (99.0,)], "value double")
    out = {r["bin"]: r["n"] for r in histogram(
        df, value_col="value", bin_width=10.0, lo=0.0, hi=14.0).collect()}
    assert out == {0.0: 1, 10.0: 4}  # 12, 13.9 stay in bin 10; >=hi clamps


def test_histogram_hi_exact_multiple_keeps_last_bin(spark):
    from loudml_spark.operators.histogram import histogram

    df = spark.createDataFrame(
        [(5.0,), (19.0,), (20.0,), (25.0,)], "value double")
    out = {r["bin"]: r["n"] for r in histogram(
        df, value_col="value", bin_width=10.0, lo=0.0, hi=20.0).collect()}
    # hi itself and beyond clamp into the last bin [10, 20)
    assert out == {0.0: 1, 10.0: 3}


def test_psi_unkeyed_no_nested_loop(spark):
    # ADVICE r4: empty-`by` PSI used a crossJoin that planned as
    # BroadcastNestedLoopJoin; totals are now attached as literals
    from loudml_spark.operators.histogram import histogram, psi

    base = spark.createDataFrame(
        [(float(v),) for v in [1, 2, 3, 11, 12, 21]], "value double")
    shifted = spark.createDataFrame(
        [(float(v),) for v in [21, 22, 23, 31, 32, 41]], "value double")
    he = histogram(base, value_col="value", bin_width=10.0)
    ha = histogram(shifted, value_col="value", bin_width=10.0)
    out = psi(he, ha)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert out.collect()[0]["psi"] > 0.25
    same = psi(he, he).collect()[0]["psi"]
    assert same == pytest.approx(0.0, abs=1e-12)


def test_range_join_suffixes_clashing_columns(spark):
    # ADVICE r4: shared non-key columns made downstream references
    # ambiguous; interval-side clashes now get a suffix like asof_join
    pts = spark.createDataFrame(
        [(1, 5, 1.0), (2, 25, 2.0)], "pid long, ts long, value double")
    iv = spark.createDataFrame(
        [(10, 0, 10, 9.0)], "wid long, start long, end long, value double")
    out = range_join(pts, iv, on="ts", start_col="start", end_col="end",
                     bin_width=10)
    assert "value" in out.columns and "value_right" in out.columns
    row = out.collect()[0]
    assert (row["pid"], row["wid"]) == (1, 10)
    assert row["value"] == 1.0 and row["value_right"] == 9.0


def test_range_join_suffix_on_time_columns(spark):
    # even the interval's start/end/ts columns may clash with a point
    # column name — the rename must be threaded into the bin math
    pts = spark.createDataFrame([(1, 5, 0)], "pid long, ts long, start long")
    iv = spark.createDataFrame([(10, 2, 10)], "wid long, start long, end long")
    out = range_join(pts, iv, on="ts", start_col="start", end_col="end",
                     bin_width=5)
    assert "start_right" in out.columns
    assert [(r["pid"], r["wid"]) for r in out.collect()] == [(1, 10)]


def test_token_divergence_js_properties(spark):
    from loudml_spark.pipeline.corpus import token_divergence
    import math

    a = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "alpha beta")],
        "doc_id long, text string")
    b = spark.createDataFrame(
        [(3, "alpha beta gamma alpha"), (4, "alpha beta")],
        "doc_id long, text string")
    same = token_divergence(a, b).agg(F.sum("js_contrib")).first()[0]
    assert same == pytest.approx(0.0, abs=1e-9)  # identical dists
    c = spark.createDataFrame(
        [(5, "delta delta epsilon")], "doc_id long, text string")
    rows = {r["token"]: r for r in token_divergence(a, c).collect()}
    total = sum(r["js_contrib"] for r in rows.values())
    assert 0.0 < total <= math.log(2.0) + 1e-9  # JS bound
    # disjoint vocabularies → maximal JS (= ln 2)
    assert total == pytest.approx(math.log(2.0), abs=1e-6)
    assert rows["alpha"]["q"] == 0.0 and rows["delta"]["p"] == 0.0


def test_tokens_ngrams(spark):
    from loudml_spark.pipeline.corpus import tokens

    df = spark.createDataFrame(
        [(1, "One two, three"), (2, "solo")], "doc_id long, text string")
    bi = sorted(r["token"] for r in tokens(df, n=2).collect())
    assert bi == ["one two", "two three"]  # lowered, punct-robust
    # doc shorter than n yields nothing, not an error
    tri = [r["token"] for r in tokens(
        df.filter("doc_id = 2"), n=3).collect()]
    assert tri == []
