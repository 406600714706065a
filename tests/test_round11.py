"""Round-11 closures: degree-ordered triangle orientation on hub
graphs, pagerank lineage truncation, kmv_jaccard join-shape rewrite,
streaming in-order guards."""

import random

import pytest


# ------------------------------------- triangles on a hub (power-law)


def _brute_triangles(edges):
    """Plain-Python per-node triangle counts over an undirected
    simple graph — the independent reference."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    seen = set()
    for a, b in [(x, y) for x, ns in adj.items() for y in ns if x < y]:
        for c in adj[a] & adj[b]:
            t = tuple(sorted((a, b, c)))
            if t not in seen:
                seen.add(t)
                for v in t:
                    tri[v] += 1
    deg = {v: len(ns) for v, ns in adj.items()}
    return {
        v: (deg[v], tri[v],
            2.0 * tri[v] / (deg[v] * (deg[v] - 1)) if deg[v] >= 2
            else 0.0)
        for v in adj
    }


def test_triangle_stats_seeded_hub_graph(spark):
    """The regime the degree-ordered orientation exists for: one hub
    wired to every leaf (the over-eager-LSH-band false-positive
    shape) plus random leaf-leaf edges.  Values must match the
    plain-Python brute force exactly — orientation changes the join
    plan, never the triangle set."""
    from loudml_spark.pipeline.graph import triangle_stats

    rng = random.Random(11)
    hub, leaves = 0, list(range(1, 41))
    edges = [(hub, v) for v in leaves]
    # sprinkle leaf-leaf edges: every one closes a triangle via hub
    for _ in range(60):
        a, b = rng.sample(leaves, 2)
        edges.append((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(
        sorted(set(edges)), "id_a long, id_b long")
    got = {r["id"]: (r["degree"], r["n_triangles"], r["coeff"])
           for r in triangle_stats(pairs).collect()}
    want = _brute_triangles(set(edges))
    assert set(got) == set(want)
    for v, (d, t, c) in want.items():
        assert got[v][0] == d and got[v][1] == t
        assert got[v][2] == pytest.approx(c, abs=1e-12)
    # the hub participates in one triangle per leaf-leaf edge
    assert got[hub][1] == len({e for e in set(edges) if hub not in e})


def test_triangle_orientation_is_degree_ordered(spark):
    """Structural check on the oriented-edge frame: on a star graph
    the hub sorts LAST in the (degree, id) order, so every oriented
    edge points INTO the hub and the wedge join is empty — under id
    order a mid-sorting hub would fan out deg^2 wedges."""
    from pyspark.sql import functions as F

    from loudml_spark.pipeline.graph import triangle_stats

    # hub id 20 sorts in the MIDDLE by id: id order would give it
    # both in- and out-edges (deg-/deg+ ~ n/2 each -> ~n^2/4 wedges)
    hub, n = 20, 41
    pairs = spark.createDataFrame(
        [(hub, v) for v in range(n) if v != hub],
        "id_a long, id_b long")
    out = triangle_stats(pairs)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[hub]["degree"] == n - 1
    assert all(r["n_triangles"] == 0 for r in rows.values())
    # and the executed plan stays equi-join only (no cartesian)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------- pagerank lineage truncation


def test_pagerank_plan_depth_flat_in_n_iter(spark):
    """The per-iteration localCheckpoint keeps the optimized plan a
    constant two lines however many iterations run — and the ranks
    at higher n_iter still converge toward the stationary
    distribution (monotone on the hub node)."""
    from loudml_spark.pipeline.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "id_a long, id_b long")
    depths = {}
    for it in (1, 5, 20):
        pr = pagerank(edges, n_iter=it)
        depths[it] = (pr._jdf.queryExecution()
                      .optimizedPlan().toString().count("\n"))
    assert depths[1] == depths[5] == depths[20]
    got = {r.id: r.pagerank for r in
           pagerank(edges, n_iter=20).collect()}
    assert got[3] == max(got.values())     # hub stays on top
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


# -------------------------------------- kmv_jaccard pairwise stage


def test_kmv_jaccard_max_sets_gate_and_join_shape(spark):
    from loudml_spark import errors
    from loudml_spark.operators.sketch import kmv_jaccard

    rows = [(f"u{s}{i}", f"s{s}") for s in range(5) for i in range(8)]
    df = spark.createDataFrame(rows, "uid string, grp string")
    out = kmv_jaccard(df, key_col="uid", set_col="grp", k=16)
    # all 5*4/2 pairs appear, disjoint sets estimate 0
    got = out.collect()
    assert len(got) == 10
    assert all(r["est_jaccard"] == 0.0 for r in got)
    # the pairwise stage is a broadcast equi-join against the
    # partner frame — no literal CASE tower, no cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    with pytest.raises(errors.Invalid, match="max_sets"):
        kmv_jaccard(df, key_col="uid", set_col="grp", max_sets=4)
    with pytest.raises(errors.Invalid):
        kmv_jaccard(df, key_col="uid", set_col="grp", max_sets=1)


def test_kmv_jaccard_long_set_ids(spark):
    """The partner frame must carry the sketch frame's set dtype —
    exercised with bigint set ids."""
    from loudml_spark.operators.sketch import kmv_jaccard

    rows = [(f"k{i}", 10) for i in range(20)] + \
           [(f"k{i}", 20) for i in range(10, 30)]
    df = spark.createDataFrame(rows, "uid string, grp long")
    got = {(r["set_a"], r["set_b"]): r["est_jaccard"]
           for r in kmv_jaccard(
               df, key_col="uid", set_col="grp", k=64).collect()}
    # 10 shared of 30 union, k covers the union -> exact 1/3
    assert got[(10, 20)] == pytest.approx(1 / 3, abs=1e-6)


# ------------------------------------ streaming in-order enforcement


def _stage_two_files(spark, tmp_path, first, second):
    """Write two parquet files with strictly increasing mtimes so
    FileStreamSource (maxFilesPerTrigger=1) delivers them as two
    micro-batches in write order."""
    import time as _time

    schema = "event_type string, bucket_ts long, value double"
    spark.createDataFrame(first, schema) \
        .coalesce(1).write.mode("append").parquet(str(tmp_path))
    _time.sleep(0.3)
    spark.createDataFrame(second, schema) \
        .coalesce(1).write.mode("append").parquet(str(tmp_path))
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(str(tmp_path)))


KALMAN_COLS = ["event_type", "bucket_ts", "value", "level", "gain",
               "variance"]


def test_stream_kalman_out_of_order_batch_errors(spark, tmp_path):
    """The in-order contract is enforced, not assumed: a second
    micro-batch whose rows precede the max already-processed ts
    fails the query with a named error."""
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException)

    from loudml_spark.streaming.job import (
        drain_stream_to_df, stream_kalman_level)

    newer = [("a", t, float(t)) for t in range(15, 30)]
    older = [("a", t, float(t)) for t in range(15)]
    stream = _stage_two_files(spark, tmp_path, newer, older)
    with pytest.raises(StreamingQueryException,
                       match="out-of-order micro-batch"):
        drain_stream_to_df(
            stream_kalman_level(stream), KALMAN_COLS,
            output_mode="append", prefix="t_ooo_err")


def test_stream_kalman_out_of_order_skip_drops_late_rows(spark,
                                                         tmp_path):
    """on_late='skip' drops the stragglers and keeps the filter
    trajectory identical to the batch operator over the rows that
    were actually in order."""
    from loudml_spark.operators.tsmath import kalman_level
    from loudml_spark.streaming.job import (
        drain_stream_to_df, stream_kalman_level)

    newer = [("a", t, float((t * 3) % 7)) for t in range(15, 30)]
    older = [("a", t, float(t)) for t in range(15)]
    stream = _stage_two_files(spark, tmp_path, newer, older)
    got = drain_stream_to_df(
        stream_kalman_level(stream, on_late="skip"), KALMAN_COLS,
        output_mode="append", prefix="t_ooo_skip")
    want = kalman_level(
        spark.createDataFrame(
            newer, "event_type string, bucket_ts long, value double"),
        by=["event_type"])
    assert (sorted(tuple(r) for r in got.collect())
            == sorted(tuple(r) for r in want.collect()))


def test_stream_page_hinkley_out_of_order_batch_errors(spark,
                                                       tmp_path):
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException)

    from loudml_spark.streaming.job import (
        drain_stream_to_df, stream_page_hinkley)

    newer = [("a", t, float(t)) for t in range(10, 20)]
    older = [("a", t, float(t)) for t in range(10)]
    stream = _stage_two_files(spark, tmp_path, newer, older)
    with pytest.raises(StreamingQueryException,
                       match="out-of-order micro-batch"):
        drain_stream_to_df(
            stream_page_hinkley(stream),
            ["event_type", "bucket_ts", "value", "ph", "is_change"],
            output_mode="append", prefix="t_ph_ooo")


def test_stream_guard_validates_on_late(spark):
    from loudml_spark import errors
    from loudml_spark.streaming.job import (
        stream_kalman_level, stream_page_hinkley)

    df = spark.createDataFrame(
        [("a", 0, 1.0)],
        "event_type string, bucket_ts long, value double")
    with pytest.raises(errors.Invalid):
        stream_kalman_level(df, on_late="nope")
    with pytest.raises(errors.Invalid):
        stream_page_hinkley(df, on_late="nope")


# --------------------------------------------- weighted pagerank


def _numpy_weighted_pagerank(edges, d=0.85, n_iter=5, r=9):
    """Independent replica of the weighted recursion with the same
    rounding/decimal discipline (edges: (a, b, w))."""
    nodes = sorted({x for a, b, _ in edges for x in (a, b)})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = [[] for _ in range(n)]
    wsum = [0.0] * n
    for a, b, w in edges:
        adj[idx[a]].append((idx[b], w))
        adj[idx[b]].append((idx[a], w))
        wsum[idx[a]] += w
        wsum[idx[b]] += w
    ranks = [round(1.0 / n, r)] * n
    base = (1.0 - d) / n
    for _ in range(n_iter):
        new = [0.0] * n
        for u in range(n):
            for v, w in adj[u]:
                new[v] += round(ranks[u] * (w / wsum[u]), r)
        ranks = [round(base + d * s, r) for s in new]
    return {v: ranks[idx[v]] for v in nodes}


def test_pagerank_weighted_matches_reference(spark):
    from loudml_spark.pipeline.graph import pagerank

    edges = [(1, 2, 0.95), (2, 3, 0.80), (1, 3, 0.90), (3, 4, 0.85)]
    df = spark.createDataFrame(
        edges, "id_a long, id_b long, jaccard double")
    got = {r.id: r.pagerank for r in
           pagerank(df, weight_col="jaccard").collect()}
    want = _numpy_weighted_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_weighted_pulls_rank_toward_heavy_edges(spark):
    """A path graph 1-2-3 where the 2-3 link is much heavier: node 3
    must outrank node 1 (symmetric under equal weights)."""
    from loudml_spark.pipeline.graph import pagerank

    df = spark.createDataFrame(
        [(1, 2, 0.1), (2, 3, 0.9)], "id_a long, id_b long, w double")
    got = {r.id: r.pagerank for r in
           pagerank(df, weight_col="w").collect()}
    assert got[3] > got[1]
    even = {r.id: r.pagerank for r in pagerank(
        spark.createDataFrame([(1, 2, 0.5), (2, 3, 0.5)],
                              "id_a long, id_b long, w double"),
        weight_col="w").collect()}
    assert even[1] == even[3]


def test_pagerank_weighted_validates(spark):
    from loudml_spark import errors
    from loudml_spark.pipeline.graph import pagerank

    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(errors.Invalid, match="missing column"):
        pagerank(df, weight_col="jaccard")


# ------------------------------------------------ component census


def test_component_stats_hand_graph(spark):
    """Triangle {1,2,3} + pendant 4 is ONE component (n=4, m=4,
    density 2/3); a separate K3 {10,11,12} is a second (density 1);
    singleton 99 (self-loop only) is excluded."""
    from loudml_spark.pipeline.graph import component_stats

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4),
         (10, 11), (11, 12), (12, 10), (99, 99)],
        "id_a long, id_b long")
    got = {r["cluster_id"]: (r["n_nodes"], r["n_edges"], r["density"])
           for r in component_stats(pairs).collect()}
    assert got[1] == (4, 4, pytest.approx(2 / 3, abs=1e-6))
    assert got[10] == (3, 3, 1.0)
    assert len(got) == 2


def test_component_stats_validates(spark):
    from loudml_spark import errors
    from loudml_spark.pipeline.graph import component_stats

    pairs = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(errors.Invalid):
        component_stats(pairs)
