"""pipeline/graph.py: PageRank vs an independent numpy power
iteration, mass conservation, repartition determinism."""

import numpy as np
import pytest

from loudml_spark import errors
from loudml_spark.pipeline.graph import pagerank

EDGES = [(1, 2), (2, 3), (1, 3), (3, 4)]   # triangle + pendant


def _numpy_pagerank(edges, d=0.85, n_iter=5, r=9):
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = [[] for _ in range(n)]
    deg = np.zeros(n)
    for a, b in edges:
        adj[idx[a]].append(idx[b])
        adj[idx[b]].append(idx[a])
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    ranks = np.full(n, round(1.0 / n, r))
    base = (1.0 - d) / n
    for _ in range(n_iter):
        new = np.zeros(n)
        for u in range(n):
            c = round(ranks[u] / deg[u], r)
            for v in adj[u]:
                new[v] += c
        ranks = np.array([round(base + d * s, r) for s in new])
    return {v: ranks[idx[v]] for v in nodes}


@pytest.fixture()
def edge_df(spark):
    return spark.createDataFrame(EDGES, "id_a long, id_b long")


def test_pagerank_matches_numpy_reference(spark, edge_df):
    got = {r.id: r.pagerank for r in pagerank(edge_df).collect()}
    want = _numpy_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-9)
    # node 3 touches everything: highest centrality; pendant 4 lowest
    assert got[3] == max(got.values())
    assert got[4] == min(got.values())


def test_pagerank_mass_conserved(spark, edge_df):
    total = sum(r.pagerank for r in pagerank(edge_df).collect())
    assert total == pytest.approx(1.0, abs=1e-6)


def test_pagerank_regular_graph_is_uniform(spark):
    # 4-cycle: every node degree 2 -> uniform stationary ranks
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "id_a long, id_b long")
    ranks = [r.pagerank for r in pagerank(cyc).collect()]
    assert all(x == pytest.approx(0.25, abs=1e-9) for x in ranks)


def test_pagerank_deterministic_under_repartition(spark, edge_df):
    a = sorted(map(tuple, pagerank(edge_df).collect()))
    b = sorted(map(tuple, pagerank(edge_df.repartition(7)).collect()))
    assert a == b


def test_pagerank_validation(spark, edge_df):
    with pytest.raises(errors.Invalid):
        pagerank(edge_df, damping=1.0)
    with pytest.raises(errors.Invalid):
        pagerank(edge_df, n_iter=0)
    with pytest.raises(errors.Invalid):
        pagerank(edge_df, src_col="nope")
