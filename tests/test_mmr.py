"""pipeline/similarity.py mmr_topk: diversity behavior on a
constructed geometry, pure-relevance limit, validation."""

import pytest

from loudml_spark import errors
from loudml_spark.pipeline.similarity import mmr_topk


@pytest.fixture()
def geometry(spark):
    # query (1,.2): rel id2=.9952 > id1=.9806 > id3=.7452; but id1
    # and id2 are near-parallel (cos .9950) while id3 is diverse
    # (cos(3,2)=.6766) — a non-degenerate MMR geometry (a query
    # parallel to a candidate makes every step an exact tie)
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [10.0, 1.0]), (3, [0.6, 0.8])],
        "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(100, [1.0, 0.2])], "vec_id long, embedding array<float>")
    return queries, corpus


def test_mmr_prefers_diversity(spark, geometry):
    queries, corpus = geometry
    out = mmr_topk(queries, corpus, k=2, pool=3, lam=0.5)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    # rank 1: best relevance (id2); rank 2: the DIVERSE candidate
    # (id3), even though the near-duplicate id1 has higher relevance
    # (.5*.9806-.5*.9950 < 0  vs  .5*.7452-.5*.6766 > 0)
    assert [r.neighbor_id for r in rows] == [2, 3]
    assert rows[0].relevance == pytest.approx(0.995229, abs=1e-6)
    assert rows[1].relevance == pytest.approx(0.745241, abs=1e-6)


def test_mmr_lam_1_is_pure_relevance(spark, geometry):
    queries, corpus = geometry
    out = mmr_topk(queries, corpus, k=3, pool=3, lam=1.0)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.neighbor_id for r in rows] == [2, 1, 3]
    # with lam=1 the mmr score IS the relevance
    for r in rows:
        assert r.mmr_score == pytest.approx(r.relevance)


def test_mmr_multiple_queries_keyed(spark, geometry):
    _, corpus = geometry
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0]), (200, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    out = mmr_topk(queries, corpus, k=2, pool=3, lam=0.5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {100, 200}
    assert all(len(v) == 2 for v in by_q.values())


def test_mmr_validation(spark, geometry):
    queries, corpus = geometry
    with pytest.raises(errors.Invalid):
        mmr_topk(queries, corpus, k=5, pool=3)
    with pytest.raises(errors.Invalid):
        mmr_topk(queries, corpus, k=0)
    with pytest.raises(errors.Invalid):
        mmr_topk(queries, corpus, lam=1.5)
