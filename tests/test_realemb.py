"""Realistic-embedding fixture (pipeline/realemb.py): generator
determinism, committed-parquet freshness, and the geometry
properties the ANN/clustering/semdedup gates are re-measured on
(the embedding-family counterpart of tests/test_realtext.py)."""

import os

import numpy as np
import pytest

from loudml_spark.pipeline.realemb import (
    DUP_MIN_ID, K_CLUSTERS, N_VECS, SEED, cluster_sizes,
    corpus_digest, realemb_fixture_path, realemb_rows)


@pytest.fixture(scope="module")
def rows():
    return realemb_rows()


@pytest.fixture(scope="module")
def X(rows):
    return np.array([r[1] for r in rows], dtype=np.float64)


def test_generator_is_deterministic(rows):
    again = realemb_rows(N_VECS, SEED)
    assert corpus_digest(rows) == corpus_digest(again)
    assert len(rows) == N_VECS


def test_committed_fixture_matches_generator(spark, rows):
    """The freshness gate: the committed parquet must be exactly the
    generator's output — regenerate with tools/make_realemb.py
    after any generator change."""
    path = realemb_fixture_path()
    assert os.path.exists(path), "run tools/make_realemb.py"
    disk = [(r["vec_id"], r["embedding"], r["label"], r["dup_of"])
            for r in spark.read.parquet(path).orderBy("vec_id")
            .collect()]
    assert corpus_digest(disk) == corpus_digest(rows)


def test_unit_norm_float32(rows):
    """Encoder-output convention: unit vectors quantized to float32
    (normalize-then-quantize leaves norms within one ulp-per-coord
    of 1)."""
    for _, emb, _, _ in rows[:200]:
        assert abs(sum(v * v for v in emb) - 1.0) < 1e-5


def test_power_law_cluster_sizes(rows):
    sizes = cluster_sizes()
    assert len(sizes) == K_CLUSTERS and sum(sizes) == N_VECS
    assert sizes[0] / sizes[-1] > 10     # head/tail ratio, not blobs
    organic = [r for r in rows if r[3] is None]
    got = np.bincount([r[2] for r in organic], minlength=K_CLUSTERS)
    # organic counts follow the size schedule (dups inherit their
    # source's label, only nudging counts upward)
    assert got.argmax() == 0


def test_cone_concentration_and_anisotropy(X):
    """The two properties Gaussian blobs lack: random pairs are NOT
    near-orthogonal, and variance concentrates in few directions
    (driver blobs measure mean_cos 0.001 / top1 share 0.028 —
    tools/realemb_knobs.py)."""
    rs = np.random.RandomState(0)
    i, j = rs.randint(0, len(X), 5000), rs.randint(0, len(X), 5000)
    m = i != j
    cos = np.einsum("ij,ij->i", X[i[m]], X[j[m]])
    assert 0.2 < cos.mean() < 0.6
    ev = np.sort(np.linalg.eigvalsh(np.cov(X.T)))[::-1]
    assert ev[0] / ev.sum() > 0.15
    assert ev[:5].sum() / ev.sum() > 0.45


def test_hubness(X):
    """Right-skewed k-occurrence with antihubs (Radovanović 2010) —
    blobs measure skew 0.33 with zero antihubs."""
    S = X @ X.T
    np.fill_diagonal(S, -2.0)
    topk = np.argpartition(-S, 10, axis=1)[:, :10]
    occ = np.bincount(topk.ravel(), minlength=len(X)).astype(float)
    skew = ((occ - occ.mean()) ** 3).mean() / occ.std() ** 3
    assert skew > 1.2
    assert (occ == 0).mean() > 0.01      # antihubs exist


def test_planted_dups_separate_from_organic(rows, X):
    """Dup pairs sit above 0.98 cosine; the organic p99.9 sits below
    0.95 — a threshold in between recovers dups without drowning in
    organic neighbors (the semdedup regime)."""
    planted = [(a, b) for a, (_, _, _, b) in enumerate(rows)
               if b is not None]
    assert len(planted) > 150
    assert all(a >= DUP_MIN_ID for a, _ in planted)
    dup_cos = np.array([float(X[a] @ X[b]) for a, b in planted])
    assert dup_cos.min() > 0.98
    S = X @ X.T
    np.fill_diagonal(S, -2.0)
    # chain-closure mask: any pair within one dup family is planted
    parent = list(range(len(rows)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in planted:
        parent[find(a)] = find(b)
    root = np.array([find(i) for i in range(len(rows))])
    organic_mask = root[:, None] != root[None, :]
    assert np.quantile(S[organic_mask], 0.999) < 0.95


def test_cosine_topk_prefilter_exact_under_ties(spark):
    """The r12 per-batch prefilter must not change the global
    rounded-ranked top-k even when many rows tie at 6dp: a corpus of
    duplicated vectors (identical cosines to every query) forces the
    tie path; the result must equal the unfiltered reference ranking
    (round 6dp desc, id asc) computed independently."""
    import numpy as np

    from loudml_spark.pipeline.similarity import cosine_topk

    rng = np.random.RandomState(3)
    base = rng.randn(6, 8)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # 48 vectors = each base vector duplicated 8× → massive 6dp ties
    vecs = [(i, [float(x) for x in base[i % 6]]) for i in range(48)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>").repartition(4)
    out = cosine_topk(df.filter("vec_id < 3"), df, k=5)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in out.collect()}
    X = np.array([v for _, v in vecs])
    for qid in range(3):
        cos = np.round(X @ X[qid], 6)
        order = sorted(
            (i for i in range(48) if i != qid),
            key=lambda i: (-cos[i], i))[:5]
        for rank, nid in enumerate(order, 1):
            assert got[(qid, rank)] == nid, (qid, rank)
