"""Measure the realemb fixture's geometry vs the driver's Gaussian
blobs — the tuning/evidence tool for pipeline/realemb.py (the
realtext_knobs.py counterpart for the embedding family).

Prints, for BOTH corpora:
  - mean / p95 pairwise cosine on a seeded sample (cone concentration;
    isotropic blobs sit near 0)
  - spectral shares: top-1 / top-5 eigenvalue share of the covariance
    (anisotropy; isotropic-ish blobs spread it ~evenly over d)
  - hubness: skewness + max of the 10-occurrence distribution
    (how many times each point appears in others' exact top-10)
  - cluster-size head/tail shares
  - planted-dup cosine floor vs organic ceiling (realemb only)

Usage: python tools/realemb_knobs.py [driver_embeddings.parquet]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loudml_spark.pipeline.realemb import realemb_rows  # noqa: E402


def load_driver(path):
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding, label FROM read_parquet('{path}') "
        "ORDER BY vec_id").fetchall()
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X, np.array([r[2] for r in rows]), None


def stats(name, X, labels, dup_of):
    n, d = X.shape
    rs = np.random.RandomState(0)
    i = rs.randint(0, n, 20000)
    j = rs.randint(0, n, 20000)
    m = i != j
    cos = np.einsum("ij,ij->i", X[i[m]], X[j[m]])
    cov = np.cov(X.T)
    ev = np.sort(np.linalg.eigvalsh(cov))[::-1]
    shares = ev / ev.sum()
    S = X @ X.T
    np.fill_diagonal(S, -2.0)
    k = 10
    topk = np.argpartition(-S, k, axis=1)[:, :k]
    occ = np.bincount(topk.ravel(), minlength=n).astype(float)
    sk = float(((occ - occ.mean()) ** 3).mean() / occ.std() ** 3)
    sizes = np.sort(np.bincount(labels))[::-1]
    out = {
        "corpus": name, "n": n, "d": d,
        "mean_cos": round(float(cos.mean()), 4),
        "p95_cos": round(float(np.quantile(cos, 0.95)), 4),
        "top1_var_share": round(float(shares[0]), 4),
        "top5_var_share": round(float(shares[:5].sum()), 4),
        "hub_skew_N10": round(sk, 3),
        "hub_max_N10": int(occ.max()),
        "antihub_frac": round(float((occ == 0).mean()), 4),
        "cluster_head_share": round(float(sizes[0] / n), 4),
        "cluster_tail_share": round(float(sizes[-1] / n), 5),
        "n_clusters": int(len(sizes)),
    }
    if dup_of is not None:
        planted = [(a, b) for a, b in enumerate(dup_of) if b >= 0]
        dup_cos = np.array([float(X[a] @ X[b]) for a, b in planted])
        mask = np.ones((n, n), dtype=bool)
        np.fill_diagonal(mask, False)
        for a, b in planted:
            mask[a, b] = mask[b, a] = False
            # transitive copies of the same source also collide high
        chain = {}
        for a, b in planted:
            chain.setdefault(b, [b]).append(a)
            if b in [x for v in chain.values() for x in v]:
                pass
        out["n_planted_dups"] = len(planted)
        out["dup_cos_min"] = round(float(dup_cos.min()), 4)
        out["organic_p999"] = round(
            float(np.quantile(S[mask], 0.999)), 4)
        out["organic_max"] = round(float(S[mask].max()), 4)
    print(out)


def main():
    rows = realemb_rows()
    X = np.array([r[1] for r in rows], dtype=np.float64)
    labels = np.array([r[2] for r in rows])
    dup_of = np.array([-1 if r[3] is None else r[3] for r in rows])
    stats("realemb", X, labels, dup_of)
    drv = (sys.argv[1] if len(sys.argv) > 1
           else "/root/testdata/sf0.01/embeddings.parquet")
    if os.path.exists(drv):
        Xd, ld, _ = load_driver(drv)
        stats("driver-blobs", Xd, ld, None)


if __name__ == "__main__":
    main()
