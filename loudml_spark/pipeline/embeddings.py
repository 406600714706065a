"""Embedding-column aggregate operators.

Vector columns (``array<float>``) are first-class in a training-data
pipeline: normalize them, average them per group (cluster centroids,
per-source/per-language corpus profiles), measure spread.  The
aggregation shape matters at 100 TB:

* ``normalize`` / ``vec_norm`` are pure Column HOF math — map-only.
* ``group_centroids`` POSEXPLODES to (group, dim, value) rows and
  aggregates per (group, dim): 64× row amplification, but every
  (group, dim) partial reduces MAP-SIDE, so the shuffle carries
  |groups|·|dims| aggregates — independent of corpus size.  A
  collect_list-then-numpy formulation would shuffle every vector.
  The exploded rows never materialize (codegen pipelines scan →
  explode → partial agg).

All math stays in float64 with engine-portable expression trees; the
oracle recomputes centroids via UNNEST WITH ORDINALITY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from loudml_spark import errors


def vec_norm(vec: Column) -> Column:
    """L2 norm of a float-array column (fold in float64)."""
    return F.sqrt(F.aggregate(
        vec, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    ))


def normalize(vec: Column, *, eps: float = 1e-12) -> Column:
    """Unit-norm copy of a float-array column (zero vectors stay
    zero via the eps clamp, matching the numpy convention used by
    the ANN/k-means paths)."""
    n = F.greatest(vec_norm(vec), F.lit(float(eps)))
    return F.transform(vec, lambda x: x.cast("double") / n)


def group_centroids(
    df: DataFrame,
    *,
    group_col: str,
    vec_col: str = "embedding",
    out_col: str = "centroid",
) -> DataFrame:
    """Per-group mean vector: ``(group_col, n_vectors, out_col)``.

    posexplode → per-(group, dim) avg (map-side combined) →
    re-assemble the dim-sorted array.  Output rows = |groups|, each
    carrying a |dim| array; the only shuffle moves |groups|·|dims|
    partial aggregates.
    """
    if group_col not in df.columns or vec_col not in df.columns:
        raise errors.Invalid(
            f"missing column: need {group_col!r} and {vec_col!r}")
    exploded = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("__dim", "__v"),
    )
    per_dim = exploded.groupBy(group_col, "__dim").agg(
        F.avg(F.col("__v").cast("double")).alias("__avg"),
        F.count("*").alias("__n"),
    )
    return (
        per_dim.groupBy(group_col)
        .agg(
            (F.sum("__n") / F.count("*")).cast("long").alias("n_vectors"),
            F.array_sort(
                F.collect_list(F.struct("__dim", "__avg"))
            )["__avg"].alias(out_col),
        )
    )


def centroid_similarity(
    df: DataFrame,
    *,
    group_col: str,
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Pairwise cosine between GROUP CENTROIDS — the embedding-space
    drift/affinity monitor (are two sources/snapshots drifting apart?
    which corpus slices are semantically close?).

    Join discipline: the pair computation is an EQUI-join on the
    dimension index over the per-(group, dim) averages — never a
    non-equi pair join of assembled vectors (which would plan as a
    nested-loop).  Intermediate size is |groups|²·|dims| partial
    products, independent of corpus row count; norms reduce per group
    and broadcast back onto the bounded pair frame.

    Returns (grp_a, grp_b, cosine) for grp_a < grp_b, cosine rounded
    to ``round_to`` (summation-order ulps).
    """
    if group_col not in df.columns or vec_col not in df.columns:
        raise errors.Invalid(
            f"missing column: need {group_col!r} and {vec_col!r}")
    per_dim = (
        df.select(
            F.col(group_col).alias("__g"),
            F.posexplode(F.col(vec_col)).alias("__dim", "__v"),
        )
        .groupBy("__g", "__dim")
        .agg(F.avg(F.col("__v").cast("double")).alias("__a"))
    )
    norms = per_dim.groupBy("__g").agg(
        F.sqrt(F.sum(F.col("__a") * F.col("__a"))).alias("__norm"))
    a = per_dim.select(F.col("__g").alias("grp_a"), "__dim",
                       F.col("__a").alias("__va"))
    b = per_dim.select(F.col("__g").alias("grp_b"), "__dim",
                       F.col("__a").alias("__vb"))
    dots = (
        a.join(b, "__dim")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.sum(F.col("__va") * F.col("__vb")).alias("__dot"))
    )
    na = norms.select(F.col("__g").alias("grp_a"),
                      F.col("__norm").alias("__na"))
    nb = norms.select(F.col("__g").alias("grp_b"),
                      F.col("__norm").alias("__nb"))
    return (
        dots.join(F.broadcast(na), "grp_a")
        .join(F.broadcast(nb), "grp_b")
        .select(
            "grp_a", "grp_b",
            F.round(
                F.col("__dot") / (F.col("__na") * F.col("__nb")),
                round_to,
            ).alias("cosine"),
        )
    )


def embedding_covariance(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Population covariance matrix of a vector column as rows
    ``(i, j, n, cov)`` for i <= j — the input to PCA, whitening, or
    Mahalanobis scoring over embeddings.

    Scale shape (the standard distributed-PCA first pass): each
    partition accumulates its d×d Gram, dim sums and count in ONE
    numpy pass (Arrow batches, BLAS GEMM — this is a justified
    Pandas-UDF hot path: the per-row HOF formulation would explode
    rows × d² cells through the shuffle), then emits d(d+1)/2 partial
    rows.  The only shuffle carries partitions × d(d+1)/2 partials —
    independent of corpus row count.  cov = Σxy/n − (Σx/n)(Σy/n).
    """
    import numpy as np

    if vec_col not in df.columns:
        raise errors.Invalid(f"missing column {vec_col!r}")
    schema = "i int, j int, sxx double, sx double, sy double, n long"

    def gram(it):
        for pdf in it:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            d = x.shape[1]
            g = x.T @ x
            s = x.sum(axis=0)
            iu, ju = np.triu_indices(d)
            import pandas as pd

            yield pd.DataFrame({
                "i": iu.astype("int32"), "j": ju.astype("int32"),
                "sxx": g[iu, ju], "sx": s[iu], "sy": s[ju],
                "n": np.full(len(iu), len(x), dtype="int64")})

    partials = df.select(vec_col).mapInPandas(gram, schema=schema)
    n, sxx, sx, sy = (F.col("n"), F.col("sxx"), F.col("sx"), F.col("sy"))
    out = partials.groupBy("i", "j").agg(
        F.sum("n").alias("n"), F.sum("sxx").alias("sxx"),
        F.sum("sx").alias("sx"), F.sum("sy").alias("sy"))
    cov = (F.col("sxx") / F.col("n")
           - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n")))
    if round_to is not None:
        cov = F.round(cov, round_to)
    return out.select("i", "j", "n", cov.alias("cov"))


def pca_fit(df: DataFrame, *, k: int, vec_col: str = "embedding"):
    """Fit PCA: distributed covariance (one Gram pass), then an
    eigendecomposition of the d×d matrix ON THE DRIVER — d², not
    n·d, is what crosses the wire, so this is exact PCA at any
    corpus size as long as d stays sane (≤ a few thousand).

    Returns ``(components, explained_ratio)``: components is a
    k×d numpy array (rows = descending-eigenvalue eigenvectors,
    sign-fixed so each row's max-|coefficient| entry is positive —
    eigh's sign is otherwise arbitrary), explained_ratio the k
    eigenvalue shares.
    """
    import numpy as np

    if k < 1:
        raise errors.Invalid(f"k must be >= 1, got {k}")
    rows = embedding_covariance(
        df, vec_col=vec_col, round_to=None).collect()
    if not rows:
        raise errors.Invalid("no vectors to fit")
    d = max(r["j"] for r in rows) + 1
    if k > d:
        raise errors.Invalid(f"k={k} exceeds dimension {d}")
    c = np.zeros((d, d))
    for r in rows:
        c[r["i"], r["j"]] = c[r["j"], r["i"]] = r["cov"]
    w, v = np.linalg.eigh(c)          # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T             # k×d
    for row in comps:                 # deterministic sign
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1
    total = float(np.sum(np.clip(w, 0, None))) or 1.0
    ratio = [float(np.clip(w[o], 0, None)) / total for o in order]
    return comps, ratio


def pca_project(
    df: DataFrame,
    components,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto fitted components: adds ``out_col`` as an
    array<double> of length k.  The k×d component matrix rides into
    the plan as LITERALS (a few KB — the broadcast-free way to ship a
    small model), and each projection is a zip_with/aggregate dot
    product — pure Column math, whole-stage codegen, no UDF."""
    if vec_col not in df.columns:
        raise errors.Invalid(f"missing column {vec_col!r}")
    from loudml_spark.litexpr import lit_doubles

    comps = [[float(x) for x in row] for row in components]
    vec = F.col(vec_col)
    dots = [
        F.aggregate(
            F.zip_with(vec, lit_doubles(row),
                       lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, x: acc + x)
        for row in comps
    ]
    return df.withColumn(out_col, F.array(*dots))


# portable affine sample-rank constants (shared verbatim by the
# oracle SQL — same family as pipeline/corpus.py CMS_A/CMS_B)
SAMPLE_A = 1299721
SAMPLE_B = 15485863
SAMPLE_MOD = 1_000_000_007


def _pca_fit_arrays(x, k: int, *, eps: float = 1e-9):
    """Deterministic PCA fit from a (n, d) float64 array: population
    covariance in ONE numpy pass over rows sorted by the caller,
    eigh, descending eigenvalues, sign-fixed rows.  SHARED by the
    Spark operator and the DuckDB oracle generator — identical bits
    in, identical components out (the catalog_oracle_ml.py replay
    contract).  Returns (mean[d], comps[k,d], eigvals[k])."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    mean = x.mean(axis=0)
    xc = x - mean
    cov = (xc.T @ xc) / len(x)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T.copy()
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1
    eig = np.clip(w[order], eps, None)
    return mean, comps, eig


def pca_fit_sample(
    df: DataFrame,
    *,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = 2048,
):
    """Bit-reproducible PCA fit on a bounded deterministic sample:
    the ``max_rows`` vectors with the smallest PORTABLE affine hash
    of the id (``(id·1299721 + 15485863) mod 1e9+7`` — pure int64
    math both engines compute identically; xxhash64 would be
    Spark-only), selected with TakeOrdered (no full sort), collected
    to the driver SORTED BY ID and fit in one numpy pass.  The same
    bounded-sample training discipline as IVF k-means
    (similarity.py): the corpus never collects, the fit is
    deterministic regardless of partitioning, and the artifact
    replays exactly in the oracle."""
    import numpy as np

    if k < 1:
        raise errors.Invalid(f"k must be >= 1, got {k}")
    for c in (vec_col, id_col):
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")
    rank = F.pmod(
        F.col("__id").cast("long") * F.lit(SAMPLE_A) + F.lit(SAMPLE_B),
        F.lit(SAMPLE_MOD))
    rows = (
        df.select(F.col(id_col).alias("__id"),
                  F.col(vec_col).alias("__v"))
        .orderBy(rank, F.col("__id"))
        .limit(int(max_rows)).collect()
    )
    if not rows:
        raise errors.Invalid("no vectors to fit")
    rows.sort(key=lambda r: r["__id"])
    x = np.asarray([np.asarray(r["__v"], dtype=np.float64)
                    for r in rows])
    if k > x.shape[1]:
        raise errors.Invalid(f"k={k} exceeds dimension {x.shape[1]}")
    return _pca_fit_arrays(x, k)


def embedding_outlier_scores(
    df: DataFrame,
    *,
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = 2048,
    round_to: int = 6,
) -> DataFrame:
    """Mahalanobis-style outlier score in PCA space:
    ``sqrt(Σ_c (proj_c(x) − proj_c(μ))² / λ_c)`` over the top-k
    components — rare/corrupt embeddings (wrong modality, truncated
    vectors, adversarial inserts) score high because PCA whitening
    measures distance in units of natural corpus variance.

    Fit is the bounded-sample driver pass (:func:`pca_fit_sample`);
    scoring ships (k·d + 2k) literals into the plan and is pure
    Column math — map-only, whole-stage codegen, zero shuffle.
    Output: (id_col, outlier_score rounded).
    """
    mean, comps, eig = pca_fit_sample(
        df, k=k, vec_col=vec_col, id_col=id_col, max_rows=max_rows)
    m = comps @ mean
    proj = pca_project(df, comps, vec_col=vec_col, out_col="__p")
    terms = [
        (F.col("__p")[c] - F.lit(float(m[c]))) ** 2
        / F.lit(float(eig[c]))
        for c in range(len(m))
    ]
    score = F.sqrt(sum(terms[1:], terms[0]))
    out = proj.select(
        F.col(id_col),
        (F.round(score, round_to) + F.lit(0.0)).alias("outlier_score"))
    return out


def _dist_structs_col(vec: Column, centroids: list, *,
                      sqrt: bool = False) -> Column:
    """Array of ``(d, c)`` structs — the (squared, or root when
    ``sqrt``) L2 distance from ``vec`` to EVERY centroid, ``c`` = the
    centroid's position — the shared input of every argmin /
    rank-by-distance site (``array_min`` / ``array_sort`` over it).
    Each distance is a LEFT FOLD over zip_with so the addition order
    is fixed and identical to the oracle's list_reduce (cross-engine
    bit-parity of the argmin comparisons).

    ONE ``transform`` lambda over a nested array-of-arrays literal
    instead of k inlined per-centroid fold copies: per element the
    arithmetic is expression-identical (same zip_with left fold, same
    addition order, same double literals), and ``transform``'s index
    equals the old ``F.lit(cid)`` (both int32, same struct
    comparison), so ``array_min``/``array_sort`` results are
    bit-identical — but the expression tree carries the distance
    machinery ONCE, so analysis + codegen cost is O(k·dim) literal
    leaves + O(1) lambdas instead of O(k) full fold copies.  That
    plan cost is what dominated ``kmeans_fit`` wall-clock: each Lloyd
    iteration plans a fresh tree (new centroid literals), and at
    bench scale the per-iteration job computes a trivial k·dim
    aggregate — measured in OPTIMIZATION_r12.md.

    The literal is built as ONE parsed expression
    (:mod:`loudml_spark.litexpr`), not ``F.lit(nested_list)``:
    lit() costs one py4j round trip per element — measured 0.5–0.9 s
    of pure DRIVER time per k=8×64 argmin construction, paid every
    Lloyd iteration; the parsed doubles are bit-identical."""
    from loudml_spark.litexpr import lit_double_rows

    cents = lit_double_rows(centroids)

    def d2(c):
        return F.aggregate(
            F.zip_with(
                vec, c,
                lambda a, b: (a.cast("double") - b)
                * (a.cast("double") - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return F.transform(cents, lambda c, i: F.struct(
        (F.sqrt(d2(c)) if sqrt else d2(c)).alias("d"),
        i.alias("c")))


def kmeans_assign(
    df: DataFrame,
    centroids: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared L2) —
    the distributed half of Lloyd's k-means, and the partitioning
    primitive behind IVF cells, SemDeDup cells, and cluster-balanced
    sharding.  ``centroids`` is a bounded driver-side list (k × dim
    floats, like the IVF/PQ codebooks): it rides the PLAN as a
    constant-folded literal, so assignment is one map-only projection
    over the corpus scan — no shuffle, no join, no Python.  Ties on
    distance break to the lowest cluster id via lexicographic struct
    min (deterministic cross-engine: the fold order of the distance
    sum is fixed).

    Returns ``(id_col, cluster, dist2)`` with dist2 rounded at
    ``round_to`` (the argmin itself uses full precision).
    """
    if not centroids:
        raise errors.Invalid("centroids must be non-empty")
    vec = F.col(vec_col)
    best = F.array_min(_dist_structs_col(vec, centroids))
    return df.select(
        id_col,
        best["c"].alias("cluster"),
        F.round(best["d"], round_to).alias("dist2"),
    )


def kmeans_step(
    df: DataFrame,
    centroids: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """One Lloyd iteration, fully distributed: assign (map-only, the
    centroid literal rides the plan — see :func:`kmeans_assign`),
    then per-(cluster, dim) means via posexplode with MAP-SIDE
    partial aggregation — the shuffle carries k·dims aggregates
    however large the corpus (the group_centroids shape), never
    vectors.  Per cluster returns:

    - ``size``: member count
    - ``inertia``: Σ member dist² — the k-means objective.  Each
      member's dist² rounds at 6 dp and sums as DECIMAL, so the
      total is addition-order-independent (bit-stable cross-engine).
    - ``drift``: squared L2 between the old and new centroid — the
      convergence signal a driver loop tests against epsilon.
      Per-dim means round at 6 dp first; squared terms round at 8 dp
      and sum as DECIMAL (same portability idiom).

    Empty clusters are absent from the output (k-means restarts or
    re-seeds them upstream).
    """
    # inline the argmin projection (kmeans_assign's expression) and
    # CARRY the vector column through it — a kmeans_assign ∘ join
    # formulation would re-scan and self-join the full corpus on id
    if not centroids:
        raise errors.Invalid("centroids must be non-empty")
    vec = F.col(vec_col)
    best = F.array_min(_dist_structs_col(vec, centroids))
    assigned = df.select(
        best["c"].alias("cluster"),
        F.round(best["d"], round_to).alias("dist2"),
        vec_col,
    )
    stats = assigned.groupBy("cluster").agg(
        F.count("*").alias("size"),
        F.sum(F.round(F.col("dist2"), 6).cast("decimal(18,6)"))
        .cast("double").alias("inertia"),
    )
    per_dim = (
        assigned.select(
            "cluster", F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("cluster", "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("m"))
    )
    from loudml_spark.litexpr import lit_double_rows

    old = lit_double_rows(centroids)
    drift = per_dim.withColumn(
        "__o", F.element_at(
            F.element_at(old, F.col("cluster") + 1),
            F.col("dim") + 1),
    ).groupBy("cluster").agg(
        F.sum(
            F.round((F.col("m") - F.col("__o"))
                    * (F.col("m") - F.col("__o")), 8)
            .cast("decimal(18,8)"))
        .cast("double").alias("drift"),
    )
    return stats.join(drift, "cluster").select(
        "cluster", "size", "inertia", "drift")


def kmeans_fit(
    df: DataFrame,
    *,
    k: int = 8,
    max_iters: int = 10,
    tol: float = 1e-6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed_rule: str = "hash",
) -> tuple:
    """Full distributed Lloyd's k-means: seed deterministically,
    iterate :func:`kmeans_step`-shaped passes until every cluster's
    centroid drift falls under ``tol`` or ``max_iters`` is hit.
    Returns ``(centroids, history)`` where ``centroids`` is the
    final k×dim list and ``history`` is one record per iteration:
    ``(iter, total_inertia, max_drift, n_clusters)``.

    ``seed_rule``:

    * ``"hash"`` (default) — the k vectors with the lowest
      ``md5(cast(id as string))``: a content-hash scramble of the id
      order (the repo's determinism idiom), which is a uniform
      random draw w.r.t. any id-correlated data layout.  At 100 TB
      the first k ids of a corpus usually share a shard/source — the
      worst published initializer regime — while a hash draw is as
      good as seeded random sampling, with no RNG state to ship.
      One TakeOrderedAndProject over the scan, like ``"lowest_id"``.
      md5 (not xxhash64) because every engine and the Python replay
      oracle produce the identical hex string — the portability
      idiom the split/sampling operators already use.
    * ``"lowest_id"`` — the r9 behavior, kept for replay against
      frozen oracles.

    Gate: on the driver embeddings tables at two SFs, final inertia
    under ``"hash"`` ≤ ``"lowest_id"`` (tests/test_curation_round10).

    Driver traffic per iteration is the k×dim centroid matrix plus
    k stat rows — codebook-sized, like every bounded model fit here
    (IVF/PQ/classifier).  Each pass over the corpus is the
    kmeans_assign map-only projection plus ONE shuffle of k·dims
    partial means; empty clusters keep their previous centroid (the
    restart policy is the caller's).
    """
    from loudml_spark import errors

    if k <= 0:
        raise errors.Invalid(f"k must be > 0, got {k}")
    if seed_rule == "hash":
        seed_order = [F.md5(F.col(id_col).cast("string")).asc(),
                      F.col(id_col).asc()]
    elif seed_rule == "lowest_id":
        seed_order = [F.col(id_col).asc()]
    else:
        raise errors.Invalid(
            f"seed_rule must be 'hash' or 'lowest_id', got {seed_rule!r}")
    # persist the projected vectors ONCE for the whole fit: the seed
    # scan plus every Lloyd pass reads the same (id, vec) frame, and
    # without this each of the max_iters+1 actions re-scans (and
    # re-decodes the float arrays from) the source — at scale that is
    # max_iters redundant full corpus reads (guide: cache only what
    # is reused AND expensive to recompute; unpersisted in `finally`)
    data = df.select(id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _kmeans_fit_loop(
            data, k=k, max_iters=max_iters, tol=tol, vec_col=vec_col,
            id_col=id_col, seed_order=seed_order)
    finally:
        data.unpersist()


def _kmeans_fit_loop(df, *, k, max_iters, tol, vec_col, id_col,
                     seed_order):
    from loudml_spark import errors

    seeds = (
        df.select(id_col, vec_col).orderBy(*seed_order)
        .limit(k).collect())
    if not seeds:
        raise errors.Invalid("corpus is empty")
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    history = []
    for it in range(max_iters):
        vec = F.col(vec_col)
        best = F.array_min(_dist_structs_col(vec, centroids))
        assigned = df.select(
            best["c"].alias("cluster"),
            F.round(best["d"], 6).alias("dist2"),
            vec_col)
        agg = (
            assigned.select(
                "cluster", "dist2",
                F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("cluster", "dim")
            # means round at 6 dp (kmeans_step's portability idiom) so
            # an iteration is bit-replayable by the oracle's own mean
            .agg(F.round(F.avg(F.col("v").cast("double")), 6)
                 .alias("m"),
                 F.count("*").alias("n"),
                 F.sum(F.round(F.col("dist2"), 6)
                       .cast("decimal(18,6)"))
                 .cast("double").alias("in_sum"))
            .collect())
        new = [list(c) for c in centroids]
        sizes = [0] * len(centroids)
        in_by_cluster = {}
        for r in agg:
            new[r["cluster"]][r["dim"]] = float(r["m"])
            sizes[r["cluster"]] = int(r["n"])
            # every (cluster, dim) group sums the SAME members'
            # dist2, so counting exactly one dim group per cluster
            # gives the objective for any dimensionality (a /dims
            # rescale would silently mis-scale non-64-dim corpora)
            if r["dim"] == 0:
                in_by_cluster[r["cluster"]] = float(r["in_sum"])
        # sum in cluster order, not collect() order — each term is a
        # DECIMAL-exact per-cluster total, so a fixed fold order
        # makes the float total replayable by the oracle
        inertia = sum(in_by_cluster[c] for c in sorted(in_by_cluster))
        drift = max(
            sum((a - b) * (a - b) for a, b in zip(nc, oc))
            for nc, oc in zip(new, centroids))
        history.append({
            "iter": it, "total_inertia": round(inertia, 4),
            "max_drift": drift,
            "n_clusters": sum(1 for s in sizes if s > 0)})
        centroids = new
        if drift < tol:
            break
    return centroids, history


def kmeans_silhouette(
    df: DataFrame,
    centroids: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cluster simplified silhouette (Kaufman & Rousseeuw's
    centroid approximation): for each vector, ``a`` = distance to its
    OWN centroid and ``b`` = distance to the nearest OTHER centroid,
    ``s = (b − a) / max(a, b)`` — the standard O(n·k) clustering
    quality score (the exact silhouette's O(n²) pairwise form cannot
    exist at corpus scale; the centroid form is the one every
    distributed library ships, e.g. Spark MLlib's
    ClusteringEvaluator).

    Returns one row per non-empty cluster: ``(cluster, size,
    mean_silhouette)`` — mean of per-vector s rounded at 6 dp and
    summed as DECIMAL (the addition-order-independent idiom), so the
    score is bit-stable cross-engine.

    Scale shape: the centroid list rides the plan as a literal (the
    kmeans_assign idiom); a and b come from ONE array_sort over the
    per-centroid distance structs — map-only projection, then one
    k-row groupBy.  No join, no Python, corpus touched once.
    """
    if not centroids or len(centroids) < 2:
        raise errors.Invalid("silhouette needs >= 2 centroids")
    vec = F.col(vec_col)
    dists = F.array_sort(_dist_structs_col(vec, centroids, sqrt=True))
    a = F.element_at(dists, 1)["d"]
    b = F.element_at(dists, 2)["d"]
    s = F.when(F.greatest(a, b) > 0,
               (b - a) / F.greatest(a, b)).otherwise(F.lit(0.0))
    per_vec = df.select(
        F.element_at(dists, 1)["c"].alias("cluster"),
        F.round(s, 6).alias("s"))
    return per_vec.groupBy("cluster").agg(
        F.count("*").alias("size"),
        F.round(
            F.sum(F.col("s").cast("decimal(18,6)")).cast("double")
            / F.count("*"), 6).alias("mean_silhouette"))


def davies_bouldin(
    df: DataFrame,
    centroids: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Davies–Bouldin index components per cluster (Davies & Bouldin
    1979): scatter ``S_i`` = mean L2 distance of members to their
    centroid, and ``db_i = max_{j≠i} (S_i + S_j) / M_ij`` with
    ``M_ij`` the centroid separation — lower is better; the overall
    DB index is avg(db_i), computable from the returned frame.

    Returns ``(cluster, size, scatter, db)`` for non-empty clusters.
    Scatter rounds per-member distances at 6 dp and DECIMAL-sums
    (order-independent); the k×k ratio matrix is computed on the
    k-row aggregate — driver-free, but k² only on codebook-sized
    data.  Empty clusters are absent (their S is undefined); M_ij
    uses the literal centroid matrix, so separation is exact
    whatever the membership.

    Scale shape: ONE map-only assignment pass (centroid literal in
    the plan) + one k-row groupBy; the k×k cross join happens on the
    k-row frame (k ≤ thousands — never corpus rows).
    """
    if not centroids or len(centroids) < 2:
        raise errors.Invalid("davies_bouldin needs >= 2 centroids")
    vec = F.col(vec_col)
    best = F.array_min(_dist_structs_col(vec, centroids))
    per_vec = df.select(
        best["c"].alias("cluster"),
        F.round(F.sqrt(best["d"]), 6).alias("d"))
    scat = per_vec.groupBy("cluster").agg(
        F.count("*").alias("size"),
        F.round(
            F.sum(F.col("d").cast("decimal(18,6)")).cast("double")
            / F.count("*"), 6).alias("scatter"))
    # centroid separations as a literal k×k lookup (codebook-sized)
    import math

    sep = [[
        math.sqrt(sum((float(a) - float(b)) ** 2
                      for a, b in zip(ci, cj))) if i != j else 0.0
        for j, cj in enumerate(centroids)]
        for i, ci in enumerate(centroids)]
    from loudml_spark.litexpr import lit_double_rows

    sep_lit = lit_double_rows(sep)
    other = scat.select(
        F.col("cluster").alias("__j"),
        F.col("scatter").alias("__sj"))
    # explode the candidate-j list and EQUI-join on j — a `!=` join
    # would plan as a nested loop and trip the catalog-wide plan
    # gate, even though k rows make it harmless; the equi form is
    # the same k×k work with a gate-safe shape
    cand = scat.select(
        "cluster", "size", "scatter",
        F.explode(F.array(*[
            F.lit(j) for j in range(len(centroids))])).alias("__j"),
    ).filter(F.col("__j") != F.col("cluster"))
    ratio = (
        cand.join(other, "__j")
        .withColumn("__m", F.element_at(
            F.element_at(sep_lit, F.col("cluster") + 1),
            F.col("__j") + 1))
        .groupBy("cluster", "size", "scatter")
        .agg(F.round(F.max(
            (F.col("scatter") + F.col("__sj")) / F.col("__m")), 6)
            .alias("db")))
    return ratio.select("cluster", "size", "scatter", "db")
