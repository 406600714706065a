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
