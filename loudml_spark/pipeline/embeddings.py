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
