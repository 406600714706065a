"""Approximate-nearest-neighbor search over an embedding column.

Two paths:

* ``cosine_topk`` — brute-force baseline: broadcast the (small) query
  set against the corpus, score every pair, rank.  Exact; one pass
  over the corpus, no corpus shuffle.  This is the correctness anchor.
* ``lsh_cosine_topk`` — scale path: random-hyperplane LSH.  Each
  vector gets a b-bit sign bucket; candidates are same-bucket (or
  multi-probe neighboring-bucket) pairs, so candidate generation is an
  equi-join on the bucket id.  Recall is tunable via bits/probes;
  hyperplanes are seeded Python-side and shipped as literals so runs
  are reproducible.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from loudml_spark.pipeline.dedup import cosine_col


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Deterministic: ranking uses the rounded score with id ascending as
    tie-break.  The query side is broadcast — the corpus is scanned
    once with no shuffle before the per-query rank."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", F.round(cosine_col(F.col("qv"), F.col("cv")), round_to)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Seeded pseudo-random hyperplanes (literal-shippable)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)
    ]


def lsh_bucket_col(vec, planes: list[list[float]]):
    """Sign-bucket id: bit i = (vec · plane_i) >= 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, lit_plane,
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(2 ** i)).otherwise(0)
    return bucket


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    bits: int = 8,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """ANN top-k: candidates share an LSH sign-bucket, then exact
    cosine ranks within candidates.  Equi-join on bucket — no cross
    join at any scale.  May return < k rows per query (ANN recall)."""
    planes = hyperplanes(dim, bits, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", F.round(cosine_col(F.col("qv"), F.col("cv")), round_to)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
