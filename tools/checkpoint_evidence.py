"""Block-manager evidence for the round-12 checkpoint lifecycle fix.

Round-11 verdict (What's wrong #3): pagerank's per-iteration
``localCheckpoint`` pinned a new rank-frame copy every power
iteration and never released the superseded one — at n_iter=25
that's ~25 pinned node-frame copies in the block manager.  The fix
(loudml_spark/checkpoint.py) releases each superseded checkpoint the
moment the next one materializes, and the edge frame after the last
iteration.

This tool measures BOTH shapes on the same seeded graph at
n_iter=25: the shipped operator, and an inline replica of the
round-11 loop (lazy checkpoints, no release).  It prints one JSON
line with pinned-RDD counts and bytes, and asserts the shipped
operator leaves at most 2 pinned RDDs (the final rank checkpoint —
plus nothing else) while producing bit-identical ranks.

Usage: python tools/checkpoint_evidence.py
"""
import json
import os
import random
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def pinned(spark):
    info = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return len(info), sum(i.memSize() + i.diskSize() for i in info)


def legacy_pagerank(edges, *, damping=0.85, n_iter=25, round_to=9):
    """The round-11 loop verbatim (lazy checkpoints, no release) —
    the 'before' measurement."""
    sym = (
        edges.select(F.col("id_a").alias("src"),
                     F.col("id_b").alias("dst"), F.lit(1.0).alias("w"))
        .unionByName(edges.select(F.col("id_b").alias("src"),
                                  F.col("id_a").alias("dst"),
                                  F.lit(1.0).alias("w")))
        .distinct().localCheckpoint())
    deg = sym.groupBy("src").agg(
        F.sum(F.col("w").cast("decimal(18,6)")).cast("double")
        .alias("wsum"))
    nodes = sym.select(F.col("src").alias("id")).distinct()
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("r", F.round(F.lit(1.0 / n), round_to))
    dec = f"decimal(28,{round_to})"
    for _ in range(n_iter):
        contrib = (
            sym.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("id"),
                    F.round(F.col("r") / F.col("wsum"), round_to)
                    .cast(dec).alias("c")))
        ranks = (
            contrib.groupBy("id").agg(F.sum("c").alias("s"))
            .select("id",
                    F.round(F.lit(base)
                            + F.lit(damping) * F.col("s").cast("double"),
                            round_to).alias("r"))
            .localCheckpoint(eager=False))
    return ranks.select("id", F.col("r").alias("pagerank"))


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("checkpoint_evidence").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # seeded sparse graph: 20k nodes, ~60k edges, a few hubs so the
    # rank distribution is non-trivial
    rng = random.Random(0xC0FFEE)
    rows = [(rng.randrange(20_000), rng.randrange(20_000))
            for _ in range(60_000)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in rows if a != b], "id_a long, id_b long")
    edges = edges.repartition(8).cache()
    edges.count()
    base_cnt, _ = pinned(spark)        # the cached edge input itself

    from loudml_spark.pipeline.graph import pagerank

    fixed = pagerank(edges, n_iter=25)
    fixed_rows = sorted(fixed.collect())
    fixed_cnt, fixed_bytes = pinned(spark)

    legacy = legacy_pagerank(edges, n_iter=25)
    legacy_rows = sorted(legacy.collect())
    legacy_cnt, legacy_bytes = pinned(spark)

    out = {
        "n_iter": 25,
        "nodes": 20_000,
        "edges_input": 60_000,
        "pinned_rdds_baseline": base_cnt,
        "pinned_rdds_after_fixed": fixed_cnt - base_cnt,
        "pinned_bytes_after_fixed": fixed_bytes,
        "pinned_rdds_after_legacy": legacy_cnt - fixed_cnt,
        "pinned_bytes_after_legacy": legacy_bytes - fixed_bytes,
        "ranks_bit_identical": fixed_rows == legacy_rows,
    }
    print(json.dumps(out))
    assert out["ranks_bit_identical"], "fix changed rank values!"
    assert out["pinned_rdds_after_fixed"] <= 2, out
    assert out["pinned_rdds_after_legacy"] >= 20, out
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
