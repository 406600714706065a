"""Triangle counting on a power-law (hub-heavy) graph: measure the
degree-ordered orientation's growth — the evidence the r10 verdict
asked for (pipeline/graph.py triangle_stats, What's wrong #2).

The seeded generator builds the regime the operator diagnoses
(over-eager LSH bands): one giant hub wired to THETA(n) nodes plus a
Zipf-ish tail of smaller hubs and random edges.  Under id-ordered
orientation a mid-sorting hub fans out deg^2 wedges (the old shape);
degree ordering caps every out-degree at O(sqrt(m)), so wedge volume
— and wall time — must grow ~O(m^1.5) worst-case and near-linearly
here (hub wedges vanish: the hub sorts last and fans out nothing).

Two measurements per size:
1. wall time of triangle_stats (degree-ordered, the shipped code);
2. the wedge-volume ratio id-order vs degree-order, computed exactly
   from the oriented out-degrees (Sum deg+^2-style join input sizes)
   without running the quadratic variant.

Usage: python tools/triangle_skew_evidence.py [sizes...]
Prints one line per size plus the fitted log-log exponent.
"""

from __future__ import annotations

import math
import os
import random
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def skewed_edges(n: int, seed: int = 11) -> list[tuple[int, int]]:
    """Hub-heavy seeded graph: hub 0 touches n/2 nodes; each next
    hub h in 1..log2(n) touches n/2^(h+1) random nodes; plus n
    random edges.  Hub ids are PLACED MID-RANGE (id = n//2 + h) so
    id-ordered orientation gives them both in- and out-edges — the
    worst case the degree ordering removes."""
    rng = random.Random(seed)
    edges: set[tuple[int, int]] = set()

    def add(a: int, b: int) -> None:
        if a != b:
            edges.add((min(a, b), max(a, b)))

    hubs = [n // 2 + h for h in range(int(math.log2(n)))]
    for h, hub in enumerate(hubs):
        for _ in range(max(2, n >> (h + 1))):
            add(hub, rng.randrange(n))
    for _ in range(n):
        add(rng.randrange(n), rng.randrange(n))
    return sorted(edges)


def wedge_volumes(spark, edges) -> tuple[int, int]:
    """(id-ordered, degree-ordered) wedge-join input volumes,
    computed exactly from out-degree sums — no quadratic run."""
    e = spark.createDataFrame(edges, "a long, b long")
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy("a").agg(F.count("*").alias("deg")) \
        .withColumnRenamed("a", "id")
    # id order: edge (a,b) with a<b is oriented a->b, so
    # deg+(v) = #neighbors with larger id; wedge volume through a
    # middle vertex v is deg-(v)*deg+(v)
    ido = und.filter("a < b").groupBy("a").agg(
        F.count("*").alias("dp"))
    idi = und.filter("a > b").groupBy("a").agg(
        F.count("*").alias("dm"))
    vol_id = (ido.join(idi, "a")
              .agg(F.sum(F.col("dp") * F.col("dm"))).first()[0]) or 0
    do = (
        und
        .join(deg.select(F.col("id").alias("a"),
                         F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"),
                         F.col("deg").alias("db")), "b")
        .filter("da < db or (da = db and a < b)")
        .groupBy("a").agg(F.count("*").alias("dp"))
    )
    di = (
        und
        .join(deg.select(F.col("id").alias("a"),
                         F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"),
                         F.col("deg").alias("db")), "b")
        .filter("da > db or (da = db and a > b)")
        .groupBy("a").agg(F.count("*").alias("dm"))
    )
    vol_deg = (do.join(di, "a")
               .agg(F.sum(F.col("dp") * F.col("dm"))).first()[0]) or 0
    return int(vol_id), int(vol_deg)


def main():
    sizes = [int(x) for x in sys.argv[1:]] or [2000, 8000, 32000]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("triangle-skew-evidence")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from loudml_spark.pipeline.graph import triangle_stats

    walls, ms = [], []
    for n in sizes:
        edges = skewed_edges(n)
        m = len(edges)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        df = triangle_stats(pairs).localCheckpoint()  # materialize
        t0 = time.monotonic()
        tri_total = df.agg(F.sum("n_triangles")).first()[0] // 3
        wall = time.monotonic() - t0
        # wall timed over a cached result is ~0; time the real run
        t0 = time.monotonic()
        tri_total = (triangle_stats(pairs)
                     .agg(F.sum("n_triangles")).first()[0] or 0) // 3
        wall = time.monotonic() - t0
        vol_id, vol_deg = wedge_volumes(spark, edges)
        walls.append(wall)
        ms.append(m)
        print(f"n={n} m={m} triangles={tri_total} wall={wall:.2f}s "
              f"wedges id-order={vol_id} degree-order={vol_deg} "
              f"(ratio {vol_id / max(vol_deg, 1):.1f}x)")
    if len(ms) >= 2:
        exp = (math.log(walls[-1] / walls[0])
               / math.log(ms[-1] / ms[0]))
        print(f"fitted wall exponent vs m: {exp:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
