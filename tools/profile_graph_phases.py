"""Phase breakdown for the graph-family queries (guide §1: decide
whether the time is pair generation, algorithm rounds, or per-job
overhead BEFORE touching anything).

Times, in one bench-config session:
  1. pairs        — minhash_lsh_pairs(docs<1000, n=1, bands=2, 0.8) noop
  2. pairs(warm)  — same again (the persisted sig frame now hot)
  3. pagerank     — pagerank() on a pre-checkpointed pair frame
  4. kcore        — kcore_numbers() on the same checkpointed pairs
  5. components  — dedup_clusters + incremental path on same pairs
  6. full queries — q_pagerank_sim_docs / q_graph_kcore_docs noop

Usage: python tools/profile_graph_phases.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:40s} {dt:7.2f} s", flush=True)
    return out


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile-graph")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    from loudml_spark.catalog_pipeline import _rebalance
    from loudml_spark.pipeline.dedup import minhash_lsh_pairs, release_persisted
    from loudml_spark.pipeline.graph import (
        component_stats, kcore_numbers, pagerank)
    from loudml_spark.sources.tables import load_table

    docs = _rebalance(
        spark, load_table(spark, SF_DIR, "documents").filter("doc_id < 1000"))

    t("pairs cold (sig build + verify)",
      lambda: noop(minhash_lsh_pairs(docs, n=1, bands=2, threshold=0.8)))
    t("pairs warm (sig cached)",
      lambda: noop(minhash_lsh_pairs(docs, n=1, bands=2, threshold=0.8)))

    pairs = minhash_lsh_pairs(docs, n=1, bands=2, threshold=0.8) \
        .select("id_a", "id_b", "jaccard").localCheckpoint()
    print(f"  (pair count: {pairs.count()})", flush=True)

    t("pagerank 5 iters on checkpointed pairs",
      lambda: noop(pagerank(pairs, src_col="id_a", dst_col="id_b",
                            damping=0.85, n_iter=5)))
    t("pagerank weighted 5 iters",
      lambda: noop(pagerank(pairs, src_col="id_a", dst_col="id_b",
                            weight_col="jaccard", damping=0.85, n_iter=5)))
    t("kcore on checkpointed pairs",
      lambda: noop(kcore_numbers(pairs)))
    t("component_stats on checkpointed pairs",
      lambda: noop(component_stats(pairs)))

    from loudml_spark.catalog_pipeline import (
        q_graph_kcore_docs, q_pagerank_sim_docs)
    t("FULL q_pagerank_sim_docs (warm sig)",
      lambda: noop(q_pagerank_sim_docs(spark, SF_DIR)))
    t("FULL q_graph_kcore_docs (warm sig)",
      lambda: noop(q_graph_kcore_docs(spark, SF_DIR)))

    release_persisted()
    spark.stop()


if __name__ == "__main__":
    main()
