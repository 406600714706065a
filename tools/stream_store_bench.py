"""Measure the state-store provider tax on the streaming catalog
queries: drain each under the RocksDB provider (the scale-right
default — state spills to local SST files instead of executor heap)
and the HDFS-backed in-memory provider, min-of-N wall times.

The r8 bench showed streaming_join_click_purchase 2.27→4.16 s and
streaming_detect_1h 2.31→3.96 s when RocksDB became the drain
default; this tool attributes that delta to the provider (or not)
so SCALE.md §streaming can state the measured local tax and the
provider policy.  Usage:

    python tools/stream_store_bench.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

QUERIES = ("streaming_join_click_purchase", "streaming_detect_1h",
           "streaming_sessionize_30m", "streaming_dedup_events")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stream-store-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import loudml_spark.streaming.job as sj
    from loudml_spark.catalog import QUERIES as CAT

    avail = [q for q in QUERIES if q in CAT]
    results: dict[str, dict] = {}
    # warm up each query once (staging temp files + JVM) before timing
    for q in avail:
        CAT[q]["fn"](spark, sf_dir).collect()
    for store in ("rocksdb", "hdfs"):
        # the catalog fns call drain_stream_to_df with its default
        # state_store; rebind the keyword default for the sweep
        sj.drain_stream_to_df.__kwdefaults__["state_store"] = store
        for q in avail:
            walls = []
            for _ in range(reps):
                t0 = time.time()
                CAT[q]["fn"](spark, sf_dir).collect()
                walls.append(time.time() - t0)
            results.setdefault(q, {})[store] = round(min(walls), 3)
            print(f"# {q} [{store}] min={min(walls):.3f}s "
                  f"(all: {[round(w, 2) for w in walls]})",
                  file=sys.stderr)
    sj.drain_stream_to_df.__kwdefaults__["state_store"] = "rocksdb"
    for q, r in results.items():
        r["tax_sec"] = round(r["rocksdb"] - r["hdfs"], 3)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps,
                      "queries": results}))


if __name__ == "__main__":
    main()
