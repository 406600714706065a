"""Phase profiler for the per-query fixed-overhead band (round 13,
VERDICT directive #1): split each query's wall-clock into

  t_fn      driver-side construction (spec["fn"] — py4j Column
            building + any eager probe actions inside the operator)
  t_schema  analysis of the returned frame (df.schema forces the
            analyzer if fn didn't)
  t_noop    the noop-sink execution (planning + codegen + jobs)

and count the Spark jobs each phase triggers (statusTracker on a
per-phase job group), so "driver/analyzer constant" vs "too many
jobs" vs "compute" is a measurement, not a guess.

Usage: python tools/profile_phases.py [query ...]
       (defaults to a representative slice of the 1-2 s band)

Method matches bench.py: same session config, same warmup, reps run
as full passes, min per phase reported.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from loudml_spark.catalog import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

DEFAULT = [
    # <1 s ts core
    "ts_avg_1h", "ts_percentiles_1d",
    # 1-2 s band, different families
    "anomaly_detect_1h", "simhash_docs", "ann_recall_sq8",
    "approx_distinct_users_daily", "keyed_anomaly_detect_6h",
    "profile_events", "decontaminate_docs", "source_overlap_docs",
    "assoc_rules_events", "fuzzy_pairs_customers",
    # 2+ s
    "rrf_bm25_tfidf_docs", "textrank_keywords_docs",
]


def main():
    names = sys.argv[1:] or DEFAULT
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("loudml-spark-phase-profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    from loudml_spark.sources.tables import load_table

    load_table(spark, SF_DIR, "events").limit(1).collect()

    tracker = sc.statusTracker()

    def jobs_in(group: str) -> int:
        return len(tracker.getJobIdsForGroup(group) or ())

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    phases: dict[str, dict[str, list[float]]] = {}
    for rep in range(reps):
        for name in names:
            spec = QUERIES[name]
            rec = phases.setdefault(name, {
                "fn": [], "schema": [], "noop": [],
                "fn_jobs": [], "noop_jobs": []})
            g = f"prof-{name}-{rep}"
            sc.setJobGroup(g + "-fn", name)
            t0 = time.perf_counter()
            df = spec["fn"](spark, SF_DIR)
            t1 = time.perf_counter()
            rec["fn"].append(t1 - t0)
            rec["fn_jobs"].append(jobs_in(g + "-fn"))
            _ = df.schema
            t2 = time.perf_counter()
            rec["schema"].append(t2 - t1)
            sc.setJobGroup(g + "-noop", name)
            df.write.mode("overwrite").format("noop").save()
            t3 = time.perf_counter()
            rec["noop"].append(t3 - t2)
            rec["noop_jobs"].append(jobs_in(g + "-noop"))
    sc.setJobGroup("prof-done", None)

    out = {}
    for name, rec in phases.items():
        out[name] = {
            "fn_min": round(min(rec["fn"]), 3),
            "schema_min": round(min(rec["schema"]), 3),
            "noop_min": round(min(rec["noop"]), 3),
            "total_min": round(min(
                f + s + n for f, s, n in
                zip(rec["fn"], rec["schema"], rec["noop"])), 3),
            "fn_jobs": rec["fn_jobs"][-1],
            "noop_jobs": rec["noop_jobs"][-1],
            "fn_all": [round(x, 3) for x in rec["fn"]],
            "noop_all": [round(x, 3) for x in rec["noop"]],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
