"""Dump `.explain("formatted")` for catalog queries to files.

Usage: python tools/dump_plans.py <out_suffix> [sf_dir] [query ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<out_suffix>.txt
(default round "r13") for each named query (all queries when none
named).  `out_suffix` is e.g. "before" / "after".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SUFFIX = sys.argv[1]
REST = sys.argv[2:]
SF_DIR = REST[0] if REST and os.path.isdir(REST[0]) else "/root/testdata/sf0.1"
NAMES = [a for a in REST if not os.path.isdir(a)]
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from loudml_spark.catalog import QUERIES, release_caches

    os.makedirs(OUT_DIR, exist_ok=True)
    names = NAMES or list(QUERIES)
    for name in names:
        spec = QUERIES[name]
        df = spec["fn"](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT_DIR, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    release_caches()


if __name__ == "__main__":
    main()
