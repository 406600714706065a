"""Find the Bloom prefilter's win regime: run the exact
decontamination operator (`decontaminate_docs`) and the
Bloom-prefiltered one (`bloom_decontaminate_docs`) over growing
corpus sizes against the same 20-doc bench set, min-of-N walls.

The prefilter's design regime is corpus ≫ bench with a low hit rate
(the verification join input shrinks from |grams| to |true overlaps|
+ FP·|grams|); the bench-SF corpus (480 docs) is the opposite, so r7
and r8 measured bloom ≈ exact there.  This tool measures where (or
whether) the crossover happens on this host, so SCALE.md can state
the policy with a number instead of an argument.  Usage:

    python tools/bloom_crossover.py [reps] [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

DEFAULT_DIRS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1",
                "/root/repo/testdata_sf1")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    dirs = sys.argv[2:] or list(DEFAULT_DIRS)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bloom-crossover")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loudml_spark.catalog import QUERIES as CAT

    out: dict[str, dict] = {}
    for sf_dir in dirs:
        if not os.path.isdir(sf_dir):
            print(f"# skip {sf_dir} (missing)", file=sys.stderr)
            continue
        n_docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")).count()
        row: dict = {"corpus_docs": n_docs - 20}
        for name in ("decontaminate_docs", "bloom_decontaminate_docs"):
            fn = CAT[name]["fn"]
            fn(spark, sf_dir).count()  # warm (stages bloom words once)
            walls = []
            for _ in range(reps):
                t0 = time.time()
                fn(spark, sf_dir).count()
                walls.append(time.time() - t0)
            key = "bloom" if "bloom" in name else "exact"
            row[key] = round(min(walls), 3)
            print(f"# {sf_dir} {name} min={min(walls):.3f}s "
                  f"(all: {[round(w, 2) for w in walls]})",
                  file=sys.stderr)
        row["bloom_minus_exact"] = round(row["bloom"] - row["exact"], 3)
        out[sf_dir] = row
    print(json.dumps({"reps": reps, "points": out}))


if __name__ == "__main__":
    main()
