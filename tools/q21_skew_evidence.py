"""TPC-H q21 at sf1: publish the skew evidence the r9 verdict asked
for (it is the sf1 bench's slowest relational query, 5.2 s).

Three measurements on the dbgen-shaped data
(tools/make_tpch_sf1.py output):

1. Join-key histograms — is there skew for AQE to split at all?
   q21 shuffles on l_orderkey (fin ⋈ per_order) and l_suppkey
   (waiting ⋈ supplier); dbgen bounds both (≤7 lines/order,
   ~600 lines/supplier over 10k suppliers).
2. The EXECUTED adaptive plan — skew=true markers, reused
   exchanges, partition coalescing.
3. Wall time of the stock plan vs a salted-join variant
   (operators/skew.py) — if AQE has nothing to split, salting can
   only add a shuffle; the measurement makes that concrete instead
   of asserted.

Usage: python tools/q21_skew_evidence.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 \
    else "/root/repo/testdata_tpch_sf1"


def key_histogram(df, key):
    row = (df.groupBy(key).count()
           .agg(F.count("*").alias("n_keys"),
                F.max("count").alias("max"),
                F.expr("percentile(count, 0.999)").alias("p999"),
                F.avg("count").alias("avg")).first())
    return (f"{key}: {row['n_keys']} keys, max mult {row['max']}, "
            f"p99.9 {row['p999']:.0f}, avg {row['avg']:.1f} "
            f"(max/avg = {row['max'] / row['avg']:.1f}x)")


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("q21-skew-evidence")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from loudml_spark.catalog import QUERIES

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    print("## q21 join-key histograms (is there skew to split?)")
    print("- " + key_histogram(li, "l_orderkey"))
    print("- " + key_histogram(li, "l_suppkey"))

    fn = QUERIES["tpch_q21_last_shipper"]["fn"]
    walls = []
    for rep in range(3):
        df = fn(spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 2))
    print(f"\n## stock plan wall (3 reps): {walls} -> min "
          f"{min(walls)} s")

    plan = df._jdf.queryExecution().executedPlan().toString()
    n_skew = plan.count("skew=true")
    n_reused = plan.count("ReusedExchange")
    n_smj = plan.count("SortMergeJoin")
    n_bhj = plan.count("BroadcastHashJoin")
    n_aqe_reads = plan.count("AQEShuffleRead")
    coalesced = plan.count("coalesced")
    print("\n## executed adaptive plan markers")
    print(f"- SortMergeJoin: {n_smj} (skew=true on {n_skew})")
    print(f"- BroadcastHashJoin: {n_bhj}")
    print(f"- ReusedExchange: {n_reused}")
    print(f"- AQEShuffleRead: {n_aqe_reads} ({coalesced} coalesced)")

    # salted variant of the one self-join q21 actually shuffles:
    # fin ⋈ per_order on l_orderkey (the aggregate side stays exact
    # because salting replicates the AGGREGATED per-order row, not
    # the aggregation itself)
    from loudml_spark.operators.skew import salted_join
    from loudml_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey")
    li_t = load_table(spark, SF_DIR, "lineitem")
    supp = load_table(spark, SF_DIR, "supplier")
    walls_s = []
    for rep in range(3):
        fin = li_t.join(orders, li_t.l_orderkey == orders.o_orderkey) \
            .select("l_orderkey", "l_suppkey", "l_shipdate")
        per_order = fin.groupBy("l_orderkey").agg(
            F.max("l_shipdate").alias("max_ship"),
            F.countDistinct("l_suppkey").alias("n_supp"))
        joined = salted_join(fin, per_order, ["l_orderkey"],
                             salt_on="l_suppkey", n_salt=8)
        waiting = (joined
                   .filter((F.col("l_shipdate") == F.col("max_ship"))
                           & (F.col("n_supp") > 1))
                   .select("l_orderkey", "l_suppkey").distinct())
        out = (waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
               .groupBy("s_name").agg(F.count("*").alias("numwait")))
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        walls_s.append(round(time.perf_counter() - t0, 2))
    print(f"\n## salted-join variant wall (3 reps): {walls_s} -> min "
          f"{min(walls_s)} s")
    spark.stop()


if __name__ == "__main__":
    main()
