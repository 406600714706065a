"""End-to-end monitoring analytics over the events table:

    intake profile → counter rate → keyed hourly series →
    linear gap interpolation → EWMA smoothing → daily seasonal
    decomposition → CUSUM drift on the residual → MAD outliers →
    SCD2 user-tier history for as-of enrichment.

Run:  python examples/monitoring_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001)

Every step is a DataFrame transform (no driver-side loops); the same
plans run unchanged on a real cluster.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

NS = 10**9


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("monitoring-example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loudml_spark.operators.profile import profile
    from loudml_spark.operators.rollup import rollup_partials
    from loudml_spark.operators.scd2 import scd2_from_changelog
    from loudml_spark.operators.tsmath import (
        counter_increase,
        cusum,
        decompose_additive,
        ewma_trunc,
        interpolate_linear,
        mad_scores,
    )
    from loudml_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")

    # 1. intake audit: what is actually in these columns?
    print("== column profile ==")
    profile(ev.select("event_id", "user_id", "event_type", "value"),
            distinct="both").show(truncate=False)

    # 2. PromQL-style rate over the value column per event_type
    rate = counter_increase(
        ev, ts_col="ts_ns", value_col="value", interval=3600,
        by=["event_type"], order_col="event_id", ts_scale=NS,
    )
    print("rate buckets:", rate.count())

    # 3-4. keyed hourly mean series, gaps repaired by interpolation
    base = rollup_partials(
        ev, value_col="value", interval=3600, ts_col="ts_ns",
        ts_scale=NS, group_by=["event_type"],
    )
    series = base.select(
        "event_type", "bucket_ts",
        (F.col("sum_dec").cast("double") / F.col("n")).alias("value"),
    )
    series = interpolate_linear(series, value_col="value",
                                by=["event_type"])

    # 5. EWMA smoothing (halflife 6 buckets)
    smooth = ewma_trunc(series, value_col="value", halflife=6.0,
                        n_lags=24, by=["event_type"])

    # 6. daily seasonal decomposition of the fleet-wide series
    total = rollup_partials(
        ev, value_col="value", interval=3600, ts_col="ts_ns", ts_scale=NS)
    dec = decompose_additive(total, period=24, interval=3600)

    # 7. CUSUM drift on the deseasonalized residual (k = 0: any
    #    persistent positive bias accumulates), alarm at h
    drift = cusum(
        dec.filter(F.col("resid").isNotNull()),
        value_col="resid", k=0.5, h=10.0,
    )
    n_alarms = drift.filter("is_change").count()
    print("drift alarm buckets:", n_alarms)

    # 8. MAD robust outliers on the smoothed series
    scored = mad_scores(smooth, value_col="ewma", by=["event_type"])
    print("== top |robust_score| buckets ==")
    scored.orderBy(F.abs(F.col("robust_score")).desc()).select(
        "event_type", "bucket_ts", "ewma", "robust_score"
    ).show(5)

    # 9. SCD2 user-tier history — join-ready for as-of enrichment
    tiers = scd2_from_changelog(
        ev.select(
            "user_id", "event_id", F.col("ts_ns").alias("ts"),
            F.when(F.col("value") >= 50, "high").otherwise("low")
            .alias("tier")),
        key_cols=["user_id"], attr_cols=["tier"], ts_col="ts",
        order_col="event_id",
    )
    print("tier versions:", tiers.count(),
          "open versions:", tiers.filter("valid_to IS NULL").count())

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
