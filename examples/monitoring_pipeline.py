"""End-to-end monitoring analytics over the events table:

    intake profile → counter rate → keyed hourly series →
    linear gap interpolation → EWMA smoothing → daily seasonal
    decomposition → CUSUM drift on the residual → MAD outliers →
    SCD2 user-tier history for as-of enrichment →
    LIVE tail: streaming counter increases + missing-heartbeat
    alerts landing in an idempotent parquet sink.

Run:  python examples/monitoring_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001)

Every step is a DataFrame transform (no driver-side loops); the same
plans run unchanged on a real cluster.

Production note for the streaming tail: both stateful operators keep
per-key state in the state store.  The default HDFS-backed in-memory
provider holds every key's state on-heap; for large key cardinality
run the RocksDB provider instead (state spills to local disk,
changelog-checkpointed):

    spark.conf:
      spark.sql.streaming.stateStore.providerClass=
        org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
      spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true
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

    # 8b. forecaster selection the honest way: rolling-origin
    #     backtest of naive vs seasonal-naive(24h) on the hourly
    #     series, then roll the winner's shape 24 h forward with
    #     drift — the baseline any trained model must beat
    from loudml_spark.operators.tsmath import (
        forecast_backtest, naive_forecast,
    )

    bt_naive = forecast_backtest(
        series, horizons=(1, 24), by=["event_type"])
    bt_snaive = forecast_backtest(
        series, horizons=(1, 24), method="snaive", season=24,
        by=["event_type"])
    print("== backtest MAE (naive vs snaive-24) ==")
    bt_naive.select("event_type", "h", F.col("mae").alias("mae_naive")) \
        .join(bt_snaive.select("event_type", "h",
                               F.col("mae").alias("mae_snaive")),
              ["event_type", "h"]).orderBy("event_type", "h").show()
    fc = naive_forecast(
        series, interval=3600, horizon=24, season=24, drift=True,
        by=["event_type"])
    print("baseline forecast rows (next 24 h):", fc.count())

    # 8c. uncertainty the distribution-free way: split-conformal
    #     bands around the naive forecast — half-width = the
    #     ceil((n+1)·0.9)-th smallest historical h-step |error|, so
    #     the 90% coverage holds with no Gaussian assumption
    from loudml_spark.operators.tsmath import conformal_naive

    bands = conformal_naive(
        series, interval=3600, horizon=6, by=["event_type"])
    print("== 90% conformal bands (h=1) ==")
    bands.filter("h = 1").select(
        "event_type", "yhat", "q", "lower", "upper", "n_cal"
    ).orderBy("event_type").show()

    # 8d. reference-free drift + spectral anomalies on the raw
    #     hourly series: Page–Hinkley needs no target level (CUSUM
    #     above does), Spectral Residual needs no training (Donut
    #     does) — the zero-config first responders
    from loudml_spark.operators.tsmath import (
        page_hinkley, spectral_residual,
    )

    ph = page_hinkley(series, value_col="value", delta=0.5,
                      lam=30.0, by=["event_type"])
    sal = spectral_residual(series, by=["event_type"], threshold=3.0)
    print("page-hinkley alarm buckets:",
          ph.filter("is_change").count(),
          "  spectral-residual anomalies:",
          sal.filter("is_anomaly").count())

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

    # 10. live tail: the same events as a stream — counter increases
    #     + missing-heartbeat alerts into an idempotent parquet sink
    import tempfile

    work = tempfile.mkdtemp(prefix="loudml_monitoring_stream")
    rate_path, alert_path = streaming_tail(spark, sf_dir, work)
    print("stream rate rows:", spark.read.parquet(rate_path).count())
    alerts = spark.read.parquet(alert_path)
    print("heartbeat alerts:")
    alerts.orderBy("event_type").show(truncate=False)

    spark.stop()


def streaming_tail(spark, sf_dir: str, work: str,
                   gap_seconds: int = 6 * 3600) -> tuple[str, str]:
    """The r5 streaming operators composed production-shape: a file
    source drained one file per trigger, `stream_counter_increase`
    (reset-aware deltas whose state survives micro-batches) and
    `stream_heartbeat_alerts` (event-time state timeouts — alerts
    fire WITHOUT any event from the dead key), each landing in a
    batch-id-idempotent parquet sink so checkpoint replay after a
    crash cannot double-write.  Returns (rate_path, alerts_path).

    A sentinel event 2 days past the end of one key keeps the
    watermark advancing, so every other key's silence (> gap) is
    detected — the streaming analogue of a monitoring system's
    'still alive?' sweep."""
    from pyspark.sql import functions as F  # noqa: F811 (script+import use)

    from loudml_spark.sources.tables import load_table
    from loudml_spark.streaming.job import (
        idempotent_parquet_sink,
        stream_counter_increase,
        stream_heartbeat_alerts,
    )

    src = f"{work}/src"
    # loader ts is TIMESTAMP_NTZ: read the wall clock AS UTC under
    # any session timezone (a bare NTZ→TIMESTAMP cast shifts real
    # events by the session offset while the epoch-built sentinels
    # would not — skewing the gap geometry)
    staged = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("ts_ns") / F.lit(NS)).cast("long").alias("ts"),
        F.expr("cast(convert_timezone('UTC', current_timezone(), ts) "
               "as timestamp)").alias("tstamp"),
        "value",
    )
    # several ts-ordered files => several watermark advances
    staged.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src)
    # The file source feeds triggers in MODIFICATION-TIME order, and
    # the four range files land with near-identical mtimes — a tie the
    # listing may break AGAINST ts order.  A file picked up after a
    # later-range file makes its whole key-population late: the
    # watermark has passed, heartbeat state was already timed out, and
    # the re-created state alerts a SECOND time.  Pin strictly
    # increasing mtimes in ts-range order (part-file name order ==
    # range order) so pickup order is deterministic and every key's
    # events precede the watermark passing its due.
    import glob as _glob
    import os as _os
    import time as _time

    _now = _time.time()
    for _i, _f in enumerate(sorted(_glob.glob(f"{src}/part-*.parquet"))):
        _os.utime(_f, (_now + _i, _now + _i))
    # sentinels: one key beats far past everyone else's last event, so
    # the watermark passes every other key's (last_seen + gap).  TWO
    # sentinel batches because an event-time timeout fires one batch
    # AFTER the watermark passes it (the watermark a batch computes
    # applies from the next batch on).
    last = staged.agg(F.max("ts")).collect()[0][0]
    for i, offset_days in enumerate((2, 4)):
        spark.createDataFrame(
            [("click", last + offset_days * 86400, 0.0)],
            "event_type string, ts long, value double",
        ).withColumn(
            "tstamp", F.timestamp_seconds(F.col("ts"))
        ).select("event_type", "ts", "tstamp", "value") \
            .write.mode("append").parquet(f"{src}/sentinel_{i}")
        # same mtime pinning: each sentinel strictly after all data
        # files and after the previous sentinel
        for _f in _glob.glob(f"{src}/sentinel_{i}/part-*.parquet"):
            _os.utime(_f, (_now + 100 + i, _now + 100 + i))

    stream = (
        spark.readStream.schema(
            "event_type string, ts long, tstamp timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )

    rate_path, alert_path = f"{work}/rate", f"{work}/alerts"
    # the sentinels exist only to advance the heartbeat watermark —
    # keep their fabricated (click, 0.0) samples out of the rate
    # sink, where the 0.0 after real counter values would register
    # as a bogus reset
    inc = stream_counter_increase(
        stream.filter(F.col("ts") <= last)
        .select("event_type", "ts", "value"),
        key_col="event_type")
    q1 = (
        inc.writeStream.outputMode("append")
        .foreachBatch(idempotent_parquet_sink(rate_path, ["event_type"]))
        .option("checkpointLocation", f"{work}/ckpt_rate")
        .trigger(availableNow=True).start()
    )
    alerts = stream_heartbeat_alerts(
        stream.select("event_type", "tstamp"),
        key_col="event_type", ts_col="tstamp", gap_seconds=gap_seconds)
    q2 = (
        alerts.writeStream.outputMode("append")
        .foreachBatch(idempotent_parquet_sink(alert_path, []))
        .option("checkpointLocation", f"{work}/ckpt_alerts")
        .trigger(availableNow=True).start()
    )
    q1.awaitTermination(300)
    q2.awaitTermination(300)
    return rate_path, alert_path


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
