"""Production streaming pipeline: events → windowed aggregation →
partitioned parquet with batch-id idempotence.

This is the shape to copy for a real deployment (the catalog's
`streaming_detect_1h` uses a memory sink on purpose — bench-bounded;
see SCALE.md).  Three properties make it production-grade:

1. **Watermark** bounds state: late events beyond 10 minutes are
   dropped from open windows, so state is throughput × watermark.
2. **Checkpointing** makes the query restartable: offsets + state
   live in `checkpointLocation`, and after a crash the engine
   replays the last micro-batch.
3. **Batch-id idempotence** makes that replay safe: the sink
   overwrites the batch's own `_batch_id=N` partition instead of
   appending a duplicate (see
   loudml_spark.streaming.job.idempotent_parquet_sink).

Run: python examples/streaming_parquet_sink.py
(writes under /tmp/loudml_stream_example, processes the sf0.001
events table once via availableNow, then prints the sink contents)
"""

import os
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loudml_spark.streaming.job import idempotent_parquet_sink  # noqa: E402


def main():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("streaming-parquet-sink-example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="loudml_stream_example")
    src, out, ckpt = f"{work}/src", f"{work}/out", f"{work}/ckpt"

    # stage a bounded "stream": parquet files arriving in a directory
    from loudml_spark.sources.tables import load_table

    # range-partition by ts into several files consumed one per
    # trigger: append mode only emits a window once the WATERMARK
    # passes its end, and the watermark advances between micro-batches
    # — a single all-data batch would flush nothing
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    # watermarks need TIMESTAMP (with local tz) — the loader yields
    # ntz; the session tz is UTC so the cast is value-preserving
    events.select(
        events["ts"].cast("timestamp").alias("ts"), "event_type", "value"
    ).repartitionByRange(4, "ts").write.parquet(src)

    stream = (
        spark.readStream.schema(
            "ts timestamp, event_type string, value double"
        ).option("maxFilesPerTrigger", 1).parquet(src)
    )

    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.avg("value").alias("avg_value"),
            F.count("*").alias("n"),
        )
        .select(
            F.col("w.start").alias("bucket_ts"), "event_type",
            "avg_value", "n",
        )
    )

    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(idempotent_parquet_sink(out, ["event_type"]))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    result = spark.read.parquet(out)
    print(f"sink rows: {result.count()}")
    result.orderBy("bucket_ts", "event_type").show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
