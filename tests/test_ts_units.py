"""Integer-timestamp bucketing must be exact (no double rounding)."""


from loudml_spark.operators.bucketize import bucketize


def test_ns_integer_bucketing_exact(spark):
    # points straddling a bucket boundary by exactly 1 ns
    base = 1704067200  # 2024-01-01, multiple of 3600
    rows = [
        ((base * 10**9) - 1, 1.0),   # last ns of previous bucket
        (base * 10**9, 2.0),          # first ns of bucket
        ((base + 3600) * 10**9 - 1, 3.0),
        ((base + 3600) * 10**9, 4.0),
    ]
    df = spark.createDataFrame(rows, "ts_ns long, v double")
    out = bucketize(
        df, ["count(v)", "sum(v)"], base - 3600, base + 7200, 3600,
        ts_col="ts_ns", ts_unit="ns",
    ).orderBy("bucket_ts")
    got = [(r["bucket_ts"], r["count_v"], r["sum_v"]) for r in out.collect()]
    assert got == [
        (base - 3600, 1.0, 1.0),
        (base, 2.0, 5.0),
        (base + 3600, 1.0, 4.0),
    ]


def test_ms_unit(spark):
    df = spark.createDataFrame(
        [(1000, 1.0), (2999, 2.0), (3000, 3.0)], "ts long, v double"
    )
    out = bucketize(df, ["avg(v)"], 0, 6, 3, ts_col="ts", ts_unit="ms")
    got = {r["bucket_ts"]: r["avg_v"] for r in out.collect()}
    assert got == {0: 1.5, 3: 3.0}
