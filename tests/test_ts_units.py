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


def test_ts_ns_independent_of_session_timezone(spark):
    """The events loader's derived ts_ns (and bucketize pushdown
    bounds) must not shift when an embedding application runs a
    non-UTC session timezone."""
    from loudml_spark.operators.bucketize import bucketize
    from loudml_spark.sources.tables import load_table

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = load_table(spark, "/root/testdata/sf0.001", "events") \
            .select("event_id", "ts_ns").orderBy("event_id").limit(5).collect()
        utc_b = bucketize(
            load_table(spark, "/root/testdata/sf0.001", "events"),
            ["count(value)"], "2024-01-01", "2024-01-02", "6h",
            ts_col="ts_ns", ts_unit="ns").collect()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = load_table(spark, "/root/testdata/sf0.001", "events") \
            .select("event_id", "ts_ns").orderBy("event_id").limit(5).collect()
        ny_b = bucketize(
            load_table(spark, "/root/testdata/sf0.001", "events"),
            ["count(value)"], "2024-01-01", "2024-01-02", "6h",
            ts_col="ts_ns", ts_unit="ns").collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert [r["ts_ns"] for r in utc] == [r["ts_ns"] for r in ny]
    assert sorted((r["bucket_ts"], r["count_value"]) for r in utc_b) == \
        sorted((r["bucket_ts"], r["count_value"]) for r in ny_b)
