"""Semantic goldens ported from the reference test suite
(tests/test_memdatasource.py:36-75, tests/test_influx.py:120-279)."""

import math

import pytest
from pyspark.sql import Row

from loudml_spark import errors
from loudml_spark.features import Feature, parse_expression
from loudml_spark.operators.align import align_features
from loudml_spark.operators.bucketize import bucketize


@pytest.fixture(scope="module")
def simple_df(spark):
    # (foo, timestamp) = (1,0),(2,1),(3,2),(4,8),(5,10)
    rows = [(0.0, 1.0), (1.0, 2.0), (2.0, 3.0), (8.0, 4.0), (10.0, 5.0)]
    return spark.createDataFrame(rows, "timestamp double, foo double")


def _series(df, col):
    rows = df.orderBy("bucket_ts").collect()
    return [r[col] for r in rows]


def test_avg_golden(spark, simple_df):
    out = bucketize(
        simple_df, ["avg(foo)"], 1, 9, 3, ts_col="timestamp"
    )
    assert _series(out, "bucket_ts") == [0, 3, 6]
    assert _series(out, "avg_foo") == [2.5, None, 4.0]


def test_count_golden(spark, simple_df):
    out = bucketize(simple_df, ["count(foo)"], 1, 9, 3, ts_col="timestamp")
    # count of empty bucket is 0, not null (tests/test_influx.py:279)
    assert _series(out, "count_foo") == [2.0, 0.0, 1.0]


def test_min_max_sum_spread(spark, simple_df):
    out = bucketize(
        simple_df,
        ["min(foo)", "max(foo)", "sum(foo)", "spread(foo)"],
        1, 9, 3, ts_col="timestamp",
    )
    assert _series(out, "min_foo") == [2.0, None, 4.0]
    assert _series(out, "max_foo") == [3.0, None, 4.0]
    assert _series(out, "sum_foo") == [5.0, None, 4.0]
    assert _series(out, "spread_foo") == [1.0, None, 0.0]


def test_default_constant_fill(spark, simple_df):
    out = bucketize(
        simple_df,
        [Feature(metric="avg", field="foo", default=0)],
        1, 9, 3, ts_col="timestamp",
    )
    assert _series(out, "avg_foo") == [2.5, 0.0, 4.0]


def test_default_previous_fill(spark, simple_df):
    # forward fill (loudml/donut.py:601-608)
    out = bucketize(
        simple_df,
        [Feature(metric="avg", field="foo", default="previous")],
        1, 9, 3, ts_col="timestamp",
    )
    assert _series(out, "avg_foo") == [2.5, 2.5, 4.0]


def test_transform_diff(spark, simple_df):
    out = bucketize(
        simple_df,
        [Feature(metric="avg", field="foo", default="previous", transform="diff")],
        1, 9, 3, ts_col="timestamp",
    )
    assert _series(out, "avg_foo") == [None, 0.0, 1.5]


def test_derivative_integral(spark, simple_df):
    out = bucketize(
        simple_df,
        ["derivative(foo)", "integral(foo)"],
        0, 12, 3, ts_col="timestamp",
    )
    # per-bucket means: [2.0, null, 4.0, 5.0]
    deriv = _series(out, "derivative_foo")
    assert deriv[0] is None
    assert deriv[2] is None  # previous bucket empty
    assert deriv[3] == pytest.approx((5.0 - 4.0) / 3)
    integ = _series(out, "integral_foo")
    assert integ == [6.0, None, 12.0, 15.0]


def test_half_open_range_and_alignment(spark, simple_df):
    # [0, 11) aligned to [0, 12): ts=10 included, 4 buckets
    out = bucketize(simple_df, ["count(foo)"], 0, 11, 3, ts_col="timestamp")
    assert _series(out, "bucket_ts") == [0, 3, 6, 9]
    assert _series(out, "count_foo") == [3.0, 0.0, 1.0, 1.0]


def test_match_all_filter(spark):
    rows = [
        (1.0, 10.0, "tag1", 9, False),
        (1.5, -10.0, "tag2", 7, True),
        (4.0, 20.0, "tag1", 9, False),
        (4.5, -20.0, "tag2", 7, True),
    ]
    df = spark.createDataFrame(
        rows, "timestamp double, baz double, tag_kw string, tag_int int, tag_bool boolean"
    )
    feat = Feature(
        metric="avg", field="baz", name="avg_baz",
        match_all=[
            {"tag": "tag_kw", "value": "tag2"},
            {"tag": "tag_int", "value": 7},
            {"tag": "tag_bool", "value": True},
        ],
    )
    out = bucketize(df, [feat], 0, 6, 3, ts_col="timestamp")
    assert _series(out, "avg_baz") == [-10.0, -20.0]


def test_multi_measurement_alignment(spark, simple_df):
    bar_df = spark.createDataFrame(
        [(0.5, 100.0), (7.0, 200.0)], "timestamp double, bar double"
    )
    f1 = parse_expression("avg(m1.foo)")
    f2 = parse_expression("count(m2.bar)")
    out = align_features(
        {"m1": simple_df, "m2": bar_df}, [f1, f2], 0, 9, 3, ts_col="timestamp"
    )
    assert _series(out, "bucket_ts") == [0, 3, 6]
    assert _series(out, "avg_m1_foo" if f1.name == "avg_m1_foo" else f1.name) \
        == [2.0, None, 4.0]
    assert _series(out, f2.name) == [1.0, 0.0, 1.0]


def test_stddev_population(spark):
    df = spark.createDataFrame(
        [(0.0, 1.0), (1.0, 2.0), (2.0, 3.0)], "timestamp double, foo double"
    )
    out = bucketize(df, ["std_deviation(foo)", "variance(foo)"], 0, 3, 3,
                    ts_col="timestamp")
    r = out.collect()[0]
    assert r["std_deviation_foo"] == pytest.approx(math.sqrt(2.0 / 3.0))
    assert r["variance_foo"] == pytest.approx(2.0 / 3.0)


def test_percentile_median_mode(spark):
    df = spark.createDataFrame(
        [(float(i), float(v)) for i, v in enumerate([1, 2, 2, 3, 100])],
        "timestamp double, foo double",
    )
    out = bucketize(
        df, ["median(foo)", "90percentile(foo)", "mode(foo)"],
        0, 5, 5, ts_col="timestamp",
    )
    r = out.collect()[0]
    assert r["median_foo"] == 2.0
    assert r["mode_foo"] == 2.0
    # linear interpolation: idx 3.6 → 3 + 0.6*(100-3) = 61.2
    assert r["90percentile_foo"] == pytest.approx(61.2)


def test_unsupported_metric():
    with pytest.raises(errors.UnsupportedMetric):
        Feature(metric="nope", field="foo")


def test_timestamp_column_type(spark):
    df = spark.createDataFrame(
        [Row(ts=i) for i in [0.0, 1.0, 2.0, 8.0, 10.0]]
    ).selectExpr("timestamp_seconds(ts) as ts", "ts as foo")
    out = bucketize(df, ["avg(foo)"], 1, 9, 3, ts_col="ts")
    vals = [r["avg_foo"] for r in out.orderBy("bucket_ts").collect()]
    assert vals == [1.5, None, 8.0]


def test_negative_epoch_buckets_floor_not_truncate(spark):
    # pre-1970 epochs must bucket to the LEFT edge: floor(-1/3600)=-1h,
    # not truncate-toward-zero's 0h (ADVICE r1: `div` vs DuckDB `//`)
    df = spark.createDataFrame(
        [(-1, 1.0), (-3600, 2.0), (10, 3.0)], "ts long, foo double"
    )
    out = bucketize(
        df, ["avg(foo)"], -3600, 3600, 3600, ts_col="ts", ts_unit="s"
    )
    got = {r["bucket_ts"]: r["avg_foo"] for r in out.collect()}
    assert got[-3600] == pytest.approx(1.5)  # both negatives in [-3600, 0)
    assert got[0] == pytest.approx(3.0)
