"""Property-based tests (hypothesis) for the time/bucketize core —
invariants that must hold for ANY input, including pre-1970 epochs,
odd intervals, and arbitrary ranges."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from loudml_spark import timeutil
from loudml_spark.operators.bucketize import bucketize

ST_INTERVAL = st.integers(min_value=1, max_value=10**6)
ST_TS = st.integers(min_value=-(2**40), max_value=2**40)


@given(ts=ST_TS, interval=ST_INTERVAL)
def test_align_range_floor_ceil_invariants(ts, interval):
    lo, hi = timeutil.align_range(ts, ts + 1, interval)
    assert lo % interval == 0 and hi % interval == 0
    assert lo <= ts < hi
    assert lo == math.floor(ts / interval) * interval


@given(
    n=st.integers(min_value=0, max_value=400),
    unit=st.sampled_from(["s", "m", "h", "d", "w"]),
)
def test_parse_timedelta_roundtrip(n, unit):
    scale = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}[unit]
    assert timeutil.parse_timedelta(f"{n}{unit}") == n * scale


@pytest.mark.usefixtures("spark")
def test_bucket_floor_matches_python_floor(spark):
    # integer path must agree with Python floor division on a mix of
    # negative / boundary / positive epochs for several intervals
    cases = [-7201, -7200, -3601, -3600, -1, 0, 1, 3599, 3600, 7199]
    df = spark.createDataFrame(
        [(t, 1.0) for t in cases], "ts long, v double")
    for interval in (7, 60, 3600):
        out = bucketize(
            df, ["count(v)"], min(cases), max(cases) + 1, interval,
            ts_col="ts", ts_unit="s", spine=False,
        ).collect()
        got = {r["bucket_ts"] for r in out}
        want = {math.floor(t / interval) * interval for t in cases}
        assert got == want, interval


@settings(max_examples=25, deadline=None)
@given(
    points=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.floats(min_value=-1e6, max_value=1e6,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1, max_size=30,
    ),
    interval=st.integers(min_value=1, max_value=100),
)
def test_bucketize_spine_and_count_invariants(
        shared_spark, points, interval):
    """For any point set: the spine covers [floor(lo), ceil(hi)) with
    one row per bucket, counts are non-negative and sum to the number
    of in-range points."""
    spark = shared_spark
    lo = min(t for t, _ in points)
    hi = max(t for t, _ in points) + 1
    df = spark.createDataFrame(
        [(int(t), float(v)) for t, v in points], "ts long, v double")
    out = bucketize(
        df, ["count(v)"], lo, hi, interval, ts_col="ts", ts_unit="s",
    ).collect()
    from_b = math.floor(lo / interval) * interval
    to_b = math.ceil(hi / interval) * interval
    assert len(out) == (to_b - from_b) // interval
    assert [r["bucket_ts"] for r in sorted(out, key=lambda r: r["bucket_ts"])] \
        == list(range(from_b, to_b, interval))
    assert all(r["count_v"] >= 0 for r in out)
    assert sum(r["count_v"] for r in out) == len(points)


@pytest.fixture(scope="module")
def shared_spark(spark):
    return spark
