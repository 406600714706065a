"""As-of join semantics vs hand goldens and pandas merge_asof."""

import pandas as pd
import pytest

from loudml_spark import errors
from loudml_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [("a", 3, 100.0), ("a", 7, 101.0), ("b", 5, 200.0),
         ("b", 6, 201.0), ("c", 4, 300.0)],
        "sym string, ts long, trade_px double",
    )
    quotes = spark.createDataFrame(
        [("a", 1, 99.0), ("a", 5, 99.5), ("a", 7, 99.9),
         ("b", 6, 199.0)],
        "sym string, ts long, px double",
    )
    return trades, quotes


def test_asof_backward_inclusive_per_key(spark, frames):
    trades, quotes = frames
    out = {(r["sym"], r["ts"]): (r["__asof_ts"], r["px"])
           for r in asof_join(trades, quotes, by=["sym"]).collect()}
    assert out[("a", 3)] == (1, 99.0)
    assert out[("a", 7)] == (7, 99.9)   # inclusive at equal ts
    assert out[("b", 5)] == (None, None)  # no quote yet
    assert out[("b", 6)] == (6, 199.0)
    assert out[("c", 4)] == (None, None)  # key never quoted


def test_asof_tolerance(spark, frames):
    trades, quotes = frames
    out = {(r["sym"], r["ts"]): r["px"]
           for r in asof_join(trades, quotes, by=["sym"],
                              tolerance=1).collect()}
    assert out[("a", 3)] is None        # 3-1=2 > tolerance 1
    assert out[("a", 7)] == 99.9        # exact match within tolerance


def test_asof_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    lrows = sorted(
        (str(k), int(t)) for k, t in
        zip(rng.integers(0, 3, 80), rng.integers(0, 1000, 80))
    )
    rrows = sorted(
        (str(k), int(t), float(v)) for k, t, v in
        zip(rng.integers(0, 3, 40), rng.integers(0, 1000, 40),
            rng.normal(size=40))
    )
    # merge_asof needs unique (key, ts) on the right for a clean
    # comparison: dedupe keeping the last value
    seen = {}
    for k, t, v in rrows:
        seen[(k, t)] = v
    rrows = sorted((k, t, v) for (k, t), v in seen.items())
    left = spark.createDataFrame(lrows, "k string, ts long")
    # left needs a payload column for the operator contract
    left = left.withColumn("row_val", left.ts * 2)
    right = spark.createDataFrame(rrows, "k string, ts long, v double")
    got = asof_join(left, right, by=["k"]).collect()
    lpd = pd.DataFrame(lrows, columns=["k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["k", "ts", "v"]).sort_values("ts")
    want = pd.merge_asof(lpd, rpd, on="ts", by="k",
                         direction="backward")
    want_map = {}
    for _, r in want.iterrows():
        want_map.setdefault((r["k"], r["ts"]), []).append(
            None if pd.isna(r["v"]) else r["v"])
    for r in got:
        vals = want_map[(r["k"], r["ts"])]
        assert r["v"] in vals, (r["k"], r["ts"], r["v"], vals)


def test_asof_null_in_newest_row_not_mixed(spark):
    """A NULL payload column in the newest right row must stay NULL —
    not get back-filled from an older right row (merge_asof attaches
    one row atomically)."""
    left = spark.createDataFrame(
        [("a", 10, 1.0)], "k string, ts long, lv double")
    right = spark.createDataFrame(
        [("a", 1, 5.0, 50.0), ("a", 9, None, 90.0)],
        "k string, ts long, px double, qty double",
    )
    row = asof_join(left, right, by=["k"]).collect()[0]
    assert row["__asof_ts"] == 9
    assert row["qty"] == 90.0
    assert row["px"] is None, "px leaked from the older right row"


def test_asof_validates_inputs(spark, frames):
    trades, quotes = frames
    with pytest.raises(errors.Invalid):
        asof_join(trades, quotes.select("sym", "ts"), by=["sym"])
    with pytest.raises(errors.Invalid):
        asof_join(trades, quotes, on="nope")
