"""Unit gates for operators/irregular.py — TWA, gaps, range frames."""

import pytest

from loudml_spark import errors
from loudml_spark.operators.irregular import (
    gap_report,
    time_weighted_avg,
    trailing_count_range,
)

BASE = 1704067200


def test_twa_weights_by_duration(spark):
    # value 10 held for 90 s, then 20 for 10 s: TWA = (15*90... no —
    # trapezoid: seg1 = (10+10)/2*90? samples: 10@0, 10@90, 20@100
    rows = [("k", 1, BASE, 10.0), ("k", 2, BASE + 90, 10.0),
            ("k", 3, BASE + 100, 20.0)]
    df = spark.createDataFrame(rows, "k string, id long, ts long, v double")
    out = time_weighted_avg(
        df, ts_col="ts", value_col="v", by=["k"], order_col="id",
    ).collect()[0]
    # segments: 10*90 + 15*10 = 1050 over span 100
    assert out["twa"] == pytest.approx(10.5)
    assert (out["t_first"], out["t_last"], out["n_samples"]) == (
        BASE, BASE + 100, 3)
    # the plain mean would say 13.33 — the burst overweighted
    assert abs(out["twa"] - 40 / 3) > 2


def test_twa_single_sample_null(spark):
    df = spark.createDataFrame([("k", BASE, 5.0)],
                               "k string, ts long, v double")
    out = time_weighted_avg(df, ts_col="ts", value_col="v", by=["k"])
    assert out.collect()[0]["twa"] is None


def test_gap_report_finds_interior_gaps(spark):
    rows = [("a", BASE), ("a", BASE + 10), ("a", BASE + 1000),
            ("a", BASE + 1010), ("b", BASE)]
    df = spark.createDataFrame(rows, "k string, ts long")
    out = gap_report(df, ts_col="ts", threshold=100, by=["k"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["k"], r["gap_start"], r["gap_end"], r["gap"]) == (
        "a", BASE + 10, BASE + 1000, 990)
    with pytest.raises(errors.Invalid):
        gap_report(df, ts_col="ts", threshold=0)


def test_trailing_count_range_ties_and_window(spark):
    rows = [("k", 1, BASE, 1.0), ("k", 2, BASE + 50, 2.0),
            ("k", 3, BASE + 50, 3.0),      # simultaneous
            ("k", 4, BASE + 200, 4.0)]
    df = spark.createDataFrame(rows, "k string, id long, ts long, v double")
    out = {r["id"]: (r["trailing_n"], r["trailing_sum"])
           for r in trailing_count_range(
               df, ts_col="ts", range_width=100, by=["k"],
               value_col="v").collect()}
    assert out[1] == (1, 1.0)
    # RANGE frame: both simultaneous rows see the same 3-event window
    assert out[2] == (3, 6.0)
    assert out[3] == (3, 6.0)
    assert out[4] == (1, 4.0)  # 200-100=100 window excludes ts 50
