"""Unit gates for operators/tsmath.py: counter rate, linear
interpolation, CUSUM closed form, MAD robust scores."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from loudml_spark.operators.tsmath import (
    counter_increase,
    cusum,
    interpolate_linear,
    mad_scores,
)

BASE = 1704067200


def test_counter_increase_resets_and_rate(spark):
    # one key: counter 0→5→12, restart at 3, →10; second key monotonic
    rows = [
        ("a", BASE + 0, 0.0), ("a", BASE + 10, 5.0), ("a", BASE + 20, 12.0),
        ("a", BASE + 70, 3.0), ("a", BASE + 80, 10.0),
        ("b", BASE + 5, 100.0), ("b", BASE + 65, 160.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = counter_increase(
        df, ts_col="ts", value_col="v", interval=60, by=["k"],
    ).orderBy("k", "bucket_ts").collect()
    got = {(r["k"], r["bucket_ts"]): (r["increase"], r["rate"]) for r in out}
    # bucket 1 for a: deltas 5, 7 (first sample contributes nothing)
    assert got[("a", BASE)] == (12.0, 12.0 / 60)
    # bucket 2 for a: reset credits post-reset value 3, then delta 7
    assert got[("a", BASE + 60)] == (10.0, 10.0 / 60)
    # b: first sample alone in bucket 1 -> NULL increase (no pairs)
    assert got[("b", BASE)][0] is None
    assert got[("b", BASE + 60)] == (60.0, 1.0)


def test_counter_increase_tie_break_deterministic(spark):
    # two samples share a timestamp; order_col decides lag order
    rows = [("a", BASE, 1, 10.0), ("a", BASE, 2, 11.0),
            ("a", BASE + 1, 3, 13.0)]
    df = spark.createDataFrame(rows, "k string, ts long, id long, v double")
    out = counter_increase(
        df, ts_col="ts", value_col="v", interval=60, by=["k"],
        order_col="id",
    ).collect()
    assert out[0]["increase"] == 3.0  # (11-10) + (13-11)


def test_interpolate_linear_fills_interior_gaps(spark):
    rows = [(BASE + i * 10, v) for i, v in enumerate(
        [None, 1.0, None, None, 4.0, None])]
    df = spark.createDataFrame(rows, "bucket_ts long, value double")
    out = [r["value"] for r in
           interpolate_linear(df, value_col="value")
           .orderBy("bucket_ts").collect()]
    # leading/trailing gaps stay null; interior is time-weighted
    assert out[0] is None and out[5] is None
    assert out[1:5] == [1.0, 2.0, 3.0, 4.0]


def test_interpolate_linear_keyed_uneven_spacing(spark):
    rows = [("k", BASE, 10.0), ("k", BASE + 30, None),
            ("k", BASE + 40, 14.0), ("x", BASE, 5.0)]
    df = spark.createDataFrame(rows, "k string, bucket_ts long, value double")
    out = {(r["k"], r["bucket_ts"]): r["value"]
           for r in interpolate_linear(
               df, value_col="value", by=["k"]).collect()}
    # 30/40 of the way from 10 to 14
    assert out[("k", BASE + 30)] == pytest.approx(13.0)
    assert out[("x", BASE)] == 5.0


def test_cusum_matches_recursion(spark):
    rng = np.random.default_rng(7)
    vals = list(50.0 + rng.normal(0, 5, 40)) + list(
        60.0 + rng.normal(0, 5, 20))
    rows = [(BASE + i * 60, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "bucket_ts long, value double")
    k, h = 52.0, 30.0
    out = cusum(df, value_col="value", k=k, h=h).orderBy(
        "bucket_ts").collect()
    s = 0.0
    changed = False
    for i, r in enumerate(out):
        s = max(0.0, s + (vals[i] - k))
        assert r["cusum"] == pytest.approx(s, abs=1e-9), i
        changed = changed or r["is_change"]
    assert changed  # the level shift must trip the threshold


def test_cusum_keyed_and_null_rows(spark):
    rows = [("a", BASE, 10.0), ("a", BASE + 60, None),
            ("a", BASE + 120, 30.0), ("b", BASE, 1.0)]
    df = spark.createDataFrame(rows, "k string, bucket_ts long, value double")
    out = {(r["k"], r["bucket_ts"]): r["cusum"]
           for r in cusum(df, value_col="value", k=5.0, by=["k"]).collect()}
    assert out[("a", BASE)] == 5.0          # max(0, 10-5)
    assert out[("a", BASE + 60)] == 5.0     # null: drift unchanged
    assert out[("a", BASE + 120)] == 30.0   # 5 + 25
    assert out[("b", BASE)] == 0.0          # max(0, 1-5) clamps


def test_mad_scores_match_numpy(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = spark.createDataFrame(
        [("k", float(v)) for v in vals], "k string, value double")
    out = sorted(
        r["robust_score"]
        for r in mad_scores(df, value_col="value", by=["k"]).collect()
    )
    med = np.median(vals)
    mad = np.median(np.abs(np.array(vals) - med))
    want = sorted(0.6745 * (np.array(vals) - med) / mad)
    assert out == pytest.approx(list(want))


def test_mad_scores_unkeyed_literals_and_constant_null(spark):
    df = spark.createDataFrame([(float(v),) for v in (5, 6, 7)], "value double")
    plan = mad_scores(df, value_col="value")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    const = spark.createDataFrame([(2.0,), (2.0,)], "value double")
    got = mad_scores(const, value_col="value").collect()
    assert all(r["robust_score"] is None for r in got)


def test_ewma_trunc_matches_manual(spark):
    from loudml_spark.operators.tsmath import ewma_trunc, ewma_weights

    vals = [10.0, 12.0, None, 11.0, 15.0]
    rows = [("k", BASE + i * 60, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, bucket_ts long, value double")
    out = [r["e"] for r in ewma_trunc(
        df, value_col="value", halflife=2.0, n_lags=4, by=["k"],
        out_col="e",
    ).orderBy("bucket_ts").collect()]
    ws = ewma_weights(4, halflife=2.0)
    for i in range(len(vals)):
        num = den = 0.0
        for j, w in enumerate(ws):
            if i - j >= 0 and vals[i - j] is not None:
                num += w * vals[i - j]
                den += w
        assert out[i] == pytest.approx(num / den), i


def test_ewma_weights_validation():
    from loudml_spark import errors
    from loudml_spark.operators.tsmath import ewma_weights

    assert ewma_weights(3, alpha=0.5) == [1.0, 0.5, 0.25]
    with pytest.raises(errors.Invalid):
        ewma_weights(3)
    with pytest.raises(errors.Invalid):
        ewma_weights(3, alpha=0.5, halflife=2.0)
    with pytest.raises(errors.Invalid):
        ewma_weights(3, halflife=-1)


def test_ewma_sql_mirror_is_bit_identical(spark):
    import duckdb

    from loudml_spark.operators.tsmath import ewma_trunc, ewma_trunc_sql

    rng = np.random.default_rng(3)
    vals = [None if i % 7 == 3 else float(v)
            for i, v in enumerate(50 + rng.normal(0, 10, 40))]
    rows = [(BASE + i * 60, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "bucket_ts long, value double")
    got = {r["bucket_ts"]: r["ewma"] for r in ewma_trunc(
        df, value_col="value", alpha=0.3, n_lags=8).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (bucket_ts BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    expr = ewma_trunc_sql("value", 8, alpha=0.3)
    want = dict(con.execute(
        f"SELECT bucket_ts, {expr} FROM t WINDOW w AS (ORDER BY bucket_ts)"
    ).fetchall())
    assert got == want  # identical literals + op order -> identical bits


def test_decompose_additive_recovers_components(spark):
    from loudml_spark.operators.tsmath import decompose_additive

    # synthetic: linear trend + period-4 seasonal, one point per bucket
    period, interval = 4, 60
    seas = [3.0, -1.0, -2.0, 0.0]
    from decimal import Decimal

    rows = []
    for i in range(40):
        v = 10.0 + 0.5 * i + seas[i % period]
        rows.append((BASE + i * interval, 1, Decimal(str(v))))
    df = spark.createDataFrame(
        rows, "bucket_ts long, n long, sum_dec decimal(18,2)")
    out = decompose_additive(
        df, period=period, interval=interval).orderBy("bucket_ts").collect()
    h = period // 2
    # edges: incomplete centered window -> null trend and resid
    assert out[0]["trend"] is None and out[-1]["trend"] is None
    assert out[0]["resid"] is None
    mid = out[h:-h]
    assert all(r["trend"] is not None for r in mid)
    for r in mid:
        i = (r["bucket_ts"] - BASE) // interval
        # value reconstructs from the components (rounding only)
        assert r["value"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["resid"], abs=2e-6)
        # the ±h//2 centered MA of linear+seasonal tracks the trend
        # closely; seasonal phase means separate the cycle
        assert r["value"] == 10.0 + 0.5 * i + seas[int(i) % period]
    # phase means are constant per phase
    by_phase = {}
    for r in mid:
        i = int((r["bucket_ts"] - BASE) // interval)
        by_phase.setdefault(i % period, set()).add(r["seasonal"])
    assert all(len(v) == 1 for v in by_phase.values())


def test_quantile_bins_exact_and_approx(spark):
    from loudml_spark.operators.tsmath import quantile_bins

    rows = [("k", i, float(v)) for i, v in enumerate(
        [5, 1, 9, 3, 7, 2, 8, 4, 6, 10])]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    out = {r["v"]: r["bin"] for r in quantile_bins(
        df, value_col="v", n_bins=5, by=["k"], order_col="id").collect()}
    # 10 rows into 5 bins: 2 per bin by sorted value
    assert out[1.0] == 1 and out[2.0] == 1
    assert out[9.0] == 5 and out[10.0] == 5
    ap = quantile_bins(
        df, value_col="v", n_bins=5, by=["k"], approx=True).collect()
    bins = {r["v"]: r["bin"] for r in ap}
    assert min(bins.values()) == 1 and max(bins.values()) == 5
    # monotone: larger value never gets a smaller bin
    vs = sorted(bins)
    assert all(bins[a] <= bins[b] for a, b in zip(vs, vs[1:]))
    # unkeyed approx path (literal cut points, no join)
    un = quantile_bins(df, value_col="v", n_bins=2, approx=True)
    plan = un._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_quantile_bins_approx_empty_and_all_null(spark):
    """approx mode must not crash when approx_percentile returns NULL
    (empty input or an all-null value column): no cut points exist,
    every row lands in bin 1 — the bin a null value gets when cuts do
    exist."""
    from loudml_spark.operators.tsmath import quantile_bins

    empty = spark.createDataFrame([], "v double")
    assert quantile_bins(
        empty, value_col="v", n_bins=4, approx=True).count() == 0

    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    out = quantile_bins(nulls, value_col="v", n_bins=4, approx=True)
    assert [r["bin"] for r in out.collect()] == [1, 1]


def test_cross_correlation_detects_known_lag(spark):
    """b[t] = a[t + 2 buckets] (b leads a by 2): xcorr must be
    exactly 1.0 at lag=+2, overlap n shrinks away from the peak, and
    a constant series yields null."""
    import math
    import random

    import pytest

    from loudml_spark import errors
    from loudml_spark.operators.tsmath import cross_correlation

    rng = random.Random(7)
    vals = [rng.random() for _ in range(40)]
    a = spark.createDataFrame(
        [(i * 10, vals[i]) for i in range(40)],
        "bucket_ts long, value double")
    # b[t] = a[t + 2Δ]  =>  a[t] = b[t - 2Δ]  =>  peak at lag=+2
    b = spark.createDataFrame(
        [((i - 2) * 10, vals[i]) for i in range(40)],
        "bucket_ts long, value double")
    got = {r["lag"]: (r["n"], r["xcorr"])
           for r in cross_correlation(
               a, b, interval=10, max_lag=3).collect()}
    assert set(got) == set(range(-3, 4))
    assert got[2] == (40, 1.0)
    for lag, (n, x) in got.items():
        assert n == 40 - abs(lag - 2)
        if lag != 2:
            assert x is None or abs(x) < 0.5

    # python oracle for one off-peak lag (exact pearson, rounded 6)
    def pearson(xs, ys):
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        den = math.sqrt(sum((x - mx) ** 2 for x in xs)
                        * sum((y - my) ** 2 for y in ys))
        return num / den
    # lag 0: a[t] vs b[t] = vals[i] vs vals[i+2] over i where both exist
    exp = round(pearson(vals[:-2], vals[2:]), 6)
    assert got[0][1] == pytest.approx(exp, abs=1e-6)

    const = spark.createDataFrame(
        [(i * 10, 5.0) for i in range(40)],
        "bucket_ts long, value double")
    g2 = {r["lag"]: r["xcorr"] for r in cross_correlation(
        a, const, interval=10, max_lag=1).collect()}
    assert all(v is None for v in g2.values())

    with pytest.raises(errors.Invalid):
        cross_correlation(a, b, interval=0, max_lag=1)
    with pytest.raises(errors.Invalid):
        cross_correlation(a, b, interval=10, max_lag=-1)


def test_theil_sen_robust_to_outlier(spark):
    """y = 3 + 2x with one wild spike: Theil-Sen recovers slope 2
    exactly (python median-of-pairwise-slopes oracle), keyed and
    unkeyed, while an OLS fit would be dragged."""
    import statistics

    from loudml_spark.operators.tsmath import theil_sen

    xs = list(range(12))
    ys = [3.0 + 2.0 * x for x in xs]
    ys[5] = 500.0
    rows = [(x, y) for x, y in zip(xs, ys)]

    def oracle(xs, ys):
        slopes = [(ys[j] - ys[i]) / (xs[j] - xs[i])
                  for i in range(len(xs)) for j in range(i + 1, len(xs))]
        s = statistics.median(slopes)
        b = statistics.median(y - s * x for x, y in zip(xs, ys))
        return round(s, 6), round(b, 6)

    df = spark.createDataFrame(rows, "bucket_ts long, value double")
    got = theil_sen(df).collect()
    assert len(got) == 1
    es, eb = oracle(xs, ys)
    assert (got[0]["slope"], got[0]["intercept"],
            got[0]["n_points"]) == (es, eb, 12)
    assert abs(got[0]["slope"] - 2.0) < 0.2  # robustness claim

    keyed = spark.createDataFrame(
        [("a", x, y) for x, y in rows]
        + [("b", x, float(7 - x)) for x in xs],
        "k string, bucket_ts long, value double")
    g2 = {r["k"]: (r["slope"], r["intercept"])
          for r in theil_sen(keyed, by=["k"]).collect()}
    assert g2["a"] == oracle(xs, ys)
    assert g2["b"] == (-1.0, 7.0)


def test_naive_forecast_modes(spark):
    """FPP3 definitions, hand-computed: naive repeats y_T, drift
    extrapolates the first-to-last line, seasonal naive repeats the
    last season, snaive+drift adds the drift term; short series emit
    no seasonal rows beyond their data, n=1 drift is null."""
    import pytest

    from loudml_spark import errors
    from loudml_spark.operators.tsmath import naive_forecast

    ys = [10.0, 20.0, 30.0, 25.0, 35.0, 45.0]  # n=6
    df = spark.createDataFrame(
        [(i * 10, v) for i, v in enumerate(ys)],
        "bucket_ts long, value double")

    nav = {r["h"]: (r["forecast_ts"], r["yhat"]) for r in
           naive_forecast(df, interval=10, horizon=3).collect()}
    assert nav == {1: (60, 45.0), 2: (70, 45.0), 3: (80, 45.0)}

    dr = {r["h"]: r["yhat"] for r in naive_forecast(
        df, interval=10, horizon=3, drift=True).collect()}
    d = (45.0 - 10.0) / 5
    assert dr == {h: round(45.0 + h * d, 6) for h in (1, 2, 3)}

    sn = {r["h"]: r["yhat"] for r in naive_forecast(
        df, interval=10, horizon=5, season=3).collect()}
    # last season = [25, 35, 45]; h=1..5 -> 25,35,45,25,35
    assert sn == {1: 25.0, 2: 35.0, 3: 45.0, 4: 25.0, 5: 35.0}

    snd = {r["h"]: r["yhat"] for r in naive_forecast(
        df, interval=10, horizon=4, season=3, drift=True).collect()}
    assert snd == {1: round(25.0 + 1 * d, 6), 2: round(35.0 + 2 * d, 6),
                   3: round(45.0 + 3 * d, 6), 4: round(25.0 + 4 * d, 6)}

    short = spark.createDataFrame(
        [(0, 1.0), (10, 2.0)], "bucket_ts long, value double")
    # season=4 but only 2 points: h whose source rank > 2 emit nothing
    s2 = {r["h"]: r["yhat"] for r in naive_forecast(
        short, interval=10, horizon=4, season=4).collect()}
    assert s2 == {3: 1.0, 4: 2.0}

    one = spark.createDataFrame([(0, 9.0)], "bucket_ts long, value double")
    o = naive_forecast(one, interval=10, horizon=2, drift=True).collect()
    assert all(r["yhat"] is None for r in o)

    with pytest.raises(errors.Invalid):
        naive_forecast(df, interval=10, horizon=0)
    with pytest.raises(errors.Invalid):
        naive_forecast(df, interval=0, horizon=1)
    with pytest.raises(errors.Invalid):
        naive_forecast(df, interval=10, horizon=1, season=0)


def test_forecast_backtest_hand_computed(spark):
    """Python oracle over a short keyed series: naive errors are
    y_t - y_{t-h}; snaive(m=3) sources from the same weekday-slot;
    only origins with an existing lag score."""
    import math

    import pytest

    from loudml_spark import errors
    from loudml_spark.operators.tsmath import forecast_backtest

    ys = [10.0, 12.0, 9.0, 14.0, 11.0, 13.0, 15.0]
    df = spark.createDataFrame(
        [("a", i * 10, v) for i, v in enumerate(ys)],
        "k string, bucket_ts long, value double")

    def oracle(offset):
        es = [ys[i] - ys[i - offset] for i in range(offset, len(ys))]
        return (len(es), round(sum(abs(e) for e in es) / len(es), 6),
                round(math.sqrt(sum(e * e for e in es) / len(es)), 6))

    got = {r["h"]: (r["n"], r["mae"], r["rmse"])
           for r in forecast_backtest(
               df, horizons=[1, 2, 3], by=["k"]).collect()}
    assert got == {1: oracle(1), 2: oracle(2), 3: oracle(3)}

    # snaive m=3: h=1..3 all source lag 3; h=4 sources lag 6
    sn = {r["h"]: (r["n"], r["mae"], r["rmse"])
          for r in forecast_backtest(
              df, horizons=[1, 2, 3, 4], method="snaive", season=3,
              by=["k"]).collect()}
    assert sn[1] == sn[2] == sn[3] == oracle(3)
    assert sn[4] == oracle(6)

    with pytest.raises(errors.Invalid):
        forecast_backtest(df, horizons=[0])
    with pytest.raises(errors.Invalid):
        forecast_backtest(df, method="snaive")
    with pytest.raises(errors.Invalid):
        forecast_backtest(df, method="arima")


def test_winsorize_clips_tails(spark):
    import numpy as np

    from loudml_spark import errors
    from loudml_spark.operators.tsmath import winsorize

    vals = [float(v) for v in range(1, 21)] + [1000.0, -50.0]
    df = spark.createDataFrame(
        [("k", v) for v in vals] + [("k", None), ("x", 5.0)],
        "k string, value double")
    out = {r["value"]: r["w"] for r in winsorize(
        df, value_col="value", lower=0.1, upper=0.9, by=["k"],
        out_col="w").filter("k = 'k'").collect()}
    lo, hi = (float(np.percentile(vals, 10)),
              float(np.percentile(vals, 90)))
    assert out[1000.0] == pytest.approx(hi)
    assert out[-50.0] == pytest.approx(lo)
    assert out[10.0] == 10.0          # interior untouched
    assert out[None] is None          # nulls pass through
    with pytest.raises(errors.Invalid):
        winsorize(df, value_col="value", lower=0.9, upper=0.1)


def test_changepoint_mean_finds_level_shift(spark):
    """Level shift at a known index: the max-centered-cumsum-deviation
    estimate lands on (or within one bucket of) the true split;
    python oracle pins the exact statistic and tie-break."""
    import numpy as np

    from loudml_spark.operators.tsmath import changepoint_mean

    rng = np.random.default_rng(4)
    vals = [float(v) for v in 10 + rng.normal(0, 0.5, 30)] + \
           [float(v) for v in 16 + rng.normal(0, 0.5, 20)]
    rows = [("a", i * 10, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, bucket_ts long, value double")
    got = changepoint_mean(df, by=["k"]).collect()[0]

    c = np.cumsum(vals)
    n = len(vals)
    dev = np.abs(c - (np.arange(1, n + 1) / n) * c[-1])
    best = int(np.argmax(dev))
    assert got["changepoint_ts"] == best * 10
    assert abs(best - 29) <= 1          # true shift after index 29
    assert got["statistic"] == round(float(dev[best]), 6)
    assert got["n_points"] == 50

    # constant series: every deviation 0, tie breaks to earliest ts
    const = spark.createDataFrame(
        [("c", i * 10, 5.0) for i in range(8)],
        "k string, bucket_ts long, value double")
    g2 = changepoint_mean(const, by=["k"]).collect()[0]
    assert g2["changepoint_ts"] == 0 and g2["statistic"] == 0.0


def test_decomposition_strength_separates_shapes(spark):
    """Strong seasonal + linear trend series vs pure noise: the
    F-measures order correctly and match a numpy oracle."""
    import math

    import numpy as np
    import pytest

    from loudml_spark.operators.tsmath import (
        decompose_additive, decomposition_strength,
    )

    rng = np.random.default_rng(2)
    period, n = 8, 64
    vals = [0.5 * i + 10 * math.sin(2 * math.pi * i / period)
            + float(rng.normal(0, 0.3)) for i in range(n)]
    df = spark.createDataFrame(
        [(i * 10, v) for i, v in enumerate(vals)],
        "bucket_ts long, value double").selectExpr(
        "bucket_ts", "CAST(value AS DECIMAL(28,10)) AS sum_dec",
        "CAST(1 AS LONG) AS n")
    dec = decompose_additive(df, period=period, interval=10)
    got = decomposition_strength(dec).collect()[0]
    assert got["trend_strength"] > 0.8
    assert got["seasonal_strength"] > 0.95

    rows = dec.filter("trend IS NOT NULL AND resid IS NOT NULL") \
        .select("trend", "seasonal", "resid").collect()
    t = np.array([r["trend"] for r in rows])
    s = np.array([r["seasonal"] for r in rows])
    e = np.array([r["resid"] for r in rows])
    ft = max(0.0, 1 - e.var() / (t + e).var())
    fs = max(0.0, 1 - e.var() / (s + e).var())
    assert got["trend_strength"] == pytest.approx(round(ft, 6), abs=1e-6)
    assert got["seasonal_strength"] == pytest.approx(round(fs, 6), abs=1e-6)
    assert got["n"] == len(rows)

    noise = spark.createDataFrame(
        [(i * 10, float(v)) for i, v in
         enumerate(rng.normal(0, 1, n))],
        "bucket_ts long, value double").selectExpr(
        "bucket_ts", "CAST(value AS DECIMAL(28,10)) AS sum_dec",
        "CAST(1 AS LONG) AS n")
    g2 = decomposition_strength(
        decompose_additive(noise, period=period, interval=10)
    ).collect()[0]
    assert g2["seasonal_strength"] < got["seasonal_strength"]


def test_brown_forecast_tracks_linear_trend(spark):
    """On a clean linear series Brown's method converges to the true
    slope: the h-step forecasts track y = a + b*t closely, and a
    python replay of the truncated double smoothing matches
    exactly."""
    import pytest

    from loudml_spark import errors
    from loudml_spark.operators.tsmath import brown_forecast, ewma_weights

    b0, b1 = 5.0, 2.0
    vals = [b0 + b1 * i for i in range(60)]
    df = spark.createDataFrame(
        [(i * 10, v) for i, v in enumerate(vals)],
        "bucket_ts long, value double")
    got = {r["h"]: (r["forecast_ts"], r["yhat"])
           for r in brown_forecast(
               df, interval=10, horizon=3, alpha=0.5,
               n_lags=24).collect()}

    # python replay of the truncated renormalized double EWMA
    ws = ewma_weights(24, alpha=0.5)

    def trunc_ewma(series, t):
        num = den = 0.0
        for j, w in enumerate(ws):
            if t - j >= 0 and series[t - j] is not None:
                num += w * series[t - j]
                den += w
        return num / den

    s1 = [trunc_ewma(vals, t) for t in range(60)]
    s2 = [trunc_ewma(s1, t) for t in range(60)]
    level = 2 * s1[-1] - s2[-1]
    slope = (0.5 / 0.5) * (s1[-1] - s2[-1])
    for h in (1, 2, 3):
        assert got[h][0] == 590 + h * 10
        assert got[h][1] == pytest.approx(
            round(level + h * slope, 6), abs=1e-6)
        # trend-aware: within 2% of the true line
        truth = b0 + b1 * (59 + h)
        assert abs(got[h][1] - truth) / truth < 0.02

    with pytest.raises(errors.Invalid):
        brown_forecast(df, interval=10, horizon=0, alpha=0.5)
    with pytest.raises(errors.Invalid):
        brown_forecast(df, interval=0, horizon=1, alpha=0.5)


def test_mann_kendall_matches_reference_formulas(spark):
    """Python oracle (textbook S, tie-corrected variance, continuity-
    corrected z) on a trending, a flat-with-ties, and a descending
    series; trend labels at |z| > 1.96."""
    import math

    import pytest

    from loudml_spark.operators.tsmath import mann_kendall

    def oracle(vals):
        n = len(vals)
        s = sum((vals[j] > vals[i]) - (vals[j] < vals[i])
                for i in range(n) for j in range(i + 1, n))
        from collections import Counter
        ties = Counter(vals)
        tie = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        if s > 0:
            z = (s - 1) / math.sqrt(var)
        elif s < 0:
            z = (s + 1) / math.sqrt(var)
        else:
            z = 0.0
        return s, var, round(z, 6)

    series = {
        "up": [1.0, 2.0, 1.5, 3.0, 4.0, 3.5, 5.0, 6.0, 7.0, 8.0],
        "flat": [2.0, 2.0, 2.0, 3.0, 1.0, 2.0, 2.0, 3.0, 1.0, 2.0],
        "down": [9.0, 8.5, 8.0, 7.0, 7.5, 6.0, 5.0, 4.0, 3.0, 2.0],
    }
    rows = [(k, i * 10, v) for k, vs in series.items()
            for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "k string, bucket_ts long, value double")
    got = {r["k"]: r for r in mann_kendall(df, by=["k"]).collect()}
    for k, vs in series.items():
        s, var, z = oracle(vs)
        r = got[k]
        assert (r["n"], r["s_stat"]) == (10, s), k
        assert r["var_s"] == pytest.approx(var)
        assert r["z"] == pytest.approx(z, abs=1e-6)
    assert got["up"]["trend"] == "increasing"
    assert got["down"]["trend"] == "decreasing"
    assert got["flat"]["trend"] == "no trend"

    # unkeyed path
    one = mann_kendall(spark.createDataFrame(
        [(i * 10, float(i)) for i in range(8)],
        "bucket_ts long, value double")).collect()
    assert len(one) == 1 and one[0]["trend"] == "increasing"


def test_periodogram_finds_planted_period(spark):
    """A pure 24-bucket cosine must put essentially all spectral
    power at freq = n/24; numpy oracle reproduces each power to
    1e-6 (same exact-integer angle reduction)."""
    import math

    import numpy as np
    import pytest

    from loudml_spark.operators.tsmath import periodogram

    n = 240  # 10 full cycles of a period-24 wave
    vals = [5.0 + 2.0 * math.cos(2 * math.pi * t / 24) for t in range(n)]
    rows = [(t * 3600, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "bucket_ts long, value double")
    got = {r["freq"]: r for r in periodogram(
        df, interval=3600, max_freq=20).collect()}
    assert len(got) == 20

    def oracle(k):
        arr = np.array(vals)
        d = arr - arr.mean()
        th = 2 * math.pi * ((k * np.arange(n)) % n) / n
        c = round(float((d * np.cos(th)).sum()), 6)
        s = round(float((d * np.sin(th)).sum()), 6)
        return round((c * c + s * s) / n, 6)

    for k in range(1, 21):
        assert got[k]["power"] == pytest.approx(oracle(k), abs=2e-6), k
        assert got[k]["n"] == n
        assert got[k]["period"] == pytest.approx(n / k, abs=1e-6)
    peak = max(got.values(), key=lambda r: r["power"])
    assert peak["freq"] == 10  # n/24 = 240/24
    assert peak["power"] > 100 * sorted(
        r["power"] for r in got.values())[-2]

    from loudml_spark import errors as lerr
    with pytest.raises(lerr.Invalid):
        periodogram(df, interval=0, max_freq=5)
    with pytest.raises(lerr.Invalid):
        periodogram(df, interval=3600, max_freq=0)


def test_periodogram_keyed_and_sparse(spark):
    """Keys stay independent; a missing bucket drops one term but
    keeps calendar-true periods (n_span from the timestamp span)."""
    import math

    from loudml_spark.operators.tsmath import periodogram

    rows = []
    for t in range(48):
        rows.append(("a", t * 10, math.cos(2 * math.pi * t / 12)))
        if t != 7:  # hole in series b
            rows.append(("b", t * 10, math.cos(2 * math.pi * t / 6)))
    df = spark.createDataFrame(rows, "k string, bucket_ts long, value double")
    got = periodogram(df, by=["k"], interval=10, max_freq=10).collect()
    by_k = {}
    for r in got:
        by_k.setdefault(r["k"], {})[r["freq"]] = r
    assert max(by_k["a"].values(), key=lambda r: r["power"])["freq"] == 4
    assert max(by_k["b"].values(), key=lambda r: r["power"])["freq"] == 8
    assert by_k["b"][8]["n"] == 47 and by_k["b"][8]["period"] == 6.0


def test_ljung_box_white_vs_autocorrelated(spark):
    """Deterministic seeded noise stays white at every lag (an
    affine-hash sequence does NOT — it's a small-modulus LCG, heavily
    autocorrelated); a strong AR-ish sawtooth fails immediately.  Q matches
    a from-the-formula python oracle built on the same rounded r."""
    import pytest

    from loudml_spark.operators.tsmath import ljung_box

    import random

    n = 120
    rng = random.Random(42)  # Mersenne: platform-stable
    noise = [rng.uniform(-1.0, 1.0) for _ in range(n)]
    saw = [float(t % 12) for t in range(n)]
    rows = [("noise", t * 10, v) for t, v in enumerate(noise)]
    rows += [("saw", t * 10, v) for t, v in enumerate(saw)]
    df = spark.createDataFrame(rows, "k string, bucket_ts long, value double")
    got = {(r["k"], r["lag"]): r
           for r in ljung_box(df, by=["k"], interval=10, max_lag=10)
           .collect()}

    def oracle(vals, max_lag):
        m = sum(vals) / len(vals)
        d = [x - m for x in vals]
        ss = sum(x * x for x in d)
        out, acc = {}, 0.0
        nn = len(vals)
        for k in range(1, max_lag + 1):
            r = round(sum(d[t] * d[t + k] for t in range(nn - k)) / ss, 6)
            acc += r * r / (nn - k)
            out[k] = (r, round(nn * (nn + 2) * acc, 6))
        return out

    for name, series in (("noise", noise), ("saw", saw)):
        exp = oracle(series, 10)
        for k in range(1, 11):
            r, q = exp[k]
            assert got[(name, k)]["r"] == pytest.approx(r, abs=1e-6), (name, k)
            assert got[(name, k)]["q_stat"] == pytest.approx(
                q, abs=1e-4), (name, k)
    # the sawtooth is maximally autocorrelated at its period
    assert not got[("saw", 1)]["white"]
    assert all(got[("noise", k)]["white"] for k in range(1, 11))
    # Wilson-Hilferty matches chi2.ppf(0.95, k) within 1%
    assert got[("noise", 1)]["q_crit"] == pytest.approx(3.841, rel=0.01)
    assert got[("noise", 10)]["q_crit"] == pytest.approx(18.307, rel=0.01)

    from loudml_spark import errors as lerr
    with pytest.raises(lerr.Invalid):
        ljung_box(df, by=["k"], interval=10, max_lag=0)


def test_holt_winters_perfect_seasonal_and_trend(spark):
    from loudml_spark.operators.tsmath import (
        holt_winters_forecast,
        hw_fit_forecast,
    )

    # perfectly periodic series: the recurrence is a fixed point, so
    # the forecast reproduces the cycle exactly at any h
    rows = [(t * 10, 10.0 if t % 2 == 0 else 20.0, "a")
            for t in range(8)]
    df = spark.createDataFrame(rows, "bucket_ts long, value double, k string")
    out = holt_winters_forecast(
        df, interval=10, period=2, horizon=4, by=["k"])
    got = {r["h"]: (r["forecast_ts"], r["yhat"])
           for r in out.collect()}
    assert got == {1: (80, 10.0), 2: (90, 20.0),
                   3: (100, 10.0), 4: (110, 20.0)}
    # linear series: forecast continues the trend (approximately -
    # HW needs burn-in; assert monotone continuation above the last y)
    lin = hw_fit_forecast([float(i) for i in range(1, 13)],
                          period=2, horizon=3,
                          alpha=0.5, beta=0.3, gamma=0.1)
    assert lin[0] > 11.0 and lin[0] < lin[1] < lin[2]
    # unkeyed variant + determinism under repartition
    df2 = df.drop("k")
    a = sorted(holt_winters_forecast(
        df2, interval=10, period=2, horizon=2).collect())
    b = sorted(holt_winters_forecast(
        df2.repartition(7), interval=10, period=2, horizon=2).collect())
    assert a == b and len(a) == 2


def test_holt_winters_guards(spark):
    import pytest as _pt

    from loudml_spark import errors
    from loudml_spark.operators.tsmath import (
        holt_winters_forecast,
        hw_fit_forecast,
    )

    # short keys emit no rows instead of failing the job
    rows = [(t, float(t), "long8") for t in range(8)] + \
           [(t, float(t), "short3") for t in range(3)]
    df = spark.createDataFrame(rows, "bucket_ts long, value double, k string")
    out = holt_winters_forecast(
        df, interval=1, period=2, horizon=1, by=["k"])
    ks = {r["k"] for r in out.collect()}
    assert ks == {"long8"}
    with _pt.raises(errors.Invalid):
        hw_fit_forecast([1.0, 2.0, 3.0], period=2, horizon=1,
                        alpha=0.3, beta=0.1, gamma=0.2)
    with _pt.raises(errors.Invalid):
        hw_fit_forecast([1.0, float("nan"), 3.0, 4.0], period=2,
                        horizon=1, alpha=0.3, beta=0.1, gamma=0.2)
    with _pt.raises(errors.Invalid):
        holt_winters_forecast(df, interval=1, period=2, horizon=1,
                              alpha=1.5, by=["k"])
    with _pt.raises(errors.Invalid):
        holt_winters_forecast(df, interval=1, period=1, horizon=1,
                              by=["k"])


def test_conformal_naive_order_statistic_bands(spark):
    import pytest as _pt

    from loudml_spark import errors
    from loudml_spark.operators.tsmath import conformal_naive

    # linear series: h-step |errors| are all exactly h, so q_h = h and
    # the band is yhat +/- h at every horizon
    rows = [(t, float(t), "a") for t in range(30)]
    df = spark.createDataFrame(rows, "bucket_ts long, value double, k string")
    out = {r["h"]: r for r in conformal_naive(
        df, interval=1, horizon=3, by=["k"]).collect()}
    for h in (1, 2, 3):
        r = out[h]
        assert (r["yhat"], r["q"]) == (29.0, float(h))
        assert (r["lower"], r["upper"]) == (29.0 - h, 29.0 + h)
        assert r["n_cal"] == 30 - h and r["forecast_ts"] == 29 + h
    # rank k = ceil((n+1)*0.9) is an ORDER STATISTIC: with n=29 ->
    # k=27; craft residuals {1..29} shuffled in time -> q = 27
    import random
    rng = random.Random(7)
    vals, acc = [0.0], 0.0
    steps = [float(s) for s in range(1, 30)]
    rng.shuffle(steps)
    for s in steps:
        acc += s * rng.choice([1.0, -1.0])
        vals.append(acc)
    df2 = spark.createDataFrame(
        [(t, v) for t, v in enumerate(vals)], "bucket_ts long, value double")
    r1 = {r["h"]: r for r in conformal_naive(
        df2, interval=1, horizon=1).collect()}[1]
    assert r1["q"] == 27.0 and r1["n_cal"] == 29
    # too few calibration points for 90% coverage -> NULL band
    short = spark.createDataFrame(
        [(t, float(t)) for t in range(4)], "bucket_ts long, value double")
    r = conformal_naive(short, interval=1, horizon=1).collect()[0]
    assert r["q"] is None and r["lower"] is None and r["upper"] is None
    assert r["n_cal"] == 3   # k = ceil(4*0.9) = 4 > 3
    with _pt.raises(errors.Invalid):
        conformal_naive(df, interval=1, horizon=1, alpha_num=10,
                        alpha_den=10, by=["k"])


def test_isotonic_calibrate_pav(spark):
    import pytest as _pt

    from loudml_spark import errors
    from loudml_spark.operators.calibrate import (
        isotonic_calibrate,
        pav_fit,
    )

    # classic violator: rates [.5, .75, .25, 1] -> PAV pools the
    # middle pair to (3+1)/(4+4) = .5
    assert pav_fit([1, 3, 1, 4], [2, 4, 4, 4]) == [0.5, 0.5, 0.5, 1.0]
    # already monotone input is untouched
    assert pav_fit([0, 1, 2], [2, 2, 2]) == [0.0, 0.5, 1.0]
    with _pt.raises(errors.Invalid):
        pav_fit([1], [0])
    with _pt.raises(errors.Invalid):
        pav_fit([3], [2])

    data = [(0.10, False), (0.1, False), (0.2, True), (0.2, False),
            (0.3, False), (0.3, True), (0.4, True), (0.4, True),
            (0.5, True), (0.5, False), (None, True), (0.6, None)]
    df = spark.createDataFrame(data, "score double, label boolean")
    out = sorted(isotonic_calibrate(
        df, score_col="score", label_col="label").collect(),
        key=lambda r: r["bin"])
    # null score / null label rows excluded -> 10 rows in 5 bins
    assert [r["n"] for r in out] == [2, 2, 2, 2, 2]
    assert [r["rate"] for r in out] == [0.0, 0.5, 0.5, 1.0, 0.5]
    fitted = [r["fitted"] for r in out]
    assert fitted == [0.0, 0.5, 0.5, 0.75, 0.75]
    # defining property: non-decreasing
    assert all(a <= b for a, b in zip(fitted, fitted[1:]))
    # keyed variant: independent fits per key
    df2 = df.withColumn("g", F.lit("x")).union(
        df.withColumn("g", F.lit("y")))
    out2 = isotonic_calibrate(
        df2, score_col="score", label_col="label", by=["g"]).collect()
    assert len(out2) == 10 and {r["g"] for r in out2} == {"x", "y"}
    with _pt.raises(errors.Invalid):
        isotonic_calibrate(df, score_col="nope", label_col="label")


def test_binary_auc_rank_identity(spark):
    import itertools

    import pytest as _pt

    from loudml_spark import errors
    from loudml_spark.operators.calibrate import binary_auc

    data = [(0.9, True), (0.8, True), (0.2, False), (0.1, False),
            (0.5, True), (0.5, False), (None, True), (0.7, None)]
    df = spark.createDataFrame(data, "score double, label boolean")
    r = binary_auc(df, score_col="score", label_col="label").collect()[0]
    pos, neg = [0.9, 0.8, 0.5], [0.2, 0.1, 0.5]
    want = sum(1.0 if p > n else 0.5 if p == n else 0.0
               for p, n in itertools.product(pos, neg)) / 9
    assert (r["n_pos"], r["n_neg"]) == (3, 3)
    assert r["auc"] == round(want, 6)
    # perfect separation / reversal
    sep = spark.createDataFrame(
        [(1.0, True), (0.9, True), (0.1, False)], "score double, label boolean")
    assert binary_auc(sep, score_col="score",
                      label_col="label").collect()[0]["auc"] == 1.0
    rev = spark.createDataFrame(
        [(0.1, True), (0.9, False)], "score double, label boolean")
    assert binary_auc(rev, score_col="score",
                      label_col="label").collect()[0]["auc"] == 0.0
    # degenerate: single-class key -> NULL auc, not an error
    one = spark.createDataFrame(
        [(0.5, True), (0.6, True)], "score double, label boolean")
    r = binary_auc(one, score_col="score", label_col="label").collect()[0]
    assert r["auc"] is None and r["n_neg"] == 0
    # keyed + binned variants execute
    k = df.withColumn("g", F.lit("x"))
    assert binary_auc(k, score_col="score", label_col="label",
                      by=["g"], bin_dp=1).collect()[0]["g"] == "x"
    with _pt.raises(errors.Invalid):
        binary_auc(df, score_col="score", label_col="label", bin_dp=-1)


def test_calibration_error_exact_micro_units(spark):
    import pytest as _pt

    from loudml_spark import errors
    from loudml_spark.operators.calibrate import calibration_error

    # bin-level perfectly calibrated -> 0; fully miscalibrated -> .9
    good = [(0.2, i < 1) for i in range(5)] + \
           [(0.8, i < 4) for i in range(5)]
    df = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in good], "score double, label boolean")
    r = calibration_error(df, score_col="score", label_col="label") \
        .collect()[0]
    assert (r["n"], r["ece"], r["mce"]) == (10, 0.0, 0.0)
    bad = spark.createDataFrame(
        [(0.9, False)] * 4, "score double, label boolean")
    r = calibration_error(bad, score_col="score", label_col="label") \
        .collect()[0]
    assert (r["ece"], r["mce"]) == (0.9, 0.9)
    # hand-computed mixed case: bin .2 has rate 1.0 (gap .8), bin .8
    # has rate .5 (gap .3): ece = (2*.8 + 2*.3)/4 = .55, mce = .8
    mix = spark.createDataFrame(
        [(0.2, True), (0.2, True), (0.8, True), (0.8, False)],
        "score double, label boolean")
    r = calibration_error(mix, score_col="score", label_col="label") \
        .collect()[0]
    assert (r["ece"], r["mce"]) == (0.55, 0.8)
    with _pt.raises(errors.Invalid):
        calibration_error(df, score_col="score", label_col="label",
                          bin_dp=-1)


def test_spectral_residual_flags_spike(spark):
    import math

    import pytest as _pt

    from loudml_spark import errors
    from loudml_spark.operators.tsmath import (
        spectral_residual,
        spectral_residual_scores,
    )

    rows = [(t, 10.0 + math.sin(t / 4.0) + (25.0 if t == 40 else 0.0),
             "a") for t in range(64)]
    df = spark.createDataFrame(rows, "bucket_ts long, value double, k string")
    out = spectral_residual(df, by=["k"], threshold=3.0)
    flagged = [r["bucket_ts"] for r in out.filter("is_anomaly").collect()]
    assert flagged == [40]
    top = out.orderBy(F.desc("saliency")).first()
    assert top["bucket_ts"] == 40 and top["saliency"] > 10
    # constant series: near-flat saliency (DC bleed into eps-clamped
    # empty bins leaves ~1e-4 ripple), far below any flag threshold
    flat = spectral_residual_scores([5.0] * 16)
    assert all(abs(s) < 0.01 for s in flat)
    # determinism under repartition
    a = sorted(spectral_residual(df.repartition(7), by=["k"]).collect())
    b = sorted(spectral_residual(df, by=["k"]).collect())
    assert a == b
    with _pt.raises(errors.Invalid):
        spectral_residual_scores([1.0, 2.0, 3.0])
    with _pt.raises(errors.Invalid):
        spectral_residual_scores([1.0, float("nan"), 3.0, 4.0])
    with _pt.raises(errors.Invalid):
        spectral_residual(df, by=["k"], threshold=0.0)


def test_ks_two_sample_exact_decision(spark):
    import pytest as _pt

    from loudml_spark import errors
    from loudml_spark.operators.tsmath import ks_two_sample

    # identical discrete distributions: D = 0, no reject
    rows = [(float(i % 10), "a") for i in range(200)] + \
           [(float(i % 10), "b") for i in range(200)]
    df = spark.createDataFrame(rows, "v double, g string")
    r = ks_two_sample(df, value_col="v", group_col="g",
                      group_a="a", group_b="b").collect()[0]
    assert (r["n_a"], r["n_b"], r["d"], r["reject"]) == \
        (200, 200, 0.0, False)
    # shift by 3 over support {0..9}: D = exactly 0.3, reject at 5%
    # (critical value 1.3581*sqrt(400/40000) = 0.136)
    rows2 = [(float(i % 10), "a") for i in range(200)] + \
            [(float(i % 10) + 3.0, "b") for i in range(200)]
    df2 = spark.createDataFrame(rows2, "v double, g string")
    r = ks_two_sample(df2, value_col="v", group_col="g",
                      group_a="a", group_b="b").collect()[0]
    assert (r["d"], r["reject"]) == (0.3, True)
    # small-sample boundary: n=5 each, D=0.2 -> crit = 1.3581*sqrt(.4)
    # = 0.859 -> NOT rejected (exact integer compare, no sqrt)
    small = spark.createDataFrame(
        [(float(i), "a") for i in range(5)]
        + [(float(i) + 1.0, "b") for i in range(5)], "v double, g string")
    r = ks_two_sample(small, value_col="v", group_col="g",
                      group_a="a", group_b="b").collect()[0]
    assert (r["d"], r["reject"]) == (0.2, False)
    # missing group -> NULL verdict, not a crash
    r = ks_two_sample(df.filter("g = 'a'"), value_col="v",
                      group_col="g", group_a="a",
                      group_b="b").collect()[0]
    assert r["reject"] is None
    with _pt.raises(errors.Invalid):
        ks_two_sample(df, value_col="v", group_col="g",
                      group_a="a", group_b="b", alpha_c2_e8=0)


def test_page_hinkley_matches_recursion_and_alarms(spark):
    import numpy as np
    import pytest as _pt

    from loudml_spark import errors
    from loudml_spark.operators.tsmath import page_hinkley

    rng = np.random.default_rng(7)
    vals = list(50 + rng.normal(0, 2, 40)) + list(60 + rng.normal(0, 2, 20))
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "bucket_ts long, value double")
    out = page_hinkley(df, value_col="value", delta=0.5, lam=20.0) \
        .orderBy("bucket_ts").collect()
    # reference recursion: m_t = m_{t-1} + (x_t - mean_t - delta)
    m, mn, s, cnt = 0.0, 0.0, 0.0, 0
    for i, r in enumerate(out):
        s += vals[i]; cnt += 1
        m += vals[i] - s / cnt - 0.5
        mn = min(mn, m)
        assert r["ph"] == _pt.approx(m - mn, abs=1e-9), i
    # the level shift at t=40 must alarm shortly after, never before
    flagged = [r["bucket_ts"] for r in out if r["is_change"]]
    assert flagged and 40 <= min(flagged) <= 45
    # null rows pass through without contributing drift
    with_null = spark.createDataFrame(
        [(0, 10.0), (1, None), (2, 10.0)], "bucket_ts long, value double")
    got = page_hinkley(with_null, value_col="value",
                       delta=0.0, lam=5.0).orderBy("bucket_ts").collect()
    assert [r["ph"] for r in got] == [0.0, 0.0, 0.0]
    with _pt.raises(errors.Invalid):
        page_hinkley(df, value_col="value", delta=0.5, lam=0.0)
