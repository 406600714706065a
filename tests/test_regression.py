"""Window-regression (learned AR) model tests."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from loudml_spark import errors
from loudml_spark.ml.models import make_model
from loudml_spark.ml.regression import (
    WindowRegressionModel,
    fit_many,
    predict_many,
)

BASE = 1704067200


def _sine_series(spark, n=400, key=None, phase=0.0, period=24):
    rows = []
    for i in range(n):
        v = 10.0 + 5.0 * math.sin(2 * math.pi * (i + phase) / period)
        if key is None:
            rows.append((BASE + i * 3600, v))
        else:
            rows.append((key, BASE + i * 3600, v))
    schema = ("bucket_ts long, value double" if key is None
              else "series string, bucket_ts long, value double")
    return spark.createDataFrame(rows, schema)


def test_fit_predict_sine(spark):
    df = _sine_series(spark)
    m = WindowRegressionModel("ar", span=24, bucket_interval=3600).fit(df)
    pred = m.predict(df).filter(F.col("predicted").isNotNull())
    err = pred.agg(
        F.max(F.abs(F.col("predicted") - F.col("observed"))).alias("e")
    ).collect()[0]["e"]
    # a linear AR(24) reproduces a pure sinusoid almost exactly
    assert err < 0.2
    # and nothing on clean data should look anomalous
    assert pred.filter(F.col("score") >= 99.7).count() == 0


def test_predict_flags_injected_spike(spark):
    df = _sine_series(spark)
    spike_ts = BASE + 390 * 3600
    df = df.withColumn(
        "value",
        F.when(F.col("bucket_ts") == spike_ts, 40.0).otherwise(F.col("value")),
    )
    train = df.filter(F.col("bucket_ts") < BASE + 300 * 3600)
    m = WindowRegressionModel("ar", span=24, bucket_interval=3600).fit(train)
    scored = m.predict(df.filter(F.col("bucket_ts") >= BASE + 300 * 3600))
    flagged = scored.filter(F.col("score") >= 99.7).collect()
    assert any(r["bucket_ts"] == spike_ts for r in flagged)


def test_forecast_rollforward(spark):
    df = _sine_series(spark)
    m = WindowRegressionModel("ar", span=24, bucket_interval=3600).fit(df)
    history = [r["value"] for r in df.orderBy("bucket_ts").collect()][-24:]
    fc = m.forecast(
        spark, BASE + 400 * 3600, BASE + 424 * 3600, history=history
    ).orderBy("bucket_ts").collect()
    assert len(fc) == 24
    expect = [10.0 + 5.0 * math.sin(2 * math.pi * (400 + i) / 24)
              for i in range(24)]
    got = [r["predicted"] for r in fc]
    assert np.max(np.abs(np.array(got) - np.array(expect))) < 1.0
    with pytest.raises(errors.Invalid):
        m.forecast(spark, 0, 3600, history=[1.0])


def test_storage_roundtrip(spark, tmp_path):
    from loudml_spark.ml.models import ModelStorage

    df = _sine_series(spark, n=100)
    m = WindowRegressionModel("wr", span=12, bucket_interval=3600).fit(df)
    st = ModelStorage(str(tmp_path))
    st.save(m)
    loaded = st.load("wr")
    assert isinstance(loaded, WindowRegressionModel)
    assert loaded.span == 12
    assert loaded.state["weights"] == m.state["weights"]


def test_fleet_fit_predict(spark):
    a = _sine_series(spark, key="a", phase=0.0)
    b = _sine_series(spark, key="b", phase=6.0, period=12)
    series = a.union(b)
    models = fit_many(series, ["series"], span=24)
    got = {r["series"]: r for r in models.collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["weights"] != got["b"]["weights"]

    scored = predict_many(series, models, ["series"], span=24)
    err = (
        scored.filter(F.col("predicted").isNotNull())
        .groupBy("series")
        .agg(F.max(F.abs(F.col("predicted") - F.col("value"))).alias("e"))
        .collect()
    )
    for r in err:
        assert r["e"] < 0.5, r


def test_gap_imputation_gate(spark):
    """FIXTURES §5 / reference gap gate (tests/test_donut.py:451-530):
    hourly series ≈ 1.0 with hour-12 missing daily; imputed values must
    be ≈ 1.0 ± 0.22."""
    rng = np.random.default_rng(7)
    rows = []
    for day in range(14):
        for hod in range(24):
            if hod == 12:
                continue
            ts = BASE + (day * 24 + hod) * 3600
            rows.append((ts, float(1.0 + rng.normal(0, 0.05))))
    events = spark.createDataFrame(rows, "ts long, one double")
    from loudml_spark.operators.bucketize import bucketize

    series = bucketize(
        events, [{"metric": "avg", "field": "one", "name": "value"}],
        BASE, BASE + 14 * 86400, 3600, ts_col="ts",
    )
    m = WindowRegressionModel("gap", span=24, bucket_interval=3600).fit(series)
    out = m.impute(series)
    imputed = out.filter(F.col("imputed")).collect()
    assert len(imputed) == 14  # one gap per day
    for r in imputed:
        assert abs(r["value"] - 1.0) <= 0.22, r


def test_auto_span_gate(spark):
    """Reference gate: span='auto' lands in [10, 20] on periodic data
    (tests/test_donut.py:342-355).  Period-12 sine → best span must
    capture one full period without overfitting longer lags."""
    from loudml_spark.ml.regression import auto_span

    rng = np.random.default_rng(5)
    rows = [
        (BASE + i * 3600,
         10.0 + 5.0 * math.sin(2 * math.pi * i / 12)
         + float(rng.normal(0, 0.3)))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "bucket_ts long, value double")
    best = auto_span(df, candidates=(5, 10, 12, 20, 24, 50, 100))
    assert 10 <= best <= 20, best


def test_ar_predict_values_mirrors_predict_many(spark):
    """The numpy mirror (used by the DuckDB oracle generator) must be
    BIT-identical to the distributed predict_many path — same window
    assembly (ffill, null-dropping collect_list), same float op
    order.  Includes nulls to exercise the fill/window edge cases."""
    from loudml_spark.ml.regression import (
        _fit_arrays,
        ar_predict_values,
        fit_many,
        predict_many,
    )

    rng = np.random.default_rng(11)
    span = 6
    vals = [
        None if i in (3, 17, 40) else
        10.0 + 3.0 * math.sin(2 * math.pi * i / 8) + float(rng.normal(0, .2))
        for i in range(60)
    ]
    rows = [("k", BASE + i * 3600, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, bucket_ts long, value double")
    models = fit_many(df, ["k"], span=span)
    got = {
        r["bucket_ts"]: r["predicted"]
        for r in predict_many(df, models, ["k"], span=span).collect()
    }
    arr = np.array([np.nan if v is None else v for v in vals])
    w, mu, sd, _ = _fit_arrays(arr, span, 1.0)
    mirror = ar_predict_values(arr, w, mu, sd, span)
    for i in range(60):
        ts = BASE + i * 3600
        a, b = got[ts], mirror[i]
        if a is None or (isinstance(a, float) and math.isnan(a)):
            assert math.isnan(b), i
        else:
            assert a == b, (i, a, b)  # bit-exact, not approx
