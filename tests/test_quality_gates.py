"""End-to-end model quality gate, mirroring the reference's headline
test: F1 ≥ 0.75 detecting injected anomalies
(tests/test_donut.py:532-584, BASELINE.md row 1).

The reference trains its VAE on a sine-rate event stream (daily
period) and injects a flat-rate segment over the last 20 of 100 test
buckets.  Here the estimator is the seasonal-naive profile — the
pipeline under test (bucketize → fit → predict → score → detect) is
the same contract."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from loudml_spark.ml.detect import detect_anomalies
from loudml_spark.ml.models import SeasonalNaiveModel
from loudml_spark.operators.bucketize import bucketize

BASE_TS = 1704067200  # 2024-01-01, aligned
BUCKET = 1200         # 20 min
DAY = 86400


def _sine_events(rng, start, end, base=3.0, amplitude=3.0):
    """Events whose rate follows a daily sine — the reference's
    SinEventGenerator shape (tests/randevents.py:69-119)."""
    ts = []
    t = start
    while t < end:
        phase = 2 * math.pi * ((t - start) % DAY) / DAY
        rate = max(0.05, base + amplitude * math.sin(phase))  # events/min
        t += rng.exponential(60.0 / rate)
        if t < end:
            ts.append(t)
    return ts


def test_f1_gate_injected_anomaly(spark):
    rng = np.random.default_rng(42)
    train_end = BASE_TS + 21 * DAY
    test_end = train_end + 100 * BUCKET
    anomaly_start = train_end + 80 * BUCKET

    events = _sine_events(rng, BASE_TS, anomaly_start)
    # injected anomaly: flat high rate over the last 20 buckets
    t = anomaly_start
    while t < test_end:
        t += rng.exponential(60.0 / 12.0)
        if t < test_end:
            events.append(t)

    df = spark.createDataFrame([(e, 1.0) for e in events],
                               "ts double, one double")
    series = bucketize(
        df, [{"metric": "count", "field": "one", "name": "value"}],
        BASE_TS, test_end, BUCKET, ts_col="ts",
    )
    train = series.filter(F.col("bucket_ts") < train_end)
    test = series.filter(F.col("bucket_ts") >= train_end)

    model = SeasonalNaiveModel("f1gate", bucket_interval=BUCKET).fit(train)
    scored = model.predict(test)
    detected = detect_anomalies(
        scored, min_threshold=68.0, max_threshold=99.7
    ).collect()
    assert len(detected) == 100

    tp = fp = fn = 0
    for r in detected:
        truth = r["bucket_ts"] >= anomaly_start
        flagged = bool(r["is_anomaly"])
        if truth and flagged:
            tp += 1
        elif not truth and flagged:
            fp += 1
        elif truth and not flagged:
            fn += 1
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    f1 = 2 * precision * recall / max(1e-9, precision + recall)
    # the reference's gate (tests/test_donut.py:582-583)
    assert f1 >= 0.75, (tp, fp, fn, f1)


def test_annotation_roundtrip_masks_training(spark, tmp_path):
    from loudml_spark.ml.windows import mask_abnormal
    from loudml_spark.sources.annotations import AnnotationStore

    store = AnnotationStore(spark, str(tmp_path / "ann"))
    a1 = store.insert(100.0, 200.0, model="m1")
    store.insert(500.0, 600.0, model="m2")
    store.update(a1, 150.0, 250.0, model="m1")

    wins = store.list_anomalies(0, 1000, model="m1")
    assert wins == [[150.0, 250.0]]

    # the worker.py:87-91 path: windows become training masks
    df = spark.createDataFrame([(i,) for i in range(0, 400, 100)],
                               "bucket_ts long")
    masked = {r["bucket_ts"]: r["abnormal"]
              for r in mask_abnormal(df, wins).collect()}
    assert masked == {0: False, 100: False, 200: True, 300: False}

    store.delete(a1)
    assert store.list_anomalies(0, 1000, model="m1") == []


def test_hooks_fire_on_episodes(spark, tmp_path):
    from loudml_spark.ml.detect import anomaly_windows
    from loudml_spark.ml.hooks import AnnotationHook, Hook, fire_hooks
    from loudml_spark.sources.annotations import AnnotationStore

    base = 1704067200
    scored = spark.createDataFrame(
        [(base, 0.0, 5.0, 5.0), (base + 60, 99.9, 9.0, 5.0),
         (base + 120, 10.0, 5.0, 5.0), (base + 180, 99.8, 1.0, 5.0)],
        "bucket_ts long, score double, observed double, predicted double",
    )
    det = detect_anomalies(scored)
    eps = anomaly_windows(det)

    calls = []

    class Recorder(Hook):
        def on_anomaly_start(self, model, start_ts, score, **kw):
            calls.append(("start", start_ts, score))

        def on_anomaly_end(self, model, end_ts, score, **kw):
            calls.append(("end", end_ts, score))

    class Exploder(Hook):
        def on_anomaly_start(self, *a, **k):
            raise RuntimeError("boom")

    store = AnnotationStore(spark, str(tmp_path / "hooks_ann"))
    n = fire_hooks(
        eps,
        [Recorder("rec"), Exploder("bad"), AnnotationHook("ann", store)],
        model="m1",
        series_end_ts=base + 180,
    )
    assert n == 2
    starts = sorted(c[1] for c in calls if c[0] == "start")
    assert starts == [base + 60, base + 180]
    # second episode still open at series end → no end fired for it
    ends = [c for c in calls if c[0] == "end"]
    assert len(ends) == 1
    # the annotation round-trip wrote the closed episode (window end =
    # last bucket the episode was open, i.e. the anomalous region)
    assert store.list_anomalies(0, base + 10**6) == [
        [float(base + 60), float(base + 60)]]
