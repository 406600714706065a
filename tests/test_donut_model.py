"""DonutModel (numpy VAE) end-to-end through the model contract."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from loudml_spark.ml.detect import detect_anomalies
from loudml_spark.ml.models import DonutModel, ModelStorage, make_model

BASE = 1704067200


def _sine_series(spark, n=500, noise=0.05, seed=11):
    rng = np.random.default_rng(seed)
    rows = [
        (BASE + i * 3600,
         10.0 + 5.0 * math.sin(2 * math.pi * i / 24)
         + float(rng.normal(0, noise)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "bucket_ts long, value double")


@pytest.fixture(scope="module")
def trained(spark):
    df = _sine_series(spark)
    m = DonutModel("dn", span=24, latent_dim=3, intermediate_dim=34,
                   epochs=50, bucket_interval=3600).fit(df)
    return m, df


def test_predict_vs_observe_gate(spark, trained):
    # BASELINE.md: predict-vs-observe delta <= 2.0 per bucket on sine
    m, df = trained
    scored = m.predict(df).filter(F.col("predicted").isNotNull())
    errs = scored.select(
        F.abs(F.col("predicted") - F.col("observed")).alias("e")
    ).collect()
    es = sorted(r["e"] for r in errs)
    assert es[int(0.99 * len(es))] <= 2.0
    # clean data: no bucket breaches the 3-sigma threshold
    n_anom = scored.filter(F.col("score") >= 99.7).count()
    assert n_anom <= max(2, int(0.01 * len(es)))


def test_detects_injected_anomaly(spark, trained):
    m, df = trained
    spike_ts = BASE + 450 * 3600
    test = df.filter(F.col("bucket_ts") >= BASE + 400 * 3600).withColumn(
        "value",
        F.when(F.col("bucket_ts") == spike_ts, 35.0)
        .otherwise(F.col("value")),
    )
    scored = m.predict(test).withColumn("score", F.round("score", 4))
    det = detect_anomalies(scored).collect()
    flagged = {r["bucket_ts"] for r in det if r["is_anomaly"]}
    assert spike_ts in flagged


def test_storage_roundtrip_and_determinism(spark, trained, tmp_path):
    m, df = trained
    st = ModelStorage(str(tmp_path))
    st.save(m)
    loaded = st.load("dn")
    assert isinstance(loaded, DonutModel)
    a = m.predict(df).orderBy("bucket_ts").select("predicted").collect()
    b = loaded.predict(df).orderBy("bucket_ts").select("predicted").collect()
    assert a == b
