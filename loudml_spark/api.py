"""User-facing API parity with the reference's REST surface.

Maps the reference endpoints (SURVEY §2.11) onto engine calls:

* ``POST /buckets/<n>/_read?from&to&bucket_interval&features=`` →
  :func:`read_bucket` — parses ``avg(m.field);count(g)`` expressions
  (loudml/misc.py:333-342) and returns the worker's response shape
  ``{timestamps: [...], observed: {feature: [...]}}``
  (loudml/worker.py:150-163);
* ``POST /buckets/<n>/_write`` → :func:`write_bucket`;
* ``POST /buckets/<n>/_clear`` → Bucket.drop equivalents;
* ``_eval`` / ``_forecast`` result shaping → :func:`format_series` /
  :func:`format_buckets` (loudml/donut.py:331-412) including the
  ``lower_<f>`` / ``upper_<f>`` / ``@<f>`` column names of the
  prediction write-back schema (loudml/bucket.py:232-253).

Jobs: the reference queues work in process pools with polled job
state (server.py:263-393).  Spark actions are already async-capable
(FAIR scheduler pools); a job registry here would wrap
``InheritableThread`` — deliberately out of engine scope.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from loudml_spark.features import parse_features
from loudml_spark.operators.bucketize import BUCKET_COL, bucketize


def read_bucket(
    df: DataFrame,
    from_date,
    to_date,
    bucket_interval,
    features,
    *,
    ts_col: str = "ts",
    ts_unit: str = "s",
    now: float | None = None,
) -> dict:
    """The `_read` endpoint: bucketized features over one source,
    reshaped to the reference's response format."""
    feats = parse_features(features)
    out = bucketize(
        df, feats, from_date, to_date, bucket_interval,
        ts_col=ts_col, ts_unit=ts_unit, now=now,
    )
    rows = out.orderBy(BUCKET_COL).collect()
    return {
        "timestamps": [r[BUCKET_COL] for r in rows],
        "observed": {
            f.name: [_nan_to_none(r[f.name]) for r in rows] for f in feats
        },
    }


def write_bucket(bucket, df: DataFrame, mode: str = "append") -> None:
    """The `_write` endpoint: bulk point insert (df.write batches —
    no 1000-point buffer needed, loudml/bucket.py:110-146)."""
    bucket.write(df, mode=mode)


def _nan_to_none(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def prediction_frame(scored: DataFrame, feature: str,
                     model_name: str) -> DataFrame:
    """Write-back schema for a prediction result
    (loudml/donut.py:293-319, bucket.py:232-253): bucket left edge,
    predicted under the feature name, observed under ``@<feature>``,
    band as ``lower_/upper_<feature>``, score + is_anomaly tag."""
    cols = [
        F.col(BUCKET_COL).alias("timestamp"),
        F.col("predicted").alias(feature),
        F.col("lower").alias(f"lower_{feature}"),
        F.col("upper").alias(f"upper_{feature}"),
        F.col("observed").alias(f"@{feature}"),
        F.col("score"),
        F.lit(model_name).alias("model"),
    ]
    if "is_anomaly" in scored.columns:
        cols.append(F.col("is_anomaly"))
    return scored.select(*cols)


def format_series(rows, feature_names) -> dict:
    """Struct-of-arrays output (loudml/donut.py:331-369)."""
    out = {
        "timestamps": [r["bucket_ts"] for r in rows],
        "observed": {},
        "predicted": {},
    }
    for f in feature_names:
        out["observed"][f] = [_nan_to_none(r["observed"]) for r in rows]
        out["predicted"][f] = [_nan_to_none(r["predicted"]) for r in rows]
    if rows and "lower" in rows[0].__fields__:
        for f in feature_names:
            out["predicted"][f"lower_{f}"] = [
                _nan_to_none(r["lower"]) for r in rows]
            out["predicted"][f"upper_{f}"] = [
                _nan_to_none(r["upper"]) for r in rows]
    return out


def format_buckets(rows, feature_names) -> list[dict]:
    """Array-of-structs output (loudml/donut.py:371-412)."""
    out = []
    for r in rows:
        entry = {
            "timestamp": r["bucket_ts"],
            "observed": {f: _nan_to_none(r["observed"])
                         for f in feature_names},
            "predicted": {f: _nan_to_none(r["predicted"])
                          for f in feature_names},
        }
        if "score" in r.__fields__:
            entry["stats"] = {
                "score": _nan_to_none(r["score"]),
                "anomaly": bool(r["is_anomaly"])
                if "is_anomaly" in r.__fields__ else False,
            }
        out.append(entry)
    return out


def parse_constraint(constraint: str) -> dict:
    """``feature:low:3.0`` → {feature, type, threshold}
    (loudml/misc.py:311-330 parity, including its error messages)."""
    from loudml_spark import errors

    try:
        feature, _type, threshold = constraint.split(":")
    except ValueError:
        raise errors.Invalid("invalid format for 'constraint' parameter")
    if _type not in ("low", "high"):
        raise errors.Invalid(
            "invalid threshold type for 'constraint' parameter")
    try:
        threshold = float(threshold)
    except ValueError:
        raise errors.Invalid("invalid threshold for 'constraint' parameter")
    return {"feature": feature, "type": _type, "threshold": threshold}


def test_constraint(
    forecast_df: DataFrame,
    feature: str,
    _type: str,
    threshold: float,
    *,
    ts_col: str = "bucket_ts",
) -> None:
    """Raise ForecastConstraintViolation at the first forecast bucket
    whose predicted value crosses the bound (worker.py:311-317 calls
    this on the model; the reference OSS never ships the body — these
    are the documented semantics: 'low' alerts when the forecast drops
    below the threshold, 'high' when it exceeds it)."""
    from loudml_spark import errors

    cond = (
        F.col("predicted") < F.lit(threshold)
        if _type == "low"
        else F.col("predicted") > F.lit(threshold)
    )
    row = (
        forecast_df.filter(cond)
        .orderBy(ts_col)
        .select(ts_col, "predicted")
        .first()
    )
    if row is not None:
        raise errors.ForecastConstraintViolation(
            feature, _type, threshold, row[ts_col], row["predicted"]
        )


def forecast_model(
    model,
    spark: SparkSession,
    from_date,
    to_date,
    *,
    percent_interval: float | None = None,
    percent_noise: float = 0.0,
    constraint: str | dict | None = None,
    history: list | None = None,
) -> DataFrame:
    """The `_forecast` endpoint: future buckets from a trained model.

    Profile-based models forecast vectorized (spine × broadcast
    profile); roll-forward estimators (Donut VAE, AR) iterate on the
    driver (loudml/donut.py:1333-1475) — the series length is bounded
    by horizon/interval, never data volume.

    ``percent_interval`` controls the confidence band: models with
    native support (DonutModel) receive it directly; for fixed ±3σ
    models the band is rescaled by Φ⁻¹(1−(1−pi)/2)/3 — exactly the
    reference's norm().ppf scaling (donut.py:1418).  ``constraint``
    (``feature:low:3.0``) raises ForecastConstraintViolation at the
    first crossing bucket (server.py:1693-1696).
    """
    import inspect

    from loudml_spark import errors, timeutil
    from loudml_spark.ml.models import BAND_SIGMA
    from loudml_spark.ml.scoring import band_sigma_for

    from_ts, to_ts = timeutil.align_range(
        from_date, to_date, model.bucket_interval
    )
    params = inspect.signature(model.forecast).parameters
    kwargs = {}
    if "percent_interval" in params and percent_interval is not None:
        kwargs["percent_interval"] = percent_interval
    if "percent_noise" in params and percent_noise:
        kwargs["percent_noise"] = percent_noise
    if "history" in params and history is not None:
        kwargs["history"] = history
    out = model.forecast(spark, from_ts, to_ts, **kwargs)
    if percent_interval is not None and "percent_interval" not in kwargs:
        # model emitted a fixed ±BAND_SIGMA·σ band — rescale half-width
        scale = band_sigma_for(percent_interval) / BAND_SIGMA
        pred = F.col("predicted")
        out = out.withColumn(
            "lower", pred - (pred - F.col("lower")) * F.lit(scale)
        ).withColumn(
            "upper", pred + (F.col("upper") - pred) * F.lit(scale)
        )
    if constraint:
        c = (parse_constraint(constraint)
             if isinstance(constraint, str) else dict(constraint))
        if c["feature"] != model.feature_col:
            raise errors.Invalid(
                f"unknown constraint feature: {c['feature']!r} "
                f"(model feature is {model.feature_col!r})"
            )
        test_constraint(
            out, c["feature"], c["type"], c["threshold"],
            ts_col=model.ts_col,
        )
    return out


class Engine:
    """Convenience façade: named buckets + named models + the
    read/predict/forecast entry points (the reference's server state:
    config buckets + filestorage models)."""

    def __init__(self, spark: SparkSession, storage=None):
        from loudml_spark.sources.base import BucketRegistry

        self.spark = spark
        self.buckets = BucketRegistry()
        self.storage = storage

    def add_bucket(self, settings: Mapping[str, Any]):
        return self.buckets.add(dict(settings))

    def read(self, bucket_name: str, from_date, to_date, bucket_interval,
             features, **kw) -> dict:
        bucket = self.buckets.get(bucket_name)
        return read_bucket(
            bucket.read(self.spark), from_date, to_date, bucket_interval,
            features, **kw,
        )
