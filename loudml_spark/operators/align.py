"""Multi-measurement feature alignment.

The reference computes each feature with an independent store query
and merges the result streams positionally by bucket index
(loudml/influx.py:563-614, mongo.py:228-256).  Here features that
share a source DataFrame are computed in ONE groupBy pass
(operators.bucketize folds tag filters into conditional aggregates);
only features living in *different* measurements need a join — a
full-outer equi-join on the bucket timestamp, which is between two
already-aggregated (≤ n_buckets rows) frames and therefore cheap at
any source scale.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping

from pyspark.sql import DataFrame

from loudml_spark import errors
from loudml_spark.features import parse_features
from loudml_spark.operators.bucketize import BUCKET_COL, bucketize


def align_features(
    sources: Mapping[str, DataFrame],
    features,
    from_date,
    to_date,
    bucket_interval,
    *,
    ts_col: str = "ts",
    ts_unit: str = "s",
    default_measurement: str | None = None,
    now: float | None = None,
) -> DataFrame:
    """Bucketize features across several measurements and align them on
    ``bucket_ts``.

    ``sources`` maps measurement name → DataFrame.  Features without a
    ``measurement`` use ``default_measurement`` (or the only source).
    """
    features = parse_features(features)
    if default_measurement is None and len(sources) == 1:
        default_measurement = next(iter(sources))

    by_measurement: dict[str, list] = {}
    for feat in features:
        m = feat.measurement or default_measurement
        if m is None or m not in sources:
            raise errors.Invalid(f"unknown measurement for feature {feat.name}: {m}")
        by_measurement.setdefault(m, []).append(feat)

    frames = [
        bucketize(
            sources[m], feats, from_date, to_date, bucket_interval,
            ts_col=ts_col, ts_unit=ts_unit, now=now,
        )
        for m, feats in by_measurement.items()
    ]
    # every frame shares the identical spine, so the outer join never
    # drops or invents buckets; join keys are aggregated (small) frames
    return reduce(lambda a, b: a.join(b, on=BUCKET_COL, how="full"), frames)
