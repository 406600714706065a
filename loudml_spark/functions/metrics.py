"""Aggregation metric registry.

The union of every metric name accepted by the reference's seven
backends (SURVEY §2.4; alias normalization mirrors
/root/reference/loudml/influx.py:39-59 and the per-backend alias maps).
Each metric compiles to a single JVM-side aggregate Column so a
multi-feature query stays one whole-stage-codegen'd groupBy pass.

Tag filters (``match_all``) are folded into the aggregate as
conditional aggregation — ``avg(CASE WHEN tag=... THEN field END)`` —
instead of per-feature scans; this is strictly better than the
reference, which issues one store query per feature
(loudml/influx.py:558-561).

``derivative`` and ``integral`` are *post-aggregation* metrics: the
per-bucket base aggregate is computed in the groupBy pass, then a
window expression over the bucket spine finishes the job (SURVEY §2.4
maps them to lag arithmetic).  Standard deviation / variance are
**population** flavored, matching ES ``extended_stats`` and PromQL
``stddev`` (loudml/elastic.py:447-450, prometheus.py:59-60).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

# name → canonical name (loudml/influx.py:39-59 and friends)
_ALIASES = {
    "mean": "avg",
    "average": "avg",
    "std_dev": "std_deviation",
    "stddev": "std_deviation",
    "med": "median",
    "deriv": "derivative",
}

_PERCENTILE_RE = re.compile(r"^(\d{1,2}(?:\.\d+)?)percentile$")


@dataclass(frozen=True)
class MetricSpec:
    """How one metric is computed.

    agg:       Column -> Column aggregate for the groupBy pass
    post:      optional (Column, interval_s, ordered_window) -> Column
               applied after the spine join (window over bucket_ts)
    fill_zero: empty buckets yield 0 instead of null (count semantics,
               loudml/opentsdb.py:452-454, golden
               tests/test_influx.py:279)
    """

    agg: Callable[[Column], Column]
    post: Optional[Callable] = None
    fill_zero: bool = False


def _spread(col: Column) -> Column:
    return F.max(col) - F.min(col)


def _sum_of_squares(col: Column) -> Column:
    return F.sum(col * col)


def _derivative_post(col: Column, interval: float, w) -> Column:
    # discrete derivative of the per-bucket mean over consecutive buckets
    return (col - F.lag(col).over(w)) / F.lit(float(interval))


def _integral_post(col: Column, interval: float, w) -> Column:
    # rectangle rule: mean value × bucket width (seconds)
    return col * F.lit(float(interval))


def _mean_exact(col: Column) -> Column:
    # cross-engine-deterministic mean for fixed-point data: the sum
    # rides DECIMAL (exact, association-independent — double sums
    # depend on partition order), then ONE IEEE division.  Equals
    # DuckDB's CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)/COUNT(x)
    # bit-for-bit; plain avg(double) can straddle a ROUND boundary
    # between engines at large row counts.
    return (
        F.sum(col.cast("decimal(18,2)")).cast("double") / F.count(col)
    )


def _mode_agg(col: Column) -> Column:
    # deterministic mode: lowest value among the most frequent
    # (Spark >= 3.4 `mode`; deterministic flag picks the lowest)
    return F.call_function("mode", col, F.lit(True))


METRICS: dict[str, MetricSpec] = {
    "avg": MetricSpec(F.avg),
    "mean_exact": MetricSpec(_mean_exact),
    "count": MetricSpec(F.count, fill_zero=True),
    "sum": MetricSpec(F.sum),
    "min": MetricSpec(F.min),
    "max": MetricSpec(F.max),
    "std_deviation": MetricSpec(F.stddev_pop),
    "variance": MetricSpec(F.var_pop),
    "sum_of_squares": MetricSpec(_sum_of_squares),
    "median": MetricSpec(F.median),
    "mode": MetricSpec(_mode_agg),
    "spread": MetricSpec(_spread),
    "derivative": MetricSpec(F.avg, post=_derivative_post),
    "integral": MetricSpec(F.avg, post=_integral_post),
    # PromQL topk/bottomk are used with k=1 in the reference
    # (loudml/prometheus.py:65-66) — per-bucket extremes.
    "topk": MetricSpec(F.max),
    "bottomk": MetricSpec(F.min),
}


def normalize_metric(name: str) -> str:
    return _ALIASES.get(name, name)


def is_supported_metric(name: str) -> bool:
    name = normalize_metric(name)
    return name in METRICS or bool(_PERCENTILE_RE.match(name))


def get_metric_spec(name: str) -> MetricSpec:
    """Resolve a metric name to its spec; raises UnsupportedMetric."""
    from loudml_spark import errors

    name = normalize_metric(name)
    spec = METRICS.get(name)
    if spec is not None:
        return spec
    m = _PERCENTILE_RE.match(name)
    if m:
        p = float(m.group(1)) / 100.0
        # exact percentile with linear interpolation (matches InfluxQL
        # PERCENTILE / PromQL quantile closely; DuckDB quantile_cont
        # for the oracle)
        return MetricSpec(lambda col, _p=p: F.percentile(col, F.lit(_p)))
    raise errors.UnsupportedMetric(name)
