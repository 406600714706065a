"""Feature spec — the engine's query IR.

A *feature* is one named aggregation ``metric(field)`` computed inside
each time bucket, optionally restricted by ``match_all`` tag-equality
conditions, with a missing-value policy and an optional post-transform.
This mirrors the reference's Feature schema
(/root/reference/loudml/model.py:72-146) and the REST feature
expression syntax ``metric(measurement.field)``
(/root/reference/loudml/misc.py:333-342, server.py:1181-1207).

In Spark terms a feature compiles to one aggregate expression (plus an
optional filter folded into it as a conditional aggregate) — see
loudml_spark.operators.bucketize.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from loudml_spark import errors
from loudml_spark.functions.metrics import is_supported_metric, normalize_metric

VALID_TRANSFORMS = (None, "diff")
VALID_SCORES = (None, "min_max", "normalize", "standardize")
VALID_ANOMALY_TYPES = ("low", "high", "low_high")


@dataclass
class Feature:
    """One aggregated series.

    Attributes
    ----------
    metric:       aggregation name (see functions.metrics for registry)
    field:        input column (dotted paths allowed for nested structs)
    name:         output column name; defaults to ``<metric>_<field>``
    measurement:  source table/measurement the field lives in (optional;
                  used when one query spans several sources)
    match_all:    list of ``{"tag": ..., "value": ...}`` equality
                  conditions ANDed together
    default:      missing-bucket fill — a float, ``"previous"``
                  (forward fill) or None (keep null/NaN)
    transform:    optional post-op; ``"diff"`` = first difference
    scores:       optional scaling declaration (min_max/normalize/
                  standardize), applied by the model layer
    anomaly_type: direction of interest for anomaly scoring
    """

    metric: str
    field: str
    name: str | None = None
    measurement: str | None = None
    match_all: list[dict[str, Any]] = dc_field(default_factory=list)
    default: Any = None
    transform: str | None = None
    scores: str | None = None
    anomaly_type: str = "low_high"
    io: str = "io"  # "i" = input-only, "o" = output-only, "io" = both
    # scripted field: SQL expression instead of a plain column — the
    # reference's ES painless `script` (loudml/elastic.py:452-459,
    # schema loudml/model.py:93); compiled via F.expr
    script: str | None = None

    def __post_init__(self):
        self.metric = normalize_metric(self.metric)
        if not is_supported_metric(self.metric):
            raise errors.UnsupportedMetric(self.metric)
        if not self.field:
            raise errors.Invalid("feature requires a field")
        if self.name is None:
            self.name = f"{self.metric}_{self.field.replace('.', '_')}"
        if self.transform not in VALID_TRANSFORMS:
            raise errors.Invalid(f"invalid transform: {self.transform}")
        if self.scores not in VALID_SCORES:
            raise errors.Invalid(f"invalid scores mode: {self.scores}")
        if self.anomaly_type not in VALID_ANOMALY_TYPES:
            raise errors.Invalid(f"invalid anomaly_type: {self.anomaly_type}")
        if self.default is not None and self.default != "previous":
            try:
                self.default = float(self.default)
            except (TypeError, ValueError):
                raise errors.Invalid(f"invalid default: {self.default!r}")
        for cond in self.match_all:
            if "tag" not in cond or "value" not in cond:
                raise errors.Invalid(f"invalid match_all condition: {cond!r}")

    @classmethod
    def from_dict(cls, d: dict) -> "Feature":
        known = {
            "metric", "field", "name", "measurement", "match_all",
            "default", "transform", "scores", "anomaly_type", "io",
            "script",
        }
        unknown = set(d) - known
        if unknown:
            raise errors.Invalid(f"unknown feature keys: {sorted(unknown)}")
        return cls(**d)

    def filter_key(self) -> tuple:
        """Hashable identity of (measurement, match_all) — features that
        share it can be computed in the same groupBy pass."""
        conds = tuple(sorted((c["tag"], repr(c["value"])) for c in self.match_all))
        return (self.measurement, conds)


def parse_expression(expr: str) -> Feature:
    """Parse ``metric(measurement.field)`` / ``metric(field)`` into a
    Feature — the REST `_read` features= syntax
    (/root/reference/loudml/misc.py:333-342).
    """
    expr = expr.strip()
    lparen = expr.find("(")
    if lparen <= 0 or not expr.endswith(")"):
        raise errors.Invalid(f"invalid feature expression: {expr!r}")
    metric = expr[:lparen].strip()
    inner = expr[lparen + 1:-1].strip()
    if not inner:
        raise errors.Invalid(f"invalid feature expression: {expr!r}")
    if "." in inner:
        measurement, feature_field = inner.split(".", 1)
    else:
        measurement, feature_field = None, inner
    return Feature(metric=metric, field=feature_field, measurement=measurement)


def parse_features(exprs) -> list[Feature]:
    """Parse a ``;``-separated string or list of expressions/dicts."""
    if isinstance(exprs, str):
        exprs = [e for e in exprs.split(";") if e.strip()]
    out = []
    for e in exprs:
        if isinstance(e, Feature):
            out.append(e)
        elif isinstance(e, dict):
            out.append(Feature.from_dict(e))
        else:
            out.append(parse_expression(e))
    return out
