"""Engine error types (mirrors the error surface of the reference:
/root/reference/loudml/errors.py — UnsupportedMetric, Invalid, etc.)."""


class LoudMLSparkError(Exception):
    """Base class for engine errors."""


class Invalid(LoudMLSparkError):
    """Invalid user input (spec, time range, expression)."""


class UnsupportedMetric(Invalid):
    """Unknown aggregation metric name.

    Reference raises the same for unknown metrics
    (loudml/errors.py:106-115, loudml/membucket.py:234-236).
    """

    def __init__(self, metric):
        self.metric = metric
        super().__init__(f"unsupported metric: {metric}")


class BucketNotFound(LoudMLSparkError):
    """Unknown bucket (data source) name."""


class ModelNotFound(LoudMLSparkError):
    """Unknown model name."""


class ModelNotTrained(LoudMLSparkError):
    """Prediction requested before training."""


class NoData(LoudMLSparkError):
    """No data found in the requested time range
    (loudml/errors.py NoData parity)."""


class ForecastConstraintViolation(LoudMLSparkError):
    """A forecast crossed a user-declared bound
    (``constraint=feature:low:3.0``, server.py:1693-1696).

    The reference's worker calls ``model.test_constraint`` which its
    OSS tree never defines (worker.py:312) — these are the documented
    semantics: flag the first forecast bucket whose predicted value
    crosses the threshold in the constrained direction.
    """

    def __init__(self, feature, _type, threshold, timestamp, value):
        self.feature = feature
        self.type = _type
        self.threshold = threshold
        self.timestamp = timestamp
        self.value = value
        super().__init__(
            f"forecast constraint violated: {feature} {_type} "
            f"{threshold} crossed at ts={timestamp} (value={value})"
        )
