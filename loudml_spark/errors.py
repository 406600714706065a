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
