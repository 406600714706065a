"""Zero-cost in-flight data-quality metrics via Spark's Observation
API.

A pipeline that writes a cleaned corpus wants row counts, null rates
and bounds violations for the batch it just wrote — but a separate
``df.agg(...)`` action re-executes the whole plan.  ``observe()``
attaches accumulator-backed aggregates to the SAME action: the write
(or any other sink) runs once and the metrics fall out for free.
The streaming analogue surfaces through each progress event's
``observedMetrics`` — no second pass in either mode.

This is the audit layer the reference's write path lacks entirely
(loudml/bucket.py:110-146 buffers blindly); profile() is the deep
offline audit, observe_quality() the per-batch canary.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from loudml_spark import errors


def quality_metrics(
    cols: Sequence[str],
    *,
    bounds: dict | None = None,
):
    """Build the metric expressions: total rows, per-column null
    counts, and per-column out-of-bounds counts for ``bounds``
    entries ``{col: (lo, hi)}`` (inclusive range; violations are
    non-null values outside it)."""
    cols = list(cols)
    if not cols:
        raise errors.Invalid("need at least one column")
    bounds = bounds or {}
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        exprs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"))
    for c, (lo, hi) in bounds.items():
        bad = (F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))
        exprs.append(
            F.sum(F.coalesce(bad, F.lit(False)).cast("long"))
            .alias(f"{c}_oob"))
    return exprs


def observe_quality(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bounds: dict | None = None,
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach quality metrics to ``df``'s next action.  Returns
    ``(observed_df, observation)`` — run ONE action on the frame
    (write, count, foreachBatch body …), then read
    ``observation.get`` for ``{n_rows, <col>_nulls, <col>_oob}``.

    The metrics ride the action's own pass over the data
    (accumulators, no extra job, no re-execution); ``observation.get``
    BLOCKS until an action has run."""
    obs = Observation(name)
    return df.observe(obs, *quality_metrics(cols, bounds=bounds)), obs
