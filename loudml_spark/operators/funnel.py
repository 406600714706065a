"""Event-sequence analytics: ordered funnels and cohort retention.

The product-analytics companions to sessionization — "of the users
who did A, how many later did B, then C?" and "of the users first
seen in week W, how many came back k weeks later?".  Neither exists
in the reference (its queries are per-metric aggregations,
/root/reference/loudml/bucket.py get_times_data); both are standard
requirements for the event tables this engine ingests.

Scale design:

* ``funnel`` — ONE shuffle on the user key and ONE window pass: the
  ordered-steps constraint ("B counts only after an earlier A")
  compiles to a chain of running-max flags over each user's
  timeline, not to per-step self-joins (the textbook k-join funnel
  shuffles the fact table k times; the flag chain shuffles it
  once).  The per-user reduction reuses the same partitioning.
* ``cohort_retention`` — two aggregations over the same user-keyed
  shuffle (first-seen bucket, then distinct activity buckets),
  joined user-to-user (equi, same partitioning), then a bounded
  (cohort, offset) rollup.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from loudml_spark import errors


def funnel(
    df: DataFrame,
    *,
    steps: Sequence[str],
    step_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Ordered-sequence funnel: a user reaches step k when they have
    an event of ``steps[k]`` STRICTLY AFTER an event chain matching
    ``steps[:k]`` in order.  Ties (same timestamp) do not advance the
    chain — "later" means a greater ``ts_col``.

    Output: one row per step — (step_index 1-based, step,
    n_users) — with n_users non-increasing down the funnel.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise errors.Invalid("a funnel needs at least 2 steps")
    for c in (step_col, ts_col, user_col):
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")
    w = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, -1)
    # t_k = earliest time the k-step chain is complete, built as a
    # running min over "this event is steps[k] and the (k-1)-chain
    # completed strictly before it"
    cur = df.select(user_col, ts_col, step_col)
    prev_done = None
    reach_cols = []
    for k, s in enumerate(steps):
        if k == 0:
            ok = F.col(step_col) == s
        else:
            # earliest completion time of the previous chain among
            # STRICTLY EARLIER rows (rowsBetween(..., -1)); ties on
            # ts still count as earlier rows, so require < ts too
            prior = F.min(prev_done).over(w)
            ok = (F.col(step_col) == s) & prior.isNotNull() \
                & (prior < F.col(ts_col))
        done = F.when(ok, F.col(ts_col))
        colname = f"__done_{k}"
        cur = cur.withColumn(colname, done)
        prev_done = F.col(colname)
        reach_cols.append(colname)
    per_user = cur.groupBy(user_col).agg(*[
        F.max(F.col(c).isNotNull()).alias(f"__r{k}")
        for k, c in enumerate(reach_cols)
    ])
    counts = per_user.agg(*[
        F.sum(F.col(f"__r{k}").cast("long")).alias(f"__n{k}")
        for k in range(len(steps))
    ])
    rows = [
        F.struct(
            F.lit(k + 1).alias("step_index"),
            F.lit(s).alias("step"),
            F.col(f"__n{k}").alias("n_users"),
        )
        for k, s in enumerate(steps)
    ]
    return (
        counts.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
    )


def funnel_latency(
    df: DataFrame,
    *,
    steps: Sequence[str],
    step_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
    percentiles: Sequence[float] = (0.5, 0.9),
) -> DataFrame:
    """Conversion-latency distribution per funnel transition: for
    every user who completed step k, the time from their EARLIEST
    (k-1)-chain completion to their earliest k-chain completion,
    aggregated to exact percentiles + mean per transition.

    Output: (step_index of the destination step ≥ 2, step,
    n_converted, p<P> … , mean_latency).  Latencies are in
    ``ts_col`` units.  Same single-shuffle flag-chain plan as
    :func:`funnel` — the chain-completion times are already the
    running state it computes."""
    steps = list(steps)
    if len(steps) < 2:
        raise errors.Invalid("a funnel needs at least 2 steps")
    for c in (step_col, ts_col, user_col):
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")
    w = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, -1)
    cur = df.select(user_col, ts_col, step_col)
    prev_done = None
    done_cols = []
    for k, s in enumerate(steps):
        if k == 0:
            ok = F.col(step_col) == s
        else:
            prior = F.min(prev_done).over(w)
            ok = (F.col(step_col) == s) & prior.isNotNull() \
                & (prior < F.col(ts_col))
        colname = f"__done_{k}"
        cur = cur.withColumn(colname, F.when(ok, F.col(ts_col)))
        prev_done = F.col(colname)
        done_cols.append(colname)
    per_user = cur.groupBy(user_col).agg(*[
        F.min(c).alias(f"__t{k}") for k, c in enumerate(done_cols)
    ])
    # ONE aggregation computes every transition's stats (a per-branch
    # union would re-execute the whole flag-chain subtree per step),
    # then the 1-row result explodes to one row per transition
    aggs = []
    for k in range(1, len(steps)):
        lat = (F.col(f"__t{k}") - F.col(f"__t{k - 1}")).cast("double")
        aggs.append(F.count(lat).alias(f"__n{k}"))
        for p in percentiles:
            aggs.append(F.expr(
                f"percentile(__t{k} - __t{k - 1}, {p!r})"
            ).alias(f"__p{int(p * 100)}_{k}"))
        aggs.append(F.avg(lat).alias(f"__m{k}"))
    wide = per_user.agg(*aggs)
    rows = []
    for k in range(1, len(steps)):
        fields = [
            F.lit(k + 1).alias("step_index"),
            F.lit(steps[k]).alias("step"),
            F.col(f"__n{k}").alias("n_converted"),
        ]
        for p in percentiles:
            fields.append(F.col(f"__p{int(p * 100)}_{k}")
                          .alias(f"p{int(p * 100)}_latency"))
        fields.append(F.col(f"__m{k}").alias("mean_latency"))
        rows.append(F.struct(*fields))
    return (
        wide.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
    )


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    interval: int = 86400,
    ts_scale: int = 1,
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention triangle: users grouped by their first-seen
    bucket (cohort); for each later bucket offset, how many of the
    cohort were active.  Output: (cohort_ts, offset, n_active) with
    offset 0 = the cohort bucket itself (n_active = cohort size).
    """
    for c in (user_col, ts_col):
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")
    if interval <= 0:
        raise errors.Invalid("interval must be positive")
    step = interval * ts_scale
    bucket = F.expr(
        f"(`{ts_col}` - pmod(`{ts_col}`, {step}L)) div {ts_scale}L"
    ).cast("long")
    activity = (
        df.select(F.col(user_col).alias("u"), bucket.alias("b"))
        .distinct()
    )
    first = activity.groupBy("u").agg(F.min("b").alias("cohort_ts"))
    joined = activity.join(first, "u")
    out = (
        joined.withColumn(
            "offset",
            F.expr(f"(b - cohort_ts) div {int(interval)}L").cast("long"))
        .groupBy("cohort_ts", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    if max_offset is not None:
        out = out.filter(F.col("offset") <= max_offset)
    return out


def survival_curve(
    df: DataFrame,
    *,
    duration_col: str,
    event_col: str,
    by: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Kaplan–Meier survival estimate per key: for each distinct
    event time t (rows where the event OCCURRED),
    ``S(t) = Π_{t_i <= t} (1 − d_i / n_i)`` with d_i events at t_i
    and n_i subjects still at risk — time-to-event analytics
    (signup → churn, view → purchase) that handles right-censored
    subjects correctly instead of dropping them (which biases every
    naive mean-duration estimate downward).

    Input: one row per subject — ``duration_col`` (numeric time to
    event or to censoring) and ``event_col`` (1 = event observed,
    0 = censored).  Output per key: ``(t, n_risk, n_events,
    survival)`` at event times only, survival rounded.

    Shape: one groupBy on (key, t), then window passes over the
    per-key distinct-time frame (rows bounded by distinct durations,
    never subjects).  The product is exp(Σ ln(·)) — a cumulative-sum
    window, with the d = n absorbing zero handled explicitly (ln(0)
    is engine-dependent).
    """
    for c in (duration_col, event_col, *by):
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")
    by = list(by)
    per_t = (
        df.select(*by, F.col(duration_col).alias("t"),
                  F.col(event_col).cast("int").alias("__e"))
        .groupBy(*by, "t")
        .agg(F.sum("__e").alias("n_events"),
             F.count(F.lit(1)).alias("__total"))
    )
    base = Window.partitionBy(*by) if by else Window.partitionBy()
    w_cum = base.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    n_all = F.sum("__total").over(base.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
    left_before = F.sum("__total").over(w_cum) - F.col("__total")
    step = per_t.withColumn("n_risk", n_all - left_before)
    d, n = F.col("n_events").cast("double"), F.col("n_risk").cast("double")
    # ln(1 - d/n) only where the factor is positive; d = n is the
    # absorbing zero (no survivors past t) — flag it and zero out
    # that row and everything after
    term = F.when(d < n, F.log(F.lit(1.0) - d / n)).otherwise(F.lit(0.0))
    dead = F.max(
        F.when(d >= n, F.lit(1)).otherwise(F.lit(0))).over(w_cum)
    surv = F.when(dead == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(term).over(w_cum)))
    return (
        step.withColumn("survival", F.round(surv, round_dp) + F.lit(0.0))
        .filter(F.col("n_events") > 0)
        .select(*by, "t", "n_risk", "n_events", "survival")
    )
