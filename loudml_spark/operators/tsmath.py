"""Time-series math beyond the reference's per-bucket metric set:
counter-reset-aware rate, linear interpolation of missing buckets,
one-sided CUSUM changepoint statistic, and MAD-based robust scores.

The reference's metric vocabulary (derivative/integral/diff,
/root/reference/loudml/influx.py aggregate builders) treats every
field as a gauge and every missing bucket as NaN-or-fill.  These four
operators cover what monitoring users reach for next — PromQL
``increase``/``rate`` over restarting counters, gap interpolation
instead of forward-fill, sequential drift detection, and outlier
scores that survive heavy-tailed data — each as pure Column/window
algebra (JVM-side, whole-stage codegen; no Python in the hot path).

Scale design, per operator:

* ``counter_increase`` — ONE shuffle: the per-key lag window hash-
  partitions on ``by``, and the bucket aggregation groups on
  ``by + bucket`` whose clustering the same partitioning already
  satisfies, so Catalyst plans a single Exchange.
* ``interpolate_linear`` / ``cusum`` — window passes over an already
  bucketized frame: ≤ range/interval rows per key.  Pass ``by`` keys
  at scale; unkeyed frames are the deliberate bounded-single-partition
  case documented in SCALE.md.
* ``mad_scores`` — two aggregation passes (median, then MAD around
  it) + broadcast joins of per-key scalars.  Exact percentiles sort
  per key: right for bucketized series (bounded rows/key).  For raw
  100 TB points set ``approx=True`` → ``percentile_approx`` sketches,
  one pass each, mergeable map-side.

CUSUM uses the prefix closed form instead of the textbook recursion
S_t = max(0, S_{t-1} + x_t - k), which no SQL window can express:
with C_t = Σ_{i≤t}(x_i - k),  S_t = C_t - min(0, min_{i≤t} C_i).
Both are over the same ordered prefix, so one cumulative-sum window
plus one cumulative-min window computes the exact recursion.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from loudml_spark import errors


def _need(df: DataFrame, *cols: str) -> None:
    for c in cols:
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")


def counter_increase(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    interval: int,
    by: Sequence[str] = (),
    order_col: str | None = None,
    ts_scale: int = 1,
    rate: bool = True,
) -> DataFrame:
    """Per-bucket increase of a monotonic counter with reset handling
    (PromQL ``increase``/``rate`` semantics): per key in time order,
    ``delta = v - lag(v)``; a negative delta means the counter
    restarted, and the post-reset sample value itself is credited.
    The first sample of each key has no predecessor and contributes
    nothing.

    ``order_col`` breaks timestamp ties deterministically (pass a
    unique id when samples can share a timestamp — without it, tied
    rows make lag() order engine-dependent).

    ``ts_col`` is integer epoch in ``ts_scale`` units per second
    (ns → 10**9); buckets are labeled by left edge in SECONDS.
    Deltas route through DECIMAL so the per-bucket sum is exact, then
    cast to double.  Output: (by..., bucket_ts, increase[, rate]).
    """
    _need(df, ts_col, value_col, *by)
    by = list(by)
    order = [ts_col] + ([order_col] if order_col else [])
    w = (Window.partitionBy(*by).orderBy(*order) if by
         else Window.orderBy(*order))
    v = F.col(value_col).cast("decimal(18,2)")
    delta = v - F.lag(v).over(w)
    term = F.when(delta < 0, v).otherwise(delta)
    # integer div, never `/`: int64 ns exceed double's 53-bit mantissa
    # (operators/bucketize.py negative-safe floor convention)
    step = interval * ts_scale
    bucket = F.expr(
        f"(`{ts_col}` - pmod(`{ts_col}`, {step}L)) div {ts_scale}L"
    ).cast("long").alias("bucket_ts")
    out = (
        df.select(*by, bucket, term.alias("__term"))
        .groupBy(*by, "bucket_ts")
        .agg(F.sum("__term").cast("double").alias("increase"))
    )
    if rate:
        out = out.withColumn(
            "rate", F.col("increase") / F.lit(float(interval)))
    return out


def interpolate_linear(
    df: DataFrame,
    *,
    value_col: str,
    ts_col: str = "bucket_ts",
    by: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """Fill null buckets by linear interpolation between the nearest
    non-null neighbors (time-weighted, like a TSDB's ``fill(linear)``
    — the third fill mode next to the reference's ``default: <float>``
    and ``default: "previous"``, loudml/donut.py:597-610).  Leading /
    trailing gaps have no bracketing pair and stay null.

    Expects a bucketized frame (one row per (key, bucket), nulls for
    empty buckets — bucketize()'s output contract).  Two window passes
    per key, no extra shuffle beyond the partitioning both share.
    """
    _need(df, ts_col, value_col, *by)
    by = list(by)
    out_col = out_col or value_col
    base = (Window.partitionBy(*by) if by else Window.partitionBy())
    w_back = base.orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = base.orderBy(ts_col).rowsBetween(0, Window.unboundedFollowing)
    v, t = F.col(value_col), F.col(ts_col)
    t_of_v = F.when(v.isNotNull(), t)
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_t = F.last(t_of_v, ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_t = F.first(t_of_v, ignorenulls=True).over(w_fwd)
    # identical float op order to the SQL oracle: slope ratio first,
    # then the span product — keep in sync with catalog_ext
    interp = prev_v + (next_v - prev_v) * (
        (t - prev_t).cast("double") / (next_t - prev_t).cast("double")
    )
    filled = F.when(v.isNotNull(), v).otherwise(
        F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
    )
    return df.withColumn(out_col, filled)


def cusum(
    df: DataFrame,
    *,
    value_col: str,
    k: float,
    ts_col: str = "bucket_ts",
    by: Sequence[str] = (),
    h: float | None = None,
) -> DataFrame:
    """One-sided CUSUM drift statistic per key:
    ``S_t = max(0, S_{t-1} + (x_t - k))`` with S_0 = 0, computed via
    the prefix closed form (module docstring) — a cumulative sum and
    a cumulative min over the same ordered window, exact, no
    recursion.  ``k`` is the reference (target + slack) level; when
    ``h`` is given, adds ``is_change = S_t > h``.  Null values
    contribute 0 drift (sum skips them) but still emit a row.
    """
    _need(df, ts_col, value_col, *by)
    by = list(by)
    base = (Window.partitionBy(*by) if by else Window.partitionBy())
    w = base.orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    c = F.sum(F.col(value_col) - F.lit(float(k))).over(w)
    s = c - F.least(F.min(c).over(w), F.lit(0.0))
    out = df.withColumn("cusum", F.coalesce(s, F.lit(0.0)))
    if h is not None:
        out = out.withColumn("is_change", F.col("cusum") > F.lit(float(h)))
    return out


def page_hinkley(
    df: DataFrame,
    *,
    value_col: str,
    delta: float,
    lam: float,
    ts_col: str = "bucket_ts",
    by: Sequence[str] = (),
) -> DataFrame:
    """Page–Hinkley sequential drift test per key — the
    mean-shift companion to :func:`cusum` that needs NO reference
    level: each point deviates from the RUNNING mean,
    ``m_t = Σ_{i≤t} (x_i − x̄_i − δ)`` with x̄_i the prefix mean at i,
    and drift is flagged when ``m_t − min_{i≤t} m_i > λ``.  Like
    CUSUM, the textbook recursion has a prefix closed form: one
    cumulative avg, one cumulative sum over the deviations, one
    cumulative min — window algebra, no recursion, no Python.

    δ absorbs tolerated magnitude drift; λ is the alarm threshold.
    Null values contribute nothing (avg and sum skip them) but still
    emit a row.  Output adds ``ph`` (the m_t − min gap) and
    ``is_change``."""
    _need(df, ts_col, value_col, *by)
    by = list(by)
    if lam <= 0:
        raise errors.Invalid(f"lam must be positive, got {lam}")
    base = (Window.partitionBy(*by) if by else Window.partitionBy())
    w = base.orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    dev = (F.col(value_col) - F.avg(value_col).over(w)
           - F.lit(float(delta)))
    step = df.withColumn("__dev", dev)
    m = F.sum("__dev").over(w)
    gap = m - F.least(F.min(m).over(w), F.lit(0.0))
    out = step.withColumn("ph", F.coalesce(gap, F.lit(0.0)))         .drop("__dev")
    return out.withColumn("is_change", F.col("ph") > F.lit(float(lam)))


def ewma_weights(n_lags: int, *, alpha: float | None = None,
                 halflife: float | None = None) -> list[float]:
    """Normalizable truncated-EWMA weights (1-α)^j, j = 0..n_lags-1.
    Exactly one of ``alpha`` / ``halflife`` must be given; halflife h
    means the weight halves every h buckets (α = 1 − 2^(−1/h)).
    Shared by the Spark expression and the SQL oracle so both embed
    the SAME float literals."""
    if (alpha is None) == (halflife is None):
        raise errors.Invalid("pass exactly one of alpha / halflife")
    if alpha is None:
        if halflife <= 0:
            raise errors.Invalid("halflife must be positive")
        alpha = 1.0 - 2.0 ** (-1.0 / float(halflife))
    if not 0 < alpha <= 1:
        raise errors.Invalid("alpha must be in (0, 1]")
    return [(1.0 - alpha) ** j for j in range(n_lags)]


def ewma_trunc(
    df: DataFrame,
    *,
    value_col: str,
    n_lags: int = 16,
    alpha: float | None = None,
    halflife: float | None = None,
    ts_col: str = "bucket_ts",
    by: Sequence[str] = (),
    out_col: str = "ewma",
) -> DataFrame:
    """Truncated exponentially-weighted moving average per key:
    ``Σ_j w_j·x_{t-j} / Σ_j w_j`` over the last ``n_lags`` buckets,
    with missing lags (nulls, or before the series start) dropped
    from BOTH sums — the renormalization that makes the truncation
    and ragged edges exact instead of biased low.

    The textbook EWMA recursion y_t = αx_t + (1-α)y_{t-1} is not
    SQL-window-expressible and its closed form overflows ((1-α)^-t);
    truncating at n_lags where (1-α)^n_lags is negligible gives a
    FINITE weighted sum — n_lags lag() terms over one shared window
    spec, which Spark evaluates in a single window pass (pure JVM
    column math, codegen).  One shuffle on ``by``."""
    _need(df, ts_col, value_col, *by)
    by = list(by)
    ws = ewma_weights(n_lags, alpha=alpha, halflife=halflife)
    w = (Window.partitionBy(*by).orderBy(ts_col) if by
         else Window.orderBy(ts_col))
    v = F.col(value_col)
    num = None
    den = None
    for j, wt in enumerate(ws):
        x = v if j == 0 else F.lag(v, j).over(w)
        t_num = F.coalesce(x * F.lit(wt), F.lit(0.0))
        t_den = F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        # left-assoc accumulation, same order as the generated SQL
        num = t_num if num is None else num + t_num
        den = t_den if den is None else den + t_den
    out = F.when(den > 0, num / den)
    return df.withColumn(out_col, out)


def ewma_trunc_sql(
    value_col: str,
    n_lags: int,
    *,
    alpha: float | None = None,
    halflife: float | None = None,
    partition_by: str = "",
    order_by: str = "bucket_ts",
) -> str:
    """The ANSI-SQL mirror of :func:`ewma_trunc`'s expression —
    identical float literals (shared ewma_weights), identical
    left-associated op order, so both engines produce the same bits.
    Returns an expression string over window ``w``; the caller
    supplies ``WINDOW w AS (...)`` matching partition/order."""
    ws = ewma_weights(n_lags, alpha=alpha, halflife=halflife)
    nums, dens = [], []
    for j, wt in enumerate(ws):
        x = value_col if j == 0 else f"LAG({value_col}, {j}) OVER w"
        # every literal CAST to DOUBLE: bare decimal literals make
        # engines like DuckDB type the CASE chain DECIMAL and sum it
        # EXACTLY — a different accumulation than Spark's doubles
        w_lit = f"CAST({wt!r} AS DOUBLE)"
        nums.append(f"COALESCE({x} * {w_lit}, CAST(0.0 AS DOUBLE))")
        dens.append(f"CASE WHEN {x} IS NOT NULL THEN {w_lit} "
                    f"ELSE CAST(0.0 AS DOUBLE) END")
    num = " + ".join(nums)
    den = " + ".join(dens)
    return (f"CASE WHEN ({den}) > 0 "
            f"THEN ({num}) / ({den}) END")


def quantile_bins(
    df: DataFrame,
    *,
    value_col: str,
    n_bins: int,
    by: Sequence[str] = (),
    order_col: str | None = None,
    out_col: str = "bin",
    approx: bool = False,
) -> DataFrame:
    """Equal-frequency binning (feature discretizer): assign each row
    a 1..n_bins quantile bucket of ``value_col`` per ``by`` key.

    Exact mode is NTILE — row-count-balanced bins, deterministic
    under value ties via ``order_col`` (always pass one when values
    repeat: without it tie order is engine/partitioning-dependent).
    Per-key NTILE sorts each key's partition — right when keys bound
    the partition size; the unkeyed form is a single global sort
    (bounded frames only).

    ``approx=True`` is the 100 TB path: percentile_approx cut points
    (one aggregation, collected — n_bins-1 doubles) applied as a
    broadcast-free literal comparison chain; bins are then
    approximately equal-frequency and ties land in one bin."""
    _need(df, value_col, *by)
    if n_bins < 2:
        raise errors.Invalid("n_bins must be >= 2")
    by = list(by)
    if not approx:
        order = [value_col] + ([order_col] if order_col else [])
        w = (Window.partitionBy(*by).orderBy(*order) if by
             else Window.orderBy(*order))
        return df.withColumn(out_col, F.ntile(n_bins).over(w))
    qs = [i / n_bins for i in range(1, n_bins)]
    if by:
        cuts = df.groupBy(*by).agg(F.expr(
            f"approx_percentile({value_col}, array({','.join(map(str, qs))}))"
        ).alias("__cuts"))
        j = df.join(F.broadcast(cuts), on=by)
    else:
        row = df.agg(F.expr(
            f"approx_percentile({value_col}, array({','.join(map(str, qs))}))"
        ).alias("__cuts")).collect()[0][0]
        if row is None:
            # empty input / all-null values: approx_percentile is
            # NULL — no cut points exist, everything is bin 1 (the
            # same bin a null value lands in when cuts do exist)
            return df.withColumn(out_col, F.lit(1))
        j = df.withColumn(
            "__cuts", F.array(*[F.lit(float(c)) for c in row]))
    # bin = 1 + number of cut points the value exceeds
    bin_expr = F.lit(1) + F.aggregate(
        F.col("__cuts"), F.lit(0),
        lambda acc, c: acc + F.when(F.col(value_col) > c, 1).otherwise(0),
    )
    return j.withColumn(out_col, bin_expr).drop("__cuts")


def decompose_additive(
    df: DataFrame,
    *,
    period: int,
    interval: int,
    sum_col: str = "sum_dec",
    n_col: str = "n",
    ts_col: str = "bucket_ts",
    by: Sequence[str] = (),
    round_dp: int | None = 6,
) -> DataFrame:
    """Classic additive seasonal decomposition of a bucketized series:
    ``value = trend + seasonal + resid``.

    * ``trend`` — centered moving average over ±period//2 buckets,
      null where the window is incomplete (series edges).  Computed
      from DECIMAL partials (``sum_col``/``n_col``, the
      rollup_partials contract) so it is EXACT — windowed double
      averages would drift between engines.
    * ``seasonal`` — per-phase mean of the detrended series, phase =
      (bucket index) mod period.  A float mean with engine-specific
      summation order, so it is rounded (``round_dp``) — the same
      convention every avg oracle uses.
    * ``resid`` — value − trend − seasonal (rounded like seasonal).

    Two window passes: the trend window orders by time within ``by``;
    the phase means re-partition on (by…, phase).  Both frames are
    post-aggregation series (≤ range/interval rows per key).  The
    unkeyed form is a bounded single partition — the documented
    catalog case.  Seasonal components are NOT re-centered to sum
    zero (the raw phase means keep the oracle algebra exact).
    """
    _need(df, ts_col, sum_col, n_col, *by)
    by = list(by)
    h = period // 2
    span = 2 * h + 1
    wt = (
        (Window.partitionBy(*by) if by else Window.partitionBy())
        .orderBy(ts_col).rowsBetween(-h, h)
    )
    value = F.col(sum_col).cast("double") / F.col(n_col)
    trend = F.when(
        F.count(F.lit(1)).over(wt) == span,
        F.sum(sum_col).over(wt).cast("double") / F.sum(n_col).over(wt),
    )
    phase = F.pmod(
        F.expr(f"`{ts_col}` div {interval}L"), F.lit(period)
    ).cast("int")
    base = (
        df.select(*by, ts_col, sum_col, n_col)
        .withColumn("value", value)
        .withColumn("trend", trend)
        .drop(sum_col, n_col)
        .withColumn("__phase", phase)
        .withColumn("__detr", F.col("value") - F.col("trend"))
    )
    wp = Window.partitionBy(*by, "__phase")
    seasonal = F.avg("__detr").over(wp)
    resid = F.col("value") - F.col("trend") - F.col("seasonal")
    if round_dp is not None:
        seasonal = F.round(seasonal, round_dp)
        out = base.withColumn("seasonal", seasonal).withColumn(
            "resid", F.round(resid, round_dp))
    else:
        out = base.withColumn("seasonal", seasonal).withColumn(
            "resid", resid)
    return out.drop("__phase", "__detr")


def mad_scores(
    df: DataFrame,
    *,
    value_col: str,
    by: Sequence[str] = (),
    c: float = 0.6745,
    approx: bool = False,
    out_col: str = "robust_score",
) -> DataFrame:
    """Robust outlier score per row:
    ``c * (x - median) / MAD`` where ``MAD = median(|x - median|)``
    per key — the standard heavy-tail-safe alternative to the z-score
    behind anomaly_scores (ml/scoring.py), whose mean/σ a single
    spike can drag.  c = 0.6745 rescales MAD to σ under normality.
    Keys where MAD = 0 (constant series) score null.

    Exact percentiles by default (right for bucketized frames);
    ``approx=True`` switches to percentile_approx for raw-point scale.

    Implementation: whole-partition window aggregates, NOT
    groupBy + join-back — the input plan evaluates ONCE, both medians
    share one shuffle on ``by``, and there are no joins at all (a
    group-then-join version re-executed the upstream plan three
    times: 7 exchanges vs this one's 2).  Unkeyed frames fall into a
    single ordered partition — the deliberate bounded-frame case;
    pass keys at scale.
    """
    _need(df, value_col, *by)
    by = list(by)
    pct = "approx_percentile" if approx else "percentile"
    w = Window.partitionBy(*by) if by else Window.partitionBy()
    med = F.expr(f"{pct}({value_col}, 0.5)").over(w)
    step1 = df.withColumn("__med", med)
    mad = F.expr(f"{pct}(abs({value_col} - __med), 0.5)").over(w)
    step2 = step1.withColumn("__mad", mad)
    score = F.when(
        F.col("__mad") != 0,
        F.lit(float(c)) * (F.col(value_col) - F.col("__med"))
        / F.col("__mad"),
    )
    return step2.withColumn(out_col, score).drop("__med", "__mad")


def cross_correlation(
    series_a: DataFrame,
    series_b: DataFrame,
    *,
    ts_col: str = "bucket_ts",
    value_col: str = "value",
    interval: int,
    max_lag: int,
    out_col: str = "xcorr",
) -> DataFrame:
    """Pearson cross-correlation of two bucketized series at every
    integer lag in [-max_lag, +max_lag]: row ``(lag, n, xcorr)``
    where ``xcorr = corr(a[t], b[t - lag*interval])`` over the ``n``
    buckets where both series exist (positive lag = b leads a).  The
    lead/lag scan behind "does the error rate predict the signup
    drop, and by how many hours?".

    Shape: the lag fan-out is an EXPLODE of a (2·max_lag+1)-literal
    array on the (already aggregated, |buckets|-sized) b series —
    no range join, no per-lag plan branch; one equi-join on the
    shifted bucket key, one groupBy(lag).  Constant series yield
    null (zero variance), matching SQL corr semantics — spelled as
    try_divide(covar_pop, σ_a·σ_b) because under ANSI mode (Spark 4
    default) the built-in ``corr`` raises DIVIDE_BY_ZERO instead.
    """
    _need(series_a, ts_col, value_col)
    _need(series_b, ts_col, value_col)
    if interval <= 0:
        raise errors.Invalid(f"interval must be > 0, got {interval}")
    if max_lag < 0:
        raise errors.Invalid(f"max_lag must be >= 0, got {max_lag}")
    lags = F.array(*[F.lit(i) for i in range(-max_lag, max_lag + 1)])
    b = (
        series_b.select(F.col(ts_col).alias("__ts"),
                        F.col(value_col).alias("__vb"),
                        F.explode(lags).alias("lag"))
        .select("lag", "__vb",
                (F.col("__ts") + F.col("lag").cast("long") * interval)
                .alias("__shifted"))
    )
    a = series_a.select(F.col(ts_col).alias("__ts2"),
                        F.col(value_col).alias("__va"))
    return (
        a.join(b, F.col("__ts2") == F.col("__shifted"))
        .groupBy("lag")
        .agg(F.count("*").alias("n"),
             F.round(F.try_divide(
                 F.covar_pop("__va", "__vb"),
                 F.stddev_pop("__va") * F.stddev_pop("__vb")), 6)
             .alias(out_col))
    )


def theil_sen(
    df: DataFrame,
    *,
    ts_col: str = "bucket_ts",
    value_col: str = "value",
    by: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Theil–Sen robust trend per key: ``slope`` is the median of all
    pairwise slopes (y_j − y_i)/(x_j − x_i), ``intercept`` the median
    of y_i − slope·x_i — the classic 29%-breakdown alternative to
    least squares (ml/regression.py), immune to the spikes that drag
    an OLS fit.

    Runs on a BUCKETIZED series: the within-key pair fan-out is
    n²/2 where n is the bucket count (time-range-bound, never raw
    volume), produced by a self equi-join ON THE KEYS — unkeyed
    input degenerates to one constant-key partition, the deliberate
    bounded-frame case (same policy as mad_scores).  Output:
    key columns + (slope, intercept, n_points).
    """
    _need(df, ts_col, value_col, *by)
    by = list(by)
    base = df.select(
        *by, F.col(ts_col).alias("__x"), F.col(value_col).alias("__y"))
    if not by:
        # constant synthetic key: the pair join and the slope
        # re-attach stay equi-joins (no nested loop) and the
        # semantics are the single-series case
        base = base.withColumn("__k", F.lit(1))
    gb = by if by else ["__k"]
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.__x") < F.col("b.__x")
    for k in gb:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    keys = [F.col(f"a.{k}").alias(k) for k in gb]
    slopes = a.join(b, cond).select(
        *keys,
        ((F.col("b.__y") - F.col("a.__y"))
         / (F.col("b.__x") - F.col("a.__x")).cast("double"))
        .alias("__s"))
    slope = slopes.groupBy(*gb).agg(
        F.expr("percentile(__s, 0.5)").alias("slope"))
    out = base.join(slope, gb).groupBy(*gb).agg(
        F.round(F.first("slope"), round_dp).alias("slope"),
        F.round(F.expr("percentile(__y - slope * __x, 0.5)"),
                round_dp).alias("intercept"),
        F.count("*").alias("n_points"))
    return out.drop("__k")


def naive_forecast(
    df: DataFrame,
    *,
    ts_col: str = "bucket_ts",
    value_col: str = "value",
    interval: int,
    horizon: int,
    season: int | None = None,
    drift: bool = False,
    by: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """The M-competition baseline forecasters, exactly (Hyndman &
    Athanasopoulos, FPP3 §5.2): per key and horizon h = 1..H,

    * naive:            ŷ(T+h) = y_T
    * naive + drift:    ŷ(T+h) = y_T + h · (y_T − y_1)/(n − 1)
    * seasonal naive:   ŷ(T+h) = y(T + h − m·⌈h/m⌉)  (last season)
    * snaive + drift:   seasonal source + the drift term

    Every Donut forecast in this repo should beat these — that is
    what the baselines are FOR — and they are the honest fallback
    for series too short to train.

    Shape: one groupBy for the per-key scalars (y_first via min_by,
    y_last via max_by, n), a row_number window to keep the last
    ``season`` rows per key, and a literal explode of the H horizons
    joined on the season offset — all equi-joins, fan-out H per key.
    Horizons whose seasonal source does not exist (series shorter
    than one season) emit no row; drift with n = 1 yields null.
    Output: (by..., h, forecast_ts, yhat).
    """
    _need(df, ts_col, value_col, *by)
    by = list(by)
    if interval <= 0:
        raise errors.Invalid(f"interval must be > 0, got {interval}")
    if horizon < 1:
        raise errors.Invalid(f"horizon must be >= 1, got {horizon}")
    if season is not None and season < 1:
        raise errors.Invalid(f"season must be >= 1, got {season}")
    base = df.select(
        *by, F.col(ts_col).alias("__x"), F.col(value_col).alias("__y"))
    if not by:
        base = base.withColumn("__k", F.lit(1))
    gb = by if by else ["__k"]
    scal = base.groupBy(*gb).agg(
        F.expr("min_by(__y, __x)").alias("__y1"),
        F.expr("max_by(__y, __x)").alias("__yT"),
        F.max("__x").alias("__xT"),
        F.count("*").alias("__n"))
    hs = F.explode(F.array(
        *[F.lit(h) for h in range(1, horizon + 1)])).alias("h")
    fc = scal.select(*gb, "__y1", "__yT", "__xT", "__n", hs)
    d = F.try_divide(
        F.col("__yT") - F.col("__y1"),
        (F.col("__n") - F.lit(1)).cast("double"))
    drift_term = (F.col("h").cast("double") * d) if drift else F.lit(0.0)
    if season is None:
        out = fc.select(
            *gb, "h",
            (F.col("__xT") + F.col("h").cast("long") * interval)
            .alias("forecast_ts"),
            F.round(F.col("__yT") + drift_term, round_dp)
            .alias("yhat"))
    else:
        m = season
        w = (Window.partitionBy(*gb) if gb else Window.partitionBy()) \
            .orderBy(F.desc("__x"))
        last_season = base.withColumn(
            "__r", F.row_number().over(w)).filter(F.col("__r") <= m) \
            .select(*gb, F.col("__r"), F.col("__y").alias("__src"))
        # source rank-from-end for horizon h: m·⌈h/m⌉ − h + 1
        fc = fc.withColumn(
            "__r", (F.lit(m) * F.ceil(F.col("h") / F.lit(m))
                    - F.col("h") + 1).cast("int"))
        out = fc.join(last_season, gb + ["__r"]).select(
            *gb, "h",
            (F.col("__xT") + F.col("h").cast("long") * interval)
            .alias("forecast_ts"),
            F.round(F.col("__src") + drift_term, round_dp)
            .alias("yhat"))
    return out.drop("__k")


def forecast_backtest(
    df: DataFrame,
    *,
    ts_col: str = "bucket_ts",
    value_col: str = "value",
    horizons: Sequence[int] = (1,),
    method: str = "naive",
    season: int | None = None,
    by: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Rolling-origin backtest of the naive forecasters: for every
    bucket t and horizon h, pretend the series ended at t−h, forecast
    t, and score against the actual — the standard way to pick (and
    honestly report) a forecasting method before trusting it forward.

    * ``method="naive"``:  ŷ_t = y_{t−h}
    * ``method="snaive"``: ŷ_t = y_{t − m·⌈h/m⌉}  (needs ``season``)

    Output per (key, h): ``n`` scored points (origins whose lag
    exists), ``mae``, ``rmse`` — both rounded.  One window pass per
    key computes ALL horizons' lag columns (offsets are literals, so
    they share a single sort), then a struct-array explode unpivots
    them: shuffle cost is one hash partition on the keys regardless
    of |horizons|.
    """
    _need(df, ts_col, value_col, *by)
    by = list(by)
    hs = sorted(set(int(h) for h in horizons))
    if not hs or hs[0] < 1:
        raise errors.Invalid("horizons must be >= 1")
    if method == "naive":
        offset = {h: h for h in hs}
    elif method == "snaive":
        if season is None or season < 1:
            raise errors.Invalid("snaive needs season >= 1")
        offset = {h: season * -(-h // season) for h in hs}
    else:
        raise errors.Invalid(
            f"unknown backtest method {method!r} (naive|snaive)")
    w = (Window.partitionBy(*by) if by else Window.partitionBy()) \
        .orderBy(ts_col)
    y = F.col(value_col)
    # window expressions are not allowed inside a generator:
    # materialize the per-horizon error columns first, then explode
    lagged = df.select(
        *by, *[(y - F.lag(y, offset[h]).over(w)).alias(f"__e{h}")
               for h in hs])
    errs = F.array(*[
        F.struct(F.lit(h).alias("h"), F.col(f"__e{h}").alias("e"))
        for h in hs])
    out = (
        lagged.select(*by, F.explode(errs).alias("__x"))
        .select(*by, F.col("__x.h").alias("h"), F.col("__x.e").alias("e"))
        .filter(F.col("e").isNotNull())
        .groupBy(*by, "h")
        .agg(F.count("*").alias("n"),
             F.round(F.avg(F.abs(F.col("e"))), round_dp).alias("mae"),
             F.round(F.sqrt(F.avg(F.col("e") * F.col("e"))),
                     round_dp).alias("rmse"))
    )
    return out


def winsorize(
    df: DataFrame,
    *,
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    by: Sequence[str] = (),
    approx: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` to its per-key [lower, upper] quantiles —
    the standard tail-taming transform before means/regressions that
    a single sensor glitch would otherwise drag (the transform-side
    sibling of mad_scores' detection).  NULLs pass through.

    Same execution policy as mad_scores: whole-partition window
    aggregates (both cut points share ONE shuffle on ``by``, no
    join-back re-executing the input), exact percentiles for
    bucketized frames, ``approx=True`` for raw-point scale.
    """
    _need(df, value_col, *by)
    if not (0.0 <= lower < upper <= 1.0):
        raise errors.Invalid(
            f"need 0 <= lower < upper <= 1, got ({lower}, {upper})")
    by = list(by)
    out_col = out_col or value_col
    pct = "approx_percentile" if approx else "percentile"
    w = Window.partitionBy(*by) if by else Window.partitionBy()
    lo = F.expr(f"{pct}({value_col}, {lower!r})").over(w)
    hi = F.expr(f"{pct}({value_col}, {upper!r})").over(w)
    clipped = F.when(
        F.col(value_col).isNotNull(),
        F.least(F.greatest(F.col(value_col), lo), hi))
    return df.withColumn(out_col, clipped)


def changepoint_mean(
    df: DataFrame,
    *,
    ts_col: str = "bucket_ts",
    value_col: str = "value",
    by: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """WHERE did the mean shift?  The binary-segmentation step-1
    estimate per key: the time t* maximizing the centered-cumsum
    deviation ``|C_t − (i/n)·C_n|`` (C = running sum, i = position)
    — the complement of :func:`cusum`, which flags WHEN drift
    accumulates past a threshold but not the split point.

    Output per key: ``(changepoint_ts, statistic, n_points)`` —
    the candidate split for segment-wise refitting; ties break to
    the earliest time deterministically.  One window shuffle on the
    keys (cumsum + position share it), one max_by aggregation; the
    frame is an already-bucketized series, rows bounded by bucket
    count.
    """
    _need(df, ts_col, value_col, *by)
    by = list(by)
    base = Window.partitionBy(*by) if by else Window.partitionBy()
    w = base.orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    whole = base.orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    v = F.col(value_col).cast("double")
    c = F.sum(v).over(w)
    cn = F.sum(v).over(whole)
    i = F.row_number().over(base.orderBy(ts_col))
    n = F.count(F.lit(1)).over(whole)
    dev = F.abs(c - (i.cast("double") / n.cast("double")) * cn)
    step = df.select(
        *by, F.col(ts_col).alias("__t"), dev.alias("__dev"),
        n.alias("__n"))
    # ties break to the EARLIEST ts: maximize (dev, -ts)
    # lexicographically — struct comparison is lexicographic in both
    # engines
    return step.groupBy(*by).agg(
        F.expr("max_by(__t, struct(__dev as d, -__t as mt))")
        .alias("changepoint_ts"),
        F.round(F.max("__dev"), round_dp).alias("statistic"),
        F.first("__n").alias("n_points"))


def decomposition_strength(
    df: DataFrame,
    *,
    trend_col: str = "trend",
    seasonal_col: str = "seasonal",
    resid_col: str = "resid",
    by: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Hyndman's trend/seasonal strength diagnostics (FPP3 §4.3) over
    a decomposed series:
    ``F_trend = max(0, 1 − var(resid)/var(trend + resid))``,
    ``F_seas  = max(0, 1 − var(resid)/var(seasonal + resid))`` —
    the 0..1 scores behind "is this series worth a seasonal model?"
    (feature-izing thousands of series before routing them to
    forecasters).  Rows whose trend is null (the MA edge) are
    excluded; zero-variance denominators yield null (try_divide).

    One aggregation pass per key over the decomposed frame.
    Output: (by..., n, trend_strength, seasonal_strength).
    """
    _need(df, trend_col, seasonal_col, resid_col, *by)
    by = list(by)
    d = df.filter(F.col(resid_col).isNotNull()
                  & F.col(trend_col).isNotNull())
    r = F.col(resid_col)

    def strength(partner):
        ratio = F.try_divide(F.var_pop(r), F.var_pop(partner + r))
        return F.round(
            F.greatest(F.lit(0.0), F.lit(1.0) - ratio), round_dp)

    return d.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        strength(F.col(trend_col)).alias("trend_strength"),
        strength(F.col(seasonal_col)).alias("seasonal_strength"))


def brown_forecast(
    df: DataFrame,
    *,
    value_col: str = "value",
    interval: int,
    horizon: int,
    n_lags: int = 16,
    alpha: float | None = None,
    halflife: float | None = None,
    ts_col: str = "bucket_ts",
    by: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Brown's double exponential smoothing forecast — the
    trend-aware step up from the naive baselines: smooth the series
    twice with the SAME truncated EWMA (s1 over x, s2 over s1), then
    extrapolate from the last bucket per key:

        level = 2·s1 − s2
        slope = (α/(1−α))·(s1 − s2)
        ŷ(T+h) = level + h·slope

    Both smoothing passes reuse :func:`ewma_trunc` (renormalized
    truncation, identical literals in Spark and the SQL mirror), so
    two window passes share one shuffle on the keys; the horizon
    fan-out is a literal explode of the last row per key.  Output:
    (by..., h, forecast_ts, yhat).
    """
    _need(df, ts_col, value_col, *by)
    by = list(by)
    if interval <= 0:
        raise errors.Invalid(f"interval must be > 0, got {interval}")
    if horizon < 1:
        raise errors.Invalid(f"horizon must be >= 1, got {horizon}")
    ws = ewma_weights(2, alpha=alpha, halflife=halflife)
    a = 1.0 - ws[1]  # resolved alpha, same resolution as the weights
    if a >= 1.0 - 1e-12:
        raise errors.Invalid("alpha must be < 1 for Brown's slope")
    s1 = ewma_trunc(df, value_col=value_col, n_lags=n_lags,
                    alpha=alpha, halflife=halflife, ts_col=ts_col,
                    by=by, out_col="__s1")
    s2 = ewma_trunc(s1, value_col="__s1", n_lags=n_lags,
                    alpha=alpha, halflife=halflife, ts_col=ts_col,
                    by=by, out_col="__s2")
    w = (Window.partitionBy(*by).orderBy(F.desc(ts_col)) if by
         else Window.orderBy(F.desc(ts_col)))
    last = s2.withColumn("__rn", F.row_number().over(w)) \
        .filter(F.col("__rn") == 1)
    hs = F.explode(F.array(
        *[F.lit(h) for h in range(1, horizon + 1)])).alias("h")
    level = F.lit(2.0) * F.col("__s1") - F.col("__s2")
    slope = F.lit(a / (1.0 - a)) * (F.col("__s1") - F.col("__s2"))
    return last.select(*by, "__s1", "__s2", F.col(ts_col).alias("__xT"),
                       hs).select(
        *by, "h",
        (F.col("__xT") + F.col("h").cast("long") * interval)
        .alias("forecast_ts"),
        F.round(level + F.col("h").cast("double") * slope, round_dp)
        .alias("yhat"))


def conformal_naive(
    df: DataFrame,
    *,
    ts_col: str = "bucket_ts",
    value_col: str = "value",
    interval: int,
    horizon: int,
    alpha_num: int = 1,
    alpha_den: int = 10,
    by: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Split-conformal prediction intervals for the naive forecaster
    — DISTRIBUTION-FREE bands with a finite-sample coverage
    guarantee (Vovk et al.; the modern replacement for the Gaussian
    ±3σ convention the reference's bands assume): for each horizon
    h, the calibration scores are the historical h-step-ahead
    absolute errors |y_t − y_{t−h}|, and the band half-width is
    their ⌈(n_h+1)·(1−α)⌉-th smallest value — an ORDER STATISTIC,
    not an interpolated quantile, which is what makes the ≥ 1−α
    coverage exact for exchangeable errors.

    α is the rational ``alpha_num/alpha_den`` so the rank k computes
    in exact integer arithmetic (``⌈(n+1)(1−α)⌉`` via integer DIV —
    a float ⌈(n+1)·0.9⌉ can land on the wrong side of an exact
    integer in ways that differ from exact math); k > n_h (too few
    calibration points for the requested coverage) yields a NULL
    band rather than silently under-covering.

    Shape: the h-step residuals come from ONE equi-join of the
    series against itself shifted by h·interval (h exploded from a
    literal array — fan-out H per row, no window over h); per-(key,
    h) rank selection is a window over the bounded residual set; the
    last-value forecast joins back per key.  All arithmetic is
    differences and order statistics of the input doubles —
    bit-portable with no quantization schedule.  Output: (by..., h,
    forecast_ts, yhat, q, lower, upper, n_cal)."""
    _need(df, ts_col, value_col, *by)
    by = list(by)
    if interval <= 0:
        raise errors.Invalid(f"interval must be > 0, got {interval}")
    if horizon < 1:
        raise errors.Invalid(f"horizon must be >= 1, got {horizon}")
    if not (0 < alpha_num < alpha_den):
        raise errors.Invalid(
            f"alpha must be in (0,1), got {alpha_num}/{alpha_den}")
    base = df.select(
        *by, F.col(ts_col).alias("__x"), F.col(value_col).alias("__y"))
    if not by:
        base = base.withColumn("__k", F.lit(1))
    gb = by if by else ["__k"]
    hs = F.explode(F.array(
        *[F.lit(h) for h in range(1, horizon + 1)])).alias("h")
    lagged = base.select(*gb, "__x", "__y", hs).withColumn(
        "__xj", F.col("__x") + F.col("h").cast("long") * interval)
    cur = base.select(
        *gb, F.col("__x").alias("__xj"), F.col("__y").alias("__yc"))
    res = lagged.join(cur, on=[*gb, "__xj"]).select(
        *gb, "h", F.abs(F.col("__yc") - F.col("__y")).alias("__r"))
    w = Window.partitionBy(*gb, "h").orderBy("__r")
    ranked = res.withColumn("__rn", F.row_number().over(w)) \
        .withColumn("__n", F.count("*").over(
            Window.partitionBy(*gb, "h")))
    # k = ceil((n+1)(1-alpha)) in exact integers:
    #     ((n+1)(den-num) + den - 1) DIV den
    k = ((F.col("__n") + 1) * (alpha_den - alpha_num)
         + (alpha_den - 1)).cast("long")
    kq = F.floor(k / F.lit(alpha_den)).cast("long")
    qs = ranked.withColumn("__kq", kq).groupBy(*gb, "h").agg(
        F.max(F.when(F.col("__rn") == F.col("__kq"), F.col("__r")))
        .alias("q"),
        F.max("__n").alias("n_cal"),
    )
    wlast = (Window.partitionBy(*gb).orderBy(F.desc("__x")))
    last = base.withColumn("__rn", F.row_number().over(wlast)) \
        .filter(F.col("__rn") == 1) \
        .select(*gb, F.col("__x").alias("__xT"),
                F.col("__y").alias("__yT"))
    out = qs.join(last, on=gb)
    r6 = lambda c: F.round(c, round_dp) + F.lit(0.0)  # noqa: E731
    out = out.select(
        *gb, "h",
        (F.col("__xT") + F.col("h").cast("long") * interval)
        .alias("forecast_ts"),
        r6(F.col("__yT")).alias("yhat"),
        r6(F.col("q")).alias("q"),
        r6(F.col("__yT") - F.col("q")).alias("lower"),
        r6(F.col("__yT") + F.col("q")).alias("upper"),
        "n_cal",
    )
    return out.drop("__k") if not by else out


def hw_fit_forecast(
    values,
    *,
    period: int,
    horizon: int,
    alpha: float,
    beta: float,
    gamma: float,
    round_dp: int = 6,
):
    """Pure-numpy additive Holt–Winters recurrence, SHARED by the
    distributed operator and its replay oracle so both execute the
    identical float sequence (only +−·/ — IEEE-deterministic, no
    transcendentals, so Spark executors and the oracle replay agree
    bit-for-bit on identical input series).

    Classical initialization (Hyndman FPP3 §8.3): level = mean of the
    first cycle, trend = cycle-over-cycle mean difference / period,
    seasonals = first-cycle deviations; then for t ∈ [period, n):

        l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
        s_t = γ(y_t − l_t) + (1−γ)s_{t−m}

    Forecast: ŷ(T+h) = l_T + h·b_T + s_{phase(T+h)} with the most
    recent seasonal for that phase.  Returns a list of ``horizon``
    floats rounded at ``round_dp`` (+0.0 collapses −0.0)."""
    import numpy as np

    y = np.asarray(values, dtype=np.float64)
    n = int(y.size)
    m = int(period)
    if n < 2 * m:
        raise errors.Invalid(
            f"holt-winters needs >= 2*period points, got {n} < {2 * m}")
    if np.isnan(y).any():
        raise errors.Invalid(
            "holt-winters input has NaN buckets - fill gaps upstream")
    level = float(y[:m].mean())
    trend = (float(y[m:2 * m].mean()) - level) / m
    season = [float(v) - level for v in y[:m]]
    for t in range(m, n):
        si = season[t % m]
        new_level = (alpha * (float(y[t]) - si)
                     + (1.0 - alpha) * (level + trend))
        trend = beta * (new_level - level) + (1.0 - beta) * trend
        season[t % m] = (gamma * (float(y[t]) - new_level)
                         + (1.0 - gamma) * si)
        level = new_level
    return [
        round(level + h * trend + season[(n - 1 + h) % m], round_dp)
        + 0.0
        for h in range(1, horizon + 1)
    ]


def holt_winters_forecast(
    df: DataFrame,
    *,
    value_col: str = "value",
    interval: int,
    period: int,
    horizon: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    ts_col: str = "bucket_ts",
    by: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Additive Holt–Winters (triple exponential smoothing) forecast
    per key — the seasonal step up from :func:`brown_forecast`
    (level+trend) and the classical companion to the learned models:
    level, trend, AND a ``period``-cycle seasonal state, fitted by
    the standard recurrence and extrapolated ``horizon`` buckets.

    The recurrence is genuinely sequential (each state feeds the
    next; no window/prefix closed form exists once the seasonal
    array interacts with level), so this is the keyed-applyInPandas
    discipline used by ``ml/detect.py``: one shuffle on ``by``,
    thousands of independent series in parallel, each series'
    bucket list bounded by time-range/interval — not data volume.
    Keys with fewer than ``2·period`` buckets emit NO rows (a short
    key must not kill a 100 TB job); count them upstream if that is
    a data-quality signal.  Null/NaN buckets raise — fill gaps
    first (the fill/interpolate operators exist for exactly that).

    Output: (by..., h, forecast_ts, yhat), bit-reproducible across
    partitionings and engines (see :func:`hw_fit_forecast`)."""
    import pandas as pd
    from pyspark.sql import types as T

    _need(df, ts_col, value_col, *by)
    by = list(by)
    if interval <= 0:
        raise errors.Invalid(f"interval must be > 0, got {interval}")
    if horizon < 1:
        raise errors.Invalid(f"horizon must be >= 1, got {horizon}")
    if period < 2:
        raise errors.Invalid(f"period must be >= 2, got {period}")
    for name, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not (0.0 < v < 1.0):
            raise errors.Invalid(f"{name} must be in (0, 1), got {v}")
    base = df if by else df.withColumn("__k", F.lit(1))
    gb = by if by else ["__k"]
    by_fields = [f for f in base.schema.fields if f.name in gb]
    schema = T.StructType(
        by_fields
        + [T.StructField("h", T.IntegerType()),
           T.StructField("forecast_ts", T.LongType()),
           T.StructField("yhat", T.DoubleType())]
    )

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col)
        y = pdf[value_col].to_numpy(dtype="float64")
        if y.size < 2 * period:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        yh = hw_fit_forecast(
            y, period=period, horizon=horizon, alpha=alpha,
            beta=beta, gamma=gamma, round_dp=round_dp)
        last_ts = int(pdf[ts_col].iloc[-1])
        out = {k: [pdf[k].iloc[0]] * horizon for k in gb}
        out["h"] = list(range(1, horizon + 1))
        out["forecast_ts"] = [last_ts + h * interval
                              for h in out["h"]]
        out["yhat"] = yh
        return pd.DataFrame(out)

    res = base.groupBy(*gb).applyInPandas(fit, schema=schema)
    return res.drop("__k") if not by else res


def mann_kendall(
    df: DataFrame,
    *,
    ts_col: str = "bucket_ts",
    value_col: str = "value",
    by: Sequence[str] = (),
    z_crit: float = 1.96,
    round_dp: int = 6,
) -> DataFrame:
    """Mann–Kendall non-parametric trend test per key — the
    significance companion to :func:`theil_sen` (which gives the
    slope, not whether it is real): ``S = Σ_{i<j} sign(x_j − x_i)``
    over time-ordered pairs, the tie-corrected variance
    ``[n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18``, and the
    continuity-corrected z.  Robust to outliers and monotone (not
    just linear) trends.

    Output per key: ``(n, s_stat, var_s, z, trend)`` with trend ∈
    {'increasing', 'decreasing', 'no trend'} at |z| > ``z_crit``.
    Same pair-join shape as theil_sen: n²/2 per key over an
    already-bucketized series (time-range-bound), one keyed self
    equi-join + one tie aggregation; S and the variance are exact
    integers until the final division and sqrt (rounded).
    """
    _need(df, ts_col, value_col, *by)
    by = list(by)
    base = df.select(
        *by, F.col(ts_col).alias("__x"), F.col(value_col).alias("__y"))
    if not by:
        base = base.withColumn("__k", F.lit(1))
    gb = by if by else ["__k"]
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.__x") < F.col("b.__x")
    for k in gb:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    s = a.join(b, cond).groupBy(
        *[F.col(f"a.{k}").alias(k) for k in gb]).agg(
        F.sum(F.signum(F.col("b.__y") - F.col("a.__y")).cast("long"))
        .alias("s_stat"))
    ties = base.groupBy(*gb, "__y").agg(F.count("*").alias("__t")) \
        .groupBy(*gb).agg(
            F.sum("__t").alias("n"),
            F.sum(F.col("__t") * (F.col("__t") - 1)
                  * (2 * F.col("__t") + 5)).alias("__tie"))
    n = F.col("n")
    var_s = (n * (n - 1) * (2 * n + 5) - F.col("__tie")) \
        .cast("double") / F.lit(18.0)
    j = s.join(ties, gb).withColumn("var_s", var_s)
    z = F.when(F.col("s_stat") > 0,
               (F.col("s_stat") - 1) / F.sqrt(F.col("var_s"))) \
        .when(F.col("s_stat") < 0,
              (F.col("s_stat") + 1) / F.sqrt(F.col("var_s"))) \
        .otherwise(F.lit(0.0))
    out = j.withColumn("z", F.round(z, round_dp) + F.lit(0.0))
    trend = F.when(F.col("z") > z_crit, "increasing") \
        .when(F.col("z") < -z_crit, "decreasing") \
        .otherwise("no trend")
    return out.select(
        *gb, "n", "s_stat", "var_s", "z", trend.alias("trend")) \
        .drop("__k")


def periodogram(
    df: DataFrame,
    *,
    ts_col: str = "bucket_ts",
    value_col: str = "value",
    by: Sequence[str] = (),
    interval: int,
    max_freq: int,
    round_dp: int = 6,
) -> DataFrame:
    """Classical periodogram of a bucketized series: spectral power
    ``I(k) = (c_k² + s_k²) / n_obs`` at Fourier frequencies
    ``k = 1..max_freq`` (period = ``n_span / k`` buckets), where
    ``c_k = Σ (v−v̄)·cos θ``, ``s_k = Σ (v−v̄)·sin θ`` and
    ``θ = 2π·((k·t) mod n_span)/n_span``.  The quantitative sequel to
    the ACF fingerprint: the argmax row says WHICH period dominates
    (hourly series with a daily cycle → peak at period 24), feeding
    ``season`` for decompose/naive_forecast without eyeballing lags.

    Cross-engine determinism (hash-oracle rules): the bucket index
    ``t = (ts − min_ts)/interval`` and the angle numerator
    ``(k·t) mod n_span`` are exact integers, so both engines hand
    bit-identical doubles to ``cos``/``sin``; the centering mean is a
    DECIMAL-exact sum (order-independent); and c/s are rounded at
    ``round_dp`` BEFORE squaring so the power is computed from
    identical inputs on both sides.  Missing buckets simply
    contribute no term (t comes from the timestamp, not a row
    number), and ``n_span`` counts the full span so periods stay
    calendar-true on sparse series.

    Shape: one window pass for the per-key span/mean (rides the
    ``by`` partitioning), an EXPLODE of a max_freq-literal array
    (×max_freq fan-out of an already aggregated, |buckets|-sized
    frame), one groupBy(key, k).  Cost is bucket-count-bound.
    """
    import math

    _need(df, ts_col, value_col, *by)
    if interval <= 0:
        raise errors.Invalid(f"interval must be > 0, got {interval}")
    if max_freq < 1:
        raise errors.Invalid(f"max_freq must be >= 1, got {max_freq}")
    by = list(by)
    w = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    v = F.col(value_col).cast("double")
    base = df.select(
        *by,
        F.col(ts_col).cast("long").alias("__ts"),
        v.alias("__v"),
        F.min(F.col(ts_col).cast("long")).over(w).alias("__t0"),
        F.max(F.col(ts_col).cast("long")).over(w).alias("__t1"),
        (F.sum(v.cast("decimal(30,12)")).over(w).cast("double")
         / F.count(v).over(w)).alias("__mean"),
        F.count(v).over(w).alias("n"),
    ).select(
        *by, "__v", "__mean", "n",
        ((F.col("__ts") - F.col("__t0")) / F.lit(interval))
        .cast("long").alias("__t"),
        ((F.col("__t1") - F.col("__t0")) / F.lit(interval))
        .cast("long").alias("__nspan_m1"),
    ).withColumn("__nspan", F.col("__nspan_m1") + 1)
    ks = F.array(*[F.lit(k) for k in range(1, max_freq + 1)])
    theta = (
        F.lit(2.0 * math.pi)
        * ((F.col("freq").cast("long") * F.col("__t")) % F.col("__nspan"))
        .cast("double") / F.col("__nspan").cast("double"))
    terms = base.select(
        *by, "__v", "__mean", "n", "__t", "__nspan",
        F.explode(ks).alias("freq"),
    ).select(
        *by, "freq", "n", "__nspan",
        ((F.col("__v") - F.col("__mean")) * F.cos(theta)).alias("__c"),
        ((F.col("__v") - F.col("__mean")) * F.sin(theta)).alias("__s"),
    )
    c = F.round(F.sum("__c"), round_dp)
    s = F.round(F.sum("__s"), round_dp)
    return (
        terms.groupBy(*by, "freq")
        .agg(F.first("n").alias("n"),
             F.first("__nspan").alias("__nspan"),
             (F.round((c * c + s * s) / F.first("n"), round_dp)
              + F.lit(0.0)).alias("power"))
        .select(*by, "freq", "n",
                (F.round(F.col("__nspan").cast("double")
                         / F.col("freq").cast("double"), round_dp)
                 + F.lit(0.0)).alias("period"),
                "power")
    )


# chi-square 95th-percentile critical values, df = 1..30
CHI2_95 = (
    3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067, 15.507,
    16.919, 18.307, 19.675, 21.026, 22.362, 23.685, 24.996, 26.296,
    27.587, 28.869, 30.144, 31.410, 32.671, 33.924, 35.172, 36.415,
    37.652, 38.885, 40.113, 41.337, 42.557, 43.773,
)


def ljung_box(
    df: DataFrame,
    *,
    ts_col: str = "bucket_ts",
    value_col: str = "value",
    by: Sequence[str] = (),
    interval: int,
    max_lag: int,
    round_dp: int = 6,
) -> DataFrame:
    """Ljung–Box whiteness test per key: textbook autocorrelations
    ``r_k = Σ_{t}(v_t−v̄)(v_{t+k}−v̄) / Σ_t(v_t−v̄)²`` (full-series
    mean and denominator — NOT the windowed Pearson the ACF query
    reports) and the cumulative statistic
    ``Q(h) = n(n+2)·Σ_{k≤h} r_k²/(n−k)`` with the χ²(h) 95% critical
    value (exact table for h ≤ 30, Wilson–Hilferty beyond), per lag
    h = 1..max_lag.  The residual
    whiteness gate: run it on a forecaster's residuals — rows with
    ``white = false`` say structure remains and the model underfits.

    Determinism: the centering mean is a DECIMAL-exact sum; each
    ``r_k`` is rounded at ``round_dp`` BEFORE it is squared into Q,
    so both engines accumulate identical summands; pairs match on
    timestamp distance ``k·interval`` (missing buckets pair with
    nothing, documented).

    Shape: one window pass for mean/n/denominator, a max_lag-literal
    explode + equi-join on the shifted bucket key for the numerators
    (the cross_correlation shape), then a cumulative window over
    ≤ max_lag rows per key.  Bucket-count-bound throughout.
    """
    _need(df, ts_col, value_col, *by)
    if interval <= 0:
        raise errors.Invalid(f"interval must be > 0, got {interval}")
    if max_lag < 1:
        raise errors.Invalid(f"max_lag must be >= 1, got {max_lag}")
    by = list(by)
    w = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    v = F.col(value_col).cast("double")
    base = df.select(
        *by,
        F.col(ts_col).cast("long").alias("__ts"),
        v.alias("__v"),
        (F.sum(v.cast("decimal(30,12)")).over(w).cast("double")
         / F.count(v).over(w)).alias("__mean"),
        F.count(v).over(w).alias("n"),
    ).withColumn("__d", F.col("__v") - F.col("__mean"))
    gb = by if by else []
    denom = base.groupBy(*gb) if gb else base.groupBy(F.lit(1).alias("__k1"))
    denom = denom.agg(F.sum(F.col("__d") * F.col("__d")).alias("__ss"),
                      F.first("n").alias("n"))
    lags = F.array(*[F.lit(k) for k in range(1, max_lag + 1)])
    lead = base.select(
        *by, F.col("__ts").alias("__tsb"), F.col("__d").alias("__db"),
        F.explode(lags).alias("lag"),
    ).withColumn(
        "__shift", F.col("__tsb") - F.col("lag").cast("long") * interval)
    cond = F.col("a.__ts") == F.col("b.__shift")
    for k in by:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    num = (
        base.alias("a").join(lead.alias("b"), cond)
        .groupBy(*[F.col(f"a.{k}").alias(k) for k in by]
                 if by else [F.lit(1).alias("__k1")],
                 F.col("b.lag").alias("lag"))
        .agg(F.sum(F.col("a.__d") * F.col("b.__db")).alias("__num"))
    )
    jkeys = by + ["lag"] if by else ["__k1", "lag"]
    j = num.join(denom, by if by else ["__k1"]) \
        .withColumn("r", F.round(F.try_divide(F.col("__num"),
                                              F.col("__ss")), round_dp)
                    + F.lit(0.0))
    ow = (Window.partitionBy(*by) if by else Window.partitionBy("__k1")) \
        .orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    nn = F.col("n").cast("double")
    q = (nn * (nn + 2.0)
         * F.sum(F.col("r") * F.col("r")
                 / (nn - F.col("lag").cast("double"))).over(ow))
    h = F.col("lag").cast("double")
    # Exact χ²(h) 95% points for h ≤ 30 (literal table — the usual
    # max_lag range); Wilson–Hilferty cube approximation beyond
    # (≤0.1% error there, vs 2.5% at h = 1 where the table wins).
    wh = h * F.pow(1.0 - 2.0 / (9.0 * h)
                   + F.lit(1.644854) * F.sqrt(2.0 / (9.0 * h)), 3.0)
    q_crit = F.when(
        F.col("lag") <= 30,
        F.element_at(F.array(*[F.lit(x) for x in CHI2_95]), F.col("lag"))
    ).otherwise(wh)
    out = j.select(
        *by, "lag", "n", "r",
        (F.round(q, round_dp) + F.lit(0.0)).alias("q_stat"),
        (F.round(q_crit, round_dp) + F.lit(0.0)).alias("q_crit"))
    return out.withColumn("white", F.col("q_stat") <= F.col("q_crit"))


def spectral_residual_scores(
    values,
    *,
    ma_window: int = 3,
    round_dp: int = 6,
):
    """Spectral Residual saliency (Ren et al., KDD 2019 — the
    SR half of SR-CNN, usable standalone): log-amplitude spectrum
    minus its moving average isolates the part of the spectrum that
    makes this series UNUSUAL relative to its own smooth background;
    transforming back yields a time-domain saliency map whose peaks
    are the anomalies.  Shared by the distributed operator and its
    replay oracle; the FFT's transcendentals make bit-equality
    across *machines* unguaranteed, so scores round at ``round_dp``
    (the repo's transcendental-parity rule).

    Returns the normalized saliency (S − mean(S)) / mean(S) per
    point, rounded."""
    import numpy as np

    x = np.asarray(values, dtype=np.float64)
    n = int(x.size)
    if n < 4:
        raise errors.Invalid(f"spectral residual needs >= 4 points, got {n}")
    if ma_window < 1:
        raise errors.Invalid("ma_window must be >= 1")
    if np.isnan(x).any():
        raise errors.Invalid(
            "spectral residual input has NaN buckets - fill gaps first")
    spec = np.fft.fft(x)
    amp = np.abs(spec)
    # zero amplitudes (constant series) would take log(0): clamp to a
    # tiny epsilon — their residual is then constant and saliency flat
    log_amp = np.log(np.maximum(amp, 1e-12))
    kernel = np.ones(ma_window) / ma_window
    # centered moving average with edge padding (same length)
    pad = ma_window // 2
    padded = np.concatenate([
        np.full(pad, log_amp[0]), log_amp,
        np.full(ma_window - 1 - pad, log_amp[-1])])
    ma = np.convolve(padded, kernel, mode="valid")
    residual = log_amp - ma
    phase = np.angle(spec)
    sal = np.abs(np.fft.ifft(np.exp(residual + 1j * phase)))
    mean_sal = float(sal.mean())
    if mean_sal <= 0.0:
        return [0.0] * n
    score = (sal - mean_sal) / mean_sal
    return [round(float(s), round_dp) + 0.0 for s in score]


def spectral_residual(
    df: DataFrame,
    *,
    value_col: str = "value",
    ts_col: str = "bucket_ts",
    ma_window: int = 3,
    threshold: float = 3.0,
    by: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Spectral Residual saliency per key over a bucketized series —
    the modern NON-learned anomaly detector beside the learned Donut
    band: no training, one FFT per series, catches point anomalies
    that a global z-score dilutes because saliency is relative to
    the series' own spectral background.

    Keyed applyInPandas (the series is FFT'd whole — bounded by
    time-range/interval, never data volume; same discipline as
    Holt–Winters).  Output: (by..., ts, value, saliency, is_anomaly
    = saliency > threshold)."""
    import pandas as pd
    from pyspark.sql import types as T

    _need(df, ts_col, value_col, *by)
    by = list(by)
    if threshold <= 0:
        raise errors.Invalid("threshold must be positive")
    base = df if by else df.withColumn("__k", F.lit(1))
    gb = by if by else ["__k"]
    by_fields = [f for f in base.schema.fields if f.name in gb]
    ts_field = [f for f in base.schema.fields if f.name == ts_col]
    val_field = [f for f in base.schema.fields if f.name == value_col]
    schema = T.StructType(
        by_fields + ts_field + val_field
        + [T.StructField("saliency", T.DoubleType()),
           T.StructField("is_anomaly", T.BooleanType())]
    )

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        sal = spectral_residual_scores(
            pdf[value_col].to_numpy(dtype="float64"),
            ma_window=ma_window, round_dp=round_dp)
        out = {k: pdf[k] for k in gb}
        out[ts_col] = pdf[ts_col]
        out[value_col] = pdf[value_col]
        out["saliency"] = sal
        out["is_anomaly"] = [s > threshold for s in sal]
        return pd.DataFrame(out)

    res = base.groupBy(*gb).applyInPandas(score, schema=schema)
    return res.drop("__k") if not by else res

def ks_two_sample(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    alpha_c2_e8: int = 184_443_561,
    round_dp: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test between the
    ``value_col`` distributions of two groups — the binning-free
    companion to the PSI drift monitor (PSI needs bins and misses
    what falls between them; KS is sensitive to ANY ECDF gap).

        D = max_v |ECDF_a(v) − ECDF_b(v)|

    computed EXACTLY: per distinct value, the gap numerator
    |cum_a·n_b − cum_b·n_a| is an integer (cross-multiplied
    fractions), and the α-level verdict compares
    D > c(α)·√((n_a+n_b)/(n_a·n_b)) in SQUARED form with c²(α)
    scaled integral (default 1.3581²·10⁸ for α = 0.05):

        D_num² · 10⁸  >  c²ₑ₈ · (n_a+n_b) · n_a · n_b

    — no sqrt, no float boundary; the products exceed int64 so they
    compute in DECIMAL(38,0) (HUGEINT in the DuckDB oracle).

    Scale: one map-side-combined groupBy on distinct values, then
    cumulative windows over the DISTINCT-VALUE frame (bounded by
    value granularity, not row count — the single-partition-window
    case documented in SCALE.md; quantize heavy-tailed continuous
    values upstream if distinct cardinality is unbounded).  Output:
    one row (n_a, n_b, d, reject); ``d`` is rounded for display, the
    decision never rounds.  Empty groups yield NULL d/reject."""
    from pyspark.sql import Window

    _need(df, value_col, group_col)
    if alpha_c2_e8 <= 0:
        raise errors.Invalid("alpha_c2_e8 must be positive")
    base = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([group_a, group_b]))
    g = base.groupBy(value_col).agg(
        F.sum(F.when(F.col(group_col) == group_a, 1)
              .otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col(group_col) == group_b, 1)
              .otherwise(0)).alias("__cb"),
    )
    wcum = Window.orderBy(value_col) \
        .rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    o = g.select(
        F.sum("__ca").over(wcum).alias("__cuma"),
        F.sum("__cb").over(wcum).alias("__cumb"),
        F.sum("__ca").over(wall).alias("__na"),
        F.sum("__cb").over(wall).alias("__nb"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    res = o.agg(
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
        F.max(F.abs(F.col("__cuma") * F.col("__nb")
                    - F.col("__cumb") * F.col("__na")))
        .alias("__dnum"),
    )
    d = F.try_divide(
        F.col("__dnum").cast("double"),
        (F.col("n_a") * F.col("n_b")).cast("double"))
    lhs = (dec(F.col("__dnum")) * dec(F.col("__dnum"))
           * F.lit(100_000_000).cast("decimal(38,0)"))
    rhs = (F.lit(int(alpha_c2_e8)).cast("decimal(38,0)")
           * dec(F.col("n_a") + F.col("n_b"))
           * dec(F.col("n_a")) * dec(F.col("n_b")))
    return res.select(
        "n_a", "n_b",
        (F.round(d, round_dp) + F.lit(0.0)).alias("d"),
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), lhs > rhs)
        .alias("reject"),
    )


def kalman_level(
    df: DataFrame,
    *,
    value_col: str = "value",
    ts_col: str = "bucket_ts",
    by: Sequence[str] = (),
    q_var: float = 0.1,
    r_var: float = 1.0,
    round_dp: int = 6,
) -> DataFrame:
    """Kalman filter for the local-level model — the time-varying
    generalization of the EWMA smoothers: ``x_t = x_{t-1} + w`` (var
    ``q_var``), ``y_t = x_t + v`` (var ``r_var``).  Unlike a fixed-α
    EWMA, the gain ``K_t = P⁻/(P⁻+r)`` ADAPTS: it starts high
    (uncertain level, trust observations) and relaxes toward the
    steady state, so early-series estimates aren't biased by an
    arbitrary smoothing constant.  The per-step variance ``P_t``
    rides along — the filter's own confidence, which no window-algebra
    smoother provides.

    Init: ``x_0 = y_0``, ``P_0 = r_var`` (first observation absorbed
    at measurement noise).  Recursion per step:
    ``P⁻ = P + q;  K = P⁻/(P⁻+r);  x += K·(y−x);  P = (1−K)·P⁻``.

    The recursion is inherently sequential per key, so this is the
    keyed-``applyInPandas`` shape (detect.py's precedent): each key's
    series is bounded by the bucket count, groups filter in parallel,
    nothing touches the driver.  The loop body is scalar IEEE-double
    arithmetic in a fixed order, so a plain-Python replay reproduces
    it bit-for-bit — the oracle strategy.

    Output: (by..., ts, value, level, gain, variance) rounded at
    ``round_dp`` (value passes through unrounded)."""
    import pandas as pd

    _need(df, ts_col, value_col, *by)
    by = list(by)
    if q_var < 0 or r_var <= 0:
        raise errors.Invalid(
            f"need q_var >= 0 and r_var > 0, got {q_var}/{r_var}")
    qv, rv, dp = float(q_var), float(r_var), int(round_dp)
    types = dict(df.dtypes)
    fields = ", ".join(
        [f"{c} {types[c]}" for c in by] + [f"{ts_col} {types[ts_col]}"])
    schema = (f"{fields}, {value_col} double, level double, "
              "gain double, variance double")

    def flt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        lvl, p = None, None
        levels, gains, variances = [], [], []
        for y in pdf[value_col].tolist():
            y = float(y)
            if lvl is None:
                lvl, p, k = y, rv, 1.0
            else:
                p_pred = p + qv
                k = p_pred / (p_pred + rv)
                lvl = lvl + k * (y - lvl)
                p = (1.0 - k) * p_pred
            levels.append(round(lvl, dp))
            gains.append(round(k, dp))
            variances.append(round(p, dp))
        out = pdf[by + [ts_col, value_col]].copy()
        out["level"] = levels
        out["gain"] = gains
        out["variance"] = variances
        return out

    base = df.select(*by, ts_col, F.col(value_col).cast("double")
                     .alias(value_col))
    if by:
        return base.groupBy(*by).applyInPandas(flt, schema=schema)
    return base.groupBy(F.lit(1)).applyInPandas(flt, schema=schema)


def kalman_smooth(
    df: DataFrame,
    *,
    value_col: str = "value",
    ts_col: str = "bucket_ts",
    by: Sequence[str] = (),
    q_var: float = 0.1,
    r_var: float = 1.0,
    round_dp: int = 6,
) -> DataFrame:
    """Rauch–Tung–Striebel smoother for the local-level model — the
    offline companion to :func:`kalman_level`: after the forward
    filter pass, a backward pass revises every estimate with the
    information that arrived AFTER it
    (``x̂_t ← x_t + C_t·(x̂_{t+1} − x_t)``, ``C_t = P_t/(P_t+q)``), so
    mid-series estimates use both past and future — the right tool
    for retrospective gap-fill and level reconstruction, where the
    filter's one-sided lag biases against recent turns.

    Same keyed-``applyInPandas`` shape and bit-replayable scalar IEEE
    loop as the filter; both passes run inside one group call (two
    O(n) sweeps over the bounded per-key series).

    Output: (by..., ts, value, level, smoothed) — ``level`` is the
    forward-filter estimate for comparison, rounded at ``round_dp``."""
    import pandas as pd

    _need(df, ts_col, value_col, *by)
    by = list(by)
    if q_var < 0 or r_var <= 0:
        raise errors.Invalid(
            f"need q_var >= 0 and r_var > 0, got {q_var}/{r_var}")
    qv, rv, dp = float(q_var), float(r_var), int(round_dp)
    types = dict(df.dtypes)
    fields = ", ".join(
        [f"{c} {types[c]}" for c in by] + [f"{ts_col} {types[ts_col]}"])
    schema = (f"{fields}, {value_col} double, level double, "
              "smoothed double")

    def smo(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        ys = [float(y) for y in pdf[value_col].tolist()]
        # forward filter, keeping filtered (x, P) and predicted P
        xs, ps, pred = [], [], []
        lvl, p = None, None
        for y in ys:
            if lvl is None:
                lvl, p = y, rv
                pred.append(None)
            else:
                p_pred = p + qv
                k = p_pred / (p_pred + rv)
                lvl = lvl + k * (y - lvl)
                p = (1.0 - k) * p_pred
                pred.append(p_pred)
            xs.append(lvl)
            ps.append(p)
        # backward RTS pass
        n = len(ys)
        sm = [0.0] * n
        if n:
            sm[n - 1] = xs[n - 1]
            for t in range(n - 2, -1, -1):
                c = ps[t] / (ps[t] + qv) if (ps[t] + qv) > 0 else 0.0
                sm[t] = xs[t] + c * (sm[t + 1] - xs[t])
        out = pdf[by + [ts_col, value_col]].copy()
        out["level"] = [round(x, dp) for x in xs]
        out["smoothed"] = [round(x, dp) for x in sm]
        return out

    base = df.select(*by, ts_col, F.col(value_col).cast("double")
                     .alias(value_col))
    if by:
        return base.groupBy(*by).applyInPandas(smo, schema=schema)
    return base.groupBy(F.lit(1)).applyInPandas(smo, schema=schema)
