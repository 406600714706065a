"""Isotonic (PAV) score calibration — mapping a raw model/heuristic
score to a MONOTONE probability of a label, the standard calibration
step before a score gates a pipeline (quality → P(keep), anomaly
score → P(incident), LM perplexity → P(human-quality)).

Spark-first shape: calibration never needs row-level data — it needs
the (score-bin → positives, count) table, which is one map-side-
combined aggregation; the pool-adjacent-violators pass then runs on
the BOUNDED bin sequence (10^bin_dp · score-range rows, independent
of corpus size).  That bounded sequential pass is the same
keyed-applyInPandas discipline as Holt–Winters: per calibration key,
O(bins) state, thousands of keys in parallel.

Exactness: positives and counts are integers, so PAV's violator
comparison is done in EXACT integer cross-multiplication
(pos_a·n_b > pos_b·n_a) — no float accumulates anywhere until the
single final division per pooled block.  The fitted curve is
therefore bit-identical across partitionings and engines, and the
oracle replays the identical function on the DuckDB-aggregated bins.

No counterpart in the reference (loudml's scores are used raw); this
is §2-EXT pipeline surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from loudml_spark import errors


def pav_fit(pos: Sequence[int], n: Sequence[int]) -> list[float]:
    """Weighted pool-adjacent-violators over binned Bernoulli data:
    given per-bin positive counts ``pos`` and totals ``n`` in
    ascending score order, return the non-decreasing fitted rate per
    bin.  All pooling and violator checks are exact integer
    arithmetic; each output is one division of pooled integers."""
    if len(pos) != len(n):
        raise errors.Invalid("pos and n must have equal length")
    if any(c <= 0 for c in n):
        raise errors.Invalid("bin counts must be positive")
    if any(p < 0 or p > c for p, c in zip(pos, n)):
        raise errors.Invalid("positives must be within [0, count]")
    # blocks of (pooled_pos, pooled_n, span)
    blocks: list[list[int]] = []
    for p, c in zip(pos, n):
        blocks.append([int(p), int(c), 1])
        # merge while the previous block's rate exceeds the last's:
        # pos_a/n_a > pos_b/n_b  <=>  pos_a*n_b > pos_b*n_a (n > 0)
        while len(blocks) > 1 and (
                blocks[-2][0] * blocks[-1][1]
                > blocks[-1][0] * blocks[-2][1]):
            p2, c2, s2 = blocks.pop()
            blocks[-1][0] += p2
            blocks[-1][1] += c2
            blocks[-1][2] += s2
    out: list[float] = []
    for p, c, s in blocks:
        out.extend([p / c] * s)
    return out


def isotonic_calibrate(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    bin_dp: int = 2,
    by: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Fit an isotonic calibration curve of ``label_col`` (boolean)
    against ``score_col`` per ``by`` key.  Scores bin at ``bin_dp``
    decimals (the binning IS the scale story: the PAV pass sees
    #bins rows, never the corpus); NULL scores and NULL labels are
    excluded from the fit (count them upstream if that is a signal).

    Output per (key, bin): ``n``, ``pos``, ``rate`` (raw pos/n) and
    ``fitted`` (the monotone calibrated probability).  ``fitted`` is
    non-decreasing in ``bin`` within every key — the defining
    property, pinned by tests.

    Binning is ``floor(score·10^dp)/10^dp``, NOT round: ROUND's
    half-way tie rule differs between engines (Spark HALF_UP vs
    DuckDB's multiply-based rounding) and a single tied score moves
    a row across bins, changing n/pos/fitted — measured at sf0.1.
    floor of the identical IEEE product is bit-portable."""
    import pandas as pd
    from pyspark.sql import types as T

    for c in (score_col, label_col, *by):
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")
    if bin_dp < 0:
        raise errors.Invalid("bin_dp must be >= 0")
    by = list(by)
    scale = 10 ** bin_dp
    base = (
        df.filter(F.col(score_col).isNotNull()
                  & F.col(label_col).isNotNull())
        .select(*by,
                (F.floor(F.col(score_col) * F.lit(float(scale)))
                 / F.lit(float(scale))).alias("bin"),
                F.col(label_col).cast("int").alias("__y"))
    )
    if not by:
        base = base.withColumn("__k", F.lit(1))
    gb = by if by else ["__k"]
    bins = base.groupBy(*gb, "bin").agg(
        F.count("*").alias("n"),
        F.sum("__y").alias("pos"),
    )
    by_fields = [f for f in bins.schema.fields if f.name in gb]
    schema = T.StructType(
        by_fields
        + [T.StructField("bin", T.DoubleType()),
           T.StructField("n", T.LongType()),
           T.StructField("pos", T.LongType()),
           T.StructField("rate", T.DoubleType()),
           T.StructField("fitted", T.DoubleType())]
    )

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("bin").reset_index(drop=True)
        pos = [int(v) for v in pdf["pos"]]
        n = [int(v) for v in pdf["n"]]
        fitted = pav_fit(pos, n)
        out = {k: pdf[k] for k in gb}
        out["bin"] = pdf["bin"]
        out["n"] = pdf["n"]
        out["pos"] = pdf["pos"]
        out["rate"] = [round(p / c, round_dp) + 0.0
                       for p, c in zip(pos, n)]
        out["fitted"] = [round(v, round_dp) + 0.0 for v in fitted]
        return pd.DataFrame(out)

    res = bins.groupBy(*gb).applyInPandas(fit, schema=schema)
    return res.drop("__k") if not by else res


def binary_auc(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    by: Sequence[str] = (),
    bin_dp: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` against boolean ``label_col``
    per key, via the Mann–Whitney rank identity with tie-averaged
    ranks:

        AUC = (Σ_{i∈pos} rank_i − P(P+1)/2) / (P·N)

    computed over the (distinct score → count, positives) table so
    every intermediate is an INTEGER: the tie-averaged rank of a
    distinct-score group enters as 2·rank = 2·cum_before + c + 1,
    and only the final ratio divides.  Bit-portable by construction
    — no float comparison, no interpolation.

    Scale: the rank prefix-sum is a window over DISTINCT scores per
    key.  Heuristic scores with bounded granularity (integer-count
    ratios, binned probabilities) keep that small; for continuous
    scores pass ``bin_dp`` to floor-bin first (documented
    approximation — AUC of the binned score), which bounds the
    window at 10^bin_dp·range rows.  NULL scores/labels are
    excluded.  Output per key: (n_pos, n_neg, auc); degenerate keys
    (no positives or no negatives) yield NULL auc via try_divide."""
    from pyspark.sql import Window

    for c in (score_col, label_col, *by):
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")
    by = list(by)
    score = F.col(score_col)
    if bin_dp is not None:
        if bin_dp < 0:
            raise errors.Invalid("bin_dp must be >= 0")
        scale = float(10 ** bin_dp)
        score = F.floor(score * F.lit(scale)) / F.lit(scale)
    base = (
        df.filter(F.col(score_col).isNotNull()
                  & F.col(label_col).isNotNull())
        .select(*by, score.alias("__s"),
                F.col(label_col).cast("long").alias("__y"))
    )
    if not by:
        base = base.withColumn("__k", F.lit(1))
    gb = by if by else ["__k"]
    g = base.groupBy(*gb, "__s").agg(
        F.count("*").alias("__c"), F.sum("__y").alias("__p"))
    w = Window.partitionBy(*gb).orderBy("__s") \
        .rowsBetween(Window.unboundedPreceding, -1)
    o = g.withColumn("__cb", F.coalesce(F.sum("__c").over(w), F.lit(0)))
    agg = o.groupBy(*gb).agg(
        F.sum("__p").alias("n_pos"),
        (F.sum("__c") - F.sum("__p")).alias("n_neg"),
        F.sum(F.col("__p")
              * (2 * F.col("__cb") + F.col("__c") + 1))
        .alias("__2rp"),
    )
    auc = F.try_divide(
        (F.col("__2rp") - F.col("n_pos") * (F.col("n_pos") + 1))
        .cast("double"),
        (2 * F.col("n_pos") * F.col("n_neg")).cast("double"))
    out = agg.select(
        *gb, "n_pos", "n_neg",
        (F.round(auc, round_dp) + F.lit(0.0)).alias("auc"))
    return out.drop("__k") if not by else out


def calibration_error(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    bin_dp: int = 1,
    by: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Expected / maximum calibration error of a probability-like
    score against a boolean label:

        ECE = Σ_b (n_b/N) · |rate_b − mean_score_b|
        MCE = max_b       |rate_b − mean_score_b|

    over ``bin_dp``-decimal floor bins.  Everything is exact integer
    arithmetic until one final division: scores quantize to
    MICRO-UNITS (floor(score·10⁶), an int64), so
    |rate_b − mean_score_b|·n_b = |pos_b·10⁶ − Σ micro_b| / 10⁶ is an
    integer numerator — no float accumulation, bit-portable across
    engines and partitionings.  The 10⁻⁶ quantization bias is two
    orders below the reported precision.  NULL scores/labels are
    excluded.  Output per key: (n, ece, mce)."""
    for c in (score_col, label_col, *by):
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")
    if bin_dp < 0:
        raise errors.Invalid("bin_dp must be >= 0")
    by = list(by)
    scale = float(10 ** bin_dp)
    micro = F.floor(F.col(score_col) * F.lit(1_000_000.0))
    base = (
        df.filter(F.col(score_col).isNotNull()
                  & F.col(label_col).isNotNull())
        .select(*by,
                (F.floor(F.col(score_col) * F.lit(scale))
                 / F.lit(scale)).alias("__b"),
                micro.alias("__m"),
                F.col(label_col).cast("long").alias("__y"))
    )
    if not by:
        base = base.withColumn("__k", F.lit(1))
    gb = by if by else ["__k"]
    bins = base.groupBy(*gb, "__b").agg(
        F.count("*").alias("__n"),
        F.sum("__y").alias("__p"),
        F.sum("__m").alias("__sm"),
    )
    gap = F.abs(F.col("__p") * F.lit(1_000_000) - F.col("__sm"))
    agg = bins.groupBy(*gb).agg(
        F.sum("__n").alias("n"),
        F.sum(gap).alias("__gapsum"),
        F.max(gap / (F.col("__n") * F.lit(1_000_000.0)))
        .alias("__mce"),
    )
    r6 = lambda c: F.round(c, round_dp) + F.lit(0.0)  # noqa: E731
    out = agg.select(
        *gb, "n",
        r6(F.col("__gapsum")
           / (F.col("n") * F.lit(1_000_000.0))).alias("ece"),
        r6(F.col("__mce")).alias("mce"),
    )
    return out.drop("__k") if not by else out
