"""Data-quality validation: declarative expectation checks that
compile to aggregates, not row scans in a driver loop.

The intake gate of every pipeline run ("did yesterday's load break
the invariants?") expressed as rules over a frame:

* ``not_null(col)``        — no NULLs
* ``unique(cols...)``      — no duplicate keys
* ``in_range(col, lo, hi)``— values within [lo, hi] (NULLs don't
  count as violations; pair with not_null to forbid them)
* ``foreign_key(cols, ref_df, ref_cols)`` — every non-null key
  exists in the reference table (LEFT join + conditional count —
  one plan, broadcast-eligible when the reference is a dim)
* ``expect(name, condition)`` — arbitrary boolean Column; violations
  are rows where the condition is FALSE or NULL

``validate(df, rules)`` returns one audit row per rule:
``(rule, n_checked, n_violations, passed)`` — a frame, so audits
land in tables, drive alerts, and diff across runs like any other
data.  Row-local rules fuse into ONE aggregation pass over the
frame (a conditional sum per rule — adding a rule adds a column,
not a scan); unique/foreign-key rules each contribute their own
aggregate/anti-join subplan and union in.

No reference counterpart (loudml validates configs via voluptuous
schemas, loudml/model.py — this is the data-side analogue the brief's
pipeline needs).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loudml_spark import errors

__all__ = ["not_null", "unique", "in_range", "foreign_key", "expect",
           "validate", "benford_digits"]


@dataclass(frozen=True)
class _Rule:
    name: str
    kind: str
    cols: tuple = ()
    cond: object = None          # Column for row-local rules
    ref: object = None           # DataFrame for foreign_key
    ref_cols: tuple = ()
    params: dict = field(default_factory=dict)


def not_null(col: str) -> _Rule:
    return _Rule(name=f"not_null({col})", kind="row",
                 cols=(col,), cond=F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> _Rule:
    c = F.col(col)
    return _Rule(
        name=f"in_range({col},{lo},{hi})", kind="row", cols=(col,),
        cond=c.isNull() | ((c >= F.lit(lo)) & (c <= F.lit(hi))))


def expect(name: str, condition: Column) -> _Rule:
    return _Rule(name=f"expect({name})", kind="row", cond=condition)


def unique(*cols: str) -> _Rule:
    if not cols:
        raise errors.Invalid("unique() needs at least one column")
    return _Rule(name=f"unique({','.join(cols)})", kind="unique",
                 cols=tuple(cols))


def foreign_key(cols, ref: DataFrame, ref_cols) -> _Rule:
    cols = (cols,) if isinstance(cols, str) else tuple(cols)
    ref_cols = (ref_cols,) if isinstance(ref_cols, str) \
        else tuple(ref_cols)
    if len(cols) != len(ref_cols) or not cols:
        raise errors.Invalid("foreign_key needs matching key lists")
    return _Rule(
        name=f"foreign_key({','.join(cols)}->{','.join(ref_cols)})",
        kind="fk", cols=cols, ref=ref, ref_cols=ref_cols)


def validate(df: DataFrame, rules: Sequence[_Rule]) -> DataFrame:
    """Run the rules; returns ``(rule, n_checked, n_violations,
    passed)`` — deterministic row order by rule name via a final
    sort (the frame is |rules| rows)."""
    if not rules:
        raise errors.Invalid("no rules given")
    for r in rules:
        for c in r.cols:
            if c not in df.columns:
                raise errors.Invalid(
                    f"rule {r.name!r}: missing column {c!r}")
    frames = []
    row_rules = [r for r in rules if r.kind == "row"]
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, r in enumerate(row_rules):
            ok = r.cond
            aggs.append(F.sum(
                F.when(ok.isNull() | ~ok, 1).otherwise(0)
            ).alias(f"__v{i}"))
        one = df.agg(*aggs)
        stack = F.explode(F.array(*[
            F.struct(F.lit(r.name).alias("rule"),
                     F.col(f"__v{i}").alias("__viol"))
            for i, r in enumerate(row_rules)])).alias("__x")
        frames.append(one.select(F.col("__n"), stack).select(
            F.col("__x.rule").alias("rule"),
            F.col("__n").cast("long").alias("n_checked"),
            F.coalesce(F.col("__x.__viol"), F.lit(0)).cast("long")
            .alias("n_violations")))
    for r in rules:
        if r.kind == "unique":
            keys = [F.col(c) for c in r.cols]
            grp = df.groupBy(*keys).agg(F.count("*").alias("__c"))
            frames.append(grp.agg(
                F.lit(r.name).alias("rule"),
                F.coalesce(F.sum("__c"), F.lit(0)).cast("long")
                .alias("n_checked"),
                F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
                .cast("long").alias("n_violations")))
        elif r.kind == "fk":
            keyed = df.select(
                *[F.col(c) for c in r.cols]).na.drop()
            ref = r.ref.select(
                *[F.col(rc).alias(c)
                  for c, rc in zip(r.cols, r.ref_cols)]).distinct() \
                .withColumn("__hit", F.lit(1))
            # LEFT join + conditional count, not anti-join + cross
            # join of scalar aggregates (which plans a nested loop)
            joined = keyed.join(ref, list(r.cols), "left")
            frames.append(joined.agg(
                F.lit(r.name).alias("rule"),
                F.count(F.lit(1)).cast("long").alias("n_checked"),
                F.coalesce(
                    F.sum(F.when(F.col("__hit").isNull(), 1)
                          .otherwise(0)), F.lit(0)).cast("long")
                .alias("n_violations")))
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out.withColumn(
        "passed", F.col("n_violations") == 0).orderBy("rule")


# χ² 95th percentile, 8 degrees of freedom (9 digits − 1)
BENFORD_CHI2_CRIT = 15.507
# p(d) = log10(1 + 1/d), computed once so Spark lit() and the SQL
# oracle inline the IDENTICAL doubles
BENFORD_P = tuple(math.log10(1.0 + 1.0 / d) for d in range(1, 10))


def benford_digits(
    df: DataFrame,
    value_col: str,
    *,
    by: str | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Benford's-law first-digit conformance — the classic
    fabricated/corrupted-numbers screen (naturally occurring
    multi-magnitude quantities put digit d first with probability
    log10(1+1/d); fraud, unit mix-ups, and truncation bend that
    curve).  Returns one row per ``by`` group:
    ``(by?, n, chi2, conforms)`` where chi2 is Pearson's statistic
    against the Benford expectation over digits 1–9 and ``conforms``
    compares it to the χ²₈ 95% critical value.

    Scale shape: ONE aggregation pass, no joins — the 9 digit counts
    are conditional sums inside the same groupBy (adding a digit adds
    a column, not a scan), so cost is a scan plus a |groups|-row
    shuffle at any corpus size.

    Cross-engine determinism: the first significant digit comes from
    ``substring(format_string('%.16e', abs(v)), 1, 1)`` — at 17
    significant digits the mantissa's first digit cannot be changed
    by the formatter's rounding (the nearest double below a power of
    ten is 2 ulps of mantissa away from all-nines), and the same
    printf exists verbatim in DuckDB; digit counts and N are exact
    integers, the Benford probabilities are shared literal doubles,
    and each digit's χ² term rounds at ``round_dp`` before a
    DECIMAL sum.  Zero and NULL values carry no first digit and are
    excluded (they are not_null/in_range territory).
    """
    if value_col not in df.columns:
        raise errors.Invalid(f"missing value column {value_col!r}")
    if by is not None and by not in df.columns:
        raise errors.Invalid(f"missing group column {by!r}")
    v = F.col(value_col)
    src = df.filter(v.isNotNull() & (v != 0))
    digit = F.substring(F.format_string("%.16e", F.abs(v)), 1, 1)
    keys = [by] if by else []
    counts = [
        F.sum(F.when(digit == str(d), 1).otherwise(0))
        .cast("long").alias(f"__n{d}")
        for d in range(1, 10)
    ]
    agg = src.groupBy(*keys).agg(F.count("*").alias("n"), *counts)
    terms = []
    for d in range(1, 10):
        exp_n = F.col("n").cast("double") * F.lit(BENFORD_P[d - 1])
        obs = F.col(f"__n{d}").cast("double")
        terms.append(
            F.round((obs - exp_n) * (obs - exp_n) / exp_n, round_dp)
            .cast("decimal(28,6)"))
    chi2 = (
        F.round(
            sum(terms[1:], terms[0]).cast("double"), round_dp)
        + F.lit(0.0))
    return agg.select(*keys, "n", chi2.alias("chi2")).select(
        *keys, "n", "chi2",
        (F.col("chi2") <= F.lit(BENFORD_CHI2_CRIT)).alias("conforms"))
