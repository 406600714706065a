"""Deterministic dataset splitting / sampling for training pipelines.

``randomSplit`` is non-reproducible across runs, partitionings, and
engines; training-data curation needs splits that are (a) stable under
re-runs and repartitions, (b) a pure function of CONTENT, so a
near-duplicate-cleaned corpus keeps each document on a fixed side of
the train/eval fence even as unrelated rows come and go, and (c)
expressible in ANSI SQL for cross-engine verification.

Everything here derives from an int64 hash column the caller supplies
(typically the portable rolling-hash fingerprint from
``pipeline.text.rolling_hash_col`` — content-based — or an id-derived
hash).  Assignment is ``pmod(hash, 10_000)`` against cumulative
weight thresholds: pure Column arithmetic, zero shuffles — a 100 TB
split is a metadata-only map stage that Catalyst can collapse into
the scan's projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loudml_spark import errors

SPLIT_MOD = 10_000


def split_bucket(key: Column) -> Column:
    """Stable bucket in [0, SPLIT_MOD) from an int64 hash column."""
    return F.pmod(key, F.lit(SPLIT_MOD))


def hash_split(
    df: DataFrame,
    *,
    key: Column,
    weights: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label with proportions ``weights``
    (name → fraction, summing to 1), deterministically from ``key``.

    Rows land by cumulative threshold: with ``{"train": .8,
    "val": .1, "test": .1}``, buckets [0, 8000) → train,
    [8000, 9000) → val, [9000, 10000) → test.  Insertion order of
    ``weights`` fixes the layout — keep it stable across runs.
    """
    if not weights:
        raise errors.Invalid("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise errors.Invalid(f"weights must sum to 1, got {total}")
    bucket = split_bucket(key)
    expr = None
    acc = 0.0
    for name, frac in weights.items():
        if frac < 0:
            raise errors.Invalid(f"negative weight for {name!r}")
        acc += frac
        hi = int(round(acc * SPLIT_MOD))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else \
            expr.when(cond, name)
    # float-accumulation guard: the last threshold is exactly SPLIT_MOD
    # by the sum check, but keep an otherwise for bullet-proofing
    last = list(weights)[-1]
    return df.withColumn(split_col, expr.otherwise(last))


def deterministic_sample(
    df: DataFrame,
    *,
    key: Column,
    fraction: float,
) -> DataFrame:
    """Keep a stable ~``fraction`` of rows: ``pmod(key, 10000) <
    fraction·10000``.  Unlike ``df.sample``, re-runs, repartitions,
    and other engines (same SQL) select the SAME rows."""
    if not (0.0 < fraction <= 1.0):
        raise errors.Invalid("fraction must be in (0, 1]")
    return df.filter(split_bucket(key) < F.lit(int(round(
        fraction * SPLIT_MOD))))
