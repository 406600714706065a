"""As-of join — point-in-time enrichment.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` (backward direction), optionally per key and
within a tolerance.  The classic time-series operator Spark's join
vocabulary lacks (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
semantics); needed for feature backfills ("the quote in effect at
trade time", "the config active when the event fired").

Scale design: implemented as a UNION + ordered window forward-fill,
NOT a range theta-join —

1. tag both inputs and union them (right rows carry the payload
   columns, left rows carry nulls there);
2. one shuffle on the key columns orders each key's timeline once;
3. each right row is packed into ONE ``struct(ts, payload…)`` and a
   single ``last(struct, ignorenulls)`` over ``(key) ORDER BY
   (ts, tag)`` forward-fills the latest right ROW (not each column
   independently) onto every subsequent left row — right rows sort
   BEFORE left rows at equal ts, making the match inclusive, and
   NULLs inside the newest matching row are preserved as-is instead
   of leaking values from older rows;
4. keep only left rows; enforce ``tolerance`` by also filling the
   matched right timestamp and nulling the payload where
   ``left.ts − right.ts > tolerance``.

One shuffle total (on the by-keys), window over each key's timeline —
the same cost class as any keyed aggregation, no nested-loop range
join at any scale.  Without ``by`` the window is global (single
ordered partition): correct, but pass keys at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from loudml_spark import errors


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: Sequence[str] = (),
    tolerance: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join (backward, inclusive): every left row plus the
    payload of the latest right row with ``right[on] <= left[on]``
    (same ``by`` keys), or nulls if none (or none within
    ``tolerance``, expressed in the same units as the ``on`` column).

    Payload = every right column except ``on``/``by``; name clashes
    with left columns get ``suffix``.  Adds ``__asof_ts``: the matched
    right timestamp (null when unmatched).
    """
    by = list(by)
    for col in (on, *by):
        if col not in left.columns:
            raise errors.Invalid(f"left side is missing column {col!r}")
        if col not in right.columns:
            raise errors.Invalid(f"right side is missing column {col!r}")
    payload = [c for c in right.columns if c not in (on, *by)]
    if not payload:
        raise errors.Invalid("right side has no payload columns")
    renames = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }

    # Pack the whole right row into ONE struct so the forward-fill
    # picks an entire row atomically — filling columns independently
    # would mix payload from different right rows whenever the newest
    # one holds a NULL (merge_asof attaches the row, NULLs included).
    r = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("__tag"),  # right rows first at equal ts
        F.struct(
            F.col(on).alias("__asof_ts"),
            *[F.col(c).alias(renames[c]) for c in payload],
        ).alias("__pack"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns
          if c not in (on, *by)],
    )
    l_payload = [c for c in left.columns if c not in (on, *by)]
    lf = left.select(
        *by,
        F.col(on).alias(on),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__pack"].dataType).alias("__pack"),
        *[F.col(c).alias(f"__l_{c}") for c in l_payload],
    )
    unioned = r.unionByName(lf)
    w = (
        Window.partitionBy(*by).orderBy(on, "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
        if by else
        Window.orderBy(on, "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "__pack", F.last(F.col("__pack"), ignorenulls=True).over(w))
    out = filled.filter(F.col("__tag") == 1).drop("__tag")
    if tolerance is not None:
        stale = (
            (F.col(on) - F.col("__pack.__asof_ts")) > F.lit(tolerance)
        )
        miss = F.col("__pack").isNull() | stale
        out = out.withColumn(
            "__pack",
            F.when(miss, F.lit(None).cast(r.schema["__pack"].dataType))
            .otherwise(F.col("__pack")),
        )
    # restore original left column names
    for c in l_payload:
        out = out.withColumnRenamed(f"__l_{c}", c)
    return out.select(
        *by, on, *l_payload,
        F.col("__pack.__asof_ts").alias("__asof_ts"),
        *[F.col(f"__pack.{renames[c]}").alias(renames[c])
          for c in payload],
    )
