"""SCD2 history construction — versioned validity ranges from a
change log.

The warehouse-standard "slowly changing dimension type 2" shape:
given an append-only stream of (key, attributes, timestamp) updates,
produce one row per VERSION with ``valid_from`` / ``valid_to``
(null = still current), collapsing consecutive updates that did not
change the tracked attributes.  The reference's annotation tombstone
flow (/root/reference/loudml/bucket.py:255-277 delete+reinsert) is
the degenerate single-version case; this is the general one every
training-data pipeline needs to answer "what did this dimension look
like AS OF the example's timestamp" (pairs with operators/asof.py).

Scale design: ONE shuffle on the key columns; change detection
(lag), version collapse (filter), and range assignment (lead) are
three window expressions over the same partitioning — no joins, no
driver-side state.  Ties on the timestamp are broken by
``order_col`` so version order is deterministic and
engine-independent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from loudml_spark import errors


def scd2_from_changelog(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    order_col: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Collapse a change log into SCD2 version rows.

    A new version starts at the key's first update and at every
    update where ANY attribute differs from the previous update
    (null-safe comparison).  ``valid_from`` is the version's first
    timestamp; ``valid_to`` is the next version's start (null for
    the open version).  Output: key_cols + attr_cols + validity
    range + ``version`` (1-based per key).
    """
    key_cols, attr_cols = list(key_cols), list(attr_cols)
    if not key_cols or not attr_cols:
        raise errors.Invalid("key_cols and attr_cols must be non-empty")
    for c in (*key_cols, *attr_cols, ts_col,
              *( [order_col] if order_col else [] )):
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")
    order = [ts_col] + ([order_col] if order_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        # null-safe inequality: a change to/from null is a change
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.row_number().over(w) == 1
    starts = (
        df.withColumn("__new", first | changed)
        .filter(F.col("__new"))
        .drop("__new")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        starts
        .withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lead(F.col(ts_col)).over(w2))
        .withColumn("version", F.row_number().over(w2))
        .drop(ts_col, *( [order_col] if order_col else [] ))
    )
