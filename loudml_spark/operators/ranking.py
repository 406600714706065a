"""Ranking operators — top-k / bottom-k.

The reference's only ranking-shaped op is PromQL ``topk``/``bottomk``
(loudml/prometheus.py:65-66).  Here it generalizes: top-k rows per
group by an ordering expression, with a total tie-break so results
are deterministic (required for oracle comparison and for stable
reruns at scale).

Scale: row_number over (partition, order) is a single shuffle on the
partition keys; with AQE skew handling this holds at 100 TB as long
as the partition key has reasonable cardinality.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k(
    df: DataFrame,
    k: int,
    partition_by: Sequence[str],
    order_by: Sequence,
    *,
    ascending: bool = False,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-k rows per partition.

    ``order_by`` is a list of column names or Columns.  The partition
    keys are constant within a window partition, so they cannot break
    ties — callers MUST pass a unique tie-break column last (e.g. the
    entity id) for full determinism across reruns/partitionings.
    """
    ordering = [
        (F.col(c) if isinstance(c, str) else c) for c in order_by
    ]
    if not ascending:
        ordering = [c.desc() for c in ordering[:1]] + ordering[1:]
    w = Window.partitionBy(*partition_by).orderBy(*ordering)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def bottom_k(df, k, partition_by, order_by, **kw):
    return top_k(df, k, partition_by, order_by, ascending=True, **kw)
