"""localCheckpoint block-lifecycle helpers for iterative operators.

``DataFrame.localCheckpoint`` pins its materialized blocks in the
block manager with no public handle to release them —
``df.unpersist()`` only targets ``persist()``-ed plans.  Iterative
operators (pagerank's power iteration, dedup_clusters' star
contraction) supersede a checkpoint every round; without explicit
release each superseded copy stays pinned until JVM GC happens to
collect the wrapping RDD, i.e. block-manager storage grows
O(n_iter) instead of O(1).  At web-graph node counts with
``n_iter=25`` that is ~25 pinned node-frame copies.

:func:`release_checkpoint` reaches the exact RDD backing a
checkpointed frame through its analyzed plan (a ``LogicalRDD``
node) and unpersists it — precise, no registry diffing, and it can
never touch some other operator's persisted cache.

SAFETY CONTRACT: a localCheckpoint truncates lineage, so a released
checkpoint CANNOT be recomputed — any later action on a frame that
still scans it fails with a missing-block error.  Only release a
checkpoint once every frame derived from it has either been
superseded by a newer *materialized* checkpoint or will never be
acted on again.  Measured evidence: ``tools/checkpoint_evidence.py``
(pagerank at n_iter=25: pinned copies n_iter+1 → ≤ 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_checkpoint(df: DataFrame | None, blocking: bool = False) -> bool:
    """Drop the pinned blocks of a ``localCheckpoint``-ed frame.

    Returns True when a backing RDD was found and unpersisted, False
    for None / non-checkpointed frames (the analyzed plan is not a
    bare ``LogicalRDD``) — callers can pass their loop variable
    unconditionally and the first, un-checkpointed iteration is a
    no-op.  See the module docstring for when release is safe.
    """
    if df is None:
        return False
    try:
        plan = df._jdf.queryExecution().analyzed()
        if not plan.getClass().getName().endswith(".LogicalRDD"):
            return False
        plan.rdd().unpersist(blocking)
        return True
    except Exception:
        # py4j surface changed or the session is gone — a leaked
        # block is strictly better than failing the operator
        return False


def pinned_rdd_count(spark) -> int:
    """Number of RDDs currently holding blocks in the block manager
    (cached OR local-checkpointed) — the storage-leak probe used by
    tests and tools/checkpoint_evidence.py."""
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
