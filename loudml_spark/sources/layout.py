"""Output-layout control — the small-files / giant-files problem.

A 1000-executor job that writes per-task produces hundreds of
thousands of files per run (each costing a namenode op and a scan
task downstream); a blind coalesce(1) produces one unsplittable
monster.  ``write_partitioned`` lands data date/key-partitioned with
bounded file sizes:

* ``partition_by`` → hive-style directory partitions, the pruning
  axis for every later time-range scan (SCALE.md: "the scan reads
  days, not the decade");
* rows are repartitioned by the partition columns first, so each
  directory is written by few tasks (no cross-product of
  tasks × partitions small files);
* ``max_records_per_file`` caps file size from above — oversized
  partitions split into several files instead of one giant.

The target is ~100–500 MB per parquet file: big enough to amortize
footer/rowgroup overhead, small enough to split work evenly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from loudml_spark import errors


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str],
    max_records_per_file: int,
    mode: str = "append",
    format: str = "parquet",
) -> None:
    """Write ``df`` under ``path`` as
    ``<path>/<col>=<value>/part-*.<format>`` with at most
    ``max_records_per_file`` rows per file."""
    partition_by = list(partition_by)
    if not partition_by:
        raise errors.Invalid("need at least one partition column")
    for col in partition_by:
        if col not in df.columns:
            raise errors.Invalid(f"missing partition column {col!r}")
    if max_records_per_file < 1:
        raise errors.Invalid("max_records_per_file must be >= 1")
    (
        df.repartition(*[F.col(c) for c in partition_by])
        .write.format(format)
        .mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .save(path)
    )


def day_col(ts_col: str, *, ts_scale: int = 10**9):
    """Partition column helper: epoch day (UTC) from an integer time
    column in units of ``1/ts_scale`` seconds — integer floor
    division, exact for ns epochs."""
    step = 86400 * ts_scale
    return F.expr(
        f"(`{ts_col}` - pmod(`{ts_col}`, {step}L)) div {step}L"
    ).cast("long")
