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


def compact_partitions(
    spark,
    path: str,
    *,
    partition_by: Sequence[str],
    max_records_per_file: int,
    partitions: dict | None = None,
    sort_by: Sequence[str] = (),
    format: str = "parquet",
) -> int:
    """Small-file compaction — the maintenance job every streaming or
    micro-batch ingest needs: each micro-batch lands a few small
    files per partition, and a month later a scan of one day opens
    thousands of them.  Rewrites the targeted partitions into few
    bounded-size files (optionally ``sort_by``-clustered inside each
    file, so min/max rowgroup pruning works on those columns).

    ``partitions``: {col: value} filter selecting WHICH partitions to
    compact (None = whole table — only for bounded tables; a 100 TB
    maintenance job compacts yesterday's partitions, not the
    decade).  Partition pruning makes the read touch only those
    directories.  Returns the number of rows rewritten.

    Staged safely: the rewrite lands in ``<path>__compact_tmp`` and
    replaces the target directory only after a successful write —
    a crash mid-compact leaves the original data intact.  (On a real
    deployment prefer table formats with transactional rewrite; this
    is the plain-parquet fallback.)
    """
    import shutil

    partition_by = list(partition_by)
    if not partition_by:
        raise errors.Invalid("need at least one partition column")
    df = spark.read.format(format).load(path)
    target = df
    if partitions:
        for col, val in partitions.items():
            if col not in partition_by:
                raise errors.Invalid(
                    f"{col!r} is not a partition column")
            target = target.filter(F.col(col) == F.lit(val))
    if sort_by:
        target = target.repartition(
            *[F.col(c) for c in partition_by]
        ).sortWithinPartitions(*[F.col(c) for c in sort_by])
    n = target.count()
    tmp = path.rstrip("/") + "__compact_tmp"
    write_partitioned(
        target, tmp, partition_by=partition_by,
        max_records_per_file=max_records_per_file,
        mode="overwrite", format=format,
    )
    # swap in the compacted partitions
    import os

    if partitions:
        # replace only the targeted partition directories
        def subdir(base):
            parts = [f"{c}={partitions[c]}" for c in partition_by
                     if c in partitions]
            return os.path.join(base, *parts)

        dst, src = subdir(path), subdir(tmp)
        shutil.rmtree(dst, ignore_errors=True)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.move(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        keep = os.path.join(os.path.dirname(path.rstrip("/")),
                            ".__compact_old")
        shutil.rmtree(keep, ignore_errors=True)
        shutil.move(path, keep)
        shutil.move(tmp, path)
        shutil.rmtree(keep, ignore_errors=True)
    return n


def upsert_partitions(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str],
    max_records_per_file: int,
    format: str = "parquet",
) -> None:
    """Idempotent partition-level upsert: REPLACE exactly the
    partitions present in ``df`` (dynamic partition overwrite),
    leaving every other partition untouched — the batch analogue of
    streaming.job.idempotent_parquet_sink, and the correct shape for
    late-arriving re-deliveries of a day's data: re-running the same
    day's load rewrites that day byte-for-byte instead of appending
    duplicates."""
    partition_by = list(partition_by)
    if not partition_by:
        raise errors.Invalid("need at least one partition column")
    for col in partition_by:
        if col not in df.columns:
            raise errors.Invalid(f"missing partition column {col!r}")
    (
        df.repartition(*[F.col(c) for c in partition_by])
        .write.format(format)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .save(path)
    )


def zorder_value(
    cols_with_range: Sequence[tuple],
    *,
    bits: int = 8,
):
    """Z-order (Morton) key Column: quantize each ``(col, lo, hi)``
    dimension to ``bits`` bits by linear range position, then
    interleave the bits.  Rows close in z are close in EVERY
    dimension, so after a range-partition + sort-within-partitions
    write, parquet min/max stats are tight on ALL z-ordered columns
    at once — a single-column sort gives pruning on that column only.
    Pure integer Column arithmetic (shifts/masks), no UDF."""
    cols = list(cols_with_range)
    if not 1 <= len(cols) <= 4:
        raise errors.Invalid("zorder over 1-4 columns")
    if not 1 <= bits <= 15:
        raise errors.Invalid("bits must be in 1..15")
    top = (1 << bits) - 1
    qs = []
    for c, lo, hi in cols:
        lo, hi = float(lo), float(hi)
        if not hi > lo:
            raise errors.Invalid(f"empty range for {c!r}")
        pos = (F.col(c).cast("double") - F.lit(lo)) / F.lit(hi - lo)
        q = F.floor(
            F.least(F.greatest(pos, F.lit(0.0)), F.lit(1.0)) * top
        ).cast("long")
        qs.append(q)
    z = F.lit(0).cast("long")
    n = len(qs)
    for b in range(bits):
        for i, q in enumerate(qs):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    zorder_by: Sequence[tuple],
    bits: int = 8,
    n_files: int,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` clustered by the z-order of ``zorder_by``
    ``(col, lo, hi)`` dimensions: range-partition on the z key into
    ``n_files`` tasks (Spark samples the key — scale-safe), sort
    within each, and land bounded files whose min/max footer stats
    are selective on every z dimension.  The multi-dimensional
    analogue of the single-axis ``write_partitioned`` pruning;
    measured in tests/test_layout.py by reading the parquet footers
    back."""
    z = zorder_value(zorder_by, bits=bits)
    w = (
        df.withColumn("__z", z)
        .repartitionByRange(int(n_files), F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(format)
        .mode(mode)
    )
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.save(path)


def merge_upsert(
    spark,
    updates: DataFrame,
    path: str,
    *,
    key_cols: Sequence[str],
    partition_by: Sequence[str] = (),
    max_records_per_file: int = 1_000_000,
    format: str = "parquet",
) -> dict:
    """Row-level MERGE (SCD1 upsert) into a parquet table: rows in
    ``updates`` REPLACE existing rows with the same key, new keys
    insert, everything else is untouched.  Returns audit counts
    ``{"updated", "inserted", "untouched_partitions"}``.

    The scale shape is what makes this correct at 100 TB: with
    ``partition_by`` (which must prefix the table's layout, e.g. the
    ``day`` column from ``day_col``) only the partitions PRESENT IN
    THE BATCH are read (partition-pruned scan), anti-joined on the
    keys, unioned with the updates, and dynamically overwritten via
    :func:`upsert_partitions` — a daily upsert rewrites days, not the
    decade.  Keys must not move between partitions (an update whose
    partition value differs from its current row's would leave the
    stale row behind — the same contract Hive/Delta dynamic-partition
    MERGE has without a global index).

    Without ``partition_by`` the whole table is read, merged, staged
    to a sibling directory and swapped in (object stores pay a copy;
    partition the table instead).
    """
    key_cols = list(key_cols)
    partition_by = list(partition_by)
    if not key_cols:
        raise errors.Invalid("need at least one key column")
    for c in key_cols + partition_by:
        if c not in updates.columns:
            raise errors.Invalid(f"missing column {c!r} in updates")
    if updates.select(key_cols).distinct().count() != updates.count():
        raise errors.Invalid("updates carry duplicate keys; "
                             "dedup the batch first (latest-wins is a "
                             "caller policy, not a silent default)")
    current = spark.read.format(format).load(path)
    if partition_by:
        parts = updates.select(partition_by).distinct().collect()
        pred = F.lit(False)
        for r in parts:
            clause = F.lit(True)
            for c in partition_by:
                clause = clause & (F.col(c) == F.lit(r[c]))
            pred = pred | clause
        affected = current.filter(pred)
    else:
        affected = current
    survivors = affected.join(
        updates.select(key_cols).distinct(), key_cols, "left_anti")
    merged = survivors.unionByName(
        updates.select(affected.columns))
    n_affected = affected.count()
    n_upd = n_affected - survivors.count()
    n_updates = updates.count()
    n_ins = n_updates - n_upd
    if partition_by:
        # the merged frame lazily READS the same partitions the
        # dynamic overwrite is about to truncate — materialize it
        # (executor-local, bounded by the affected partitions)
        # before writing, or the write would consume its own output
        merged = merged.localCheckpoint()
        upsert_partitions(
            merged, path, partition_by=partition_by,
            max_records_per_file=max_records_per_file, format=format)
    else:
        import os
        import shutil

        tmp = os.path.join(os.path.dirname(path.rstrip("/")),
                           ".__merge_staging")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            merged.write.format(format)
            .option("maxRecordsPerFile", max_records_per_file)
            .mode("overwrite").save(tmp)
        )
        keep = os.path.join(os.path.dirname(path.rstrip("/")),
                            ".__merge_old")
        shutil.rmtree(keep, ignore_errors=True)
        shutil.move(path, keep)
        shutil.move(tmp, path)
        shutil.rmtree(keep, ignore_errors=True)
    return {"updated": n_upd, "inserted": n_ins,
            "rows_rewritten": n_affected - n_upd + n_updates}


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` as a BUCKETED table: rows are hash-clustered into
    ``n_buckets`` files per the bucket columns, optionally sorted
    within each bucket.  This is the co-located-join layout — two
    tables bucketed by their join key with the same bucket count
    join WITHOUT ANY EXCHANGE: each task zips bucket i with bucket i,
    so the shuffle that dominates a 100 TB fact-fact join is paid
    ONCE at write time and amortized over every later join/agg on
    that key (``spark.sql.sources.bucketing.enabled``, on by
    default).  ``sort_by`` additionally pre-sorts bucket files so
    the sort-merge join skips its per-task sort.

    Bucketing requires the session catalog (``saveAsTable``) — plain
    ``save(path)`` silently drops bucket metadata, so this function
    refuses path-like names.  Pick ``n_buckets`` so one bucket of the
    LARGER table is a few hundred MB (buckets are not splittable:
    too few buckets → giant tasks, too many → small files)."""
    bucket_by = list(bucket_by)
    if not bucket_by:
        raise errors.Invalid("need at least one bucket column")
    for col in [*bucket_by, *sort_by]:
        if col not in df.columns:
            raise errors.Invalid(f"missing bucket/sort column {col!r}")
    if n_buckets < 1:
        raise errors.Invalid("n_buckets must be >= 1")
    if "/" in table:
        raise errors.Invalid(
            "bucketing metadata lives in the session catalog: pass a "
            f"table name, not a path ({table!r})")
    w = df.write.format(format).mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def colocated_join(
    spark,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key.  Pure
    convenience over ``spark.table(a).join(spark.table(b), on)`` —
    the exchange-free plan comes from the TABLES' bucket layout, not
    from this function — but it checks the precondition that makes
    the plan co-located (both sides bucketed on the join columns)
    and raises early instead of silently shuffling 100 TB."""
    on = list(on)
    cat = spark.sql
    for t in (left_table, right_table):
        desc = {r["col_name"]: r["data_type"]
                for r in cat(f"DESCRIBE TABLE EXTENDED {t}").collect()}
        bucket_cols = desc.get("Bucket Columns", "")
        missing = [c for c in on if f"`{c}`" not in bucket_cols]
        if missing:
            raise errors.Invalid(
                f"table {t} is not bucketed on {missing} (bucket "
                f"columns: {bucket_cols or 'none'}) — the join would "
                "shuffle; write it with write_bucketed first")
    return spark.table(left_table).join(spark.table(right_table), on, how)
