"""Output layout: directory partitioning, file-count bounds, and
partition pruning on read-back."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from loudml_spark import errors
from loudml_spark.sources.layout import day_col, write_partitioned

NS = 10**9
BASE = 1_704_067_200  # 2024-01-01 UTC


@pytest.fixture()
def frame(spark):
    # 3 days × 400 events
    rows = [((BASE + d * 86400 + i * 60) * NS, float(i))
            for d in range(3) for i in range(400)]
    return spark.createDataFrame(rows, "ts long, value double") \
        .withColumn("day", day_col("ts"))


def test_write_partitioned_layout(spark, frame, tmp_path):
    out = str(tmp_path / "events_out")
    write_partitioned(
        frame, out, partition_by=["day"], max_records_per_file=150)
    days = sorted(os.path.basename(p) for p in glob.glob(f"{out}/day=*"))
    assert len(days) == 3
    for d in days:
        files = glob.glob(f"{out}/{d}/*.parquet")
        # 400 rows / 150-per-file cap → at least 3 files, bounded count
        assert 3 <= len(files) <= 8, (d, len(files))
    back = spark.read.parquet(out)
    assert back.count() == 1200
    assert {r["day"] for r in back.select("day").distinct().collect()} \
        == {19723, 19724, 19725}


def test_read_back_prunes_partitions(spark, frame, tmp_path):
    out = str(tmp_path / "events_pruned")
    write_partitioned(
        frame, out, partition_by=["day"], max_records_per_file=1000)
    back = spark.read.parquet(out).filter(F.col("day") == 19724)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan \
        or "PartitionFilters: [(day" in plan, plan[:800]
    assert back.count() == 400


def test_write_partitioned_validates(spark, frame, tmp_path):
    with pytest.raises(errors.Invalid):
        write_partitioned(frame, str(tmp_path / "x"),
                          partition_by=[], max_records_per_file=10)
    with pytest.raises(errors.Invalid):
        write_partitioned(frame, str(tmp_path / "x"),
                          partition_by=["nope"], max_records_per_file=10)
    with pytest.raises(errors.Invalid):
        write_partitioned(frame, str(tmp_path / "x"),
                          partition_by=["day"], max_records_per_file=0)


def test_day_col_exact_for_ns(spark):
    df = spark.createDataFrame(
        [(BASE * NS,), ((BASE + 86399) * NS,), ((BASE + 86400) * NS,)],
        "ts long")
    got = [r[0] for r in df.select(day_col("ts")).collect()]
    assert got == [19723, 19723, 19724]


def test_compact_partitions_reduces_files_preserves_rows(spark, tmp_path):
    from loudml_spark.sources.layout import compact_partitions

    path = str(tmp_path / "tbl")
    # simulate many micro-batch appends → lots of tiny files
    for batch in range(6):
        df = spark.createDataFrame(
            [(d, batch * 10 + i, float(i)) for d in (1, 2)
             for i in range(5)],
            "day long, event_id long, value double")
        write_partitioned(df, path, partition_by=["day"],
                          max_records_per_file=2, mode="append")
    import glob
    before = len(glob.glob(f"{path}/day=1/*.parquet"))
    assert before >= 6  # one-plus file per batch
    pre = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    n = compact_partitions(
        spark, path, partition_by=["day"],
        max_records_per_file=1000, partitions={"day": 1},
        sort_by=["event_id"])
    assert n == 30
    after = len(glob.glob(f"{path}/day=1/*.parquet"))
    assert after < before and after <= 2
    # other partitions untouched, data identical overall
    assert len(glob.glob(f"{path}/day=2/*.parquet")) == before
    post = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert post == pre

    # whole-table compaction path
    n2 = compact_partitions(
        spark, path, partition_by=["day"], max_records_per_file=1000)
    assert n2 == 60
    assert sorted(tuple(r) for r in
                  spark.read.parquet(path).collect()) == pre


def test_upsert_partitions_idempotent_replay(spark, tmp_path):
    from loudml_spark.sources.layout import upsert_partitions

    path = str(tmp_path / "up")
    day1 = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0)], "day long, event_id long, v double")
    day2 = spark.createDataFrame(
        [(2, 3, 3.0)], "day long, event_id long, v double")
    upsert_partitions(day1, path, partition_by=["day"],
                      max_records_per_file=100)
    upsert_partitions(day2, path, partition_by=["day"],
                      max_records_per_file=100)
    assert spark.read.parquet(path).count() == 3
    # replay day1 (same data) → no duplicates
    upsert_partitions(day1, path, partition_by=["day"],
                      max_records_per_file=100)
    assert spark.read.parquet(path).count() == 3
    # revised day1 REPLACES the partition, day2 untouched
    day1b = spark.createDataFrame(
        [(1, 9, 9.0)], "day long, event_id long, v double")
    upsert_partitions(day1b, path, partition_by=["day"],
                      max_records_per_file=100)
    got = sorted((r["day"], r["event_id"]) for r in
                 spark.read.parquet(path).collect())
    assert got == [(1, 9), (2, 3)]


def test_zorder_write_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order clustering makes parquet footer min/max stats
    selective on EVERY z dimension; a single-axis sort prunes only
    its own axis.  Measured directly from the written files."""
    import pyarrow.parquet as pq

    from loudml_spark.sources.layout import write_zordered

    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 997).alias("user_id"),
        (F.col("id") % 720).alias("hour"),
        F.rand(7).alias("value"),
    )

    def file_ranges(path):
        out = []
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            md = pq.read_metadata(f)
            stats = {}
            for c in ("user_id", "hour"):
                idx = md.schema.names.index(c)
                lo = min(md.row_group(g).column(idx).statistics.min
                         for g in range(md.num_row_groups))
                hi = max(md.row_group(g).column(idx).statistics.max
                         for g in range(md.num_row_groups))
                stats[c] = (lo, hi)
            out.append(stats)
        return out

    def overlap_frac(ranges, col, lo, hi):
        hit = sum(1 for r in ranges
                  if not (r[col][1] < lo or r[col][0] > hi))
        return hit / len(ranges)

    zpath = str(tmp_path / "z")
    write_zordered(
        df, zpath,
        zorder_by=[("user_id", 0, 996), ("hour", 0, 719)],
        bits=8, n_files=16,
    )
    zr = file_ranges(zpath)
    assert len(zr) >= 12

    # baseline: linear sort on user_id only
    lpath = str(tmp_path / "lin")
    (df.repartitionByRange(16, "user_id").sortWithinPartitions("user_id")
       .write.parquet(lpath))
    lr = file_ranges(lpath)

    # narrow predicates: 10% of each dimension's range
    z_user = overlap_frac(zr, "user_id", 100, 199)
    z_hour = overlap_frac(zr, "hour", 100, 171)
    l_user = overlap_frac(lr, "user_id", 100, 199)
    l_hour = overlap_frac(lr, "hour", 100, 171)
    # the linear layout prunes its sort axis but NOT the other
    assert l_user <= 0.3
    assert l_hour == 1.0
    # z-order prunes BOTH axes (neither perfectly, both substantially)
    assert z_user <= 0.6, zr
    assert z_hour <= 0.6, zr


def test_zorder_validates(spark):
    from loudml_spark.sources.layout import zorder_value

    with pytest.raises(errors.Invalid):
        zorder_value([])
    with pytest.raises(errors.Invalid):
        zorder_value([("a", 0, 0)])
    with pytest.raises(errors.Invalid):
        zorder_value([("a", 0, 1)], bits=40)


def test_merge_upsert_partitioned(spark, tmp_path):
    """Daily-partitioned SCD1 merge: updates replace same-key rows,
    new keys insert, OTHER days' files are untouched (mtime-stable),
    and the audit counts are exact."""
    import os

    from loudml_spark.sources.layout import merge_upsert, upsert_partitions

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 30.0),
         (4, "d2", 40.0)],
        "id long, day string, v double")
    upsert_partitions(base, path, partition_by=["day"],
                      max_records_per_file=100)

    def files(day):
        d = os.path.join(path, f"day={day}")
        return {f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d) if f.endswith(".parquet")}

    d2_before = files("d2")
    updates = spark.createDataFrame(
        [(2, "d1", 99.0), (5, "d1", 50.0)], "id long, day string, v double")
    audit = merge_upsert(spark, updates, path, key_cols=["id"],
                         partition_by=["day"], max_records_per_file=100)
    assert audit["updated"] == 1 and audit["inserted"] == 1
    got = {(r["id"], r["day"]): r["v"]
           for r in spark.read.parquet(path).collect()}
    assert got == {(1, "d1"): 10.0, (2, "d1"): 99.0, (5, "d1"): 50.0,
                   (3, "d2"): 30.0, (4, "d2"): 40.0}
    assert files("d2") == d2_before  # untouched partition not rewritten

    # idempotent: replaying the same batch changes nothing
    audit2 = merge_upsert(spark, updates, path, key_cols=["id"],
                          partition_by=["day"], max_records_per_file=100)
    assert audit2["updated"] == 2 and audit2["inserted"] == 0
    got2 = {(r["id"], r["day"]): r["v"]
            for r in spark.read.parquet(path).collect()}
    assert got2 == got


def test_merge_upsert_unpartitioned_and_validation(spark, tmp_path):
    import pytest

    from loudml_spark import errors
    from loudml_spark.sources.layout import merge_upsert

    path = str(tmp_path / "u")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, v double"
    ).write.parquet(path)
    upd = spark.createDataFrame([(2, 99.0), (3, 30.0)], "id long, v double")
    audit = merge_upsert(spark, upd, path, key_cols=["id"])
    assert audit == {"updated": 1, "inserted": 1, "rows_rewritten": 3}
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0}

    dup = spark.createDataFrame([(7, 1.0), (7, 2.0)], "id long, v double")
    with pytest.raises(errors.Invalid, match="duplicate keys"):
        merge_upsert(spark, dup, path, key_cols=["id"])
    with pytest.raises(errors.Invalid):
        merge_upsert(spark, upd, path, key_cols=[])
    with pytest.raises(errors.Invalid):
        merge_upsert(spark, upd, path, key_cols=["nope"])


def test_write_bucketed_colocated_join(spark, tmp_path):
    """Two tables bucketed on the join key join WITHOUT any
    exchange; results match the plain (shuffling) join; the guard
    raises on non-bucketed inputs and bad args."""
    from loudml_spark.sources.layout import colocated_join, write_bucketed

    facts = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"))
    dims = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 7).cast("string"))
        .alias("grp"))
    try:
        write_bucketed(facts, "bkt_facts", bucket_by=["k"], n_buckets=4,
                       sort_by=["k"])
        write_bucketed(dims, "bkt_dims", bucket_by=["k"], n_buckets=4,
                       sort_by=["k"])
        # plain parquet table, NOT bucketed, for the guard check
        dims.write.mode("overwrite").saveAsTable("plain_dims")

        joined = colocated_join(spark, "bkt_facts", "bkt_dims", ["k"])
        # disable auto-broadcast so the plan would otherwise shuffle
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            got = sorted((r["k"], r["v"], r["grp"])
                         for r in joined.collect())
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        expect = sorted((r["k"], r["v"], r["grp"])
                        for r in facts.join(dims, "k").collect())
        assert got == expect and len(got) == 500

        with pytest.raises(errors.Invalid, match="not bucketed"):
            colocated_join(spark, "bkt_facts", "plain_dims", ["k"])
        with pytest.raises(errors.Invalid):
            write_bucketed(facts, "t", bucket_by=[], n_buckets=4)
        with pytest.raises(errors.Invalid):
            write_bucketed(facts, "t", bucket_by=["nope"], n_buckets=4)
        with pytest.raises(errors.Invalid):
            write_bucketed(facts, "t", bucket_by=["k"], n_buckets=0)
        with pytest.raises(errors.Invalid, match="table name"):
            write_bucketed(facts, str(tmp_path / "x"),
                           bucket_by=["k"], n_buckets=4)
    finally:
        for t in ("bkt_facts", "bkt_dims", "plain_dims"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
