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
