"""Scaling modes, scripted fields, bucket drop."""

import pytest
from pyspark.sql import functions as F

from loudml_spark import errors
from loudml_spark.features import Feature
from loudml_spark.operators.bucketize import bucketize
from loudml_spark.operators.scaling import (
    apply_scaling,
    fit_scaler,
    scale_col,
    unscale_col,
)


def test_scripted_field(spark):
    df = spark.createDataFrame(
        [(0.0, 2.0, 3.0), (1.0, 4.0, 5.0)],
        "timestamp double, a double, b double",
    )
    feat = Feature(metric="avg", field="ab", name="avg_ab",
                   script="a * b")
    out = bucketize(df, [feat], 0, 3, 3, ts_col="timestamp").collect()
    assert out[0]["avg_ab"] == pytest.approx((6.0 + 20.0) / 2)


def test_scaling_modes_roundtrip(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 11)], "v double"
    )
    for mode in ("min_max", "normalize", "standardize"):
        scaled, stats = apply_scaling(df, df, "v", mode, out_col="s")
        vals = [r["s"] for r in scaled.orderBy("v").collect()]
        if mode == "min_max":
            assert vals[0] == 0.0 and vals[-1] == 1.0
        if mode == "standardize":
            assert abs(sum(vals)) < 1e-9
        back = scaled.select(
            unscale_col(F.col("s"), stats).alias("u"), "v"
        ).collect()
        for r in back:
            assert r["u"] == pytest.approx(r["v"])


def test_scaling_degenerate_constant(spark):
    df = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    stats = fit_scaler(df, "v", "standardize")
    assert stats["std"] == 1.0  # donut.py:650 convention
    stats = fit_scaler(df, "v", "min_max")
    assert stats["span"] == 1.0
    with pytest.raises(errors.Invalid):
        fit_scaler(df, "v", "nope")


def test_bucket_drop(spark, tmp_path):
    from loudml_spark.sources.base import BucketRegistry

    reg = BucketRegistry()
    b = reg.add({"name": "t", "type": "parquet",
                 "path": str(tmp_path / "t")})
    b.write(spark.createDataFrame([(1,)], "x long"), mode="overwrite")
    assert b.read(spark).count() == 1
    b.drop()
    with pytest.raises(Exception):
        b.read(spark).count()


def test_binaryfile_bucket_reads_raw_files(spark, tmp_path):
    """binaryFile ingestion: one row per file with path/length/content;
    glob pattern prunes at listing time; the bucket is read-only."""
    from loudml_spark.sources.base import BucketRegistry

    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG-fake-a")
    (d / "b.png").write_bytes(b"\x89PNG-fake-bb")
    (d / "notes.txt").write_text("not a blob")

    reg = BucketRegistry()
    b = reg.add({"name": "blobs", "type": "binaryfile",
                 "path": str(d), "pattern": "*.png"})
    rows = b.read(spark).orderBy("path").collect()
    assert [r["path"].rsplit("/", 1)[-1] for r in rows] == \
        ["a.png", "b.png"]
    assert rows[0]["content"] == b"\x89PNG-fake-a"
    assert rows[1]["length"] == 12

    # metadata-only projection never needs content
    assert b.read(spark).select("length").count() == 2

    with pytest.raises(errors.Invalid):
        b.write(b.read(spark))


def test_text_bucket_lines_and_wholetext(spark, tmp_path):
    from loudml_spark.sources.base import BucketRegistry

    src = tmp_path / "corpus"
    src.mkdir()
    (src / "f1.txt").write_text("line one\nline two\n")
    (src / "f2.txt").write_text("solo\n")

    reg = BucketRegistry()
    lines = reg.add({"name": "lines", "type": "text",
                     "path": str(src)})
    got = sorted(r["value"] for r in lines.read(spark).collect())
    assert got == ["line one", "line two", "solo"]

    whole = reg.add({"name": "whole", "type": "text",
                     "path": str(src), "wholetext": True})
    docs = sorted(r["value"] for r in whole.read(spark).collect())
    assert docs == ["line one\nline two\n", "solo\n"]

    # write + read back round trip
    out = reg.add({"name": "out", "type": "text",
                   "path": str(tmp_path / "out")})
    out.write(lines.read(spark), mode="overwrite")
    assert sorted(r["value"] for r in out.read(spark).collect()) == got
    out.drop()


def test_parquet_bucket_schema_evolution_mergeschema(spark, tmp_path):
    """Reader options pass through: a dataset whose later files added
    a column reads back whole under mergeSchema, with pre-evolution
    rows NULL in the new column."""
    from loudml_spark.sources.base import BucketRegistry

    p = str(tmp_path / "evolved")
    spark.createDataFrame([(1, 10.0)], "id long, v double") \
        .write.mode("append").parquet(p)
    spark.createDataFrame(
        [(2, 20.0, "new")], "id long, v double, tag string"
    ).write.mode("append").parquet(p)

    reg = BucketRegistry()
    b = reg.add({"name": "ev", "type": "parquet", "path": p,
                 "options": {"mergeSchema": "true"}})
    rows = {r["id"]: r for r in b.read(spark).collect()}
    assert set(b.read(spark).columns) == {"id", "v", "tag"}
    assert rows[1]["tag"] is None and rows[2]["tag"] == "new"
