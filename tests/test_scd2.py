"""Unit gates for operators/scd2.py — SCD2 history from a change log."""

import pytest

from loudml_spark import errors
from loudml_spark.operators.scd2 import scd2_from_changelog


def test_scd2_collapses_and_ranges(spark):
    rows = [
        ("u1", 1, 100, "a"), ("u1", 2, 200, "a"),   # no-change collapses
        ("u1", 3, 300, "b"), ("u1", 4, 400, "a"),   # a->b->a: 3 versions
        ("u2", 5, 150, "x"),
    ]
    df = spark.createDataFrame(rows, "k string, id long, ts long, attr string")
    out = scd2_from_changelog(
        df, key_cols=["k"], attr_cols=["attr"], ts_col="ts", order_col="id",
    ).collect()
    got = {(r["k"], r["version"]): (r["attr"], r["valid_from"], r["valid_to"])
           for r in out}
    assert got[("u1", 1)] == ("a", 100, 300)
    assert got[("u1", 2)] == ("b", 300, 400)
    assert got[("u1", 3)] == ("a", 400, None)
    assert got[("u2", 1)] == ("x", 150, None)
    assert len(out) == 4


def test_scd2_null_attr_and_first_row(spark):
    rows = [("k", 1, 10, None), ("k", 2, 20, None), ("k", 3, 30, "v"),
            ("k", 4, 40, None)]
    df = spark.createDataFrame(rows, "k string, id long, ts long, a string")
    out = scd2_from_changelog(
        df, key_cols=["k"], attr_cols=["a"], ts_col="ts", order_col="id",
    ).orderBy("version").collect()
    # first row opens a version even with a null attr; null->v->null
    assert [(r["a"], r["valid_from"]) for r in out] == [
        (None, 10), ("v", 30), (None, 40)]


def test_scd2_multi_attr_any_change_versions(spark):
    rows = [("k", 1, 10, "a", 1.0), ("k", 2, 20, "a", 2.0),
            ("k", 3, 30, "b", 2.0)]
    df = spark.createDataFrame(
        rows, "k string, id long, ts long, a string, v double")
    out = scd2_from_changelog(
        df, key_cols=["k"], attr_cols=["a", "v"], ts_col="ts",
        order_col="id",
    ).collect()
    assert len(out) == 3  # every update changed one of the two attrs


def test_scd2_validation(spark):
    df = spark.createDataFrame([("k", 1, 1.0)], "k string, ts long, v double")
    with pytest.raises(errors.Invalid):
        scd2_from_changelog(df, key_cols=[], attr_cols=["v"], ts_col="ts")
    with pytest.raises(errors.Invalid):
        scd2_from_changelog(
            df, key_cols=["k"], attr_cols=["nope"], ts_col="ts")
