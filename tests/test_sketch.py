"""operators/sketch.py: KMV distinct sketch — portable hash parity
(Spark vs DuckDB vs hashlib), small-set rule, estimator math."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from loudml_spark import errors
from loudml_spark.operators.sketch import (
    kmv_distinct, kmv_hash, sql_kmv_hash,
)


def _py_hash(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def test_kmv_hash_three_way_parity(spark):
    vals = [0, 1, 7, 123456789, 999999999999]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got_spark = {
        r.v: r.h
        for r in df.select("v", kmv_hash(F.col("v")).alias("h")).collect()
    }
    con = duckdb.connect()
    got_duck = dict(con.execute(
        "SELECT v, " + sql_kmv_hash("v") + " FROM (SELECT UNNEST("
        f"{vals!r}) AS v)").fetchall())
    for v in vals:
        assert got_spark[v] == _py_hash(v) == got_duck[v]


def test_kmv_small_set_rule(spark):
    # 5 distinct keys < k=8: exact passthrough, no kth hash
    rows = [(1, i % 5) for i in range(20)]
    df = spark.createDataFrame(rows, "g int, key int")
    out = kmv_distinct(df, key_col="key", by=["g"], k=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_exact, r.kth_hash, r.est_kmv, r.rel_err) == (5, None, 5.0, 0.0)


def test_kmv_estimator_matches_python_reference(spark):
    n, k = 2000, 32
    df = spark.createDataFrame([(1, i) for i in range(n)], "g int, key int")
    out = kmv_distinct(df, key_col="key", by=["g"], k=k).collect()[0]
    hs = sorted(_py_hash(i) for i in range(n))
    expected = (k - 1) * float(1 << 60) / float(hs[k - 1])
    assert out.n_exact == n
    assert out.kth_hash == hs[k - 1]
    assert out.est_kmv == pytest.approx(round(expected, 6))
    assert out.rel_err == round(abs(expected - n) / n, 6)
    # this deterministic draw lands at 5.1% (k=32 SE is ~18%); the
    # equality asserts above are the real gate, this is a sanity lid
    assert out.rel_err < 0.2


def test_kmv_validation(spark):
    df = spark.createDataFrame([(1, 1)], "g int, key int")
    with pytest.raises(errors.Invalid):
        kmv_distinct(df, key_col="key", by=[])
    with pytest.raises(errors.Invalid):
        kmv_distinct(df, key_col="key", by=["g"], k=1)
    with pytest.raises(errors.Invalid):
        kmv_distinct(df, key_col="nope", by=["g"])
