"""Unit gates for operators/profile.py — single-pass column profile."""

import pytest

from loudml_spark import errors
from loudml_spark.operators.profile import profile


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "aa", 10.0), (2, "bbb", 20.0), (3, None, None), (2, "aa", 30.0),
    ]
    return spark.createDataFrame(rows, "k long, s string, v double")


def test_profile_stats(df):
    out = {r["col_name"]: r for r in profile(df, distinct="exact").collect()}
    assert set(out) == {"k", "s", "v"}
    k = out["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_value"], k["max_value"]) == (1.0, 3.0)
    assert k["mean_value"] == pytest.approx(2.0)
    assert k["min_len"] is None
    s = out["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_len"], s["max_len"]) == (2, 3)
    assert s["mean_value"] is None
    v = out["v"]
    assert (v["n_nulls"], v["mean_value"]) == (1, pytest.approx(20.0))


def test_profile_both_emits_bound_verdict(df):
    out = profile(df, ["k"], distinct="both").collect()[0]
    assert out["approx_ok"] is True  # HLL exact at this cardinality


def test_profile_approx_mode_and_errors(df, spark):
    out = profile(df, ["s"], distinct="approx").collect()[0]
    assert out["n_distinct"] == 2
    with pytest.raises(errors.Invalid):
        profile(df, ["nope"])
    with pytest.raises(errors.Invalid):
        profile(df, distinct="bogus")
    ts = spark.createDataFrame([(True,)], "b boolean")
    with pytest.raises(errors.Invalid):
        profile(ts, ["b"])


def test_profile_plan_shape(df):
    # exact/both: the long stats frame broadcast-equi-joins the narrow
    # exact-distinct frame — never a nested-loop/constant-key join,
    # and never the multi-distinct Expand (HLL buffer per expanded
    # dedup group — the measured 7x pathology)
    plan = profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Expand" not in plan
    # approx mode: single aggregation, no join at all
    aplan = profile(df, distinct="approx")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in aplan and "Expand" not in aplan


def test_profile_all_null_column_exact_distincts(spark):
    """An all-null column must report n_distinct = 0 (COUNT(DISTINCT)
    semantics, matching the SQL oracle) with a non-null approx_ok
    verdict — not the NULLs a missed left join produces."""
    from loudml_spark.operators.profile import profile

    df = spark.createDataFrame(
        [(1, None), (2, None)], "a long, b string")
    rows = {r["col_name"]: r
            for r in profile(df, ["a", "b"], distinct="both").collect()}
    assert rows["b"]["n_distinct"] == 0
    assert rows["b"]["n_nulls"] == 2
    assert rows["b"]["approx_ok"] is True
    assert rows["a"]["n_distinct"] == 2


def test_gini_concentration_closed_form(spark):
    import pytest as _pt
    from pyspark.sql import functions as F

    from loudml_spark import errors
    from loudml_spark.operators.profile import gini_concentration

    rows = ([(i, 10, "eq") for i in range(5)]
            + [(i, 100 if i == 0 else 0, "hoard") for i in range(5)]
            + [(0, 7, "single")])
    df = spark.createDataFrame(rows, "doc_id long, toks long, src string")
    got = {r["src"]: r for r in gini_concentration(
        df, value_col="toks", by=["src"], order_col="doc_id").collect()}
    assert got["eq"]["gini"] == 0.0              # perfectly even
    assert got["hoard"]["gini"] == 0.8           # (n-1)/n, one hoarder
    assert got["single"]["gini"] is None         # undefined at n=1
    assert (got["hoard"]["n"], got["hoard"]["total"]) == (5, 100)
    # hand case: values 1,2,3,4 -> G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    h = spark.createDataFrame([(i, i + 1) for i in range(4)],
                              "doc_id long, v long")
    r = gini_concentration(h, value_col="v").collect()[0]
    assert r["gini"] == 0.25
    # negative values are a hard error (assert_true), not a wrong G
    neg = spark.createDataFrame([(0, -1), (1, 2)], "doc_id long, v long")
    with _pt.raises(Exception):
        gini_concentration(neg, value_col="v").collect()
    with _pt.raises(errors.Invalid):
        gini_concentration(df, value_col="nope")
