"""Data-quality validation (operators/validate.py): every rule type
against hand-built frames with known violation counts, plan shape
(row rules fuse into one aggregation; no nested-loop joins), and
error paths."""

import pytest
from pyspark.sql import functions as F

from loudml_spark import errors
from loudml_spark.operators.validate import (
    expect,
    foreign_key,
    in_range,
    not_null,
    unique,
    validate,
)


@pytest.fixture(scope="module")
def orders(spark):
    return spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, -1.0), (3, 99, 3.0), (3, 11, None),
         (4, None, 2.0)],
        "o_id long, cust long, amount double")


@pytest.fixture(scope="module")
def customers(spark):
    return spark.createDataFrame([(10,), (11,), (12,)], "c_id long")


def test_all_rule_types(spark, orders, customers):
    out = {r["rule"]: (r["n_checked"], r["n_violations"], r["passed"])
           for r in validate(orders, [
               not_null("amount"),
               not_null("cust"),
               in_range("amount", 0.0, 10.0),
               unique("o_id"),
               foreign_key("cust", customers, "c_id"),
               expect("amount_gt_cust_frac",
                      F.col("amount") > F.col("cust") / 100.0),
           ]).collect()}
    assert out["not_null(amount)"] == (5, 1, False)
    assert out["not_null(cust)"] == (5, 1, False)
    # -1.0 out of range; NULL amount is not an in_range violation
    assert out["in_range(amount,0.0,10.0)"] == (5, 1, False)
    # o_id 3 appears twice -> 1 extra row
    assert out["unique(o_id)"] == (5, 1, False)
    # non-null custs: 10,10,99,11 -> 99 orphaned
    assert out["foreign_key(cust->c_id)"] == (4, 1, False)
    # NULL comparison counts as a violation (condition not TRUE):
    # rows: 5>0.1 ok, -1>0.1 viol, 3>0.99 ok, NULL viol, 2>NULL viol
    assert out["expect(amount_gt_cust_frac)"] == (5, 3, False)


def test_passing_audit_and_order(spark, customers):
    clean = spark.createDataFrame(
        [(1, 10), (2, 11)], "o_id long, cust long")
    rows = validate(clean, [
        unique("o_id"), not_null("cust"),
        foreign_key("cust", customers, "c_id")]).collect()
    assert all(r["passed"] for r in rows)
    assert [r["rule"] for r in rows] == sorted(r["rule"] for r in rows)


def test_row_rules_fuse_into_one_aggregate(spark, orders):
    df = validate(orders, [
        not_null("amount"), not_null("cust"),
        in_range("amount", 0.0, 10.0)])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # one scan of the input feeds all three row rules
    assert plan.count("Scan ExistingRDD") <= 1


def test_fk_plan_has_no_nested_loop(spark, orders, customers):
    plan = validate(
        orders, [foreign_key("cust", customers, "c_id")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_validation_errors(spark, orders, customers):
    with pytest.raises(errors.Invalid):
        validate(orders, [])
    with pytest.raises(errors.Invalid):
        validate(orders, [not_null("nope")])
    with pytest.raises(errors.Invalid):
        unique()
    with pytest.raises(errors.Invalid):
        foreign_key(["a", "b"], customers, ["c_id"])


def test_multi_column_unique_and_fk(spark):
    df = spark.createDataFrame(
        [("a", 1, 7), ("a", 1, 8), ("b", 2, 9)],
        "k1 string, k2 long, v long")
    ref = spark.createDataFrame(
        [("a", 1), ("b", 3)], "r1 string, r2 long")
    out = {r["rule"]: (r["n_checked"], r["n_violations"])
           for r in validate(df, [
               unique("k1", "k2"),
               foreign_key(["k1", "k2"], ref, ["r1", "r2"]),
           ]).collect()}
    assert out["unique(k1,k2)"] == (3, 1)
    assert out["foreign_key(k1,k2->r1,r2)"] == (3, 1)


def test_benford_digits_hand_computed(spark):
    """Benford χ² against a from-the-formula python oracle; a
    Benford-distributed sample conforms, a constant-first-digit one
    does not; zero/NULL rows are excluded; errors on bad columns."""
    import math

    from loudml_spark.operators.validate import (
        BENFORD_CHI2_CRIT,
        BENFORD_P,
        benford_digits,
    )

    # 100 values drawn to match Benford expectation closely
    benford_vals = []
    for d in range(1, 10):
        n_d = round(100 * BENFORD_P[d - 1])
        benford_vals += [d * 10.0 + 0.5 * i for i in range(n_d)]
    # all values start with digit 7 -> wildly non-Benford
    skew_vals = [7.0 + 0.001 * i for i in range(100)]
    rows = ([("good", v) for v in benford_vals]
            + [("bad", v) for v in skew_vals]
            + [("good", 0.0), ("good", None)])  # excluded
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {r["grp"]: r for r in
           benford_digits(df, "v", by="grp").collect()}

    def chi2(vals):
        n = len(vals)
        counts = [0] * 9
        for v in vals:
            counts[int(f"{abs(v):.16e}"[0]) - 1] += 1
        s = 0.0
        for d in range(9):
            e = n * BENFORD_P[d]
            s += round((counts[d] - e) ** 2 / e, 6)
        return n, round(s, 6)

    for grp, vals in (("good", benford_vals), ("bad", skew_vals)):
        n, expect = chi2(vals)
        assert got[grp]["n"] == n, grp
        assert got[grp]["chi2"] == pytest.approx(expect, abs=2e-6), grp
        assert got[grp]["conforms"] == (expect <= BENFORD_CHI2_CRIT)
    assert got["good"]["conforms"] and not got["bad"]["conforms"]

    # ungrouped form: one global row over all non-null non-zero values
    glob = benford_digits(df, "v").collect()
    assert len(glob) == 1
    assert glob[0]["n"] == len(benford_vals) + len(skew_vals)

    with pytest.raises(errors.Invalid):
        benford_digits(df, "nope")
    with pytest.raises(errors.Invalid):
        benford_digits(df, "v", by="nope")
