"""Unit gates for operators/funnel.py — ordered funnels, cohorts."""

import pytest

from loudml_spark import errors
from loudml_spark.operators.funnel import cohort_retention, funnel

BASE = 1704067200


def _counts(rows):
    return {r["step"]: r["n_users"] for r in rows}


def test_funnel_strict_order(spark):
    rows = [
        # u1 completes A -> B -> C in order
        ("u1", BASE, "A"), ("u1", BASE + 10, "B"), ("u1", BASE + 20, "C"),
        # u2 does B before A: reaches A only
        ("u2", BASE, "B"), ("u2", BASE + 10, "A"),
        # u3 does A then C (no B): reaches A only
        ("u3", BASE, "A"), ("u3", BASE + 10, "C"),
        # u4 never does A
        ("u4", BASE, "C"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts long, event_type string")
    out = _counts(funnel(df, steps=["A", "B", "C"]).collect())
    assert out == {"A": 3, "B": 1, "C": 1}


def test_funnel_ties_do_not_advance(spark):
    rows = [("u", BASE, "A"), ("u", BASE, "B"),       # same instant
            ("v", BASE, "A"), ("v", BASE + 1, "B")]
    df = spark.createDataFrame(rows, "user_id string, ts long, event_type string")
    out = _counts(funnel(df, steps=["A", "B"]).collect())
    assert out == {"A": 2, "B": 1}  # only v's strictly-later B counts


def test_funnel_late_restart_still_completes(spark):
    # A B(before A) A B — the second B follows the FIRST A
    rows = [("u", BASE, "B"), ("u", BASE + 5, "A"), ("u", BASE + 9, "B")]
    df = spark.createDataFrame(rows, "user_id string, ts long, event_type string")
    out = _counts(funnel(df, steps=["A", "B"]).collect())
    assert out == {"A": 1, "B": 1}


def test_funnel_validation(spark):
    df = spark.createDataFrame(
        [("u", BASE, "A")], "user_id string, ts long, event_type string")
    with pytest.raises(errors.Invalid):
        funnel(df, steps=["A"])
    with pytest.raises(errors.Invalid):
        funnel(df, steps=["A", "B"], ts_col="nope")


def test_cohort_retention_offsets(spark):
    day = 86400
    rows = [
        ("a", BASE), ("a", BASE + day), ("a", BASE + 3 * day),
        ("b", BASE + day), ("b", BASE + 2 * day),
        ("c", BASE),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts long")
    out = {(r["cohort_ts"], r["offset"]): r["n_active"]
           for r in cohort_retention(
               df, user_col="user_id", ts_col="ts", interval=day).collect()}
    assert out[(BASE, 0)] == 2            # a, c
    assert out[(BASE, 1)] == 1            # a
    assert out[(BASE, 3)] == 1            # a
    assert out[(BASE + day, 0)] == 1      # b
    assert out[(BASE + day, 1)] == 1      # b
    assert (BASE, 2) not in out


def test_cohort_retention_max_offset(spark):
    day = 86400
    df = spark.createDataFrame(
        [("a", BASE), ("a", BASE + 5 * day)], "user_id string, ts long")
    out = cohort_retention(
        df, user_col="user_id", ts_col="ts", interval=day,
        max_offset=2).collect()
    assert {r["offset"] for r in out} == {0}


def test_funnel_latency_transitions(spark):
    from loudml_spark.operators.funnel import funnel_latency

    rows = [
        ("u1", BASE, "A"), ("u1", BASE + 10, "B"), ("u1", BASE + 30, "C"),
        ("u2", BASE, "A"), ("u2", BASE + 50, "B"),
        ("u3", BASE, "B"),  # never converts
    ]
    df = spark.createDataFrame(rows, "user_id string, ts long, event_type string")
    out = {r["step"]: r for r in funnel_latency(
        df, steps=["A", "B", "C"], percentiles=(0.5,)).collect()}
    b = out["B"]
    assert b["n_converted"] == 2
    assert b["p50_latency"] == pytest.approx(30.0)   # median of 10, 50
    assert b["mean_latency"] == pytest.approx(30.0)
    c = out["C"]
    assert c["n_converted"] == 1
    assert c["p50_latency"] == pytest.approx(20.0)


def test_survival_curve_matches_hand_km(spark):
    """Textbook Kaplan-Meier: 6 subjects, censoring at t=3 and t=5,
    absorbing zero at the last event; censored-only times emit no
    row but correctly shrink the risk set."""
    import pytest

    from loudml_spark import errors
    from loudml_spark.operators.funnel import survival_curve

    rows = [(1, 1), (2, 1), (3, 0), (4, 1), (5, 0), (6, 1)]
    df = spark.createDataFrame(rows, "dur long, ev int")
    got = [(r["t"], r["n_risk"], r["n_events"], r["survival"])
           for r in survival_curve(
               df, duration_col="dur", event_col="ev")
           .orderBy("t").collect()]
    assert got == [
        (1, 6, 1, round(5 / 6, 6)),
        (2, 5, 1, round(5 / 6 * 4 / 5, 6)),
        (4, 3, 1, round(5 / 6 * 4 / 5 * 2 / 3, 6)),
        (6, 1, 1, 0.0),
    ]

    # ties: two events at the same time step the curve once
    tied = spark.createDataFrame(
        [("a", 2, 1), ("a", 2, 1), ("a", 5, 0), ("b", 1, 1)],
        "k string, dur long, ev int")
    g2 = {(r["k"], r["t"]): (r["n_risk"], r["n_events"], r["survival"])
          for r in survival_curve(
              tied, duration_col="dur", event_col="ev",
              by=["k"]).collect()}
    assert g2[("a", 2)] == (3, 2, round(1 / 3, 6))
    assert g2[("b", 1)] == (1, 1, 0.0)

    with pytest.raises(errors.Invalid):
        survival_curve(df, duration_col="nope", event_col="ev")
