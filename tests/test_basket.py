"""operators/basket.py: A-Priori association rules and Markov
event transitions on hand-computed fixtures."""

import pytest

from loudml_spark import errors
from loudml_spark.operators.basket import assoc_rules, event_transitions


@pytest.fixture()
def baskets(spark):
    # basket -> items: b1:{1,2}  b2:{1,2}  b3:{1,3}  b4:{2}
    rows = [
        (1, 1), (1, 2),
        (2, 1), (2, 2), (2, 2),   # duplicate item in basket: counts once
        (3, 1), (3, 3),
        (4, 2),
    ]
    return spark.createDataFrame(rows, "bid int, item int")


def test_assoc_rules_hand_computed(spark, baskets):
    out = assoc_rules(
        baskets, basket_cols=["bid"], item_col="item", min_count=2)
    rows = {(r.antecedent, r.consequent): r for r in out.collect()}
    # item 3 has support 1 -> pruned; only the (1,2) pair survives
    assert set(rows) == {(1, 2), (2, 1)}
    r = rows[(1, 2)]
    assert (r.n_pair, r.n_ante, r.n_cons) == (2, 3, 3)
    assert r.support == pytest.approx(0.5)
    assert r.confidence == pytest.approx(round(2 / 3, 6))
    # lift = (2/3) / (3/4)
    assert r.lift == pytest.approx(round((2 / 3) / (3 / 4), 6))
    # symmetric counts here: same pair, same supports
    assert rows[(2, 1)].lift == r.lift


def test_assoc_rules_min_count_1_keeps_rare_pair(spark, baskets):
    out = assoc_rules(
        baskets, basket_cols=["bid"], item_col="item", min_count=1)
    pairs = {(r.antecedent, r.consequent) for r in out.collect()}
    assert (1, 3) in pairs and (3, 1) in pairs


def test_assoc_rules_null_items_drop(spark):
    rows = [(1, 1), (1, None), (2, 1), (2, None)]
    df = spark.createDataFrame(rows, "bid int, item int")
    out = assoc_rules(
        df, basket_cols=["bid"], item_col="item", min_count=1)
    assert out.count() == 0   # null never forms a pair


def test_assoc_rules_validation(spark, baskets):
    with pytest.raises(errors.Invalid):
        assoc_rules(baskets, basket_cols=[], item_col="item")
    with pytest.raises(errors.Invalid):
        assoc_rules(baskets, basket_cols=["bid"], item_col="nope")
    with pytest.raises(errors.Invalid):
        assoc_rules(
            baskets, basket_cols=["bid"], item_col="item", min_count=0)


def test_event_transitions_hand_computed(spark):
    rows = [
        ("a", 1, 1, "x"), ("a", 2, 2, "y"),
        ("a", 3, 3, "x"), ("a", 4, 4, "z"),
        ("b", 1, 5, "y"), ("b", 2, 6, "x"),
    ]
    df = spark.createDataFrame(rows, "uid string, ts long, eid long, st string")
    out = event_transitions(
        df, state_col="st", ts_col="ts", by=["uid"], tie_col="eid")
    got = {(r.prev_state, r.state): (r.n, r.p) for r in out.collect()}
    assert got == {
        ("x", "y"): (1, 0.5),
        ("x", "z"): (1, 0.5),
        ("y", "x"): (2, 1.0),
    }


def test_event_transitions_tie_breaks_on_tie_col(spark):
    # equal ts: eid order decides the chain x -> y -> z
    rows = [("a", 1, 1, "x"), ("a", 1, 2, "y"), ("a", 1, 3, "z")]
    df = spark.createDataFrame(rows, "uid string, ts long, eid long, st string")
    out = event_transitions(
        df, state_col="st", ts_col="ts", by=["uid"], tie_col="eid")
    got = {(r.prev_state, r.state) for r in out.collect()}
    assert got == {("x", "y"), ("y", "z")}


def test_event_transitions_validation(spark):
    df = spark.createDataFrame([("a", 1, "x")], "uid string, ts long, st string")
    with pytest.raises(errors.Invalid):
        event_transitions(df, state_col="st", ts_col="ts", by=[])
    with pytest.raises(errors.Invalid):
        event_transitions(df, state_col="nope", ts_col="ts", by=["uid"])
