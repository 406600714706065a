"""Market-basket analytics: A-Priori association rules and Markov
event-transition matrices over the event stream.

Neither exists in the reference (its event queries are per-metric
bucket aggregations, /root/reference/loudml/bucket.py
get_times_data); both are standard batch analytics over exactly the
event tables this engine ingests, and both have exact SQL oracles.

Scale design:

* ``assoc_rules`` — the classic A-Priori pruning shape (Agrawal &
  Srikant, VLDB 1994): frequent ITEMS are found first with one
  map-side-combined aggregation, and only baskets restricted to
  frequent items enter the quadratic pair step.  The pair step is a
  basket-key equi-join of the pruned basket list with itself
  (``item_a < item_b``), so pair volume is Σ|b|² over PRUNED basket
  sizes — never an all-pairs product over the corpus — and the join
  key (the basket id) is the natural partitioner.  Item supports and
  the basket count are bounded dimension frames (|items| rows) and
  ride the rule computation as broadcasts.
* ``event_transitions`` — one shuffle on the chain key, one ordered
  window pass (lag), then an aggregation to the |S|² transition
  matrix, with row-normalization as a window over that bounded
  matrix.  The per-key timeline never leaves its partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from loudml_spark import errors


def assoc_rules(
    df: DataFrame,
    *,
    basket_cols: Sequence[str],
    item_col: str,
    min_count: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise association rules with A-Priori pruning.

    A basket is the set of DISTINCT ``item_col`` values sharing
    ``basket_cols``; an (antecedent → consequent) rule is emitted for
    every ordered pair of frequent items co-occurring in at least
    ``min_count`` baskets, with

        support    = n_pair / n_baskets
        confidence = n_pair / n_antecedent
        lift       = confidence / (n_consequent / n_baskets)

    ``min_count`` is an absolute basket count (not a fraction) so the
    pruning decision is integer-exact and engine-portable.  Both rule
    directions are emitted (confidence is asymmetric).

    Output: (antecedent, consequent, n_pair, n_ante, n_cons,
    support, confidence, lift), floats rounded at ``round_to``.
    """
    basket_cols = list(basket_cols)
    if not basket_cols:
        raise errors.Invalid("assoc_rules needs at least one basket col")
    if min_count < 1:
        raise errors.Invalid(f"min_count must be >= 1, got {min_count}")
    for c in [*basket_cols, item_col]:
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")

    baskets = (
        df.select(*basket_cols, F.col(item_col).alias("item"))
        .where(F.col("item").isNotNull())
        .distinct()
    )
    # bounded dimension frames: |items| rows and one scalar
    item_supp = baskets.groupBy("item").agg(F.count("*").alias("n_item"))
    frequent = item_supp.filter(F.col("n_item") >= min_count)
    # the basket count is fetched eagerly and attached as a literal
    # (histogram/tf_idf idiom): a crossJoin of the 1-row aggregate
    # would plan as a BroadcastNestedLoopJoin (Catalyst folds away
    # even a constant-key equi-join), tripping the no-nested-loop
    # plan gate
    n_baskets = baskets.select(*basket_cols).distinct().count()

    pruned = baskets.join(
        F.broadcast(frequent.select("item")), "item", "semi")
    a = pruned.select(*basket_cols, F.col("item").alias("item_a"))
    b = pruned.select(*basket_cols, F.col("item").alias("item_b"))
    pairs = (
        a.join(b, basket_cols)
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    # emit both rule directions, then attach supports + basket count
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"), "n_pair",
    ).unionByName(pairs.select(
        F.col("item_b").alias("antecedent"),
        F.col("item_a").alias("consequent"), "n_pair",
    ))
    supp = F.broadcast(item_supp)
    out = (
        directed
        .join(supp.select(F.col("item").alias("antecedent"),
                          F.col("n_item").alias("n_ante")), "antecedent")
        .join(supp.select(F.col("item").alias("consequent"),
                          F.col("n_item").alias("n_cons")), "consequent")
        .withColumn("n_baskets", F.lit(n_baskets))
    )
    conf = F.col("n_pair") / F.col("n_ante")
    return out.select(
        "antecedent", "consequent", "n_pair", "n_ante", "n_cons",
        F.round(F.col("n_pair") / F.col("n_baskets"), round_to)
        .alias("support"),
        F.round(conf, round_to).alias("confidence"),
        F.round(conf / (F.col("n_cons") / F.col("n_baskets")), round_to)
        .alias("lift"),
    )


def event_transitions(
    df: DataFrame,
    *,
    state_col: str,
    ts_col: str,
    by: Sequence[str],
    tie_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix of the event stream.

    Each key's events are ordered by (``ts_col``, ``tie_col``) and
    consecutive states form a transition; counts aggregate across
    keys and each row of the matrix is normalized into an empirical
    transition probability.  ``tie_col`` makes the ordering total
    (equal timestamps would otherwise make lag() nondeterministic).

    Output: (prev_state, state, n, p) — p = n / Σ_state' n over the
    same prev_state, rounded at ``round_to``.
    """
    by = list(by)
    if not by:
        raise errors.Invalid("event_transitions needs at least one key col")
    cols = [state_col, ts_col, *by] + ([tie_col] if tie_col else [])
    for c in cols:
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(*by).orderBy(*order)
    trans = (
        df.select(*by, F.col(state_col).alias("state"), ts_col,
                  *([tie_col] if tie_col else []))
        .withColumn("prev_state", F.lag("state").over(w))
        .where(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "state")
        .agg(F.count("*").alias("n"))
    )
    # row-normalize over the bounded |S|x|S| matrix
    row = Window.partitionBy("prev_state")
    return trans.select(
        "prev_state", "state", "n",
        F.round(F.col("n") / F.sum("n").over(row), round_to).alias("p"),
    )
