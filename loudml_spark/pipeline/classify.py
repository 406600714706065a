"""Model-based quality filtering: a hashed bag-of-words logistic
classifier scored entirely JVM-side.

The production corpus-curation step this mirrors is the fastText-style
quality classifier (CCNet → LLaMA lineage: train a cheap linear model
on "good" vs "bad" documents, keep documents scoring above a
threshold).  Heuristic quality scores (pipeline/text.py quality_score)
catch mechanical junk; the classifier catches DISTRIBUTIONAL junk the
heuristics cannot express.

Spark-first shape:

* features = hashing trick over word unigrams: ``bucket =
  rolling_hash(word) % n_buckets`` — the same portable base-31 char
  hash the dedup/fingerprint family uses, so the DuckDB oracle
  replays it verbatim (no vocabulary table, no fit/transform state,
  collisions are part of the model as in fastText).
* training runs ONCE on the driver over a bounded, portably-ordered
  sample (numpy full-batch gradient descent, fixed iterations —
  deterministic given the sample; the oracle generator retrains the
  IDENTICAL model from the same parquet and inlines the weights).
* the learned per-token weights are quantized to INTEGER MICRO-UNITS
  (round(w·1e6)): per-document accumulation is then an exact int64
  sum — order-independent, so Spark's shuffle order and DuckDB's
  aggregation order cannot produce a differing float — with ONE
  division and ONE exp at the very end (rounded to 6 dp, the repo's
  transcendental discipline).
* inference is one map pass (explode words → bucket → weight lookup
  in a constant-folded literal array) + one groupBy(id) sum — a
  single shuffle with map-side combine, no UDF, no Python.  At 100 TB
  the weight array (n_buckets ints, ~32 KB at 4096) rides the plan as
  a literal exactly like the Bloom filter words.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loudml_spark.pipeline.text import HASH_MOD, words_col

__all__ = [
    "token_bucket_col",
    "train_quality_classifier",
    "classifier_score",
]


def token_bucket_col(word: Column, n_buckets: int) -> Column:
    """Feature bucket of one token: base-31 rolling char hash mod
    ``n_buckets`` (the hashing trick; same hash family as
    rolling_hash_col so the SQL oracle mirrors it)."""
    h = F.aggregate(
        F.split(word, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % HASH_MOD,
    )
    return (h % F.lit(n_buckets)).cast("int")


def _hash_token(tok: str, n_buckets: int) -> int:
    h = 0
    for c in tok:
        h = (h * 31 + ord(c)) % HASH_MOD
    return h % n_buckets


def train_quality_classifier(
    texts: list[str],
    labels: list[int],
    *,
    n_buckets: int = 4096,
    iters: int = 200,
    lr: float = 0.5,
) -> tuple[list[int], int]:
    """Full-batch logistic regression on hashed unigram counts —
    deterministic numpy shared by the Spark path and the oracle
    generator (both train on the SAME portably-ordered sample, so the
    returned weights are bit-identical).

    Training scales counts by the global max count so the fixed
    learning rate is corpus-size independent; the scale is folded
    back into the returned weights so scoring runs on RAW counts.
    Returns (micro-unit per-token weight list of length ``n_buckets``,
    micro-unit bias): ``int(round(w·1e6))`` — the quantization that
    makes inference an exact integer sum.
    """
    n = len(texts)
    if n == 0 or n != len(labels):
        raise ValueError("need equal, non-empty texts/labels")
    X = np.zeros((n, n_buckets), dtype=np.float64)
    for i, t in enumerate(texts):
        for tok in t.split(" "):
            X[i, _hash_token(tok, n_buckets)] += 1.0
    scale = max(float(X.max()), 1.0)
    Xs = X / scale
    y = np.asarray(labels, dtype=np.float64)
    w = np.zeros(n_buckets, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (Xs.T @ g) / n
        b -= lr * float(g.mean())
    # fold the feature scaling into the weights: scoring computes
    # sum(raw_count · w/scale) + b == the trained model's logit
    return (
        [int(round(v * 1e6)) for v in (w / scale)],
        int(round(b * 1e6)),
    )


def classifier_score(
    df: DataFrame,
    weights_micro: list[int],
    bias_micro: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Score every document with the trained classifier: one map pass
    (explode → bucket → literal-array weight lookup) + one groupBy
    sum of exact int64 micro-units; sigmoid + round at the very end.
    Documents with no tokens still score (bias only) via the explode
    of a null-safe words array — split never returns an empty array
    for non-null text, and null text is the caller's filter.
    Output: (id_col, logit_micro long, quality_prob double)."""
    v = len(weights_micro)
    # constant-folded literal array (the Bloom-words pattern:
    # F.lit(list) would build one python-side Literal per element)
    w_lit = F.split(
        F.lit(",".join(str(x) for x in weights_micro)), ","
    ).cast("array<long>")
    contrib = df.select(
        F.col(id_col),
        F.explode(words_col(F.col(text_col))).alias("__w"),
    ).select(
        id_col,
        F.element_at(
            w_lit, token_bucket_col(F.col("__w"), v) + 1
        ).alias("__wm"),
    )
    out = contrib.groupBy(id_col).agg(
        (F.sum("__wm") + F.lit(int(bias_micro)))
        .cast("long").alias("logit_micro"))
    prob = F.round(
        F.lit(1.0)
        / (F.lit(1.0) + F.exp(-(F.col("logit_micro") / F.lit(1e6)))),
        round_to,
    ) + F.lit(0.0)
    return out.withColumn("quality_prob", prob)
