"""Re-measure the text/corpus knobs in the regime they were built
for — the Zipf/hapax-realistic fixture (fixtures/realtext.parquet,
pipeline/realtext.py) — the r10 verdict's What's-missing #1.

Measurements (each printed as one line for SCALE.md):

1. bigram min_count pruning: distinct-bigram model keys exact vs
   pruned, and the wall-time delta of bigram_perplexity over the
   full corpus (on the synthetic documents table this knob was
   wall-neutral because hapax mass was ~0; here hapax bigrams are
   ~80% of distinct bigrams).
2. BPE trainer at real merge counts: bpe_train_merges driver path
   at n_merges=8192 over the fixture vocabulary.
3. CCNet bucket shapes per language: head/middle/tail must land at
   ~1/3 each with separated cutoffs.
4. Gopher hit rates by source (the realtext_gopher_rates catalog
   values).

Usage: python tools/realtext_knobs.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("realtext-knobs")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from loudml_spark.pipeline.corpus import (
        bigram_perplexity, bpe_train_merges, perplexity_buckets)
    from loudml_spark.pipeline.realtext import load_realtext

    docs = load_realtext(spark).localCheckpoint()
    n = docs.count()
    print(f"fixture: {n} docs")

    # 1. bigram pruning ------------------------------------------------
    toks = F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    bigrams = (
        docs.select(toks.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(F.explode(F.expr(
            "transform(sequence(1, size(ws) - 1), "
            "i -> concat(ws[i - 1], ' ', ws[i]))")).alias("b"))
        .groupBy("b").count().localCheckpoint()
    )
    total = bigrams.count()
    kept5 = bigrams.filter("count >= 5").count()
    print(f"bigram model keys: exact={total} min_count=5 kept={kept5} "
          f"({kept5 / total:.3f} of exact; hapax+rare cut "
          f"{1 - kept5 / total:.1%})")
    for mc in (1, 5):
        t0 = time.monotonic()
        bigram_perplexity(docs, lam=0.75, min_count=mc) \
            .agg(F.sum("n_bigrams")).first()
        print(f"bigram_perplexity min_count={mc}: "
              f"{time.monotonic() - t0:.2f}s wall (full corpus)")

    # 2. BPE at real merge counts -------------------------------------
    for merges in (1024, 8192):
        t0 = time.monotonic()
        got = bpe_train_merges(docs, n_merges=merges)
        n_rows = got.count()
        print(f"bpe_train_merges n_merges={merges}: "
              f"{time.monotonic() - t0:.2f}s wall ({n_rows} merges)")

    # 3. CCNet bucket shapes ------------------------------------------
    buckets = perplexity_buckets(docs)
    shape = (buckets.groupBy("lang", "ppl_bucket").count()
             .orderBy("lang", "ppl_bucket").collect())
    print("ccnet buckets (lang, bucket, n): "
          + "; ".join(f"{r['lang']}/{r['ppl_bucket']}={r['count']}"
                      for r in shape))

    # 4. gopher rates --------------------------------------------------
    from loudml_spark.catalog_pipeline import q_realtext_gopher_rates

    rows = q_realtext_gopher_rates(spark, None).orderBy("source") \
        .collect()
    for r in rows:
        print(f"gopher {r['source']}: pass={r['r_pass']} "
              f"words={r['r_words']} sym={r['r_symbols']} "
              f"alpha={r['r_alpha']} stop={r['r_stop']}")
    spark.stop()


if __name__ == "__main__":
    main()
