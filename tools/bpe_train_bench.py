"""Measure the BPE trainer's two regimes (SCALE.md §round-10).

The r9 catalog trained n_merges=8 — cheap on either path.  A real
tokenizer trains 32k merges; the driver path (collected
word-frequency table + incremental pair counts) must make that
regime sane while staying bit-identical to the distributed recount.

Every text column in the driver data is word-soup over a tiny
vocabulary (documents: 31 distinct words — BPE runs dry at 89
merges), so the >=256-merge regime trains on a DERIVED rich corpus:
document word bigrams fused into compound words ("thequick"), up to
31x31 = 961 distinct words / ~8.6k learnable merges — built
deterministically from the same parquet, no synthetic data.
Measured:
  * driver path at n_merges = 256 and 1024 on the compound corpus
  * distributed recount at n_merges = 32 on each corpus (per-merge
    cost is flat in n_merges on that path, so 32 projects 256/32k)
  * parity re-check at n_merges = 32 on both corpora

Usage: python tools/bpe_train_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("bpe-train-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from loudml_spark.pipeline.corpus import bpe_train_merges

    from loudml_spark.pipeline.corpus import tokens

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rich = tokens(docs, n=2).selectExpr(
        "doc_id", "replace(token, ' ', '') AS text")
    docs.count()  # warm the scan

    out = {"sf_dir": SF_DIR}

    for n in (256, 1024):
        t0 = time.perf_counter()
        rows = bpe_train_merges(rich, n_merges=n).collect()
        out[f"rich_driver_{n}_sec"] = round(time.perf_counter() - t0, 2)
        out[f"rich_driver_{n}_merges"] = len(rows)

    for label, corpus in (("docs", docs), ("rich", rich)):
        t0 = time.perf_counter()
        dist = bpe_train_merges(
            corpus, n_merges=32, driver_max_vocab=0).collect()
        out[f"{label}_distributed_32_sec"] = round(
            time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        drv = bpe_train_merges(corpus, n_merges=32).collect()
        out[f"{label}_driver_32_sec"] = round(
            time.perf_counter() - t0, 2)
        out[f"{label}_parity_32"] = (
            [tuple(r) for r in drv] == [tuple(r) for r in dist])

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
