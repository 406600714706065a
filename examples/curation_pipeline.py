"""End-to-end training-data curation over the documents table:

    fingerprint → exact dedup → near-dup LSH pairs → connected
    components → keep canonicals → quality filter → deterministic
    train/val/test split → corpus stats on the training slice.

Run:  python examples/curation_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001)

Every step is a DataFrame transform — the whole pipeline is a single
lazy plan per output and scales with the cluster, not the driver.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("curation-example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loudml_spark.pipeline.corpus import vocabulary
    from loudml_spark.pipeline.dedup import (
        dedup_clusters, minhash_lsh_pairs,
    )
    from loudml_spark.pipeline.sampling import hash_split
    from loudml_spark.pipeline.text import (
        rolling_hash_col, token_count_col,
    )
    from loudml_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. content fingerprint + exact dedup (cheap, catches byte-dups)
    docs = docs.withColumn("fp", rolling_hash_col(F.col("text")))
    w = F.row_number().over(
        Window.partitionBy("fp").orderBy("doc_id"))
    exact = docs.withColumn("__rn", w).filter(F.col("__rn") == 1) \
        .drop("__rn")
    n1 = exact.count()

    # 2. near-dup: MinHash+LSH candidate pairs → connected components
    pairs = minhash_lsh_pairs(exact, threshold=0.8)
    clustered = dedup_clusters(pairs, exact)
    keep = clustered.filter(F.col("is_canonical")).select("doc_id")
    canon = exact.join(keep, "doc_id")
    n2 = canon.count()

    # 3. quality gate: drop ultra-short docs
    quality = canon.withColumn(
        "n_tokens", token_count_col(F.col("text"))
    ).filter(F.col("n_tokens") >= 3)
    n3 = quality.count()

    # 4. deterministic content-hash split (stable across reruns)
    split = hash_split(
        quality, key=F.col("fp"),
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    )
    counts = {r["split"]: r["n"] for r in split.groupBy("split")
              .agg(F.count("*").alias("n")).collect()}

    # 5. vocabulary of the training slice
    train_vocab = vocabulary(
        split.filter(F.col("split") == "train"), top_k=10)

    print(f"docs: {n0} → exact-dedup {n1} → near-dup {n2} "
          f"→ quality {n3}")
    print(f"splits: {counts}")
    print("top training tokens:")
    for r in train_vocab.collect():
        print(f"  {r['token']:>12}  tf={r['tf']}  df={r['df']}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
