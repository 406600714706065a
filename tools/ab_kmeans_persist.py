"""Interleaved A/B for the kmeans_fit persist change (r12).

Arms alternate inside ONE Spark session so ambient host contention
lands on both equally:

* NEW = current kmeans_fit (projected (id, vec) frame persisted
  MEMORY_AND_DISK for the seed scan + every Lloyd pass).
* OLD = the pre-change path: _kmeans_fit_loop called directly on the
  unpersisted frame (identical code otherwise).

Times the two catalog queries that call kmeans_fit end-to-end
(noop sink, same as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("AB_REPS", "4"))


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab-kmeans-persist")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                "16k")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    import loudml_spark.pipeline.embeddings as E
    from loudml_spark.catalog_pipeline import (q_kmeans_fit_emb,
                                               q_realemb_kmeans_fit)

    new_fit = E.kmeans_fit

    def old_fit(df, *, k=8, max_iters=10, tol=1e-6, vec_col="embedding",
                id_col="vec_id", seed_rule="hash"):
        # pre-change path: no projection/persist, loop reads source
        assert seed_rule == "hash"
        seed_order = [F.md5(F.col(id_col).cast("string")).asc(),
                      F.col(id_col).asc()]
        return E._kmeans_fit_loop(
            df, k=k, max_iters=max_iters, tol=tol, vec_col=vec_col,
            id_col=id_col, seed_order=seed_order)

    queries = {"kmeans_fit_emb": q_kmeans_fit_emb,
               "realemb_kmeans_fit": q_realemb_kmeans_fit}
    out = {}
    for rep in range(REPS):
        for arm, fit in (("old", old_fit), ("new", new_fit)):
            E.kmeans_fit = fit
            for name, fn in queries.items():
                spark.sparkContext.setJobDescription(f"{arm}:{name}:{rep}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.mode("overwrite") \
                    .format("noop").save()
                out.setdefault((arm, name), []).append(
                    time.perf_counter() - t0)
    E.kmeans_fit = new_fit
    res = {f"{a}:{n}": {"min": round(min(v), 3),
                        "all": [round(x, 2) for x in v]}
           for (a, n), v in out.items()}
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
