"""Round-13 optimization invariants.

Pins the behavior contracts of this round's changes:

* `_rebalance` is GATED on the actual input split count — a
  multi-split input must come back unchanged (no self-inflicted
  full shuffle of the base table at scale: the r12 verdict's
  "What's wrong #2"), while the one-file fixture shape still
  rebalances to the core count.
"""

import os

import pytest


@pytest.fixture(scope="module")
def docs_multi(spark, tmp_path_factory):
    """A parquet directory with >= defaultParallelism files (splits)."""
    p = str(tmp_path_factory.mktemp("rebal") / "multi.parquet")
    n = spark.sparkContext.defaultParallelism
    spark.range(0, 10_000).selectExpr(
        "id as doc_id", "concat('t', id) as text"
    ).repartition(n * 2).write.mode("overwrite").parquet(p)
    return p


@pytest.fixture(scope="module")
def docs_single(spark, tmp_path_factory):
    """A single-file parquet — the committed fixture shape."""
    p = str(tmp_path_factory.mktemp("rebal") / "single.parquet")
    spark.range(0, 1_000).selectExpr(
        "id as doc_id", "concat('t', id) as text"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    return p


class TestRebalanceGate:
    def test_multi_split_input_not_repartitioned(self, spark, docs_multi):
        from loudml_spark.catalog_pipeline import _rebalance

        df = spark.read.parquet(docs_multi)
        assert df.rdd.getNumPartitions() >= \
            spark.sparkContext.defaultParallelism
        out = _rebalance(spark, df)
        # identity: the frame is returned unchanged — no Exchange added
        assert out is df
        assert "repartition" not in out._jdf.queryExecution() \
            .optimizedPlan().toString().lower()

    def test_single_split_input_rebalanced(self, spark, docs_single):
        from loudml_spark.catalog_pipeline import _rebalance

        df = spark.read.parquet(docs_single)
        assert df.rdd.getNumPartitions() < \
            spark.sparkContext.defaultParallelism
        out = _rebalance(spark, df)
        assert out is not df
        assert out.rdd.getNumPartitions() == \
            spark.sparkContext.defaultParallelism

    def test_rebalance_preserves_rows(self, spark, docs_single):
        from loudml_spark.catalog_pipeline import _rebalance

        df = spark.read.parquet(docs_single)
        out = _rebalance(spark, df)
        assert out.count() == 1_000
        assert sorted(out.columns) == ["doc_id", "text"]

    def test_filtered_load_still_gated(self, spark, docs_multi):
        # the catalog idiom `_rebalance(spark, load(...).filter(...))`:
        # a filter does not change the scan's split count, so the gate
        # must still see the multi-split input and leave it alone
        from loudml_spark.catalog_pipeline import _rebalance

        df = spark.read.parquet(docs_multi).filter("doc_id < 100")
        out = _rebalance(spark, df)
        assert out is df
