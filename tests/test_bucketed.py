"""Bucketed-table co-location: the join/agg on the bucket key must
plan WITHOUT a shuffle of the bucketed side."""

import re

import pytest
from pyspark.sql import functions as F

from loudml_spark.sources.bucketed import read_bucketed, save_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # spark.sql.warehouse.dir is static config — tables land in the
    # session default warehouse; the teardown DROPs remove the files
    facts = spark.range(0, 10_000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 97).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    dims = spark.range(0, 97).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )
    save_bucketed(facts, "b_facts", key=["k"], n_buckets=8)
    save_bucketed(dims, "b_dims", key=["k"], n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")


def _shuffle_exchanges(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    # count data shuffles only (broadcast exchanges are not shuffles)
    return len(re.findall(r"Exchange hashpartitioning", plan))


def test_bucketed_join_skips_shuffle(spark, bucketed_tables):
    facts = read_bucketed(spark, "b_facts")
    dims = read_bucketed(spark, "b_dims")
    # force a non-broadcast join so co-location is what's being tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = facts.join(dims, "k")
        assert _shuffle_exchanges(joined) == 0
        assert joined.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    facts = read_bucketed(spark, "b_facts")
    agg = facts.groupBy("k").agg(F.sum("v").alias("s"))
    assert _shuffle_exchanges(agg) == 0
    got = {r["k"]: r["s"] for r in agg.collect()}
    assert len(got) == 97


def test_unbucketed_equivalent_does_shuffle(spark, bucketed_tables):
    # sanity: the same plan over plain frames DOES carry an Exchange,
    # so the zero above is the bucketing, not a measurement artifact
    facts = spark.range(0, 10_000).select(
        (F.col("id") % 97).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    agg = facts.groupBy("k").agg(F.sum("v").alias("s"))
    assert _shuffle_exchanges(agg) >= 1


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    facts = read_bucketed(spark, "b_facts")
    dims = read_bucketed(spark, "b_dims")
    got = sorted(
        (r["rid"], r["name"])
        for r in facts.join(dims, "k").select("rid", "name").collect())
    plain_f = spark.range(0, 10_000).select(
        F.col("id").alias("rid"), (F.col("id") % 97).alias("k"))
    plain_d = spark.range(0, 97).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"))
    want = sorted(
        (r["rid"], r["name"])
        for r in plain_f.join(plain_d, "k").select("rid", "name").collect())
    assert got == want
