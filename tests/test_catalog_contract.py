"""Driver-contract guard: every catalog entry must execute and the
queries()/oracle_sql() surfaces must stay consistent — this is the
interface the correctness harness consumes, so a broken entry here
means a broken CORRECTNESS row there."""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle is a non-trivial SQL string
    for name, sql in os_.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_every_query_executes_at_sf0001(spark):
    qs = entry.queries()
    failures = {}
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, SF)
            n = df.count()
            assert n >= 0
            assert df.columns, "no columns"
        except Exception as e:  # noqa: BLE001 — collect all failures
            failures[name] = repr(e)[:200]
    assert not failures, failures


def test_entry_runs_and_is_stable(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "bucket_ts", "avg_value", "count_value", "min_value",
        "max_value", "spread_value",
    ]


def test_every_query_is_oracle_paired():
    """Round 5 reached 100% oracle pairing — pin it.  A new query
    without an oracle silently downgrades the driver's correctness
    row to rows-only; add the oracle (or an oracle_fn replay) with
    the query, not later."""
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(os_), sorted(set(qs) - set(os_))
