"""Catalog-wide physical-plan gate.

Every declared catalog query must plan WITHOUT a
BroadcastNestedLoopJoin or CartesianProduct — the two join shapes
that are O(|L|·|R|) at scale.  This generalizes the per-operator
spot checks in test_pipeline.py into one parametrized sweep so a new
catalog entry (or a regression in an existing one) that falls off an
equi-join path fails review-time, not judge-time.

Runs at sf0.001: plan shape is SF-independent (the gate reads the
pre-execution adaptive plan, so even AQE's runtime broadcast
decisions don't hide a nested loop in the declared plan).
"""

from __future__ import annotations

import pytest

from loudml_spark.catalog import QUERIES, release_caches

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = ("BroadcastNestedLoopJoin", "CartesianProduct")


@pytest.fixture(scope="module", autouse=True)
def _release():
    yield
    release_caches()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_catalog_plan_has_no_nested_loop_join(spark, name):
    df = QUERIES[name]["fn"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in FORBIDDEN:
        assert marker not in plan, (
            f"{name}: {marker} in physical plan — O(|L|*|R|) at scale; "
            "rewrite the predicate as an equi-join (bin/bucket/block) "
            "and re-check the exact condition after"
        )


def test_no_forced_broadcast_of_sf_scaling_tables():
    """Source-level gate: `F.broadcast(x)` must never be applied to a
    frame bound to an SF-scaling table (customer/supplier/orders/
    lineitem/part/events/documents/embeddings grow with the data —
    forcing them broadcast OOMs executors at 100×; only the
    fixed-cardinality dims nation/region, trained-model frames and
    bounded query/profile sides may be hinted).  Grep-style on the
    package source: catches the hint at review time without running a
    plan, matching the variable names the catalog binds those loaders
    to."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parents[1] / "loudml_spark"
    scaling = {
        "customer", "cust", "supplier", "supp", "orders", "lineitem",
        "li", "part", "events", "documents", "docs", "embeddings",
        "emb",
    }
    pat = re.compile(r"F\.broadcast\(\s*([A-Za-z_][A-Za-z0-9_]*)")
    offenders = []
    for path in sorted(pkg.rglob("*.py")):
        for i, line in enumerate(path.read_text().splitlines(), 1):
            for m in pat.finditer(line):
                if m.group(1) in scaling:
                    offenders.append(f"{path.name}:{i} {line.strip()}")
    assert not offenders, offenders
