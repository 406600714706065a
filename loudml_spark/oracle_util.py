"""Shared plumbing for data-derived oracle builders.

A handful of catalog oracles are data-derived: the SQL is built from
the SAME parquet the Spark query reads (IVF centroids, PQ codebooks,
temperature-mix thresholds, LTTB goldens).  Those builders need a
scale-factor directory even when the caller invoked ``oracle_sql()``
bare — the driver's contract takes no argument and compares at
sf0.01.  Resolution order: explicit ``sf_dir`` argument, then the
``SPARK_GRAFT_ORACLE_SF_DIR`` environment variable, then the driver's
sf0.01.  The env/default fallback is LOGGED (once per process) so a
caller comparing at a different scale without threading ``sf_dir``
sees why the data-derived thresholds disagree, instead of a silent
value mismatch.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

DEFAULT_SF_DIR = "/root/testdata/sf0.01"

_warned = False


def resolve_oracle_sf_dir(sf_dir: str | None) -> str:
    """Resolve the parquet directory a data-derived oracle reads."""
    global _warned
    if sf_dir is not None:
        return sf_dir
    resolved = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", DEFAULT_SF_DIR)
    if not _warned:
        log.warning(
            "data-derived oracle called without sf_dir; falling back "
            "to %s — pass sf_dir when comparing at another scale",
            resolved)
        _warned = True
    return resolved
