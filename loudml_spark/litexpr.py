"""Double-array literal construction as ONE parsed SQL expression.

PySpark's ``F.lit(list)`` / ``F.array(*[F.lit(x) for x in xs])``
costs one py4j round trip PER ELEMENT (~1 ms each on this driver):
a k×dim codebook/centroid literal is hundreds of driver-blocking
milliseconds before any job runs — measured 508 ms for an 8×64
matrix vs 3.7 ms as one ``F.expr`` string (OPTIMIZATION_r12.md C15;
the Lloyd loop paid it EVERY iteration).  ``repr(float)`` is the
shortest round-trip decimal form and the ``D`` suffix parses as an
exact DOUBLE literal (no decimal-type inference), so the parsed
values are bit-identical to the lit() path — verified including
subnormals and -0.0.  Non-finite values (inf/nan have no SQL
literal form) fall back to the per-element path; every caller here
ships finite codebooks/planes/query vectors, so the fallback is a
safety net, not a code path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: float) -> str:
    return repr(x) + "D"


def lit_doubles(xs) -> Column:
    """array<double> literal from an iterable of numbers."""
    vals = [float(x) for x in xs]
    if not all(math.isfinite(v) for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array(" + ",".join(_d(v) for v in vals) + ")")


def lit_double_rows(rows) -> Column:
    """array<array<double>> literal from an iterable of rows."""
    mat = [[float(x) for x in r] for r in rows]
    if not all(math.isfinite(v) for r in mat for v in r):
        return F.array(*[F.array(*[F.lit(v) for v in r]) for r in mat])
    return F.expr("array(" + ",".join(
        "array(" + ",".join(_d(v) for v in r) + ")" for r in mat) + ")")
