"""Single-pass data profiling — per-column quality stats for pipeline
intake audits.

Before a 100 TB corpus enters training, the first question is always
"what is actually in these columns": null rates, cardinalities, value
ranges, string lengths.  The reference has no profiling surface (its
buckets are schemaless pass-through, /root/reference/loudml/bucket.py);
this operator produces the table a data engineer would otherwise
hand-write.

Scale design: ONE aggregation over the input — every per-column stat
is an agg expression in the same groupBy().agg() pass (map-side
combined partials, no per-column scans), and the wide 1-row result is
unpivoted driver-side into the (column, stats...) long form.  Exact
COUNT(DISTINCT c1), COUNT(DISTINCT c2), ... makes Spark plan an
``Expand`` (input ×n_cols before the shuffle) — the honest cost of
exact multi-column cardinality; ``distinct="approx"`` drops to pure
HLL partials for the 100 TB path, and ``"both"`` additionally emits
an ``approx_ok`` bound verdict (the engine-portable form — raw HLL
estimates differ between engines; the verdict hash-matches, same
policy as the approx_distinct_users_daily anchor).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from loudml_spark import errors

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    *,
    distinct: str = "both",
    rel_err: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` (default: all numeric/string columns) into one
    row per column: ``(col_name, n_rows, n_nulls, n_distinct,
    [approx_ok,] min_value, max_value, mean_value, min_len, max_len)``.

    Numeric columns fill min/max/mean (DECIMAL-exact sums, one double
    division); string columns fill the length stats; each leaves the
    other family null.  ``distinct``: ``"exact"`` | ``"approx"`` |
    ``"both"`` (exact count + HLL-within-``rel_err`` verdict).
    """
    if distinct not in ("exact", "approx", "both"):
        raise errors.Invalid("distinct must be exact|approx|both")
    schema = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = [n for n, t in schema.items()
                if isinstance(t, (*_NUMERIC, T.StringType))]
    aggs = []
    for c in cols:
        if c not in schema:
            raise errors.Invalid(f"missing column {c!r}")
        t = schema[c]
        numeric = isinstance(t, _NUMERIC)
        if not (numeric or isinstance(t, T.StringType)):
            raise errors.Invalid(f"unsupported column type for {c!r}: {t}")
        col = F.col(c)
        aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
        aggs.append(F.count(col).alias(f"{c}__nn"))
        if distinct in ("exact", "both"):
            aggs.append(F.countDistinct(col).alias(f"{c}__nd"))
        if distinct in ("approx", "both"):
            aggs.append(
                F.approx_count_distinct(col, 0.02).alias(f"{c}__nda"))
        if numeric:
            d = col.cast("decimal(38,6)")
            aggs.append(F.min(col.cast("double")).alias(f"{c}__min"))
            aggs.append(F.max(col.cast("double")).alias(f"{c}__max"))
            aggs.append(F.sum(d).alias(f"{c}__sum"))
        else:
            ln = F.length(col)
            aggs.append(F.min(ln).cast("long").alias(f"{c}__minl"))
            aggs.append(F.max(ln).cast("long").alias(f"{c}__maxl"))
    wide = df.agg(*aggs)

    rows = []
    for c in cols:
        numeric = isinstance(schema[c], _NUMERIC)
        nn = F.col(f"{c}__nn")
        fields = [
            F.lit(c).alias("col_name"),
            F.col(f"{c}__n").alias("n_rows"),
            (F.col(f"{c}__n") - nn).alias("n_nulls"),
        ]
        if distinct == "approx":
            fields.append(F.col(f"{c}__nda").alias("n_distinct"))
        else:
            fields.append(F.col(f"{c}__nd").alias("n_distinct"))
        if distinct == "both":
            fields.append(
                (F.abs(F.col(f"{c}__nda") - F.col(f"{c}__nd"))
                 <= rel_err * F.col(f"{c}__nd")).alias("approx_ok"))
        if numeric:
            mean = F.when(
                nn > 0, F.col(f"{c}__sum").cast("double") / nn)
            fields += [
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
                mean.alias("mean_value"),
                F.lit(None).cast("long").alias("min_len"),
                F.lit(None).cast("long").alias("max_len"),
            ]
        else:
            fields += [
                F.lit(None).cast("double").alias("min_value"),
                F.lit(None).cast("double").alias("max_value"),
                F.lit(None).cast("double").alias("mean_value"),
                F.col(f"{c}__minl").alias("min_len"),
                F.col(f"{c}__maxl").alias("max_len"),
            ]
        rows.append(F.struct(*fields))
    # 1 wide row -> n_cols long rows: explode of a literal-built array,
    # no extra shuffle (the agg already reduced to one row)
    return (
        wide.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
    )
