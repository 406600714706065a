"""Single-pass data profiling — per-column quality stats for pipeline
intake audits.

Before a 100 TB corpus enters training, the first question is always
"what is actually in these columns": null rates, cardinalities, value
ranges, string lengths.  The reference has no profiling surface (its
buckets are schemaless pass-through, /root/reference/loudml/bucket.py);
this operator produces the table a data engineer would otherwise
hand-write.

Scale design — two deliberately separated passes:

* **stats pass** — every non-distinct stat (counts, nulls, min/max,
  DECIMAL-exact sums, string lengths) AND the HLL sketches in ONE
  groupBy().agg(): single-group partials, map-side combined, one
  1-row result unpivoted to the long form.
* **exact-distinct pass** (``distinct="exact"``/``"both"`` only) —
  per-column COUNT(DISTINCT) via a NARROW long shape: explode each
  row to (col_id, value) pairs, dedup, count per column.  Putting
  the exact distincts into the same agg as the sketches makes Spark
  plan the multi-distinct Expand with an approx_count_distinct
  buffer per expanded dedup group — ~n_rows × n_cols HLL++ sketch
  allocations (measured 7× slower at sf0.1).  The narrow shape
  shuffles the same logical volume with zero per-group sketch state.

The two 5-row results meet in a broadcast equi-join on ``col_name``
(never a constant-key join — that plans as the
BroadcastNestedLoopJoin the plan gate forbids).  ``distinct="approx"``
skips the second pass entirely: the HLL numbers (bounded-memory,
mergeable) are the 100 TB default, ``"both"`` adds the exact counts
plus an ``approx_ok`` bound verdict — the engine-portable form (raw
HLL estimates differ between engines; the verdict hash-matches, same
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


def _exact_distincts(df: DataFrame, cols: Sequence[str],
                     schema: dict) -> DataFrame:
    """(col_name, n_distinct) via the narrow exploded shape."""
    pairs = []
    for c in cols:
        numeric = isinstance(schema[c], _NUMERIC)
        pairs.append(F.struct(
            F.lit(c).alias("col_name"),
            (F.col(c).cast("double") if numeric
             else F.lit(None).cast("double")).alias("dval"),
            (F.col(c) if not numeric
             else F.lit(None).cast("string")).alias("sval"),
            F.col(c).isNull().alias("is_null"),
        ))
    return (
        df.select(F.explode(F.array(*pairs)).alias("p"))
        .select("p.*")
        .filter(~F.col("is_null"))
        .groupBy("col_name", "dval", "sval").agg(F.lit(1))
        .groupBy("col_name")
        .agg(F.count(F.lit(1)).alias("__nd_exact"))
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
        aggs.append(F.approx_count_distinct(col, 0.02).alias(f"{c}__nda"))
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
            F.col(f"{c}__nda").alias("__nda"),
        ]
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
    long = (
        wide.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
    )
    if distinct == "approx":
        out = long.withColumn("n_distinct", F.col("__nda"))
    else:
        exact = _exact_distincts(df, cols, schema)
        # an all-null column has no rows left after the null filter,
        # so the left join misses: coalesce to 0 (COUNT(DISTINCT)
        # semantics, matching the SQL oracle) instead of NULL
        out = long.join(F.broadcast(exact), on="col_name", how="left") \
            .withColumn(
                "n_distinct", F.coalesce(F.col("__nd_exact"), F.lit(0)))
        if distinct == "both":
            out = out.withColumn(
                "approx_ok",
                F.abs(F.col("__nda") - F.col("n_distinct"))
                <= rel_err * F.col("n_distinct"))
        out = out.drop("__nd_exact")
    order = ["col_name", "n_rows", "n_nulls", "n_distinct"]
    if distinct == "both":
        order.append("approx_ok")
    order += ["min_value", "max_value", "mean_value", "min_len", "max_len"]
    return out.select(*order)


def gini_concentration(
    df: DataFrame,
    *,
    value_col: str,
    by: Sequence[str] = (),
    order_col: str | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Gini coefficient of ``value_col`` mass per key — the
    corpus-balance audit: is one document hoarding a source's token
    mass (G → 1), or is the mass spread evenly (G → 0)?  The answer
    decides whether per-source sampling rates can be trusted.

    Uses the rank-weighted closed form over the ascending sort,

        G = 2·Σ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n

    where for integer values every accumulation is an INTEGER
    (rank·value sums), so the statistic is bit-portable with one
    final division: G = (2·S − (n+1)·T) / (n·T) with S = Σ i·x₍ᵢ₎,
    T = Σx.  Equal values make tie order irrelevant to S (equal x
    swaps ranks without changing Σ i·x), so any deterministic
    tie-break gives the same G; ``order_col`` (default the value
    itself) pins it anyway.  Negative values are invalid (Gini is
    defined on non-negative quantities) and raise at runtime via
    an assert column.  Output per key: (n, total, gini); n = 1 or
    T = 0 yields NULL via try_divide."""
    from pyspark.sql import Window

    for c in (value_col, *by, *((order_col,) if order_col else ())):
        if c not in df.columns:
            raise errors.Invalid(f"missing column {c!r}")
    by = list(by)
    extra = [order_col] if order_col else []
    # the guard lives INSIDE the value expression — a separate
    # assert_true column would be pruned away as unused by the
    # optimizer and never evaluated (measured)
    guarded = F.when(
        F.col(value_col) < 0,
        F.raise_error(F.lit(
            f"gini_concentration: negative {value_col}")),
    ).otherwise(F.col(value_col))
    base = df.filter(F.col(value_col).isNotNull()).select(
        *by, *extra, guarded.alias("__x"))
    if not by:
        base = base.withColumn("__k", F.lit(1))
    gb = by if by else ["__k"]
    w = Window.partitionBy(*gb).orderBy(
        "__x", *( [order_col] if order_col else [] ))
    ranked = base.withColumn("__i", F.row_number().over(w))
    agg = ranked.groupBy(*gb).agg(
        F.count("*").alias("n"),
        F.sum("__x").alias("total"),
        F.sum(F.col("__i") * F.col("__x")).alias("__s"),
    )
    g = F.try_divide(
        (2 * F.col("__s") - (F.col("n") + 1) * F.col("total"))
        .cast("double"),
        (F.col("n") * F.col("total")).cast("double"))
    out = agg.select(
        *gb, "n", "total",
        F.when(F.col("n") > 1,
               F.round(g, round_dp) + F.lit(0.0)).alias("gini"))
    return out.drop("__k") if not by else out
