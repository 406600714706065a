"""Seasonality encodings and profiles.

The reference encodes day-time ``(ts/3600) % 24`` and ISO weekday as
model inputs (loudml/misc.py:201-212, seasonality schema
loudml/schemas.py:52-55).  Here they are plain columns, plus a
``seasonal_profile`` aggregate (mean/count per hour-of-day or
weekday) useful both as a query and as a seasonal-naive baseline
model input.

Integer arithmetic on the epoch keeps the encoding exact and
oracle-comparable for integer timestamp columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from loudml_spark.operators.bucketize import _UNIT_SCALE


def daytime_col(df: DataFrame, ts_col: str, ts_unit: str = "s") -> Column:
    """Hour-of-day 0-23 (UTC), exact integer math for integer epochs."""
    dtype = df.schema[ts_col].dataType
    if isinstance(dtype, (T.LongType, T.IntegerType)) and ts_unit in _UNIT_SCALE:
        scale = _UNIT_SCALE[ts_unit]
        return F.expr(f"(`{ts_col}` div {3600 * scale}L) % 24").cast("int")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        epoch = F.col(ts_col).cast("long")
    else:
        epoch = F.col(ts_col).cast("long")
    return ((epoch / 3600).cast("long") % 24).cast("int")


def weekday_col(df: DataFrame, ts_col: str, ts_unit: str = "s") -> Column:
    """ISO weekday 1-7 (Monday=1), matching dt.isoweekday()."""
    dtype = df.schema[ts_col].dataType
    if isinstance(dtype, (T.LongType, T.IntegerType)) and ts_unit in _UNIT_SCALE:
        scale = _UNIT_SCALE[ts_unit]
        # epoch day 0 = 1970-01-01 = Thursday = ISO 4
        return F.expr(
            f"((`{ts_col}` div {86400 * scale}L) + 3) % 7 + 1"
        ).cast("int")
    return F.expr(
        f"((cast(`{ts_col}` as long) div 86400L) + 3) % 7 + 1"
    ).cast("int")
