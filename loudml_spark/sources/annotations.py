"""Annotation / anomaly-window store.

The reference writes anomaly windows back to the TSDB as annotations
and reads them into training as abnormal masks
(loudml/influx.py:616-694, list_anomalies → loudml/worker.py:87-91,
FIXTURES.md §7).  Here: an append-only parquet table; updates append
a new version (the reference's delete+re-insert,
loudml/influx.py:640-660) and reads resolve last-write-wins per id
via an explicit sequence column — safe under concurrent appenders on
object storage, no file rewrites.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ANNOTATION_SCHEMA = (
    "id string, seq double, start_time double, end_time double, "
    "text string, type string, model string, deleted boolean"
)


class AnnotationStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _append(self, row: tuple):
        self.spark.createDataFrame([row], ANNOTATION_SCHEMA).write.mode(
            "append"
        ).parquet(self.path)

    def insert(self, start_ts: float, end_ts: float, text: str = "",
               model: str = "", kind: str = "loudml") -> str:
        ann_id = str(uuid.uuid4())
        self._append((ann_id, time.time(), float(start_ts), float(end_ts),
                      text, kind, model, False))
        return ann_id

    def update(self, ann_id: str, start_ts: float, end_ts: float,
               text: str = "", model: str = "", kind: str = "loudml"):
        self._append((ann_id, time.time(), float(start_ts), float(end_ts),
                      text, kind, model, False))

    def delete(self, ann_id: str):
        self._append((ann_id, time.time(), 0.0, 0.0, "", "loudml", "", True))

    def list_annotations(self, model: str | None = None) -> DataFrame:
        from pyspark.errors import AnalysisException

        try:
            df = self.spark.read.schema(ANNOTATION_SCHEMA).parquet(self.path)
        except AnalysisException as e:
            # empty store (no file yet) is normal; any OTHER failure
            # (permissions, corrupt footer, transient store error)
            # must raise — an empty frame here silently drops the
            # abnormal-window masks and trains anomalies in as normal
            if "PATH_NOT_FOUND" in str(e):
                return self.spark.createDataFrame([], ANNOTATION_SCHEMA)
            raise
        w = Window.partitionBy("id").orderBy(F.col("seq").desc())
        live = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .filter(~F.col("deleted"))
        )
        if model:
            live = live.filter(F.col("model") == model)
        return live

    def list_anomalies(self, from_ts: float, to_ts: float,
                       model: str | None = None) -> list[list[float]]:
        """[[start, end], ...] windows overlapping [from, to) — the
        shape training consumes as abnormal masks
        (loudml/worker.py:87-91)."""
        df = self.list_annotations(model)
        rows = (
            df.filter(
                (F.col("end_time") >= F.lit(float(from_ts)))
                & (F.col("start_time") < F.lit(float(to_ts)))
            )
            .select("start_time", "end_time")
            .orderBy("start_time")
            .collect()
        )
        return [[r["start_time"], r["end_time"]] for r in rows]
