"""Checkpointed state tables (FIXTURES.md §6) — the Spark mapping of the
reference's four LRU caches (processor.go:53-59, DESIGN.md:110-138).

Layout: ``{ckpt}/{table}/v={batch}/*.parquet`` plus an atomically-renamed
``LATEST`` marker per table, committed only after every table of a batch
is durable — so a kill between micro-batches resumes from the last fully
committed batch (the reference's decision-span flush/re-ingest
resumability story, DESIGN.md:148-167, done with snapshots instead).

On a production cluster these tables are Iceberg with snapshot commits
and bucketed layout on ``doc_id`` (co-partitioned state joins); plain
parquet keeps the sandbox dependency-free while preserving identical
semantics.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PENDING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("trace_hi", T.LongType()),
        T.StructField("trace_lo", T.LongType()),
        T.StructField("span_count", T.IntegerType()),
        T.StructField("min_start", T.LongType()),
        T.StructField("max_end", T.LongType()),
        T.StructField("arrival_batch", T.IntegerType()),
        T.StructField("last_seen_batch", T.IntegerType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("last_low_policy", T.StringType()),
        T.StructField("first_source", T.StringType()),
    ]
)

DECISION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("decision", T.IntegerType()),  # 2=Sampled, 3=NotSampled
        T.StructField("policy", T.StringType()),
        T.StructField("decided_batch", T.IntegerType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_idx", T.IntegerType()),
        T.StructField("metric", T.StringType()),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
        T.StructField("value", T.LongType()),
    ]
)

TABLES = ("pending_state", "pending_spans", "decision_state", "metrics")


class StateStore:
    def __init__(self, spark: SparkSession, ckpt_dir: str):
        self.spark = spark
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)

    # -- commit protocol ----------------------------------------------------

    def _marker(self) -> str:
        return os.path.join(self.dir, "LATEST")

    def last_committed_batch(self) -> int | None:
        try:
            with open(self._marker()) as f:
                return json.load(f)["batch"]
        except FileNotFoundError:
            return None

    def last_meta(self) -> dict:
        """Driver-side state-size counters stored with the commit marker
        (used to skip capacity-eviction ranking when it cannot fire)."""
        try:
            with open(self._marker()) as f:
                return json.load(f).get("meta", {})
        except FileNotFoundError:
            return {}

    def commit(self, batch: int, meta: dict | None = None) -> None:
        tmp = self._marker() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch": batch, "meta": meta or {}}, f)
        os.replace(tmp, self._marker())  # atomic

    # -- table IO -------------------------------------------------------------

    def _path(self, table: str, batch: int) -> str:
        return os.path.join(self.dir, table, f"v={batch}")

    def write(self, table: str, batch: int, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self._path(table, batch))

    def read(self, table: str, batch: int | None, schema: T.StructType | None = None) -> DataFrame | None:
        """Table at version ``batch``; None/missing → empty-with-schema or None."""
        if batch is not None:
            p = self._path(table, batch)
            if os.path.isdir(p):
                return self.spark.read.parquet(p)
        if schema is not None:
            return self.spark.createDataFrame([], schema=schema)
        return None
