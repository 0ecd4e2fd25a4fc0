"""Incremental cross-batch exact dedup — the continuously-ingested-
corpus pattern: batches of documents arrive over time; a document
survives iff its content hash was never seen in ANY committed earlier
batch, with the minimum doc_id as the deterministic within-batch
representative. State is a hash store of delta parquet appends behind
an atomic LATEST marker (the same commit discipline as state.py's
chains, miniaturized): replaying a committed batch is a no-op, a torn
write is invisible until its marker lands, and a fresh object resumes
from disk.

Scale shape: per batch = one groupBy(hash) with map-side partial agg
(within-batch representative) + one left-anti equi-join against the
seen store on the hash key + an O(new) delta append. The seen store is
hash-keyed, so at warehouse scale you bucket it by hash to make the
anti-join co-partitioned and skip the shuffle; nothing is
capacity-proportional per batch except the one distributed join.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalDeduper:
    """Exactly-once batch dedup against a persisted seen-hash store."""

    def __init__(self, spark: SparkSession, checkpoint_dir: str):
        self.spark = spark
        self.dir = checkpoint_dir
        os.makedirs(os.path.join(self.dir, "seen"), exist_ok=True)

    # -- commit protocol (marker = source of truth, like state.py) --------

    def _marker_path(self) -> str:
        return os.path.join(self.dir, "LATEST")

    def last_committed_batch(self):
        """None before the first commit; can be 0 — never `or -1`."""
        try:
            with open(self._marker_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _seen_dir(self, batch_id: int) -> str:
        return os.path.join(self.dir, "seen", f"v={batch_id}")

    def _read_seen(self, upto: int) -> DataFrame | None:
        dirs = [
            self._seen_dir(b)
            for b in range(upto + 1)
            if os.path.isdir(self._seen_dir(b))
        ]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    # -- the operator -----------------------------------------------------

    def process(self, df: DataFrame, batch_id: int) -> DataFrame:
        """New-unique representatives of ``df`` (doc_id, text_hash).

        Replay of a committed batch returns an EMPTY frame and leaves
        state untouched (exactly-once downstream semantics)."""
        last = self.last_committed_batch()
        if last is not None and batch_id <= last:
            return self.spark.createDataFrame([], "doc_id long, text_hash string")
        hashed = df.select("doc_id", F.md5("text").alias("text_hash"))
        reps = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("doc_id"))
        seen = self._read_seen(batch_id - 1)
        new = reps if seen is None else reps.join(
            seen.select("text_hash"), "text_hash", "left_anti"
        )
        # write-then-commit: scrub any torn uncommitted layout at this
        # version, land the delta, then flip the marker atomically
        out = self._seen_dir(batch_id)
        shutil.rmtree(out, ignore_errors=True)
        new.select("text_hash").coalesce(8).write.mode("overwrite").parquet(out)
        tmp = self._marker_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, self._marker_path())
        return self.spark.read.parquet(out).join(
            hashed.groupBy("text_hash").agg(F.min("doc_id").alias("doc_id")),
            "text_hash",
        ).select("doc_id", "text_hash")


def q_dedup_incremental(spark, sf_dir) -> DataFrame:
    """Driver query: the documents table arrives as two batches split on
    doc_id parity (evens first); output = (batch, doc_id, text_hash) of
    every surviving representative. The SQL oracle is the closed form of
    the same semantics: the first (batch, doc_id)-ordered occurrence per
    content hash."""
    import tempfile

    from .dataops import docs

    d = docs(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="incdedup_") as ck:
        dd = IncrementalDeduper(spark, ck)
        parts = []
        for b in (0, 1):
            batch = d.filter(F.col("doc_id") % 2 == b)
            out = dd.process(batch, b)
            parts.append(
                out.select(
                    F.lit(b).cast("long").alias("batch"), "doc_id", "text_hash"
                )
            )
        # materialize before the temp checkpoint disappears
        rows = parts[0].unionByName(parts[1]).collect()
    return spark.createDataFrame(rows, "batch long, doc_id long, text_hash string")


SQL_DEDUP_INCREMENTAL = """
  SELECT CAST(doc_id % 2 AS BIGINT) AS batch, doc_id, md5(text) AS text_hash
  FROM documents
  QUALIFY row_number() OVER (PARTITION BY md5(text)
                             ORDER BY doc_id % 2, doc_id) = 1
"""


def incremental_queries() -> dict[str, tuple]:
    return {
        "dedup_incremental": (q_dedup_incremental, SQL_DEDUP_INCREMENTAL),
    }
