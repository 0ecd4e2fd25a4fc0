"""Structured Streaming front-end for the sampling pipeline.

The reference is a push-based streaming processor (ConsumeTraces,
processor.go:239); the batch engine in pipeline.py replays arrival
slices deterministically. This module wires the same engine into Spark
Structured Streaming via ``foreachBatch`` — each micro-batch goes
through the identical parse → decide → route → aggregate DAG and the
same checkpointed state tables, so streaming and batch replay produce
identical sinks (tested in tests/test_streaming.py).

Watermarks are deliberately absent: the reference has no decision-wait
timeout — capacity-based eviction plays that role (README.md:22-26,
DESIGN.md:75-99), and the decision-state join handles late data
(processor.go:408-430).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .pipeline import SamplingPipeline

SEQUENCE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("batch_idx", T.IntegerType()),
    ]
)


def stream_sequences(spark: SparkSession, input_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a directory of sequence parquet files —
    arrival order = file order, mirroring the driver-loop batches."""
    return (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def run_streaming(
    pipeline: SamplingPipeline,
    stream: DataFrame,
    available_now: bool = True,
    checkpoint_location: str | None = None,
):
    """Drive the sampling engine from a streaming source.

    ``foreachBatch`` hands each micro-batch to the SAME process_batch as
    the batch engine; Spark's streaming checkpoint tracks source offsets
    while the engine's own StateStore tracks sampling state, so a
    restart resumes both consistently (engine commits are idempotent
    per batch id).
    """
    ckpt = checkpoint_location or f"{pipeline.store.dir}/_stream_ckpt"

    def handle(batch_df: DataFrame, epoch_id: int):
        last = pipeline.store.last_committed_batch()
        if last is not None and epoch_id <= last:
            return  # replayed epoch after restart — state already committed
        pipeline.process_batch(batch_df.withColumn("batch_idx", F.lit(int(epoch_id))), int(epoch_id))

    writer = stream.writeStream.foreachBatch(handle).option("checkpointLocation", ckpt)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
