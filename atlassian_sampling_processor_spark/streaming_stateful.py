"""Custom stateful streaming operator via ``applyInPandasWithState``.

The engine's primary state backend is the checkpointed-table micro-batch
loop (pipeline.py) because the reference's eviction is *capacity*-based —
a global rank across keys that per-key GroupState cannot see (SURVEY.md
§7). This module demonstrates the per-key path for the semantics that DO
fit it: the span-count policy as a keyed running accumulator that emits a
trace exactly once when its cumulative span count crosses the threshold
(span_count_sampler.go:33-54 over a live stream).

Use this shape for per-key stateful ops (sessionization, running
quality scores); use the table loop when state interacts across keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("total_spans", T.LongType()),
        T.StructField("decision", T.StringType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("count", T.LongType()),
        T.StructField("decided", T.BooleanType()),
    ]
)


def span_count_stateful(min_spans: int):
    """Factory: (key, pdf_iter, state) → emitted decisions."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        count, decided = state.get if state.exists else (0, False)
        new = sum(len(p) for p in pdfs)
        count += new
        if not decided and count >= min_spans:
            decided = True
            yield pd.DataFrame(
                {"doc_id": [key[0]], "total_spans": [count], "decision": ["Sampled"]}
            )
        state.update((count, decided))

    return fn


def run_span_count_stream(
    stream: DataFrame, min_spans: int, checkpoint: str, out_path: str
) -> Any:
    """Streaming sequences → per-trace cumulative span_count decisions.

    Output mode append; no timeout (the reference has no decision-wait —
    capacity eviction plays that role, which lives in the table loop).
    """
    decided = stream.groupBy("doc_id").applyInPandasWithState(
        span_count_stateful(min_spans),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        decided.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
