"""Micro-batch sampling pipeline: parse → enrich → decide → route → aggregate.

One ``process_batch`` call is the Spark re-expression of the reference's
``ConsumeTraces`` hot path (processor.go:239-406) over a whole arrival
slice at once:

  parse (vectorized)                      ConsumeTraces entry
  decision-span ingest                    processor.go:436-480
  decision_state join → early release     earlyDecisionChecks processor.go:408-430
  groupBy(doc_id) agg                     NewTraceData metadata (tracedata.go:24-62)
  left join pending_state + merge exprs   Metadata.MergeWith (metadata.go:29-39)
  ordered when/coalesce decision chain    decider.MakeDecision (decider.go:41-81)
  fan-out to keep/drop/low sinks          processor.go:369-404, 515-536
  window-rank capacity eviction           tiered_cache.go:41-49 + lru eviction
  state write + atomic commit             resumability (DESIGN.md:148-167)

Scale notes (100 TB / 1000 executors):
* The only per-span shuffle is the groupBy(doc_id); everything after is
  O(traces-in-batch). Partial aggregation (map-side combine) happens
  automatically; spans of one trace land in one shuffle partition —
  the reference's shard co-location (util.go:42-49) for free.
* State joins are on doc_id; with Iceberg/bucketed state tables they're
  co-partitioned and shuffle-free. Here (plain parquet) AQE picks
  broadcast when state is small.
* Capacity eviction ranks per tier; the ranked input is bounded by
  (capacity + batch trace count) per tier, so the single-partition
  window is bounded, not O(corpus). For very large capacities, swap to
  a two-level rank (per-partition top-K then global) — noted inline.
* Sinks and state are written once per batch, partitioned by batch id.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import codec
from . import decision as D
from .aggregate import aggregate_batch, merge_with_pending, with_hash_columns
from .config import EngineConfig
from .decider import make_decision, post_decision_state
from .parse import enrich_spans, parse_sequences
from .policies import Policy
from .state import (
    DECISION_STATE_SCHEMA,
    METRICS_SCHEMA,
    PENDING_STATE_SCHEMA,
    StateStore,
)

# columns carried into sinks / pending payload — the original sequence row
# (byte-exact tokens) + arrival lineage
PASSTHROUGH = ["doc_id", "tokens", "n_tok", "source", "batch_idx", "flushes"]

PENDING_SPANS_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string, batch_idx int, flushes int"
)

EVICTION_POLICY = "__evicted__"
DECISION_SPAN_POLICY = "__decision_span__"


def _empty(spark: SparkSession, schema) -> DataFrame:
    return spark.createDataFrame([], schema=schema)


@dataclass
class BatchResult:
    batch_idx: int
    kept: int = 0
    dropped: int = 0
    low_evicted: int = 0
    sampled_traces: int = 0
    not_sampled_traces: int = 0
    evicted_traces: int = 0
    pending_traces: int = 0


class SamplingPipeline:
    """Driver-orchestrated micro-batch loop carrying checkpointed state."""

    def __init__(
        self,
        spark: SparkSession,
        policies: list[Policy],
        engine: EngineConfig | None = None,
        checkpoint_dir: str = "/tmp/asp_ckpt",
        output_dir: str = "/tmp/asp_out",
    ):
        self.spark = spark
        self.policies = policies
        self.engine = engine or EngineConfig()
        self.store = StateStore(spark, checkpoint_dir)
        self.out = output_dir
        self._emit_placeholder = {
            p.name: p.emit_single_span_for_not_sampled for p in policies
        }

    # ------------------------------------------------------------------ sinks

    def _sink_path(self, sink: str, batch: int) -> str:
        return f"{self.out}/{sink}/batch={batch}"

    def _write_sink(self, sink: str, batch: int, df: DataFrame) -> int:
        df = df.withColumn("partition_id", F.spark_partition_id()).withColumn(
            "released_batch", F.lit(batch)
        )
        df.write.mode("overwrite").parquet(self._sink_path(sink, batch))
        return self.spark.read.parquet(self._sink_path(sink, batch)).count()

    def read_sink(self, sink: str) -> DataFrame:
        import glob

        paths = sorted(glob.glob(f"{self.out}/{sink}/batch=*"))
        if not paths:
            raise FileNotFoundError(f"no {sink} output yet")
        df = self.spark.read.parquet(paths[0])
        for p in paths[1:]:
            df = df.unionByName(self.spark.read.parquet(p), allowMissingColumns=True)
        return df

    # ------------------------------------------------------------- batch step

    def process_batch(self, raw_batch: DataFrame, b: int) -> BatchResult:
        spark = self.spark
        prev = self.store.last_committed_batch()
        pend_state = self.store.read("pending_state", prev, PENDING_STATE_SCHEMA)
        pend_spans = self.store.read("pending_spans", prev, PENDING_SPANS_SCHEMA)
        dec_state = self.store.read("decision_state", prev, DECISION_STATE_SCHEMA)

        if "flushes" not in raw_batch.columns:
            raw_batch = raw_batch.withColumn("flushes", F.lit(None).cast("int"))
        if "batch_idx" not in raw_batch.columns:
            raw_batch = raw_batch.withColumn("batch_idx", F.lit(b))

        spans = enrich_spans(parse_sequences(raw_batch)).persist()
        reg = spans.filter(~F.col("is_decision_span"))
        dec_spans = spans.filter(F.col("is_decision_span"))

        # -- 1. decision-span ingest (processor.go:436-480): first decision
        # per trace wins; conflicts with existing decision_state ignored.
        # Within-batch tiebreak: lowest span_id (the reference's "first
        # processed" is shard-arrival order; see SURVEY.md §7 hard part b).
        new_dec_from_spans = (
            dec_spans.groupBy("doc_id")
            .agg(F.min_by("decision_value", "span_id").alias("dv"))
            .join(dec_state.select("doc_id"), "doc_id", "left_anti")
            .select(
                "doc_id",
                F.when(F.col("dv"), F.lit(D.SAMPLED)).otherwise(F.lit(D.NOT_SAMPLED)).alias("decision"),
                F.lit(DECISION_SPAN_POLICY).alias("policy"),
                F.lit(b).alias("decided_batch"),
            )
        )
        dec_state_mid = dec_state.unionByName(new_dec_from_spans).persist()

        # -- 2. early decision check (processor.go:408-430): one join serves
        # both the pre-shard check and the per-shard recheck (batch-land is
        # single-pass).
        reg2 = reg.join(
            dec_state_mid.select("doc_id", F.col("decision").alias("prior_decision")),
            "doc_id",
            "left",
        )
        late_sampled = reg2.filter(F.col("prior_decision") == D.SAMPLED)
        late_dropped = reg2.filter(F.col("prior_decision") == D.NOT_SAMPLED)
        to_eval = reg2.filter(F.col("prior_decision").isNull()).drop("prior_decision").persist()

        # decision-span releases: newly Sampled via decision span frees the
        # cached payload (processor.go:466-476)
        decspan_sampled = new_dec_from_spans.filter(F.col("decision") == D.SAMPLED).select("doc_id")
        decspan_release = pend_spans.join(decspan_sampled, "doc_id", "left_semi")
        decspan_notsampled = new_dec_from_spans.filter(
            F.col("decision") == D.NOT_SAMPLED
        ).select("doc_id")
        decspan_dropped = pend_spans.join(decspan_notsampled, "doc_id", "left_semi")

        # -- 3. evaluate remaining traces
        agg = aggregate_batch(to_eval, self.policies, b)
        merged = merge_with_pending(agg, pend_state)
        merged = with_hash_columns(merged, self.policies)
        decided = post_decision_state(
            make_decision(merged, self.policies), self.policies
        ).persist()

        sampled = decided.filter(F.col("decision") == D.SAMPLED)
        not_sampled = decided.filter(F.col("decision") == D.NOT_SAMPLED)
        pending = decided.filter(F.col("decision").isin(D.PENDING, D.LOW_PRIORITY))

        sampled_keys = sampled.select("doc_id", "policy")
        not_sampled_keys = not_sampled.select("doc_id", "policy", "trace_hi", "trace_lo")

        # -- 4. keep sink (sendSampledTraceData strips the flush attr,
        # processor.go:501-511 → flushes_out null on normal releases)
        keep_parts = [
            late_sampled.select(*PASSTHROUGH).withColumns(
                {"reason": F.lit("late_sampled"), "policy": F.lit(None).cast("string")}
            ),
            decspan_release.select(*PASSTHROUGH).withColumns(
                {"reason": F.lit("decision_span_release"), "policy": F.lit(DECISION_SPAN_POLICY)}
            ),
            to_eval.join(sampled_keys, "doc_id", "inner").select(*PASSTHROUGH, "policy").withColumn(
                "reason", F.lit("sampled")
            ),
            pend_spans.join(sampled_keys, "doc_id", "inner").select(*PASSTHROUGH, "policy").withColumn(
                "reason", F.lit("sampled_cached")
            ),
        ]
        # not-sampled placeholder rows (processor.go:517-533): one synthetic
        # span named TRACE NOT SAMPLED for policies configured to emit it
        emit_names = [n for n, v in self._emit_placeholder.items() if v]
        if emit_names:
            ph = not_sampled.filter(F.col("policy").isin(emit_names)).select(
                "doc_id",
                placeholder_tokens(b).alias("tokens"),
                F.lit(codec.HEADER_LEN).alias("n_tok"),
                F.lit("not-sampled-dummy-service").alias("source"),
                F.lit(b).alias("batch_idx"),
                F.lit(None).cast("int").alias("flushes"),
                F.col("policy"),
                F.lit("not_sampled_placeholder").alias("reason"),
            )
            keep_parts.append(ph)

        keep = keep_parts[0]
        for part in keep_parts[1:]:
            keep = keep.unionByName(part)
        keep = keep.withColumn(
            "flushes_out", F.lit(None).cast("int")
        )  # flush attr stripped on normal sends

        # -- 5. pending-state rewrite
        touched = agg.select("doc_id").unionByName(
            new_dec_from_spans.select("doc_id")
        )
        untouched = pend_state.join(touched, "doc_id", "left_anti")
        updated = pending.select(
            "doc_id",
            "trace_hi",
            "trace_lo",
            F.col("total_span_count").alias("span_count"),
            F.col("merged_min_start").alias("min_start"),
            F.col("merged_max_end").alias("max_end"),
            F.col("arrival_batch"),
            F.lit(b).alias("last_seen_batch"),
            F.col("new_priority").alias("priority"),
            F.col("new_last_low_policy").alias("last_low_policy"),
            F.col("first_source"),
        )
        pend_mid = untouched.unionByName(updated)

        # -- 6. capacity eviction per tier (lru_cache.go:94-99 +
        # tiered_cache.go Put routing): rank by recency, newest first; rows
        # past capacity evict and become NotSampled decisions
        # (processor.go:626-658). Bounded input: ≤ capacity + batch traces.
        tier = F.when(F.col("priority") == D.PRIORITY_LOW, F.lit("secondary")).otherwise(
            F.lit("primary")
        )
        w = Window.partitionBy("tier").orderBy(
            F.desc("last_seen_batch"), F.desc("arrival_batch"), F.desc("doc_id")
        )
        ranked = pend_mid.withColumn("tier", tier).withColumn("rn", F.row_number().over(w))
        cap = F.when(
            F.col("tier") == "secondary", F.lit(self.engine.secondary_cache_size)
        ).otherwise(F.lit(self.engine.primary_capacity()))
        evicted = ranked.filter(F.col("rn") > cap).persist()
        pend_new = ranked.filter(F.col("rn") <= cap).drop("tier", "rn")

        # -- 7. pending payload rewrite (only read on release/flush,
        # DESIGN.md:100-108)
        new_pending_payload = to_eval.join(pending.select("doc_id"), "doc_id", "left_semi").select(
            *PASSTHROUGH
        )
        pend_spans_new = (
            pend_spans.unionByName(new_pending_payload)
            .join(pend_new.select("doc_id"), "doc_id", "left_semi")
        )

        # evicted payload → low-priority sink (secondary tier) / drop sink
        evicted_payload = pend_spans.unionByName(new_pending_payload).join(
            evicted.select("doc_id", "tier"), "doc_id", "inner"
        )
        low_sink = evicted_payload.filter(F.col("tier") == "secondary").select(
            *PASSTHROUGH
        ).withColumns({"reason": F.lit("evicted_secondary"), "policy": F.lit(EVICTION_POLICY)})
        drop_parts = [
            late_dropped.select(*PASSTHROUGH).withColumns(
                {"reason": F.lit("late_not_sampled"), "policy": F.lit(None).cast("string")}
            ),
            decspan_dropped.select(*PASSTHROUGH).withColumns(
                {"reason": F.lit("decision_span_drop"), "policy": F.lit(DECISION_SPAN_POLICY)}
            ),
            to_eval.join(not_sampled_keys.select("doc_id", "policy"), "doc_id", "inner")
            .select(*PASSTHROUGH, "policy")
            .withColumn("reason", F.lit("not_sampled")),
            pend_spans.join(not_sampled_keys.select("doc_id", "policy"), "doc_id", "inner")
            .select(*PASSTHROUGH, "policy")
            .withColumn("reason", F.lit("not_sampled_cached")),
            evicted_payload.filter(F.col("tier") == "primary")
            .select(*PASSTHROUGH)
            .withColumns({"reason": F.lit("evicted_primary"), "policy": F.lit(EVICTION_POLICY)}),
        ]
        drop = drop_parts[0]
        for part in drop_parts[1:]:
            drop = drop.unionByName(part)

        # -- 8. decision-state rewrite: prior ∪ new, then per-kind capacity
        new_decisions = (
            sampled.select(
                "doc_id", F.lit(D.SAMPLED).alias("decision"), "policy", F.lit(b).alias("decided_batch")
            )
            .unionByName(
                not_sampled.select(
                    "doc_id", F.lit(D.NOT_SAMPLED).alias("decision"), "policy",
                    F.lit(b).alias("decided_batch"),
                )
            )
            .unionByName(
                evicted.select(
                    "doc_id", F.lit(D.NOT_SAMPLED).alias("decision"),
                    F.lit(EVICTION_POLICY).alias("policy"), F.lit(b).alias("decided_batch"),
                )
            )
            .unionByName(new_dec_from_spans)
        )
        dec_mid = dec_state.unionByName(new_decisions)
        dw = Window.partitionBy("decision").orderBy(F.desc("decided_batch"), F.desc("doc_id"))
        dcap = F.when(
            F.col("decision") == D.SAMPLED, F.lit(self.engine.sampled_cache_size)
        ).otherwise(F.lit(self.engine.non_sampled_cache_size))
        dec_new = (
            dec_mid.withColumn("drn", F.row_number().over(dw)).filter(F.col("drn") <= dcap).drop("drn")
        )

        # -- 9. write sinks + state, then commit atomically
        kept_n = self._write_sink("keep", b, keep)
        dropped_n = self._write_sink("drop", b, drop)
        low_n = self._write_sink("low_priority", b, low_sink)

        res = BatchResult(batch_idx=b, kept=kept_n, dropped=dropped_n, low_evicted=low_n)
        res.sampled_traces = sampled.count()
        res.not_sampled_traces = not_sampled.count()
        res.evicted_traces = evicted.count()

        metrics = self._metrics_rows(b, decided, res)
        self.store.write("pending_state", b, pend_new)
        self.store.write("pending_spans", b, pend_spans_new)
        self.store.write("decision_state", b, dec_new)
        self.store.write("metrics", b, metrics)
        res.pending_traces = self.store.read("pending_state", b).count()
        self.store.commit(b)

        for df in (spans, dec_state_mid, to_eval, decided, evicted):
            df.unpersist()
        return res

    # -------------------------------------------------------------- telemetry

    def _metrics_rows(self, b: int, decided: DataFrame, res: BatchResult) -> DataFrame:
        """Per-batch metrics table mirroring the reference's counters
        (documentation.md:9-79; emission sites per BASELINE.md)."""
        pol_dec = (
            decided.filter(F.col("decision").isin(*D.DECISIVE))
            .groupBy("policy", "decision")
            .agg(F.count(F.lit(1)).alias("value"))
            .select(
                F.lit(b).alias("batch_idx"),
                F.lit("policy_decisions").alias("metric"),
                F.map_from_arrays(
                    F.array(F.lit("policy"), F.lit("decision")),
                    F.array(
                        F.col("policy"),
                        F.element_at(
                            F.array(*[F.lit(D.DECISION_NAMES[i]) for i in range(5)]),
                            F.col("decision") + 1,
                        ),
                    ),
                ).alias("labels"),
                F.col("value").cast("long"),
            )
        )
        scalar = self.spark.createDataFrame(
            [
                (b, "traces_sampled", {}, res.sampled_traces),
                (b, "traces_not_sampled", {}, res.evicted_traces),  # evictions only (processor.go:647)
                (b, "kept_rows", {}, res.kept),
                (b, "dropped_rows", {}, res.dropped),
            ],
            schema=METRICS_SCHEMA,
        )
        return pol_dec.unionByName(scalar)

    # ------------------------------------------------------------------- run

    def run(self, sequences: DataFrame, n_batches: int | None = None) -> list[BatchResult]:
        """Process a sequences table batch-by-batch in arrival order.
        Resumes after the last committed batch (checkpoint recovery)."""
        if n_batches is None:
            n_batches = sequences.agg(F.max("batch_idx")).collect()[0][0] + 1
        last = self.store.last_committed_batch()
        start = (last if last is not None else -1) + 1
        results = []
        for b in range(start, n_batches):
            batch = sequences.filter(F.col("batch_idx") == b)
            results.append(self.process_batch(batch, b))
        return results

    # ----------------------------------------------------------------- flush

    def flush(self) -> dict[str, int]:
        """Shutdown flush (processor.go:538-623): emit all pending payload
        with the flush counter incremented, export decisions as
        decision-span rows, clear state."""
        prev = self.store.last_committed_batch()
        b = (prev if prev is not None else -1) + 1
        pend_spans = self.store.read("pending_spans", prev, PENDING_SPANS_SCHEMA)
        pend_state = self.store.read("pending_state", prev, PENDING_STATE_SCHEMA)
        dec_state = self.store.read("decision_state", prev, DECISION_STATE_SCHEMA)

        # oldest-first (lru.Keys() order, processor.go:549-561) ≈ arrival order
        flushed = (
            pend_spans.join(pend_state.select("doc_id", "arrival_batch"), "doc_id", "left")
            .orderBy("arrival_batch", "doc_id")
            .select(*PASSTHROUGH)
            .withColumns(
                {
                    "reason": F.lit("flush"),
                    "policy": F.lit(None).cast("string"),
                    # atlassiansampling.flushes incremented (processor.go:591-603)
                    "flushes_out": (F.coalesce(F.col("flushes"), F.lit(0)) + 1).cast("int"),
                }
            )
        )
        kept = self._write_sink("keep", b, flushed)
        dec_export = dec_state.select(
            "doc_id",
            (F.col("decision") == D.SAMPLED).alias("decision_value"),
            "policy",
            "decided_batch",
        )
        dec_export.write.mode("overwrite").parquet(self._sink_path("decision_export", b))
        n_dec = dec_export.count()

        empty_p = _empty(self.spark, PENDING_STATE_SCHEMA)
        empty_s = _empty(self.spark, PENDING_SPANS_SCHEMA)
        empty_d = _empty(self.spark, DECISION_STATE_SCHEMA)
        self.store.write("pending_state", b, empty_p)
        self.store.write("pending_spans", b, empty_s)
        self.store.write("decision_state", b, empty_d)
        self.store.write("metrics", b, _empty(self.spark, METRICS_SCHEMA))
        self.store.commit(b)
        return {"flushed_rows": kept, "decision_rows": n_dec}


def placeholder_tokens(batch_idx: int):
    """Token header for the TRACE NOT SAMPLED placeholder span, built as a
    pure column expression from the decided row's trace id. Deterministic
    stand-ins: span_id = xxhash64(doc_id, batch), timestamps = batch-based
    (now−1s, now) per processor.go:523-531.
    """
    hi, lo = F.col("trace_hi"), F.col("trace_lo")
    span_id = F.xxhash64(F.col("doc_id"), F.lit("placeholder"), F.lit(batch_idx))
    from .datagen import BASE_NS

    start = BASE_NS + batch_idx * 1_000_000_000
    end = start + 1_000_000_000

    def chunks16(col):
        return [
            F.shiftrightunsigned(col, 16 * (3 - i)).bitwiseAND(F.lit(0xFFFF)).cast("int")
            for i in range(4)
        ]

    name_id = codec.NAMES.index("TRACE NOT SAMPLED")
    parts = (
        [F.lit(codec.MAGIC), F.lit(codec.VERSION)]
        + chunks16(hi)
        + chunks16(lo)
        + chunks16(span_id)
        + [F.lit(0)] * 4  # parent = 0
        + chunks16(F.lit(start))
        + chunks16(F.lit(end))
        + [
            F.lit(0),  # status UNSET
            F.lit(0),  # no threshold
            F.lit(0), F.lit(0), F.lit(0), F.lit(0),
            F.lit(name_id),
            F.lit(0),  # not a decision span
            F.lit(0),
            F.lit(-1),  # flushes absent
            F.lit(-1),  # no event
            F.lit(0),  # no attrs (sampling.policy carried as a column)
            F.lit(0),  # source id placeholder
            F.lit(-1),
        ]
    )
    assert len(parts) == codec.HEADER_LEN
    return F.array(*parts)
