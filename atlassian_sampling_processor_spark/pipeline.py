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
* The token payload is never shuffled: the per-trace agg shuffles only
  pruned numeric columns (partial aggregation map-side), and routing
  joins broadcast the small per-trace decision tables. The reference's
  shard co-location (util.go:42-49) is the agg's hash partitioning.
* State joins are on doc_id; with Iceberg/bucketed state tables they're
  co-partitioned and shuffle-free. Here (plain parquet) AQE picks
  broadcast when state is small.
* Capacity eviction ranks per tier; the ranked input is bounded by
  (capacity + batch trace count) per tier, so the single-partition
  window is bounded, not O(corpus). For very large capacities, swap to
  a two-level rank (per-partition top-K then global).
* Micro-batch job count is deliberately minimal: ONE partitioned write
  for all three sinks with Observation-counted rows (no re-reads), one
  write per state table, and a driver-side metrics build from the
  observed counters — fixed overhead per batch stays ~6 Spark actions.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from . import codec
from . import decision as D
from .aggregate import aggregate_batch, merge_with_pending, with_hash_columns
from .config import EngineConfig
from .decider import make_decision, post_decision_state
from .parse import enrich_core, enrich_spans, parse_sequences
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

ROUTED_SCHEMA = (
    PENDING_SPANS_SCHEMA
    + ", policy string, reason string, flushes_out int, partition_id int,"
    " released_batch int, sink string, batch int"
)

EVICTION_POLICY = "__evicted__"
DECISION_SPAN_POLICY = "__decision_span__"


def plan_decision_eviction(
    counts: dict[int, list[int]],
    wm: dict[int, int],
    caps: dict[int, int],
    b: int,
    kinds: tuple = None,
) -> tuple[list[tuple[int, int, int]], dict[int, tuple[int, int]]]:
    """FIFO epoch-cache eviction plan — pure driver arithmetic. Shared by
    the decision caches (kinds = Sampled/NotSampled over decided_batch
    epochs) and, since round 5, the pending cache (kinds = primary/
    secondary tiers over last_seen_batch epochs).

    ``counts``: per-epoch per-kind live counts (list indexed like
    ``kinds``); ``wm``: per-kind watermark (epochs ≤ wm are dead for that
    kind); ``caps``: per-kind capacity. Mutates counts/wm in place and
    returns ``(partial_requests, eviction_ages)`` where a partial request
    ``(kind, epoch, k)`` asks for the k lowest in-epoch-order rows of
    that kind in that epoch (the same victims as a keep-order recency
    rank) and ages are ``{kind: (n_evicted, Σ(b - epoch))}``
    (decision_eviction_time, processor.go:665-674, in batch units)."""
    kidx = {k: i for i, k in enumerate(kinds if kinds is not None else D.CACHED_KINDS)}
    partial_req: list[tuple[int, int, int]] = []
    dec_ev_age: dict[int, tuple[int, int]] = {}
    for kind, cap in caps.items():
        i = kidx[kind]
        w = wm.get(kind, -1)
        over = sum(cnt[i] for e, cnt in counts.items() if e > w) - cap
        if over <= 0:
            continue
        n_ev, age = 0, 0
        for e in sorted(e for e in counts if e > w):
            n = counts[e][i]
            if n <= over:  # whole epoch falls off — no job at all
                wm[kind] = e
                over -= n
                counts[e][i] = 0
                n_ev += n
                age += n * (b - e)
            else:
                partial_req.append((kind, e, over))
                counts[e][i] = n - over
                n_ev += over
                age += over * (b - e)
                over = 0
            if over == 0:
                break
        dec_ev_age[kind] = (n_ev, age)
    return partial_req, dec_ev_age


def _empty(spark: SparkSession, schema) -> DataFrame:
    return spark.createDataFrame([], schema=schema)


class _Prof:
    """Per-phase wall clock for the batch's driver actions, printed when
    ASP_PROFILE=1 — the tool that finds serial (Amdahl) overhead."""

    def __init__(self, batch: int):
        self.on = os.environ.get("ASP_PROFILE") == "1"
        self.batch = batch
        self.t = time.perf_counter()

    def mark(self, phase: str) -> None:
        if not self.on:
            return
        now = time.perf_counter()
        print(f"[prof b{self.batch}] {phase}: {now - self.t:.2f}s", flush=True)
        self.t = now


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
        self.store = StateStore(
            spark, checkpoint_dir, compact_every=self.engine.state_compact_every
        )
        self.out = output_dir
        self._emit_placeholder = {
            p.name: p.emit_single_span_for_not_sampled for p in policies
        }

    def _needs_span_strings(self) -> bool:
        from .policies import OTTLCondition

        def walk(p):
            if isinstance(p, OTTLCondition):
                return True
            subs = getattr(p, "sub_policies", None) or (
                [p.sub_policy] if getattr(p, "sub_policy", None) else []
            )
            return any(walk(s) for s in subs)

        return any(walk(p) for p in self.policies)

    # ------------------------------------------------------------------ sinks

    def _write_routed(self, batch: int, df: DataFrame) -> dict:
        """Single write for all sinks, partitioned by sink name;
        row counts come from an Observation on the same action."""
        obs = Observation(f"routed_{batch}")
        df = (
            df.withColumn("partition_id", F.spark_partition_id())
            .withColumn("released_batch", F.lit(batch))
            .observe(
                obs,
                F.sum((F.col("sink") == "keep").cast("long")).alias("kept"),
                F.sum((F.col("sink") == "drop").cast("long")).alias("dropped"),
                F.sum((F.col("sink") == "low_priority").cast("long")).alias("low"),
                F.sum((F.col("reason") == "internal_error").cast("long")).alias("interr"),
            )
        )
        df.write.mode("overwrite").partitionBy("sink").parquet(
            f"{self.out}/routed/batch={batch}"
        )
        got = obs.get
        return {k: int(got[k] or 0) for k in ("kept", "dropped", "low", "interr")}

    def read_sink(self, sink: str) -> DataFrame:
        import glob

        base = f"{self.out}/routed"
        paths = sorted(glob.glob(f"{base}/batch=*/sink={sink}"))
        if not paths:
            return _empty(self.spark, ROUTED_SCHEMA).drop("sink")
        df = self.spark.read.option("basePath", base).parquet(*paths)
        return df.drop("sink")

    # ------------------------------------------------------------- batch step

    def process_batch(self, raw_batch: DataFrame, b: int) -> BatchResult:
        prof = _Prof(b)
        t_batch0 = time.perf_counter()
        prev = self.store.last_committed_batch()
        pend_state = self.store.read("pending_state", prev, PENDING_STATE_SCHEMA)
        pend_spans = self.store.read("pending_spans", prev, PENDING_SPANS_SCHEMA)
        # nop decision cache (nop_cache.go:11-40): Get always misses, so
        # the early-decision join sees an empty cache even on a checkpoint
        # that held decisions before a reconfigure to capacity 0
        nop_dec = (
            self.engine.sampled_cache_size == 0
            and self.engine.non_sampled_cache_size == 0
        )
        dec_state = (
            _empty(self.spark, DECISION_STATE_SCHEMA)
            if nop_dec
            else self.store.read("decision_state", prev, DECISION_STATE_SCHEMA)
        )

        if "flushes" not in raw_batch.columns:
            raw_batch = raw_batch.withColumn("flushes", F.lit(None).cast("int"))
        if "batch_idx" not in raw_batch.columns:
            raw_batch = raw_batch.withColumn("batch_idx", F.lit(b))

        # Parse is a narrow map (expression decoder); the per-trace agg
        # shuffles only the pruned numeric columns, and the small per-trace
        # decision/state tables broadcast (64MB threshold) — the token
        # payload itself is never shuffled. (The reference's
        # shardIDForTrace co-location, util.go:42-49, maps to the agg's
        # hash partitioning on doc_id.) String/map enrichment (attrs,
        # names) is only materialized when a configured policy actually
        # reads it (OTTL); the numeric core carries everything else.
        enrich = enrich_spans if self._needs_span_strings() else enrich_core
        # no persist: every consumer branch column-prunes its own scan of
        # the (page-cached) batch parquet, which beats materializing the
        # full token payload into the block store
        # internal-error guard (reportTraceDataErr, processor.go:676-680):
        # rows whose token header fails validation can't be decoded —
        # routed to the drop sink with reason=internal_error and counted
        # into internal_error_dropped_spans (the reference drops silently;
        # a sink row keeps our conservation invariant auditable). The
        # filter sits BELOW the decoder so ANSI element_at never sees a
        # short array.
        valid = F.coalesce(
            (F.size("tokens") >= codec.HEADER_LEN)
            & (F.try_element_at("tokens", F.lit(1)) == codec.MAGIC)
            & (F.try_element_at("tokens", F.lit(2)) == codec.VERSION),
            F.lit(False),  # NULL (e.g. null tokens) counts as invalid
        )
        bad_spans = raw_batch.filter(~valid)
        spans = enrich(parse_sequences(raw_batch.filter(valid)))
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
            .persist()
        )
        prof.mark("decision_span_ingest")
        dec_state_mid = dec_state.unionByName(new_dec_from_spans)

        # -- 2. early decision check (processor.go:408-430): one join serves
        # both the pre-shard check and the per-shard recheck.
        reg2 = reg.join(
            dec_state_mid.select("doc_id", F.col("decision").alias("prior_decision")),
            "doc_id",
            "left",
        )
        late_sampled = reg2.filter(F.col("prior_decision") == D.SAMPLED)
        late_dropped = reg2.filter(F.col("prior_decision") == D.NOT_SAMPLED)
        to_eval = reg2.filter(F.col("prior_decision").isNull()).drop("prior_decision")

        decspan_sampled = new_dec_from_spans.filter(F.col("decision") == D.SAMPLED).select("doc_id")
        decspan_notsampled = new_dec_from_spans.filter(
            F.col("decision") == D.NOT_SAMPLED
        ).select("doc_id")

        # -- 3. evaluate remaining traces
        agg = aggregate_batch(to_eval, self.policies, b, salt_buckets=self.engine.salt_buckets)
        merged = merge_with_pending(agg, pend_state)
        merged = with_hash_columns(merged, self.policies)
        decided = post_decision_state(
            make_decision(merged, self.policies), self.policies
        ).persist()

        sampled = decided.filter(F.col("decision") == D.SAMPLED)
        not_sampled = decided.filter(F.col("decision") == D.NOT_SAMPLED)
        pending = decided.filter(F.col("decision").isin(D.PENDING, D.LOW_PRIORITY))

        sampled_keys = sampled.select("doc_id", "policy")
        not_sampled_keys = not_sampled.select("doc_id", "policy")

        # -- 4. pending-state rewrite (puts before eviction,
        # tiered_cache.go:41-49). `decided` carries exactly the batch's
        # evaluated trace keys (row-preserving over the agg) and is
        # persisted — reading it beats recomputing the agg lineage in
        # every downstream join that needs the touched key set.
        touched = decided.select("doc_id").unionByName(
            new_dec_from_spans.select("doc_id")
        )
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

        # -- 5. capacity eviction per tier (lru_cache.go:94-99): rows past
        # capacity evict ⇒ NotSampled (processor.go:626-658), keep-order
        # desc(last_seen_batch, arrival_batch, doc_id). Round 5: the
        # pending cache is a FIFO-by-last_seen-epoch store like the
        # decision caches — recency refreshes are delta-shaped MOVES
        # (touched rows leave their old epoch + re-enter epoch b), so
        # per-epoch per-tier live counts are pure driver arithmetic and
        # eviction is a watermark advance plus at most one boundary-epoch
        # partial read per tier. The full-capacity recency rank (and the
        # per-batch full-set tier-count agg) of rounds 2–4 is gone; the
        # victim key-set is identical (tested differentially against the
        # rank plan in tests/test_round5_pending_epochs.py and against
        # the independent simulator in tests/test_differential.py).
        tier = F.when(F.col("priority") == D.PRIORITY_LOW, F.lit("secondary")).otherwise(
            F.lit("primary")
        )
        prim_cap = self.engine.primary_capacity()
        sec_cap = self.engine.secondary_cache_size
        TIERS = ("primary", "secondary")
        tidx = {t: i for i, t in enumerate(TIERS)}
        caps_pend = {"primary": prim_cap, "secondary": sec_cap}

        pem = self.store.read_evmeta("pending_state", prev) if prev is not None else None
        if pem is None:
            # first epoch-era batch: derive per-epoch per-tier counts from
            # the resolved legacy chain once (old checkpoints resume)
            pcounts: dict[int, list[int]] = {}
            if prev is not None:
                for r in (
                    pend_state.groupBy(
                        F.col("last_seen_batch").alias("e"), tier.alias("t")
                    )
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                ):
                    c = pcounts.setdefault(int(r["e"]), [0, 0])
                    c[tidx[r["t"]]] += int(r["n"])
            pwm: dict[str, int] = {}
        else:
            pcounts = {int(e): [int(c[0]), int(c[1])] for e, c in pem["counts"].items()}
            pwm = {k: int(v) for k, v in pem["wm"].items()}

        # delta-shaped epoch moves: touched pending rows leave their old
        # epochs (their keys also become this batch's evict keys), updated
        # rows enter epoch b. `moved` is O(batch ∩ pending) — tiny — and
        # reused by the state write below. The evaluated traces' old rows
        # come straight from the persisted decision frame (the merge
        # already joined them — cached_* columns), so the eviction step
        # performs NO full-capacity scan; only the rare decision-span
        # ingest path needs a pending_state key lookup.
        moved = decided.filter(F.col("cached_span_count").isNotNull()).select(
            "doc_id",
            F.col("cached_last_seen_batch").alias("last_seen_batch"),
            F.col("cached_priority").alias("priority"),
        )
        if not new_dec_from_spans.isEmpty():
            moved = moved.unionByName(
                pend_state.join(
                    new_dec_from_spans.select("doc_id"), "doc_id", "leftsemi"
                ).select("doc_id", "last_seen_batch", "priority")
            )
        moved = moved.persist()
        mv = (
            moved.select(
                F.col("last_seen_batch").alias("e"), tier.alias("t"), F.lit(-1).alias("d")
            )
            .unionByName(
                updated.select(F.lit(b).alias("e"), tier.alias("t"), F.lit(1).alias("d"))
            )
            .groupBy("e", "t")
            .agg(F.sum("d").alias("d"))
            .collect()
        )
        for r in mv:
            c = pcounts.setdefault(int(r["e"]), [0, 0])
            c[tidx[r["t"]]] += int(r["d"])
        prof.mark("decide+pending_moves")

        old_pwm = dict(pwm)
        pre_counts = {e: list(c) for e, c in pcounts.items()}
        partial_pend, planned_ev = plan_decision_eviction(
            pcounts, pwm, caps_pend, b, kinds=TIERS
        )

        def pend_slice(e: int) -> DataFrame:
            """Live tier rows of one last_seen epoch as of this batch:
            epoch b is the in-memory `updated` set; older epochs read ONE
            epoch file/partition and drop this batch's moved rows."""
            if e == b:
                return updated
            return self.store.read_epoch_slice(
                "pending_state", prev, e, PENDING_STATE_SCHEMA
            ).join(touched, "doc_id", "left_anti")

        ev_age = {}  # tier -> sum of eviction ages in batches (see _metrics_rows)
        evicted_full = None
        ev_parts = []
        for t in TIERS:
            lo, hi = old_pwm.get(t, -1), pwm.get(t, -1)
            whole = sorted(
                e for e in pre_counts
                if lo < e <= hi and pre_counts[e][tidx[t]] > 0
            )
            for e in whole:
                ev_parts.append(
                    pend_slice(e)
                    .filter(tier == t)
                    .select(
                        "doc_id", F.lit(t).alias("tier"), "arrival_batch",
                        F.lit(e).alias("ev_epoch"),
                    )
                )
        for t, e, k in partial_pend:
            # boundary-epoch partial eviction: the k lowest
            # (arrival_batch, doc_id) — exactly the recency rank's victims
            ev_parts.append(
                pend_slice(e)
                .filter(tier == t)
                .orderBy("arrival_batch", "doc_id")
                .limit(k)
                .select(
                    "doc_id", F.lit(t).alias("tier"), "arrival_batch",
                    F.lit(e).alias("ev_epoch"),
                )
            )
        if not ev_parts:
            evicted = _empty(self.spark, "doc_id string, tier string")
            n_evicted = 0
        else:
            evicted_full = ev_parts[0]
            for part in ev_parts[1:]:
                evicted_full = evicted_full.unionByName(part)
            evicted_full = evicted_full.persist()
            # one agg: per-tier counts + eviction AGE (batches since
            # arrival — trace_eviction_time, processor.go:653-663)
            ev_stats = (
                evicted_full.groupBy("tier")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.lit(b) - F.col("arrival_batch")).alias("age"),
                )
                .collect()
            )
            n_evicted = sum(r["n"] for r in ev_stats)
            ev_age = {r["tier"]: int(r["age"] or 0) for r in ev_stats}
            evicted = evicted_full.select("doc_id", "tier")
            # fail fast if the driver-side counts ever drift from the
            # stored epochs — silent drift would evict the wrong rows
            got_ev = {r["tier"]: int(r["n"]) for r in ev_stats}
            want_ev = {t: n for t, (n, _) in planned_ev.items() if n}
            if got_ev != want_ev:
                raise RuntimeError(
                    f"pending epoch-count drift at batch {b}: planned "
                    f"evictions {want_ev}, stored epochs yielded {got_ev}"
                )

        # -- 6. route everything to one partitioned sink write. Current-batch
        # spans get their trace's decision in ONE join (the shuffle reuses
        # the doc_id partitioning); cached payload resolves against a small
        # per-trace outcome table in one more join.
        def tag(df, sink, reason, policy_col=None):
            pol = policy_col if policy_col is not None else F.lit(None).cast("string")
            return df.select(
                *PASSTHROUGH,
                pol.alias("policy"),
                F.lit(reason).alias("reason"),
                F.lit(None).cast("int").alias("flushes_out"),
                F.lit(sink).alias("sink"),
            )

        span_route = to_eval.join(
            decided.select("doc_id", F.col("decision").alias("_d"), F.col("policy").alias("_p")),
            "doc_id",
            "left",
        )
        new_pending_payload = span_route.filter(F.col("_d").isin(D.PENDING, D.LOW_PRIORITY)).select(
            *PASSTHROUGH
        )
        all_payload = pend_spans.unionByName(new_pending_payload)

        # disjoint per-trace outcomes for the cached payload: a sampled /
        # not-sampled doc has payload only in old pend_spans; an evicted doc
        # may have payload in either
        def outcome(keys, sink, reason, policy_col=None):
            pol = policy_col if policy_col is not None else F.lit(None).cast("string")
            return keys.select(
                "doc_id", pol.alias("_op"), F.lit(sink).alias("_sink"), F.lit(reason).alias("_reason")
            )

        outcomes = (
            outcome(sampled_keys, "keep", "sampled_cached", F.col("policy"))
            .unionByName(outcome(not_sampled_keys, "drop", "not_sampled_cached", F.col("policy")))
            .unionByName(outcome(decspan_sampled, "keep", "decision_span_release", F.lit(DECISION_SPAN_POLICY)))
            .unionByName(outcome(decspan_notsampled, "drop", "decision_span_drop", F.lit(DECISION_SPAN_POLICY)))
            .unionByName(
                outcome(
                    evicted.filter(F.col("tier") == "primary"), "drop", "evicted_primary",
                    F.lit(EVICTION_POLICY),
                )
            )
            .unionByName(
                outcome(
                    evicted.filter(F.col("tier") == "secondary"), "low_priority",
                    "evicted_secondary", F.lit(EVICTION_POLICY),
                )
            )
        )
        cached_routed = all_payload.join(outcomes, "doc_id", "inner").select(
            *PASSTHROUGH,
            F.col("_op").alias("policy"),
            F.col("_reason").alias("reason"),
            F.lit(None).cast("int").alias("flushes_out"),
            F.col("_sink").alias("sink"),
        )

        routed_parts = [
            tag(late_sampled, "keep", "late_sampled"),
            tag(span_route.filter(F.col("_d") == D.SAMPLED), "keep", "sampled", F.col("_p")),
            tag(late_dropped, "drop", "late_not_sampled"),
            tag(span_route.filter(F.col("_d") == D.NOT_SAMPLED), "drop", "not_sampled", F.col("_p")),
            tag(bad_spans, "drop", "internal_error"),
            cached_routed,
        ]
        # not-sampled placeholder rows (processor.go:517-533)
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
                F.lit(None).cast("int").alias("flushes_out"),
                F.lit("keep").alias("sink"),
            )
            routed_parts.append(ph)

        routed = routed_parts[0]
        for part in routed_parts[1:]:
            routed = routed.unionByName(part)
        # sampled forward strips the flush-count attr (processor.go:497-503
        # sendSampledTraceData) — kept rows carry flushes = NULL; the
        # shutdown flush path (flush()) is the one that sets it
        routed = routed.withColumn(
            "flushes",
            F.when(F.col("sink") == "keep", F.lit(None).cast("int")).otherwise(
                F.col("flushes")
            ),
        )
        prof.mark("eviction")

        # -- 7. decision state derivations (lazy — actions below)
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
        evicted_keys = evicted.select("doc_id")
        # live pending totals are driver arithmetic now (plan mutated
        # pcounts in place) — no full-set count job
        n_pending = sum(
            c[tidx[t]]
            for e, c in pcounts.items()
            for t in TIERS
            if e > pwm.get(t, -1)
        )

        # -- 8. run the batch's independent output jobs CONCURRENTLY. The
        # sink write, the two pending-state writes, and the counters/
        # decision-cache chain share no data dependencies (everything they
        # read — `decided`, `evicted`, `new_dec_from_spans` — is persisted
        # or upstream-complete), so submitting them from threads lets the
        # scheduler interleave their tasks and overlaps each job's
        # driver-side planning with the others' execution. Sequential
        # submission made this latency strictly additive — ~half the
        # batch's wall at high core counts was the driver waiting between
        # jobs (the serial term the N→4N scaling criterion punishes).
        from concurrent.futures import ThreadPoolExecutor

        from .decider import decision_from_column

        def job_routed():
            return self._write_routed(b, routed)

        def job_pending_state():
            # O(delta) epoch commit (round 5, mirrors job_decision_state):
            # epoch b = this batch's still-pending rows; evict keys =
            # moved rows' old (doc_id, last_seen_batch) pairs plus
            # eviction victims in older epochs (whole-epoch victims'
            # keys are redundant with the watermark but harmless — the
            # volume is O(batch) either way); watermarks + per-epoch
            # counts ride the versioned evmeta. The reference's in-place
            # cache puts (lru_cache.go:63-71) cost O(1) per touch; this
            # is the snapshot-isolation equivalent, now O(1)-in-capacity
            # on the eviction side too.
            self.store.write_epoch(
                "pending_state",
                b,
                updated.join(evicted_keys, "doc_id", "left_anti"),
            )
            removal = moved.select("doc_id", "last_seen_batch")
            if evicted_full is not None:
                removal = removal.unionByName(
                    evicted_full.filter(F.col("ev_epoch") != b).select(
                        "doc_id", F.col("ev_epoch").alias("last_seen_batch")
                    )
                )
            self.store.write_evict("pending_state", b, removal)
            min_pwm = min(pwm.get(t, -1) for t in TIERS)
            live_counts = {
                e: c for e, c in pcounts.items()
                if e > min_pwm and (c[0] > 0 or c[1] > 0)
            }
            self.store.write_evmeta(
                "pending_state", b,
                {"wm": dict(pwm),
                 "counts": {str(e): c for e, c in live_counts.items()}},
            )
            if (
                self.store.n_epochs_since_floor("pending_state", b)
                >= self.engine.state_compact_every
            ):
                self.store.compact_epochs("pending_state", b, PENDING_STATE_SCHEMA)

        def job_pending_spans():
            # payload is append-only while pending: new rows insert with NO
            # tombstone (older payload of the same trace must survive);
            # terminal/evicted traces tombstone all their rows
            self.store.write_delta(
                "pending_spans",
                b,
                prev,
                inserts=new_pending_payload.join(evicted_keys, "doc_id", "left_anti"),
                tombstone_keys=outcomes.select("doc_id"),
                schema=PENDING_SPANS_SCHEMA,
            )

        def job_counts():
            # policy_decisions telemetry with the decision_from grouping
            # dimension (decider.go:60-74), one small collect over the
            # persisted per-trace decisions
            dec_counts = {
                (r["policy"], r["decision"], r["decision_from"]): r["n"]
                for r in decided.filter(F.col("decision").isin(*D.DECISIVE))
                .withColumn("decision_from", decision_from_column(self.policies))
                .groupBy("policy", "decision", "decision_from")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            # policy-error telemetry: count traces whose evaluation
            # errored (decision Unspecified) per TOP-LEVEL policy — the
            # reference's log-and-continue warning (decider.go:46-48),
            # which fires for ANY evaluator error, including a propagate
            # OTTL nested inside and/root_spans/downgrader (the sub's
            # Unspecified propagates to the composite's decision). Only
            # policies the decider actually evaluated count (i ≤
            # decisive index), matching the loop.
            prop = [(i, p.name) for i, p in enumerate(self.policies)]
            agg_exprs = [
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("cached_span_count").isNotNull().cast("long")).alias("hits"),
            ] + [
                F.sum(
                    (
                        (
                            F.col("policy_index").isNull()
                            | (F.lit(i) <= F.col("policy_index"))
                        )
                        & (F.element_at("policy_decisions", i + 1) == D.UNSPECIFIED)
                    ).cast("long")
                ).alias(f"_e{i}")
                for i, _ in prop
            ]
            # cache_reads hit/miss (lru_cache.go:49-58) share the same agg
            cache_stats = decided.agg(*agg_exprs).collect()[0]
            err_counts = {
                name: int(cache_stats[f"_e{i}"] or 0) for i, name in prop
            }
            return dec_counts, cache_stats, err_counts

        def job_decision_state(n_sampled: int, n_not_sampled: int):
            # Decision caches (two FIFO caches over immutable first-wins
            # decisions, processor.go:142-148). LRU order ≡ insertion
            # order because decisions are never recency-refreshed, so
            # capacity eviction is a pure driver-side watermark advance
            # over `decided_batch` epochs — O(1) per batch, no job — plus
            # at most one O(boundary-epoch) partial-evict job. The per-
            # epoch per-kind counts ride the versioned evmeta JSON; the
            # evicted key-set is identical to the old full-chain rank
            # (asserted in tests/test_round4_epochs.py).
            dec_ev_age: dict[int, tuple[int, int]] = {}
            if self.engine.sampled_cache_size == 0 and self.engine.non_sampled_cache_size == 0:
                # nop decision cache (nop_cache.go:11-40): decisions are
                # never remembered — late spans of a decided trace
                # re-evaluate from scratch next batch. Truncate (legacy
                # empty write shadows the whole history) so a checkpoint
                # that held decisions before a reconfigure forgets them.
                self.store.write(
                    "decision_state", b, _empty(self.spark, DECISION_STATE_SCHEMA)
                )
                self.store.write_evmeta("decision_state", b, {"wm": {}, "counts": {}})
                return 0, 0, dec_ev_age
            # O(delta) epoch append — the ONLY per-batch write
            self.store.write_epoch("decision_state", b, new_decisions)
            ds_counts = {
                r["decision"]: r["n"]
                for r in new_dec_from_spans.groupBy("decision")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            new_s = n_sampled + ds_counts.get(D.SAMPLED, 0)
            new_ns = n_not_sampled + n_evicted + ds_counts.get(D.NOT_SAMPLED, 0)
            em = self.store.read_evmeta("decision_state", prev) if prev is not None else None
            if em is None:
                # first epoch-era batch: derive per-epoch counts from the
                # resolved legacy chain once (old checkpoints resume)
                counts: dict[int, list[int]] = {}
                if prev is not None:
                    for r in (
                        dec_state.groupBy("decided_batch", "decision")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .collect()
                    ):
                        c = counts.setdefault(int(r["decided_batch"]), [0, 0])
                        if r["decision"] == D.SAMPLED:
                            c[0] += r["n"]
                        elif r["decision"] == D.NOT_SAMPLED:
                            c[1] += r["n"]
                wm: dict[int, int] = {}
            else:
                counts = {int(e): [int(c[0]), int(c[1])] for e, c in em["counts"].items()}
                wm = {int(k): int(v) for k, v in em["wm"].items()}
            c = counts.setdefault(b, [0, 0])
            c[0] += new_s
            c[1] += new_ns
            caps = {
                D.SAMPLED: self.engine.sampled_cache_size,
                D.NOT_SAMPLED: self.engine.non_sampled_cache_size,
            }
            partial_req, dec_ev_age = plan_decision_eviction(counts, wm, caps, b)
            if partial_req:
                # read ONE epoch per request (its append file or base
                # partition directory), never the capacity
                ev_parts = [
                    self.store.read_epoch_slice(
                        "decision_state", b, e, DECISION_STATE_SCHEMA
                    )
                    .filter(F.col("decision") == kind)
                    .orderBy("doc_id")
                    .limit(k)
                    .select("doc_id", "decided_batch")
                    for kind, e, k in partial_req
                ]
                ev = ev_parts[0]
                for part in ev_parts[1:]:
                    ev = ev.unionByName(part)
                self.store.write_evict("decision_state", b, ev)
            # an epoch is fully dead only when BOTH kinds' watermarks have
            # passed it (a kind absent from wm has watermark -1)
            min_wm = min(wm.get(D.SAMPLED, -1), wm.get(D.NOT_SAMPLED, -1))
            counts = {
                e: cnt for e, cnt in counts.items()
                if e > min_wm and (cnt[0] > 0 or cnt[1] > 0)
            }
            self.store.write_evmeta(
                "decision_state", b,
                {"wm": {str(k): v for k, v in wm.items()},
                 "counts": {str(e): cnt for e, cnt in counts.items()}},
            )
            if (
                self.store.n_epochs_since_floor("decision_state", b)
                >= self.engine.state_compact_every
            ):
                self.store.compact_epochs("decision_state", b, DECISION_STATE_SCHEMA)
            tot_s = sum(cnt[0] for e, cnt in counts.items() if e > wm.get(D.SAMPLED, -1))
            tot_ns = sum(
                cnt[1] for e, cnt in counts.items() if e > wm.get(D.NOT_SAMPLED, -1)
            )
            return tot_s, tot_ns, dec_ev_age

        def job_counts_then_decisions():
            dec_counts, cache_stats, err_counts = job_counts()
            n_s = sum(n for (p, d, g), n in dec_counts.items() if d == D.SAMPLED)
            n_ns = sum(n for (p, d, g), n in dec_counts.items() if d == D.NOT_SAMPLED)
            return dec_counts, cache_stats, err_counts, n_s, n_ns, job_decision_state(n_s, n_ns)

        with ThreadPoolExecutor(max_workers=4) as ex:
            f_routed = ex.submit(job_routed)
            f_pend_state = ex.submit(job_pending_state)
            f_pend_spans = ex.submit(job_pending_spans)
            f_chain = ex.submit(job_counts_then_decisions)
            sink_counts = f_routed.result()
            f_pend_state.result()
            f_pend_spans.result()
            (
                dec_counts, cache_stats, err_counts,
                n_sampled, n_not_sampled, dec_state_out,
            ) = f_chain.result()
        tot_s, tot_ns, dec_ev_age = dec_state_out
        prof.mark("concurrent_writes+counts")

        res = BatchResult(
            batch_idx=b,
            kept=sink_counts["kept"],
            dropped=sink_counts["dropped"],
            low_evicted=sink_counts["low"],
            sampled_traces=n_sampled,
            not_sampled_traces=n_not_sampled,
            evicted_traces=n_evicted,
            pending_traces=n_pending,
        )
        hits = int(cache_stats["hits"] or 0)
        misses = int(cache_stats["n"] or 0) - hits
        self.store.write(
            "metrics",
            b,
            self._metrics_rows(
                b,
                dec_counts,
                res,
                hits=hits,
                misses=misses,
                internal_errors=sink_counts["interr"],
                ev_age=ev_age,
                dec_ev_age=dec_ev_age,
                batch_wall_ms=int((time.perf_counter() - t_batch0) * 1000),
                err_counts=err_counts,
            ),
        )
        prof.mark("metrics_write")
        self.store.commit(b, meta={"dec_sampled": tot_s, "dec_not_sampled": tot_ns})
        prof.mark("commit")

        for df in (decided, new_dec_from_spans, moved):
            df.unpersist()
        if evicted_full is not None:
            evicted_full.unpersist()
        return res

    # -------------------------------------------------------------- telemetry

    def _metrics_rows(
        self,
        b: int,
        dec_counts: dict,
        res: BatchResult,
        hits: int = 0,
        misses: int = 0,
        internal_errors: int = 0,
        ev_age: dict | None = None,
        dec_ev_age: dict | None = None,
        batch_wall_ms: int = 0,
        err_counts: dict | None = None,
    ) -> DataFrame:
        """Per-batch metrics table mirroring the reference's counters
        (documentation.md:9-79; emission sites per BASELINE.md). Built
        driver-side from already-collected counters — zero extra jobs."""
        rows = [
            (
                b,
                "policy_decisions",
                {
                    "policy": str(p),
                    "decision": D.DECISION_NAMES[d],
                    "decision_from": str(g or ""),
                },
                int(n),
            )
            for (p, d, g), n in sorted(dec_counts.items(), key=str)
        ]
        rows += [
            (b, "traces_sampled", {}, res.sampled_traces),
            # evictions only (processor.go:647)
            (b, "traces_not_sampled", {}, res.evicted_traces),
            (b, "policy_decisions", {"policy": EVICTION_POLICY, "decision": "NotSampled"}, res.evicted_traces),
            (b, "cache_reads", {"cache": "trace_data", "hit": "true"}, hits),
            (b, "cache_reads", {"cache": "trace_data", "hit": "false"}, misses),
            (b, "kept_rows", {}, res.kept),
            (b, "dropped_rows", {}, res.dropped),
            (b, "primary_cache_size", {}, res.pending_traces),
            # internal_error_dropped_spans (processor.go:676-680): rows the
            # decoder rejected (routed to drop with reason=internal_error)
            (b, "internal_error_dropped_spans", {}, internal_errors),
            # chan_blocking_time analogue (documentation.md:17-23): the
            # reference histograms time spans wait on shard channels; the
            # Spark engine has no channels, so the closest honest signal
            # is the batch's end-to-end wall — the queueing delay the
            # NEXT arrival slice experiences.
            (b, "batch_wall_time_ms", {}, batch_wall_ms),
        ]
        # policy evaluation errors (error_mode=propagate): the decider's
        # log-and-continue path (decider.go:46-48) as a metric dimension
        for name, n in sorted((err_counts or {}).items()):
            if n:
                rows.append((
                    b,
                    "policy_decisions",
                    {"policy": str(name), "decision": "Unspecified", "error": "true"},
                    int(n),
                ))
        # trace_eviction_time (processor.go:653-663): summed eviction age in
        # BATCH units per cache tier (the reference records wall seconds per
        # eviction; batch index is this engine's clock). Emitted only on
        # batches that evicted.
        for tier_name, age in sorted((ev_age or {}).items()):
            rows.append((b, "trace_eviction_time", {"cache": tier_name}, age))
        # decision_eviction_time (processor.go:665-674), per decision kind
        for dec, (n, age) in sorted((dec_ev_age or {}).items()):
            rows.append(
                (b, "decision_eviction_time", {"decision": D.DECISION_NAMES[dec]}, age)
            )
            rows.append(
                (b, "decision_evictions", {"decision": D.DECISION_NAMES[dec]}, n)
            )
        return self.spark.createDataFrame(rows, schema=METRICS_SCHEMA)

    # ------------------------------------------------------------------- run

    def run(self, sequences: DataFrame, n_batches: int | None = None) -> list[BatchResult]:
        """Process a sequences table batch-by-batch in arrival order.
        Resumes after the last committed batch (checkpoint recovery)."""
        if n_batches is None:
            max_b = sequences.agg(F.max("batch_idx")).collect()[0][0]
            if max_b is None:  # empty input: nothing to process
                return []
            n_batches = max_b + 1
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
            .select(
                *PASSTHROUGH,
                F.lit(None).cast("string").alias("policy"),
                F.lit("flush").alias("reason"),
                # atlassiansampling.flushes incremented (processor.go:591-603)
                (F.coalesce(F.col("flushes"), F.lit(0)) + 1).cast("int").alias("flushes_out"),
                F.lit("keep").alias("sink"),
            )
        )
        counts = self._write_routed(b, flushed)
        dec_export = dec_state.select(
            "doc_id",
            (F.col("decision") == D.SAMPLED).alias("decision_value"),
            "policy",
            "decided_batch",
        )
        dec_export.write.mode("overwrite").parquet(f"{self.out}/decision_export/batch={b}")
        n_dec = dec_export.count()

        self.store.write("pending_state", b, _empty(self.spark, PENDING_STATE_SCHEMA))
        self.store.write_evmeta("pending_state", b, {"wm": {}, "counts": {}})
        self.store.write("pending_spans", b, _empty(self.spark, PENDING_SPANS_SCHEMA))
        self.store.write("decision_state", b, _empty(self.spark, DECISION_STATE_SCHEMA))
        self.store.write_evmeta("decision_state", b, {"wm": {}, "counts": {}})
        self.store.write("metrics", b, _empty(self.spark, METRICS_SCHEMA))
        self.store.commit(b)
        return {"flushed_rows": counts["kept"], "decision_rows": n_dec}


def placeholder_tokens(batch_idx: int):
    """Token header for the TRACE NOT SAMPLED placeholder span, built as a
    pure column expression from the decided row's trace id. Deterministic
    stand-ins: span_id = xxhash64(doc_id, batch), timestamps = batch-based
    (now−1s, now) per processor.go:523-531.
    """
    from .datagen import BASE_NS

    hi, lo = F.col("trace_hi"), F.col("trace_lo")
    span_id = F.xxhash64(F.col("doc_id"), F.lit("placeholder"), F.lit(batch_idx))
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
