"""Driver-facing query suite: every operator from SURVEY.md §2 as a
(Spark DataFrame builder, DuckDB oracle SQL) pair over the shared test
tables (events / documents / embeddings).

The events table is mapped to span-land deterministically in BOTH
engines: trace_key = user_id, span = event, start/end µs from ts+value,
status from event_type ('error'→ERROR, 'purchase'→OK, else UNSET). The
sampling semantics mirror the reference evaluators exactly (citations on
each query); the FNV-1a64 oracle is generated as unrolled 64-bit SQL so
even the probabilistic policy is value-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import decision as D
from .hashing import DEFAULT_HASH_SALT, calculate_threshold, fnv1a64, unsigned_lte

# ---------------------------------------------------------------------------
# shared derivations

SPAN_VIEW_SQL = """
  SELECT user_id AS trace_key,
         event_id AS span_id,
         epoch_us(ts) AS start_us,
         epoch_us(ts) + CAST(floor(value * 1000) AS BIGINT) AS end_us,
         CASE WHEN event_type = 'error' THEN 'ERROR'
              WHEN event_type = 'purchase' THEN 'OK'
              ELSE 'UNSET' END AS status_code
  FROM events
"""


def span_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ts is TIMESTAMP_NTZ; session TZ is UTC so the cast preserves the µs value
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        F.col("user_id").cast("long").alias("trace_key"),
        F.col("event_id").alias("span_id"),
        us.alias("start_us"),
        (us + F.floor(F.col("value") * 1000).cast("long")).alias("end_us"),
        F.when(F.col("event_type") == "error", "ERROR")
        .when(F.col("event_type") == "purchase", "OK")
        .otherwise("UNSET")
        .alias("status_code"),
    )


# per-trace aggregate used by several policies (the NewTraceData metadata
# build, internal/tracedata/tracedata.go:24-62)
TRACE_AGG_SQL = f"""
  SELECT trace_key,
         CAST(count(*) AS BIGINT) AS span_count,
         min(start_us) AS min_start,
         max(end_us) AS max_end,
         CAST(max(CASE WHEN status_code = 'ERROR' THEN 1 ELSE 0 END) AS BIGINT) AS any_error,
         CAST(max(CASE WHEN status_code = 'OK' THEN 1 ELSE 0 END) AS BIGINT) AS any_ok
  FROM ({SPAN_VIEW_SQL}) GROUP BY trace_key
"""


def trace_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_view(spark, sf_dir).groupBy("trace_key").agg(
        F.count(F.lit(1)).alias("span_count"),
        F.min("start_us").alias("min_start"),
        F.max("end_us").alias("max_end"),
        F.max((F.col("status_code") == "ERROR").cast("long")).alias("any_error"),
        F.max((F.col("status_code") == "OK").cast("long")).alias("any_ok"),
    )


# ---------------------------------------------------------------------------
# policy queries (SURVEY.md §2.4)

MIN_SPANS = 70
LATENCY_MS = 2_400_000_000  # ~27.8 days; events span ~31 days → both outcomes


def q_span_count(spark, sf_dir):
    """span_count policy (span_count_sampler.go:33-54): merged SpanCount
    >= min_spans ⇒ Sampled else Pending."""
    agg = trace_agg(spark, sf_dir)
    return agg.select(
        "trace_key",
        "span_count",
        F.when(F.col("span_count") >= MIN_SPANS, "Sampled").otherwise("Pending").alias("decision"),
    )


SQL_SPAN_COUNT = f"""
  SELECT trace_key, span_count,
         CASE WHEN span_count >= {MIN_SPANS} THEN 'Sampled' ELSE 'Pending' END AS decision
  FROM ({TRACE_AGG_SQL})
"""


def q_latency(spark, sf_dir):
    """latency policy (latency.go:26-43): trunc-ms duration >= threshold."""
    agg = trace_agg(spark, sf_dir)
    dur_ms = F.expr("(max_end - min_start) div 1000")
    return agg.select(
        "trace_key",
        dur_ms.alias("duration_ms"),
        F.when(dur_ms >= F.lit(LATENCY_MS), "Sampled").otherwise("Pending").alias("decision"),
    )


SQL_LATENCY = f"""
  SELECT trace_key,
         (max_end - min_start) // 1000 AS duration_ms,
         CASE WHEN (max_end - min_start) // 1000 >= {LATENCY_MS} THEN 'Sampled' ELSE 'Pending' END AS decision
  FROM ({TRACE_AGG_SQL})
"""


def q_status_code(spark, sf_dir):
    """status_code policy (status_code.go:30-66): any span in batch with a
    configured status ⇒ Sampled. Configured: [ERROR]."""
    agg = trace_agg(spark, sf_dir)
    return agg.select(
        "trace_key",
        F.when(F.col("any_error") == 1, "Sampled").otherwise("Pending").alias("decision"),
    )


SQL_STATUS_CODE = f"""
  SELECT trace_key,
         CASE WHEN any_error = 1 THEN 'Sampled' ELSE 'Pending' END AS decision
  FROM ({TRACE_AGG_SQL})
"""


# --- threshold / OTEP-235 ----------------------------------------------------

MAX_THRESHOLD = (1 << 56) - 1

# derived deterministic threshold attr: spans with event_id % 3 == 0 carry a
# 56-bit threshold from md5; rv = 56 bits derived from the trace key
THRESH_SQL_EXPR = "('0x' || substr(md5(CAST(span_id AS VARCHAR)), 1, 14))::BIGINT"
RV_SQL_EXPR = "('0x' || substr(md5(CAST(trace_key AS VARCHAR)), 1, 14))::BIGINT"


def q_threshold(spark, sf_dir):
    """threshold policy (threshold.go:34-91): min valid threshold per
    trace; min == 2^56−1 counts as absent; Sampled iff rv >= min."""
    sv = span_view(spark, sf_dir)
    thr = F.conv(F.substring(F.md5(F.col("span_id").cast("string")), 1, 14), 16, 10).cast("long")
    rv = F.conv(F.substring(F.md5(F.col("trace_key").cast("string")), 1, 14), 16, 10).cast("long")
    agg = (
        sv.withColumn("thr", F.when(F.col("span_id") % 3 == 0, thr))
        .withColumn("rv", rv)
        .groupBy("trace_key")
        .agg(F.min("thr").alias("min_threshold"), F.min("rv").alias("rv"))
    )
    found = F.col("min_threshold").isNotNull() & (F.col("min_threshold") < MAX_THRESHOLD)
    return agg.select(
        "trace_key",
        "min_threshold",
        F.when(found & (F.col("rv") >= F.col("min_threshold")), "Sampled")
        .otherwise("Pending")
        .alias("decision"),
    )


SQL_THRESHOLD = f"""
  WITH sv AS ({SPAN_VIEW_SQL}),
  agg AS (
    SELECT trace_key,
           min(CASE WHEN span_id % 3 = 0 THEN {THRESH_SQL_EXPR} END) AS min_threshold,
           min({RV_SQL_EXPR}) AS rv
    FROM sv GROUP BY trace_key
  )
  SELECT trace_key, min_threshold,
         CASE WHEN min_threshold IS NOT NULL AND min_threshold < {MAX_THRESHOLD}
                   AND rv >= min_threshold
              THEN 'Sampled' ELSE 'Pending' END AS decision
  FROM agg
"""


# --- probabilistic (FNV-1a64, bit-exact oracle) -------------------------------

PROB_PCT = 25.0


def fnv_oracle_sql(key_expr: str, salt: str = DEFAULT_HASH_SALT) -> str:
    """Unrolled FNV-1a64 over salt ‖ 16-byte trace id (hi=0, lo=key) as a
    single DuckDB HUGEINT expression returning unsigned `fnv_u`.

    The salt prefix and the 8 zero bytes of hi are folded in Python; only
    the 8 data-dependent bytes of the key unroll in SQL, entirely in
    unsigned HUGEINT: xor, wrap-multiply by the FNV prime, mask to 64
    bits. Each step references the previous hash value exactly ONCE, so
    the expression tree is linear in the byte count. (The first version
    used lateral column aliases with a signed/unsigned CASE per step —
    three references per level — which DuckDB expands to a ~3^8-node
    tree: one query allocated 64k memory maps and hit vm.max_map_count,
    killing the whole gate process.)
    """
    h = fnv1a64(salt.encode())
    h = fnv1a64(bytes(8), h)  # hi == 0 for integer trace keys
    expr = f"{h}::HUGEINT"
    for i in range(8):
        shift = 8 * (7 - i)
        b = f"(((({key_expr}) >> {shift}) & 255)::HUGEINT)"
        expr = (
            f"((xor({expr}, {b}) * 1099511628211::HUGEINT)"
            f" & 18446744073709551615::HUGEINT)"
        )
    return f"{expr} AS fnv_u"


def q_probabilistic(spark, sf_dir):
    """probabilistic policy (probabilistic.go:34-71): FNV-1a64(salt ‖ id)
    <= uint64(pct/100 · MaxUint64), inclusive."""
    from .hashing import fnv_hash_column

    agg = trace_agg(spark, sf_dir).select(
        "trace_key", F.lit(0).cast("long").alias("trace_hi"), F.col("trace_key").alias("trace_lo")
    )
    agg = agg.withColumn("fnv", fnv_hash_column(DEFAULT_HASH_SALT))
    thr = calculate_threshold(PROB_PCT / 100.0)
    return agg.select(
        "trace_key",
        F.when(unsigned_lte(F.col("fnv"), thr), "Sampled").otherwise("Pending").alias("decision"),
    )


def sql_probabilistic() -> str:
    thr = calculate_threshold(PROB_PCT / 100.0)
    return f"""
      SELECT trace_key,
             CASE WHEN fnv_u <= {thr}::HUGEINT THEN 'Sampled' ELSE 'Pending' END AS decision
      FROM (
        SELECT trace_key, {fnv_oracle_sql("trace_key")}
        FROM (SELECT DISTINCT user_id AS trace_key FROM events)
      )
    """


REMOTE_RATE = 40.0  # what the (deterministic) rate provider returns
REMOTE_DEFAULT = 5.0  # fallback when the provider errors


def q_remote_probabilistic(spark, sf_dir):
    """remote_probabilistic (remote_probabilistic.go:44-100): the rate
    comes from a provider consulted at plan-build time; a provider error
    falls back to default_rate. Built through the REAL policy object —
    one policy whose getter returns 40.0, one whose getter raises (→
    default 5.0); the oracle hashes the same FNV at both rates. The
    per-batch refresh semantics are e2e-tested
    (test_remote_probabilistic_rate_refresh); this query gates the
    rate→threshold→decision math."""
    from .hashing import fnv_hash_column
    from .policies import RemoteProbabilistic
    from .policies.base import hash_col_name

    live = RemoteProbabilistic(name="live", default_rate=REMOTE_DEFAULT,
                               rate_getter=lambda: REMOTE_RATE)

    def broken():
        raise RuntimeError("provider down")

    down = RemoteProbabilistic(name="down", default_rate=REMOTE_DEFAULT,
                               rate_getter=broken)
    agg = trace_agg(spark, sf_dir).select(
        "trace_key", F.lit(0).cast("long").alias("trace_hi"),
        F.col("trace_key").alias("trace_lo"),
    )
    agg = agg.withColumn(
        hash_col_name(DEFAULT_HASH_SALT), fnv_hash_column(DEFAULT_HASH_SALT)
    )
    names = F.array(*[F.lit(D.DECISION_NAMES[i]) for i in range(5)])
    return agg.select(
        "trace_key",
        F.element_at(names, live.decision() + 1).alias("decision_live"),
        F.element_at(names, down.decision() + 1).alias("decision_fallback"),
    )


def sql_remote_probabilistic() -> str:
    thr_live = calculate_threshold(REMOTE_RATE / 100.0)
    thr_def = calculate_threshold(REMOTE_DEFAULT / 100.0)
    return f"""
      SELECT trace_key,
             CASE WHEN fnv_u <= {thr_live}::HUGEINT THEN 'Sampled' ELSE 'Pending' END AS decision_live,
             CASE WHEN fnv_u <= {thr_def}::HUGEINT THEN 'Sampled' ELSE 'Pending' END AS decision_fallback
      FROM (
        SELECT trace_key, {fnv_oracle_sql("trace_key")}
        FROM (SELECT DISTINCT user_id AS trace_key FROM events)
      )
    """


# --- full decider chain (decider.go:41-81) ------------------------------------


def q_decider_chain(spark, sf_dir):
    """Ordered policy list [status_code(ERROR), span_count(70),
    latency, probabilistic(25%)]; first non-Pending wins; all-Pending ⇒
    Pending with NULL policy."""
    from .hashing import fnv_hash_column

    agg = trace_agg(spark, sf_dir).select(
        "*", F.lit(0).cast("long").alias("trace_hi"), F.col("trace_key").alias("trace_lo")
    )
    agg = agg.withColumn("fnv", fnv_hash_column(DEFAULT_HASH_SALT))
    thr = calculate_threshold(PROB_PCT / 100.0)
    d1 = F.when(F.col("any_error") == 1, F.lit("Sampled"))
    d2 = F.when(F.col("span_count") >= MIN_SPANS, F.lit("Sampled"))
    d3 = F.when(F.expr("(max_end - min_start) div 1000") >= LATENCY_MS, F.lit("Sampled"))
    d4 = F.when(unsigned_lte(F.col("fnv"), thr), F.lit("Sampled"))
    chain = F.coalesce(
        F.when(d1.isNotNull(), F.struct(d1.alias("d"), F.lit("errors").alias("p"))),
        F.when(d2.isNotNull(), F.struct(d2.alias("d"), F.lit("big").alias("p"))),
        F.when(d3.isNotNull(), F.struct(d3.alias("d"), F.lit("slow").alias("p"))),
        F.when(d4.isNotNull(), F.struct(d4.alias("d"), F.lit("prob25").alias("p"))),
        F.struct(F.lit("Pending").alias("d"), F.lit(None).cast("string").alias("p")),
    )
    return agg.select(
        "trace_key", chain["d"].alias("decision"), chain["p"].alias("policy")
    )


def sql_decider_chain() -> str:
    thr = calculate_threshold(PROB_PCT / 100.0)
    return f"""
      WITH agg AS ({TRACE_AGG_SQL}),
      h AS (
        SELECT trace_key, {fnv_oracle_sql("trace_key")}
        FROM (SELECT DISTINCT user_id AS trace_key FROM events)
      )
      SELECT a.trace_key,
             CASE WHEN a.any_error = 1 THEN 'Sampled'
                  WHEN a.span_count >= {MIN_SPANS} THEN 'Sampled'
                  WHEN (a.max_end - a.min_start) // 1000 >= {LATENCY_MS} THEN 'Sampled'
                  WHEN h.fnv_u <= {thr}::HUGEINT THEN 'Sampled'
                  ELSE 'Pending' END AS decision,
             CASE WHEN a.any_error = 1 THEN 'errors'
                  WHEN a.span_count >= {MIN_SPANS} THEN 'big'
                  WHEN (a.max_end - a.min_start) // 1000 >= {LATENCY_MS} THEN 'slow'
                  WHEN h.fnv_u <= {thr}::HUGEINT THEN 'prob25'
                  ELSE NULL END AS policy
      FROM agg a JOIN h USING (trace_key)
    """


# --- metadata merge (metadata.go:29-39) ----------------------------------------


def q_metadata_merge(spark, sf_dir):
    """Two-phase MergeWith: batch0 = even event_ids, batch1 = odd; merge
    cached+incoming with sum/min/max — exactly Metadata.MergeWith."""
    sv = span_view(spark, sf_dir)
    b0 = sv.filter(F.col("span_id") % 2 == 0).groupBy("trace_key").agg(
        F.count(F.lit(1)).alias("c0"), F.min("start_us").alias("s0"), F.max("end_us").alias("e0")
    )
    b1 = sv.filter(F.col("span_id") % 2 == 1).groupBy("trace_key").agg(
        F.count(F.lit(1)).alias("c1"), F.min("start_us").alias("s1"), F.max("end_us").alias("e1")
    )
    m = b0.join(b1, "trace_key", "full_outer")
    return m.select(
        "trace_key",
        (F.coalesce("c0", F.lit(0)) + F.coalesce("c1", F.lit(0))).alias("span_count"),
        F.least("s0", "s1").alias("min_start"),
        F.greatest("e0", "e1").alias("max_end"),
    )


SQL_METADATA_MERGE = f"""
  WITH sv AS ({SPAN_VIEW_SQL}),
  b0 AS (SELECT trace_key, CAST(count(*) AS BIGINT) c0, min(start_us) s0, max(end_us) e0
         FROM sv WHERE span_id % 2 = 0 GROUP BY trace_key),
  b1 AS (SELECT trace_key, CAST(count(*) AS BIGINT) c1, min(start_us) s1, max(end_us) e1
         FROM sv WHERE span_id % 2 = 1 GROUP BY trace_key)
  SELECT COALESCE(b0.trace_key, b1.trace_key) AS trace_key,
         COALESCE(c0, 0) + COALESCE(c1, 0) AS span_count,
         least(s0, s1) AS min_start,
         greatest(e0, e1) AS max_end
  FROM b0 FULL OUTER JOIN b1 USING (trace_key)
"""


# --- LRU capacity eviction (lru_cache.go:94-99 / tiered_cache.go) --------------

LRU_CAPACITY = 100


def q_lru_eviction(spark, sf_dir):
    """Capacity eviction as recency rank: traces ranked by last_seen
    (max end) desc; rows past capacity evict ⇒ NotSampled
    (processor.go:626-658)."""
    from pyspark.sql import Window

    agg = trace_agg(spark, sf_dir)
    w = Window.orderBy(F.desc("max_end"), F.desc("trace_key"))
    r = agg.withColumn("rn", F.row_number().over(w))
    return r.select(
        "trace_key",
        F.col("max_end").alias("last_seen"),
        F.when(F.col("rn") > LRU_CAPACITY, "NotSampled").otherwise("Pending").alias("decision"),
    )


SQL_LRU_EVICTION = f"""
  SELECT trace_key, max_end AS last_seen,
         CASE WHEN row_number() OVER (ORDER BY max_end DESC, trace_key DESC) > {LRU_CAPACITY}
              THEN 'NotSampled' ELSE 'Pending' END AS decision
  FROM ({TRACE_AGG_SQL})
"""


# --- decision grouping (policy.go:33-67, decision_group_test.go) ----------------


def q_decision_groups(spark, sf_dir):
    """record_decision_from regex grouping: ordered first-match-wins
    regex mapping of the decision_from dimension, unmatched passthrough."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grouped = (
        F.when(F.col("source").rlike("^src[0-4]$"), "low-sources")
        .when(F.col("source").rlike("^src([5-9]|1[0-9])$"), "mid-sources")
        .otherwise(F.col("source"))
    )
    return (
        docs.select(grouped.alias("decision_from"))
        .groupBy("decision_from")
        .agg(F.count(F.lit(1)).alias("decisions"))
    )


SQL_DECISION_GROUPS = """
  SELECT CASE WHEN regexp_matches(source, '^src[0-4]$') THEN 'low-sources'
              WHEN regexp_matches(source, '^src([5-9]|1[0-9])$') THEN 'mid-sources'
              ELSE source END AS decision_from,
         CAST(count(*) AS BIGINT) AS decisions
  FROM documents GROUP BY 1
"""


def q_decision_groups_res_attr(spark, sf_dir):
    """record_decision_from over a NON-service.name resource attribute
    (decider.go:175-188 extracts ANY configured attr; round 5 closes the
    service.name-only gap). Service names are synthesized with a
    namespace prefix; the REAL policy config + decision_from_column
    machinery extracts `service.namespace` and applies the grouper."""
    from . import decision as D
    from .config import parse_policies
    from .decider import decision_from_column

    pols = parse_policies(
        [
            {
                "name": "ns",
                "type": "span_count",
                "span_count": {"min_spans": 1},
                "record_decision_from": {
                    "res_attr_key": "service.namespace",
                    "mappings": [{"pattern": "^team[01]$", "value": "core-teams"}],
                },
            }
        ]
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    svc = F.concat(
        F.lit("team"),
        (F.regexp_extract("source", "([0-9]+)", 1).cast("int") % 3).cast("string"),
        F.lit("-"),
        F.col("source"),
    )
    merged_like = docs.select(
        svc.alias("first_source"),
        F.lit("ns").alias("policy"),
        F.lit(D.SAMPLED).alias("decision"),
    )
    return (
        merged_like.select(decision_from_column(pols).alias("decision_from"))
        .groupBy("decision_from")
        .agg(F.count(F.lit(1)).alias("decisions"))
    )


SQL_DECISION_GROUPS_RES_ATTR = """
  WITH svc AS (
    SELECT 'team' || CAST(CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 3 AS VARCHAR)
             || '-' || source AS name
    FROM documents
  )
  SELECT CASE WHEN regexp_matches(split_part(name, '-', 1), '^team[01]$')
              THEN 'core-teams' ELSE split_part(name, '-', 1) END AS decision_from,
         CAST(count(*) AS BIGINT) AS decisions
  FROM svc GROUP BY 1
"""


def sampling_queries() -> dict[str, tuple]:
    """name → (spark_builder, oracle_sql_or_None)."""
    return {
        "span_count_policy": (q_span_count, SQL_SPAN_COUNT),
        "latency_policy": (q_latency, SQL_LATENCY),
        "status_code_policy": (q_status_code, SQL_STATUS_CODE),
        "threshold_policy_otep235": (q_threshold, SQL_THRESHOLD),
        "probabilistic_policy_fnv": (q_probabilistic, sql_probabilistic()),
        "remote_probabilistic_policy": (q_remote_probabilistic, sql_remote_probabilistic()),
        "decider_first_decisive": (q_decider_chain, sql_decider_chain()),
        "metadata_merge": (q_metadata_merge, SQL_METADATA_MERGE),
        "lru_eviction_rank": (q_lru_eviction, SQL_LRU_EVICTION),
        "decision_groups_regex": (q_decision_groups, SQL_DECISION_GROUPS),
        "decision_groups_res_attr": (q_decision_groups_res_attr, SQL_DECISION_GROUPS_RES_ATTR),
        "two_batch_stateful_decisions": (q_two_batch_stateful, SQL_TWO_BATCH_STATEFUL),
        "and_policy": (q_and_policy, SQL_AND_POLICY),
        "root_spans_policy": (q_root_spans_policy, SQL_ROOT_SPANS),
        "downgrader_policy": (q_downgrader_policy, SQL_DOWNGRADER),
        "ottl_condition_policy": (q_ottl_policy, SQL_OTTL),
        "ottl_ismatch_policy": (q_ottl_ismatch_policy, SQL_OTTL_ISMATCH),
        "ottl_wave3_policy": (q_ottl_wave3_policy, SQL_OTTL_WAVE3),
        "ottl_propagate_policy": (q_ottl_propagate_policy, SQL_OTTL_PROPAGATE),
        "ottl_wave5_policy": (q_ottl_wave5_policy, SQL_OTTL_WAVE5),
        "ottl_wave6_policy": (q_ottl_wave6_policy, SQL_OTTL_WAVE6),
        "ottl_wave7_policy": (q_ottl_wave7_policy, SQL_OTTL_WAVE7),
        "ottl_wave8_policy": (q_ottl_wave8_policy, SQL_OTTL_WAVE8),
        "ottl_wave9_policy": (q_ottl_wave9_policy, SQL_OTTL_WAVE9),
        "span_count_services_log": (q_span_count_services, SQL_SPAN_COUNT_SERVICES),
    }


# --- stateful two-batch engine run (metadata carry + decision cache) ---------
#
# The full cross-batch semantics (processor.go:331-406) on the events
# corpus: batch 0 = even span_ids, batch 1 = odd. A trace decided in
# batch 0 is short-circuited in batch 1 (decision cache); an undecided
# trace carries its merged metadata (MergeWith) into batch 1. Policies:
# [status_code(ERROR), span_count(60)] — deterministic, SQL-checkable.

SC_MIN = 60


def q_two_batch_stateful(spark, sf_dir):
    from .aggregate import aggregate_batch, merge_with_pending
    from .decider import make_decision
    from .policies import SpanCount, StatusCode

    pols = [
        StatusCode(name="errors", status_codes=["ERROR"]),
        SpanCount(name="big", min_spans=SC_MIN),
    ]
    sv = span_view(spark, sf_dir).select(
        F.col("trace_key").cast("string").alias("doc_id"),
        F.col("trace_key"),
        F.col("span_id"),
        F.lit(0).cast("long").alias("trace_hi"),
        F.col("trace_key").alias("trace_lo"),
        (F.col("start_us") * 1000).alias("start_ts"),
        (F.col("end_us") * 1000).alias("end_ts"),
        F.when(F.col("status_code") == "ERROR", 2)
        .when(F.col("status_code") == "OK", 1)
        .otherwise(0)
        .alias("status_id"),
        F.lit(0).alias("threshold_len"),
        F.lit(0).cast("long").alias("threshold_value"),
        F.lit(False).alias("is_root"),
        F.lit("events").alias("source"),
    )
    b0 = sv.filter(F.col("span_id") % 2 == 0)
    b1 = sv.filter(F.col("span_id") % 2 == 1)

    d0 = make_decision(merge_with_pending(aggregate_batch(b0, pols, 0), None), pols)
    decided0 = d0.filter(F.col("decision").isin(*D.DECISIVE)).select(
        "doc_id",
        F.col("decision").alias("d0"),
        F.col("policy").alias("p0"),
    )
    pending0 = d0.filter(~F.col("decision").isin(*D.DECISIVE)).select(
        "doc_id",
        F.col("total_span_count").alias("span_count"),
        F.col("merged_min_start").alias("min_start"),
        F.col("merged_max_end").alias("max_end"),
        F.lit(2).alias("priority"),
        F.lit(None).cast("string").alias("last_low_policy"),
        F.lit(0).alias("arrival_batch"),
        F.lit(0).alias("last_seen_batch"),
    )

    # decision-cache short circuit: traces decided in b0 skip evaluation
    b1_eval = b1.join(decided0.select("doc_id"), "doc_id", "left_anti")
    d1 = make_decision(merge_with_pending(aggregate_batch(b1_eval, pols, 1), pending0), pols)

    name_of = (
        lambda c: F.when(c == D.SAMPLED, "Sampled")
        .when(c == D.NOT_SAMPLED, "NotSampled")
        .when(c == D.LOW_PRIORITY, "LowPriority")
        .otherwise("Pending")
    )
    out0 = decided0.select(
        "doc_id", name_of(F.col("d0")).alias("decision"), F.col("p0").alias("policy"),
        F.lit(0).alias("decided_batch"),
    )
    out1 = d1.select(
        "doc_id",
        name_of(F.col("decision")).alias("decision"),
        F.col("policy"),
        F.when(F.col("decision").isin(*D.DECISIVE), F.lit(1)).alias("decided_batch"),
    )
    # traces only seen in batch 0 and still pending after batch 1 window
    leftover = pending0.join(d1.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", F.lit("Pending").alias("decision"),
        F.lit(None).cast("string").alias("policy"), F.lit(None).cast("int").alias("decided_batch"),
    )
    return out0.unionByName(out1).unionByName(leftover)


SQL_TWO_BATCH_STATEFUL = f"""
  WITH sv AS (
    SELECT CAST(trace_key AS VARCHAR) AS doc_id, span_id, status_code
    FROM ({SPAN_VIEW_SQL})
  ),
  a0 AS (
    SELECT doc_id, CAST(count(*) AS INT) c,
           max(CASE WHEN status_code = 'ERROR' THEN 1 ELSE 0 END) e
    FROM sv WHERE span_id % 2 = 0 GROUP BY doc_id
  ),
  d0 AS (
    SELECT doc_id,
           CASE WHEN e = 1 THEN 'Sampled' WHEN c >= {SC_MIN} THEN 'Sampled' ELSE 'Pending' END AS decision,
           CASE WHEN e = 1 THEN 'errors' WHEN c >= {SC_MIN} THEN 'big' ELSE NULL END AS policy,
           c
    FROM a0
  ),
  a1 AS (
    SELECT doc_id, CAST(count(*) AS INT) c1,
           max(CASE WHEN status_code = 'ERROR' THEN 1 ELSE 0 END) e1
    FROM sv WHERE span_id % 2 = 1 GROUP BY doc_id
  ),
  -- batch-1 evaluation: traces not already decided, merged with pending counts
  ev1 AS (
    SELECT a1.doc_id, a1.c1 + COALESCE(p.c, 0) AS total, a1.e1
    FROM a1
    LEFT JOIN (SELECT doc_id, c FROM d0 WHERE decision = 'Pending') p USING (doc_id)
    WHERE a1.doc_id NOT IN (SELECT doc_id FROM d0 WHERE decision != 'Pending')
  ),
  d1 AS (
    SELECT doc_id,
           CASE WHEN e1 = 1 THEN 'Sampled' WHEN total >= {SC_MIN} THEN 'Sampled' ELSE 'Pending' END AS decision,
           CASE WHEN e1 = 1 THEN 'errors' WHEN total >= {SC_MIN} THEN 'big' ELSE NULL END AS policy
    FROM ev1
  )
  SELECT doc_id, decision, policy, 0 AS decided_batch FROM d0 WHERE decision != 'Pending'
  UNION ALL
  SELECT doc_id, decision, policy,
         CASE WHEN decision != 'Pending' THEN 1 ELSE NULL END AS decided_batch
  FROM d1
  UNION ALL
  SELECT doc_id, 'Pending', NULL, NULL
  FROM d0 WHERE decision = 'Pending'
    AND doc_id NOT IN (SELECT doc_id FROM ev1)
"""


# --- composite policies over events (and / root_spans / downgrader / ottl) ---

AND_MIN_SPANS = 30


def q_and_policy(spark, sf_dir):
    """and policy (and.go:24-46): first non-Sampled sub-decision wins;
    subs = [status_code(ERROR), span_count(30)]."""
    agg = trace_agg(spark, sf_dir)
    d1 = F.when(F.col("any_error") == 1, "Sampled").otherwise("Pending")
    d2 = F.when(F.col("span_count") >= AND_MIN_SPANS, "Sampled").otherwise("Pending")
    combined = F.when(d1 != "Sampled", d1).otherwise(F.when(d2 != "Sampled", d2).otherwise(F.lit("Sampled")))
    return agg.select("trace_key", combined.alias("decision"))


SQL_AND_POLICY = f"""
  SELECT trace_key,
         CASE WHEN any_error != 1 THEN 'Pending'
              WHEN span_count < {AND_MIN_SPANS} THEN 'Pending'
              ELSE 'Sampled' END AS decision
  FROM ({TRACE_AGG_SQL})
"""


def q_root_spans_policy(spark, sf_dir):
    """root_spans policy (root_spans.go:34-89) on a derived root flag
    (span_id %% 5 != 0): lone root span ⇒ LowPriority; sub-policy
    probabilistic 0%% ⇒ never Sampled; default Pending (merged priority
    is always Unspecified in the live flow, processor.go:345)."""
    sv = span_view(spark, sf_dir).withColumn("is_root", F.col("span_id") % 5 != 0)
    agg = sv.groupBy("trace_key").agg(
        F.count(F.lit(1)).alias("n"), F.max("is_root").alias("any_root")
    )
    lone_root = (F.col("n") == 1) & F.col("any_root")
    return agg.select(
        "trace_key",
        F.when(lone_root, "LowPriority").otherwise("Pending").alias("decision"),
    )


SQL_ROOT_SPANS = f"""
  WITH sv AS (SELECT trace_key, span_id, span_id % 5 != 0 AS is_root FROM ({SPAN_VIEW_SQL})),
  agg AS (SELECT trace_key, count(*) n, max(is_root) any_root FROM sv GROUP BY trace_key)
  SELECT trace_key,
         CASE WHEN n = 1 AND any_root THEN 'LowPriority' ELSE 'Pending' END AS decision
  FROM agg
"""

DOWNGRADE_MIN = 60


def q_downgrader_policy(spark, sf_dir):
    """downgrader (downgrader.go:18-38): sub span_count(60) Sampled ⇒
    downgraded to NotSampled; else pass-through."""
    agg = trace_agg(spark, sf_dir)
    sub = F.when(F.col("span_count") >= DOWNGRADE_MIN, "Sampled").otherwise("Pending")
    return agg.select(
        "trace_key",
        F.when(sub == "Sampled", "NotSampled").otherwise(sub).alias("decision"),
    )


SQL_DOWNGRADER = f"""
  SELECT trace_key,
         CASE WHEN span_count >= {DOWNGRADE_MIN} THEN 'NotSampled' ELSE 'Pending' END AS decision
  FROM ({TRACE_AGG_SQL})
"""


def q_ottl_policy(spark, sf_dir):
    """ottl_condition (ottl.go:42-120, comparison subset): span condition
    `attributes["k"] == "42"` over the props JSON attr — any matching
    span in the batch ⇒ Sampled."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    attr_k = F.get_json_object("props", "$.k")
    agg = ev.select(F.col("user_id").cast("long").alias("trace_key"), attr_k.alias("k")).groupBy(
        "trace_key"
    ).agg(F.max(F.coalesce(F.col("k") == "42", F.lit(False))).alias("hit"))
    return agg.select(
        "trace_key", F.when(F.col("hit"), "Sampled").otherwise("Pending").alias("decision")
    )


SQL_OTTL = """
  SELECT user_id AS trace_key,
         CASE WHEN max(CASE WHEN json_extract_string(props, '$.k') = '42' THEN 1 ELSE 0 END) = 1
              THEN 'Sampled' ELSE 'Pending' END AS decision
  FROM events GROUP BY user_id
"""


def q_ottl_ismatch_policy(spark, sf_dir):
    """ottl_condition with the widened grammar (policies/ottl.py): span
    condition `IsMatch(attributes["k"], "^4") or attributes["k"] >= 87`
    — regex match + numeric comparison + `or`, compiled through the real
    OTTLCondition policy builder so the oracle checks the parser output,
    not a hand-mirrored expression."""
    from .policies import OTTLCondition

    pol = OTTLCondition(
        name="ismatch",
        span_conditions=['IsMatch(attributes["k"], "^4") or attributes["k"] >= 87'],
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spans = ev.select(
        F.col("user_id").cast("long").alias("trace_key"),
        F.create_map(F.lit("k"), F.get_json_object("props", "$.k")).alias("attrs"),
        F.lit(None).cast("string").alias("event_name"),
        F.lit(None).cast("map<string,string>").alias("event_attrs"),
        F.lit("span").alias("name"),
    )
    agg = spans.groupBy("trace_key").agg(*pol.span_agg_exprs())
    return agg.select(
        "trace_key",
        F.when(F.col(pol._flag()), "Sampled").otherwise("Pending").alias("decision"),
    )


SQL_OTTL_ISMATCH = """
  SELECT user_id AS trace_key,
         CASE WHEN max(CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^4')
                              OR TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 87
                            THEN 1 ELSE 0 END) = 1
              THEN 'Sampled' ELSE 'Pending' END AS decision
  FROM events GROUP BY user_id
"""


def q_ottl_wave3_policy(spark, sf_dir):
    """ottl_condition, wave-3 grammar (policies/ottl.py round 3): span
    condition exercising ``resource.attributes[...]``, ``kind``,
    duration arithmetic over the timestamp paths, ``Substring`` and the
    nil presence check, all compiled through the real OTTLCondition
    builder (internal/evaluators/ottl.go:42-120 wires these contrib
    paths; this is the first surface a ported production config hits)."""
    from .policies import OTTLCondition

    pol = OTTLCondition(
        name="wave3",
        span_conditions=[
            '(resource.attributes["service.name"] == "error"'
            " and end_time_unix_nano - start_time_unix_nano > 150000000)"
            ' or (kind == 2 and Substring(name, 0, 1) == "s"'
            " and end_time_unix_nano - start_time_unix_nano > 100000000)"
            ' or attributes["k"] == nil'
        ],
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spans = ev.select(
        F.col("user_id").cast("long").alias("trace_key"),
        F.create_map(F.lit("service.name"), F.col("event_type")).alias("resource_attrs"),
        (F.col("event_id") % 4).cast("int").alias("kind"),
        F.col("event_type").alias("name"),
        F.lit(0).cast("long").alias("start_ts"),
        F.floor(F.col("value") * 1000000).cast("long").alias("end_ts"),
        F.create_map(F.lit("k"), F.get_json_object("props", "$.k")).alias("attrs"),
        F.lit(None).cast("string").alias("event_name"),
        F.lit(None).cast("map<string,string>").alias("event_attrs"),
        F.lit(0).cast("int").alias("status_id"),
    )
    agg = spans.groupBy("trace_key").agg(*pol.span_agg_exprs())
    return agg.select(
        "trace_key",
        F.when(F.col(pol._flag()), "Sampled").otherwise("Pending").alias("decision"),
    )


SQL_OTTL_WAVE3 = """
  SELECT user_id AS trace_key,
         CASE WHEN max(CASE WHEN
                  (event_type = 'error'
                   AND CAST(floor(value * 1000000) AS BIGINT) - 0 > 150000000)
               OR (event_id % 4 = 2 AND substr(event_type, 1, 1) = 's'
                   AND CAST(floor(value * 1000000) AS BIGINT) - 0 > 100000000)
               OR json_extract_string(props, '$.k') IS NULL
             THEN 1 ELSE 0 END) = 1
              THEN 'Sampled' ELSE 'Pending' END AS decision
  FROM events GROUP BY user_id
"""


def q_ottl_propagate_policy(spark, sf_dir):
    """ottl_condition with ``error_mode: propagate`` (ottl.go:42 →
    decider.go:46-48): ``Int(attributes["k"]) == 42`` where every third
    span carries a non-numeric attr value (a strconv error in the
    reference). Evaluation stops at the FIRST span, in (start_ts,
    span_id) order, whose condition errors or matches — an earlier error
    beats a later match (→ Unspecified, the decider's log-and-continue),
    unlike ignore mode where the error is just false. Compiled through
    the real policy builder incl. its decision expression."""
    from . import decision as D
    from .policies import OTTLCondition

    pol = OTTLCondition(
        name="prop",
        span_conditions=['Int(attributes["k"]) == 42'],
        error_mode="propagate",
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # every third span's attr value is the (non-numeric) event_type
    attr_v = F.when(
        F.col("event_id") % 3 == 0, F.col("event_type")
    ).otherwise(F.get_json_object("props", "$.k"))
    spans = ev.select(
        F.col("user_id").cast("long").alias("trace_key"),
        F.col("event_id").cast("long").alias("span_id"),
        F.lit(0).cast("long").alias("start_ts"),
        F.map_filter(
            F.create_map(F.lit("k"), attr_v), lambda k, v: v.isNotNull()
        ).alias("attrs"),
        F.lit(None).cast("string").alias("event_name"),
        F.lit(None).cast("map<string,string>").alias("event_attrs"),
    )
    agg = spans.groupBy("trace_key").agg(*pol.span_agg_exprs())
    names = F.array(*[F.lit(D.DECISION_NAMES[i]) for i in range(5)])
    return agg.select(
        "trace_key", F.element_at(names, pol.decision() + 1).alias("decision")
    )


SQL_OTTL_PROPAGATE = """
  WITH spans AS (
    SELECT user_id AS trace_key, event_id,
           CASE WHEN event_id % 3 = 0 THEN event_type
                ELSE json_extract_string(props, '$.k') END AS v
    FROM events
  ), marks AS (
    -- integer-STRICT cast mirror of Spark's try_cast(string as long):
    -- DuckDB's TRY_CAST(v AS BIGINT) would ROUND decimal strings
    -- ('42.5' -> 43) where Spark yields NULL, so gate the cast on an
    -- integer-format regex; the extra TRY_CAST IS NULL arm makes
    -- out-of-int64-range digit strings (20+ digits: Spark try_cast ->
    -- NULL -> error) count as errors here too
    SELECT trace_key,
           min(CASE WHEN v IS NOT NULL
                         AND (NOT regexp_matches(trim(v), '^[+-]?[0-9]+$')
                              OR TRY_CAST(trim(v) AS BIGINT) IS NULL)
                    THEN event_id END) AS first_err,
           min(CASE WHEN v IS NOT NULL
                         AND regexp_matches(trim(v), '^[+-]?[0-9]+$')
                         AND TRY_CAST(trim(v) AS BIGINT) = 42
                    THEN event_id END) AS first_match
    FROM spans GROUP BY trace_key
  )
  SELECT trace_key,
         CASE WHEN first_err IS NOT NULL
                   AND (first_match IS NULL OR first_err < first_match)
              THEN 'Unspecified'
              WHEN first_match IS NOT NULL THEN 'Sampled'
              ELSE 'Pending' END AS decision
  FROM marks
"""


def q_ottl_wave5_policy(spark, sf_dir):
    """ottl_condition, wave-5 grammar (round 4): instrumentation scope
    paths, ``IsRootSpan()`` and the ``Is*`` type predicates —
    the converters the reference wires via standardSpanFuncs
    (internal/evaluators/ottl.go) on top of contrib StandardConverters."""
    from .policies import OTTLCondition

    pol = OTTLCondition(
        name="wave5",
        span_conditions=[
            'instrumentation_scope.name == "otelerr"'
            ' or (IsRootSpan() and IsString(attributes["k"])'
            '     and instrumentation_scope.version >= "2")'
        ],
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spans = ev.select(
        F.col("user_id").cast("long").alias("trace_key"),
        # deterministic scope fixture from the event type, like the
        # pipeline's per-name scope assignment
        F.concat(F.lit("otel"), F.substring("event_type", 1, 3)).alias("scope_name"),
        F.concat((F.col("event_id") % 3).cast("string"), F.lit(".1.0")).alias(
            "scope_version"
        ),
        (F.col("event_id") % 5 == 0).alias("is_root"),
        F.map_filter(
            F.create_map(F.lit("k"), F.get_json_object("props", "$.k")),
            lambda k, v: v.isNotNull(),
        ).alias("attrs"),
        F.lit(None).cast("string").alias("event_name"),
        F.lit(None).cast("map<string,string>").alias("event_attrs"),
    )
    agg = spans.groupBy("trace_key").agg(*pol.span_agg_exprs())
    return agg.select(
        "trace_key",
        F.when(F.col(pol._flag()), "Sampled").otherwise("Pending").alias("decision"),
    )


SQL_OTTL_WAVE5 = """
  SELECT user_id AS trace_key,
         CASE WHEN max(CASE WHEN
                  'otel' || substr(event_type, 1, 3) = 'otelerr'
               OR (event_id % 5 = 0
                   AND json_extract_string(props, '$.k') IS NOT NULL
                   AND CAST(event_id % 3 AS VARCHAR) || '.1.0' >= '2')
             THEN 1 ELSE 0 END) = 1
              THEN 'Sampled' ELSE 'Pending' END AS decision
  FROM events GROUP BY user_id
"""


def q_ottl_wave6_policy(spark, sf_dir):
    """ottl_condition, wave-6 grammar (round 5): ``Time`` (ctime-format
    parse), ``TruncateTime``, ``UnixNano``, ``Duration`` arithmetic and
    ``Split(...)[n]``, compiled through the real OTTLCondition builder.
    The condition is timezone-proof by construction: the engine formats
    the timestamp to a string and Time() re-parses it in the same
    session zone (round trip = identity), and the sub-minute remainder
    compared against Duration("30s") is invariant under any whole-minute
    zone offset — so the query matches the naive-timestamp DuckDB oracle
    regardless of the gate session's timezone."""
    from .policies import OTTLCondition

    t_expr = 'Time(attributes["t"], "%Y-%m-%d %H:%M:%S")'
    pol = OTTLCondition(
        name="wave6",
        span_conditions=[
            f"UnixNano({t_expr}) - UnixNano(TruncateTime({t_expr},"
            ' Duration("1m"))) >= Duration("30s")'
            ' or Split(attributes["csv"], "-")[0] == "error"'
        ],
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spans = ev.select(
        F.col("user_id").cast("long").alias("trace_key"),
        F.create_map(
            F.lit("t"),
            F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd HH:mm:ss"),
            F.lit("csv"),
            F.concat("event_type", F.lit("-"), (F.col("event_id") % 5).cast("string")),
        ).alias("attrs"),
        F.lit(None).cast("string").alias("event_name"),
        F.lit(None).cast("map<string,string>").alias("event_attrs"),
    )
    agg = spans.groupBy("trace_key").agg(*pol.span_agg_exprs())
    return agg.select(
        "trace_key",
        F.when(F.col(pol._flag()), "Sampled").otherwise("Pending").alias("decision"),
    )


def q_ottl_wave7_policy(spark, sf_dir):
    """ottl_condition, wave-7 grammar (round 5): ``Trim``, the digest
    converters (``SHA256``/``MD5``), the calendar extractor ``Minute``
    over a ``Time(...)`` parse, and ``Log`` — compiled through the real
    OTTLCondition builder. Timezone-proof like wave 6: the engine
    formats-then-reparses the timestamp in one session zone, and
    minute-of-hour is invariant under the whole-minute zone offsets real
    zones use, so the naive-timestamp DuckDB oracle agrees in any gate
    timezone. All referenced attrs are always present, so ignore-mode
    condition skipping never fires and the oracle needs no error arm."""
    from .policies import OTTLCondition

    pol = OTTLCondition(
        name="wave7",
        span_conditions=[
            'Substring(SHA256(attributes["u"]), 0, 1) <= "3"'
            ' or MD5(attributes["u"]) > "f8"'
            ' or Minute(Time(attributes["t"], "%Y-%m-%d %H:%M:%S")) >= 45'
            ' or Log(Trim(attributes["n"])) > 3.0'
        ],
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spans = ev.select(
        F.col("user_id").cast("long").alias("trace_key"),
        F.create_map(
            F.lit("u"),
            F.concat("event_type", (F.col("event_id") % 97).cast("string")),
            F.lit("t"),
            F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd HH:mm:ss"),
            F.lit("n"),
            F.concat(F.lit("  "), (F.col("event_id") % 100 + 1).cast("string"), F.lit(" ")),
        ).alias("attrs"),
        F.lit(None).cast("string").alias("event_name"),
        F.lit(None).cast("map<string,string>").alias("event_attrs"),
    )
    agg = spans.groupBy("trace_key").agg(*pol.span_agg_exprs())
    return agg.select(
        "trace_key",
        F.when(F.col(pol._flag()), "Sampled").otherwise("Pending").alias("decision"),
    )


SQL_OTTL_WAVE7 = """
  SELECT user_id AS trace_key,
         CASE WHEN max(CASE WHEN
                  substr(sha256(event_type || CAST(event_id % 97 AS VARCHAR)), 1, 1) <= '3'
               OR md5(event_type || CAST(event_id % 97 AS VARCHAR)) > 'f8'
               OR CAST(strftime(CAST(ts AS TIMESTAMP), '%M') AS INT) >= 45
               OR ln(CAST(trim('  ' || CAST(event_id % 100 + 1 AS VARCHAR) || ' ')
                          AS DOUBLE)) > 3.0
             THEN 1 ELSE 0 END) = 1
              THEN 'Sampled' ELSE 'Pending' END AS decision
  FROM events GROUP BY user_id
"""


def q_ottl_wave8_policy(spark, sf_dir):
    """ottl_condition, wave-8 grammar (round 5): ``Hex``, ``Decode``
    (base64 round trip), ``ParseKeyValue(...)["k"]``,
    ``ExtractPatterns(...)["name"]`` and ``Format`` — compiled through
    the real OTTLCondition builder. The oracle is fully INDEPENDENT
    (plain arithmetic over the source columns, no mirroring of the
    converter chain): each converter's input is constructed so its
    output has a closed arithmetic form — e.g. the second hex nibble of
    a digit character '0'..'9' (0x30..0x39) IS the digit — so any
    engine-side converter breakage shows as a decision mismatch."""
    from .policies import OTTLCondition

    pol = OTTLCondition(
        name="wave8",
        span_conditions=[
            'Substring(Hex(attributes["u"]), 1, 1) >= "7"'
            ' or Decode(attributes["b"], "base64") == "purchase"'
            ' or Int(ParseKeyValue(attributes["kv"])["n"]) >= 11'
            ' or Int(ExtractPatterns(attributes["s"], "(?P<d>[0-9]+)")["d"]) >= 25'
            ' or Format("%s:%s", [attributes["e"], attributes["u"]]) == "error:3"'
        ],
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spans = ev.select(
        F.col("user_id").cast("long").alias("trace_key"),
        F.create_map(
            F.lit("u"), (F.col("event_id") % 10).cast("string"),
            F.lit("b"), F.base64(F.col("event_type").cast("binary")),
            F.lit("kv"),
            F.concat(F.lit("a=1 n="), (F.col("event_id") % 13).cast("string")),
            F.lit("s"),
            F.concat(F.lit("id-"), (F.col("event_id") % 29).cast("string"), F.lit("x")),
            F.lit("e"), F.col("event_type"),
        ).alias("attrs"),
        F.lit(None).cast("string").alias("event_name"),
        F.lit(None).cast("map<string,string>").alias("event_attrs"),
    )
    agg = spans.groupBy("trace_key").agg(*pol.span_agg_exprs())
    return agg.select(
        "trace_key",
        F.when(F.col(pol._flag()), "Sampled").otherwise("Pending").alias("decision"),
    )


def q_ottl_wave9_policy(spark, sf_dir):
    """ottl_condition, wave-9 grammar (round 5): ``ConvertCase`` snake
    mode, ``Sort(Split(...))[n]`` and ``Hour(Unix(Int(...)))`` through
    the real OTTLCondition builder. The oracle is fully independent
    (arithmetic + strftime over the source columns): snake-casing
    ``<type>Case<d>`` equals ``error_case2`` iff type='error' ∧ d=2; the
    desc-sorted CSV's head equals 'view' iff type='view' (every other
    type sorts below the literal 'm' or above it but ≠ 'view'); the
    Unix-seconds hour matches strftime('%H') because the session zone is
    pinned UTC (timezone-proof like waves 6–7)."""
    from .policies import OTTLCondition

    pol = OTTLCondition(
        name="wave9",
        span_conditions=[
            'ConvertCase(attributes["s"], "snake") == "error_case2"'
            ' or Sort(Split(attributes["csv"], ","), "desc")[0] == "view"'
            ' or Hour(Unix(Int(attributes["sec"]))) >= 18'
        ],
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000)).cast("long")
    spans = ev.select(
        F.col("user_id").cast("long").alias("trace_key"),
        F.create_map(
            F.lit("s"),
            F.concat("event_type", F.lit("Case"), (F.col("event_id") % 7).cast("string")),
            F.lit("csv"),
            F.concat("event_type", F.lit(",m,"), (F.col("event_id") % 5).cast("string")),
            F.lit("sec"), sec.cast("string"),
        ).alias("attrs"),
        F.lit(None).cast("string").alias("event_name"),
        F.lit(None).cast("map<string,string>").alias("event_attrs"),
    )
    agg = spans.groupBy("trace_key").agg(*pol.span_agg_exprs())
    return agg.select(
        "trace_key",
        F.when(F.col(pol._flag()), "Sampled").otherwise("Pending").alias("decision"),
    )


SQL_OTTL_WAVE9 = """
  SELECT user_id AS trace_key,
         CASE WHEN max(CASE WHEN (event_type = 'error' AND event_id % 7 = 2)
               OR event_type = 'view'
               OR CAST(strftime(CAST(ts AS TIMESTAMP), '%H') AS INT) >= 18
             THEN 1 ELSE 0 END) = 1
              THEN 'Sampled' ELSE 'Pending' END AS decision
  FROM events GROUP BY user_id
"""


SQL_OTTL_WAVE8 = """
  SELECT user_id AS trace_key,
         CASE WHEN max(CASE WHEN (event_id % 10) >= 7
               OR event_type = 'purchase'
               OR (event_id % 13) >= 11
               OR (event_id % 29) >= 25
               OR (event_type = 'error' AND (event_id % 10) = 3)
             THEN 1 ELSE 0 END) = 1
              THEN 'Sampled' ELSE 'Pending' END AS decision
  FROM events GROUP BY user_id
"""


SQL_OTTL_WAVE6 = """
  SELECT user_id AS trace_key,
         CASE WHEN max(CASE WHEN
                  CAST(strftime(CAST(ts AS TIMESTAMP), '%S') AS INT) >= 30
               OR split_part(event_type || '-' || CAST(event_id % 5 AS VARCHAR),
                             '-', 1) = 'error'
             THEN 1 ELSE 0 END) = 1
              THEN 'Sampled' ELSE 'Pending' END AS decision
  FROM events GROUP BY user_id
"""


# --- span_count LogSampled services listing (span_count_sampler.go:57-73:
# distinct service names of the current batch, sorted) --------------------


def q_span_count_services(spark, sf_dir):
    sv = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("trace_key"), F.col("event_type")
    )
    agg = sv.groupBy("trace_key").agg(
        F.count(F.lit(1)).alias("span_count"),
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("services"),
    )
    return agg.filter(F.col("span_count") >= MIN_SPANS).select(
        "trace_key", "span_count", "services"
    )


SQL_SPAN_COUNT_SERVICES = f"""
  SELECT user_id AS trace_key, CAST(count(*) AS BIGINT) AS span_count,
         array_to_string(list_sort(list(DISTINCT event_type)), ',') AS services
  FROM events GROUP BY user_id HAVING count(*) >= {MIN_SPANS}
"""
