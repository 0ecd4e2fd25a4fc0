"""End-to-end multi-batch pipeline scenarios ported from the reference's
processor tests (FIXTURES.md §5 / processor_test.go). Each asserts
per-sink routed rows, per-sink counts, byte-exact token arrays on
surviving rows, and state-table contents.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from atlassian_sampling_processor_spark import codec
from atlassian_sampling_processor_spark import decision as D
from atlassian_sampling_processor_spark.config import EngineConfig, parse_policies
from atlassian_sampling_processor_spark.pipeline import EVICTION_POLICY, SamplingPipeline

from .helpers import seq_table_from_spans, trace_id

BASE = 1_700_000_000_000_000_000


@pytest.fixture
def tmp_dirs(tmp_path):
    ck = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    yield ck, out
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def make_pipe(spark, policies, tmp_dirs, **eng):
    ck, out = tmp_dirs
    return SamplingPipeline(
        spark,
        parse_policies(policies),
        EngineConfig(**eng),
        checkpoint_dir=ck,
        output_dir=out,
    )


SPAN_COUNT_2 = [{"name": "sc2", "type": "span_count", "span_count": {"min_spans": 2}}]
SAMPLE_ALL = [{"name": "all", "type": "span_count", "span_count": {"min_spans": 0}}]
NEVER = [{"name": "never", "type": "probabilistic", "probabilistic": {"sampling_percentage": 0}}]


def run_batches(pipe, spark, spans):
    df = seq_table_from_spans(spark, spans)
    return pipe.run(df)


def tokens_of(df):
    return sorted(tuple(r.tokens) for r in df.select("tokens").collect())


# --- scenario 1: late sample releases cache (processor_test.go:102-148) ----


def test_late_sample_releases_cache(spark, tmp_dirs):
    pipe = make_pipe(spark, SPAN_COUNT_2, tmp_dirs)
    t = trace_id(1)
    spans = [
        dict(doc_id=t, span_id=10, batch_idx=0),
        dict(doc_id=t, span_id=11, batch_idx=1),
    ]
    r = run_batches(pipe, spark, spans)
    assert r[0].kept == 0 and r[0].sampled_traces == 0 and r[0].pending_traces == 1
    assert r[1].sampled_traces == 1 and r[1].kept == 2 and r[1].pending_traces == 0

    keep = pipe.read_sink("keep")
    assert keep.count() == 2
    # byte-exact token passthrough for both the cached and current span
    src = seq_table_from_spans(spark, spans)
    assert tokens_of(keep) == tokens_of(src)
    reasons = {r.reason for r in keep.select("reason").collect()}
    assert reasons == {"sampled", "sampled_cached"}


# --- scenario 2: decision caches respected (processor_test.go:150-213) ------


def test_sampled_decision_cache_forwards_late_spans(spark, tmp_dirs):
    pipe = make_pipe(spark, SAMPLE_ALL, tmp_dirs)
    t = trace_id(2)
    r = run_batches(
        pipe,
        spark,
        [dict(doc_id=t, span_id=1, batch_idx=0), dict(doc_id=t, span_id=2, batch_idx=1)],
    )
    assert r[0].sampled_traces == 1
    assert r[1].sampled_traces == 0  # no re-decision
    keep = pipe.read_sink("keep")
    assert keep.count() == 2
    assert keep.filter("reason = 'late_sampled'").count() == 1


def test_not_sampled_decision_cache_drops_would_be_sampled(spark, tmp_dirs):
    pols = [
        {
            "name": "downer",
            "type": "downgrader",
            "downgrader": {
                "downgrade_to": "NotSampled",
                "sub_policy": {"name": "s", "type": "span_count", "span_count": {"min_spans": 0}},
            },
        }
    ]
    pipe = make_pipe(spark, pols, tmp_dirs)
    t = trace_id(3)
    r = run_batches(
        pipe,
        spark,
        [dict(doc_id=t, span_id=1, batch_idx=0), dict(doc_id=t, span_id=2, batch_idx=1)],
    )
    assert r[0].not_sampled_traces == 1
    assert r[1].not_sampled_traces == 0
    drop = pipe.read_sink("drop")
    assert drop.filter("reason = 'not_sampled'").count() == 1
    assert drop.filter("reason = 'late_not_sampled'").count() == 1
    assert pipe.read_sink("keep").count() == 0


# --- scenario 3: metadata merge (processor_test.go:339-393) ------------------


def test_metadata_merge_across_batches(spark, tmp_dirs):
    pipe = make_pipe(spark, NEVER, tmp_dirs)
    t = trace_id(4)
    spans = [
        dict(doc_id=t, span_id=1, start_ts=BASE + 5, end_ts=BASE + 8, batch_idx=0),
        dict(doc_id=t, span_id=2, start_ts=BASE + 1, end_ts=BASE + 3, batch_idx=0),
        dict(doc_id=t, span_id=3, start_ts=BASE + 2, end_ts=BASE + 9, batch_idx=1),
    ]
    run_batches(pipe, spark, spans)
    st = pipe.store.read("pending_state", 1).collect()
    assert len(st) == 1
    row = st[0]
    assert row.span_count == 3
    assert row.min_start == BASE + 1
    assert row.max_end == BASE + 9
    assert row.arrival_batch == 0 and row.last_seen_batch == 1
    # payload held, nothing released
    assert pipe.store.read("pending_spans", 1).count() == 3


# --- scenario 4: tiered cache, promotion, eviction (processor_test.go:395-556,818-890)

ROOT_LOW = [
    {
        "name": "roots",
        "type": "root_spans",
        "root_spans": {
            "sub_policy": {"name": "p", "type": "probabilistic", "probabilistic": {"sampling_percentage": 0}}
        },
    }
]


def test_secondary_eviction_records_not_sampled(spark, tmp_dirs):
    pipe = make_pipe(spark, ROOT_LOW, tmp_dirs, secondary_cache_size=1)
    a, b = trace_id(10), trace_id(11)
    r = run_batches(
        pipe,
        spark,
        [
            dict(doc_id=a, span_id=1, parent_span_id=0, batch_idx=0),
            dict(doc_id=b, span_id=2, parent_span_id=0, batch_idx=1),
        ],
    )
    # batch0: A lone-root → LowPriority → secondary
    st0 = pipe.store.read("pending_state", 0).collect()
    assert len(st0) == 1 and st0[0].priority == D.PRIORITY_LOW and st0[0].last_low_policy == "roots"
    # batch1: B lone-root → secondary over capacity → A evicted → NotSampled
    assert r[1].evicted_traces == 1
    dec = {r.doc_id: r for r in pipe.store.read("decision_state", 1).collect()}
    assert dec[a].decision == D.NOT_SAMPLED and dec[a].policy == EVICTION_POLICY
    st1 = {r.doc_id for r in pipe.store.read("pending_state", 1).collect()}
    assert st1 == {b}
    low = pipe.read_sink("low_priority")
    assert low.count() == 1 and low.collect()[0].doc_id == a


def test_promotion_to_primary_clears_marker(spark, tmp_dirs):
    pipe = make_pipe(spark, ROOT_LOW, tmp_dirs, secondary_cache_size=1)
    a = trace_id(12)
    r = run_batches(
        pipe,
        spark,
        [
            dict(doc_id=a, span_id=1, parent_span_id=0, batch_idx=0),
            # second span arrives → span_count 2 → root_spans default Pending →
            # priority promoted (max(Low, Unspecified)=Unspecified), marker cleared
            dict(doc_id=a, span_id=2, parent_span_id=99, batch_idx=1),
        ],
    )
    st0 = pipe.store.read("pending_state", 0).collect()[0]
    assert st0.priority == D.PRIORITY_LOW and st0.last_low_policy == "roots"
    st1 = pipe.store.read("pending_state", 1).collect()[0]
    assert st1.priority == D.PRIORITY_UNSPECIFIED and st1.last_low_policy is None
    assert r[1].evicted_traces == 0


def test_primary_capacity_eviction(spark, tmp_dirs):
    pipe = make_pipe(spark, NEVER, tmp_dirs, primary_cache_size=2)
    r = run_batches(
        pipe,
        spark,
        [dict(doc_id=trace_id(20 + i), span_id=i, batch_idx=i) for i in range(4)],
    )
    # capacity 2: batches 2,3 each evict the oldest
    assert [x.evicted_traces for x in r] == [0, 0, 1, 1]
    st = {row.doc_id for row in pipe.store.read("pending_state", 3).collect()}
    assert st == {trace_id(22), trace_id(23)}
    drop = pipe.read_sink("drop")
    assert drop.filter("reason = 'evicted_primary'").count() == 2
    # traces_not_sampled metric counts evictions only (processor.go:647)
    m = pipe.store.read("metrics", 2).filter("metric = 'traces_not_sampled'").collect()[0]
    assert m.value == 1


# --- scenario 6: decision-span ingest (processor_test.go:558-628) -------------


def test_decision_span_releases_pending(spark, tmp_dirs):
    pipe = make_pipe(spark, NEVER, tmp_dirs)
    t = trace_id(30)
    r = run_batches(
        pipe,
        spark,
        [
            dict(doc_id=t, span_id=1, batch_idx=0),
            dict(doc_id=t, span_id=2, is_decision_span=1, decision_value=1, batch_idx=1),
        ],
    )
    assert r[0].pending_traces == 1
    keep = pipe.read_sink("keep")
    rows = keep.collect()
    assert len(rows) == 1 and rows[0].reason == "decision_span_release"
    dec = pipe.store.read("decision_state", 1).collect()
    assert len(dec) == 1 and dec[0].decision == D.SAMPLED
    assert pipe.store.read("pending_state", 1).count() == 0


def test_decision_span_conflict_ignored(spark, tmp_dirs):
    pipe = make_pipe(spark, SAMPLE_ALL, tmp_dirs)
    t = trace_id(31)
    run_batches(
        pipe,
        spark,
        [
            dict(doc_id=t, span_id=1, batch_idx=0),  # sampled immediately
            dict(doc_id=t, span_id=2, is_decision_span=1, decision_value=0, batch_idx=1),
        ],
    )
    dec = pipe.store.read("decision_state", 1).collect()
    assert len(dec) == 1 and dec[0].decision == D.SAMPLED  # "no" span ignored


def test_decision_span_not_sampled_drops_pending(spark, tmp_dirs):
    pipe = make_pipe(spark, NEVER, tmp_dirs)
    t = trace_id(32)
    run_batches(
        pipe,
        spark,
        [
            dict(doc_id=t, span_id=1, batch_idx=0),
            dict(doc_id=t, span_id=2, is_decision_span=1, decision_value=0, batch_idx=1),
        ],
    )
    dec = pipe.store.read("decision_state", 1).collect()
    assert len(dec) == 1 and dec[0].decision == D.NOT_SAMPLED
    drop = pipe.read_sink("drop")
    assert drop.filter("reason = 'decision_span_drop'").count() == 1
    assert pipe.store.read("pending_spans", 1).count() == 0


# --- scenario 7: shutdown flush + resume (processor_test.go:630-717) ---------


def test_flush_increments_counter_and_exports_decisions(spark, tmp_dirs):
    pipe = make_pipe(spark, SAMPLE_ALL + NEVER, tmp_dirs)
    t_sampled, t_pending = trace_id(40), trace_id(41)
    # sc min 0 samples everything... use NEVER-only trace via separate policy:
    # instead: one sampled trace, one pending trace via flushes fixture
    pipe2 = make_pipe(spark, SPAN_COUNT_2, tmp_dirs)
    run_batches(
        pipe2,
        spark,
        [
            dict(doc_id=t_sampled, span_id=1, batch_idx=0),
            dict(doc_id=t_sampled, span_id=2, batch_idx=0),  # sampled (2 spans)
            dict(doc_id=t_pending, span_id=3, batch_idx=0, flushes=5),  # pending
        ],
    )
    out = pipe2.flush()
    assert out["flushed_rows"] == 1 and out["decision_rows"] == 1
    keep = pipe2.read_sink("keep")
    flushed = keep.filter("reason = 'flush'").collect()
    assert len(flushed) == 1
    assert flushed[0].doc_id == t_pending and flushed[0].flushes_out == 6  # 5+1
    normal = keep.filter("reason != 'flush'")
    assert all(r.flushes_out is None for r in normal.collect())  # attr stripped
    # decision export carries the sampled decision as a decision-span row
    dec_export = spark.read.parquet(f"{tmp_dirs[1]}/decision_export/batch=1")
    rows = dec_export.collect()
    assert len(rows) == 1 and rows[0].doc_id == t_sampled and rows[0].decision_value is True
    # state cleared
    assert pipe2.store.read("pending_state", 1).count() == 0


def test_resume_from_checkpoint(spark, tmp_dirs):
    t = trace_id(50)
    spans = [
        dict(doc_id=t, span_id=1, batch_idx=0),
        dict(doc_id=t, span_id=2, batch_idx=1),
    ]
    pipe = make_pipe(spark, SPAN_COUNT_2, tmp_dirs)
    df = seq_table_from_spans(spark, spans)
    pipe.process_batch(df.filter("batch_idx = 0"), 0)
    # simulate kill + restart: new pipeline over the same checkpoint
    pipe_b = make_pipe(spark, SPAN_COUNT_2, tmp_dirs)
    results = pipe_b.run(df)  # must resume at batch 1, not reprocess batch 0
    assert [r.batch_idx for r in results] == [1]
    assert results[0].sampled_traces == 1 and results[0].kept == 2


# --- scenario 8: not-sampled placeholder (processor_test.go:1110-1143) -------


def test_not_sampled_placeholder_span(spark, tmp_dirs):
    pols = [
        {
            "name": "downer",
            "type": "downgrader",
            "downgrader": {
                "downgrade_to": "NotSampled",
                "sub_policy": {"name": "s", "type": "span_count", "span_count": {"min_spans": 0}},
            },
            "emit_single_span_for_not_sampled": True,
        }
    ]
    pipe = make_pipe(spark, pols, tmp_dirs)
    t = trace_id(60)
    run_batches(pipe, spark, [dict(doc_id=t, span_id=1, batch_idx=0)])
    keep = pipe.read_sink("keep")
    rows = keep.collect()
    assert len(rows) == 1
    ph = rows[0]
    assert ph.reason == "not_sampled_placeholder"
    assert ph.doc_id == t and ph.source == "not-sampled-dummy-service" and ph.policy == "downer"
    # placeholder tokens decode: name = TRACE NOT SAMPLED, same trace id
    import numpy as np

    hdr = codec.decode_headers(np.array([ph.tokens], dtype=np.int32))
    assert codec.NAMES[int(hdr["name_id"][0])] == "TRACE NOT SAMPLED"
    assert f"{int(hdr['trace_hi'][0]):016x}{int(hdr['trace_lo'][0]):016x}" == t
    # the original span went to the drop sink
    assert pipe.read_sink("drop").filter("reason = 'not_sampled'").count() == 1


# --- two parallelism levels, identical outputs (processor_test.go:1200-1208) --


def test_shard_invariance(tmp_path):
    """Same input at local[2]-style 2 shuffle partitions vs 8 → identical
    routed rows (the reference's 1-shard vs 4-shard duplication)."""
    from atlassian_sampling_processor_spark.session import get_spark

    spark = get_spark(cores=4, shuffle_partitions=4)
    outs = {}
    for parts in (2, 8):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        pipe = SamplingPipeline(
            spark,
            parse_policies(SPAN_COUNT_2),
            EngineConfig(),
            checkpoint_dir=str(tmp_path / f"ck{parts}"),
            output_dir=str(tmp_path / f"out{parts}"),
        )
        spans = [
            dict(doc_id=trace_id(100 + i % 7), span_id=i, batch_idx=i % 3) for i in range(40)
        ]
        pipe.run(seq_table_from_spans(spark, spans))
        keep = pipe.read_sink("keep")
        outs[parts] = sorted(
            (r.doc_id, tuple(r.tokens), r.reason) for r in keep.collect()
        )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert outs[2] == outs[8]


# --- telemetry: decision_from grouping + cache_reads (decider.go:60-74,
# policy.go:33-67, lru_cache.go:49-58) -----------------------------------------


def test_metrics_decision_from_and_cache_reads(spark, tmp_dirs):
    pols = [
        {
            "name": "all",
            "type": "span_count",
            "span_count": {"min_spans": 2},
            "record_decision_from": "service.name",
            "decision_groupers": [
                {"regex": "^(conf|confluence)-.*", "group": "confluence-monolith"}
            ],
        }
    ]
    pipe = make_pipe(spark, pols, tmp_dirs)
    t = trace_id(70)
    # source_id=2 → codec.SOURCES[2] == 'conf-editor' → grouped
    run_batches(
        pipe,
        spark,
        [
            dict(doc_id=t, span_id=1, source_id=2, batch_idx=0),  # pending (miss)
            dict(doc_id=t, span_id=2, source_id=2, batch_idx=1),  # sampled (hit)
        ],
    )
    m1 = pipe.store.read("metrics", 1).collect()
    pol_rows = [r for r in m1 if r.metric == "policy_decisions" and r.labels.get("policy") == "all"]
    assert len(pol_rows) == 1
    assert pol_rows[0].labels["decision"] == "Sampled"
    assert pol_rows[0].labels["decision_from"] == "confluence-monolith"
    reads = {r.labels["hit"]: r.value for r in m1 if r.metric == "cache_reads"}
    assert reads == {"true": 1, "false": 0}
    m0 = pipe.store.read("metrics", 0).collect()
    reads0 = {r.labels["hit"]: r.value for r in m0 if r.metric == "cache_reads"}
    assert reads0 == {"true": 0, "false": 1}


def test_decision_from_arbitrary_resource_attr(spark, tmp_dirs):
    """record_decision_from with a NON-service.name resource attribute
    (decider.go:175-188 extracts any configured attr): the namespace
    fixture attr of source 'conf-editor' is 'conf', grouped by regex;
    an attribute outside the resource model yields '' (the reference's
    missing-attribute result)."""
    pols = [
        {
            "name": "ns",
            "type": "span_count",
            "span_count": {"min_spans": 1},
            "record_decision_from": "service.namespace",
            "decision_groupers": [{"regex": "^conf$", "group": "conf-team"}],
        }
    ]
    pipe = make_pipe(spark, pols, tmp_dirs)
    run_batches(
        pipe, spark,
        [dict(doc_id=trace_id(71), span_id=1, source_id=2, batch_idx=0)],
    )
    m = pipe.store.read("metrics", 0).collect()
    rows = [r for r in m if r.metric == "policy_decisions" and r.labels.get("policy") == "ns"]
    assert rows and rows[0].labels["decision_from"] == "conf-team"

    # unknown attr key → "" (and groupers can't match)
    pols2 = [
        {
            "name": "nk",
            "type": "span_count",
            "span_count": {"min_spans": 1},
            "record_decision_from": "custom.attr",
            "decision_groupers": [{"regex": ".*", "group": "never"}],
        }
    ]
    import shutil as _sh

    for d in tmp_dirs:
        _sh.rmtree(d, ignore_errors=True)
    pipe2 = make_pipe(spark, pols2, tmp_dirs)
    run_batches(
        pipe2, spark,
        [dict(doc_id=trace_id(72), span_id=1, source_id=2, batch_idx=0)],
    )
    m2 = pipe2.store.read("metrics", 0).collect()
    rows2 = [r for r in m2 if r.metric == "policy_decisions" and r.labels.get("policy") == "nk"]
    assert rows2 and rows2[0].labels["decision_from"] == "never"


def test_salted_agg_identical_results(spark, tmp_dirs):
    """salt_buckets>0 two-phase aggregation routes identically to the
    plain groupBy (north rule: salted two-phase agg on the trace key)."""
    spans = [
        dict(doc_id=trace_id(80 + i % 5), span_id=i + 1, status=i % 3, batch_idx=i % 2)
        for i in range(40)
    ]
    outs = {}
    for salt in (0, 8):
        ck, out = tmp_dirs
        pipe = SamplingPipeline(
            spark,
            parse_policies(SPAN_COUNT_2 + [{"name": "err", "type": "status_code",
                                            "status_code": {"status_codes": ["ERROR"]}}]),
            EngineConfig(salt_buckets=salt),
            checkpoint_dir=f"{ck}_{salt}",
            output_dir=f"{out}_{salt}",
        )
        pipe.run(seq_table_from_spans(spark, spans))
        outs[salt] = sorted(
            (r.doc_id, tuple(r.tokens), r.reason)
            for r in pipe.read_sink("keep").collect() + pipe.read_sink("drop").collect()
        )
    assert outs[0] == outs[8] and len(outs[0]) > 0
