"""Differential testing: the Spark pipeline vs the independent
pure-Python reference simulator (tests/reference_sim.py) on randomized
multi-batch scenarios — routing, decision state and eviction must agree
exactly (hypothesis-driven; deterministic seeds)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from atlassian_sampling_processor_spark import decision as D
from atlassian_sampling_processor_spark.config import EngineConfig, parse_policies
from atlassian_sampling_processor_spark.pipeline import SamplingPipeline

from .helpers import seq_table_from_spans, trace_id
from .reference_sim import simulate

BASE = 1_700_000_000_000_000_000

POLICY_PRESETS = [
    # (engine yaml-shape, simulator shape)
    (
        [
            {"name": "err", "type": "status_code", "status_code": {"status_codes": ["ERROR"]}},
            {"name": "big", "type": "span_count", "span_count": {"min_spans": 3}},
            {"name": "prob", "type": "probabilistic", "probabilistic": {"sampling_percentage": 30}},
        ],
        [
            {"name": "err", "type": "status_code", "codes": ["ERROR"]},
            {"name": "big", "type": "span_count", "min_spans": 3},
            {"name": "prob", "type": "probabilistic", "pct": 30},
        ],
    ),
    (
        [
            {
                "name": "roots",
                "type": "root_spans",
                "root_spans": {
                    "sub_policy": {
                        "name": "s", "type": "probabilistic",
                        "probabilistic": {"sampling_percentage": 0},
                    }
                },
            },
            {"name": "otep", "type": "threshold"},
            {"name": "lat", "type": "latency", "latency": {"threshold_ms": 50}},
        ],
        [
            {"name": "roots", "type": "root_spans", "sub": {"type": "probabilistic", "pct": 0}},
            {"name": "otep", "type": "threshold"},
            {"name": "lat", "type": "latency", "threshold_ms": 50},
        ],
    ),
    (
        [
            {
                "name": "down",
                "type": "downgrader",
                "emit_single_span_for_not_sampled": False,
                "downgrader": {
                    "downgrade_to": "NotSampled",
                    "sub_policy": {"name": "s", "type": "span_count", "span_count": {"min_spans": 4}},
                },
            },
            {"name": "prob", "type": "probabilistic", "probabilistic": {"sampling_percentage": 50}},
        ],
        [
            {"name": "down", "type": "downgrader", "to": D.NOT_SAMPLED,
             "sub": {"type": "span_count", "min_spans": 4}},
            {"name": "prob", "type": "probabilistic", "pct": 50},
        ],
    ),
]

span_strategy = st.fixed_dictionaries(
    {
        "doc": st.integers(min_value=0, max_value=11),
        "span_id": st.integers(min_value=1, max_value=10**6),
        "batch": st.integers(min_value=0, max_value=2),
        "root": st.booleans(),
        "status": st.sampled_from([0, 1, 2]),
        "thr_len": st.sampled_from([0, 0, 0, 4, 14]),
        "thr_val": st.integers(min_value=0, max_value=(1 << 56) - 1),
        "dur_ms": st.integers(min_value=0, max_value=200),
        "is_decision": st.booleans(),
        "decision_value": st.booleans(),
    }
)

scenario = st.tuples(
    st.lists(span_strategy, min_size=1, max_size=25, unique_by=lambda s: s["span_id"]),
    st.integers(min_value=0, max_value=len(POLICY_PRESETS) - 1),
    st.sampled_from([(10**6, 10**6), (3, 2), (2, 1)]),
    # decision-cache caps, including ASYMMETRIC ones — a watermark for
    # one kind while the other stays under capacity is the regime the
    # round-4 review bug lived in (single-kind min-wm prune)
    st.sampled_from([(10**9, 10**9), (4, 3), (2, 10**9), (10**9, 2), (1, 1)]),
)


def to_engine_and_sim_spans(raw):
    eng, sim = [], {}
    for s in raw:
        doc = trace_id(900 + s["doc"])
        is_dec = s["is_decision"] and (s["span_id"] % 7 == 0)  # sparse decision spans
        thr_len = 0 if is_dec else s["thr_len"]
        keep_bits = thr_len * 4
        thr_val = (
            (s["thr_val"] >> (56 - keep_bits)) << (56 - keep_bits) if thr_len else 0
        )
        start = BASE + s["span_id"] * 1_000_000
        end = start + s["dur_ms"] * 1_000_000
        eng.append(
            dict(
                doc_id=doc,
                span_id=s["span_id"],
                parent_span_id=0 if s["root"] else 12345,
                start_ts=start,
                end_ts=end,
                status=s["status"],
                threshold_len=thr_len,
                threshold_value=thr_val,
                is_decision_span=int(is_dec),
                decision_value=int(s["decision_value"]) if is_dec else 0,
                batch_idx=s["batch"],
            )
        )
        sim.setdefault(s["batch"], []).append(
            dict(
                doc_id=doc,
                span_id=s["span_id"],
                parent=0 if s["root"] else 12345,
                start=start,
                end=end,
                status=["UNSET", "OK", "ERROR"][s["status"]],
                threshold=thr_val if thr_len else None,
                is_decision=is_dec,
                decision_value=bool(s["decision_value"]),
                tokens_key=s["span_id"],
            )
        )
    batches = [sim.get(b, []) for b in range(max(sim) + 1)] if sim else []
    return eng, batches


@pytest.mark.differential
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(scenario)
def test_differential_vs_simulator(spark, tmp_path_factory, sc):
    raw, preset_idx, (prim_cap, sec_cap), (s_cap, ns_cap) = sc
    eng_pols, sim_pols = POLICY_PRESETS[preset_idx]
    eng_spans, sim_batches = to_engine_and_sim_spans(raw)

    # simulator uses status-name lists for status_code policies
    for p in sim_pols:
        if p["type"] == "status_code":
            p["codes"] = ["ERROR"]

    tmp = tmp_path_factory.mktemp("diff")
    pipe = SamplingPipeline(
        spark,
        parse_policies(eng_pols),
        EngineConfig(
            primary_cache_size=prim_cap, secondary_cache_size=sec_cap,
            sampled_cache_size=s_cap, non_sampled_cache_size=ns_cap,
        ),
        checkpoint_dir=str(tmp / "ck"),
        output_dir=str(tmp / "out"),
    )
    df = seq_table_from_spans(spark, eng_spans)
    pipe.run(df)

    got = []
    for sink in ("keep", "drop", "low_priority"):
        for r in pipe.read_sink(sink).collect():
            if r.reason == "not_sampled_placeholder":
                continue
            # tokens_key = span_id decoded from tokens (slot 10-13)
            sid = 0
            for c in r.tokens[10:14]:
                sid = (sid << 16) | c
            got.append((sink, r.doc_id, sid, r.reason))

    want, dec, pend = simulate(
        sim_pols, sim_batches, prim_cap, sec_cap,
        sampled_cache_cap=s_cap, non_sampled_cache_cap=ns_cap,
    )
    want = [w for w in want if w[3] != "not_sampled_placeholder"]
    assert sorted(got) == sorted(want)

    # final decision state agrees
    last = pipe.store.last_committed_batch()
    got_dec = {
        r.doc_id: r.decision for r in pipe.store.read("decision_state", last).collect()
    }
    assert got_dec == {doc: d for doc, (d, _p, _b) in dec.items()}
    got_pend = {r.doc_id for r in pipe.store.read("pending_state", last).collect()}
    assert got_pend == set(pend)
