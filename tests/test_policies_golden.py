"""Golden decision tables ported from the reference evaluator tests
(FIXTURES.md §4). Each case builds the merged per-trace aggregate the
policy expressions read and asserts the Decision code.
"""

import pytest
from pyspark.sql import functions as F

from atlassian_sampling_processor_spark import decision as D
from atlassian_sampling_processor_spark.policies import (
    AndPolicy,
    Downgrader,
    ErrorStub,
    Latency,
    OTTLCondition,
    PolicyError,
    RootSpans,
    SpanCount,
    StaticStub,
    StatusCode,
    Threshold,
)
from atlassian_sampling_processor_spark.policies.builders import parse_threshold_attr

from .conftest import hex_trace, merged_df


def eval_one(spark, policy, row_over: dict) -> int:
    df = merged_df(spark, [row_over])
    return df.select(policy.decision().alias("d")).collect()[0].d


# --- threshold / OTEP-235 (threshold_test.go:22-150) -----------------------

THRESHOLD_CASES = [
    # (trace_id, thresholds, expected)
    ("0000000000000000007fffffffffffff", ["0x7ffffffffffffe"], D.SAMPLED),
    ("0000000000000000007ffffffffffffe", ["0x7fffffffffffff"], D.PENDING),
    ("0000000000000000007fffffffffffff", ["0x8"], D.PENDING),
    ("0000000000000000008fffffffffffff", ["0x8"], D.SAMPLED),
    ("00000000000000000000000000000000", ["0x"], D.SAMPLED),
    ("000000000000000000fd70a3d5000000", ["0xfd70a3d6", "0xfd70a3d5"], D.SAMPLED),
    ("000000000000000000fd70a3d5000000", ["0xfd70a3d5", "0xfd70a3d6"], D.SAMPLED),
    ("0000000000000000fffffffffffffffe", ["0xffffffffffffff"], D.PENDING),
    ("0000000000000000ffffffffffffffff", ["invalid", "0x000"], D.SAMPLED),
    ("0000000000000000ffffffffffffffff", ["invalid", "00000"], D.PENDING),
    ("0000000000000000ffffffffffffffff", ["000000000000000"], D.PENDING),
    ("0000000000000000ffffffffffffffff", [None], D.PENDING),  # span w/o threshold
]


@pytest.mark.parametrize("trace_id,thresholds,expected", THRESHOLD_CASES)
def test_threshold_golden(spark, trace_id, thresholds, expected):
    hi, lo = hex_trace(trace_id)
    # string-level parse (threshold.go:60-84) then the per-trace min + rv compare
    spans = spark.createDataFrame(
        [(t,) for t in thresholds], schema="sampling_tail_threshold string"
    )
    parsed = spans.select(parse_threshold_attr(F.col("sampling_tail_threshold")).alias("tv"))
    agg = parsed.agg(F.min("tv").alias("min_threshold")).collect()[0]
    got = eval_one(
        spark,
        Threshold(name="p"),
        dict(trace_hi=hi, trace_lo=lo, min_threshold=agg.min_threshold),
    )
    assert got == expected


# --- root_spans (root_spans_test.go:27-167) ---------------------------------


@pytest.mark.parametrize(
    "span_count,any_root,sub,prio,expected",
    [
        (1, True, StaticStub(name="s", static_decision=D.PENDING), 2, D.LOW_PRIORITY),
        (1, False, StaticStub(name="s", static_decision=D.PENDING), 2, D.PENDING),
        (1, False, StaticStub(name="s", static_decision=D.PENDING), 1, D.LOW_PRIORITY),
        (1, False, StaticStub(name="s", static_decision=D.SAMPLED), 1, D.PENDING),
        (2, True, StaticStub(name="s", static_decision=D.SAMPLED), 2, D.PENDING),
        (10, True, StaticStub(name="s", static_decision=D.PENDING), 2, D.PENDING),
        (1, True, ErrorStub(name="s"), 2, D.UNSPECIFIED),
    ],
)
def test_root_spans_golden(spark, span_count, any_root, sub, prio, expected):
    pol = RootSpans(name="root", sub_policy=sub)
    got = eval_one(
        spark,
        pol,
        dict(total_span_count=span_count, any_root=any_root, merged_priority=prio),
    )
    assert got == expected


# --- latency (latency_test.go:21-66: >= threshold, ms truncation) ----------


@pytest.mark.parametrize(
    "dur_ms,thr_ms,expected",
    [(4500, 5000, D.PENDING), (5000, 5000, D.SAMPLED), (8000, 5000, D.SAMPLED)],
)
def test_latency_golden(spark, dur_ms, thr_ms, expected):
    got = eval_one(
        spark,
        Latency(name="lat", threshold_ms=thr_ms),
        dict(merged_min_start=10**9, merged_max_end=10**9 + dur_ms * 1_000_000),
    )
    assert got == expected


def test_latency_truncates_sub_ms(spark):
    # 4999.999999 ms → 4999 ms < 5000 ⇒ Pending (Go Milliseconds() truncation)
    got = eval_one(
        spark,
        Latency(name="lat", threshold_ms=5000),
        dict(merged_min_start=0, merged_max_end=5_000_000_000 - 1),
    )
    assert got == D.PENDING


# --- span_count (span_count_sampler_test.go:21-63) --------------------------


@pytest.mark.parametrize(
    "batch,cached,expected",
    [(1, 0, D.PENDING), (3, 0, D.SAMPLED), (2, 1, D.SAMPLED)],
)
def test_span_count_golden(spark, batch, cached, expected):
    got = eval_one(
        spark,
        SpanCount(name="sc", min_spans=3),
        dict(batch_span_count=batch, total_span_count=batch + cached),
    )
    assert got == expected


def test_span_count_min_zero_always_samples(spark):
    got = eval_one(spark, SpanCount(name="sc", min_spans=0), dict(total_span_count=1))
    assert got == D.SAMPLED


# --- status_code (status_code_test.go:20-84) --------------------------------


def test_status_code_build_errors():
    with pytest.raises(PolicyError):
        StatusCode(name="s", status_codes=[])
    with pytest.raises(PolicyError):
        StatusCode(name="s", status_codes=["BOGUS"])


@pytest.mark.parametrize(
    "codes,flags,expected",
    [
        (["ERROR"], dict(any_status_error=True), D.SAMPLED),
        (["ERROR"], dict(any_status_ok=True), D.PENDING),
        (["ERROR", "UNSET"], dict(any_status_unset=True), D.SAMPLED),
        (["OK"], dict(any_status_ok=True), D.SAMPLED),
        (["OK", "ERROR", "UNSET"], dict(), D.PENDING),
    ],
)
def test_status_code_golden(spark, codes, flags, expected):
    got = eval_one(spark, StatusCode(name="s", status_codes=codes), flags)
    assert got == expected


# --- and (and_test.go:23-67) -------------------------------------------------


@pytest.mark.parametrize(
    "subs,expected",
    [
        ([D.SAMPLED, D.SAMPLED], D.SAMPLED),
        ([D.PENDING, D.SAMPLED], D.PENDING),
        ([D.SAMPLED, D.PENDING], D.PENDING),
        ([D.SAMPLED, D.NOT_SAMPLED, D.PENDING], D.NOT_SAMPLED),
        ([D.LOW_PRIORITY, D.SAMPLED], D.LOW_PRIORITY),
    ],
)
def test_and_golden(spark, subs, expected):
    pol = AndPolicy(
        name="and",
        sub_policies=[StaticStub(name=f"s{i}", static_decision=d) for i, d in enumerate(subs)],
    )
    assert eval_one(spark, pol, {}) == expected


def test_and_sub_error_is_unspecified(spark):
    pol = AndPolicy(
        name="and",
        sub_policies=[StaticStub(name="a", static_decision=D.SAMPLED), ErrorStub(name="e")],
    )
    assert eval_one(spark, pol, {}) == D.UNSPECIFIED


# --- downgrader (downgrader_test.go:16-42) -----------------------------------


@pytest.mark.parametrize(
    "sub,to,expected",
    [
        (D.SAMPLED, "NotSampled", D.NOT_SAMPLED),
        (D.SAMPLED, "LowPriority", D.LOW_PRIORITY),
        (D.PENDING, "NotSampled", D.PENDING),
        (D.NOT_SAMPLED, "LowPriority", D.NOT_SAMPLED),
    ],
)
def test_downgrader_golden(spark, sub, to, expected):
    pol = Downgrader(
        name="dg", downgrade_to=to, sub_policy=StaticStub(name="s", static_decision=sub)
    )
    assert eval_one(spark, pol, {}) == expected


def test_downgrader_sub_error(spark):
    pol = Downgrader(name="dg", downgrade_to="NotSampled", sub_policy=ErrorStub(name="e"))
    assert eval_one(spark, pol, {}) == D.UNSPECIFIED


def test_downgrader_invalid_target():
    with pytest.raises(PolicyError):
        Downgrader(name="dg", downgrade_to="Bogus", sub_policy=StaticStub(name="s"))


# --- ottl_condition (ottl_test.go:22-112) ------------------------------------

SPAN_SCHEMA = (
    "doc_id string, trace_hi long, trace_lo long, span_id long,"
    " start_ts long, end_ts long,"
    " status_id int, threshold_len int, threshold_value long, is_root boolean,"
    " source string, name string, attrs map<string,string>,"
    " event_name string, event_attrs map<string,string>,"
    " resource_attrs map<string,string>, kind int,"
    " scope_name string, scope_version string"
)


def span_row(**over):
    base = dict(
        doc_id="0" * 32,
        trace_hi=0,
        trace_lo=0,
        span_id=1,
        start_ts=0,
        end_ts=0,
        status_id=0,
        threshold_len=0,
        threshold_value=0,
        is_root=False,
        source="svc",
        name="span-name",
        attrs={},
        event_name=None,
        event_attrs=None,
        resource_attrs={"service.name": "svc"},
        kind=1,
        scope_name="otelhttp",
        scope_version="0.49.0",
    )
    base.update(over)
    return base


def eval_ottl(spark, pol, spans) -> int:
    from atlassian_sampling_processor_spark.aggregate import aggregate_batch, merge_with_pending
    from atlassian_sampling_processor_spark.decider import make_decision

    df = spark.createDataFrame([span_row(**s) for s in spans], schema=SPAN_SCHEMA)
    agg = aggregate_batch(df, [pol])
    merged = merge_with_pending(agg, None)
    out = make_decision(merged, [pol]).collect()
    assert len(out) == 1
    return out[0].decision


def test_ottl_build_errors():
    with pytest.raises(PolicyError):
        OTTLCondition(name="o")  # no conditions
    with pytest.raises(PolicyError):
        OTTLCondition(name="o", span_conditions=["invalid_expr"])


@pytest.mark.parametrize(
    "span_conds,event_conds,spans,expected",
    [
        (['attributes["attr_k_1"] == "attr_v_1"'], [], [dict(attrs={"attr_k_1": "attr_v_1"})], D.SAMPLED),
        (['attributes["attr_k_1"] != "attr_v_1"'], [], [dict(attrs={"attr_k_1": "attr_v_1"})], D.PENDING),
        (['attributes["attr_k_1"] != "attr_v_1"'], [], [dict(attrs={"attr_k_1": "attr_v_2"})], D.SAMPLED),
        ([], ['attributes["ek"] == "ev"'], [dict(event_name="x", event_attrs={"ek": "ev"})], D.SAMPLED),
        ([], ['name != "incorrect event name"'], [dict(event_name="real-event")], D.SAMPLED),
        ([], ['name != "incorrect event name"'], [dict()], D.PENDING),  # no event on span
        (
            ['attributes["attr_k_1"] == "attr_v_1"'],
            ['attributes["ek"] == "ev"'],
            [dict(attrs={"other": "v"})],
            D.PENDING,
        ),
    ],
)
def test_ottl_golden(spark, span_conds, event_conds, spans, expected):
    pol = OTTLCondition(
        name="ottl", span_conditions=span_conds, span_event_conditions=event_conds
    )
    assert eval_ottl(spark, pol, spans) == expected


@pytest.mark.parametrize(
    "span_conds,event_conds,spans,expected",
    [
        # IsMatch (regex) on attr / name
        (['IsMatch(attributes["k"], "^pre.*")'], [], [dict(attrs={"k": "prefix-x"})], D.SAMPLED),
        (['IsMatch(attributes["k"], "^pre.*")'], [], [dict(attrs={"k": "other"})], D.PENDING),
        (['IsMatch(attributes["k"], "^pre")'], [], [dict(attrs={})], D.PENDING),  # missing attr
        (['IsMatch(name, "span-.*")'], [], [dict()], D.SAMPLED),
        # numeric comparisons on string-typed attrs (try_cast semantics)
        (['attributes["n"] > 5'], [], [dict(attrs={"n": "7"})], D.SAMPLED),
        (['attributes["n"] > 5'], [], [dict(attrs={"n": "3"})], D.PENDING),
        (['attributes["n"] >= 5.5'], [], [dict(attrs={"n": "5.5"})], D.SAMPLED),
        (['attributes["n"] < 5'], [], [dict(attrs={"n": "not-a-number"})], D.PENDING),
        (['attributes["n"] <= 5'], [], [dict(attrs={})], D.PENDING),  # missing ⇒ false
        # and / or / not composition with parentheses
        (
            ['attributes["a"] == "1" and attributes["b"] == "2"'],
            [], [dict(attrs={"a": "1", "b": "2"})], D.SAMPLED,
        ),
        (
            ['attributes["a"] == "1" and attributes["b"] == "2"'],
            [], [dict(attrs={"a": "1", "b": "x"})], D.PENDING,
        ),
        (
            ['attributes["a"] == "1" or attributes["b"] == "2"'],
            [], [dict(attrs={"b": "2"})], D.SAMPLED,
        ),
        # precedence: and binds tighter than or
        (
            ['attributes["a"] == "x" and attributes["a"] == "y" or attributes["b"] == "2"'],
            [], [dict(attrs={"b": "2"})], D.SAMPLED,
        ),
        (
            ['not (attributes["a"] == "1")'],
            [], [dict(attrs={"a": "2"})], D.SAMPLED,
        ),
        # spanevent grammar forms still require an event on the span
        ([], ['attributes["n"] > 5'], [dict(event_name="e", event_attrs={"n": "9"})], D.SAMPLED),
        ([], ['attributes["n"] > 5'], [dict()], D.PENDING),
    ],
)
def test_ottl_widened_grammar_golden(spark, span_conds, event_conds, spans, expected):
    """IsMatch / numeric comparisons / and-or-not (ottl.go:42-120 wires
    the full collector-contrib grammar; this is the documented subset)."""
    pol = OTTLCondition(
        name="ottl_wide", span_conditions=span_conds, span_event_conditions=event_conds
    )
    assert eval_ottl(spark, pol, spans) == expected


def test_ottl_widened_build_errors():
    with pytest.raises(PolicyError, match="not a valid regex"):
        OTTLCondition(name="o", span_conditions=['IsMatch(name, "([")'])
    with pytest.raises(PolicyError):
        OTTLCondition(name="o", span_conditions=['attributes["a"] == '])  # dangling op
    with pytest.raises(PolicyError, match="unsupported OTTL span field"):
        OTTLCondition(name="o", span_conditions=['span.events == "x"'])
    with pytest.raises(PolicyError, match="unknown converter"):
        OTTLCondition(name="o", span_conditions=['Uppercase(name) == "X"'])
    with pytest.raises(PolicyError):  # Duration takes a duration STRING
        OTTLCondition(name="o", span_conditions=['Duration(name) > 5'])
    with pytest.raises(PolicyError, match="must be an int literal"):
        OTTLCondition(name="o", span_conditions=['Substring(name, "a", 2) == "x"'])


# --- OTTL wave 3 (internal/evaluators/ottl.go:42-120 wires the full
# contrib grammar; these are the paths/converters a production config
# hits first beyond the round-2 subset) ---------------------------------------

@pytest.mark.parametrize(
    "span_conds,spans,expected",
    [
        # resource.attributes (the #1 gap a ported config hits)
        (['resource.attributes["service.name"] == "svc"'], [dict()], D.SAMPLED),
        (['resource.attributes["service.name"] == "other"'], [dict()], D.PENDING),
        (['IsMatch(resource.attributes["service.name"], "^sv.*")'], [dict()], D.SAMPLED),
        # span kind (int enum: INTERNAL=1 SERVER=2 CLIENT=3)
        (["kind == 2"], [dict(kind=2)], D.SAMPLED),
        (["kind == 2"], [dict(kind=3)], D.PENDING),
        (["span.kind == 3"], [dict(kind=3)], D.SAMPLED),
        # status.code path (UNSET=0 OK=1 ERROR=2)
        (["status.code == 2"], [dict(status_id=2)], D.SAMPLED),
        (["status.code != 0"], [dict(status_id=0)], D.PENDING),
        # duration arithmetic over the timestamp paths
        (
            ["end_time_unix_nano - start_time_unix_nano > 5000000"],
            [dict(start_ts=1_000_000_000, end_ts=1_010_000_000)],
            D.SAMPLED,
        ),
        (
            ["end_time_unix_nano - start_time_unix_nano > 5000000"],
            [dict(start_ts=1_000_000_000, end_ts=1_001_000_000)],
            D.PENDING,
        ),
        # converters
        (["Len(name) == 9"], [dict(name="span-name")], D.SAMPLED),
        (["Len(name) > 99"], [dict(name="span-name")], D.PENDING),
        (['Len(attributes["k"]) == 3'], [dict(attrs={})], D.PENDING),  # nil → false
        (['Substring(name, 0, 4) == "span"'], [dict(name="span-name")], D.SAMPLED),
        (['Substring(name, 5, 4) == "name"'], [dict(name="span-name")], D.SAMPLED),
        # nil literal = presence check (OTTL nil semantics, NOT SQL NULL)
        (['attributes["k"] == nil'], [dict(attrs={})], D.SAMPLED),
        (['attributes["k"] == nil'], [dict(attrs={"k": "v"})], D.PENDING),
        (['attributes["k"] != nil'], [dict(attrs={"k": "v"})], D.SAMPLED),
        (['attributes["k"] != nil'], [dict(attrs={})], D.PENDING),
        (['nil == attributes["k"]'], [dict(attrs={})], D.SAMPLED),  # symmetric
        (['attributes["k"] > nil'], [dict(attrs={"k": "v"})], D.PENDING),  # order vs nil = false
        # id-to-hex paths (contrib trace_id.string / span_id.string)
        (['IsMatch(trace_id.string, "^0{32}$")'], [dict()], D.SAMPLED),
        (['trace_id.string == "ff"'], [dict()], D.PENDING),
        (['span_id.string == "0000000000000001"'], [dict(span_id=1)], D.SAMPLED),
        (['Substring(span_id.string, 15, 1) == "f"'], [dict(span_id=15)], D.SAMPLED),
    ],
)
def test_ottl_wave3_golden(spark, span_conds, spans, expected):
    pol = OTTLCondition(name="ottl_w3", span_conditions=span_conds)
    assert eval_ottl(spark, pol, spans) == expected


@pytest.mark.parametrize(
    "span_conds,spans,expected",
    [
        # ConvertCase (ottlfuncs/func_convert_case.go)
        (['ConvertCase(name, "upper") == "SPAN-NAME"'], [dict()], D.SAMPLED),
        (['ConvertCase(attributes["k"], "lower") == "abc"'], [dict(attrs={"k": "AbC"})], D.SAMPLED),
        (['ConvertCase(attributes["k"], "lower") == "abc"'], [dict(attrs={})], D.PENDING),
        # Concat over mixed literal/path parts (concat_ws: nil parts skipped)
        (
            ['Concat([name, attributes["k"]], "-") == "span-name-v1"'],
            [dict(attrs={"k": "v1"})],
            D.SAMPLED,
        ),
        (
            ['Concat([name, attributes["k"]], "-") == "span-name"'],
            [dict(attrs={})],  # nil part skipped, no trailing delim
            D.SAMPLED,
        ),
        # cast converters: Int/Double try-cast (non-numeric → nil → false)
        (['Int(attributes["n"]) == 7'], [dict(attrs={"n": "7"})], D.SAMPLED),
        (['Int(attributes["n"]) == 7'], [dict(attrs={"n": "x"})], D.PENDING),
        (['Double(attributes["n"]) > 1.5'], [dict(attrs={"n": "1.75"})], D.SAMPLED),
        (['String(kind) == "2"'], [dict(kind=2)], D.SAMPLED),
        # converters compose
        (['Len(Concat([name, name], "")) == 18'], [dict()], D.SAMPLED),
        (['IsMatch(ConvertCase(name, "upper"), "^SPAN")'], [dict()], D.SAMPLED),
    ],
)
def test_ottl_wave4_converters_golden(spark, span_conds, spans, expected):
    pol = OTTLCondition(name="ottl_w4", span_conditions=span_conds)
    assert eval_ottl(spark, pol, spans) == expected


def test_ottl_wave4_build_errors():
    # "snake"/"camel" graduated to supported modes in wave 9; "title"
    # remains outside the contrib mode set
    with pytest.raises(PolicyError, match="ConvertCase mode"):
        OTTLCondition(name="o", span_conditions=['ConvertCase(name, "title") == "x"'])
    with pytest.raises(PolicyError, match="unknown converter"):
        OTTLCondition(name="o", span_conditions=['Truncate(name, 3) == "spa"'])


# --- OTTL wave 5 (round 4): scope paths, IsRootSpan, Is* predicates,
# error_mode=propagate (ottl.go:42-120 error path → decider.go:46-48) ---------


@pytest.mark.parametrize(
    "span_conds,spans,expected",
    [
        # instrumentation_scope paths (deterministic fixture, codec.SCOPE_INFO)
        (['instrumentation_scope.name == "otelhttp"'], [dict()], D.SAMPLED),
        (['instrumentation_scope.name == "otelsql"'], [dict()], D.PENDING),
        (
            ['instrumentation_scope.version >= "0.49.0"'],
            [dict(scope_version="0.49.0")],
            D.SAMPLED,
        ),
        # IsRootSpan (ottlfuncs, wired by the reference's standardSpanFuncs)
        (["IsRootSpan()"], [dict(is_root=True)], D.SAMPLED),
        (["IsRootSpan()"], [dict(is_root=False)], D.PENDING),
        (['IsRootSpan() and status.code == 2'], [dict(is_root=True, status_id=2)], D.SAMPLED),
        # type predicates: static pdata types + runtime presence
        (['IsString(attributes["k"])'], [dict(attrs={"k": "v"})], D.SAMPLED),
        (['IsString(attributes["k"])'], [dict(attrs={})], D.PENDING),
        (["IsInt(start_time_unix_nano)"], [dict()], D.SAMPLED),
        (["IsString(start_time_unix_nano)"], [dict()], D.PENDING),
        (["IsDouble(Double(attributes[\"n\"]))"], [dict(attrs={"n": "1.5"})], D.SAMPLED),
        (["IsBool(IsRootSpan())"], [dict()], D.SAMPLED),
    ],
)
def test_ottl_wave5_golden(spark, span_conds, spans, expected):
    pol = OTTLCondition(name="ottl_w5", span_conditions=span_conds)
    assert eval_ottl(spark, pol, spans) == expected


def test_ottl_wave5_build_errors():
    with pytest.raises(PolicyError):
        # IsRootSpan is a span-context converter (standardSpanEventFuncs
        # does not register it)
        OTTLCondition(name="o", span_event_conditions=["IsRootSpan()"])
    with pytest.raises(PolicyError):
        OTTLCondition(name="o", span_conditions=["x == 1"], error_mode="bogus")


# The observable propagate-vs-ignore divergence (same condition, same
# trace): span A (earlier order) errors, span B (later) matches.
# ignore → the errored condition is false, B samples the trace;
# propagate → evaluation stops at A with an error → Unspecified →
# the decider logs and continues (no sample from this policy).
_DIVERGE_COND = 'Int(attributes["n"]) == 7'
_DIVERGE_SPANS = [
    dict(span_id=1, start_ts=100, attrs={"n": "not-a-number"}),  # errors first
    dict(span_id=2, start_ts=200, attrs={"n": "7"}),  # matches later
]
_MATCH_FIRST = [
    dict(span_id=1, start_ts=100, attrs={"n": "7"}),  # matches first
    dict(span_id=2, start_ts=200, attrs={"n": "not-a-number"}),  # errors later
]


def eval_ottl_policy(spark, pol, spans) -> int:
    """The POLICY's own decision (policy_decisions[0]) — Unspecified is
    non-decisive, so the final trace decision would mask it."""
    from atlassian_sampling_processor_spark.aggregate import aggregate_batch, merge_with_pending
    from atlassian_sampling_processor_spark.decider import make_decision

    df = spark.createDataFrame([span_row(**s) for s in spans], schema=SPAN_SCHEMA)
    merged = merge_with_pending(aggregate_batch(df, [pol]), None)
    out = make_decision(merged, [pol]).collect()
    assert len(out) == 1
    return out[0].policy_decisions[0]


@pytest.mark.parametrize(
    "error_mode,spans,expected",
    [
        ("ignore", _DIVERGE_SPANS, D.SAMPLED),
        ("propagate", _DIVERGE_SPANS, D.UNSPECIFIED),
        # match BEFORE the error in span order: both modes sample
        # (propagate stops at the first deciding span — the match)
        ("ignore", _MATCH_FIRST, D.SAMPLED),
        ("propagate", _MATCH_FIRST, D.SAMPLED),
        # error only, no match: ignore → Pending, propagate → Unspecified
        ("ignore", [_DIVERGE_SPANS[0]], D.PENDING),
        ("propagate", [_DIVERGE_SPANS[0]], D.UNSPECIFIED),
        # clean spans: identical in both modes
        ("propagate", [dict(attrs={"n": "7"})], D.SAMPLED),
        ("propagate", [dict(attrs={"n": "5"})], D.PENDING),
        ("propagate", [dict(attrs={})], D.PENDING),  # absent → nil, no error
    ],
)
def test_ottl_error_mode_golden(spark, error_mode, spans, expected):
    pol = OTTLCondition(
        name="ottl_em", span_conditions=[_DIVERGE_COND], error_mode=error_mode
    )
    assert eval_ottl_policy(spark, pol, spans) == expected


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # contrib's ignore surfaces errors at the CONDITION level: the
        # whole condition whose evaluation errors is skipped, so an
        # erroring left arm makes `a or b` false even when b is true
        # (leaf absorption would have let b match) — round-5 fix
        (
            'Int(attributes["n"]) == 7 or name == "span-name"',
            [dict(attrs={"n": "not-a-number"})],
            D.PENDING,
        ),
        # ...the same condition with a NON-erroring false left arm: b wins
        (
            'Int(attributes["n"]) == 7 or name == "span-name"',
            [dict(attrs={"n": "5"})],
            D.SAMPLED,
        ),
        # ...and with an absent attr: Int(nil) is nil (no strconv error),
        # the or falls through to b
        (
            'Int(attributes["n"]) == 7 or name == "span-name"',
            [dict(attrs={})],
            D.SAMPLED,
        ),
        # short-circuit: a TRUE left arm means the erroring right arm is
        # never evaluated — no error, the condition matches
        (
            'name == "span-name" or Int(attributes["n"]) == 7',
            [dict(attrs={"n": "not-a-number"})],
            D.SAMPLED,
        ),
        # and: erroring right arm behind a true left → condition error → skip
        (
            'name == "span-name" and Int(attributes["n"]) == 7',
            [dict(attrs={"n": "not-a-number"})],
            D.PENDING,
        ),
        # and short-circuit: false left → right never evaluated → no error
        (
            'name == "other" and Int(attributes["n"]) == 7 or kind == 1',
            [dict(attrs={"n": "not-a-number"}, kind=1)],
            D.SAMPLED,
        ),
        # not over an erroring term is still a condition error → skip
        (
            'not (IsMatch(attributes["missing"], "a.*"))',
            [dict(attrs={})],
            D.PENDING,
        ),
        # per-SPAN granularity: the erroring span is skipped, a clean
        # later span can still match
        (
            'Int(attributes["n"]) == 7 or name == "span-name"',
            [dict(span_id=1, attrs={"n": "bad"}), dict(span_id=2, attrs={})],
            D.SAMPLED,
        ),
    ],
)
def test_ottl_ignore_condition_level_errors(spark, cond, spans, expected):
    """Ignore-mode error semantics are condition-level, matching contrib
    (ConditionSequence.Eval: an erroring condition is logged and
    SKIPPED), not leaf-level absorption — the round-4 documented
    divergence is closed."""
    pol = OTTLCondition(name="ottl_ig", span_conditions=[cond], error_mode="ignore")
    assert eval_ottl_policy(spark, pol, spans) == expected


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # Substring out of range errors (func_substring bounds)
        ('Substring(name, 0, 99) == "x"', [dict(name="short")], D.UNSPECIFIED),
        # IsMatch over an absent value errors (StandardStringLikeGetter nil)
        ('IsMatch(attributes["missing"], "a.*")', [dict(attrs={})], D.UNSPECIFIED),
        # arithmetic over a present non-numeric value errors
        ('attributes["n"] + 1 > 0', [dict(attrs={"n": "NaNope"})], D.UNSPECIFIED),
        # ...but over an ABSENT value it is nil, not an error
        ('attributes["n"] + 1 > 0', [dict(attrs={})], D.PENDING),
    ],
)
def test_ottl_propagate_error_sources(spark, cond, spans, expected):
    pol = OTTLCondition(name="ottl_errs", span_conditions=[cond], error_mode="propagate")
    assert eval_ottl_policy(spark, pol, spans) == expected


def test_ottl_propagate_decider_continues(spark):
    """An erroring propagate policy is non-decisive: the decider falls
    through to the next policy (decider.go:46-48 log-and-continue)."""
    from atlassian_sampling_processor_spark.aggregate import aggregate_batch, merge_with_pending
    from atlassian_sampling_processor_spark.decider import make_decision

    p1 = OTTLCondition(
        name="erroring", span_conditions=[_DIVERGE_COND], error_mode="propagate"
    )
    p2 = SpanCount(name="fallback", min_spans=1)
    df = spark.createDataFrame(
        [span_row(attrs={"n": "boom"})], schema=SPAN_SCHEMA
    )
    merged = merge_with_pending(aggregate_batch(df, [p1, p2]), None)
    out = make_decision(merged, [p1, p2]).collect()[0]
    assert out.decision == D.SAMPLED and out.policy == "fallback"
    assert list(out.policy_decisions) == [D.UNSPECIFIED, D.SAMPLED]


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # ParseJSON + ["key"] indexing (ottlfuncs func_parse_json)
        (
            'ParseJSON(attributes["payload"])["user"] == "alice"',
            [dict(attrs={"payload": '{"user": "alice", "n": 3}'})],
            D.SAMPLED,
        ),
        (
            'ParseJSON(attributes["payload"])["n"] == 3',
            [dict(attrs={"payload": '{"user": "alice", "n": 3}'})],
            D.SAMPLED,
        ),
        # nested key chain
        (
            'ParseJSON(attributes["payload"])["a"]["b"] == "x"',
            [dict(attrs={"payload": '{"a": {"b": "x"}}'})],
            D.SAMPLED,
        ),
        # absent key → nil → comparison false; != nil presence semantics
        (
            'ParseJSON(attributes["payload"])["missing"] == "x"',
            [dict(attrs={"payload": '{"a": 1}'})],
            D.PENDING,
        ),
        (
            'ParseJSON(attributes["payload"])["a"] != nil',
            [dict(attrs={"payload": '{"a": 1}'})],
            D.SAMPLED,
        ),
        # invalid JSON → nil in ignore mode (no runtime error)
        (
            'ParseJSON(attributes["payload"])["a"] == "x"',
            [dict(attrs={"payload": "not json"})],
            D.PENDING,
        ),
    ],
)
def test_ottl_parsejson_golden(spark, cond, spans, expected):
    pol = OTTLCondition(name="pj", span_conditions=[cond])
    assert eval_ottl(spark, pol, spans) == expected


def test_ottl_parsejson_propagate_and_build():
    with pytest.raises(PolicyError):
        # un-indexed ParseJSON has no scalar value in this grammar
        OTTLCondition(name="o", span_conditions=['ParseJSON(attributes["p"]) == "x"'])


def test_ottl_parsejson_propagate_error(spark):
    """Invalid JSON on a present value is an eval error under propagate
    (func_parse_json unmarshal failure) — and so is an ABSENT value:
    func_parse_json reads through a StandardStringGetter, which errors on
    nil, the same rule as IsMatch/Len/ConvertCase/Substring."""
    pol = OTTLCondition(
        name="pj", span_conditions=['ParseJSON(attributes["p"])["a"] == "x"'],
        error_mode="propagate",
    )
    assert eval_ottl_policy(spark, pol, [dict(attrs={"p": "not json"})]) == D.UNSPECIFIED
    assert eval_ottl_policy(spark, pol, [dict(attrs={})]) == D.UNSPECIFIED
    # ...and an earlier absent-target span beats a later matching span
    assert (
        eval_ottl_policy(
            spark,
            pol,
            [
                dict(span_id=1, start_ts=100, attrs={}),
                dict(span_id=2, start_ts=200, attrs={"p": '{"a": "x"}'}),
            ],
        )
        == D.UNSPECIFIED
    )


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # Duration (ottlfuncs func_duration): Go duration → int64 nanos
        (
            'end_time_unix_nano - start_time_unix_nano > Duration("5ms")',
            [dict(start_ts=0, end_ts=6_000_000)],
            D.SAMPLED,
        ),
        (
            'end_time_unix_nano - start_time_unix_nano > Duration("5ms")',
            [dict(start_ts=0, end_ts=4_000_000)],
            D.PENDING,
        ),
        (
            '(end_time_unix_nano - start_time_unix_nano) >= Duration("1h30m")',
            [dict(start_ts=0, end_ts=5_400_000_000_000)],
            D.SAMPLED,
        ),
    ],
)
def test_ottl_duration_golden(spark, cond, spans, expected):
    pol = OTTLCondition(name="dur", span_conditions=[cond])
    assert eval_ottl(spark, pol, spans) == expected


# --- OTTL wave 6 (round 5): Time/TruncateTime/Hour/UnixNano/Split +
# time paths + spanevent time_unix_nano/dropped_attributes_count ---------

# 2024-03-05 14:47:30 UTC
_T_NS = 1_709_650_050_000_000_000


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # Time: ctime-format parse → UTC unix nanos (func_time)
        (
            'UnixNano(Time(attributes["t"], "%Y-%m-%d %H:%M:%S")) == '
            + str(_T_NS),
            [dict(attrs={"t": "2024-03-05 14:47:30"})],
            D.SAMPLED,
        ),
        # literal letter in the format (the T separator) must be quoted
        (
            'UnixNano(Time(attributes["t"], "%Y-%m-%dT%H:%M:%S")) == '
            + str(_T_NS),
            [dict(attrs={"t": "2024-03-05T14:47:30"})],
            D.SAMPLED,
        ),
        # unparseable → nil in ignore mode → false
        (
            'UnixNano(Time(attributes["t"], "%Y-%m-%d")) > 0',
            [dict(attrs={"t": "not a date"})],
            D.PENDING,
        ),
        # TruncateTime: toward the epoch by a Duration (func_truncate_time)
        (
            'UnixNano(TruncateTime(Time(attributes["t"], "%Y-%m-%d %H:%M:%S"),'
            ' Duration("1m"))) == ' + str(_T_NS - 30_000_000_000),
            [dict(attrs={"t": "2024-03-05 14:47:30"})],
            D.SAMPLED,
        ),
        (
            'Time(attributes["t"], "%H:%M:%S") - TruncateTime('
            'Time(attributes["t"], "%H:%M:%S"), Duration("1m")) >= Duration("30s")',
            [dict(attrs={"t": "14:47:30"})],
            D.SAMPLED,
        ),
        # Hour: UTC hour-of-day (func_hour)
        (
            'Hour(Time(attributes["t"], "%Y-%m-%d %H:%M:%S")) == 14',
            [dict(attrs={"t": "2024-03-05 14:47:30"})],
            D.SAMPLED,
        ),
        # time paths: start_time/end_time are TIME values
        (
            'Hour(start_time) == 0 and UnixNano(end_time) - UnixNano(start_time) == 5',
            [dict(start_ts=0, end_ts=5)],
            D.SAMPLED,
        ),
        (
            'TruncateTime(end_time, Duration("1h")) == TruncateTime(start_time, Duration("1h"))',
            [dict(start_ts=_T_NS, end_ts=_T_NS + 60_000_000_000)],
            D.SAMPLED,
        ),
        # Split: literal delimiter, 0-based index, OOB → nil (func_split)
        (
            'Split(attributes["csv"], ",")[1] == "b"',
            [dict(attrs={"csv": "a,b,c"})],
            D.SAMPLED,
        ),
        (
            'Split(attributes["csv"], ",")[9] == "b"',
            [dict(attrs={"csv": "a,b,c"})],
            D.PENDING,
        ),
        (
            'Split(name, "-")[0] == "span"',
            [dict()],
            D.SAMPLED,
        ),
        # delimiter is LITERAL (not regex): "." splits on dots only
        (
            'Split(attributes["v"], ".")[2] == "3"',
            [dict(attrs={"v": "1.2.3"})],
            D.SAMPLED,
        ),
    ],
)
def test_ottl_wave6_golden(spark, cond, spans, expected):
    pol = OTTLCondition(name="ottl_w6", span_conditions=[cond])
    assert eval_ottl(spark, pol, spans) == expected


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # spanevent time_unix_nano (fixture = parent span start) and
        # dropped_attributes_count (always 0)
        (
            "time_unix_nano == 77 and dropped_attributes_count == 0",
            [dict(event_name="e", start_ts=77)],
            D.SAMPLED,
        ),
        ("time_unix_nano == 77", [dict(start_ts=77)], D.PENDING),  # no event
    ],
)
def test_ottl_wave6_spanevent_golden(spark, cond, spans, expected):
    pol = OTTLCondition(name="ottl_w6e", span_event_conditions=[cond])
    assert eval_ottl(spark, pol, spans) == expected


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # Time over nil errors (StandardStringGetter), like IsMatch/Len
        ('UnixNano(Time(attributes["t"], "%Y")) > 0', [dict(attrs={})], D.UNSPECIFIED),
        # Time over a present unparseable value errors (time.Parse)
        (
            'UnixNano(Time(attributes["t"], "%Y-%m-%d")) > 0',
            [dict(attrs={"t": "bogus"})],
            D.UNSPECIFIED,
        ),
        # Split over nil errors (StandardStringLikeGetter)
        ('Split(attributes["x"], ",")[0] == "a"', [dict(attrs={})], D.UNSPECIFIED),
        # ...but an out-of-range index on a present value is nil, not error
        (
            'Split(attributes["csv"], ",")[9] == "a"',
            [dict(attrs={"csv": "a,b"})],
            D.PENDING,
        ),
    ],
)
def test_ottl_wave6_propagate_errors(spark, cond, spans, expected):
    pol = OTTLCondition(name="w6err", span_conditions=[cond], error_mode="propagate")
    assert eval_ottl_policy(spark, pol, spans) == expected


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # Trim: strings.Trim cutset semantics (func_trim); default " "
        ('Trim(attributes["s"]) == "x"', [dict(attrs={"s": "  x  "})], D.SAMPLED),
        ('Trim(attributes["s"], "xy") == "ab"', [dict(attrs={"s": "yxabx"})], D.SAMPLED),
        ('Trim(attributes["s"]) == "x"', [dict(attrs={"s": "  y  "})], D.PENDING),
        # digest converters: lowercase hex (func_sha1/sha256/md5)
        (
            'SHA256(attributes["k"]) == '
            '"ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"',
            [dict(attrs={"k": "abc"})],
            D.SAMPLED,
        ),
        (
            'SHA1(attributes["k"]) == "a9993e364706816aba3e25717850c26c9cd0d89d"'
            ' and MD5(attributes["k"]) == "900150983cd24fb0d6963f7d28e17f72"',
            [dict(attrs={"k": "abc"})],
            D.SAMPLED,
        ),
        ("Len(SHA256(name)) == 64 and Len(SHA1(name)) == 40 and Len(MD5(name)) == 32",
         [dict()], D.SAMPLED),
        # duration folds: h/m/s → float64, ms/us/ns → int64
        ('Seconds(Duration("90s")) == 90.0', [dict()], D.SAMPLED),
        ('Minutes(Duration("90s")) == 1.5', [dict()], D.SAMPLED),
        ('Milliseconds(Duration("1.5s")) == 1500', [dict()], D.SAMPLED),
        ('Microseconds(Duration("250ms")) == 250000', [dict()], D.SAMPLED),
        ('Nanoseconds(Duration("1s")) == 1000000000', [dict()], D.SAMPLED),
        (
            "Hours(end_time - start_time) == 1.5",
            [dict(start_ts=_T_NS, end_ts=_T_NS + 5_400_000_000_000)],
            D.SAMPLED,
        ),
        # calendar extractors (UTC, like Hour): 2024-03-05 14:47:30
        (
            'Day(Time(attributes["t"], "%Y-%m-%d %H:%M:%S")) == 5'
            ' and Month(Time(attributes["t"], "%Y-%m-%d %H:%M:%S")) == 3'
            ' and Year(Time(attributes["t"], "%Y-%m-%d %H:%M:%S")) == 2024',
            [dict(attrs={"t": "2024-03-05 14:47:30"})],
            D.SAMPLED,
        ),
        (
            "Minute(start_time) == 47 and Second(start_time) == 30",
            [dict(start_ts=_T_NS)],
            D.SAMPLED,
        ),
        # unix divisions (floor; Go Unix/UnixMilli/UnixMicro)
        (
            "UnixSeconds(start_time) == 1709650050"
            " and UnixMilli(start_time) == 1709650050000"
            " and UnixMicro(start_time) == 1709650050000000",
            [dict(start_ts=_T_NS)],
            D.SAMPLED,
        ),
        # Log: natural log (func_log)
        ('Log(attributes["n"]) > 2.0', [dict(attrs={"n": "10"})], D.SAMPLED),
        ('Log(attributes["n"]) > 2.0', [dict(attrs={"n": "5"})], D.PENDING),
        # ignore mode: Log over 0 / non-numeric / nil errors → condition
        # skipped (condition-level ignore) → false
        ('Log(attributes["n"]) > 0 or name == "nope"', [dict(attrs={"n": "0"})], D.PENDING),
        ('Log(attributes["n"]) > 0', [dict(attrs={})], D.PENDING),
        # Trim/SHA over nil in ignore mode → skipped, not matched
        ('Trim(attributes["x"]) == "" or name == "nope"', [dict(attrs={})], D.PENDING),
    ],
)
def test_ottl_wave7_golden(spark, cond, spans, expected):
    pol = OTTLCondition(name="ottl_w7", span_conditions=[cond])
    assert eval_ottl(spark, pol, spans) == expected


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # StandardStringGetter family: nil errors (Trim / digests)
        ('Trim(attributes["x"]) == "a"', [dict(attrs={})], D.UNSPECIFIED),
        ('SHA256(attributes["x"]) == "a"', [dict(attrs={})], D.UNSPECIFIED),
        # func_log: nil, non-numeric, and <= 0 all error
        ('Log(attributes["n"]) > 0', [dict(attrs={})], D.UNSPECIFIED),
        ('Log(attributes["n"]) > 0', [dict(attrs={"n": "0"})], D.UNSPECIFIED),
        ('Log(attributes["n"]) > 0', [dict(attrs={"n": "abc"})], D.UNSPECIFIED),
        ('Log(attributes["n"]) > 0', [dict(attrs={"n": "7"})], D.SAMPLED),
        # DurationGetter: a runtime-nil duration (via Int cast) errors
        ('Seconds(Int(attributes["x"])) == 1', [dict(attrs={})], D.UNSPECIFIED),
        # ...but a present value flows through
        ('Seconds(Int(attributes["x"])) == 2.0', [dict(attrs={"x": "2000000000"})], D.SAMPLED),
    ],
)
def test_ottl_wave7_propagate_errors(spark, cond, spans, expected):
    pol = OTTLCondition(name="w7err", span_conditions=[cond], error_mode="propagate")
    assert eval_ottl_policy(spark, pol, spans) == expected


def test_ottl_wave7_build_errors():
    with pytest.raises(PolicyError, match="duration"):
        OTTLCondition(name="o", span_conditions=["Seconds(name) == 1"])
    with pytest.raises(PolicyError, match="time value"):
        OTTLCondition(name="o", span_conditions=["Day(name) == 1"])
    with pytest.raises(PolicyError, match="time value"):
        OTTLCondition(name="o", span_conditions=["UnixMilli(name) == 1"])
    with pytest.raises(PolicyError, match="cutset"):
        OTTLCondition(name="o", span_conditions=['Trim(name, "") == "a"'])
    with pytest.raises(PolicyError, match="unknown converter"):
        OTTLCondition(name="o", span_conditions=["Weekday(start_time) == 1"])


def test_ottl_wave6_build_errors():
    with pytest.raises(PolicyError, match="unsupported"):
        OTTLCondition(name="o", span_conditions=['Time(name, "%Q") != nil'])
    with pytest.raises(PolicyError, match="dangling"):
        OTTLCondition(name="o", span_conditions=['Time(name, "%Y-%") != nil'])
    with pytest.raises(PolicyError, match="time value"):
        OTTLCondition(name="o", span_conditions=["Hour(name) == 1"])
    with pytest.raises(PolicyError, match="time value"):
        OTTLCondition(name="o", span_conditions=['TruncateTime(name, Duration("1m")) != nil'])
    with pytest.raises(PolicyError, match="duration"):
        OTTLCondition(name="o", span_conditions=['TruncateTime(start_time, name) != nil'])
    with pytest.raises(PolicyError, match="indexed"):
        OTTLCondition(name="o", span_conditions=['Split(name, "-") == "x"'])
    with pytest.raises(PolicyError, match="delimiter"):
        OTTLCondition(name="o", span_conditions=['Split(name, "")[0] == "x"'])


def test_ottl_ismatch_re2_dialect_guard():
    """Java-regex constructs invalid in RE2 must be rejected at build
    time — the reference's Go regexp would fail the config at startup
    (round-4 verdict nit: silently compiling lookarounds to rlike)."""
    for pat in (
        "(?=ab)c", "(?!ab)c", "(?<=a)b", "(?<!a)b",  # lookarounds
        r"(a)\1",  # backreference
        "(?>ab)c",  # atomic group
        "ab*+c", "a{2,3}+b",  # possessive quantifiers
    ):
        with pytest.raises(PolicyError, match="RE2"):
            OTTLCondition(name="o", span_conditions=[f'IsMatch(name, "{pat}")'])
    # common RE2-valid syntax still builds: named groups, escaped +
    for pat in ("(?i)abc", "a\\\\+b", "(ab|cd)+e", "^a.*z$"):
        OTTLCondition(name="o", span_conditions=[f'IsMatch(name, "{pat}")'])


def test_ottl_duration_build_error():
    with pytest.raises(PolicyError):
        OTTLCondition(name="o", span_conditions=['start_time_unix_nano > Duration("bogus")'])


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # SHORT-CIRCUIT error semantics (contrib orFuncs/andFuncs): a
        # true left term means the erroring right term is never
        # evaluated — no error, Sampled
        (
            'name == "span-name" or Int(attributes["bad"]) == 1',
            [dict(attrs={"bad": "oops"})],
            D.SAMPLED,
        ),
        # left false → right IS evaluated → its error surfaces
        (
            'name == "other" or Int(attributes["bad"]) == 1',
            [dict(attrs={"bad": "oops"})],
            D.UNSPECIFIED,
        ),
        # and: left false short-circuits — no error
        (
            'name == "other" and Int(attributes["bad"]) == 1',
            [dict(attrs={"bad": "oops"})],
            D.PENDING,
        ),
        # and: left true → right evaluated → error
        (
            'name == "span-name" and Int(attributes["bad"]) == 1',
            [dict(attrs={"bad": "oops"})],
            D.UNSPECIFIED,
        ),
        # left itself errors → error regardless of the right term
        (
            'Int(attributes["bad"]) == 1 or name == "span-name"',
            [dict(attrs={"bad": "oops"})],
            D.UNSPECIFIED,
        ),
        # StandardStringGetter nil errors: Substring/ConvertCase/Len on
        # an ABSENT value error (same family as IsMatch-on-nil)
        ('Substring(attributes["m"], 0, 2) == "x"', [dict(attrs={})], D.UNSPECIFIED),
        ('ConvertCase(attributes["m"], "upper") == "X"', [dict(attrs={})], D.UNSPECIFIED),
        ('Len(attributes["m"]) > 0', [dict(attrs={})], D.UNSPECIFIED),
        # ...but Concat skips nil parts (func_concat) — not an error
        ('Concat([attributes["m"], name], "-") == "span-name"', [dict(attrs={})], D.SAMPLED),
    ],
)
def test_ottl_propagate_short_circuit(spark, cond, spans, expected):
    pol = OTTLCondition(name="sc", span_conditions=[cond], error_mode="propagate")
    assert eval_ottl_policy(spark, pol, spans) == expected


def test_ottl_istype_over_parsejson_build_error():
    with pytest.raises(PolicyError):
        OTTLCondition(name="o", span_conditions=['IsDouble(ParseJSON(attributes["p"])["n"])'])
    # IsString over JSON values stays supported
    OTTLCondition(name="o2", span_conditions=['IsString(ParseJSON(attributes["p"])["n"])'])


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # Format: Sprintf %s/%d subset (func_format); nil renders Go's
        # %!s(<nil>) — Sprintf itself never errors
        (
            'Format("%s-%d", [attributes["k"], status.code]) == "x-1"',
            [dict(attrs={"k": "x"}, status_id=1)],
            D.SAMPLED,
        ),
        (
            'Format("v=%s", [attributes["missing"]]) == "v=%!s(<nil>)"',
            [dict(attrs={})],
            D.SAMPLED,
        ),
        ('Format("100%%-%s", [name]) == "100%-op"', [dict(name="op")], D.SAMPLED),
        # Hex: lowercase hex of UTF-8 bytes (string) / 8 big-endian
        # two's-complement bytes (int64), func_hex
        ('Hex(attributes["k"]) == "616263"', [dict(attrs={"k": "abc"})], D.SAMPLED),
        ('Hex(status.code) == "0000000000000001"', [dict(status_id=1)], D.SAMPLED),
        ('Hex(Int(attributes["n"])) == "fffffffffffffffb"',
         [dict(attrs={"n": "-5"})], D.SAMPLED),
        # Decode base64 (strict padded std alphabet)
        ('Decode(attributes["b"], "base64") == "abc"',
         [dict(attrs={"b": "YWJj"})], D.SAMPLED),
        ('Decode(attributes["b"], "base64") == "ab"',
         [dict(attrs={"b": "YWI="})], D.SAMPLED),
        # ParseKeyValue: defaults "=" / " "; trimmed; last duplicate wins
        ('ParseKeyValue(attributes["kv"])["k2"] == "v2"',
         [dict(attrs={"kv": "k1=v1 k2=v2"})], D.SAMPLED),
        ('ParseKeyValue(attributes["kv"], ":", ",")["b"] == "2"',
         [dict(attrs={"kv": "a:1,b:2"})], D.SAMPLED),
        ('ParseKeyValue(attributes["kv"])["a"] == "2"',
         [dict(attrs={"kv": "a=1 a=2"})], D.SAMPLED),
        # split at the FIRST kv delimiter: the value keeps later ones
        ('ParseKeyValue(attributes["kv"])["a"] == "b=c"',
         [dict(attrs={"kv": "a=b=c x=1"})], D.SAMPLED),
        # absent key → nil → comparison false
        ('ParseKeyValue(attributes["kv"])["zz"] == "v"',
         [dict(attrs={"kv": "a=1"})], D.PENDING),
        # ExtractPatterns: named groups, both Go and Java spellings
        ('ExtractPatterns(attributes["s"], "(?P<num>[0-9]+)")["num"] == "42"',
         [dict(attrs={"s": "abc42x"})], D.SAMPLED),
        ('ExtractPatterns(attributes["s"], "(?<num>[0-9]+)")["num"] == "42"',
         [dict(attrs={"s": "abc42x"})], D.SAMPLED),
        # no overall match → empty map → nil
        ('ExtractPatterns(attributes["s"], "(?P<num>[0-9]+)")["num"] == "42"',
         [dict(attrs={"s": "nodigits"})], D.PENDING),
        # FNV-1a64 of UTF-8 bytes as int64 (func_fnv)
        ('FNV(attributes["k"]) == -1792535898324117685',
         [dict(attrs={"k": "abc"})], D.SAMPLED),
        # ignore mode: erroring wave-8 converters skip the condition
        ('Decode(attributes["b"], "base64") == "x" or name == "nope"',
         [dict(attrs={"b": "%%bad%%"})], D.PENDING),
        ('ParseKeyValue(attributes["kv"])["a"] == "1" or name == "nope"',
         [dict(attrs={"kv": "a=1 borked"})], D.PENDING),
    ],
)
def test_ottl_wave8_golden(spark, cond, spans, expected):
    pol = OTTLCondition(name="ottl_w8", span_conditions=[cond])
    assert eval_ottl(spark, pol, spans) == expected


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # nil targets error (ByteSlice/StringLike/StandardString getters)
        ('Hex(attributes["x"]) == "a"', [dict(attrs={})], D.UNSPECIFIED),
        ('FNV(attributes["x"]) > 0', [dict(attrs={})], D.UNSPECIFIED),
        ('Decode(attributes["x"], "base64") == "a"', [dict(attrs={})], D.UNSPECIFIED),
        ('ParseKeyValue(attributes["x"])["k"] == "v"', [dict(attrs={})], D.UNSPECIFIED),
        ('ExtractPatterns(attributes["x"], "(?P<g>a)")["g"] == "a"',
         [dict(attrs={})], D.UNSPECIFIED),
        # malformed base64 / unsplittable pair error on PRESENT values
        ('Decode(attributes["b"], "base64") == "a"',
         [dict(attrs={"b": "YWJ"})], D.UNSPECIFIED),
        ('ParseKeyValue(attributes["kv"])["a"] == "1"',
         [dict(attrs={"kv": "a=1 junk"})], D.UNSPECIFIED),
        # Format never errors on nil args; ExtractPatterns no-match is
        # nil, not an error
        ('Format("%s", [attributes["x"]]) == "%!s(<nil>)"',
         [dict(attrs={})], D.SAMPLED),
        ('ExtractPatterns(name, "(?P<g>zz)")["g"] == "zz"', [dict()], D.PENDING),
    ],
)
def test_ottl_wave8_propagate_errors(spark, cond, spans, expected):
    pol = OTTLCondition(name="w8err", span_conditions=[cond], error_mode="propagate")
    assert eval_ottl_policy(spark, pol, spans) == expected


def test_ottl_wave8_build_errors():
    with pytest.raises(PolicyError, match="verbs but"):
        OTTLCondition(name="o", span_conditions=['Format("%s-%s", [name]) == "a"'])
    with pytest.raises(PolicyError, match="must be int-valued"):
        OTTLCondition(name="o", span_conditions=['Format("%d", [name]) == "1"'])
    with pytest.raises(PolicyError, match="must be string-valued"):
        OTTLCondition(name="o", span_conditions=['Format("%s", [status.code]) == "1"'])
    with pytest.raises(PolicyError, match="verb %f unsupported"):
        OTTLCondition(name="o", span_conditions=['Format("%f", [name]) == "1"'])
    with pytest.raises(PolicyError, match="Hex target"):
        OTTLCondition(name="o", span_conditions=['Hex(Double(name)) == "a"'])
    with pytest.raises(PolicyError, match="Decode encoding"):
        OTTLCondition(name="o", span_conditions=['Decode(name, "hex") == "a"'])
    with pytest.raises(PolicyError, match="distinct"):
        OTTLCondition(name="o", span_conditions=['ParseKeyValue(name, "=", "=")["k"] == "v"'])
    with pytest.raises(PolicyError, match="must be indexed"):
        OTTLCondition(name="o", span_conditions=['ParseKeyValue(name) == "v"'])
    with pytest.raises(PolicyError, match="no named capture"):
        OTTLCondition(name="o", span_conditions=['ExtractPatterns(name, "([0-9]+)")["g"] == "1"'])
    with pytest.raises(PolicyError, match="not in"):
        OTTLCondition(name="o", span_conditions=['ExtractPatterns(name, "(?P<a>x)")["b"] == "1"'])
    with pytest.raises(PolicyError, match="RE2"):
        OTTLCondition(
            name="o", span_conditions=['ExtractPatterns(name, "(?P<a>x(?=y))")["a"] == "1"']
        )


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # ConvertCase snake/camel (strcase ASCII rules)
        ('ConvertCase(attributes["s"], "snake") == "batch_window_spark"',
         [dict(attrs={"s": "batchWindowSpark"})], D.SAMPLED),
        ('ConvertCase(attributes["s"], "snake") == "http_server_v2"',
         [dict(attrs={"s": "HTTPServer-v2"})], D.SAMPLED),
        ('ConvertCase(attributes["s"], "camel") == "SpanKindX"',
         [dict(attrs={"s": "span_kind_x"})], D.SAMPLED),
        ('ConvertCase(attributes["s"], "camel") == "AbC"',
         [dict(attrs={"s": "ab c"})], D.SAMPLED),
        # Sort(Split(...))[n], asc default / desc
        ('Sort(Split(attributes["csv"], ","))[0] == "a"',
         [dict(attrs={"csv": "c,a,b"})], D.SAMPLED),
        ('Sort(Split(attributes["csv"], ","), "desc")[0] == "c"',
         [dict(attrs={"csv": "c,a,b"})], D.SAMPLED),
        # out-of-range index is nil, not an error (like Split)
        ('Sort(Split(attributes["csv"], ","))[9] == "a"',
         [dict(attrs={"csv": "c,a,b"})], D.PENDING),
        # Unix: epoch seconds (+ nanos) -> time
        ('Hour(Unix(1709650050)) == 14', [dict()], D.SAMPLED),
        ('UnixNano(Unix(1, 500)) == 1000000500', [dict()], D.SAMPLED),
        ('Unix(Int(attributes["sec"])) == start_time',
         [dict(attrs={"sec": "1709650050"}, start_ts=1709650050000000000)],
         D.SAMPLED),
        # Murmur3Hash: x86-32 seed 0, int64 of the uint32 sum
        ('Murmur3Hash(attributes["k"]) == 3017643002',
         [dict(attrs={"k": "abc"})], D.SAMPLED),
        ('Murmur3Hash(attributes["k"]) == 613153351',
         [dict(attrs={"k": "hello"})], D.SAMPLED),
    ],
)
def test_ottl_wave9_golden(spark, cond, spans, expected):
    pol = OTTLCondition(name="ottl_w9", span_conditions=[cond])
    assert eval_ottl(spark, pol, spans) == expected


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        ('Sort(Split(attributes["x"], ","))[0] == "a"', [dict(attrs={})], D.UNSPECIFIED),
        ('Murmur3Hash(attributes["x"]) > 0', [dict(attrs={})], D.UNSPECIFIED),
        # func_unix IntGetter: nil and non-integer values error
        ('UnixNano(Unix(Int(attributes["x"]))) > 0', [dict(attrs={})], D.UNSPECIFIED),
        ('UnixNano(Unix(attributes["n"])) > 0',
         [dict(attrs={"n": "not-int"})], D.UNSPECIFIED),
        ('UnixNano(Unix(attributes["n"])) == 7000000000',
         [dict(attrs={"n": "7"})], D.SAMPLED),
    ],
)
def test_ottl_wave9_propagate_errors(spark, cond, spans, expected):
    pol = OTTLCondition(name="w9err", span_conditions=[cond], error_mode="propagate")
    assert eval_ottl_policy(spark, pol, spans) == expected


def test_ottl_wave9_build_errors():
    with pytest.raises(PolicyError, match="Sort target"):
        OTTLCondition(name="o", span_conditions=['Sort(name)[0] == "a"'])
    with pytest.raises(PolicyError, match="Sort order"):
        OTTLCondition(
            name="o", span_conditions=['Sort(Split(name, ","), "up")[0] == "a"']
        )
    with pytest.raises(PolicyError, match="must be indexed"):
        OTTLCondition(name="o", span_conditions=['Sort(Split(name, ",")) == "a"'])
    with pytest.raises(PolicyError, match="ConvertCase mode"):
        OTTLCondition(name="o", span_conditions=['ConvertCase(name, "title") == "a"'])
