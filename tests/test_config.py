"""Config-loader golden tests mirroring the reference's config parsing
(config_test.go:25-184, testdata/atlassian_sampling_test_cfg.yml): one
ordered policy list exercising all 10 policy types + engine capacities,
plus the validation failures the reference rejects at startup."""

import pytest

from atlassian_sampling_processor_spark import decision as D
from atlassian_sampling_processor_spark.config import load_config, parse_policies
from atlassian_sampling_processor_spark.policies import (
    AndPolicy,
    Downgrader,
    Latency,
    OTTLCondition,
    PolicyError,
    Probabilistic,
    RemoteProbabilistic,
    RootSpans,
    SpanCount,
    StatusCode,
    Threshold,
)

FULL_CFG = """
shards: 5
max_traces: 1000
secondary_cache_size: 100
sampled_cache_size: 1000
non_sampled_cache_size: 10000
compression_enabled: true
sampling_policies:
  - name: policy-1
    type: probabilistic
    probabilistic: { sampling_percentage: 0.1, hash_salt: custom-salt }
  - name: policy-2
    type: and
    record_decision_from: service.name
    decision_groupers:
      - { regex: '^(conf|confluence)-.*', group: confluence-monolith }
    and:
      and_sub_policy:
        - { name: sub-1, type: probabilistic, probabilistic: { sampling_percentage: 100 } }
        - { name: sub-2, type: probabilistic, probabilistic: { sampling_percentage: 0 } }
  - name: policy-3
    type: span_count
    span_count: { min_spans: 0 }
  - name: policy-4
    type: root_spans
    root_spans:
      sub_policy: { name: sub, type: probabilistic, probabilistic: { sampling_percentage: 0 } }
  - name: policy-5
    type: latency
    latency: { threshold_ms: 5000 }
  - name: policy-6
    type: status_code
    status_code: { status_codes: [ERROR, UNSET] }
  - name: policy-7
    type: ottl_condition
    ottl_condition:
      error_mode: ignore
      span:
        - 'attributes["test_attr_key_1"] == "test_attr_val_1"'
        - 'attributes["test_attr_key_2"] != "test_attr_val_1"'
      spanevent:
        - 'name != "test_span_event_name"'
        - 'attributes["test_event_attr_key_2"] != "test_event_attr_val_1"'
  - name: policy-8
    type: threshold
  - name: policy-9
    type: remote_probabilistic
    remote_probabilistic: { default_rate: 0.01 }
  - name: policy-10
    type: downgrader
    emit_single_span_for_not_sampled: true
    downgrader:
      downgrade_to: NotSampled
      sub_policy: { name: sub, type: span_count, span_count: { min_spans: 1000 } }
"""


def test_full_config_parses(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text(FULL_CFG)
    eng, pols = load_config(str(p))
    assert eng.shards == 5
    assert eng.primary_cache_size == 1000
    assert eng.secondary_cache_size == 100
    assert eng.sampled_cache_size == 1000
    assert eng.non_sampled_cache_size == 10000

    types = [type(x) for x in pols]
    assert types == [
        Probabilistic, AndPolicy, SpanCount, RootSpans, Latency,
        StatusCode, OTTLCondition, Threshold, RemoteProbabilistic, Downgrader,
    ]
    p1 = pols[0]
    assert p1.sampling_percentage == 0.1 and p1.hash_salt == "custom-salt"
    p2 = pols[1]
    assert p2.record_decision_from == "service.name"
    assert p2.decision_groupers == [("^(conf|confluence)-.*", "confluence-monolith")]
    assert [s.sampling_percentage for s in p2.sub_policies] == [100, 0]
    assert pols[2].min_spans == 0
    assert isinstance(pols[3].sub_policy, Probabilistic)
    assert pols[4].threshold_ms == 5000
    assert pols[5].status_codes == ["ERROR", "UNSET"]
    assert len(pols[6].span_conditions) == 2 and len(pols[6].span_event_conditions) == 2
    assert pols[8].default_rate == 0.01
    assert pols[9].downgrade_to == "NotSampled"
    assert pols[9].emit_single_span_for_not_sampled is True
    assert pols[9]._to == D.NOT_SAMPLED


REFERENCE_CFG = "/root/reference/pkg/processor/atlassiansamplingprocessor/testdata/atlassian_sampling_test_cfg.yml"


def test_reference_yaml_loads_verbatim():
    """The reference's own test config loads unmodified and builds all 10
    policies (config_test.go:25-184)."""
    import os

    if not os.path.exists(REFERENCE_CFG):
        pytest.skip("reference checkout not present")
    eng, pols = load_config(REFERENCE_CFG)
    assert eng.shards == 5
    assert eng.primary_cache_size == 1000
    assert eng.secondary_cache_size == 100
    assert eng.sampled_cache_size == 1000  # nested decision_cache:
    assert eng.non_sampled_cache_size == 10000
    assert eng.compress is True
    assert eng.target_heap_bytes == 100_000_000
    assert eng.regulate_cache_delay_s == 300.0  # "5m"
    assert eng.preprocess_buffer_size == 10

    assert [type(x) for x in pols] == [
        Probabilistic, AndPolicy, SpanCount, RootSpans, Latency,
        StatusCode, OTTLCondition, Threshold, RemoteProbabilistic, Downgrader,
    ]
    assert pols[0].hash_salt == "custom-salt" and pols[0].sampling_percentage == 0.1
    # nested record_decision_from object shape
    assert pols[1].record_decision_from == "service.name"
    assert pols[1].decision_groupers == [("^(conf|confluence)-.*", "confluence-monolith")]
    # anonymous sub-policies get derived names
    assert isinstance(pols[3].sub_policy, Probabilistic)
    assert pols[3].sub_policy.sampling_percentage == 0
    assert pols[8].default_rate == 0.01 and pols[8].hash_salt == "test-salt"
    assert pols[9].emit_single_span_for_not_sampled is True
    assert isinstance(pols[9].sub_policy, Probabilistic)


def test_record_decision_from_validation():
    base = {"name": "p", "type": "threshold"}
    with pytest.raises(PolicyError, match="res_attr_key must not be empty"):
        parse_policies([{**base, "record_decision_from": {"mappings": []}}])
    with pytest.raises(PolicyError, match="pattern must not be empty"):
        parse_policies([{**base, "record_decision_from": {
            "res_attr_key": "service.name", "mappings": [{"value": "x"}]}}])
    with pytest.raises(PolicyError, match="not a valid regex"):
        parse_policies([{**base, "record_decision_from": {
            "res_attr_key": "service.name",
            "mappings": [{"pattern": "([", "value": "x"}]}}])
    # Java-only regex constructs (invalid RE2) fail-to-start, matching
    # the reference's Go regexp compile at config load (round-5 guard)
    with pytest.raises(PolicyError, match="RE2"):
        parse_policies([{**base, "record_decision_from": {
            "res_attr_key": "service.name",
            "mappings": [{"pattern": "(?=abc).*", "value": "x"}]}}])


def test_engine_validation_rejected():
    with pytest.raises(PolicyError, match="secondary_cache_size"):
        load_config({"max_traces": 100, "secondary_cache_size": 51})
    with pytest.raises(PolicyError, match="primary_cache_size"):
        load_config({"max_traces": 0})
    with pytest.raises(PolicyError, match="shards"):
        load_config({"shards": 0})


def test_duplicate_policy_names_rejected():
    with pytest.raises(PolicyError, match="duplicate"):
        parse_policies(
            [
                {"name": "p", "type": "threshold"},
                {"name": "p", "type": "span_count", "span_count": {"min_spans": 1}},
            ]
        )


def test_unknown_policy_type_rejected():
    with pytest.raises(PolicyError, match="unknown"):
        parse_policies([{"name": "p", "type": "bogus"}])


def test_default_salts_applied():
    pols = parse_policies(
        [
            {"name": "a", "type": "probabilistic", "probabilistic": {"sampling_percentage": 5}},
            {"name": "b", "type": "remote_probabilistic", "remote_probabilistic": {"default_rate": 1}},
        ]
    )
    # both default to "default-hash-seed" (probabilistic.go:20-22,
    # remote_probabilistic.go:23)
    assert pols[0].hash_salt == "default-hash-seed"
    assert pols[1].hash_salt == "default-hash-seed"


# --- round-4: fail-to-start fuzz --------------------------------------------
# The reference refuses to start on any malformed config (config.go
# Validate / getPolicyEvaluator errors). The loader's contract is the
# same: EVERY malformed policy list raises PolicyError — never a raw
# KeyError/TypeError/AttributeError leaking from the parser.

from hypothesis import given, settings
from hypothesis import strategies as st

_scalar = st.one_of(
    st.none(), st.booleans(), st.integers(-5, 5), st.floats(allow_nan=False, allow_infinity=False),
    st.sampled_from(["", "x", "probabilistic", "span_count", "ERROR", "5m", "bogus", "[", "nil"]),
)
_inner = st.dictionaries(
    st.sampled_from(["type", "name", "min_spans", "span", "sub_policy",
                     "res_attr_key", "sampling_percentage", "threshold_ms",
                     "status_codes", "error_mode", "and_sub_policy",
                     "downgrade_to", "mappings"]),
    st.one_of(_scalar, st.lists(_scalar, max_size=2)),
    max_size=3,
)
_body = st.dictionaries(
    st.sampled_from([
        "name", "type", "probabilistic", "span_count", "latency", "status_code",
        "ottl_condition", "and", "root_spans", "downgrader", "threshold",
        "sampling_percentage", "min_spans", "threshold_ms", "status_codes",
        "span", "error_mode", "and_sub_policy", "sub_policy", "downgrade_to",
        "record_decision_from", "mappings", "pattern", "value",
    ]),
    st.one_of(_scalar, st.lists(_scalar, max_size=2), _inner),
    max_size=5,
)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(st.lists(_body, max_size=3))
def test_config_fuzz_fail_to_start(entries):
    """Random semi-structured policy lists either parse or raise
    PolicyError — no other exception type escapes the loader."""
    from atlassian_sampling_processor_spark.config import parse_policies
    from atlassian_sampling_processor_spark.policies import PolicyError

    try:
        pols = parse_policies(entries)
    except PolicyError:
        return
    for p in pols:
        assert p.name is not None


@pytest.mark.parametrize(
    "entries",
    [
        [{"name": "a", "type": "span_count", "span_count": {"min_spans": None}}],
        [{"name": "a", "type": "probabilistic", "probabilistic": {"sampling_percentage": {}}}],
        [{"name": "a", "type": "latency", "latency": {"threshold_ms": "x"}}],
        [{"name": "a", "type": "status_code", "status_code": {"status_codes": 5}}],
        [{"name": "a", "type": "ottl_condition", "ottl_condition": {"span": 7}}],
        [{"name": None, "type": "threshold"}],
        [{"name": "a", "type": "and", "and": {"and_sub_policy": 3}}],
        [{"name": "a", "type": "threshold",
          "record_decision_from": {"res_attr_key": "k", "mappings": [5]}}],
        "not-a-list",
    ],
)
def test_config_malformed_shapes_raise_policy_error(entries):
    """Regression probes for the shapes the round-4 fuzz found leaking
    raw TypeError/ValueError/AttributeError from the loader."""
    from atlassian_sampling_processor_spark.config import parse_policies
    from atlassian_sampling_processor_spark.policies import PolicyError

    with pytest.raises(PolicyError):
        parse_policies(entries)
