"""Round-4 fix tests (round-3 ADVICE items):

* legacy write() must remove a stale uncommitted base at the same
  version — bases win ties in chain discovery, so a crashed compaction
  followed by a flush()-style legacy write must not be shadowed by the
  dead base (state.py write-path sibling-cleanup invariant).
* OTTL: a parenthesized arithmetic operand as a comparison lhs parses
  (`(end_time_unix_nano - start_time_unix_nano) > 5000000` — the
  duration idiom with explicit parens).
* OTTL: arithmetic over a string-typed path is a total function under
  ANSI mode (non-numeric value → NULL → comparison false, no runtime
  cast error).
* pipeline.run() on an empty input table returns [] instead of raising
  TypeError on None+1.
"""

import pytest
from pyspark.sql import functions as F

from atlassian_sampling_processor_spark import decision as D
from atlassian_sampling_processor_spark.config import EngineConfig, parse_policies
from atlassian_sampling_processor_spark.pipeline import SamplingPipeline
from atlassian_sampling_processor_spark.policies import OTTLCondition
from atlassian_sampling_processor_spark.state import DECISION_STATE_SCHEMA, StateStore

from .helpers import seq_table_from_spans, trace_id
from .test_policies_golden import eval_ottl


def test_legacy_write_removes_stale_base(spark, tmp_path):
    """Crashed-compaction base at v=N + legacy full write at v=N: after
    commit, the read must resolve the legacy write, not the dead base
    ('compactions win ties' would otherwise resurrect it)."""
    store = StateStore(spark, str(tmp_path / "ck"))
    live = spark.createDataFrame(
        [("a" * 32, D.SAMPLED, "p", 0)], schema=DECISION_STATE_SCHEMA
    )
    store.write_delta(
        "decision_state", 0, None, inserts=live, tombstone_keys=None,
        schema=DECISION_STATE_SCHEMA,
    )
    store.commit(0)
    # a compaction crashed mid-way at v=1, leaving an uncommitted base...
    ghost = spark.createDataFrame(
        [("e" * 32, D.SAMPLED, "ghost", 1)], schema=DECISION_STATE_SCHEMA
    )
    ghost.write.mode("overwrite").parquet(store._base_path("decision_state", 1))
    # ...then a flush() does its legacy empty rewrite at the same version
    store.write(
        "decision_state", 1, spark.createDataFrame([], schema=DECISION_STATE_SCHEMA)
    )
    store.commit(1)
    assert store.read("decision_state", 1, DECISION_STATE_SCHEMA).count() == 0
    # and the next delta on top of the flushed state must stay ghost-free
    store.write_delta(
        "decision_state", 2, 1,
        inserts=spark.createDataFrame(
            [("b" * 32, D.NOT_SAMPLED, "q", 2)], schema=DECISION_STATE_SCHEMA
        ),
        tombstone_keys=None, schema=DECISION_STATE_SCHEMA,
    )
    store.commit(2)
    docs = {r.doc_id for r in store.read("decision_state", 2, DECISION_STATE_SCHEMA).collect()}
    assert docs == {"b" * 32}


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # parenthesized duration arithmetic as comparison lhs
        (
            "(end_time_unix_nano - start_time_unix_nano) > 5000000",
            [dict(start_ts=0, end_ts=6_000_000)],
            D.SAMPLED,
        ),
        (
            "(end_time_unix_nano - start_time_unix_nano) > 5000000",
            [dict(start_ts=0, end_ts=1_000)],
            D.PENDING,
        ),
        # nested parens around an operand
        (
            "((end_time_unix_nano - start_time_unix_nano)) >= 10",
            [dict(start_ts=5, end_ts=15)],
            D.SAMPLED,
        ),
        # parenthesized boolean expression still works
        (
            '(name == "span-name") and status.code == 0',
            [dict()],
            D.SAMPLED,
        ),
    ],
)
def test_ottl_paren_arith_lhs(spark, cond, spans, expected):
    pol = OTTLCondition(name="paren", span_conditions=[cond])
    assert eval_ottl(spark, pol, spans) == expected


@pytest.mark.parametrize(
    "cond,spans,expected",
    [
        # arithmetic over a non-numeric string path: NULL, comparison false
        ('name + 1 > 5', [dict(name="span-name")], D.PENDING),
        # ...but a numeric-valued string participates normally
        ('name + 1 > 5', [dict(name="7")], D.SAMPLED),
        # string literal operand in arithmetic is total too
        ('Len(name) + "x" > 0', [dict()], D.PENDING),
        ('attributes["n"] - 1 == 41', [dict(attrs={"n": "42"})], D.SAMPLED),
        ('attributes["n"] - 1 == 41', [dict(attrs={"n": "forty-two"})], D.PENDING),
    ],
)
def test_ottl_arith_string_paths_total(spark, cond, spans, expected):
    """builders.py's error_mode=ignore claim holds: compiled expressions
    are total functions even for arithmetic over string-typed paths."""
    pol = OTTLCondition(name="tot", span_conditions=[cond])
    assert eval_ottl(spark, pol, spans) == expected


def test_run_empty_input(spark, tmp_path):
    pipe = SamplingPipeline(
        spark,
        parse_policies([{"name": "sc", "type": "span_count", "span_count": {"min_spans": 2}}]),
        EngineConfig(),
        checkpoint_dir=str(tmp_path / "ck"),
        output_dir=str(tmp_path / "out"),
    )
    empty = seq_table_from_spans(spark, [dict(doc_id=trace_id(1), span_id=1, batch_idx=0)]).filter(
        F.lit(False)
    )
    assert pipe.run(empty) == []


def test_ottl_propagate_error_metric(spark, tmp_path):
    """error_mode=propagate surfaces evaluation errors into the metrics
    table (policy_decisions with an error dimension) — the reference's
    decider warn-log (decider.go:46-48) made observable."""
    policies = parse_policies([
        {
            "name": "errprone",
            "type": "ottl_condition",
            "ottl_condition": {
                "span": ['Int(attributes["env"]) == 7'],  # env="prod" → strconv error
                "error_mode": "propagate",
            },
        },
        {"name": "fallback", "type": "span_count", "span_count": {"min_spans": 1}},
    ])
    pipe = SamplingPipeline(
        spark, policies, EngineConfig(),
        checkpoint_dir=str(tmp_path / "pm" / "ck"),
        output_dir=str(tmp_path / "pm" / "out"),
    )
    spans = [
        dict(doc_id=trace_id(8100), span_id=1, attr_code=1, batch_idx=0),  # env attr → error
        dict(doc_id=trace_id(8101), span_id=2, attr_code=0, batch_idx=0),  # no attr → nil
    ]
    pipe.run(seq_table_from_spans(spark, spans))
    rows = pipe.store.read("metrics", 0).collect()
    errs = [
        r for r in rows
        if r.metric == "policy_decisions" and r.labels.get("error") == "true"
    ]
    assert len(errs) == 1
    assert errs[0].labels["policy"] == "errprone"
    assert errs[0].labels["decision"] == "Unspecified"
    assert errs[0].value == 1
    # the decider continued: both traces sampled by the fallback policy
    kept = {
        r.doc_id: r.policy
        for r in pipe.read_sink("keep").collect()
    }
    assert kept == {trace_id(8100): "fallback", trace_id(8101): "fallback"}


def test_plans_audit_covers_all_queries():
    """A query that ships without a PLANS.md cartesian-audit entry fails
    the suite (round-3 verdict: the audit's value is that it can't be
    skipped). Regenerate with `python tools/explain_plans.py`."""
    import re
    from pathlib import Path

    import __spark_entry__ as entry

    plans = Path(__file__).resolve().parent.parent / "PLANS.md"
    text = plans.read_text()
    section = text.split("## cartesian audit", 1)
    assert len(section) == 2, "PLANS.md lacks the cartesian audit section"
    audited = set(re.findall(r"^- ([a-z0-9_]+): ", section[1], re.M))
    expected = set(entry.queries().keys())
    missing = expected - audited
    assert not missing, f"queries missing from PLANS.md cartesian audit: {sorted(missing)}"
