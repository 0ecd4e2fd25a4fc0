"""Decider combinator parity: ordering, error handling, LowPriority
ratchet (decider_test.go:61-236, 238-333)."""

from atlassian_sampling_processor_spark import decision as D
from atlassian_sampling_processor_spark.decider import make_decision, post_decision_state
from atlassian_sampling_processor_spark.policies import ErrorStub, StaticStub

from .conftest import merged_df


def decide(spark, policies, row_over=None):
    df = merged_df(spark, [row_over or {}])
    out = make_decision(df, policies).collect()[0]
    return out.decision, out.policy


def P(name, d):
    return StaticStub(name=name, static_decision=d)


def test_first_decisive_wins(spark):
    pols = [P("a", D.PENDING), P("b", D.SAMPLED), P("c", D.NOT_SAMPLED)]
    assert decide(spark, pols) == (D.SAMPLED, "b")


def test_not_sampled_decisive(spark):
    pols = [P("a", D.NOT_SAMPLED), P("b", D.SAMPLED)]
    assert decide(spark, pols) == (D.NOT_SAMPLED, "a")


def test_low_priority_decisive(spark):
    pols = [P("a", D.LOW_PRIORITY), P("b", D.SAMPLED)]
    assert decide(spark, pols) == (D.LOW_PRIORITY, "a")


def test_all_pending(spark):
    pols = [P("a", D.PENDING), P("b", D.PENDING)]
    assert decide(spark, pols) == (D.PENDING, None)


def test_error_policy_skipped(spark):
    # evaluator error → logged, loop continues (decider.go:44-48)
    pols = [ErrorStub(name="err"), P("b", D.SAMPLED)]
    assert decide(spark, pols) == (D.SAMPLED, "b")


def test_all_error_is_pending(spark):
    pols = [ErrorStub(name="e1"), ErrorStub(name="e2")]
    assert decide(spark, pols) == (D.PENDING, None)


# --- ratchet scenarios (decider_test.go:238-333) ----------------------------


def test_ratchet_promoted_to_sampled(spark):
    # last_low=B; [Sampled, Low, Pending] → Sampled by A
    pols = [P("A", D.SAMPLED), P("B", D.LOW_PRIORITY), P("C", D.PENDING)]
    assert decide(spark, pols, dict(last_low_policy="B")) == (D.SAMPLED, "A")


def test_ratchet_demotes_other_policy_low(spark):
    # last_low=A; [A:Pending, B:Low, C:Pending] → B's Low demoted → Pending
    pols = [P("A", D.PENDING), P("B", D.LOW_PRIORITY), P("C", D.PENDING)]
    assert decide(spark, pols, dict(last_low_policy="A")) == (D.PENDING, None)


def test_ratchet_same_policy_keeps_low(spark):
    # the policy that set the marker may keep the trace low
    pols = [P("A", D.PENDING), P("B", D.LOW_PRIORITY)]
    assert decide(spark, pols, dict(last_low_policy="B")) == (D.LOW_PRIORITY, "B")


def test_ratchet_higher_low_demoted(spark):
    # last_low=B; [A:Low, B:Pending] → A's Low demoted → Pending
    pols = [P("A", D.LOW_PRIORITY), P("B", D.PENDING)]
    assert decide(spark, pols, dict(last_low_policy="B")) == (D.PENDING, None)


# --- post-decision metadata (processor.go:356-404) ---------------------------


def run_post(spark, policies, row_over):
    df = merged_df(spark, [row_over])
    out = post_decision_state(make_decision(df, policies), policies).collect()[0]
    return out


def test_post_low_sets_marker_and_priority(spark):
    out = run_post(spark, [P("B", D.LOW_PRIORITY)], {})
    assert out.new_last_low_policy == "B"
    assert out.new_priority == D.PRIORITY_LOW


def test_post_low_keeps_existing_marker(spark):
    out = run_post(spark, [P("B", D.LOW_PRIORITY)], dict(last_low_policy="B"))
    assert out.new_last_low_policy == "B"


def test_post_pending_clears_marker_and_promotes(spark):
    # non-Low decision clears marker; priority promoted to Unspecified
    out = run_post(spark, [P("A", D.PENDING)], dict(last_low_policy="B", cached_priority=1))
    assert out.new_last_low_policy is None
    assert out.new_priority == D.PRIORITY_UNSPECIFIED


def test_post_priority_never_demoted(spark):
    # cached Unspecified + Low decision → stays Unspecified (metadata.go:37)
    out = run_post(spark, [P("B", D.LOW_PRIORITY)], dict(cached_priority=2))
    assert out.new_priority == D.PRIORITY_UNSPECIFIED
