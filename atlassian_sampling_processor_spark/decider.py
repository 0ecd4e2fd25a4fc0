"""Decision combinator: ordered first-decisive-wins + LowPriority ratchet.

Exact semantics of the reference decider (decider.go:41-81):

* Evaluate policies in configured order; the first decision in
  {Sampled, NotSampled, LowPriority} wins. Pending and Unspecified
  (evaluator error) are non-decisive — the loop continues.
* LowPriority ratchet (decider.go:50-58): if the merged metadata carries
  ``LastLowPriorityDecisionName`` from a *different* policy, a
  LowPriority decision is demoted to Pending, so only the policy that
  originally marked the trace can keep it low.

Implemented as one ordered ``coalesce`` over per-policy
``when(decisive, struct(...))`` expressions — lazily evaluated per row
inside whole-stage codegen, which preserves the reference's short
circuit without any imperative loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import decision as D
from .policies import Policy
from .policies.base import AGG


def per_policy_decisions(policies: list[Policy]) -> list[Column]:
    """Decision column per policy, with the ratchet demotion applied."""
    last_low = F.col(AGG.LAST_LOW_POLICY)
    out = []
    for p in policies:
        d = p.decision()
        demoted = F.when(
            last_low.isNotNull()
            & (last_low != F.lit(p.name))
            & (d == F.lit(D.LOW_PRIORITY)),
            F.lit(D.PENDING),
        ).otherwise(d)
        out.append(demoted)
    return out


def make_decision(merged: DataFrame, policies: list[Policy]) -> DataFrame:
    """Adds ``decision``, ``policy``, ``policy_index`` to the merged
    per-trace aggregate, plus ``policy_decisions`` (array of every
    policy's decision up to and including the decisive one — feeds the
    policy_decisions telemetry, decider.go:60-74)."""
    decisions = per_policy_decisions(policies)

    chain: list[Column] = []
    for i, (p, d) in enumerate(zip(policies, decisions)):
        decisive = d.isin(*D.DECISIVE)
        chain.append(
            F.when(
                decisive,
                F.struct(
                    d.cast("int").alias("decision"),
                    F.lit(p.name).alias("policy"),
                    F.lit(i).alias("policy_index"),
                ),
            )
        )
    fallback = F.struct(
        F.lit(D.PENDING).cast("int").alias("decision"),
        F.lit(None).cast("string").alias("policy"),
        F.lit(None).cast("int").alias("policy_index"),
    )
    final = F.coalesce(*chain, fallback) if chain else fallback

    df = merged.withColumn("_final", final)
    df = df.withColumn(
        "policy_decisions",
        F.array(*[d.cast("int") for d in decisions]) if decisions else F.array().cast("array<int>"),
    )
    return (
        df.withColumn("decision", F.col("_final.decision"))
        .withColumn("policy", F.col("_final.policy"))
        .withColumn("policy_index", F.col("_final.policy_index"))
        .drop("_final")
    )


def decision_from_column(policies: list[Policy]) -> Column:
    """The ``decision_from`` telemetry dimension (decider.go:60-74):
    for Sampled/NotSampled decisions, the winning policy's configured
    ``record_decision_from`` resource attribute — ANY attribute of the
    trace's first resource (decider.go:175-188), derived from
    first_source via the deterministic resource fixture
    (parse.resource_attr_expr); an attribute outside the resource model
    is "" (the reference's missing-attribute result). The value is then
    mapped through the policy's ordered regex groupers — first match
    wins, unmatched passes through (policy.go:33-67)."""
    from .parse import resource_attr_expr

    out = F.lit("")
    for p in policies:
        if not p.record_decision_from:
            continue
        src = resource_attr_expr(p.record_decision_from, F.col(AGG.FIRST_SOURCE))
        if src is None:
            src = F.lit("")
        grouped = src
        for regex, group in reversed(p.decision_groupers):
            grouped = F.when(src.rlike(regex), F.lit(group)).otherwise(grouped)
        out = F.when(F.col("policy") == p.name, grouped).otherwise(out)
    return F.when(F.col("decision").isin(D.SAMPLED, D.NOT_SAMPLED), out).otherwise(F.lit(""))


def post_decision_state(df: DataFrame, policies: list[Policy]) -> DataFrame:
    """Post-decision metadata updates (processor.go:356-404):

    * non-LowPriority final decision clears the ratchet marker;
    * LowPriority sets the marker to the deciding policy when empty and
      sets the incoming td's priority to Low;
    * new cache priority = max(cached, incoming td) — never demoted
      (Unspecified=2 > Low=1; metadata.go:37).
    """
    is_low = F.col("decision") == F.lit(D.LOW_PRIORITY)
    new_last_low = F.when(is_low, F.coalesce(F.col(AGG.LAST_LOW_POLICY), F.col("policy")))
    td_priority = F.when(is_low, F.lit(D.PRIORITY_LOW)).otherwise(F.lit(D.PRIORITY_UNSPECIFIED))
    new_priority = F.greatest(td_priority, F.coalesce("cached_priority", F.lit(0)))
    return df.withColumn("new_last_low_policy", new_last_low).withColumn(
        "new_priority", new_priority
    )
