"""Policy abstraction: each reference evaluator
(internal/evaluators/policy_eval.go:70-79) becomes a builder of pure
Catalyst column expressions over the merged per-trace aggregate.

Two hooks per policy:

* ``span_agg_exprs()`` — aggregate expressions (uniquely aliased) this
  policy needs in the per-trace ``groupBy(doc_id)`` over the *current
  batch* (the reference's "policies see only current spans + O(1)
  metadata" contract, DESIGN.md:100-108).
* ``decision()`` — a Column over the merged aggregate evaluating to the
  Decision code (decision.py) for this policy.

Evaluator *construction* errors (empty status-code list, bad OTTL
expression) raise ``PolicyError`` at build time — same phase as the
reference, whose processor fails to start (config.go:142-151). Runtime
evaluator errors cannot occur in the expression model; ``ErrorStub``
emulates them for decider-parity tests (decider_test.go:171-236).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column


class PolicyError(ValueError):
    """Invalid policy configuration (build-time)."""


# Canonical column names on the merged per-trace aggregate.
class AGG:
    DOC_ID = "doc_id"
    TRACE_HI = "trace_hi"
    TRACE_LO = "trace_lo"
    BATCH_SPAN_COUNT = "batch_span_count"
    TOTAL_SPAN_COUNT = "total_span_count"  # batch + cached (metadata.go:31)
    MIN_START = "merged_min_start"
    MAX_END = "merged_max_end"
    ANY_STATUS_UNSET = "any_status_unset"
    ANY_STATUS_OK = "any_status_ok"
    ANY_STATUS_ERROR = "any_status_error"
    MIN_THRESHOLD = "min_threshold"  # min valid sampling.tail.threshold in batch
    ANY_ROOT = "any_root"
    MERGED_PRIORITY = "merged_priority"  # max(Unspecified, cached) per metadata.go:37
    LAST_LOW_POLICY = "last_low_policy"  # merged → the cached trace's marker
    FIRST_SOURCE = "first_source"  # first service.name (decider.go:175-188)


def hash_col_name(salt: str) -> str:
    """Column name for the FNV hash under a given salt (shared across
    probabilistic policies with the same salt)."""
    import hashlib

    return "fnv_" + hashlib.md5(salt.encode()).hexdigest()[:12]


@dataclass
class Policy:
    name: str
    emit_single_span_for_not_sampled: bool = False
    record_decision_from: str = ""
    # ordered (regex, group_name) decision grouping (policy.go:33-67)
    decision_groupers: list[tuple[str, str]] = field(default_factory=list)

    def span_agg_exprs(self) -> list[Column]:
        return []

    def required_hash_salts(self) -> set[str]:
        return set()

    def decision(self) -> Column:
        raise NotImplementedError
