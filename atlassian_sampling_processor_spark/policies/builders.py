"""All 10 reference policy types as Catalyst expression builders.

Parity sources (reference, /root/reference/pkg/processor/atlassiansamplingprocessor/):
  probabilistic          internal/evaluators/probabilistic.go:34-71
  remote_probabilistic   internal/evaluators/remote_probabilistic.go:44-100
  span_count             internal/evaluators/span_count_sampler.go:33-54
  latency                internal/evaluators/latency.go:26-43
  status_code            internal/evaluators/status_code.go:30-66
  ottl_condition         internal/evaluators/ottl.go:42-120 (comparison subset)
  threshold              internal/evaluators/threshold.go:34-91 (OTEP-235)
  and                    internal/evaluators/and.go:24-46
  root_spans             internal/evaluators/root_spans.go:34-89
  downgrader             internal/evaluators/downgrader.go:18-38
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import decision as D
from .. import hashing
from .base import AGG, Policy, PolicyError, hash_col_name

MAX_THRESHOLD = (1 << 56) - 1  # threshold.go:18


def _lit_d(d: int) -> Column:
    return F.lit(d)


# --------------------------------------------------------------------------
# leaf policies


@dataclass
class Probabilistic(Policy):
    sampling_percentage: float = 0.0
    hash_salt: str = ""

    def __post_init__(self):
        if self.hash_salt == "":
            self.hash_salt = hashing.DEFAULT_HASH_SALT
        self.threshold = hashing.calculate_threshold(self.sampling_percentage / 100.0)

    def required_hash_salts(self) -> set[str]:
        return {self.hash_salt}

    def decision(self) -> Column:
        hit = hashing.unsigned_lte(F.col(hash_col_name(self.hash_salt)), self.threshold)
        return F.when(hit, _lit_d(D.SAMPLED)).otherwise(_lit_d(D.PENDING))


@dataclass
class RemoteProbabilistic(Policy):
    """Rate fetched from a provider at plan-build time per micro-batch;
    errors / negative rates fall back to default_rate
    (remote_probabilistic.go:77-100). The RateGetter extension itself is
    not in the reference's open source (README.md:33) — any callable works.
    """

    default_rate: float = 0.0
    hash_salt: str = ""
    rate_getter: Callable[[], float] | None = None

    def __post_init__(self):
        if self.hash_salt == "":
            self.hash_salt = hashing.DEFAULT_HASH_SALT

    def required_hash_salts(self) -> set[str]:
        return {self.hash_salt}

    def _current_rate(self) -> float:
        if self.rate_getter is not None:
            try:
                r = float(self.rate_getter())
                if r >= 0:
                    return r
            except Exception:
                pass  # decider logs and proceeds with the decision
        return self.default_rate

    def decision(self) -> Column:
        threshold = hashing.calculate_threshold(self._current_rate() / 100.0)
        hit = hashing.unsigned_lte(F.col(hash_col_name(self.hash_salt)), threshold)
        return F.when(hit, _lit_d(D.SAMPLED)).otherwise(_lit_d(D.PENDING))


@dataclass
class SpanCount(Policy):
    min_spans: int = 0
    log_sampled: bool = False  # log-only in reference; no decision effect

    def decision(self) -> Column:
        return F.when(
            F.col(AGG.TOTAL_SPAN_COUNT) >= F.lit(self.min_spans), _lit_d(D.SAMPLED)
        ).otherwise(_lit_d(D.PENDING))


@dataclass
class Latency(Policy):
    threshold_ms: int = 0

    def decision(self) -> Column:
        # Go duration.Milliseconds() truncates ns → ms (latency.go:34-38);
        # `div` is integer division, inclusive >= comparison.
        dur_ms = F.expr(f"({AGG.MAX_END} - {AGG.MIN_START}) div 1000000")
        return F.when(dur_ms >= F.lit(self.threshold_ms), _lit_d(D.SAMPLED)).otherwise(
            _lit_d(D.PENDING)
        )


_STATUS_FLAG = {
    "UNSET": AGG.ANY_STATUS_UNSET,
    "OK": AGG.ANY_STATUS_OK,
    "ERROR": AGG.ANY_STATUS_ERROR,
}


@dataclass
class StatusCode(Policy):
    status_codes: list[str] = field(default_factory=list)

    def __post_init__(self):
        if not self.status_codes:
            raise PolicyError("expected at least one status code to filter on")
        for s in self.status_codes:
            if s not in _STATUS_FLAG:
                raise PolicyError(f"unknown status code {s!r}, supported: OK, ERROR, UNSET")

    def decision(self) -> Column:
        flags = [F.col(_STATUS_FLAG[s]) for s in self.status_codes]
        any_hit = reduce(lambda a, b: a | b, flags)
        return F.when(any_hit, _lit_d(D.SAMPLED)).otherwise(_lit_d(D.PENDING))


# --- OTTL grammar subset (policies/ottl.py) -----------------------------------


@dataclass
class OTTLCondition(Policy):
    """Any span (event) matching any condition ⇒ Sampled (ottl.go:42-120,
    OR across the condition sequence). Conditions are parsed by the OTTL
    grammar subset in :mod:`.ottl` — comparisons (`== != > >= < <=`),
    `and`/`or`/`not` with parentheses, `IsMatch` — covering the
    reference's fixtures (ottl_test.go:22-112) and the common forms
    beyond them; unsupported syntax is a build-time PolicyError, matching
    the reference's fail-to-start behavior.
    """

    span_conditions: list[str] = field(default_factory=list)
    span_event_conditions: list[str] = field(default_factory=list)
    # error_mode (ottl.go:42): compiled Columns are total functions
    # (try_cast/coalesce absorb runtime failures), so "ignore" is the
    # natural mode. "propagate" recovers WHERE those absorptions happened
    # (ottl.error_column) and mirrors the reference exactly: evaluation
    # stops at the first span (in (start_ts, span_id) order) whose
    # condition sequence errors OR matches — an error yields Unspecified
    # (the decider's log-and-continue path, decider.go:46-48) even if a
    # LATER span would have matched, whereas "ignore" treats the errored
    # condition as false and lets that later span sample the trace.
    error_mode: str = "ignore"

    def __post_init__(self):
        from . import ottl

        if self.error_mode not in ("ignore", "propagate"):
            raise PolicyError(
                f"ottl_condition error_mode must be ignore|propagate, got {self.error_mode!r}"
            )
        if not self.span_conditions and not self.span_event_conditions:
            raise PolicyError("at least one OTTL condition must be specified")
        # parse + path-validate at build time; Column construction is
        # deferred — it needs an active SparkContext, config parsing must not
        self._span_asts = []
        for c in self.span_conditions:
            ast = ottl.parse_condition(c)
            ottl.validate_paths(ast, "span")
            self._span_asts.append(ast)
        self._event_asts = []
        for c in self.span_event_conditions:
            ast = ottl.parse_condition(c)
            ottl.validate_paths(ast, "spanevent")
            self._event_asts.append(ast)

    def _flag(self) -> str:
        return f"ottl_match_{re.sub(r'[^A-Za-z0-9_]', '_', self.name)}"

    def _ord_cols(self) -> tuple[str, str]:
        n = re.sub(r"[^A-Za-z0-9_]", "_", self.name)
        # the ottl_first_ prefix doubles as the salted-remerge min rule
        # (aggregate.py): min-of-struct is decomposable
        return f"ottl_first_match_{n}", f"ottl_first_err_{n}"

    def _cond_pairs(self):
        """Ordered (cond, err) Column pairs — span conditions first, then
        spanevent conditions, the reference's evaluation order
        (ottl.go Evaluate: span expr, then span events)."""
        from . import ottl

        has_event = F.col("event_name").isNotNull()
        pairs = [
            (ottl.to_column(a, "span"), ottl.error_column(a, "span"))
            for a in self._span_asts
        ]
        pairs += [
            (
                has_event & ottl.to_column(a, "spanevent"),
                has_event & ottl.error_column(a, "spanevent"),
            )
            for a in self._event_asts
        ]
        return pairs

    def span_agg_exprs(self) -> list[Column]:
        pairs = self._cond_pairs()
        if self.error_mode != "propagate":
            # contrib's ignore mode surfaces errors at the CONDITION
            # level: a condition whose evaluation errors is skipped
            # (contributes false to the OR), even when leaf-absorbed
            # evaluation of its other arms would yield true — e.g.
            # `a or b` with erroring `a` and true `b` is an eval error
            # in contrib, hence skipped. error_column models contrib's
            # short-circuit exactly, so mask each condition with ¬err.
            any_cond = reduce(
                lambda a, b: a | b,
                [
                    F.coalesce(c, F.lit(False)) & ~F.coalesce(e, F.lit(False))
                    for c, e in pairs
                ],
            )
            return [F.max(any_cond).alias(self._flag())]
        # propagate: per span, the FIRST condition that errors or matches
        # decides the span (contrib ConditionSequence semantics); per
        # trace, the first deciding span in (start_ts, span_id) order
        # decides the trace. min-of-struct aggregates are order-exact and
        # decomposable (salted two-phase safe).
        outcome = F.coalesce(
            *[
                F.when(F.coalesce(e, F.lit(False)), F.lit(1)).when(
                    F.coalesce(c, F.lit(False)), F.lit(2)
                )
                for c, e in pairs
            ]
        )
        ordk = F.struct(F.col("start_ts"), F.col("span_id"))
        m_col, e_col = self._ord_cols()
        return [
            F.min(F.when(outcome == 2, ordk)).alias(m_col),
            F.min(F.when(outcome == 1, ordk)).alias(e_col),
        ]

    def decision(self) -> Column:
        if self.error_mode != "propagate":
            return F.when(F.col(self._flag()), _lit_d(D.SAMPLED)).otherwise(
                _lit_d(D.PENDING)
            )
        m_col, e_col = self._ord_cols()
        fm, fe = F.col(m_col), F.col(e_col)
        trace_err = fe.isNotNull() & (fm.isNull() | (fe < fm))
        return (
            F.when(trace_err, _lit_d(D.UNSPECIFIED))  # error → decider continues
            .when(fm.isNotNull(), _lit_d(D.SAMPLED))
            .otherwise(_lit_d(D.PENDING))
        )


@dataclass
class Threshold(Policy):
    """OTEP-235 consistent threshold sampling (threshold.go:34-91):
    min over spans' valid `sampling.tail.threshold`; a min that stays at
    2^56−1 counts as "not found" (the evaluator's sentinel init) ⇒
    Pending; else Sampled iff rv (rightmost 7 bytes of trace id) >= min.
    """

    def decision(self) -> Column:
        rv = F.col(AGG.TRACE_LO).bitwiseAND(F.lit(MAX_THRESHOLD))
        min_thr = F.col(AGG.MIN_THRESHOLD)
        found = min_thr.isNotNull() & (min_thr < F.lit(MAX_THRESHOLD))
        return F.when(
            found & (rv >= min_thr), _lit_d(D.SAMPLED)
        ).otherwise(_lit_d(D.PENDING))


def parse_threshold_attr(attr: Column) -> Column:
    """String-level OTEP-235 parse for a `sampling.tail.threshold` attr:
    requires `0x` prefix, ≤14 hex chars, right-pads to 56 bits; invalid ⇒
    null (threshold.go:60-84). Used where thresholds arrive as strings.
    """
    # bare "0x" is valid (pads to zero ⇒ threshold 0, threshold_test.go
    # "threshold 0" case); >14 hex chars or missing 0x is invalid.
    valid = attr.isNotNull() & attr.rlike("^0x[0-9a-fA-F]{0,14}$")
    padded = F.rpad(F.substring(attr, 3, 14), 14, "0")
    return F.when(valid, F.conv(padded, 16, 10).cast("long"))


# --------------------------------------------------------------------------
# composite policies


@dataclass
class AndPolicy(Policy):
    sub_policies: list[Policy] = field(default_factory=list)

    def span_agg_exprs(self) -> list[Column]:
        return [e for p in self.sub_policies for e in p.span_agg_exprs()]

    def required_hash_salts(self) -> set[str]:
        return set().union(*[p.required_hash_salts() for p in self.sub_policies], set())

    def decision(self) -> Column:
        # first non-Sampled sub-decision wins; all Sampled ⇒ Sampled
        # (and.go:34-46). A sub error (Unspecified) propagates as the
        # returned decision with the error.
        result: Column = _lit_d(D.SAMPLED)
        for sub in reversed(self.sub_policies):
            d = sub.decision()
            result = F.when(d != _lit_d(D.SAMPLED), d).otherwise(result)
        return result


@dataclass
class RootSpans(Policy):
    sub_policy: Policy | None = None

    def span_agg_exprs(self) -> list[Column]:
        return self.sub_policy.span_agg_exprs() if self.sub_policy else []

    def required_hash_salts(self) -> set[str]:
        return self.sub_policy.required_hash_salts() if self.sub_policy else set()

    def decision(self) -> Column:
        sub = self.sub_policy.decision()
        default = F.when(
            F.col(AGG.MERGED_PRIORITY) == F.lit(D.PRIORITY_LOW), _lit_d(D.LOW_PRIORITY)
        ).otherwise(_lit_d(D.PENDING))
        lone_root = (F.col(AGG.TOTAL_SPAN_COUNT) == 1) & F.col(AGG.ANY_ROOT)
        return (
            F.when(sub == _lit_d(D.UNSPECIFIED), _lit_d(D.UNSPECIFIED))  # sub error
            .when(sub == _lit_d(D.SAMPLED), _lit_d(D.PENDING))  # promote-block
            .when(lone_root, _lit_d(D.LOW_PRIORITY))
            .otherwise(default)
        )


@dataclass
class Downgrader(Policy):
    downgrade_to: str = "NotSampled"
    sub_policy: Policy | None = None

    def __post_init__(self):
        if self.downgrade_to not in D.NAME_TO_DECISION:
            raise PolicyError(f"invalid downgrade_to decision: {self.downgrade_to!r}")
        self._to = D.NAME_TO_DECISION[self.downgrade_to]

    def span_agg_exprs(self) -> list[Column]:
        return self.sub_policy.span_agg_exprs() if self.sub_policy else []

    def required_hash_salts(self) -> set[str]:
        return self.sub_policy.required_hash_salts() if self.sub_policy else set()

    def decision(self) -> Column:
        sub = self.sub_policy.decision()
        return F.when(sub == _lit_d(D.SAMPLED), _lit_d(self._to)).otherwise(sub)


# --------------------------------------------------------------------------
# test stubs (decider-parity tests emulate evaluator runtime errors)


@dataclass
class ErrorStub(Policy):
    """Always 'errors' → Unspecified (decider logs & continues)."""

    def decision(self) -> Column:
        return _lit_d(D.UNSPECIFIED)


@dataclass
class StaticStub(Policy):
    static_decision: int = D.PENDING

    def decision(self) -> Column:
        return _lit_d(self.static_decision)


# --------------------------------------------------------------------------
# helpers used by the aggregation/decider layers


def collect_span_agg_exprs(policies: list[Policy]) -> list[Column]:
    return [e for p in policies for e in p.span_agg_exprs()]


def collect_hash_salts(policies: list[Policy]) -> set[str]:
    salts: set[str] = set()
    for p in policies:
        salts |= p.required_hash_salts()
    return salts
