"""Config model + YAML loader mirroring the reference's config surface
(config.go:13-114, config_policy.go:16-180, factory.go defaults
config.go:61-72). Policy YAML entries translate 1:1 into
:mod:`policies.builders` objects; validation errors raise at load time,
matching the reference's fail-to-start behavior.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from .policies import (
    AndPolicy,
    Latency,
    Downgrader,
    OTTLCondition,
    Policy,
    PolicyError,
    Probabilistic,
    RemoteProbabilistic,
    RootSpans,
    SpanCount,
    StatusCode,
    Threshold,
)


@dataclass
class EngineConfig:
    """Engine capacities (createDefaultConfig, config.go:61-72)."""

    shards: int = 32  # reference default 1; ours defaults to core count
    primary_cache_size: int = 1000
    secondary_cache_size: int = 100
    sampled_cache_size: int = 10_000
    non_sampled_cache_size: int = 10_000
    # the reference warm-starts the primary cache at 60% of target and
    # lets the memory regulator grow it (processor.go:113-114); Spark
    # manages memory, so the regulator is replaced by this static factor
    primary_warm_fraction: float = 1.0
    compress: bool = True
    # >0: explicit two-phase salted aggregation on the trace key (for
    # single-trace hot-key skew; Catalyst partial agg covers the rest)
    salt_buckets: int = 0  # parquet codec handles payload compression

    def primary_capacity(self) -> int:
        return max(1, int(self.primary_cache_size * self.primary_warm_fraction))


def _shared_policy(name: str, typ: str, body: dict[str, Any],
                   rate_getters: dict[str, Callable[[], float]] | None = None) -> Policy:
    if typ == "probabilistic":
        c = body.get("probabilistic", {})
        return Probabilistic(
            name=name,
            sampling_percentage=float(c.get("sampling_percentage", 0.0)),
            hash_salt=c.get("hash_salt", ""),
        )
    if typ == "remote_probabilistic":
        c = body.get("remote_probabilistic", {})
        getter = (rate_getters or {}).get(c.get("rate_getter_ext", ""), None)
        return RemoteProbabilistic(
            name=name,
            default_rate=float(c.get("default_rate", 0.0)),
            hash_salt=c.get("hash_salt", ""),
            rate_getter=getter,
        )
    if typ == "span_count":
        c = body.get("span_count", {})
        return SpanCount(name=name, min_spans=int(c.get("min_spans", 0)),
                         log_sampled=bool(c.get("log_sampled", False)))
    if typ == "latency":
        c = body.get("latency", {})
        return Latency(name=name, threshold_ms=int(c.get("threshold_ms", 0)))
    if typ == "status_code":
        c = body.get("status_code", {})
        return StatusCode(name=name, status_codes=list(c.get("status_codes", [])))
    if typ == "ottl_condition":
        c = body.get("ottl_condition", {})
        return OTTLCondition(
            name=name,
            span_conditions=list(c.get("span", [])),
            span_event_conditions=list(c.get("spanevent", [])),
            error_mode=c.get("error_mode", "ignore"),
        )
    if typ == "threshold":
        return Threshold(name=name)
    raise PolicyError(f"unknown sampling policy type {typ!r}")


def parse_policy(entry: dict[str, Any],
                 rate_getters: dict[str, Callable[[], float]] | None = None) -> Policy:
    name = entry["name"]
    typ = entry["type"]
    if typ == "and":
        subs = [
            _shared_policy(s["name"], s["type"], s, rate_getters)
            for s in entry.get("and", {}).get("and_sub_policy", [])
        ]
        pol: Policy = AndPolicy(name=name, sub_policies=subs)
    elif typ == "root_spans":
        s = entry.get("root_spans", {}).get("sub_policy", {})
        pol = RootSpans(name=name, sub_policy=_shared_policy(s["name"], s["type"], s, rate_getters))
    elif typ == "downgrader":
        c = entry.get("downgrader", {})
        s = c.get("sub_policy", {})
        pol = Downgrader(
            name=name,
            downgrade_to=c.get("downgrade_to", "NotSampled"),
            sub_policy=_shared_policy(s["name"], s["type"], s, rate_getters),
        )
    else:
        pol = _shared_policy(name, typ, entry, rate_getters)

    pol.emit_single_span_for_not_sampled = bool(entry.get("emit_single_span_for_not_sampled", False))
    pol.record_decision_from = entry.get("record_decision_from", "")
    groupers = entry.get("decision_groupers", []) or entry.get("decision_grouping", [])
    pol.decision_groupers = [(g["regex"], g["group"]) for g in groupers]
    return pol


def parse_policies(entries: list[dict[str, Any]],
                   rate_getters: dict[str, Callable[[], float]] | None = None) -> list[Policy]:
    pols = [parse_policy(e, rate_getters) for e in entries]
    names = [p.name for p in pols]
    if len(set(names)) != len(names):  # duplicate-name check (policy.go:77-85)
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise PolicyError(f"duplicate policy names: {dupes}")
    return pols


def load_config(path_or_dict,
                rate_getters: dict[str, Callable[[], float]] | None = None
                ) -> tuple[EngineConfig, list[Policy]]:
    if isinstance(path_or_dict, str):
        import yaml

        with open(path_or_dict) as f:
            cfg = yaml.safe_load(f)
    else:
        cfg = dict(path_or_dict)

    eng = EngineConfig(
        shards=int(cfg.get("shards", 32)),
        primary_cache_size=int(cfg.get("max_traces", cfg.get("primary_cache_size", 1000))),
        secondary_cache_size=int(cfg.get("secondary_cache_size", 100)),
        sampled_cache_size=int(cfg.get("sampled_cache_size", 10_000)),
        non_sampled_cache_size=int(cfg.get("non_sampled_cache_size", 10_000)),
        primary_warm_fraction=float(cfg.get("primary_warm_fraction", 1.0)),
        compress=bool(cfg.get("compression_enabled", True)),
        salt_buckets=int(cfg.get("salt_buckets", 0)),
    )
    pols = parse_policies(cfg.get("sampling_policies", cfg.get("policies", [])), rate_getters)
    return eng, pols

