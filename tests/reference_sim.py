"""Independent pure-Python simulator of the reference decision engine —
a differential oracle for the Spark pipeline.

Implements the Go semantics directly (dict state, per-batch processing
at the same batch granularity as the Spark engine): decision-span
ingest → early decision checks → metadata merge → ordered policy list
with the LowPriority ratchet → routing → tiered capacity eviction.
Deliberately shares no code with the Spark implementation beyond the
scalar FNV helper (bit-exactness is the point).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from atlassian_sampling_processor_spark import decision as D
from atlassian_sampling_processor_spark.hashing import calculate_threshold, hash_trace_id

MAX_THRESHOLD = (1 << 56) - 1


@dataclass
class Pend:
    span_count: int = 0
    min_start: int = None
    max_end: int = None
    arrival: int = 0
    last_seen: int = 0
    priority: int = D.PRIORITY_UNSPECIFIED
    last_low: str | None = None
    payload: list = field(default_factory=list)  # span dicts


def _policy_eval(p, agg, merged_priority):
    """One policy → decision int. p = (type, params[, sub])."""
    typ = p["type"]
    if typ == "span_count":
        return D.SAMPLED if agg["total"] >= p["min_spans"] else D.PENDING
    if typ == "latency":
        ms = (agg["max_end"] - agg["min_start"]) // 1_000_000
        return D.SAMPLED if ms >= p["threshold_ms"] else D.PENDING
    if typ == "status_code":
        return D.SAMPLED if agg["statuses"] & set(p["codes"]) else D.PENDING
    if typ == "threshold":
        mt = min((t for t in agg["thresholds"]), default=MAX_THRESHOLD)
        if mt == MAX_THRESHOLD:
            return D.PENDING
        rv = agg["trace_lo_u"] & MAX_THRESHOLD
        return D.SAMPLED if rv >= mt else D.PENDING
    if typ == "probabilistic":
        h = hash_trace_id(p.get("salt", "default-hash-seed"), agg["trace_hi_u"], agg["trace_lo_u"])
        return D.SAMPLED if h <= calculate_threshold(p["pct"] / 100.0) else D.PENDING
    if typ == "root_spans":
        default = D.LOW_PRIORITY if merged_priority == D.PRIORITY_LOW else D.PENDING
        sub = _policy_eval(p["sub"], agg, merged_priority)
        if sub == D.SAMPLED:
            return D.PENDING
        if agg["total"] != 1:
            return default
        return D.LOW_PRIORITY if agg["any_root"] else default
    if typ == "downgrader":
        sub = _policy_eval(p["sub"], agg, merged_priority)
        return p["to"] if sub == D.SAMPLED else sub
    if typ == "and":
        for s in p["subs"]:
            d = _policy_eval(s, agg, merged_priority)
            if d != D.SAMPLED:
                return d
        return D.SAMPLED
    raise ValueError(typ)


def simulate(
    policies,
    batches,
    primary_cap=10**9,
    secondary_cap=10**9,
    sampled_cache_cap=10**9,
    non_sampled_cache_cap=10**9,
):
    """policies: list of dicts with name/type/params (+emit_placeholder).
    batches: list of lists of span dicts (doc_id, span_id, parent, start,
    end, status, threshold(None|int), is_decision, decision_value,
    tokens_key). Returns (routed rows, decision_state, pending docs).

    Decision-cache capacity models the engine's FIFO-by-epoch eviction
    (decisions are immutable and never recency-refreshed, so LRU order ≡
    insertion order; see pipeline.py job_decision_state): at the end of
    each batch every kind keeps its newest ``cap`` decisions by
    (decided_batch desc, doc_id desc); evicted docs are forgotten — late
    spans re-evaluate from scratch, the reference's full-LRU behavior
    (lru_cache.go:94-99 + processor.go:408-430)."""
    pend: dict[str, Pend] = {}
    decisions: dict[str, tuple[int, str, int]] = {}  # doc -> (dec, policy, batch)
    routed = []  # (sink, doc_id, tokens_key, reason)

    def release(doc, sink, reason):
        for s in pend[doc].payload:
            routed.append((sink, doc, s["tokens_key"], reason))
        del pend[doc]

    for b, spans in enumerate(batches):
        by_doc: dict[str, list] = {}
        dec_spans: dict[str, list] = {}
        for s in spans:
            (dec_spans if s.get("is_decision") else by_doc).setdefault(s["doc_id"], []).append(s)

        # 1. decision-span ingest (first by span_id; existing decisions win)
        for doc, ds in dec_spans.items():
            if doc in decisions:
                continue
            first = min(ds, key=lambda s: s["span_id"])
            if first["decision_value"]:
                decisions[doc] = (D.SAMPLED, "__decision_span__", b)
                if doc in pend:
                    release(doc, "keep", "decision_span_release")
            else:
                decisions[doc] = (D.NOT_SAMPLED, "__decision_span__", b)
                if doc in pend:
                    release(doc, "drop", "decision_span_drop")

        # 2. early decision checks
        remaining = {}
        for doc, ss in by_doc.items():
            if doc in decisions:
                d = decisions[doc][0]
                sink = "keep" if d == D.SAMPLED else "drop"
                reason = "late_sampled" if d == D.SAMPLED else "late_not_sampled"
                for s in ss:
                    routed.append((sink, doc, s["tokens_key"], reason))
            else:
                remaining[doc] = ss

        # 3. evaluate
        for doc in sorted(remaining):
            ss = remaining[doc]
            cached = pend.get(doc)
            agg = {
                "batch": len(ss),
                "total": len(ss) + (cached.span_count if cached else 0),
                "min_start": min(
                    [s["start"] for s in ss] + ([cached.min_start] if cached else [])
                ),
                "max_end": max([s["end"] for s in ss] + ([cached.max_end] if cached else [])),
                "statuses": {s["status"] for s in ss},
                "thresholds": [s["threshold"] for s in ss if s.get("threshold") is not None],
                "any_root": any(
                    s["parent"] == 0 or s["parent"] == (int(doc[16:], 16)) for s in ss
                ),
                "trace_hi_u": int(doc[:16], 16),
                "trace_lo_u": int(doc[16:], 16),
            }
            merged_priority = D.PRIORITY_UNSPECIFIED  # processor.go:345 + max()
            last_low = cached.last_low if cached else None

            final, pol = D.PENDING, None
            for p in policies:
                d = _policy_eval(p, agg, merged_priority)
                if last_low is not None and last_low != p["name"] and d == D.LOW_PRIORITY:
                    d = D.PENDING
                if d in D.DECISIVE:
                    final, pol = d, p
                    break

            if final == D.SAMPLED:
                decisions[doc] = (D.SAMPLED, pol["name"], b)
                if cached:
                    release(doc, "keep", "sampled_cached")
                for s in ss:
                    routed.append(("keep", doc, s["tokens_key"], "sampled"))
            elif final == D.NOT_SAMPLED:
                decisions[doc] = (D.NOT_SAMPLED, pol["name"], b)
                if pol.get("emit_placeholder"):
                    routed.append(("keep", doc, None, "not_sampled_placeholder"))
                if cached:
                    release(doc, "drop", "not_sampled_cached")
                for s in ss:
                    routed.append(("drop", doc, s["tokens_key"], "not_sampled"))
            else:  # Pending / LowPriority — absorb (processor.go:385-404)
                td_priority = D.PRIORITY_LOW if final == D.LOW_PRIORITY else D.PRIORITY_UNSPECIFIED
                entry = cached or Pend(arrival=b, min_start=agg["min_start"], max_end=agg["max_end"])
                entry.span_count = agg["total"]
                entry.min_start = agg["min_start"]
                entry.max_end = agg["max_end"]
                entry.last_seen = b
                entry.priority = max(entry.priority if cached else td_priority, td_priority)
                if final == D.LOW_PRIORITY:
                    entry.last_low = last_low or pol["name"]
                else:
                    entry.last_low = None
                entry.payload.extend(ss)
                pend[doc] = entry

        # 4. capacity eviction (recency rank desc(last_seen, arrival, doc))
        for tier, cap in (("primary", primary_cap), ("secondary", secondary_cap)):
            members = [
                (p.last_seen, p.arrival, doc)
                for doc, p in pend.items()
                if (p.priority == D.PRIORITY_LOW) == (tier == "secondary")
            ]
            members.sort(reverse=True)
            for _, _, doc in members[cap:]:
                decisions[doc] = (D.NOT_SAMPLED, "__evicted__", b)
                release(doc, "low_priority" if tier == "secondary" else "drop", f"evicted_{tier}")

        # 5. decision-cache capacity (FIFO by insertion epoch; within the
        # boundary epoch lowest doc_ids fall first — the engine's
        # [desc decided_batch, desc doc_id] keep-order)
        for kind, cap in ((D.SAMPLED, sampled_cache_cap), (D.NOT_SAMPLED, non_sampled_cache_cap)):
            members = sorted(
                ((db, doc) for doc, (d, _p, db) in decisions.items() if d == kind),
                reverse=True,
            )
            for _db, doc in members[cap:]:
                del decisions[doc]

    return routed, decisions, pend
