"""Independent Python interpreter of the OTTL condition AST — the
differential oracle for BOTH error modes.

This evaluates the same ASTs (`ottl.parse_condition` output) directly
over span dicts (the `span_row` fixture shape), re-implementing the
contrib semantics from scratch — Go-style error propagation, converter
error rules (StandardStringGetter errors on nil, strconv failures,
substring bounds, JSON unmarshal), short-circuit `and`/`or`, nil
comparison rules, mixed-type comparison coercion — with NO Spark in the
loop. test_ottl_fuzz.py compares the engine's compiled-Column decisions
against this model on adversarial rows; a mismatch in either mode fails.

Scope: faithful for the value domain the fuzz generator + adversarial
spans produce (strings, int64s, small doubles, JSON objects). Not a
general re-implementation of contrib (e.g. Java vs Python float→string
rendering diverges above 1e7 — the fixtures stay below that).
"""

from __future__ import annotations

import json
import re

from atlassian_sampling_processor_spark import decision as D

_NUMERIC_HEADS = {
    "start_time_unix_nano",
    "end_time_unix_nano",
    "status.code",
    "kind",
    "span.kind",
    "time_unix_nano",
    "dropped_attributes_count",
}
_TIME_HEADS = {"start_time", "end_time"}
_INT_RE = re.compile(r"^[+-]?[0-9]+$")


class OttlError(Exception):
    """Contrib evaluator error (strconv / nil getter / bounds / JSON)."""


def _render(v):
    """Value → string, matching Spark's cast-to-string for the fixture
    domain: booleans lowercase, ints bare, doubles with a trailing .0."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return str(v)
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    return str(v)


def _to_long(v):
    """try_cast(string as long): integral format only, else error if
    the value is present (strconv.ParseInt failure)."""
    if v is None:
        return None
    s = _render(v).strip()
    if not _INT_RE.match(s):
        raise OttlError(f"Int({s!r})")
    n = int(s)
    if not -(2**63) <= n < 2**63:
        raise OttlError(f"Int({s!r}) overflow")
    return n


def _to_double(v, err: bool):
    """try_cast to double; on failure: error if err (converter/arith over
    a present value) else None (comparison coercion)."""
    if v is None:
        return None
    s = _render(v).strip()
    try:
        if s.lower() in ("inf", "-inf", "+inf", "nan", "infinity", "-infinity"):
            raise ValueError(s)
        return float(s)
    except ValueError:
        if err:
            raise OttlError(f"Double({s!r})") from None
        return None


def _path_value(parts, ctx, span):
    head = parts[0]
    if head == "attributes":
        m = (span.get("attrs") if ctx == "span" else span.get("event_attrs")) or {}
        return m.get(parts[1])
    if head == "resource.attributes":
        return (span.get("resource_attrs") or {}).get(parts[1])
    if head == "name":
        return span.get("name") if ctx == "span" else span.get("event_name")
    if head == "span.name":
        return span.get("name")
    if head in ("kind", "span.kind"):
        return span.get("kind")
    if head == "status.code":
        return span.get("status_id")
    if head == "start_time_unix_nano":
        return span.get("start_ts")
    if head == "end_time_unix_nano":
        return span.get("end_ts")
    if head == "trace_id.string":
        return span.get("doc_id")
    if head == "span_id.string":
        return format(span.get("span_id") or 0, "016x")
    if head == "instrumentation_scope.name":
        return span.get("scope_name")
    if head == "instrumentation_scope.version":
        return span.get("scope_version")
    if head in ("start_time",):
        return span.get("start_ts")
    if head == "end_time":
        return span.get("end_ts")
    if head == "time_unix_nano":  # spanevent time fixture = span start
        return span.get("start_ts")
    if head == "dropped_attributes_count":
        return 0
    raise OttlError(f"model: unknown path {parts!r}")


def _static_type(ast) -> str:
    kind = ast[0]
    if kind == "lit":
        v = ast[1]
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "double"
        return "string"
    if kind == "path":
        if ast[1][0] in _TIME_HEADS:
            return "time"
        return "int" if ast[1][0] in _NUMERIC_HEADS else "string"
    if kind == "len":
        return "int"
    if kind == "cast":
        return {"long": "int", "double": "double", "string": "string"}[ast[1]]
    if kind == "arith":
        l, r = _static_type(ast[2]), _static_type(ast[3])
        return "int" if l == "int" and r == "int" else "double"
    if kind in ("time", "trunctime", "unixtime"):
        return "time"
    if kind in ("hour", "unixnano", "timepart", "unixdiv"):
        return "int"
    if kind == "durfold":
        return "double" if ast[2] in ("hours", "minutes", "seconds") else "int"
    if kind == "logconv":
        return "double"
    if kind in ("fnv", "murmur3"):
        return "int"
    if kind in ("ismatch", "isroot", "istype", "and", "or", "not", "cmp"):
        return "bool"
    return "string"


def _arith_side(ast, ctx, span):
    v = eval_operand(ast, ctx, span)
    if _static_type(ast) in ("int", "double", "time"):
        return v
    return _to_double(v, err=True)  # present non-numeric operand errors


def eval_operand(ast, ctx, span):
    """AST operand → Python value; raises OttlError where contrib's
    evaluator would surface an error."""
    kind = ast[0]
    if kind == "lit":
        return ast[1]
    if kind == "path":
        return _path_value(ast[1], ctx, span)
    if kind == "jsonget":
        keys = []
        node = ast
        while node[0] == "jsonget":
            keys.append(node[2])
            node = node[1]
        target = eval_operand(node[1], ctx, span)
        s = _render(target)
        if s is None:
            raise OttlError("ParseJSON(nil)")  # StandardStringGetter nil
        try:
            doc = json.loads(s)
        except ValueError:
            raise OttlError(f"ParseJSON({s!r})") from None
        for k in reversed(keys):
            doc = doc.get(k) if isinstance(doc, dict) else None
        return _render(doc)  # lazy get_json_object renders scalars as text
    if kind == "len":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("Len(nil)")
        return len(s)
    if kind == "substr":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("Substring(nil)")
        if ast[2] + ast[3] > len(s):
            raise OttlError("Substring out of range")
        return s[ast[2] : ast[2] + ast[3]]
    if kind == "case":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("ConvertCase(nil)")
        if ast[2] == "upper":
            return s.upper()
        if ast[2] == "lower":
            return s.lower()
        if ast[2] == "snake":
            t = re.sub(r"[ \-]", "_", s)
            t = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", t)
            t = re.sub(r"([A-Z]+)([A-Z][a-z])", r"\1_\2", t)
            return t.lower()
        parts = re.sub(r"[ \-]", "_", s).split("_")
        return "".join(p[:1].upper() + p[1:] for p in parts)
    if kind == "concat":
        parts = [_render(eval_operand(t, ctx, span)) for t in ast[1]]
        return ast[2].join(p for p in parts if p is not None)
    if kind == "cast":
        v = eval_operand(ast[2], ctx, span)
        if ast[1] == "string":
            return _render(v)
        if ast[1] == "long":
            return _to_long(v)
        return _to_double(v, err=True)
    if kind == "arith":
        lv = _arith_side(ast[2], ctx, span)
        rv = _arith_side(ast[3], ctx, span)
        if lv is None or rv is None:
            return None
        return (lv + rv) if ast[1] == "+" else (lv - rv)
    if kind == "time":
        # parse with the ORIGINAL Go ctime format (ast[3]) in UTC —
        # independent of the engine's Spark-pattern translation
        import datetime as dt

        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("Time(nil)")
        pyfmt = ast[3].replace("%F", "%Y-%m-%d").replace("%T", "%H:%M:%S")
        try:
            t = dt.datetime.strptime(s, pyfmt).replace(tzinfo=dt.timezone.utc)
        except ValueError:
            raise OttlError(f"Time({s!r})") from None
        return int(t.timestamp()) * 1_000_000_000 + t.microsecond * 1000
    if kind == "trunctime":
        v = eval_operand(ast[1], ctx, span)
        if v is None:
            return None
        return v - (v % ast[2])
    if kind == "hour":
        v = eval_operand(ast[1], ctx, span)
        if v is None:
            return None
        return (v % 86_400_000_000_000) // 3_600_000_000_000
    if kind == "unixnano":
        return eval_operand(ast[1], ctx, span)
    if kind == "trim":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("Trim(nil)")
        return s.strip(ast[2])  # str.strip(chars) == strings.Trim cutset
    if kind == "hashconv":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError(f"{ast[2]}(nil)")
        import hashlib

        return getattr(hashlib, ast[2])(s.encode()).hexdigest()
    if kind == "durfold":
        v = eval_operand(ast[1], ctx, span)
        if _static_type(ast[1]) not in ("int", "double", "time"):
            v = _to_double(v, err=True)
        if v is None:
            raise OttlError("Duration(nil)")  # StandardDurationGetter
        unit = ast[2]
        if unit in ("hours", "minutes", "seconds"):
            div = {"hours": 3_600_000_000_000.0, "minutes": 60_000_000_000.0,
                   "seconds": 1_000_000_000.0}[unit]
            return v / div
        if unit == "nanoseconds":
            return v
        d = {"milliseconds": 1_000_000, "microseconds": 1_000}[unit]
        return -((-v) // d) if v < 0 else v // d  # Go: truncate toward zero
    if kind == "timepart":
        v = eval_operand(ast[1], ctx, span)
        if v is None:
            return None
        unit = ast[2]
        if unit == "minute":
            return (v % 3_600_000_000_000) // 60_000_000_000
        if unit == "second":
            return (v % 60_000_000_000) // 1_000_000_000
        import datetime as dt

        t = dt.datetime.fromtimestamp(v // 1_000_000_000, tz=dt.timezone.utc)
        return {"day": t.day, "month": t.month, "year": t.year}[unit]
    if kind == "unixdiv":
        v = eval_operand(ast[1], ctx, span)
        return None if v is None else v // ast[2]  # floor, like Go Unix()
    if kind == "logconv":
        v = eval_operand(ast[1], ctx, span)
        if v is None:
            raise OttlError("Log(nil)")
        x = v if _static_type(ast[1]) in ("int", "double", "time") else _to_double(v, err=True)
        if x is None or x <= 0:
            raise OttlError(f"Log({x!r})")  # func_log: must be > 0
        import math

        return math.log(x)
    if kind == "splitget":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("Split(nil)")
        parts = s.split(ast[2])
        return parts[ast[3]] if 0 <= ast[3] < len(parts) else None
    if kind == "sortget":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("Sort(nil)")
        parts = sorted(s.split(ast[2]), reverse=(ast[3] == "desc"))
        return parts[ast[4]] if 0 <= ast[4] < len(parts) else None
    if kind == "unixtime":
        ns = 0
        for i, arg in enumerate((ast[1], ast[2])):
            if arg is None:
                continue
            v = eval_operand(arg, ctx, span)
            if v is None:
                raise OttlError("Unix(nil)")
            s = _render(v).strip()
            if not _INT_RE.match(s):
                raise OttlError(f"Unix({s!r})")  # IntGetter non-int error
            ns += int(s) * (1_000_000_000 if i == 0 else 1)
        return ns
    if kind == "murmur3":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("Murmur3Hash(nil)")
        # independent murmur3 x86-32 (seed 0), written from the spec
        import struct

        data = s.encode("utf-8")
        h = 0
        m32 = 0xFFFFFFFF
        for (k,) in struct.iter_unpack("<I", data[: len(data) // 4 * 4]):
            k = (k * 0xCC9E2D51) & m32
            k = ((k << 15) & m32) | (k >> 17)
            k = (k * 0x1B873593) & m32
            h ^= k
            h = ((h << 13) & m32) | (h >> 19)
            h = (h * 5 + 0xE6546B64) & m32
        tail = data[len(data) // 4 * 4 :]
        k = 0
        for i in range(len(tail) - 1, -1, -1):
            k = (k << 8) | tail[i]
        if tail:
            k = (k * 0xCC9E2D51) & m32
            k = ((k << 15) & m32) | (k >> 17)
            k = (k * 0x1B873593) & m32
            h ^= k
        h ^= len(data)
        h ^= h >> 16
        h = (h * 0x85EBCA6B) & m32
        h ^= h >> 13
        h = (h * 0xC2B2AE35) & m32
        h ^= h >> 16
        return h
    if kind == "format":
        segs, verbs, args = ast[1], ast[2], ast[3]
        out = [segs[0]]
        for seg, verb, a in zip(segs[1:], verbs, args):
            s = _render(eval_operand(a, ctx, span))
            out.append(f"%!{verb}(<nil>)" if s is None else s)
            out.append(seg)
        return "".join(out)
    if kind == "hexenc":
        v = eval_operand(ast[1], ctx, span)
        if v is None:
            raise OttlError("Hex(nil)")
        if ast[2] == "int":
            import struct

            return struct.pack(">q", int(v)).hex()
        return _render(v).encode("utf-8").hex()
    if kind == "decode64":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("Decode(nil)")
        if not re.fullmatch(
            r"(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?", s
        ):
            raise OttlError(f"Decode({s!r})")
        import base64

        # Spark's binary→string cast substitutes U+FFFD for invalid UTF-8
        return base64.b64decode(s).decode("utf-8", errors="replace")
    if kind == "kvget":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("ParseKeyValue(nil)")
        d, pdl, key = ast[2], ast[3], ast[4]
        val = None
        for p in s.split(pdl):
            if p.strip(" ") == "":
                continue
            if d not in p:
                raise OttlError(f"ParseKeyValue cannot split {p!r}")
            k, v2 = p.split(d, 1)
            if k.strip(" ") == key:
                val = v2.strip(" ")  # last duplicate wins
        return val
    if kind == "extractpat":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("ExtractPatterns(nil)")
        m = re.search(ast[2], s)
        if not m:
            return None
        g = m.group(ast[4])
        return g if g is not None else ""  # engine renders non-participation ""
    if kind == "fnv":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("FNV(nil)")
        h = 14695981039346656037  # independent FNV-1a64 (not the engine's)
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 1099511628211) & ((1 << 64) - 1)
        return h - (1 << 64) if h >= (1 << 63) else h
    if kind in ("ismatch", "isroot", "istype"):
        return eval_bool(ast, ctx, span)
    raise OttlError(f"model: invalid operand {ast!r}")


def _is_nil_lit(ast) -> bool:
    return ast[0] == "lit" and ast[1] is None


def _coerce_cmp(l_ast, r_ast, lv, rv):
    """Mixed-static-type comparison coercion: the non-numeric side casts
    to double, unparseable → None (NOT an error); bool vs string renders
    the bool."""
    lt, rt = _static_type(l_ast), _static_type(r_ast)
    num = ("int", "double", "time")
    if lt in num and rt not in num:
        rv = _to_double(rv, err=False)
    elif rt in num and lt not in num:
        lv = _to_double(lv, err=False)
    elif lt == "bool" and rt == "string":
        lv = _render(lv)
    elif rt == "bool" and lt == "string":
        rv = _render(rv)
    return lv, rv


def eval_bool(ast, ctx, span) -> bool:
    """AST condition → bool with contrib SHORT-CIRCUIT error semantics:
    `or` stops at a true left (right never evaluated), `and` at a false
    left; errors propagate as OttlError."""
    kind = ast[0]
    if kind == "or":
        if eval_bool(ast[1], ctx, span):
            return True
        return eval_bool(ast[2], ctx, span)
    if kind == "and":
        if not eval_bool(ast[1], ctx, span):
            return False
        return eval_bool(ast[2], ctx, span)
    if kind == "not":
        return not eval_bool(ast[1], ctx, span)
    if kind == "ismatch":
        s = _render(eval_operand(ast[1], ctx, span))
        if s is None:
            raise OttlError("IsMatch(nil)")  # StandardStringLikeGetter
        return re.search(ast[2], s) is not None
    if kind == "isroot":
        return bool(span.get("is_root"))
    if kind == "istype":
        v = eval_operand(ast[2], ctx, span)
        return _static_type(ast[2]) == ast[1] and v is not None
    if kind == "lit":
        return bool(ast[1])
    if kind == "cmp":
        op, l, r = ast[1], ast[2], ast[3]
        if _is_nil_lit(l) or _is_nil_lit(r):
            target = eval_operand(l if _is_nil_lit(r) else r, ctx, span)
            if op == "==":
                return target is None
            if op == "!=":
                return target is not None
            return False
        lv = eval_operand(l, ctx, span)
        rv = eval_operand(r, ctx, span)
        lv, rv = _coerce_cmp(l, r, lv, rv)
        if lv is None or rv is None:
            return op == "!="  # absent: != true, everything else false
        # same-kind comparison only (numbers with numbers after coercion,
        # strings with strings, bools with bools)
        if isinstance(lv, bool) != isinstance(rv, bool):
            return op == "!="
        if op == "==":
            return lv == rv
        if op == "!=":
            return lv != rv
        return {"<": lv < rv, "<=": lv <= rv, ">": lv > rv, ">=": lv >= rv}[op]
    raise OttlError(f"model: invalid expression {ast!r}")


def eval_condition(ast, ctx, span):
    """→ (matched: bool, errored: bool) at the CONDITION level."""
    try:
        return eval_bool(ast, ctx, span), False
    except OttlError:
        return False, True


def decide(span_asts, event_asts, spans, error_mode: str) -> int:
    """Policy decision over one trace's spans (span dicts), both modes.

    ignore: any span whose condition sequence has a non-erroring match →
    Sampled (erroring conditions are skipped — contrib condition-level
    ignore). propagate: spans in (start_ts, span_id) order; per span the
    first condition that errors-or-matches decides the span; the first
    deciding span decides the trace (error → Unspecified)."""

    def pairs(span):
        out = [(a, "span") for a in span_asts]
        if span.get("event_name") is not None:
            out += [(a, "spanevent") for a in event_asts]
        return out

    if error_mode != "propagate":
        for span in spans:
            for ast, ctx in pairs(span):
                matched, errored = eval_condition(ast, ctx, span)
                if matched and not errored:
                    return D.SAMPLED
        return D.PENDING
    ordered = sorted(
        spans, key=lambda s: (s.get("start_ts") or 0, s.get("span_id") or 0)
    )
    for span in ordered:
        for ast, ctx in pairs(span):
            matched, errored = eval_condition(ast, ctx, span)
            if errored:
                return D.UNSPECIFIED
            if matched:
                return D.SAMPLED
    return D.PENDING
