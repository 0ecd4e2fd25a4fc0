"""Parse stage: tokenized sequences → span-row DataFrame.

The hot-path decode is pure Catalyst expressions over the fixed-width
header (``parse_sequences``) — zero Python, fully inside whole-stage
codegen, column-pruned per consumer. An Arrow-batched struct pandas UDF
(``parse_sequences_pandas``, numpy decode) is kept as the vectorized-UDF
reference implementation and cross-checked bit-for-bit in tests. All
string/map materialization (status names, attr maps, threshold attr
string) is separate Catalyst expressions in :func:`enrich_spans`. The
stage is a narrow map — no shuffle until the per-trace aggregation.

Reference parity: the parsed row carries exactly the fields the
reference's evaluators read (FIXTURES.md §2; e.g. status
internal/evaluators/status_code.go:56-66, threshold attr
internal/evaluators/threshold.go:34-91, parent/root detection
internal/evaluators/root_spans.go:79-89).
"""

from __future__ import annotations



import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codec

# numeric columns produced by the decode UDF (beyond passthrough)
DECODED_FIELDS = [
    ("trace_hi", T.LongType()),
    ("trace_lo", T.LongType()),
    ("span_id", T.LongType()),
    ("parent_span_id", T.LongType()),
    ("start_ts", T.LongType()),
    ("end_ts", T.LongType()),
    ("status_id", T.IntegerType()),
    ("threshold_len", T.IntegerType()),
    ("threshold_value", T.LongType()),
    ("name_id", T.IntegerType()),
    ("is_decision_span", T.BooleanType()),
    ("decision_value", T.BooleanType()),
    ("flushes", T.IntegerType()),
    ("event_name_id", T.IntegerType()),
    ("attr_code", T.IntegerType()),
    ("event_attr_code", T.IntegerType()),
]


_DECODE_STRUCT = T.StructType([T.StructField(n, t, True) for n, t in DECODED_FIELDS])


def _decode_tokens_np(vals: np.ndarray) -> dict[str, np.ndarray]:
    n = len(vals)
    flat = np.concatenate([np.asarray(v, dtype=np.int32) for v in vals])
    lengths = np.fromiter((len(v) for v in vals), dtype=np.int64, count=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    head_idx = offsets[:-1, None] + np.arange(codec.HEADER_LEN)[None, :]
    return codec.decode_headers(flat[head_idx])


def _decode_to_frame(tokens: pd.Series) -> pd.DataFrame:
    if len(tokens) == 0:
        return pd.DataFrame({n: pd.Series(dtype="object") for n, _ in DECODED_FIELDS})
    d = _decode_tokens_np(tokens.to_numpy())
    out = {}
    for name in ("trace_hi", "trace_lo", "span_id", "parent_span_id", "start_ts", "end_ts"):
        out[name] = d[name].view(np.int64)
    out["status_id"] = d["status_code"]
    out["threshold_len"] = d["threshold_len"]
    out["threshold_value"] = d["threshold_value"].view(np.int64)
    out["name_id"] = d["name_id"]
    out["is_decision_span"] = d["is_decision_span"].astype(bool)
    out["decision_value"] = d["decision_value"].astype(bool)
    out["flushes"] = d["flushes"]
    out["event_name_id"] = d["event_name_id"]
    out["attr_code"] = d["attr_code"]
    out["event_attr_code"] = d["event_attr_code"]
    return pd.DataFrame(out)


def parse_sequences_pandas(df: DataFrame) -> DataFrame:
    """tokens → numeric span fields via a struct-returning Arrow pandas
    UDF (numpy decode). Kept as the reference implementation / test
    oracle for the expression decoder below."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(returnType=_DECODE_STRUCT)
    def _decode(tokens: pd.Series) -> pd.DataFrame:
        return _decode_to_frame(tokens)

    clash = [n for n, _ in DECODED_FIELDS if n in df.columns]
    dec = df.drop(*clash).withColumn("_dec", _decode(F.col("tokens")))
    return dec.select("*", *[F.col(f"_dec.{n}").alias(n) for n, _ in DECODED_FIELDS]).drop("_dec")


def _el(i: int):
    """Header slot i (0-based) as long — element_at is 1-based."""
    return F.element_at(F.col("tokens"), i + 1).cast("long")


def _u64(start: int):
    """4×16-bit big-endian chunks → 64-bit value (signed wrap via shift)."""
    return (
        F.shiftleft(_el(start), 48)
        .bitwiseOR(F.shiftleft(_el(start + 1), 32))
        .bitwiseOR(F.shiftleft(_el(start + 2), 16))
        .bitwiseOR(_el(start + 3))
    )


def parse_sequences(df: DataFrame) -> DataFrame:
    """tokens → numeric span fields, decoded entirely with Catalyst
    expressions (element_at + shifts/ORs over the fixed-width header).

    Zero Python on the hot path: the token payload never leaves the JVM,
    the whole decode lives inside whole-stage codegen, and the stage is a
    narrow map. ``parse_sequences_pandas`` is the vectorized-UDF
    equivalent kept for cross-checking (tests/test_parse.py).
    """
    clash = [n for n, _ in DECODED_FIELDS if n in df.columns]
    out = df.drop(*clash)
    cols = {
        "trace_hi": _u64(2),
        "trace_lo": _u64(6),
        "span_id": _u64(10),
        "parent_span_id": _u64(14),
        "start_ts": _u64(18),
        "end_ts": _u64(22),
        "status_id": _el(26).cast("int"),
        "threshold_len": _el(27).cast("int"),
        "threshold_value": _u64(28),
        "name_id": _el(32).cast("int"),
        "is_decision_span": (_el(33) == 1),
        "decision_value": (_el(34) == 1),
        "flushes": _el(35).cast("int"),
        "event_name_id": _el(36).cast("int"),
        "attr_code": _el(37).cast("int"),
        "event_attr_code": _el(39).cast("int"),
    }
    return out.withColumns(cols)


def _attr_map(code_col: str):
    """attr_code bitmask → map<string,string> via pure exprs."""
    entries = [
        F.when(
            (F.col(code_col).bitwiseAND(F.lit(1 << bit))) != 0,
            F.struct(F.lit(k).alias("key"), F.lit(v).alias("value")),
        )
        for bit, k, v in codec.ATTR_FLAGS
    ]
    return F.map_from_entries(F.filter(F.array(*entries), lambda x: x.isNotNull()))


def _idx_lookup(values: list[str], idx_col, default=None):
    """index → string via array literal element_at (codegen-friendly)."""
    arr = F.array(*[F.lit(v) for v in values])
    got = F.element_at(arr, idx_col + F.lit(1))
    return F.when(idx_col >= 0, got).otherwise(F.lit(default))


def enrich_core(df: DataFrame) -> DataFrame:
    """Hot-path derivations only — integer/boolean exprs, no string or
    map materialization (those cost real CPU per span and are needed only
    by OTTL policies and human-facing surfaces).
    """
    return (
        # root detection per root_spans.go:86-88: empty parent OR parent ==
        # right-8-bytes of the trace id
        df.withColumn(
            "is_root",
            (F.col("parent_span_id") == 0) | (F.col("parent_span_id") == F.col("trace_lo")),
        ).withColumn("flushes", F.when(F.col("flushes") >= 0, F.col("flushes")))
    )


# Resource attributes of the span's service, derived deterministically
# from the source column (the token header carries one resource slot —
# source_id — so the richer resource surface is a fixture assignment,
# the same approach as scope_name/scope_version and kind). Shared by the
# OTTL span context (resource.attributes[...]) and the decider's
# record_decision_from extraction (decider.go:175-188 reads ANY
# configured resource attribute, not just service.name).
RESOURCE_ATTR_KEYS = ("service.name", "service.namespace", "deployment.environment")
_ENVIRONMENTS = ("prod", "staging", "dev")


def resource_attr_expr(key: str, source):
    """Column for resource attribute ``key`` of the service named by the
    ``source`` Column — None when the key is not in the resource model
    (the reference yields "" for an absent attribute)."""
    if key == "service.name":
        return source
    if key == "service.namespace":
        # the team/namespace prefix of the service name ("jira-frontend"
        # → "jira"); sources without a dash pass through whole
        return F.split(source, "-").getItem(0)
    if key == "deployment.environment":
        # deterministic per-service environment fixture; pmod keeps the
        # index non-negative for negative hashes (ANSI abs would throw
        # on LONG_MIN)
        idx = F.pmod(F.xxhash64(source), F.lit(len(_ENVIRONMENTS))).cast("int")
        return F.element_at(F.array(*[F.lit(e) for e in _ENVIRONMENTS]), idx + 1)
    return None


def enrich_spans(df: DataFrame) -> DataFrame:
    """Full span surface: core + string/map fields from numeric codes —
    still pure Catalyst expressions."""
    thr_hex = F.lower(F.lpad(F.hex(F.col("threshold_value")), 14, "0"))
    return (
        enrich_core(df)
        .withColumn("status_code", _idx_lookup(codec.STATUS_CODES, F.col("status_id")))
        .withColumn("name", _idx_lookup(codec.NAMES, F.col("name_id")))
        .withColumn(
            "sampling_tail_threshold",
            F.when(
                F.col("threshold_len") > 0,
                F.concat(F.lit("0x"), thr_hex.substr(F.lit(1), F.col("threshold_len"))),
            ),
        )
        .withColumn("attrs", _attr_map("attr_code"))
        .withColumn("event_name", _idx_lookup(codec.EVENT_NAMES, F.col("event_name_id")))
        # OTTL wave-3 surface (internal/evaluators/ottl.go span context):
        # resource attrs (service.name == the source column, plus the
        # derived fixture attrs — see resource_attr_expr) and span kind
        # (deterministic per-name fixture assignment, codec.NAME_KINDS)
        .withColumn(
            "resource_attrs",
            F.create_map(
                *[
                    c
                    for k in RESOURCE_ATTR_KEYS
                    for c in (F.lit(k), resource_attr_expr(k, F.col("source")))
                ]
            ),
        )
        .withColumn(
            "kind",
            F.coalesce(
                F.when(
                    F.col("name_id") >= 0,
                    F.element_at(
                        F.array(*[F.lit(k) for k in codec.NAME_KINDS]),
                        F.col("name_id") + F.lit(1),
                    ),
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "event_attrs",
            F.when(F.col("event_attr_code") >= 0, _attr_map("event_attr_code")),
        )
        # instrumentation scope (ottlspan context): deterministic per-name
        # fixture, same approach as `kind` (codec.SCOPE_INFO)
        .withColumn("scope_name", _idx_lookup([n for n, _ in codec.SCOPE_INFO], F.col("name_id")))
        .withColumn("scope_version", _idx_lookup([v for _, v in codec.SCOPE_INFO], F.col("name_id")))
    )


def load_and_parse(spark, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    return enrich_spans(parse_sequences(df))
