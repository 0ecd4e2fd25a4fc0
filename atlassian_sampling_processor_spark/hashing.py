"""Bit-exact FNV-1a64 trace-id hashing for the probabilistic policies.

Semantics match the reference's probabilistic evaluator
(internal/evaluators/probabilistic.go:34-71): the hash is FNV-1a64 over
``salt_bytes ‖ 16 raw trace-id bytes``; a trace is Sampled when
``hash <= uint64(ratio * MaxUint64)`` (inclusive). The threshold is
computed with exact integer math (Go uses big.Float; Python ints are
exact too, with the same saturation at [0, 2^64−1] for out-of-range
rates, matching probabilistic_test.go's −50%→0 / 150%→100 cases).

The per-row hash is a vectorized pandas UDF over the two signed-int64
halves of the trace id (numpy uint64 modular arithmetic — no per-row
Python). Unsigned ``hash <= threshold`` comparison is then done JVM-side
by XOR-ing both sides with 2^63 (order-preserving signed mapping), so
only the hash itself crosses the Python boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

FNV_OFFSET = 14695981039346656037  # FNV-1a 64 offset basis
FNV_PRIME = 1099511628211
MASK64 = (1 << 64) - 1
DEFAULT_HASH_SALT = "default-hash-seed"  # probabilistic.go:20-22


def fnv1a64(data: bytes, h: int = FNV_OFFSET) -> int:
    """Scalar FNV-1a64 (reference for tests and salt prefixing)."""
    for b in data:
        h = ((h ^ b) * FNV_PRIME) & MASK64
    return h


def calculate_threshold(ratio: float) -> int:
    """ratio ∈ ℝ → uint64 threshold, exact big-int math with saturation
    (probabilistic.go:55-62)."""
    from fractions import Fraction

    if ratio != ratio:  # NaN
        return 0
    val = int(Fraction(ratio) * MASK64) if np.isfinite(ratio) else (MASK64 if ratio > 0 else 0)
    return min(max(val, 0), MASK64)


def _hash_batch(hi: np.ndarray, lo: np.ndarray, h0: int) -> np.ndarray:
    """Vectorized FNV-1a64 over the 16 big-endian id bytes, seeded with
    the salt-prefix hash h0. uint64 modular arithmetic throughout."""
    h = np.full(len(hi), np.uint64(h0), dtype=np.uint64)
    prime = np.uint64(FNV_PRIME)
    ff = np.uint64(0xFF)
    for word in (hi.astype(np.int64).view(np.uint64), lo.astype(np.int64).view(np.uint64)):
        for byte_i in range(8):
            shift = np.uint64(8 * (7 - byte_i))
            b = (word >> shift) & ff
            h = (h ^ b) * prime
    return h


def fnv_hash_column(salt: str) -> Column:
    """Column factory: (trace_hi, trace_lo) → signed-int64 FNV-1a64 hash.

    One Arrow-batched UDF per distinct salt; probabilistic policies that
    share a salt share the column.
    """
    h0 = fnv1a64(salt.encode("utf-8"))

    @pandas_udf("long")
    def _fnv(hi: pd.Series, lo: pd.Series) -> pd.Series:
        out = _hash_batch(hi.to_numpy(), lo.to_numpy(), h0)
        return pd.Series(out.view(np.int64))

    return _fnv(F.col("trace_hi"), F.col("trace_lo"))


def fnv1a64_string_column(c: Column) -> Column:
    """String column → signed-int64 FNV-1a64 over its UTF-8 bytes (the
    OTTL ``FNV`` converter, ottlfuncs func_fnv: ``int64(h.Sum64())``).

    Arrow-batched; the per-row byte loop is Python (variable-length
    input, unlike the fixed 16-byte trace-id fast path above) — fine for
    policy evaluation columns, keep off per-token hot paths. NULL in →
    NULL out (the converter's error_column flags it separately)."""

    @pandas_udf("long")
    def _fnv_str(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            h = fnv1a64(v.encode("utf-8"))
            return h - (1 << 64) if h >= (1 << 63) else h

        return s.map(one).astype("Int64")

    return _fnv_str(c)


M32 = (1 << 32) - 1


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Scalar murmur3 x86 32-bit (Austin Appleby's reference; what Go's
    github.com/spaolacci/murmur3 Sum32 computes) — the OTTL
    ``Murmur3Hash`` converter and its test oracle."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & M32
    nblocks = len(data) // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * c1) & M32
        k = ((k << 15) | (k >> 17)) & M32
        k = (k * c2) & M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & M32
        h = (h * 5 + 0xE6546B64) & M32
    k = 0
    tail = data[4 * nblocks :]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & M32
        k = ((k << 15) | (k >> 17)) & M32
        k = (k * c2) & M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M32
    h ^= h >> 16
    return h


def murmur3_32_string_column(c: Column) -> Column:
    """String column → int64 of the uint32 murmur3 sum (seed 0), the
    contrib ``Murmur3Hash`` converter. Arrow-batched like the FNV string
    kernel; NULL in → NULL out (error_column flags nil separately)."""

    @pandas_udf("long")
    def _mmh(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None if v is None else murmur3_32(v.encode("utf-8"))
        ).astype("Int64")

    return _mmh(c)


def unsigned_lte(signed_col: Column, unsigned_threshold: int) -> Column:
    """uint64(signed_col) <= unsigned_threshold, evaluated JVM-side.

    XOR with 2^63 maps uint64 order onto int64 order.
    """
    flip = 1 << 63
    return signed_col.bitwiseXOR(F.lit(-flip)) <= F.lit(unsigned_threshold - flip)


def hash_trace_id(salt: str, hi: int, lo: int) -> int:
    """Scalar helper mirroring probabilistic.go:65-71 (tests/oracles)."""
    id_bytes = (hi & MASK64).to_bytes(8, "big") + (lo & MASK64).to_bytes(8, "big")
    return fnv1a64(id_bytes, fnv1a64(salt.encode("utf-8")))
