"""FNV-1a64 probabilistic sampler parity (probabilistic_test.go:22-97):
effective rate within ±0.2 pp over 100k seeded trace IDs, plus bit-exact
hash vectors and the unsigned-compare trick through Spark.
"""

import numpy as np
import pytest

from atlassian_sampling_processor_spark import decision as D
from atlassian_sampling_processor_spark import hashing
from atlassian_sampling_processor_spark.hashing import (
    _hash_batch,
    calculate_threshold,
    fnv1a64,
    hash_trace_id,
)
from atlassian_sampling_processor_spark.policies import Probabilistic, RemoteProbabilistic
from atlassian_sampling_processor_spark.policies.base import hash_col_name

from .conftest import merged_df


def test_fnv_known_vectors():
    # standard FNV-1a64 test vectors
    assert fnv1a64(b"") == 0xCBF29CE484222325
    assert fnv1a64(b"a") == 0xAF63DC4C8601EC8C
    assert fnv1a64(b"foobar") == 0x85944171F73967E8


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(7)
    hi = rng.integers(-(1 << 62), 1 << 62, size=500, dtype=np.int64)
    lo = rng.integers(-(1 << 62), 1 << 62, size=500, dtype=np.int64)
    h0 = fnv1a64(hashing.DEFAULT_HASH_SALT.encode())
    vec = _hash_batch(hi, lo, h0)
    for i in range(0, 500, 37):
        assert int(vec[i]) == hash_trace_id(hashing.DEFAULT_HASH_SALT, int(hi[i]), int(lo[i]))


def test_calculate_threshold_saturation():
    assert calculate_threshold(-0.5) == 0
    assert calculate_threshold(1.5) == (1 << 64) - 1
    assert calculate_threshold(1.0) == (1 << 64) - 1
    assert calculate_threshold(0.0) == 0


@pytest.mark.parametrize(
    "pct,salt",
    [(100.0, ""), (0.0, ""), (25.0, ""), (33.0, ""), (33.0, "custom-salt"), (-50.0, ""), (150.0, "")],
)
def test_statistical_rate(pct, salt):
    """±0.2 pp absolute over 100k seeded ids (numpy path — the exact code
    the pandas UDF runs)."""
    rng = np.random.default_rng(1)
    hi = rng.integers(0, 1 << 63, size=100_000, dtype=np.int64)
    lo = rng.integers(0, 1 << 63, size=100_000, dtype=np.int64)
    use_salt = salt or hashing.DEFAULT_HASH_SALT
    h = _hash_batch(hi, lo, fnv1a64(use_salt.encode()))
    thr = np.uint64(calculate_threshold(pct / 100.0))
    rate = float((h <= thr).mean()) * 100.0
    expected = min(max(pct, 0.0), 100.0)
    assert abs(rate - expected) <= 0.2


def test_probabilistic_through_spark(spark):
    """End-to-end through the pandas UDF + unsigned_lte expression."""
    rng = np.random.default_rng(3)
    n = 20_000
    hi = rng.integers(0, 1 << 63, size=n, dtype=np.int64)
    lo = rng.integers(0, 1 << 63, size=n, dtype=np.int64)
    rows = [dict(doc_id=f"{i:032x}", trace_hi=int(hi[i]), trace_lo=int(lo[i])) for i in range(n)]
    pol = Probabilistic(name="prob", sampling_percentage=25.0)
    df = merged_df(spark, rows)
    from atlassian_sampling_processor_spark.aggregate import with_hash_columns

    df = with_hash_columns(df, [pol])
    sampled = df.select(pol.decision().alias("d")).where(f"d = {D.SAMPLED}").count()
    rate = sampled / n * 100
    assert abs(rate - 25.0) <= 1.0  # wider tolerance at 20k

    # spot-check 50 rows bit-exactly against the scalar Go-equivalent
    got = df.select("trace_hi", "trace_lo", hash_col_name(pol.hash_salt)).limit(50).collect()
    for r in got:
        expect = hash_trace_id(pol.hash_salt, r.trace_hi, r.trace_lo)
        assert r[2] % (1 << 64) == expect


def test_remote_probabilistic_fallbacks(spark):
    base = dict(trace_hi=123456789, trace_lo=-987654321)

    def eval_pol(pol):
        from atlassian_sampling_processor_spark.aggregate import with_hash_columns

        df = with_hash_columns(merged_df(spark, [base]), [pol])
        return df.select(pol.decision().alias("d")).collect()[0].d

    # getter errors → default rate used (remote_probabilistic.go:81-90)
    def boom():
        raise RuntimeError("remote down")

    assert eval_pol(RemoteProbabilistic(name="r", default_rate=100.0, rate_getter=boom)) == D.SAMPLED
    assert eval_pol(RemoteProbabilistic(name="r", default_rate=0.0, rate_getter=boom)) == D.PENDING
    # negative remote rate invalid → default
    assert (
        eval_pol(RemoteProbabilistic(name="r", default_rate=100.0, rate_getter=lambda: -1.0))
        == D.SAMPLED
    )
    # valid remote rate wins over default
    assert (
        eval_pol(RemoteProbabilistic(name="r", default_rate=0.0, rate_getter=lambda: 100.0))
        == D.SAMPLED
    )
