"""Skew-handling aggregation utilities (north rule: two-phase salted
aggregation on hot keys).

A Zipf-skewed group key (`source` in the corpus, FIXTURES.md §1) makes a
plain groupBy land most rows in one reducer. ``salted_agg`` splits each
key into ``buckets`` salted sub-keys (phase 1: partial agg with
map-side combine per sub-key), then re-aggregates per original key
(phase 2: tiny shuffle — at most keys×buckets rows). The result is
identical to the plain groupBy; only the shuffle shape changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    partial_aggs: list[tuple[Column, str]],
    final_aggs: list[tuple[Column, str]],
    buckets: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase aggregation over a skewed ``key``.

    partial_aggs: aggregate expressions for phase 1, with aliases.
    final_aggs: re-aggregation expressions over the phase-1 aliases.
    salt_from: a high-cardinality column used to derive the salt
               deterministically (defaults to a spray over all columns).
    """
    salt_src = F.col(salt_from) if salt_from else F.concat_ws("\x1f", *df.columns)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(buckets)))
    phase1 = salted.groupBy(key, "_salt").agg(*[c.alias(a) for c, a in partial_aggs])
    return phase1.groupBy(key).agg(*[c.alias(a) for c, a in final_aggs])


def salted_sum_count(df: DataFrame, key: str, value: Column, buckets: int = 16) -> DataFrame:
    """Common case: sum(value) + count(*) per skewed key."""
    return salted_agg(
        df,
        key,
        partial_aggs=[(F.sum(value), "_s"), (F.count(F.lit(1)), "_c")],
        final_aggs=[(F.sum("_s"), "total"), (F.sum("_c"), "n")],
        buckets=buckets,
    )
