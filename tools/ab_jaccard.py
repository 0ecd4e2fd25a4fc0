"""Same-session A/B of dedup_ngram_jaccard at the DRIVER's operating
point (unpinned local[32], sf0.1) — round-3 verdict follow-up: the
builder's pinned-16 A/B measured the shingle-cache reclaim at
4.55 → 3.12 s, but the driver bench read flat (~4.6 s). This pins down
whether the difference is config (32 unpinned cores) or code.

A = round-3 shape (explode cached once, DF-filter join cached);
B = round-2 shape (no caching — the explode runs twice).
Interleaved A B A B A B in one session; first pair discarded as warmup.

Run: ``python tools/ab_jaccard.py`` → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from atlassian_sampling_processor_spark.functions.dataops import (  # noqa: E402
    JACCARD_THRESHOLD,
    MAX_SHINGLE_DF,
    _shingles,
    docs,
    q_dedup_ngram_jaccard,
)
from atlassian_sampling_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))  # driver config: unpinned 32
ROUNDS = 3


def q_jaccard_r2_shape(spark, sf_dir):
    """The round-2 plan: identical logic, NO caching — the shingle
    explode is recomputed by every consumer."""
    raw = _shingles(docs(spark, sf_dir))
    df_ok = (
        raw.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= MAX_SHINGLE_DF)
        .select("shingle")
    )
    sh = raw.join(df_ok, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    j = pairs.join(sa, "doc_a").join(sb, "doc_b")
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return j.filter(jac >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


def run(fn, spark):
    t0 = time.perf_counter()
    n = fn(spark, SF_DIR).count()
    spark.catalog.clearCache()
    return time.perf_counter() - t0, n


def main():
    spark = get_spark(app_name="ab-jaccard", cores=CPUS, shuffle_partitions=CPUS)
    walls = {"A_r3_cached": [], "B_r2_nocache": []}
    rows = None
    for i in range(ROUNDS):
        ta, na = run(q_dedup_ngram_jaccard, spark)
        tb, nb = run(q_jaccard_r2_shape, spark)
        assert na == nb
        rows = na
        walls["A_r3_cached"].append(round(ta, 2))
        walls["B_r2_nocache"].append(round(tb, 2))
        print(f"round {i}: A={ta:.2f}s B={tb:.2f}s", file=sys.stderr)
    # drop the warmup pair
    a, b = walls["A_r3_cached"][1:], walls["B_r2_nocache"][1:]
    out = {
        "metric": "dedup_ngram_jaccard wall, r3 vs r2 shape (same session)",
        "sf_dir": SF_DIR, "cpus": CPUS, "rows": rows,
        "walls": walls,
        "A_r3_avg_warm_sec": round(sum(a) / len(a), 2),
        "B_r2_avg_warm_sec": round(sum(b) / len(b), 2),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
