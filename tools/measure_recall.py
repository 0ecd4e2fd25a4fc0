"""Recall of the approximate (100 TB-scale) dedup/ANN paths vs their
exact oracles, at $SPARK_GRAFT_SF_DIR (default sf0.1).

The 100 TB story rests on the bucketed operators being the scale path;
these numbers make that claim checkable (BENCH/BASELINE.md records them):

* MinHash-LSH (4 bands × 2 rows) candidate recall of the exact
  Jaccard >= 0.5 near-dup pairs (dedup_ngram_jaccard, DF-capped
  shingles) — the standard S-curve says p(candidate) = 1-(1-s^2)^4,
  so >= 0.94 at s = 0.7 and ~0.68 at s = 0.5: expect high-but-not-1
  recall dominated by pairs sitting right at the threshold.
* IVF (8 cells, probe 2) recall@3 vs brute-force cosine top-3.
* SimHash64 pigeonhole banding: candidate-pair ratio vs the all-pairs
  space (selectivity) — the banding is LOSSLESS for ham <= 7 by the
  pigeonhole argument, so recall is 1.0 by construction; selectivity is
  the number that matters.

Run: ``python tools/measure_recall.py`` → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from atlassian_sampling_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))


def main():
    from atlassian_sampling_processor_spark.functions import dataops, dataops2

    if hasattr(os, "sched_setaffinity") and CPUS <= (os.cpu_count() or 32):
        os.sched_setaffinity(0, set(range(CPUS)))
    spark = get_spark(app_name="recall", cores=CPUS, shuffle_partitions=2 * CPUS)
    out = {"sf_dir": SF_DIR}

    # --- MinHash-LSH candidate recall vs exact Jaccard pairs ----------------
    t0 = time.perf_counter()
    exact = dataops.q_dedup_ngram_jaccard(spark, SF_DIR).select("doc_a", "doc_b", "jaccard")
    cand = dataops.q_dedup_minhash_lsh(spark, SF_DIR).select("doc_a", "doc_b")
    n_exact = exact.count()
    n_hit = exact.join(cand, ["doc_a", "doc_b"], "left_semi").count()
    out["lsh_exact_pairs"] = n_exact
    out["lsh_candidate_hits"] = n_hit
    out["lsh_recall"] = round(n_hit / max(n_exact, 1), 4)
    # recall among the comfortably-similar pairs (s >= 0.7), where the
    # S-curve promises >= 0.94
    strong = exact.filter(F.col("jaccard") >= 0.7)
    n_strong = strong.count()
    n_strong_hit = strong.join(cand, ["doc_a", "doc_b"], "left_semi").count()
    out["lsh_recall_jaccard_ge_0.7"] = round(n_strong_hit / max(n_strong, 1), 4)
    out["t_lsh_sec"] = round(time.perf_counter() - t0, 1)

    # --- IVF recall@3 vs brute-force cosine top-3 ---------------------------
    t0 = time.perf_counter()
    brute = (
        dataops.q_embedding_cosine_topk(spark, SF_DIR)
        .filter((F.col("query_id") < 5) & (F.col("rk") <= 3))
        .select("query_id", "neighbor_id")
    )
    ivf = dataops.q_similarity_ivf(spark, SF_DIR).select("query_id", "neighbor_id")
    n_brute = brute.count()
    n_ivf_hit = brute.join(ivf, ["query_id", "neighbor_id"], "left_semi").count()
    out["ivf_exact_neighbors"] = n_brute
    out["ivf_hits"] = n_ivf_hit
    out["ivf_recall_at_3"] = round(n_ivf_hit / max(n_brute, 1), 4)
    out["t_ivf_sec"] = round(time.perf_counter() - t0, 1)

    # --- SimHash64 banding selectivity (recall = 1.0 by pigeonhole) ---------
    t0 = time.perf_counter()
    s = dataops2._simhash64(spark, SF_DIR).cache()
    n_docs = s.count()

    def chunk(i):
        col = "slo" if i < 2 else "shi"
        return F.shiftright(
            F.col(col), dataops2.SIMHASH64_CHUNK_BITS * (i % 2)
        ).bitwiseAND(F.lit(dataops2.SIMHASH64_CHUNK_MASK))

    t = s.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("ci"), chunk(i).alias("cv"))
                for i in range(dataops2.SIMHASH64_CHUNKS)
            ])
        ).alias("ch"),
    ).select("doc_id", "ch.ci", "ch.cv")
    n_cand = (
        t.alias("a")
        .join(
            t.alias("b"),
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    n_pairs = dataops2.q_simhash64_pairs(spark, SF_DIR).count()
    all_pairs = n_docs * (n_docs - 1) // 2
    out["simhash64_docs"] = n_docs
    out["simhash64_candidates"] = n_cand
    out["simhash64_final_pairs"] = n_pairs
    out["simhash64_candidate_ratio"] = round(n_cand / max(all_pairs, 1), 6)
    out["t_simhash64_sec"] = round(time.perf_counter() - t0, 1)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
