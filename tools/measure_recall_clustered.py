"""IVF recall on CLUSTERED embeddings — the operator's actual selling
point, measured.

The driver's synthetic `embeddings` table is unstructured (top-1 cosine
≈ 0.4 ≈ random), so ANN recall there is information-bounded by the scan
fraction — the round-3 caveat. This bench replaces the caveat with a
measurement: plant Gaussian clusters (datagen.
generate_clustered_embeddings_parquet), train the IVF coarse quantizer
with k-means on a sample (dataops.kmeans_centroids), and report
recall@10 vs the exact numpy cosine top-10 at probe 1/2/4 of 8 cells,
plus the measured scan fraction (candidates probed / corpus).

Run: ``python tools/measure_recall_clustered.py`` → one JSON line
(env: ASP_CLU_VECS, ASP_CLU_QUERIES, ASP_BENCH_WORKDIR).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from atlassian_sampling_processor_spark.datagen import (  # noqa: E402
    generate_clustered_embeddings_parquet,
)
from atlassian_sampling_processor_spark.functions.dataops import (  # noqa: E402
    ivf_topk_df,
    kmeans_centroids,
)
from atlassian_sampling_processor_spark.session import get_spark  # noqa: E402

N_VECS = int(os.environ.get("ASP_CLU_VECS", 20_000))
N_QUERIES = int(os.environ.get("ASP_CLU_QUERIES", 50))
N_CELLS = 8
K = 10
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))


def main():
    work = os.environ.get("ASP_BENCH_WORKDIR", "/dev/shm/asp_bench") + f"/clu_{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    path = generate_clustered_embeddings_parquet(
        f"{work}/embeddings.parquet", n_vecs=N_VECS
    )
    if hasattr(os, "sched_setaffinity") and CPUS <= (os.cpu_count() or 32):
        os.sched_setaffinity(0, set(range(CPUS)))
    spark = get_spark(app_name="clu-recall", cores=CPUS, shuffle_partitions=2 * CPUS)

    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    vecs = np.stack(tbl.column("embedding").to_numpy(zero_copy_only=False)).astype(
        np.float64
    )

    # exact oracle: numpy cosine top-K per query (vectors are unit-norm,
    # so dot == cosine)
    q = vecs[:N_QUERIES]
    sims = q @ vecs.T
    np.fill_diagonal(sims[:, :N_QUERIES], -np.inf)  # exclude self
    exact = {
        qi: set(np.argsort(-sims[qi])[:K].tolist()) for qi in range(N_QUERIES)
    }

    # quantizer trained on a 5k sample (faiss-style)
    t0 = time.perf_counter()
    cents = kmeans_centroids(vecs[:: max(1, len(vecs) // 5000)], N_CELLS, seed=3)
    t_train = time.perf_counter() - t0

    e = (
        spark.read.parquet(path)
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .cache()
    )
    # cell sizes → scan fraction per probe count
    out = {
        "n_vecs": N_VECS, "n_queries": N_QUERIES, "n_cells": N_CELLS, "k": K,
        "t_kmeans_sec": round(t_train, 2), "rows": [],
    }
    for n_probe in (1, 2, 4):
        t0 = time.perf_counter()
        got = ivf_topk_df(e, cents, n_probe=n_probe, k=K, n_queries=N_QUERIES)
        hits, probed = 0, 0
        per_q = {}
        for r in got.collect():
            per_q.setdefault(r.query_id, set()).add(r.neighbor_id)
        for qi, want in exact.items():
            hits += len(want & per_q.get(qi, set()))
        recall = hits / (K * N_QUERIES)
        out["rows"].append(
            {
                "n_probe": n_probe,
                "scan_fraction": round(n_probe / N_CELLS, 3),
                "recall_at_10": round(recall, 4),
                "t_sec": round(time.perf_counter() - t0, 1),
            }
        )
        print(f"probe {n_probe}/{N_CELLS}: recall@10 = {recall:.4f}", file=sys.stderr)
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
