"""Hot-trace skew bench (north rule's skew clause).

Generates a corpus where ONE doc_id carries a large fraction of all
spans (datagen ``hot_trace_frac``) and runs the pipeline with
``salt_buckets=0`` vs ``salt_buckets=32``, measuring wall.

Scale equivalence: at 1000 executors a key holding 1% of the corpus is
~10x a partition's fair share. Locally with ~3x CPUS shuffle partitions
the same RATIO needs a hotter key, so the default is
``hot_trace_frac=0.2`` (≈10x fair share at 48 partitions) — same
skew-to-partition ratio the rule's 1%-at-cluster-scale case produces.

What to expect (and what the numbers check): every aggregate in
``aggregate_batch`` is decomposable, so Catalyst's map-side partial
aggregation crushes agg-side skew WITHOUT salting; the exposure left is
the post-decision routing join, which AQE's skew-join splitting handles
when the decided side is too big to broadcast. ``salt_buckets`` is the
explicit two-phase answer for agg paths partial aggregation can't crush
(e.g. aggregates added by future policies that aren't decomposable).
The bench reports both configs on the hot corpus plus the no-hot-key
baseline, so the flat-wall claim is measured, not asserted.

Run: ``python tools/bench_skew.py`` → one JSON line.
Env: ASP_SKEW_TRACES (default 750k), ASP_SKEW_HOT (default 0.2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRACES = int(os.environ.get("ASP_SKEW_TRACES", 750_000))
HOT_FRAC = float(os.environ.get("ASP_SKEW_HOT", 0.2))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
N_BATCHES = 2

POLICIES = [
    {"name": "errors", "type": "status_code", "status_code": {"status_codes": ["ERROR"]}},
    {"name": "big", "type": "span_count", "span_count": {"min_spans": 12}},
    {"name": "pct10", "type": "probabilistic", "probabilistic": {"sampling_percentage": 10}},
]


def run_once(spark, corpus: str, salt_buckets: int, tag: str) -> dict:
    from atlassian_sampling_processor_spark.config import EngineConfig, parse_policies
    from atlassian_sampling_processor_spark.pipeline import SamplingPipeline

    work = os.environ.get("ASP_BENCH_WORKDIR", "/dev/shm/asp_bench") + f"/skew_{tag}_{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    seqs = spark.read.parquet(corpus)
    pipe = SamplingPipeline(
        spark,
        parse_policies(POLICIES),
        EngineConfig(
            primary_cache_size=max(20_000, N_TRACES // 4),
            secondary_cache_size=max(2_000, N_TRACES // 40),
            sampled_cache_size=10 * N_TRACES,
            non_sampled_cache_size=10 * N_TRACES,
            salt_buckets=salt_buckets,
        ),
        checkpoint_dir=f"{work}/ckpt",
        output_dir=f"{work}/out",
    )
    t0 = time.perf_counter()
    results = pipe.run(seqs, n_batches=N_BATCHES)
    wall = time.perf_counter() - t0
    kept = sum(r.kept for r in results)
    shutil.rmtree(work, ignore_errors=True)
    return {"wall_sec": round(wall, 2), "kept": kept}


def gen(path: str, hot: float) -> str:
    from atlassian_sampling_processor_spark import datagen

    if not os.path.exists(path):
        print(f"generating {path} (hot={hot})", file=sys.stderr)
        datagen.generate_sequences_parquet(
            path, n_traces=N_TRACES, seed=42, n_batches=N_BATCHES, hot_trace_frac=hot
        )
    return path


def main():
    from atlassian_sampling_processor_spark.session import get_spark

    if hasattr(os, "sched_setaffinity") and CPUS <= (os.cpu_count() or 32):
        os.sched_setaffinity(0, set(range(CPUS)))
    base = f"/tmp/asp_bench_corpus/skew_t{N_TRACES}"
    hot_corpus = gen(f"{base}_h{HOT_FRAC}/seq.parquet", HOT_FRAC)
    flat_corpus = gen(f"{base}_h0/seq.parquet", 0.0)
    spark = get_spark(
        app_name="skew-bench", cores=CPUS, shuffle_partitions=3 * CPUS,
        extra_conf={
            "spark.local.dir": os.environ.get("ASP_BENCH_WORKDIR", "/dev/shm/asp_bench"),
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={CPUS} -XX:+UseParallelGC",
        },
    )
    out = {
        "n_traces": N_TRACES,
        "hot_trace_frac": HOT_FRAC,
        "cpus": CPUS,
        "flat_salt0": run_once(spark, flat_corpus, 0, "flat0"),
        "hot_salt0": run_once(spark, hot_corpus, 0, "hot0"),
        "hot_salt32": run_once(spark, hot_corpus, 32, "hot32"),
    }
    # identical routing counts = the salted two-phase agg is exact
    out["salt_result_parity"] = out["hot_salt0"]["kept"] == out["hot_salt32"]["kept"]
    out["hot_penalty_salt0"] = round(
        out["hot_salt0"]["wall_sec"] / out["flat_salt0"]["wall_sec"], 3
    )
    out["hot_penalty_salt32"] = round(
        out["hot_salt32"]["wall_sec"] / out["flat_salt0"]["wall_sec"], 3
    )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
