"""Structured-Streaming front-end at bench scale (round-3 item):

Runs the SAME bench corpus (default 3M traces / ~12.6M sequences)
through (a) the batch driver loop and (b) the Structured Streaming
file-source + foreachBatch front-end (streaming.py), asserts sink
equality via per-(sink, reason) counts plus an order-insensitive XOR
fingerprint over (doc_id, tokens, reason), and reports throughput for
both. Extends tests/test_streaming.py's small-scale byte-equality to
the corpus size the headline bench uses.

Run: ``python tools/bench_streaming.py`` → one JSON line.
Env: ASP_BENCH_TRACES (default 3M), SPARK_GRAFT_CPUS (default 16).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRACES = int(os.environ.get("ASP_BENCH_TRACES", 3_000_000))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
N_BATCHES = 2

POLICIES = [
    {"name": "errors", "type": "status_code", "status_code": {"status_codes": ["ERROR"]}},
    {"name": "big", "type": "span_count", "span_count": {"min_spans": 12}},
    {"name": "pct10", "type": "probabilistic", "probabilistic": {"sampling_percentage": 10}},
]


def engine_conf():
    from atlassian_sampling_processor_spark.config import EngineConfig

    return EngineConfig(
        primary_cache_size=max(20_000, N_TRACES // 4),
        secondary_cache_size=max(2_000, N_TRACES // 40),
        sampled_cache_size=10 * N_TRACES,
        non_sampled_cache_size=10 * N_TRACES,
    )


def fingerprint(spark, pipe) -> dict:
    """Per-(sink, reason) counts + XOR-of-hashes over the routed rows —
    order-insensitive, overflow-free (xor), cheap at 12.6M rows."""
    from pyspark.sql import functions as F

    out = {}
    for sink in ("keep", "drop", "low_priority"):
        df = pipe.read_sink(sink)
        rows = (
            df.groupBy("reason")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(doc_id, tokens, reason))").alias("fp"),
            )
            .collect()
        )
        out[sink] = {r["reason"]: (int(r["n"]), int(r["fp"] or 0)) for r in rows}
    return out


def main():
    from pyspark.sql import functions as F

    from atlassian_sampling_processor_spark import datagen
    from atlassian_sampling_processor_spark.config import parse_policies
    from atlassian_sampling_processor_spark.pipeline import SamplingPipeline
    from atlassian_sampling_processor_spark.session import get_spark
    from atlassian_sampling_processor_spark.streaming import run_streaming, stream_sequences

    if hasattr(os, "sched_setaffinity") and CPUS <= (os.cpu_count() or 32):
        os.sched_setaffinity(0, set(range(CPUS)))
    corpus = f"/tmp/asp_bench_corpus/v2_sf0.1_t{N_TRACES}/seq.parquet"
    if not os.path.exists(corpus):
        datagen.generate_sequences_parquet(
            corpus, n_traces=N_TRACES, seed=42, n_batches=N_BATCHES, decision_span_frac=0.005
        )
    work = os.environ.get("ASP_BENCH_WORKDIR", "/dev/shm/asp_bench") + f"/stream_{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(
        app_name="stream-bench", cores=CPUS, shuffle_partitions=3 * CPUS,
        extra_conf={
            "spark.local.dir": work + "/tmp",
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={CPUS} -XX:+UseParallelGC",
        },
    )
    seqs = spark.read.parquet(corpus)
    n_rows = seqs.count()

    # --- batch driver loop ---------------------------------------------------
    pipe_b = SamplingPipeline(
        spark, parse_policies(POLICIES), engine_conf(),
        checkpoint_dir=f"{work}/ck_b", output_dir=f"{work}/out_b",
    )
    t0 = time.perf_counter()
    pipe_b.run(seqs, n_batches=N_BATCHES)
    wall_b = time.perf_counter() - t0

    # --- streaming front-end: ONE file per arrival batch — the file
    # source counts part-files, so an uncoalesced write would shred each
    # arrival slice into ~100 tiny epochs and legitimately change
    # eviction timing (measured: sinks diverge) -------------------------------
    stream_in = f"{work}/stream_in"
    for b in range(N_BATCHES):
        seqs.filter(F.col("batch_idx") == b).coalesce(1).write.mode("overwrite").parquet(
            f"{stream_in}/b{b}.parquet"
        )
    pipe_s = SamplingPipeline(
        spark, parse_policies(POLICIES), engine_conf(),
        checkpoint_dir=f"{work}/ck_s", output_dir=f"{work}/out_s",
    )
    stream = stream_sequences(spark, f"{stream_in}/*", max_files_per_trigger=1)
    t0 = time.perf_counter()
    run_streaming(pipe_s, stream)
    wall_s = time.perf_counter() - t0

    fb, fs = fingerprint(spark, pipe_b), fingerprint(spark, pipe_s)
    equal = fb == fs
    out = {
        "metric": "streaming front-end throughput at bench scale",
        "rows": n_rows,
        "cpus": CPUS,
        "batch_wall_sec": round(wall_b, 1),
        "batch_seq_per_sec": round(n_rows / wall_b, 1),
        "streaming_wall_sec": round(wall_s, 1),
        "streaming_seq_per_sec": round(n_rows / wall_s, 1),
        "sinks_equal": equal,
    }
    if not equal:
        for sink in fb:
            if fb[sink] != fs[sink]:
                out[f"mismatch_{sink}"] = {
                    "batch": {k: v for k, v in fb[sink].items() if fs[sink].get(k) != v},
                    "stream": {k: v for k, v in fs[sink].items() if fb[sink].get(k) != v},
                }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    if not equal:
        sys.exit(1)


if __name__ == "__main__":
    main()
