"""sf1 steady-state soak: 126M sequences in 12 batches at
reference-realistic cache caps (10^7 decisions, 10^5 pending).

Everything else is measured at sf0.1 / 2 batches; this is the direct
evidence for the "per-batch cost is O(batch + delta), not O(history)"
claim at a decision history well past the cache capacity and a pending
cache that is permanently full (the reference's steady state). Expected
shape: per-batch wall FLAT after the first batches (page-cache +
JIT warmup), decision/pending state sizes pinned at their caps,
peak JVM RSS bounded.

Run: ``python tools/soak_sf1.py`` (env: ASP_SOAK_TRACES, ASP_SOAK_BATCHES,
SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM). Prints ONE JSON line; per-batch
walls stream to stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRACES = int(os.environ.get("ASP_SOAK_TRACES", 30_000_000))
N_BATCHES = int(os.environ.get("ASP_SOAK_BATCHES", 12))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

# reference-realistic caps (README.md:65-77 discusses 10^7-10^8 decision
# caches; pending is orders of magnitude smaller — eviction IS the
# decision timeout)
PRIMARY_CAP = 100_000
SECONDARY_CAP = 10_000
DECISION_CAP = 10_000_000

POLICIES = [
    {"name": "errors", "type": "status_code", "status_code": {"status_codes": ["ERROR"]}},
    {"name": "big", "type": "span_count", "span_count": {"min_spans": 12}},
    {"name": "slow", "type": "latency", "latency": {"threshold_ms": 30000}},
    {"name": "otep", "type": "threshold"},
    {"name": "pct10", "type": "probabilistic", "probabilistic": {"sampling_percentage": 10}},
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class RssSampler(threading.Thread):
    """Peak RSS of every java/python process in this session (the JVM is
    a child process in local mode — driver-side psutil misses it)."""

    def __init__(self):
        super().__init__(daemon=True)
        self.peak_kb = 0
        self.stop = False

    def run(self):
        me = os.getpid()
        while not self.stop:
            try:
                out = subprocess.run(
                    ["ps", "-o", "rss=,comm=,ppid=", "-e"],
                    capture_output=True, text=True,
                ).stdout
                total = 0
                for line in out.splitlines():
                    parts = line.split()
                    if len(parts) >= 3 and parts[1] in ("java", "python", "python3"):
                        total += int(parts[0])
                self.peak_kb = max(self.peak_kb, total)
            except Exception:
                pass
            time.sleep(3)
        _ = me


def main():
    corpus = f"/tmp/asp_bench_corpus/v2_sf1_t{N_TRACES}_b{N_BATCHES}/seq.parquet"
    if not os.path.exists(corpus):
        from atlassian_sampling_processor_spark import datagen

        log(f"generating soak corpus: {N_TRACES} traces / {N_BATCHES} batches → {corpus}")
        t0 = time.perf_counter()
        datagen.generate_sequences_parquet(
            corpus, n_traces=N_TRACES, seed=42, n_batches=N_BATCHES,
            decision_span_frac=0.005,
        )
        log(f"corpus generated in {time.perf_counter() - t0:.0f}s")

    if hasattr(os, "sched_setaffinity") and CPUS <= (os.cpu_count() or 32):
        os.sched_setaffinity(0, set(range(CPUS)))

    from pyspark.sql import functions as F

    from atlassian_sampling_processor_spark.config import EngineConfig, parse_policies
    from atlassian_sampling_processor_spark.pipeline import SamplingPipeline
    from atlassian_sampling_processor_spark.session import get_spark

    work = os.environ.get("ASP_BENCH_WORKDIR", "/dev/shm/asp_bench") + f"/soak_{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(
        app_name="asp-soak-sf1", cores=CPUS, shuffle_partitions=3 * CPUS,
        extra_conf={
            "spark.local.dir": work + "/tmp",
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={CPUS} -XX:+UseParallelGC",
        },
    )
    seqs = spark.read.parquet(corpus)
    n_rows = seqs.count()
    pipe = SamplingPipeline(
        spark,
        parse_policies(POLICIES),
        EngineConfig(
            primary_cache_size=PRIMARY_CAP,
            secondary_cache_size=SECONDARY_CAP,
            sampled_cache_size=DECISION_CAP,
            non_sampled_cache_size=DECISION_CAP,
            shards=CPUS,
        ),
        checkpoint_dir=f"{work}/ckpt",
        output_dir=f"{work}/out",
    )
    sampler = RssSampler()
    sampler.start()
    walls, pend_sizes, dec_sizes = [], [], []
    t_all = time.perf_counter()
    for b in range(N_BATCHES):
        t0 = time.perf_counter()
        res = pipe.process_batch(seqs.filter(F.col("batch_idx") == b), b)
        walls.append(round(time.perf_counter() - t0, 2))
        pend_sizes.append(res.pending_traces)
        meta = pipe.store.last_meta()
        dec_sizes.append(meta.get("dec_sampled", 0) + meta.get("dec_not_sampled", 0))
        log(f"batch {b}: {walls[-1]}s kept={res.kept} evicted={res.evicted_traces} "
            f"pending={res.pending_traces} decisions={dec_sizes[-1]} "
            f"peak_rss_gb={sampler.peak_kb / 1_048_576:.1f}")
    wall_total = time.perf_counter() - t_all
    sampler.stop = True

    # steady-state flatness: compare the mean of the last 4 batches to
    # batches 2-5 (post-warmup) — the O(history) failure mode would show
    # the tail growing with the 10^7-decision history
    mid = sum(walls[2:6]) / 4
    tail = sum(walls[-4:]) / 4
    out = {
        "metric": "sf1 steady-state soak per-batch wall",
        "rows": n_rows,
        "n_batches": N_BATCHES,
        "cpus": CPUS,
        "caps": {"primary": PRIMARY_CAP, "secondary": SECONDARY_CAP,
                 "decision_each": DECISION_CAP},
        "batch_wall_sec": walls,
        "wall_total_sec": round(wall_total, 1),
        "seq_per_sec": round(n_rows / wall_total, 1),
        "pending_sizes": pend_sizes,
        "decision_sizes": dec_sizes,
        "tail_over_mid_ratio": round(tail / mid, 3),
        "peak_rss_gb": round(sampler.peak_kb / 1_048_576, 2),
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
