"""Evidence that decision-cache EVICTION is O(1)-per-batch in capacity.

Round 3 ranked the full decision chain on every overflow batch —
O(capacity) reads in the steady state the reference runs in permanently
at its 10^7–10^8 decision-cache sizes (README.md:65-77,
processor.go:142-148). Round 4 replaces the rank with FIFO-by-epoch
eviction (decisions are immutable + never recency-refreshed, so LRU
order ≡ insertion order): whole epochs fall off via a driver-side
watermark (no job), and only a boundary-epoch partial eviction runs a
job that reads ONE epoch (~per-batch insert count), never the capacity.

This bench builds the steady-state shape at several capacities — a
compacted epoch-partitioned base of C rows in C/DELTA epochs of DELTA
rows each — then measures the overflow-batch wall (epoch append + plan +
partial evict + evmeta) and, for contrast, the round-3-shaped full rank
at the same capacity. Flat left column, growing right column.

Run: ``python tools/bench_decision_evict.py`` (env: ASP_EVICT_CAPS
comma-list, ASP_STATE_DELTA, ASP_BENCH_WORKDIR).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from atlassian_sampling_processor_spark import decision as D  # noqa: E402
from atlassian_sampling_processor_spark.pipeline import plan_decision_eviction  # noqa: E402
from atlassian_sampling_processor_spark.session import get_spark  # noqa: E402
from atlassian_sampling_processor_spark.state import (  # noqa: E402
    DECISION_STATE_SCHEMA,
    StateStore,
)

CAPS = [int(c) for c in os.environ.get("ASP_EVICT_CAPS", "1000000,3000000,10000000").split(",")]
DELTA = int(os.environ.get("ASP_STATE_DELTA", 10_000))  # per-batch inserts = epoch size
N_BATCHES = 4
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))


def mk_rows(spark, start: int, n: int, batch_expr):
    return spark.range(start, start + n).select(
        F.lower(F.concat(
            F.lpad(F.hex(F.xxhash64("id")), 16, "0"),
            F.lpad(F.hex(F.xxhash64("id", F.lit("lo"))), 16, "0"),
        )).alias("doc_id"),
        (F.lit(2) + (F.col("id") % 2).cast("int")).alias("decision"),
        F.lit("bench").alias("policy"),
        batch_expr.cast("int").alias("decided_batch"),
    )


def run_capacity(spark, work: str, cap: int) -> dict:
    ck = f"{work}/ck_{cap}"
    shutil.rmtree(ck, ignore_errors=True)
    store = StateStore(spark, ck)
    n_epochs = cap // DELTA
    # steady-state base: cap rows spread over n_epochs epochs of DELTA
    # rows each (epoch size == per-batch insert rate), epoch-partitioned
    t0 = time.perf_counter()
    # floor(id/2) % n_epochs keeps BOTH kinds (id parity) in every epoch
    rows = mk_rows(spark, 0, cap, (F.col("id") / 2).cast("long") % n_epochs)
    (
        rows.repartition(32, "decided_batch")
        .write.mode("overwrite")
        .partitionBy("decided_batch")
        .parquet(store._base_path("decision_state", n_epochs - 1))
    )
    # per-epoch per-kind counts (even/odd id split ⇒ half sampled each)
    counts = {e: [DELTA - DELTA // 2, DELTA // 2] for e in range(n_epochs)}
    wm: dict[int, int] = {}
    store.write_evmeta(
        "decision_state", n_epochs - 1,
        {"wm": {}, "counts": {str(e): c for e, c in counts.items()}},
    )
    store.commit(n_epochs - 1)
    t_setup = time.perf_counter() - t0

    # capacities offset by a quarter-epoch so every overflow batch takes
    # BOTH paths: a whole-epoch watermark advance AND a boundary-epoch
    # partial eviction (the only Spark job in the loop)
    caps_cfg = {
        D.SAMPLED: cap // 2 - DELTA // 4,
        D.NOT_SAMPLED: cap // 2 - DELTA // 4,
    }
    walls = []
    for i in range(N_BATCHES):
        b = n_epochs + i
        ins = mk_rows(spark, cap + b * DELTA, DELTA, F.lit(b))
        t0 = time.perf_counter()
        store.write_epoch("decision_state", b, ins)
        c = counts.setdefault(b, [0, 0])
        c[0] += DELTA - DELTA // 2
        c[1] += DELTA // 2
        partial_req, ages = plan_decision_eviction(counts, wm, caps_cfg, b)
        if partial_req:
            parts = [
                store.read_epoch_slice("decision_state", b, e, DECISION_STATE_SCHEMA)
                .filter(F.col("decision") == kind)
                .orderBy("doc_id").limit(k).select("doc_id", "decided_batch")
                for kind, e, k in partial_req
            ]
            ev = parts[0]
            for p in parts[1:]:
                ev = ev.unionByName(p)
            store.write_evict("decision_state", b, ev)
        min_wm = min(wm.get(D.SAMPLED, -1), wm.get(D.NOT_SAMPLED, -1))
        counts = {e: c for e, c in counts.items() if e > min_wm and (c[0] or c[1])}
        store.write_evmeta(
            "decision_state", b,
            {"wm": {str(k): v for k, v in wm.items()},
             "counts": {str(e): c for e, c in counts.items()}},
        )
        store.commit(b)
        walls.append(time.perf_counter() - t0)
        print(f"cap {cap}: overflow batch {i}: {walls[-1]:.3f}s "
              f"(partials={partial_req})", file=sys.stderr)

    # verify capacity held exactly
    last = n_epochs + N_BATCHES - 1
    final = store.read("decision_state", last, DECISION_STATE_SCHEMA)
    sizes = {r["decision"]: r["n"] for r in
             final.groupBy("decision").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes[D.SAMPLED] == caps_cfg[D.SAMPLED], sizes
    assert sizes[D.NOT_SAMPLED] == caps_cfg[D.NOT_SAMPLED], sizes

    # contrast: the round-3 shape — a full two-level rank over the
    # resolved table, once (what every overflow batch used to pay)
    from atlassian_sampling_processor_spark.functions.topk import ranked_in_group

    t0 = time.perf_counter()
    ranked = ranked_in_group(
        final, "decision", [F.desc("decided_batch"), F.desc("doc_id")], two_level=True
    )
    ranked.filter(F.col("rn") > cap // 2).agg(F.count(F.lit(1))).collect()
    t_rank = time.perf_counter() - t0

    shutil.rmtree(ck, ignore_errors=True)
    return {
        "capacity": cap,
        "n_epochs": n_epochs,
        "t_setup_sec": round(t_setup, 2),
        "t_overflow_batch_sec": [round(t, 3) for t in walls],
        "t_overflow_avg_sec": round(sum(walls) / len(walls), 3),
        "t_full_rank_sec": round(t_rank, 3),
    }


def main():
    work = os.environ.get("ASP_BENCH_WORKDIR", "/dev/shm/asp_bench") + f"/devict_{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    if hasattr(os, "sched_setaffinity") and CPUS <= (os.cpu_count() or 32):
        os.sched_setaffinity(0, set(range(CPUS)))
    spark = get_spark(
        app_name="decision-evict-bench", cores=CPUS, shuffle_partitions=2 * CPUS,
        extra_conf={
            "spark.local.dir": work + "/tmp",
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={CPUS} -XX:+UseParallelGC",
        },
    )
    out = {
        "metric": "overflow-batch decision-eviction wall vs capacity",
        "delta_rows_per_batch": DELTA,
        "cpus": CPUS,
        "rows": [run_capacity(spark, work, cap) for cap in CAPS],
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
