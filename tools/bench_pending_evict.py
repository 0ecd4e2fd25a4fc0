"""Evidence that PENDING-cache eviction is O(1)-per-batch in capacity.

Rounds 2-4 ranked the full pending set on every overflow batch — and in
the reference's steady state the pending cache is permanently full
(README.md:22-26: eviction IS the decision timeout), so that rank ran
every batch at O(capacity). Round 5 restructures pending_state as a
FIFO-by-last_seen-epoch store (state.py): refreshes are delta-shaped
moves, per-epoch per-tier counts are driver arithmetic, whole epochs
fall off via watermark (no job), and only the boundary-epoch partial
eviction runs a job that reads ONE epoch, never the capacity.

This bench builds the steady-state shape at several capacities — a
compacted epoch-partitioned base of P pending rows in P/DELTA epochs —
then measures the overflow-batch wall for the REAL per-batch state ops
(epoch append + moves accounting + plan + epoch-pruned victim reads +
evict/evmeta writes), and for contrast the round-4-shaped full recency
rank at the same capacity. Flat left column, growing right column.

Run: ``python tools/bench_pending_evict.py`` (env: ASP_PEND_CAPS
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
    PENDING_STATE_SCHEMA,
    StateStore,
)

CAPS = [int(c) for c in os.environ.get("ASP_PEND_CAPS", "100000,1000000,10000000").split(",")]
DELTA = int(os.environ.get("ASP_STATE_DELTA", 10_000))  # per-batch arrivals = epoch size
MOVES = DELTA // 4  # per-batch refreshed (moved) pending rows
N_BATCHES = 4
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
TIERS = ("primary", "secondary")


def mk_rows(spark, start: int, n: int, epoch_expr):
    """Pending rows; every 10th row is secondary-tier (LowPriority)."""
    return spark.range(start, start + n).select(
        F.lower(F.concat(
            F.lpad(F.hex(F.xxhash64("id")), 16, "0"),
            F.lpad(F.hex(F.xxhash64("id", F.lit("lo"))), 16, "0"),
        )).alias("doc_id"),
        F.xxhash64("id").alias("trace_hi"),
        F.xxhash64("id", F.lit("lo")).alias("trace_lo"),
        F.lit(1).alias("span_count"),
        F.lit(0).cast("long").alias("min_start"),
        F.lit(0).cast("long").alias("max_end"),
        epoch_expr.cast("int").alias("arrival_batch"),
        epoch_expr.cast("int").alias("last_seen_batch"),
        F.when(F.col("id") % 10 == 0, F.lit(D.PRIORITY_LOW))
        .otherwise(F.lit(D.PRIORITY_UNSPECIFIED)).cast("int").alias("priority"),
        F.lit(None).cast("string").alias("last_low_policy"),
        F.lit("bench").alias("first_source"),
    )


def run_capacity(spark, work: str, cap: int) -> dict:
    ck = f"{work}/ck_{cap}"
    shutil.rmtree(ck, ignore_errors=True)
    store = StateStore(spark, ck)
    n_epochs = cap // DELTA
    t0 = time.perf_counter()
    # steady-state base: cap rows over n_epochs epochs; 10% secondary
    rows = mk_rows(spark, 0, cap, (F.col("id") / 10).cast("long") % n_epochs)
    (
        rows.repartition(32, "last_seen_batch")
        .write.mode("overwrite")
        .partitionBy("last_seen_batch")
        .parquet(store._base_path("pending_state", n_epochs - 1))
    )
    per_epoch = [DELTA - DELTA // 10, DELTA // 10]  # [primary, secondary]
    counts = {e: list(per_epoch) for e in range(n_epochs)}
    wm: dict[str, int] = {}
    store.write_evmeta(
        "pending_state", n_epochs - 1,
        {"wm": {}, "counts": {str(e): c for e, c in counts.items()}},
    )
    store.commit(n_epochs - 1)
    t_setup = time.perf_counter() - t0

    # caps offset by a quarter epoch ⇒ every batch takes BOTH paths:
    # whole-epoch watermark advance AND a boundary partial eviction
    caps_cfg = {
        "primary": cap - cap // 10 - per_epoch[0] // 4,
        "secondary": cap // 10 - per_epoch[1] // 4,
    }
    tidx = {t: i for i, t in enumerate(TIERS)}
    tier = F.when(
        F.col("priority") == D.PRIORITY_LOW, F.lit("secondary")
    ).otherwise(F.lit("primary"))
    walls = []
    for i in range(N_BATCHES):
        b = n_epochs + i
        prev = b - 1
        arrivals = mk_rows(spark, cap + b * DELTA, DELTA, F.lit(b))
        # moved rows: refresh MOVES rows of the oldest live epoch (the
        # real pipeline derives these from the persisted decision frame)
        live_epochs = sorted(
            e for e in counts
            if any(e > wm.get(t, -1) and counts[e][tidx[t]] > 0 for t in TIERS)
        )
        src_epoch = live_epochs[len(live_epochs) // 2]
        t0 = time.perf_counter()
        moved = (
            store.read_epoch_slice("pending_state", prev, src_epoch, PENDING_STATE_SCHEMA)
            .orderBy(F.desc("doc_id")).limit(MOVES)
            .select("doc_id", "last_seen_batch", "priority")
            .persist()
        )
        # the refreshed rows re-enter at epoch-b recency
        refreshed = (
            store.read_epoch_slice("pending_state", prev, src_epoch, PENDING_STATE_SCHEMA)
            .orderBy(F.desc("doc_id")).limit(MOVES)
            .withColumn("last_seen_batch", F.lit(b).cast("int"))
        )
        updated = arrivals.unionByName(refreshed)
        mv = (
            moved.select(F.col("last_seen_batch").alias("e"), tier.alias("t"),
                         F.lit(-1).alias("d"))
            .unionByName(updated.select(F.lit(b).alias("e"), tier.alias("t"),
                                        F.lit(1).alias("d")))
            .groupBy("e", "t").agg(F.sum("d").alias("d")).collect()
        )
        for r in mv:
            c = counts.setdefault(int(r["e"]), [0, 0])
            c[tidx[r["t"]]] += int(r["d"])
        old_wm = dict(wm)
        pre = {e: list(c) for e, c in counts.items()}
        partial, _ = plan_decision_eviction(counts, wm, caps_cfg, b, kinds=TIERS)
        ev_parts = []
        for t in TIERS:
            lo, hi = old_wm.get(t, -1), wm.get(t, -1)
            for e in sorted(e for e in pre if lo < e <= hi and pre[e][tidx[t]] > 0):
                sl = updated if e == b else store.read_epoch_slice(
                    "pending_state", prev, e, PENDING_STATE_SCHEMA
                ).join(moved.select("doc_id"), "doc_id", "left_anti")
                ev_parts.append(sl.filter(tier == t).select(
                    "doc_id", F.lit(e).alias("ev_epoch")))
        for t, e, k in partial:
            sl = updated if e == b else store.read_epoch_slice(
                "pending_state", prev, e, PENDING_STATE_SCHEMA
            ).join(moved.select("doc_id"), "doc_id", "left_anti")
            ev_parts.append(
                sl.filter(tier == t).orderBy("arrival_batch", "doc_id").limit(k)
                .select("doc_id", F.lit(e).alias("ev_epoch"))
            )
        evicted = ev_parts[0]
        for p in ev_parts[1:]:
            evicted = evicted.unionByName(p)
        evicted = evicted.persist()
        n_ev = evicted.count()
        store.write_epoch(
            "pending_state", b,
            updated.join(evicted.select("doc_id"), "doc_id", "left_anti"),
        )
        removal = moved.select("doc_id", "last_seen_batch").unionByName(
            evicted.filter(F.col("ev_epoch") != b)
            .select("doc_id", F.col("ev_epoch").alias("last_seen_batch"))
        )
        store.write_evict("pending_state", b, removal)
        min_wm = min(wm.get(t, -1) for t in TIERS)
        counts = {e: c for e, c in counts.items() if e > min_wm and (c[0] or c[1])}
        store.write_evmeta(
            "pending_state", b,
            {"wm": dict(wm), "counts": {str(e): c for e, c in counts.items()}},
        )
        store.commit(b)
        walls.append(time.perf_counter() - t0)
        moved.unpersist()
        evicted.unpersist()
        print(f"cap {cap}: overflow batch {i}: {walls[-1]:.3f}s "
              f"(evicted={n_ev}, partials={partial})", file=sys.stderr)

    # verify capacity held exactly
    last = n_epochs + N_BATCHES - 1
    final = store.read("pending_state", last, PENDING_STATE_SCHEMA)
    sizes = {r["t"]: r["n"] for r in final.groupBy(tier.alias("t"))
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes["primary"] == caps_cfg["primary"], (sizes, caps_cfg)
    assert sizes["secondary"] == caps_cfg["secondary"], (sizes, caps_cfg)

    # contrast: the round-4 shape — full two-level recency rank, once
    from atlassian_sampling_processor_spark.functions.topk import ranked_in_group

    t0 = time.perf_counter()
    ranked = ranked_in_group(
        final.withColumn("tier", tier), "tier",
        [F.desc("last_seen_batch"), F.desc("arrival_batch"), F.desc("doc_id")],
        two_level=True,
    )
    cap_col = F.when(F.col("tier") == "secondary", F.lit(caps_cfg["secondary"])) \
        .otherwise(F.lit(caps_cfg["primary"]))
    ranked.filter(F.col("rn") > cap_col).agg(F.count(F.lit(1))).collect()
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
    work = os.environ.get("ASP_BENCH_WORKDIR", "/dev/shm/asp_bench") + f"/pevict_{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    if hasattr(os, "sched_setaffinity") and CPUS <= (os.cpu_count() or 32):
        os.sched_setaffinity(0, set(range(CPUS)))
    spark = get_spark(
        app_name="pending-evict-bench", cores=CPUS, shuffle_partitions=2 * CPUS,
        extra_conf={
            "spark.local.dir": work + "/tmp",
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={CPUS} -XX:+UseParallelGC",
        },
    )
    out = {
        "metric": "overflow-batch pending-eviction wall vs capacity",
        "delta_rows_per_batch": DELTA,
        "moves_per_batch": MOVES,
        "cpus": CPUS,
        "rows": [run_capacity(spark, work, cap) for cap in CAPS],
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
