"""Checkpointed state tables (FIXTURES.md §6) — the Spark mapping of the
reference's four LRU caches (processor.go:53-59, DESIGN.md:110-138).

Delta-shaped commits (round 3): the reference mutates its caches in
place (internal/cache/lru_cache.go:63-71), so its per-put cost is O(1);
a naive Spark translation rewrites every state table in full each batch
— O(capacity) writes, hopeless at the reference-realistic 10^7–10^8
decision-cache sizes (README.md:65-77). This store instead keeps each
table as a merge-on-read chain:

    {ckpt}/{table}/base/v={B}/*.parquet     full snapshot (compaction)
    {ckpt}/{table}/delta/v={b}/*.parquet    per-batch delta, b > B

A delta file holds the batch's *inserted rows* (``_deleted=false``) and
*tombstoned keys* (``_deleted=true``, key column only).  ``read``
resolves the chain lazily: union(base, deltas) with a per-part ``_v``
version column, then an anti-ish join against the aggregated tombstone
set (tiny — O(K·delta) keys, broadcast by AQE) keeps a row iff no
tombstone for its key has a strictly newer version (``_v >= _tv``; an
upsert writes tombstone+insert at the same version, so the fresh row
survives its own tombstone).  Every ``compact_every`` batches the chain
is folded into a new base — O(capacity) once per K batches, i.e.
amortized O(capacity/K) — exactly the Iceberg MERGE-on-read + periodic
rewrite shape; on a production cluster these directories ARE an Iceberg
table and the delta write is a ``MERGE INTO`` snapshot commit.

Atomicity is unchanged: an atomically-renamed ``LATEST`` marker commits
all tables of a batch at once, so a kill mid-batch leaves only
uncommitted ``v=`` directories that the next (idempotent, deterministic)
replay overwrites — the reference's decision-span flush/re-ingest
resumability story (DESIGN.md:148-167) done with snapshots.

Legacy layout ``{table}/v={b}`` (round-1/2 checkpoints, the metrics log
table, flush()'s empty rewrites) reads as a base of the chain, so old
checkpoints resume and per-batch metrics stay per-batch.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PENDING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("trace_hi", T.LongType()),
        T.StructField("trace_lo", T.LongType()),
        T.StructField("span_count", T.IntegerType()),
        T.StructField("min_start", T.LongType()),
        T.StructField("max_end", T.LongType()),
        T.StructField("arrival_batch", T.IntegerType()),
        T.StructField("last_seen_batch", T.IntegerType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("last_low_policy", T.StringType()),
        T.StructField("first_source", T.StringType()),
    ]
)

DECISION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("decision", T.IntegerType()),  # 2=Sampled, 3=NotSampled
        T.StructField("policy", T.StringType()),
        T.StructField("decided_batch", T.IntegerType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_idx", T.IntegerType()),
        T.StructField("metric", T.StringType()),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
        T.StructField("value", T.LongType()),
    ]
)

TABLES = ("pending_state", "pending_spans", "decision_state", "metrics")

_DEL = "_deleted"
_V = "_v"


def _kind_key(k: str):
    """evmeta JSON wm keys → native kind values (decision kinds are ints,
    pending tiers are strings)."""
    try:
        return int(k)
    except ValueError:
        return k


def _field_names(schema) -> list[str]:
    """Column names from a StructType or a DDL schema string."""
    if hasattr(schema, "fieldNames"):
        return schema.fieldNames()
    return T.StructType.fromDDL(schema).fieldNames()


def _list_versions(d: str) -> dict[int, str]:
    """``{v: path}`` for ``v=N`` subdirectories of ``d`` (missing → {})."""
    out: dict[int, str] = {}
    try:
        for name in os.listdir(d):
            if name.startswith("v="):
                try:
                    out[int(name[2:])] = os.path.join(d, name)
                except ValueError:
                    pass
    except FileNotFoundError:
        pass
    return out


class StateStore:
    def __init__(self, spark: SparkSession, ckpt_dir: str, compact_every: int = 8):
        self.spark = spark
        self.dir = ckpt_dir
        # chain length that triggers folding deltas into a new base;
        # <=1 degenerates to a full rewrite per batch (the round-2 shape)
        self.compact_every = max(1, compact_every)
        os.makedirs(ckpt_dir, exist_ok=True)

    # -- commit protocol ----------------------------------------------------

    def _marker(self) -> str:
        return os.path.join(self.dir, "LATEST")

    def last_committed_batch(self) -> int | None:
        try:
            with open(self._marker()) as f:
                return json.load(f)["batch"]
        except FileNotFoundError:
            return None

    def last_meta(self) -> dict:
        """Driver-side state-size counters stored with the commit marker
        (used to skip capacity-eviction ranking when it cannot fire)."""
        try:
            with open(self._marker()) as f:
                return json.load(f).get("meta", {})
        except FileNotFoundError:
            return {}

    def commit(self, batch: int, meta: dict | None = None) -> None:
        tmp = self._marker() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch": batch, "meta": meta or {}}, f)
        os.replace(tmp, self._marker())  # atomic

    # -- chain layout -------------------------------------------------------

    def _path(self, table: str, batch: int) -> str:
        """Legacy full-table path (metrics log, flush, old checkpoints)."""
        return os.path.join(self.dir, table, f"v={batch}")

    def _base_path(self, table: str, batch: int) -> str:
        return os.path.join(self.dir, table, "base", f"v={batch}")

    def _delta_path(self, table: str, batch: int) -> str:
        return os.path.join(self.dir, table, "delta", f"v={batch}")

    def _chain(self, table: str, batch: int) -> tuple[tuple[int, str] | None, list[tuple[int, str]]]:
        """(base, deltas) visible at committed version ``batch``.

        Bases are compaction snapshots plus legacy full writes; deltas are
        the delta versions in (base, batch]. Directories with v > batch
        (crashed, uncommitted writes) are invisible — replay overwrites
        them deterministically.
        """
        tdir = os.path.join(self.dir, table)
        bases = dict(_list_versions(tdir))  # legacy full tables
        bases.update(_list_versions(os.path.join(tdir, "base")))  # compactions win ties
        bv = max((v for v in bases if v <= batch), default=None)
        base = (bv, bases[bv]) if bv is not None else None
        deltas = sorted(
            (v, p)
            for v, p in _list_versions(os.path.join(tdir, "delta")).items()
            if v <= batch and (bv is None or v > bv)
        )
        return base, deltas

    # -- write --------------------------------------------------------------

    def write(self, table: str, batch: int, df: DataFrame) -> None:
        """Full (legacy/base-equivalent) write — O(rows). Used for the
        per-batch metrics log and flush()'s state reset; state tables go
        through write_delta."""
        shutil.rmtree(self._delta_path(table, batch), ignore_errors=True)
        # a crashed compaction may have left an uncommitted base at this
        # version; bases win ties in _chain ("compactions win ties"), so a
        # stale one would shadow this legacy write after commit — every
        # write path rmtrees its sibling layouts at the same version
        shutil.rmtree(self._base_path(table, batch), ignore_errors=True)
        df.write.mode("overwrite").parquet(self._path(table, batch))

    def write_delta(
        self,
        table: str,
        batch: int,
        prev: int | None,
        inserts: DataFrame,
        tombstone_keys: DataFrame | None,
        schema: T.StructType,
        key: str = "doc_id",
    ) -> None:
        """Commit batch ``batch`` as an O(delta) write: ``inserts`` rows
        plus ``tombstone_keys`` (keys whose prior rows die; an upserted key
        appears in BOTH — the same-version insert wins). Compacts the
        chain into a new base snapshot every ``compact_every`` batches.
        """
        cols = _field_names(schema)
        ins = inserts.select(*cols)
        _, deltas = self._chain(table, prev) if prev is not None else (None, [])
        if len(deltas) + 1 >= self.compact_every:
            # fold the chain + this delta into a fresh base: O(capacity),
            # amortized over compact_every batches (Iceberg rewrite step)
            cur = self.read(table, prev, schema)
            if tombstone_keys is not None:
                cur = cur.join(tombstone_keys.select(key).distinct(), key, "left_anti")
            live = cur.unionByName(ins)
            shutil.rmtree(self._delta_path(table, batch), ignore_errors=True)
            shutil.rmtree(self._path(table, batch), ignore_errors=True)
            live.write.mode("overwrite").parquet(self._base_path(table, batch))
            return
        delta = ins.withColumn(_DEL, F.lit(False))
        if tombstone_keys is not None:
            tomb = tombstone_keys.select(F.col(key)).distinct().withColumn(_DEL, F.lit(True))
            delta = delta.unionByName(tomb, allowMissingColumns=True)
        # a crashed compaction may have left an uncommitted base at this
        # version — remove it so chain discovery can't resurrect it
        shutil.rmtree(self._base_path(table, batch), ignore_errors=True)
        shutil.rmtree(self._path(table, batch), ignore_errors=True)
        # deltas are small by design — don't scatter them over the full
        # shuffle-partition count (a K-batch chain otherwise accumulates
        # K × partitions tiny files, and reads pay per-file scan setup:
        # measured ~3 s of fixed resolution cost at 6 × 32 files)
        delta.coalesce(8).write.mode("overwrite").parquet(self._delta_path(table, batch))

    # -- epoch layout (FIFO decision cache, round 4; pending cache round 5) --
    #
    # Decisions are immutable and never recency-refreshed (first-wins,
    # processor.go:436-480), so the reference's decision-cache LRU order
    # IS insertion order — eviction can be FIFO by `decided_batch` epoch.
    # Instead of ranking the full O(capacity) chain on overflow
    # (the round-3 shape), the store keeps an epoch table as:
    #
    #   {table}/epoch/v={b}/        batch b's new rows (O(delta) append)
    #   {table}/evict/v={b}/        per-row removal keys written at batch b
    #                               (doc_id, <epoch col>) — boundary-epoch
    #                               eviction victims and (pending) moved rows
    #   {table}/evmeta/v={b}.json   {"wm": {kind: epoch}, "counts": {epoch:
    #                               [per-kind live counts]}} as of batch b
    #   {table}/base/v={B}/<epoch col>={e}/   compaction, epoch-partitioned
    #
    # A row of kind k in epoch e is live iff e > wm[k] and (doc_id, e) has
    # no evict key. Whole-epoch eviction is a pure driver-side watermark
    # advance (O(1), no job); only a partial boundary-epoch eviction runs a
    # job, and it reads ONE epoch (partition-pruned), never the capacity.
    # The legacy chain layout remains readable underneath (old checkpoints,
    # flush()'s truncating legacy write) — read() unions epochs above the
    # newest full layout exactly like deltas.
    #
    # Two tables use it, each with its own (kind, epoch) keying:
    #   decision_state: kind = decision (Sampled/NotSampled),
    #                   epoch = decided_batch (immutable — rows never move)
    #   pending_state:  kind = cache tier (primary/secondary, from priority),
    #                   epoch = last_seen_batch. Pending recency REFRESHES,
    #                   but only on touched rows — a refresh is a
    #                   delta-shaped MOVE (evict key at the old epoch +
    #                   append in the new), so the FIFO watermark trick
    #                   still applies: LRU order is epoch order, with
    #                   (arrival_batch, doc_id) ranking only inside the
    #                   boundary epoch (the full-capacity recency rank the
    #                   round-4 pipeline ran per overflow batch is gone).

    def _epoch_cfg(self, table: str):
        """(kind Column expr, epoch column name, kind values) for the
        epoch-store tables. The wm filter/prune and the evict-key join are
        expressed through these, so the machinery is shared."""
        if table == "pending_state":
            from .decision import PRIORITY_LOW

            kind = F.when(
                F.col("priority") == F.lit(PRIORITY_LOW), F.lit("secondary")
            ).otherwise(F.lit("primary"))
            return kind, "last_seen_batch", ("primary", "secondary")
        from .decision import CACHED_KINDS

        return F.col("decision"), "decided_batch", tuple(CACHED_KINDS)

    def _epoch_path(self, table: str, batch: int) -> str:
        return os.path.join(self.dir, table, "epoch", f"v={batch}")

    def _evict_path(self, table: str, batch: int) -> str:
        return os.path.join(self.dir, table, "evict", f"v={batch}")

    def _evmeta_path(self, table: str, batch: int) -> str:
        return os.path.join(self.dir, table, "evmeta", f"v={batch}.json")

    def write_epoch(self, table: str, batch: int, df: DataFrame) -> None:
        """O(delta) append of batch ``batch``'s new rows as one epoch.
        Clears sibling layouts at the same version (torn-write replay)."""
        shutil.rmtree(self._path(table, batch), ignore_errors=True)
        shutil.rmtree(self._base_path(table, batch), ignore_errors=True)
        shutil.rmtree(self._delta_path(table, batch), ignore_errors=True)
        shutil.rmtree(self._evict_path(table, batch), ignore_errors=True)
        try:
            os.remove(self._evmeta_path(table, batch))
        except FileNotFoundError:
            pass
        df.coalesce(4).write.mode("overwrite").parquet(self._epoch_path(table, batch))

    def write_evict(self, table: str, batch: int, keys: DataFrame) -> None:
        """Removal keys ``(doc_id, <epoch col>)`` written at batch
        ``batch`` — kills those rows in their epoch only, so a later
        re-insert of the same doc (a fresh epoch row) survives. Used for
        boundary-epoch eviction victims and (pending) epoch moves."""
        _, epoch_col, _ = self._epoch_cfg(table)
        keys.select("doc_id", epoch_col).coalesce(1).write.mode(
            "overwrite"
        ).parquet(self._evict_path(table, batch))

    def write_evmeta(self, table: str, batch: int, meta: dict) -> None:
        d = os.path.dirname(self._evmeta_path(table, batch))
        os.makedirs(d, exist_ok=True)
        tmp = self._evmeta_path(table, batch) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._evmeta_path(table, batch))

    def _list_evmeta_versions(self, table: str) -> dict[int, str]:
        """``{v: path}`` for the ``v=N.json`` evmeta files of ``table``."""
        d = os.path.join(self.dir, table, "evmeta")
        out: dict[int, str] = {}
        try:
            for name in os.listdir(d):
                if name.startswith("v=") and name.endswith(".json"):
                    try:
                        out[int(name[2:-5])] = os.path.join(d, name)
                    except ValueError:
                        pass
        except FileNotFoundError:
            pass
        return out

    def read_evmeta(self, table: str, batch: int) -> dict | None:
        """Newest evmeta at version ≤ batch (versioned like the data dirs,
        so time-travel reads use the watermark as of that commit)."""
        versions = self._list_evmeta_versions(table)
        best = max((v for v in versions if v <= batch), default=None)
        if best is None:
            return None
        with open(versions[best]) as f:
            return json.load(f)

    def _epoch_parts(self, table: str, batch: int) -> tuple[int, list[tuple[int, str]], list[tuple[int, str]]]:
        """(floor_version, epoch dirs, evict dirs) visible at ``batch``.
        The floor is the newest full layout (legacy or base) ≤ batch;
        epochs/evicts at or below it are shadowed (compacted/truncated)."""
        tdir = os.path.join(self.dir, table)
        fulls = dict(_list_versions(tdir))
        fulls.update(_list_versions(os.path.join(tdir, "base")))
        floor = max((v for v in fulls if v <= batch), default=-1)
        epochs = sorted(
            (v, p)
            for v, p in _list_versions(os.path.join(tdir, "epoch")).items()
            if floor < v <= batch
        )
        evicts = sorted(
            (v, p)
            for v, p in _list_versions(os.path.join(tdir, "evict")).items()
            if floor < v <= batch
        )
        return floor, epochs, evicts

    def _read_epochal(
        self,
        table: str,
        batch: int,
        floor_df: DataFrame | None,
        schema: T.StructType | None,
        epochs: list[tuple[int, str]],
        evicts: list[tuple[int, str]],
    ) -> DataFrame:
        """Union the legacy-resolved floor with epoch appends, then apply
        the per-kind watermark filter and the partial-evict anti-join."""
        parts = [] if floor_df is None else [floor_df]
        for _, p in epochs:
            parts.append(self.spark.read.parquet(p))
        if not parts:
            if schema is not None:
                return self.spark.createDataFrame([], schema=schema)
            return self.spark.createDataFrame([], schema=DECISION_STATE_SCHEMA)
        cols = _field_names(schema) if schema is not None else parts[0].columns
        df = parts[0].select(*cols)
        for p in parts[1:]:
            df = df.unionByName(p.select(*cols))
        kind_expr, epoch_col, all_kinds = self._epoch_cfg(table)
        em = self.read_evmeta(table, batch) or {}
        wm = {_kind_key(k): int(v) for k, v in (em.get("wm") or {}).items()}
        if wm:
            live = None
            for kind, w in wm.items():
                term = (kind_expr != F.lit(kind)) | (F.col(epoch_col) > F.lit(w))
                live = term if live is None else live & term
            # partition-prune conjunct: only sound when EVERY kind has a
            # watermark — a kind absent from wm has watermark -1, and
            # pruning at min(present wms) would delete its live rows in
            # epochs the other kind already evicted
            if set(all_kinds) <= set(wm):
                live = live & (F.col(epoch_col) > F.lit(min(wm.values())))
            df = df.filter(live)
        if evicts:
            ev = self.spark.read.parquet(*[p for _, p in evicts])
            # tiny by construction: evict keys are O(batch) per version —
            # boundary-eviction victims plus (pending) moved rows — and
            # compaction folds them away
            df = df.join(
                F.broadcast(ev.select("doc_id", epoch_col).distinct()),
                ["doc_id", epoch_col],
                "left_anti",
            )
        return df

    def read_epoch_slice(
        self, table: str, batch: int, epoch: int, schema: T.StructType
    ) -> DataFrame:
        """Live rows of ONE epoch as of ``batch`` — the partial-eviction
        read path. Touches only that epoch's append file (or its base
        partition directory), never the capacity; prior partial-evict
        keys for the epoch are anti-joined (broadcast, tiny)."""
        _, epoch_col, _ = self._epoch_cfg(table)
        floor, epochs, evicts = self._epoch_parts(table, batch)
        paths = [p for v, p in epochs if v == epoch]
        df = None
        if paths:
            df = self.spark.read.parquet(paths[0]).select(*_field_names(schema))
        elif floor >= 0:
            bdir = os.path.join(
                self._base_path(table, floor), f"{epoch_col}={epoch}"
            )
            if os.path.isdir(bdir):
                df = (
                    self.spark.read.parquet(bdir)
                    .withColumn(epoch_col, F.lit(epoch).cast("int"))
                    .select(*_field_names(schema))
                )
        if df is None:  # legacy chain floor — resolve and filter (rare)
            df = self.read(table, batch, schema).filter(
                F.col(epoch_col) == F.lit(epoch)
            )
            return df
        if evicts:
            ev = self.spark.read.parquet(*[p for _, p in evicts]).filter(
                F.col(epoch_col) == F.lit(epoch)
            )
            df = df.join(
                F.broadcast(ev.select("doc_id", epoch_col).distinct()),
                ["doc_id", epoch_col],
                "left_anti",
            )
        return df

    def compact_epochs(self, table: str, batch: int, schema: T.StructType) -> None:
        """Fold floor + epochs + watermarks + evict keys into a fresh
        epoch-partitioned base at ``batch`` — O(live rows), amortized over
        the epoch-append cadence; partition pruning keeps future watermark
        filters cheap."""
        _, epoch_col, _ = self._epoch_cfg(table)
        live = self.read(table, batch, schema)
        shutil.rmtree(self._path(table, batch), ignore_errors=True)
        shutil.rmtree(self._delta_path(table, batch), ignore_errors=True)
        bp = self._base_path(table, batch)
        (
            live.repartition(8, epoch_col)
            .write.mode("overwrite")
            .partitionBy(epoch_col)
            .parquet(bp)
        )
        # zero live rows → dynamic partitioning wrote no files at all,
        # which is unreadable; fall back to a plain schema-bearing empty
        if not any(n.startswith(f"{epoch_col}=") for n in os.listdir(bp)):
            self.spark.createDataFrame([], schema=schema).write.mode(
                "overwrite"
            ).parquet(bp)

    def n_epochs_since_floor(self, table: str, batch: int) -> int:
        floor, epochs, _ = self._epoch_parts(table, batch)
        return len(epochs)

    # -- read ---------------------------------------------------------------

    def read(self, table: str, batch: int | None, schema: T.StructType | None = None) -> DataFrame | None:
        """Live rows of ``table`` as of committed version ``batch``
        (time-travel: any committed version resolves, not just the
        latest). None/missing → empty-with-schema or None."""
        if batch is not None:
            _, epochs, evicts = self._epoch_parts(table, batch)
            epochal = bool(epochs or evicts)
            p = self._path(table, batch)
            if os.path.isdir(p) and not epochal:  # exact legacy — fast path
                return self.spark.read.parquet(p)
            bp = self._base_path(table, batch)
            if os.path.isdir(bp) and not epochal:
                df = self.spark.read.parquet(bp)
                return df.select(*_field_names(schema)) if schema is not None else df
            base, deltas = self._chain(table, batch)
            floor_df = None
            if base is not None and not deltas:  # post-compaction: plain scan
                floor_df = self.spark.read.parquet(base[1])
                if schema is not None:
                    floor_df = floor_df.select(*_field_names(schema))
            elif base is not None or deltas:
                floor_df = self._resolve(base, deltas, schema, key="doc_id")
            if epochal:
                return self._read_epochal(
                    table, batch, floor_df, schema, epochs, evicts
                )
            if floor_df is not None:
                return floor_df
        if schema is not None:
            return self.spark.createDataFrame([], schema=schema)
        return None

    def _resolve(
        self,
        base: tuple[int, str] | None,
        deltas: list[tuple[int, str]],
        schema: T.StructType | None,
        key: str,
    ) -> DataFrame:
        """Merge-on-read: a row is live iff no tombstone for its key is
        strictly newer (``_v >= _tv``). The tombstone side is O(chain
        delta keys) — tiny next to the base — so the join broadcasts; a
        chain with no tombstones costs just the union scan."""
        parts = []
        if base is not None:
            bv, bpath = base
            parts.append(
                self.spark.read.parquet(bpath)
                .withColumn(_V, F.lit(bv))
                .withColumn(_DEL, F.lit(False))
            )
        for v, p in deltas:
            df = self.spark.read.parquet(p)
            if _DEL not in df.columns:  # legacy delta-less dir safety
                df = df.withColumn(_DEL, F.lit(False))
            parts.append(df.withColumn(_V, F.lit(v)))
        data = parts[0]
        for p in parts[1:]:
            data = data.unionByName(p, allowMissingColumns=True)
        tomb = (
            data.filter(F.col(_DEL))
            .groupBy(key)
            .agg(F.max(_V).alias("_tv"))
        )
        # explicit broadcast: the tombstone set is O(chain × per-batch
        # delta) by construction (compaction bounds the chain), while the
        # data side is O(capacity) — without the hint Catalyst's size
        # estimate over the union triggers a sort-merge join that
        # shuffles the full state per read (measured 3.8 s vs 0.45 s at
        # 10^7 rows × 6-delta chain, tools/bench_state_delta.py)
        live = (
            data.filter(~F.col(_DEL))
            .join(F.broadcast(tomb), key, "left")
            .filter(F.col("_tv").isNull() | (F.col(_V) >= F.col("_tv")))
            .drop(_V, _DEL, "_tv")
        )
        if schema is not None:
            live = live.select(*_field_names(schema))
        return live

    # -- maintenance --------------------------------------------------------

    def vacuum(self, table: str, committed: int) -> None:
        """Best-effort removal of chain segments shadowed by the newest
        base at or before ``committed``. Optional — time-travel reads of
        older versions stop working for vacuumed segments. Never touches
        versions > ``committed``."""
        base, _ = self._chain(table, committed)
        if base is None:
            return
        bv, _ = base
        tdir = os.path.join(self.dir, table)
        for sub in ("delta", "epoch", "evict"):
            for v, p in list(_list_versions(os.path.join(tdir, sub)).items()):
                if v <= bv:
                    shutil.rmtree(p, ignore_errors=True)
        for sub in ("", "base"):
            for v, p in list(_list_versions(os.path.join(tdir, sub) if sub else tdir).items()):
                if v < bv:
                    shutil.rmtree(p, ignore_errors=True)
        # evmeta files strictly below the base can go — the base bakes the
        # watermark as of its version, and every epoch batch writes a fresh
        # evmeta, so reads above bv still find the newest one
        for v, p in self._list_evmeta_versions(table).items():
            if v < bv:
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass
