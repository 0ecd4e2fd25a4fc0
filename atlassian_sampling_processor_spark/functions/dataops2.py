"""Second wave of training-data pipeline operators (round 2):

* **dedup_groups_connected** — connected components over the MinHash-LSH
  near-dup candidate graph → a per-document canonical id (the classic
  "dedup cluster then keep one representative" step of a corpus
  pipeline). Spark side is iterative min-label propagation with
  lineage-truncating checkpoints; the DuckDB oracle is a recursive-CTE
  transitive closure. At 100 TB the iteration count is the graph
  diameter (near-dup graphs are unions of small cliques, so 2–4), and
  each step is one shuffle join — the standard large-scale CC shape
  (cf. large-star/small-star, which bounds iterations for pathological
  chains; swap in if diameters grow).
* **sample_stratified** — deterministic per-source quota sampling: rank
  docs inside each source by a salted content hash and keep the top K.
  Runs through :func:`...functions.topk.ranked_in_group` with
  ``two_level=True`` so the per-group rank has NO single-task sort —
  this query is the oracle-checked evidence that the distributed rank
  is exact.
* **heavy_hitters_bigrams** — corpus-wide top-K word bigrams (boilerplate
  / contamination detector). Partial aggregation does the heavy lifting
  map-side; the final top-K is a TakeOrdered, never a full sort.
* **doc_length_quantiles** — exact p50/p90/p99 of document length per
  source (R-7 linear interpolation in both engines). Exact percentile
  sorts per group — fine for per-source stats (group count is small);
  at 100 TB with huge groups use approx_percentile and keep this as the
  small-slice oracle.

Like dataops.py, every operator ships as a (Spark builder, DuckDB
oracle SQL) pair over the same parquet tables, with float columns
rounded identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dataops import docs, h32, h32_sql, q_dedup_minhash_lsh, _sql_minhash_lsh

# ---------------------------------------------------------------------------
# 1. near-dup groups: connected components over LSH candidate pairs

CC_SIM_THRESHOLD = 0.5  # keep LSH candidate edges with est_sim >= this
CC_MAX_ITERS = 20  # safety bound; convergence is the component diameter


def q_dedup_groups(spark, sf_dir) -> DataFrame:
    """(doc_id, canonical_id, is_duplicate) for EVERY document: canonical
    is the min doc_id of the doc's near-dup component (itself when it has
    no near-dups). Min-label propagation: each round every vertex takes
    the min label among itself and its neighbours; stop when a round
    changes nothing. ``localCheckpoint`` truncates the per-round lineage
    so the plan stays O(1) deep (on a cluster use a reliable checkpoint
    dir instead)."""
    pairs = (
        q_dedup_minhash_lsh(spark, sf_dir)
        .filter(F.col("est_sim") >= CC_SIM_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint()
    labels = docs(spark, sf_dir).select("doc_id", F.col("doc_id").alias("comp"))
    for _ in range(CC_MAX_ITERS):
        prop = (
            edges.join(labels, edges["doc_a"] == labels["doc_id"])
            .groupBy(F.col("doc_b").alias("doc_id"))
            .agg(F.min("comp").alias("ncomp"))
        )
        new = (
            labels.join(prop, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(
        "doc_id",
        F.col("comp").alias("canonical_id"),
        (F.col("comp") < F.col("doc_id")).alias("is_duplicate"),
    )


def _sql_dedup_groups() -> str:
    return f"""
      WITH RECURSIVE
      lsh AS (SELECT * FROM ({_sql_minhash_lsh()})),
      pairs AS (SELECT doc_a, doc_b FROM lsh WHERE est_sim >= {CC_SIM_THRESHOLD}),
      edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
      ),
      reach(s, d) AS (
        SELECT s, d FROM edges
        UNION
        SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
      ),
      comp AS (SELECT s AS doc_id, min(d) AS mn FROM reach GROUP BY s)
      SELECT dd.doc_id,
             least(coalesce(c.mn, dd.doc_id), dd.doc_id) AS canonical_id,
             least(coalesce(c.mn, dd.doc_id), dd.doc_id) < dd.doc_id AS is_duplicate
      FROM documents dd LEFT JOIN comp c ON c.doc_id = dd.doc_id
    """


# ---------------------------------------------------------------------------
# 1b. alternating large-star / small-star connected components
#
# The round-boundedly-iterative swap-in the propagation docstring names:
# Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC
# '14). Min-label propagation converges in O(diameter) joins — fine for
# near-dup graphs (unions of small cliques, diameter 2–4), pathological
# for chain-shaped graphs. Large-star/small-star converges in O(log² n)
# rounds regardless of diameter: each round every vertex rewires its
# larger neighbours to its local minimum (large-star over the symmetric
# edge list), then its smaller neighbours to the group minimum
# (small-star over the larger→smaller canonical list). The fixed point
# is a forest of 2-level stars whose centres are the component minima.


def cc_labels_star(
    spark, vertices: DataFrame, pairs: DataFrame, max_iters: int = 30
) -> tuple[DataFrame, int]:
    """Connected components via alternating large-star/small-star.

    ``vertices``: (doc_id); ``pairs``: undirected candidate edges
    (doc_a, doc_b). Returns (labels(doc_id, comp), rounds). Each round
    is two shuffle joins over the current edge list; convergence is the
    fixed point of the edge multiset (count + order-insensitive hash).
    """
    edges = (
        pairs.filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .distinct()
        .localCheckpoint()
    )

    def stats(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(r["n"]), int(r["h"])

    prev = stats(edges)
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # large-star: symmetric list; every strictly-larger neighbour of
        # u rewires to m = min(N(u) ∪ {u}) — output is larger→smaller
        # canonical by construction (v > u ≥ m)
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.least(F.col("mv"), F.col("u")).alias("v"),
            )
            .distinct()
        )
        # small-star: per u-group over the canonical list, the min-edge
        # row stands in for (u, m) and every other row rewires (v, m)
        mins2 = ls.groupBy("u").agg(F.min("v").alias("mv"))
        ss = (
            ls.join(mins2, "u")
            .select(
                F.when(F.col("v") == F.col("mv"), F.col("u"))
                .otherwise(F.col("v"))
                .alias("u"),
                F.col("mv").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        edges = ss
        cur = stats(edges)
        if cur == prev:
            break
        prev = cur
    else:
        # a non-star edge set would fan out the label join into
        # DUPLICATE rows per doc — never return silently-wrong labels
        raise RuntimeError(
            f"cc_labels_star did not converge in {max_iters} rounds "
            "(O(log² n) expected — raise max_iters or inspect the graph)"
        )
    roots = edges.select(F.col("u").alias("doc_id"), F.col("v").alias("comp"))
    labels = vertices.join(roots, "doc_id", "left").select(
        "doc_id", F.coalesce("comp", "doc_id").alias("comp")
    )
    return labels, rounds


def q_dedup_groups_star(spark, sf_dir) -> DataFrame:
    """Same contract and oracle as q_dedup_groups, computed with the
    large-star/small-star algorithm — the diameter-independent scale
    path for pathological (chain-shaped) duplicate graphs."""
    pairs = (
        q_dedup_minhash_lsh(spark, sf_dir)
        .filter(F.col("est_sim") >= CC_SIM_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    labels, _ = cc_labels_star(spark, docs(spark, sf_dir).select("doc_id"), pairs)
    return labels.select(
        "doc_id",
        F.col("comp").alias("canonical_id"),
        (F.col("comp") < F.col("doc_id")).alias("is_duplicate"),
    )


# ---------------------------------------------------------------------------
# 2. stratified sampling: deterministic per-source top-K by salted hash

SAMPLE_K = 20


def q_sample_stratified(spark, sf_dir) -> DataFrame:
    """Keep the K docs per source whose salted content hash ranks lowest —
    a reproducible stratified sample (same rows on every run/cluster).
    Uses the two-level distributed rank (functions/topk.py), so no source
    strata ever sorts in a single task."""
    from .topk import ranked_in_group

    d = docs(spark, sf_dir).select(
        "doc_id",
        "source",
        h32(F.concat(F.lit("smp|"), F.col("doc_id").cast("string"))).alias("rk"),
    )
    ranked = ranked_in_group(d, "source", [F.col("rk"), F.col("doc_id")], two_level=True)
    return ranked.filter(F.col("rn") <= SAMPLE_K).select(
        "doc_id", "source", F.col("rn").cast("int").alias("sample_rank")
    )


def _sql_sample_stratified() -> str:
    rk = h32_sql("'smp|' || CAST(doc_id AS VARCHAR)")
    return f"""
      SELECT doc_id, source, CAST(rn AS INT) AS sample_rank FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY {rk}, doc_id) AS rn
        FROM documents
      ) WHERE rn <= {SAMPLE_K}
    """


# ---------------------------------------------------------------------------
# 3. heavy hitters: corpus-wide top-K word bigrams

BIGRAM_TOP_K = 20


def q_heavy_hitter_bigrams(spark, sf_dir) -> DataFrame:
    """Top-K most frequent word bigrams with counts. Catalyst plans the
    groupBy as partial+final hash aggregation (map-side combine), and the
    ordered limit as TakeOrdered — no global sort materializes. The
    (n DESC, bigram ASC) order is total, so the K-set is deterministic."""
    w = F.col("w")
    seq = F.when(F.size(w) >= 2, F.sequence(F.lit(1), F.size(w) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        docs(spark, sf_dir)
        .select(F.split(F.col("text"), " ").alias("w"))
        .select("w", F.explode(seq).alias("i"))
        .select(F.array_join(F.slice("w", F.col("i"), 2), " ").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(BIGRAM_TOP_K)
    )


SQL_HEAVY_HITTER_BIGRAMS = f"""
  SELECT array_to_string(list_slice(w, i, i + 1), ' ') AS bigram,
         CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT w, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
    FROM (SELECT string_split(text, ' ') AS w FROM documents)
  )
  GROUP BY 1
  ORDER BY n DESC, bigram ASC
  LIMIT {BIGRAM_TOP_K}
"""


# ---------------------------------------------------------------------------
# 4. per-source document-length quantiles (exact, R-7 interpolation)


def q_doc_length_quantiles(spark, sf_dir) -> DataFrame:
    d = docs(spark, sf_dir)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("n_chars", F.lit(0.99)), 4).alias("p99"),
    )


SQL_DOC_LENGTH_QUANTILES = """
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         round(avg(n_chars), 4) AS avg_chars,
         round(quantile_cont(n_chars, 0.5), 4) AS p50,
         round(quantile_cont(n_chars, 0.9), 4) AS p90,
         round(quantile_cont(n_chars, 0.99), 4) AS p99
  FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# 5. 64-bit SimHash near-dup pairs (round 3 — the production signature
# width; the 16-bit variant in dataops.py stays as the demo-width oracle)
#
# The 64-bit signature is kept as two 32-bit halves (slo = bits 0-31,
# shi = bits 32-63): every intermediate stays in [0, 2^32), so no
# signed-overflow anywhere under ANSI mode in Spark and no HUGEINT in
# DuckDB. Pigeonhole banding: hamming <= 3 over 64 bits ⇒ at least one
# of the 4 16-bit chunks is equal, so an equi-join on (chunk_idx, chunk
# value) is a lossless candidate generator — same argument as the
# 16-bit demo operator, now at production width. Chunk width matters:
# 8-bit chunks (ham <= 7) measured a 32% candidate ratio on sf0.1
# (simhash bits are word-frequency-biased, so coarse buckets collide);
# 16-bit chunks keep the bucket join selective (tools/measure_recall.py
# records the measured ratio).

SIMHASH64_HAM_MAX = 3
SIMHASH64_CHUNKS = SIMHASH64_HAM_MAX + 1  # 4 chunks × 16 bits
SIMHASH64_CHUNK_BITS = 16
SIMHASH64_CHUNK_MASK = (1 << SIMHASH64_CHUNK_BITS) - 1


def _simhash64(spark, sf_dir) -> DataFrame:
    d = docs(spark, sf_dir)
    wh = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .select("doc_id", F.md5("word").alias("m"))
        .select(
            "doc_id",
            F.conv(F.substring("m", 1, 8), 16, 10).cast("long").alias("hi"),
            F.conv(F.substring("m", 9, 8), 16, 10).cast("long").alias("lo"),
        )
    )
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("lo"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(32)
    ] + [
        F.sum(
            F.when(F.shiftright(F.col("hi"), b - 32).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(32, 64)
    ]
    agg = wh.groupBy("doc_id").agg(*sums)
    slo = sum(
        [F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)) for b in range(32)],
        F.lit(0),
    )
    shi = sum(
        [F.when(F.col(f"s{b}") > 0, F.lit(1 << (b - 32))).otherwise(F.lit(0)) for b in range(32, 64)],
        F.lit(0),
    )
    return agg.select("doc_id", slo.cast("long").alias("slo"), shi.cast("long").alias("shi"))


def q_simhash64_pairs(spark, sf_dir) -> DataFrame:
    s = _simhash64(spark, sf_dir).cache()

    def chunk(i: int):
        col = "slo" if i < 2 else "shi"
        return F.shiftright(F.col(col), SIMHASH64_CHUNK_BITS * (i % 2)).bitwiseAND(
            F.lit(SIMHASH64_CHUNK_MASK)
        )

    t = s.select(
        "doc_id",
        "slo",
        "shi",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("ci"), chunk(i).alias("cv"))
                    for i in range(SIMHASH64_CHUNKS)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "slo", "shi", "ch.ci", "ch.cv")
    cand = (
        t.alias("a")
        .join(
            t.alias("b"),
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.slo").alias("alo"),
            F.col("a.shi").alias("ahi"),
            F.col("b.slo").alias("blo"),
            F.col("b.shi").alias("bhi"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("alo").bitwiseXOR(F.col("blo"))) + F.bit_count(
        F.col("ahi").bitwiseXOR(F.col("bhi"))
    )
    return cand.filter(ham <= SIMHASH64_HAM_MAX).select(
        "doc_a", "doc_b", ham.cast("long").alias("hamming")
    )


def _sql_simhash64_pairs() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (lo >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(32)
    ) + ", " + ", ".join(
        f"sum(CASE WHEN (hi >> {b - 32}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(32, 64)
    )
    bits_lo = " + ".join(f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(32))
    bits_hi = " + ".join(
        f"CASE WHEN s{b} > 0 THEN {1 << (b - 32)} ELSE 0 END" for b in range(32, 64)
    )
    return f"""
      WITH wh AS (
        SELECT doc_id,
               ('0x' || substr(md5(w), 1, 8))::BIGINT AS hi,
               ('0x' || substr(md5(w), 9, 8))::BIGINT AS lo
        FROM documents, unnest(string_split(text, ' ')) AS t(w)
      ),
      agg AS (SELECT doc_id, {sums} FROM wh GROUP BY doc_id),
      s AS (SELECT doc_id, CAST({bits_lo} AS BIGINT) AS slo,
                   CAST({bits_hi} AS BIGINT) AS shi FROM agg)
      SELECT a.doc_id doc_a, b.doc_id doc_b,
             CAST(bit_count(xor(a.slo, b.slo)) + bit_count(xor(a.shi, b.shi)) AS BIGINT) AS hamming
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.slo, b.slo)) + bit_count(xor(a.shi, b.shi)) <= {SIMHASH64_HAM_MAX}
    """


# ---------------------------------------------------------------------------
# 6. BPE-ish token counting (round 3): subword-granularity token estimate
# via a tokenizer-shaped regex — letter runs, single digits, single
# punctuation marks — the pre-merge alphabet a byte-pair encoder starts
# from, so counts upper-bound real BPE vocab counts the way practitioners
# budget corpus token costs. Pattern sticks to the regex syntax common to
# Java (Spark rlike family) and RE2/DuckDB. Whitespace counts
# (token_count_by_source, dataops.py) remain the word-level metric.

BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def q_token_count_bpe(spark, sf_dir) -> DataFrame:
    from .dataops import _word_count

    d = docs(spark, sf_dir).select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), F.lit(0))).alias("bpe"),
        _word_count(F.col("text")).alias("ws"),
    )
    agg = d.groupBy("source").agg(
        F.sum("bpe").cast("long").alias("bpe_tokens"),
        F.sum("ws").cast("long").alias("ws_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return agg.select(
        "source",
        "bpe_tokens",
        "ws_tokens",
        "n_docs",
        F.round(F.col("bpe_tokens") / F.col("ws_tokens"), 6).alias("tokens_per_word"),
    )


SQL_TOKEN_COUNT_BPE = f"""
  WITH d AS (
    SELECT source,
           len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS bpe,
           len(text) - len(replace(text, ' ', '')) + 1 AS ws
    FROM documents
  )
  SELECT source,
         CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
         CAST(sum(ws) AS BIGINT) AS ws_tokens,
         CAST(count(*) AS BIGINT) AS n_docs,
         round(CAST(sum(bpe) AS DOUBLE) / sum(ws), 6) AS tokens_per_word
  FROM d GROUP BY source
"""


# ---------------------------------------------------------------------------
# 7. Rabin-Karp rolling-hash fingerprint (round 3): the true O(n)-per-doc
# rolling polynomial hash the brief names — each 8-char window hashes to
# Σ ord(c_j)·B^(7-j) mod M, fingerprint = min over windows (winnowing
# min-sketch). The Spark side is a vectorized Arrow pandas UDF (numpy
# sliding windows — built-in exprs would recompute each window from
# scratch, O(n·G) like q_doc_fingerprint does); the DuckDB oracle spells
# the same polynomial per window explicitly. B/M chosen so every product
# fits comfortably in int64 for both engines (code points ≤ 0x10FFFF,
# powers < 2^31, 8-term sums < 2^56).

RH_GRAM = 8
RH_BASE = 257
RH_MOD = (1 << 31) - 1
_RH_POWS = [pow(RH_BASE, RH_GRAM - 1 - j, RH_MOD) for j in range(RH_GRAM)]


def _rolling_fp_batch(texts):
    import numpy as np
    import pandas as pd

    pows = np.array(_RH_POWS, dtype=np.uint64)
    out = np.empty(len(texts), dtype=np.int64)
    for k, s in enumerate(texts):
        # utf-32-le decode = vectorized unicode code points (== ord())
        a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        w = np.lib.stride_tricks.sliding_window_view(a, RH_GRAM)
        out[k] = int(((w * pows[None, :]).sum(axis=1) % RH_MOD).min())
    return pd.Series(out)


def q_doc_fingerprint_rolling(spark, sf_dir) -> DataFrame:
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("long")
    def rolling_fp(texts):
        return _rolling_fp_batch(texts)

    return (
        docs(spark, sf_dir)
        .filter(F.length("text") >= RH_GRAM)  # no sub-window docs (none in data)
        .select("doc_id", rolling_fp(F.col("text")).alias("rolling_fp"))
    )


def _sql_doc_fingerprint_rolling() -> str:
    terms = " + ".join(
        f"CAST(ord(substr(text, i + {j}, 1)) AS BIGINT) * {p}"
        for j, p in enumerate(_RH_POWS)
    )
    return f"""
      WITH w AS (
        SELECT doc_id, text,
               unnest(generate_series(1, len(text) - {RH_GRAM - 1})) AS i
        FROM documents WHERE len(text) >= {RH_GRAM}
      )
      SELECT doc_id, min(({terms}) % {RH_MOD}) AS rolling_fp
      FROM w GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# 8. int8 embedding quantization (round 3): symmetric per-vector scalar
# quantization — scale = max|v|/127, q_j = clamp(round(v_j/scale)) — the
# storage-shrink step ahead of ANN indexing (4x smaller vectors, dot
# products in int arithmetic). Rounding is floor(x + 0.5) in BOTH
# engines (identical IEEE semantics; engine round() modes differ on
# halves), and the checked outputs are exact integers (sum/absmax of
# the quantized codes) plus the 6dp scale — no float-summation-order
# sensitivity anywhere.


def q_embedding_quantize(spark, sf_dir) -> DataFrame:
    from .dataops import emb

    e = emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    absmax = F.array_max(F.transform("v", lambda x: F.abs(x)))
    scale = absmax / F.lit(127.0)
    q = F.transform(
        "v",
        lambda x: F.greatest(
            F.lit(-127.0), F.least(F.lit(127.0), F.floor(x / scale + F.lit(0.5)))
        ).cast("int"),
    )
    return e.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.aggregate(q, F.lit(0), lambda acc, x: acc + x).cast("long").alias("sum_q"),
        F.array_max(q).cast("long").alias("max_q"),
        F.array_min(q).cast("long").alias("min_q"),
    )


SQL_EMBEDDING_QUANTIZE = """
  WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  s AS (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
    FROM e
  ),
  q AS (
    SELECT vec_id, scale,
           list_transform(v, x -> CAST(greatest(-127.0, least(127.0, floor(x / scale + 0.5))) AS INT)) AS qv
    FROM s
  )
  SELECT vec_id, round(scale, 6) AS scale,
         CAST(list_sum(qv) AS BIGINT) AS sum_q,
         CAST(list_max(qv) AS BIGINT) AS max_q,
         CAST(list_min(qv) AS BIGINT) AS min_q
  FROM q
"""


# ---------------------------------------------------------------------------
# 9. keep-one-per-cluster (round 3): the corpus-cleaning decision the
# dedup machinery exists for — within each near-dup component keep the
# highest-quality document (rank over the ROUNDED quality + doc_id, a
# total order shared by both engines, so the keep set is deterministic).
# The window partitions by canonical_id: components are small cliques,
# so no task ever sorts more than one clique.


def q_dedup_keep_best(spark, sf_dir) -> DataFrame:
    from pyspark.sql import Window

    from .dataops import q_text_quality

    groups = q_dedup_groups(spark, sf_dir)
    qual = q_text_quality(spark, sf_dir).select("doc_id", "quality")
    j = groups.join(qual, "doc_id")
    w = Window.partitionBy("canonical_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    return j.withColumn("rn", F.row_number().over(w)).select(
        "doc_id",
        "canonical_id",
        "quality",
        (F.col("rn") == 1).alias("keep"),
    )


def _sql_dedup_keep_best() -> str:
    return f"""
      WITH groups AS ({_sql_dedup_groups()}),
      qual AS (SELECT doc_id, quality FROM ({_sql_text_quality_ref()}) )
      SELECT doc_id, canonical_id, quality,
             row_number() OVER (
               PARTITION BY canonical_id ORDER BY quality DESC, doc_id ASC
             ) = 1 AS keep
      FROM groups JOIN qual USING (doc_id)
    """


def _sql_text_quality_ref() -> str:
    from .dataops import _sql_text_quality

    return _sql_text_quality()


# ---------------------------------------------------------------------------
# 8. context-window chunking (round 4): the step between dedup/quality
# and tokenization in a training pipeline — split every document into
# fixed-token windows with overlap for a model's context length.
# Pure Catalyst (split → sequence → explode → slice): a narrow map with
# no shuffle at all; at 100 TB this pipelines with the parquet scan.

CHUNK_W = 32  # window length (tokens)
CHUNK_S = 24  # stride (overlap = W - S = 8)


def q_doc_chunking(spark, sf_dir) -> DataFrame:
    """(doc_id, chunk_idx, n_tok, chunk_text): windows of CHUNK_W
    whitespace tokens starting at multiples of CHUNK_S; the last window
    of a doc may be short (start < n_tokens guaranteed)."""
    d = docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(0), F.floor((F.size(toks) - 1) / CHUNK_S).cast("int")
    )
    ch = d.select(
        "doc_id", toks.alias("toks"), F.explode(starts).alias("chunk_idx")
    )
    sl = F.slice(
        F.col("toks"), F.col("chunk_idx") * CHUNK_S + 1, F.lit(CHUNK_W)
    )
    return ch.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(sl).cast("long").alias("n_tok"),
        F.array_join(sl, " ").alias("chunk_text"),
    )


def _sql_doc_chunking() -> str:
    return f"""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      ),
      c AS (
        SELECT doc_id, toks,
               unnest(generate_series(
                 0, CAST(floor((len(toks) - 1) / {CHUNK_S}) AS INT))) AS chunk_idx
        FROM t
      )
      SELECT doc_id,
             CAST(chunk_idx AS BIGINT) AS chunk_idx,
             CAST(len(list_slice(toks, chunk_idx * {CHUNK_S} + 1,
                                 chunk_idx * {CHUNK_S} + {CHUNK_W})) AS BIGINT) AS n_tok,
             array_to_string(list_slice(toks, chunk_idx * {CHUNK_S} + 1,
                                        chunk_idx * {CHUNK_S} + {CHUNK_W}), ' ') AS chunk_text
      FROM c
    """


# ---------------------------------------------------------------------------
# 9. benchmark-contamination check (round 4): flag documents containing
# any of a probe-phrase set (eval-set n-grams). A narrow map over a
# broadcast-sized probe list; at 100 TB with large probe sets this
# becomes the n-gram-fingerprint join (doc_fingerprint_rolling ⋈ probe
# fingerprints) — this operator is the exact small-probe-set path.

CONTAM_PROBES = ["big vector", "fast key", "table part", "value table"]


def q_contamination(spark, sf_dir) -> DataFrame:
    d = docs(spark, sf_dir)
    hits = None
    for p in CONTAM_PROBES:
        h = F.contains(F.col("text"), F.lit(p)).cast("int")
        hits = h if hits is None else hits + h
    return d.select(
        "doc_id",
        hits.cast("long").alias("n_probe_hits"),
        (hits > 0).alias("contaminated"),
    )


def _sql_contamination() -> str:
    terms = " + ".join(
        f"CASE WHEN position('{p}' IN text) > 0 THEN 1 ELSE 0 END"
        for p in CONTAM_PROBES
    )
    return f"""
      SELECT doc_id,
             CAST({terms} AS BIGINT) AS n_probe_hits,
             ({terms}) > 0 AS contaminated
      FROM documents
    """


# ---------------------------------------------------------------------------
# 10. repetition quality stats (round 4): the Gopher-style repetition
# filters (Rae et al. 2021 §A1.1) — duplicate-word fraction and
# top-unigram fraction per document. One explode + two hash aggs keyed
# on doc_id; partial aggregation collapses the word counts map-side.

def q_doc_repetition(spark, sf_dir) -> DataFrame:
    """(doc_id, n_words, dup_word_frac, top_word_frac): fraction of word
    occurrences beyond each word's first, and the most frequent word's
    share — high values flag boilerplate/degenerate docs."""
    d = docs(spark, sf_dir)
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    per_word = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    agg = per_word.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    return agg.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.round(1 - F.col("n_distinct") / F.col("n_words"), 6).alias("dup_word_frac"),
        F.round(F.col("top_c") / F.col("n_words"), 6).alias("top_word_frac"),
    )


def _sql_doc_repetition() -> str:
    return """
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      ),
      pw AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word)
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_words,
             round(1 - count(*) / CAST(sum(c) AS DOUBLE), 6) AS dup_word_frac,
             round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_word_frac
      FROM pw GROUP BY doc_id
    """


def dataops2_queries() -> dict[str, tuple]:
    return {
        "dedup_groups_connected": (q_dedup_groups, _sql_dedup_groups()),
        "dedup_groups_star": (q_dedup_groups_star, _sql_dedup_groups()),
        "doc_chunking": (q_doc_chunking, _sql_doc_chunking()),
        "contamination_check": (q_contamination, _sql_contamination()),
        "doc_repetition_stats": (q_doc_repetition, _sql_doc_repetition()),
        "sample_stratified": (q_sample_stratified, _sql_sample_stratified()),
        "heavy_hitter_bigrams": (q_heavy_hitter_bigrams, SQL_HEAVY_HITTER_BIGRAMS),
        "doc_length_quantiles": (q_doc_length_quantiles, SQL_DOC_LENGTH_QUANTILES),
        "dedup_simhash64_pairs": (q_simhash64_pairs, _sql_simhash64_pairs()),
        "token_count_bpe": (q_token_count_bpe, SQL_TOKEN_COUNT_BPE),
        "doc_fingerprint_rolling": (q_doc_fingerprint_rolling, _sql_doc_fingerprint_rolling()),
        "embedding_quantize_int8": (q_embedding_quantize, SQL_EMBEDDING_QUANTIZE),
        "dedup_keep_best": (q_dedup_keep_best, _sql_dedup_keep_best()),
    }
