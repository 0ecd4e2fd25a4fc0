"""Third wave of training-data pipeline operators (round 5):

* **dedup_ngram_coverage** — duplicate n-gram coverage per document
  (the substring-level dedup signal of Lee et al., "Deduplicating
  Training Data Makes Language Models Better", 2021): the fraction of a
  document's word 5-grams that occur in ≥2 distinct documents. Shape:
  narrow gram explode → one groupBy(gram) with map-side partial agg →
  one equi-join back on gram → per-doc agg. The gram table is the
  standard dedup working set; at 100 TB add a document-frequency cap on
  the exploded grams (as dedup_ngram_jaccard does) and/or hash grams to
  int64 before the shuffle to shrink the exchange.
* **pii_redact** — PII detection/redaction (email, IPv4, 16-digit card
  numbers) as pure regexp_count/regexp_replace chains. The corpus is
  synthetic, so the builder deterministically augments a slice of the
  documents with PII-shaped spans (keyed on doc_id) and then redacts —
  the oracle performs the identical augmentation in SQL, so the
  (detect, replace) chain itself is what the value-hash pins. Patterns
  use the Java-regex ∩ RE2 common dialect (no lookarounds).
* **quality_filter_c4** — C4-style quality heuristics (Raffel et al.
  2020 §2.2 adapted to the corpus shape): word-count bounds, mean word
  length in [3, 10], must contain a stopword, no '{' (code), no
  "lorem ipsum"; emits the per-rule signals plus the conjunctive keep
  flag. Pure string expressions, zero-shuffle narrow map.
* **tfidf_top_terms** — per-document top-3 terms by tf·idf
  (idf = ln(N/df)), the classic salient-term extractor: explode →
  tf groupBy (doc_id, word) → df groupBy word → broadcast N → window
  rank inside doc_id. Ties break on the term string so the rank is
  deterministic; both engines compute the same IEEE double score.
* **sample_weighted** — deterministic weighted sampling without
  replacement (Efraimidis–Spirakis A-ES): key = ln(u)/weight with
  u ∈ (0,1) derived from the shared md5-substring hash, keep the
  global top-K keys. TakeOrdered top-K (no full sort); at 100 TB this
  is one pass + a size-K heap per partition.

Like dataops.py/dataops2.py, every operator ships as a (Spark builder,
DuckDB oracle SQL) pair over the same parquet tables, float columns
rounded identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dataops import docs

# ---------------------------------------------------------------------------
# 1. duplicate n-gram coverage (Lee et al. substring-level dedup signal)

NGRAM_W = 5  # words per gram


def q_ngram_coverage(spark, sf_dir) -> DataFrame:
    """(doc_id, n_grams, dup_grams, dup_frac): per-position word 5-grams,
    a gram is duplicated when ≥2 DISTINCT documents contain it."""
    d = docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("w"))
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(w) - {NGRAM_W - 1}, 0)),"
                f" i -> array_join(slice(w, i, {NGRAM_W}), ' '))"
            )
        ).alias("gram"),
    )
    gram_docs = grams.groupBy("gram").agg(
        F.count_distinct("doc_id").alias("ndocs")
    )
    per = (
        grams.join(gram_docs, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0)).alias("dup_grams"),
        )
    )
    base = docs(spark, sf_dir).select("doc_id")
    return base.join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("dup_grams", F.lit(0)).cast("long").alias("dup_grams"),
        F.round(
            F.coalesce(F.col("dup_grams") / F.col("n_grams"), F.lit(0.0)), 6
        ).alias("dup_frac"),
    )


def _sql_ngram_coverage() -> str:
    w = NGRAM_W
    return f"""
      WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      g AS (
        SELECT doc_id, array_to_string(w[i:i+{w - 1}], ' ') AS gram
        FROM ws, UNNEST(range(1, greatest(len(w) - {w - 2}, 1))) AS t(i)
      ),
      nd AS (SELECT gram, count(DISTINCT doc_id) AS ndocs FROM g GROUP BY gram),
      per AS (
        SELECT g.doc_id, count(*) AS n_grams,
               sum(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END) AS dup_grams
        FROM g JOIN nd USING (gram) GROUP BY g.doc_id
      )
      SELECT d.doc_id,
             CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
             CAST(coalesce(per.dup_grams, 0) AS BIGINT) AS dup_grams,
             round(coalesce(per.dup_grams / CAST(per.n_grams AS DOUBLE), 0.0), 6)
               AS dup_frac
      FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """


# ---------------------------------------------------------------------------
# 2. PII redaction

_PII_EMAIL = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b(\d{1,3}\.){3}\d{1,3}\b"
_PII_CARD = r"\b\d{16}\b"


def _augmented_text():
    """Deterministic PII-shaped augmentation keyed on doc_id (the corpus
    is synthetic word soup with no PII): docs ≡0 mod 3 gain an email,
    ≡0 mod 4 an IPv4, ≡0 mod 5 a 16-digit number."""
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(F.lit(" host 10.0."), (did % 256).cast("string"), F.lit(".7")),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" card 4111111111"), F.lpad((did % 1000000).cast("string"), 6, "0")),
        ).otherwise(F.lit("")),
    )


_AUG_SQL = """
  text
  || CASE WHEN doc_id % 3 = 0
          THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
          ELSE '' END
  || CASE WHEN doc_id % 4 = 0
          THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
          ELSE '' END
  || CASE WHEN doc_id % 5 = 0
          THEN ' card 4111111111' || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0')
          ELSE '' END
"""


def q_pii_redact(spark, sf_dir) -> DataFrame:
    """(doc_id, n_emails, n_ips, n_cards, redacted_md5): count each PII
    class, then redact in a fixed order (email → IPv4 → card) and emit
    the md5 of the redacted text (full text stays out of the result)."""
    d = docs(spark, sf_dir).select("doc_id", _augmented_text().alias("aug"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), _PII_EMAIL, "<EMAIL>"),
            _PII_IPV4,
            "<IP>",
        ),
        _PII_CARD,
        "<CARD>",
    )
    return d.select(
        "doc_id",
        F.regexp_count("aug", F.lit(_PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count("aug", F.lit(_PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count("aug", F.lit(_PII_CARD)).cast("long").alias("n_cards"),
        F.md5(red).alias("redacted_md5"),
    )


def _sql_pii_redact() -> str:
    email, ip, card = _PII_EMAIL, _PII_IPV4, _PII_CARD
    return f"""
      WITH a AS (SELECT doc_id, {_AUG_SQL} AS aug FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(aug, '{email}')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(aug, '{ip}')) AS BIGINT) AS n_ips,
             CAST(len(regexp_extract_all(aug, '{card}')) AS BIGINT) AS n_cards,
             md5(regexp_replace(regexp_replace(regexp_replace(aug,
                 '{email}', '<EMAIL>', 'g'),
                 '{ip}', '<IP>', 'g'),
                 '{card}', '<CARD>', 'g')) AS redacted_md5
      FROM a
    """


# ---------------------------------------------------------------------------
# 3. C4-style quality filter

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_MIN_WORDS, _MAX_WORDS = 10, 100_000


def q_quality_filter_c4(spark, sf_dir) -> DataFrame:
    """(doc_id, word_count, mean_word_len, stop_frac, has_brace, keep):
    C4 §2.2 adapted to the corpus (word bounds stand in for the
    sentence-count rule; the corpus has no line structure)."""
    d = docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("w"), "n_chars")
    stoplist = ",".join(f"'{s}'" for s in _STOPWORDS)
    wc = F.size("w")
    # mean word length: chars minus the (wc-1) separators, over wc
    mwl = (F.col("n_chars") - (wc - F.lit(1))) / wc
    stop_frac = F.size(F.expr(f"filter(w, x -> x IN ({stoplist}))")) / wc
    has_brace = F.array_contains(F.col("w"), "{") | F.exists(
        "w", lambda x: x.contains("{")
    )
    lorem = F.array_join("w", " ").contains("lorem ipsum")
    keep = (
        (wc >= _MIN_WORDS)
        & (wc <= _MAX_WORDS)
        & (mwl >= 3.0)
        & (mwl <= 10.0)
        & (stop_frac > 0.0)
        & ~has_brace
        & ~lorem
    )
    return d.select(
        "doc_id",
        wc.cast("long").alias("word_count"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(stop_frac, 6).alias("stop_frac"),
        has_brace.alias("has_brace"),
        keep.alias("keep"),
    )


def _sql_quality_filter_c4() -> str:
    stoplist = ",".join(f"'{s}'" for s in _STOPWORDS)
    return f"""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws, n_chars, text
                 FROM documents)
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS word_count,
             round((n_chars - (len(ws) - 1)) / CAST(len(ws) AS DOUBLE), 6)
               AS mean_word_len,
             round(len(list_filter(ws, x -> x IN ({stoplist})))
                   / CAST(len(ws) AS DOUBLE), 6) AS stop_frac,
             (len(list_filter(ws, x -> contains(x, '{{'))) > 0) AS has_brace,
             (len(ws) >= {_MIN_WORDS} AND len(ws) <= {_MAX_WORDS}
              AND (n_chars - (len(ws) - 1)) / CAST(len(ws) AS DOUBLE) >= 3.0
              AND (n_chars - (len(ws) - 1)) / CAST(len(ws) AS DOUBLE) <= 10.0
              AND len(list_filter(ws, x -> x IN ({stoplist}))) > 0
              AND len(list_filter(ws, x -> contains(x, '{{'))) = 0
              AND NOT contains(text, 'lorem ipsum')) AS keep
      FROM w
    """


# ---------------------------------------------------------------------------
# 4. per-document top-k terms by tf·idf

TFIDF_TOPK = 3


def q_tfidf_top_terms(spark, sf_dir) -> DataFrame:
    """(doc_id, term, tf, score): top-3 terms per document by
    tf · ln(N/df); deterministic ties on the term string. N arrives as a
    broadcast one-row aggregate — no driver round trip."""
    d = docs(spark, sf_dir)
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # one-row N joined on a constant key → BroadcastHashJoin, not a
    # nested-loop cross join (keeps the no-cartesian plan audit clean)
    n = d.agg(F.count(F.lit(1)).alias("n_docs")).withColumn("k", F.lit(1))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn("k", F.lit(1))
        .join(F.broadcast(n), "k")
        .withColumn("score", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("score").desc(), F.col("term").asc()
        )
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= TFIDF_TOPK)
        .select(
            "doc_id", "term", F.col("tf").cast("long").alias("tf"),
            F.round("score", 6).alias("score"),
        )
    )


def _sql_tfidf_top_terms() -> str:
    return f"""
      WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      ),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               tf.tf * ln(n.n_docs / CAST(dfreq.df AS DOUBLE)) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
      ),
      ranked AS (
        SELECT *, row_number() OVER (
                 PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
        FROM scored
      )
      SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, round(score, 6) AS score
      FROM ranked WHERE rk <= {TFIDF_TOPK}
    """


# ---------------------------------------------------------------------------
# 5. deterministic weighted sampling (Efraimidis–Spirakis A-ES)

WEIGHTED_K = 50


def q_sample_weighted(spark, sf_dir) -> DataFrame:
    """(doc_id, key): global top-K of key = ln(u)/weight with
    u = (md5_56(doc_id)+1)/2^56 ∈ (0,1] and weight = n_chars —
    equivalent to keys u^(1/w), the weighted-sample-without-replacement
    priority (Efraimidis & Spirakis 2006). orderBy+limit compiles to
    TakeOrdered (per-partition size-K heaps), not a full sort."""
    d = docs(spark, sf_dir)
    h56 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 14), 16, 10
    ).cast("long")
    u = (h56 + F.lit(1)) / F.lit(float(1 << 56))
    key = F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", key.alias("key"))
        .orderBy(F.col("key").desc(), F.col("doc_id").asc())
        .limit(WEIGHTED_K)
        .select("doc_id", F.round("key", 6).alias("key"))
    )


def _sql_sample_weighted() -> str:
    return f"""
      SELECT doc_id,
             round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT + 1)
                      / CAST({1 << 56} AS DOUBLE)) / n_chars, 6) AS key
      FROM documents
      ORDER BY ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT + 1)
                  / CAST({1 << 56} AS DOUBLE)) / n_chars DESC, doc_id ASC
      LIMIT {WEIGHTED_K}
    """


def dataops3_queries() -> dict[str, tuple]:
    return {
        "dedup_ngram_coverage": (q_ngram_coverage, _sql_ngram_coverage()),
        "pii_redact": (q_pii_redact, _sql_pii_redact()),
        "quality_filter_c4": (q_quality_filter_c4, _sql_quality_filter_c4()),
        "tfidf_top_terms": (q_tfidf_top_terms, _sql_tfidf_top_terms()),
        "sample_weighted": (q_sample_weighted, _sql_sample_weighted()),
    }
