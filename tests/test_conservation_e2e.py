"""Whole-corpus row-conservation invariant, end to end.

The verify drive's contract (processor.go's implicit guarantee: every
consumed span is either forwarded, dropped, or held and later flushed —
nothing vanishes): run the full pipeline over a generated corpus with
decision spans and tiny caches, then assert

  1. every non-decision-span source row lands in EXACTLY one sink row
     (multiset equality both directions on (doc_id, tokens) — byte-exact
     tokens, no dup, no loss),
  2. decision-span rows are consumed (never routed to a sink),
  3. the invariant survives resume (second run() = 0 batches) and a
     double flush.

A round-5 /verify session reported 3 docs losing one row each on the
late_not_sampled path at this exact config; five fresh end-to-end runs
could not reproduce it (missing=0 every time, including after resume +
double flush) — this test pins the invariant permanently so any real
recurrence fails loudly in the suite.
"""

import shutil

import pyspark.sql.functions as F

from atlassian_sampling_processor_spark import datagen
from atlassian_sampling_processor_spark.config import load_config
from atlassian_sampling_processor_spark.parse import parse_sequences
from atlassian_sampling_processor_spark.pipeline import SamplingPipeline


def test_full_corpus_conservation(spark, tmp_path):
    d = str(tmp_path)
    corpus = datagen.generate_sequences_parquet(
        f"{d}/seq.parquet", n_traces=500, seed=7, decision_span_frac=0.02
    )
    eng, pols = load_config(
        {
            "max_traces": 80,  # force heavy eviction (steady-state mode)
            "secondary_cache_size": 12,
            "sampling_policies": [
                {
                    "name": "errors",
                    "type": "status_code",
                    "status_code": {"status_codes": ["ERROR"]},
                },
                {
                    "name": "pct5",
                    "type": "probabilistic",
                    "probabilistic": {"sampling_percentage": 5},
                },
            ],
        }
    )
    pipe = SamplingPipeline(spark, pols, eng, f"{d}/ck", f"{d}/out")
    seqs = spark.read.parquet(corpus)
    results = pipe.run(seqs)
    assert len(results) == 4
    pipe.flush()

    src = parse_sequences(spark.read.parquet(corpus))
    src_reg = src.filter(~F.col("is_decision_span")).select("doc_id", "tokens")
    src_dec = src.filter(F.col("is_decision_span")).select("doc_id", "tokens")

    def check():
        out = spark.read.option("basePath", f"{d}/out/routed").parquet(
            f"{d}/out/routed"
        )
        routed = out.filter(F.col("reason") != "not_sampled_placeholder").select(
            "doc_id", "tokens"
        )
        # decision spans are consumed, never forwarded (processor.go:436-480)
        assert routed.intersect(src_dec).count() == 0
        # multiset equality: no row lost, no row duplicated
        assert src_reg.exceptAll(routed).count() == 0, "source rows missing from sinks"
        assert routed.exceptAll(src_reg).count() == 0, "sink rows not in source"

    check()

    # resume: a second run over the same corpus processes nothing new and
    # must not disturb the sinks; same for a second flush
    assert pipe.run(seqs) == []
    assert pipe.flush()["flushed_rows"] == 0
    check()

    shutil.rmtree(d, ignore_errors=True)
