"""Export helpers: re-nesting (appendAndMoveToTraces analogue) and the
decision-export → decision-span re-ingest round trip (the reference's
horizontal-scaling story, DESIGN.md:148-167)."""

from atlassian_sampling_processor_spark.config import EngineConfig, parse_policies
from atlassian_sampling_processor_spark.export import decision_export_to_sequences, export_nested
from atlassian_sampling_processor_spark.pipeline import SamplingPipeline

from .helpers import seq_table_from_spans, trace_id

SP2 = [{"name": "sc2", "type": "span_count", "span_count": {"min_spans": 2}}]
NEVER = [{"name": "never", "type": "probabilistic", "probabilistic": {"sampling_percentage": 0}}]


def test_export_nested_regroups(spark):
    spans = [
        dict(doc_id=trace_id(400), span_id=1, batch_idx=0),
        dict(doc_id=trace_id(400), span_id=2, batch_idx=1),
        dict(doc_id=trace_id(401), span_id=3, batch_idx=0),
    ]
    df = seq_table_from_spans(spark, spans)
    nested = export_nested(df).collect()
    got = {r.doc_id: r for r in nested}
    assert got[trace_id(400)].span_count == 2
    assert got[trace_id(401)].span_count == 1
    # arrival order preserved (batch 0 span before batch 1 span)
    assert [s.batch_idx for s in got[trace_id(400)].spans] == [0, 1]


def test_decision_export_reingest_roundtrip(spark, tmp_path):
    """Node A samples a trace + flushes; node B ingests A's decision
    export and immediately releases late spans for that trace."""
    t = trace_id(410)
    pipe_a = SamplingPipeline(
        spark, parse_policies(SP2), EngineConfig(),
        checkpoint_dir=str(tmp_path / "ck_a"), output_dir=str(tmp_path / "out_a"),
    )
    pipe_a.run(
        seq_table_from_spans(
            spark,
            [dict(doc_id=t, span_id=1, batch_idx=0), dict(doc_id=t, span_id=2, batch_idx=0)],
        )
    )
    out = pipe_a.flush()
    assert out["decision_rows"] == 1
    dec_export = spark.read.parquet(str(tmp_path / "out_a" / "decision_export" / "batch=1"))

    # node B: first batch = the decision spans; second batch = late spans
    pipe_b = SamplingPipeline(
        spark, parse_policies(NEVER), EngineConfig(),
        checkpoint_dir=str(tmp_path / "ck_b"), output_dir=str(tmp_path / "out_b"),
    )
    dec_seqs = decision_export_to_sequences(dec_export, batch_idx=0)
    late = seq_table_from_spans(spark, [dict(doc_id=t, span_id=9, batch_idx=1)])
    pipe_b.process_batch(dec_seqs, 0)
    pipe_b.process_batch(late.filter("batch_idx = 1"), 1)

    dec = pipe_b.store.read("decision_state", 1).collect()
    assert len(dec) == 1 and dec[0].doc_id == t and dec[0].decision == 2
    keep = pipe_b.read_sink("keep").collect()
    assert len(keep) == 1 and keep[0].reason == "late_sampled" and keep[0].doc_id == t
