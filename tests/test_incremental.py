"""Incremental cross-batch dedup: survivors, determinism, exactly-once
replay, disk resume, torn-write invisibility."""

import os

from pyspark.sql import functions as F

from atlassian_sampling_processor_spark.functions.incremental import IncrementalDeduper


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_batch_dedup_and_within_batch_representative(spark, tmp_path):
    dd = IncrementalDeduper(spark, str(tmp_path))
    b0 = _df(spark, [(1, "aa"), (5, "aa"), (2, "bb")])  # within-batch dup
    out0 = {r.doc_id for r in dd.process(b0, 0).collect()}
    assert out0 == {1, 2}  # min doc_id represents "aa"
    b1 = _df(spark, [(7, "aa"), (8, "cc"), (9, "bb"), (3, "dd")])
    out1 = {r.doc_id for r in dd.process(b1, 1).collect()}
    assert out1 == {8, 3}  # "aa"/"bb" already seen in batch 0


def test_replay_is_noop_and_resume_from_disk(spark, tmp_path):
    dd = IncrementalDeduper(spark, str(tmp_path))
    assert dd.last_committed_batch() is None
    dd.process(_df(spark, [(1, "aa")]), 0)
    assert dd.last_committed_batch() == 0  # batch 0 exists — not falsy-lost
    # replay of the committed batch: empty, state untouched
    assert dd.process(_df(spark, [(1, "aa")]), 0).count() == 0
    # a FRESH object resumes from the marker + store on disk
    dd2 = IncrementalDeduper(spark, str(tmp_path))
    assert dd2.last_committed_batch() == 0
    out = {r.doc_id for r in dd2.process(_df(spark, [(2, "aa"), (3, "ee")]), 1).collect()}
    assert out == {3}


def test_torn_write_invisible_until_marker(spark, tmp_path):
    dd = IncrementalDeduper(spark, str(tmp_path))
    dd.process(_df(spark, [(1, "aa")]), 0)
    # simulate a torn batch-1 write: data landed, marker did NOT flip
    torn = os.path.join(str(tmp_path), "seen", "v=1")
    _df(spark, [(99, "zz")]).select(F.md5("text").alias("text_hash")).write.parquet(torn)
    dd2 = IncrementalDeduper(spark, str(tmp_path))
    assert dd2.last_committed_batch() == 0
    # reprocessing batch 1 scrubs the torn layout and commits cleanly;
    # "zz" from the torn write must NOT count as seen
    out = {r.doc_id for r in dd2.process(_df(spark, [(4, "zz")]), 1).collect()}
    assert out == {4}
    assert dd2.last_committed_batch() == 1
