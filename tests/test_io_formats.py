"""Table-format adapter: parquet round trip everywhere; iceberg: URIs
fail fast with an actionable error when the runtime is absent (and scan
for real when it is)."""

import pytest

from atlassian_sampling_processor_spark.io_formats import (
    iceberg_available,
    read_table,
    write_table,
)


def test_parquet_round_trip(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    write_table(df, str(tmp_path / "t"), mode="overwrite")
    back = read_table(spark, str(tmp_path / "t"))
    assert back.count() == 10
    write_table(df, str(tmp_path / "t"), mode="append")
    assert read_table(spark, str(tmp_path / "t")).count() == 20


def test_iceberg_uri_fails_fast_without_runtime(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; the fail-fast branch is moot")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_table(spark, "iceberg:cat.db.tbl")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        write_table(spark.range(1), "iceberg:cat.db.tbl")


def test_iceberg_scan_when_available(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime in this container")
    spark.sql("CREATE TABLE IF NOT EXISTS ib_t (doc_id BIGINT) USING iceberg")
    write_table(spark.range(5).withColumnRenamed("id", "doc_id"), "iceberg:ib_t")
    assert read_table(spark, "iceberg:ib_t").count() >= 5


def test_bad_iceberg_write_mode(spark):
    with pytest.raises((RuntimeError, ValueError)):
        write_table(spark.range(1), "iceberg:cat.db.tbl", mode="merge")
