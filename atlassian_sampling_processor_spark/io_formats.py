"""Table-format adapter: parquet paths and Iceberg table identifiers.

The north-rule corpus lives in Iceberg tables (`spark.read
.format("iceberg")` scans, `df.writeTo(...).append()` sinks — SURVEY.md
§2.1 rows for ConsumeTraces and the sampled sink). This sandbox ships no
Iceberg runtime jars, so the adapter resolves the format at call time:

* ``iceberg:catalog.db.table`` → the Iceberg DataSourceV2 path, with a
  fail-fast, actionable error when the runtime is absent (the same
  fail-to-start posture the config loader takes for bad policies);
* anything else → a parquet path, which is what every test and the
  driver corpus use.

Why not bake the format in: on a real cluster the SAME pipeline code
must run against warehouse tables (snapshot isolation, hidden
partitioning, compaction) and against raw parquet staging dirs; routing
every scan/sink through these two functions keeps the choice a URI
concern, not a code fork. Iceberg's commit protocol also supersedes this
engine's own atomic-marker checkpoints when available — the state
chains in state.py deliberately reimplement the same merge-on-read +
snapshot-marker ideas over plain parquet so resumability doesn't depend
on the runtime being present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"

_ICEBERG_MARKER_CLASS = (
    "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
)


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_ICEBERG_MARKER_CLASS)
        return True
    except Exception:
        return False


def _require_iceberg(spark: SparkSession, ident: str) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            f"input {ICEBERG_PREFIX}{ident} needs the Iceberg Spark runtime "
            "(iceberg-spark-runtime jar + spark.sql.extensions="
            f"{_ICEBERG_MARKER_CLASS}), which this session does not have; "
            "use a parquet path, or submit with --packages "
            "org.apache.iceberg:iceberg-spark-runtime-<spark_ver>"
        )


def read_table(spark: SparkSession, uri: str) -> DataFrame:
    """``iceberg:catalog.db.tbl`` or a parquet path → DataFrame."""
    if uri.startswith(ICEBERG_PREFIX):
        ident = uri[len(ICEBERG_PREFIX):]
        _require_iceberg(spark, ident)
        return spark.read.format("iceberg").load(ident)
    return spark.read.parquet(uri)


def write_table(df: DataFrame, uri: str, mode: str = "append") -> None:
    """Append/overwrite ``df`` to an Iceberg table or a parquet path.

    Iceberg appends are atomic snapshot commits (the cluster-grade
    replacement for the engine's marker-file protocol); the parquet
    branch keeps the plain layout the rest of the repo manages itself.
    """
    if uri.startswith(ICEBERG_PREFIX):
        ident = uri[len(ICEBERG_PREFIX):]
        _require_iceberg(df.sparkSession, ident)
        if mode == "append":
            df.writeTo(ident).append()
        elif mode == "overwrite":
            df.writeTo(ident).createOrReplace()
        else:
            raise ValueError(f"unsupported Iceberg write mode {mode!r}")
        return
    df.write.mode(mode).parquet(uri)
