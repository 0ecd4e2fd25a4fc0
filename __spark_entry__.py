"""Driver contract for the spark-graft builder (PySpark target).

Maps every implemented operator from SURVEY.md §2 (sampling decision
engine) plus the training-data ops (dedup / similarity / text /
multimodal) to a (Spark query, DuckDB oracle) pair. The heavy lifting
lives in ``atlassian_sampling_processor_spark.queries`` and
``...functions.dataops``; this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full ordered-policy decision chain
    (status_code → span_count → latency → probabilistic/FNV) with
    first-decisive-wins over the sf0.001 events corpus."""
    from atlassian_sampling_processor_spark.queries import q_decider_chain

    return q_decider_chain(spark, "/root/testdata/sf0.001")


def _all() -> dict[str, tuple]:
    from atlassian_sampling_processor_spark.functions.dataops import dataops_queries
    from atlassian_sampling_processor_spark.functions.dataops2 import dataops2_queries
    from atlassian_sampling_processor_spark.functions.dataops3 import dataops3_queries
    from atlassian_sampling_processor_spark.functions.incremental import incremental_queries
    from atlassian_sampling_processor_spark.functions.logops import logops_queries
    from atlassian_sampling_processor_spark.queries import sampling_queries

    out = dict(sampling_queries())
    out.update(dataops_queries())
    out.update(dataops2_queries())
    out.update(dataops3_queries())
    out.update(logops_queries())
    out.update(incremental_queries())
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: builder for name, (builder, _sql) in _all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_b, sql) in _all().items() if sql is not None}
