"""Distributed per-group recency ranking for capacity eviction.

The eviction rank (pipeline.py step 5, mirroring lru_cache.go:94-99)
needs ``row_number() over (partition by tier order by recency desc)``.
A plain window puts each tier in ONE task — bounded here because the
ranked input is capped at (capacity + batch traces), but a single-task
sort at 10⁸-key capacities is the wrong shape. ``two_level=True``
computes the exact same ranks with no single-task sort:

1. ``repartitionByRange`` on (group, order) — Spark's range partitioner
   puts globally-ordered key ranges in partition-id order;
2. a per-(group, partition) local ``row_number`` — parallel;
3. per-(group, partition) counts (small driver collect, one row per
   task) → cumulative offsets, broadcast back;
4. ``rank = offset + local_rank``.

Exactness: within a group, partition ids ascend with the sort order, so
offset(p) = Σ counts of earlier partitions gives the global rank. The
order columns must form a total order (include a unique key) for the
two plans to be bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_in_group(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    two_level: bool = False,
) -> DataFrame:
    """Adds ``rn``: the 1-based rank of each row within ``group_col``
    under ``order_cols``. ``two_level`` picks the distributed plan."""
    if not two_level:
        w = Window.partitionBy(group_col).orderBy(*order_cols)
        return df.withColumn("rn", F.row_number().over(w))

    parted = df.repartitionByRange(F.col(group_col), *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy(group_col, "_pid").orderBy(*order_cols)
    local = parted.withColumn("_lrn", F.row_number().over(w)).persist()
    # the offset table is one row per (group × partition) — fine for the
    # current uses (2 tiers, ~20 sources, 2 decision kinds). At very
    # large group cardinality this collect should stay distributed: a
    # window over the per-partition counts (sum over _pid < this _pid
    # within group) yields the same offsets with no driver round-trip.
    counts = (
        local.groupBy(group_col, "_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    offsets, running = [], {}
    for r in sorted(counts, key=lambda r: (str(r[group_col]), r["_pid"])):
        g = r[group_col]
        offsets.append((g, r["_pid"], running.get(g, 0)))
        running[g] = running.get(g, 0) + r["_n"]
    spark = df.sparkSession
    gtype = dict(df.dtypes)[group_col]
    off_df = spark.createDataFrame(
        offsets, schema=f"{group_col} {gtype}, _pid int, _off long"
    )
    out = (
        local.join(F.broadcast(off_df), [group_col, "_pid"])
        .withColumn("rn", (F.col("_off") + F.col("_lrn")).cast("int"))
        .drop("_pid", "_lrn", "_off")
    )
    return out
