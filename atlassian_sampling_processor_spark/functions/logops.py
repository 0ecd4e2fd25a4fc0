"""Log-analytics operators over the events table (round 5) — the
classic telemetry-pipeline trio the reference's users run downstream of
sampling (tier: log_pipeline):

* **sessionize_events** — gap-based sessionization: a new session starts
  when a user's inter-event gap exceeds 30 minutes (the canonical
  web-analytics rule). One keyed shuffle on user_id; the lag/cumsum
  windows run inside each user partition, so the plan is
  Exchange(user_id) → Sort → Window → HashAggregate — no global sort,
  scales with the key cardinality.
* **funnel_conversion** — strictly-ordered funnel view → click →
  purchase: stage k counts only events after the stage k−1 timestamp
  (min-after semantics, the standard product-analytics definition).
  Three keyed aggregations + two joins on user_id; every pass is
  map-side-partial + equi-join, no pairwise blowup.
* **events_rollup_cube** — (event_type × hour-of-day) CUBE rollup with
  exact integer value sums: `value` is fixed-pointed to int64 BEFORE
  summing (floor(value·1000)), because double summation order differs
  between engines/partitions and would break both the value-hash gate
  and cross-run reproducibility at scale. Map-side partial aggregation
  over 4 grouping sets.

Each ships as a (Spark builder, DuckDB oracle SQL) pair like the
dataops modules; timestamps are naive wall times read identically in
the UTC-pinned Spark session and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def _events(spark, sf_dir) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# 1. gap-based sessionization


def q_sessionize(spark, sf_dir) -> DataFrame:
    """(user_id, session_idx, n_events, start_us, end_us, duration_sec):
    sessions split at >30-min gaps; (ts, event_id) is the total order so
    ties are deterministic in both engines."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    cum = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = flagged.withColumn("session_idx", F.sum("new_sess").over(cum))
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
        )
        .select(
            "user_id",
            F.col("session_idx").cast("long").alias("session_idx"),
            F.col("n_events").cast("long").alias("n_events"),
            "start_us",
            "end_us",
            F.round((F.col("end_us") - F.col("start_us")) / 1e6, 6).alias("duration_sec"),
        )
    )


SQL_SESSIONIZE = f"""
  WITH ev AS (
    SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
  ),
  flagged AS (
    SELECT user_id, event_id, us,
           CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w > {SESSION_GAP_US} THEN 1 ELSE 0 END
             AS new_sess
    FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
  ),
  sess AS (
    SELECT user_id, us,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_idx
    FROM flagged
  )
  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         CAST(count(*) AS BIGINT) AS n_events,
         min(us) AS start_us, max(us) AS end_us,
         round((max(us) - min(us)) / 1e6, 6) AS duration_sec
  FROM sess GROUP BY user_id, session_idx
"""


# ---------------------------------------------------------------------------
# 2. strictly-ordered funnel


def q_funnel(spark, sf_dir) -> DataFrame:
    """(user_id, reached_stage, t1_us, t2_us, t3_us): stage 1 = first
    'view', stage 2 = first 'click' AFTER stage 1, stage 3 = first
    'purchase' AFTER stage 2 (strict ordering, min-after semantics)."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    t1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("t1_us")
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("us") > F.col("t1_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2_us"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("us") > F.col("t2_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3_us"))
    )
    users = ev.select("user_id").distinct()
    out = users.join(t1, "user_id", "left").join(t2, "user_id", "left").join(
        t3, "user_id", "left"
    )
    stage = (
        F.when(F.col("t3_us").isNotNull(), 3)
        .when(F.col("t2_us").isNotNull(), 2)
        .when(F.col("t1_us").isNotNull(), 1)
        .otherwise(0)
    )
    return out.select(
        "user_id", stage.cast("long").alias("reached_stage"), "t1_us", "t2_us", "t3_us"
    )


SQL_FUNNEL = """
  WITH ev AS (
    SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
  ),
  t1 AS (SELECT user_id, min(us) AS t1_us FROM ev WHERE event_type = 'view'
         GROUP BY user_id),
  t2 AS (SELECT ev.user_id, min(us) AS t2_us FROM ev JOIN t1 USING (user_id)
         WHERE event_type = 'click' AND us > t1_us GROUP BY ev.user_id),
  t3 AS (SELECT ev.user_id, min(us) AS t3_us FROM ev JOIN t2 USING (user_id)
         WHERE event_type = 'purchase' AND us > t2_us GROUP BY ev.user_id)
  SELECT u.user_id,
         CAST(CASE WHEN t3_us IS NOT NULL THEN 3
                   WHEN t2_us IS NOT NULL THEN 2
                   WHEN t1_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS reached_stage,
         t1_us, t2_us, t3_us
  FROM (SELECT DISTINCT user_id FROM ev) u
  LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
  LEFT JOIN t3 USING (user_id)
"""


# ---------------------------------------------------------------------------
# 3. CUBE rollup with exact integer sums


def q_rollup_cube(spark, sf_dir) -> DataFrame:
    """(event_type, hour, n_events, value_milli): full CUBE over
    (event_type × hour-of-day). `value` is fixed-pointed to milli-units
    BEFORE the sum so the aggregate is exact integer math — double
    summation order is partition-dependent and would not reproduce."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).cast("long").alias("hour"),
        F.floor(F.col("value") * 1000).cast("long").alias("milli"),
    )
    return (
        ev.cube("event_type", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("milli").alias("value_milli"),
        )
    )


SQL_ROLLUP_CUBE = """
  SELECT event_type,
         CAST(strftime(CAST(ts AS TIMESTAMP), '%H') AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS n_events,
         sum(CAST(floor(value * 1000) AS BIGINT)) AS value_milli
  FROM events
  GROUP BY CUBE (event_type, CAST(strftime(CAST(ts AS TIMESTAMP), '%H') AS BIGINT))
"""


# ---------------------------------------------------------------------------
# 4. z-score outliers with exact integer moments


def q_value_outliers(spark, sf_dir) -> DataFrame:
    """(event_id, event_type, z): events whose `value` deviates > 2σ from
    their type's mean. Both moments are EXACT integer sums over
    fixed-point milli-units (Σm < 2⁶³, Σm² < 2⁶³ for this domain), so
    mean/σ are the same IEEE doubles in every engine and partition
    order; per-type stats broadcast back onto the events."""
    ev = _events(spark, sf_dir).select(
        "event_id", "event_type", F.floor(F.col("value") * 1000).cast("long").alias("m")
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("m").alias("s1"),
        F.sum(F.col("m") * F.col("m")).alias("s2"),
    )
    j = ev.join(F.broadcast(stats), "event_type")
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    z = (F.col("m") - mean) / F.sqrt(var)
    return (
        j.filter(F.abs(z) > 2.0)
        .select("event_id", "event_type", F.round(z, 6).alias("z"))
    )


SQL_VALUE_OUTLIERS = """
  WITH ev AS (
    SELECT event_id, event_type, CAST(floor(value * 1000) AS BIGINT) AS m
    FROM events
  ),
  st AS (
    SELECT event_type, count(*) AS n, sum(m) AS s1, sum(m * m) AS s2
    FROM ev GROUP BY event_type
  )
  SELECT event_id, ev.event_type,
         round((m - s1 / CAST(n AS DOUBLE))
               / sqrt(s2 / CAST(n AS DOUBLE)
                      - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))), 6)
           AS z
  FROM ev JOIN st ON ev.event_type = st.event_type
  WHERE abs((m - s1 / CAST(n AS DOUBLE))
            / sqrt(s2 / CAST(n AS DOUBLE)
                   - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))) > 2.0
"""


# ---------------------------------------------------------------------------
# 5. event-type transition mining

TRANSITIONS_TOPK = 20


def q_event_transitions(spark, sf_dir) -> DataFrame:
    """(prev_type, next_type, n): global top-20 consecutive event-type
    transitions within each user's (ts, event_id)-ordered stream — the
    Markov-chain edge counts of the event log. Lag window inside the
    user_id shuffle → partial-agg count → TakeOrdered top-K; ties break
    on the pair strings."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    return (
        pairs.groupBy(F.col("prev_type"), F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "prev_type", "next_type")
        .limit(TRANSITIONS_TOPK)
    )


SQL_EVENT_TRANSITIONS = f"""
  WITH ev AS (
    SELECT user_id, event_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us
    FROM events
  ),
  pairs AS (
    SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
             AS prev_type,
           event_type AS next_type
    FROM ev
  )
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
  ORDER BY n DESC, prev_type, next_type
  LIMIT {TRANSITIONS_TOPK}
"""


def logops_queries() -> dict[str, tuple]:
    return {
        "sessionize_events": (q_sessionize, SQL_SESSIONIZE),
        "funnel_conversion": (q_funnel, SQL_FUNNEL),
        "events_rollup_cube": (q_rollup_cube, SQL_ROLLUP_CUBE),
        "events_value_outliers": (q_value_outliers, SQL_VALUE_OUTLIERS),
        "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
    }
