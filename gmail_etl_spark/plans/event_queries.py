"""Event-time catalog entries (SURVEY §2.6 / X5): tumbling, sliding and
session windows plus stateful-dedup semantics, expressed on the batch
``events`` table so DuckDB can oracle them.  The same window expressions
run unchanged under Structured Streaming (gmail_etl_spark/streaming/).

Epoch-second buckets are returned as BIGINT on both engines so the hash
compare is precision-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmail_etl_spark.plans.catalog import load_table, query

# ---------------------------------------------------------------------------
# q60 — tumbling window aggregation
# ---------------------------------------------------------------------------


@query(
    "q60_tumbling_window",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events
    GROUP BY bucket_start, event_type
    ORDER BY bucket_start, event_type
    """,
    survey="X5,ST1",
    headline=True,
)
def q60_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").cast("long").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("bucket_start", "event_type")
    )


# ---------------------------------------------------------------------------
# q61 — sliding window (10 min window, 5 min slide → 2 windows/event)
# ---------------------------------------------------------------------------


@query(
    "q61_sliding_window",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 300) * 300 - off AS BIGINT) AS bucket_start,
           COUNT(*) AS n_events
    FROM events, (SELECT unnest([0, 300]) AS off)
    GROUP BY bucket_start
    ORDER BY bucket_start
    """,
    survey="X5",
)
def q61_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("long").alias("bucket_start"), "n_events")
        .orderBy("bucket_start")
    )


# ---------------------------------------------------------------------------
# q62 — session windows (5-minute gap) per user
# ---------------------------------------------------------------------------


@query(
    "q62_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 5 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts) + INTERVAL 5 MINUTE) AS session_end_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start_us
    """,
    survey="X5,ST2",
)
def q62_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window; the oracle derives identical
    sessions via gaps-and-islands.  Session end = last event + gap
    (session_window's close semantics)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
        .orderBy("user_id", "session_start_us")
    )


# ---------------------------------------------------------------------------
# q63 — stateful dedup semantics (ST2): first event per key
# ---------------------------------------------------------------------------


@query(
    "q63_first_event_per_key",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id,
           epoch_us(ts) AS first_ts_us, n_events
    FROM (
        SELECT user_id, event_type, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_events
        FROM events
    )
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    survey="ST2,J3",
)
def q63_first_event_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id", "event_type")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("n_events", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.unix_micros("ts").alias("first_ts_us"),
            "n_events",
        )
        .orderBy("user_id", "event_type")
    )
