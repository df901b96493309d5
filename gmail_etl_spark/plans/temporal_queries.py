"""Temporal operator catalog: as-of join (DuckDB's native ASOF JOIN is
the oracle), banded range join (oracle: plain inequality join), and the
hypertable-style multi-granularity time rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmail_etl_spark.operators.temporal import asof_join, range_join_pairs
from gmail_etl_spark.plans.catalog import load_table, query

# ---------------------------------------------------------------------------
# q64 — as-of join: each purchase picks up the latest prior error
# ---------------------------------------------------------------------------


@query(
    "q64_asof_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           e.event_id AS error_id_asof,
           e.value AS error_value_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    ORDER BY purchase_id
    """,
    survey="custom-asof",
)
def q64_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        purchases,
        errors,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("event_id_asof").alias("error_id_asof"),
        F.col("value_asof").alias("error_value_asof"),
    ).orderBy("purchase_id")


# ---------------------------------------------------------------------------
# q65 — banded range join: event pairs within 60s per user
# ---------------------------------------------------------------------------


@query(
    "q65_range_join",
    oracle="""
    SELECT a.user_id,
           a.event_id AS a_id,
           b.event_id AS b_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND (
           (epoch_us(b.ts) - epoch_us(a.ts) > 0
            AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000)
        OR (epoch_us(b.ts) = epoch_us(a.ts) AND a.event_id < b.event_id)
         )
    ORDER BY a.user_id, a_id, b_id
    """,
    survey="custom-range-join",
)
def q65_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return range_join_pairs(ev, "user_id", "ts", "event_id", band_seconds=60).orderBy(
        "user_id", "a_id", "b_id"
    )


# ---------------------------------------------------------------------------
# q66 — hypertable rollup: hour + day granularities in one pass
# ---------------------------------------------------------------------------


@query(
    "q66_time_rollup",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_bucket,
           CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP (day_bucket, hour_bucket)
    ORDER BY day_bucket NULLS FIRST, hour_bucket NULLS FIRST
    """,
    survey="custom-hypertable,X5",
)
def q66_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate shape: day and hour rollups (plus the grand
    total) computed in one grouping-sets pass over the fact scan — the
    single-scan alternative to materializing each granularity
    separately."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_micros("ts") / F.lit(1_000_000)
    bucketed = ev.select(
        (F.floor(epoch / 86400) * 86400).cast("long").alias("day_bucket"),
        (F.floor(epoch / 3600) * 3600).cast("long").alias("hour_bucket"),
        "value",
    )
    return (
        bucketed.rollup("day_bucket", "hour_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .orderBy(
            F.col("day_bucket").asc_nulls_first(), F.col("hour_bucket").asc_nulls_first()
        )
    )
