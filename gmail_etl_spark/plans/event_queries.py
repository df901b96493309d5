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


# ---------------------------------------------------------------------------
# q67 — ordered conversion funnel (view → click → purchase per user)
# ---------------------------------------------------------------------------


@query(
    "q67_event_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS c_ts
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.v_ts
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        GROUP BY e.user_id
    )
    SELECT v.user_id,
           epoch_us(v.v_ts) AS view_us,
           epoch_us(c.c_ts) AS click_us,
           epoch_us(p.p_ts) AS purchase_us,
           1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT AS steps_completed
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    ORDER BY v.user_id
    """,
    survey="X5,2.5-agg",
)
def q67_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: first view, first click strictly after that view,
    first purchase strictly after that click.  Three filtered min-aggs
    joined on user_id — each stage's join key is the aggregation key, so
    the per-stage shuffles reuse the same partitioning."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("v_ts").alias("view_us"),
            F.unix_micros("c_ts").alias("click_us"),
            F.unix_micros("p_ts").alias("purchase_us"),
            (
                F.lit(1)
                + F.col("c_ts").isNotNull().cast("int")
                + F.col("p_ts").isNotNull().cast("int")
            ).alias("steps_completed"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q68 — winsorized robust stats per event type (curation: outlier clipping)
# ---------------------------------------------------------------------------


@query(
    "q68_winsorized_stats",
    oracle="""
    WITH b AS (
        SELECT event_type,
               -- round the bounds before any comparison: engines may differ
               -- in the last ulp of the interpolated percentile, which would
               -- otherwise flip clip counts on values equal to the bound
               round(quantile_cont(value, 0.05), 6) AS lo,
               round(quantile_cont(value, 0.95), 6) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           SUM(CAST(round(least(greatest(e.value, b.lo), b.hi) * 100) AS BIGINT)) / 100.0
               AS winsorized_sum,
           CAST(SUM((e.value < b.lo)::INT) AS BIGINT) AS n_clipped_low,
           CAST(SUM((e.value > b.hi)::INT) AS BIGINT) AS n_clipped_high,
           COUNT(*) AS n_events
    FROM events e JOIN b ON b.event_type = e.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    survey="X3,2.5-agg",
)
def q68_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize values at the exact per-group p05/p95, then aggregate in
    integer cents (order-independent).  The percentile table is tiny (one
    row per event type) and broadcasts back onto the scan."""
    e = load_table(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.05)), 6).alias("lo"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(F.broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(
            (F.sum(F.round(clipped * 100).cast("bigint")) / F.lit(100.0)).alias(
                "winsorized_sum"
            ),
            F.sum((F.col("value") < F.col("lo")).cast("int")).alias("n_clipped_low"),
            F.sum((F.col("value") > F.col("hi")).cast("int")).alias("n_clipped_high"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q73 — z-score outliers per event type (exact integer-sum moments)
# ---------------------------------------------------------------------------


@query(
    "q73_value_outliers",
    oracle="""
    WITH m AS (
        SELECT event_type,
               SUM(CAST(round(value * 100) AS BIGINT)) AS s1,
               SUM(CAST(round(value * 100) AS BIGINT)
                   * CAST(round(value * 100) AS BIGINT)) AS s2,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           round((CAST(round(e.value * 100) AS BIGINT) - CAST(m.s1 AS DOUBLE) / m.n)
                 / sqrt(CAST(m.s2 AS DOUBLE) / m.n
                        - (CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n)),
                 6) AS z
    FROM events e JOIN m ON m.event_type = e.event_type
    WHERE abs((CAST(round(e.value * 100) AS BIGINT) - CAST(m.s1 AS DOUBLE) / m.n)
              / sqrt(CAST(m.s2 AS DOUBLE) / m.n
                     - (CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n))) > 2.5
    ORDER BY e.event_id
    """,
    survey="X3,2.5-agg",
)
def q73_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score per event against its type's moments.  Both
    moments are exact integer-cents sums (order-independent); the mean /
    variance / sqrt arithmetic is then identical double math on both
    engines, rounded in-query.  The moments table is one row per type —
    broadcast back onto the scan, no second shuffle of the fact table."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    m = e.groupBy("event_type").agg(
        F.sum(cents).alias("s1"),
        F.sum(cents * cents).alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    z = (cents - mean) / F.sqrt(var)
    return (
        e.join(F.broadcast(m), "event_type")
        .filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", "value", F.round(z, 6).alias("z"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q79 — applyInArrow grouped histogram (2.7 extension surface)
# ---------------------------------------------------------------------------


@query(
    "q79_arrow_histogram",
    oracle="""
    SELECT user_id, CAST(floor(value / 50.0) AS BIGINT) AS bin, COUNT(*) AS n
    FROM events
    WHERE user_id < 30
    GROUP BY user_id, CAST(floor(value / 50.0) AS BIGINT)
    ORDER BY user_id, bin
    """,
    survey="2.7-udf",
)
def q79_arrow_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value histogram via the zero-copy applyInArrow grouped
    map — integer bins/counts make the Python kernel oracle-checkable."""
    from gmail_etl_spark.functions.grouped import arrow_value_histogram

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return arrow_value_histogram(e, "user_id", "value", 50).orderBy("user_id", "bin")


# ---------------------------------------------------------------------------
# q111 — event-type transition matrix (per-user Markov chain)
# ---------------------------------------------------------------------------


@query(
    "q111_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ), counts AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           ROUND(n / SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM counts
    ORDER BY from_type, to_type
    """,
    survey="X5,2.5-agg",
)
def q111_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: LEAD within (user, ts, event_id) order pairs each event
    with its successor, then (from, to) counts row-normalize into
    transition probabilities — session-behavior mining in two window
    passes.

    Scale posture: the sequence window shuffles once on user_id (the
    natural key, same partitioning a sessionizer uses); the transition
    count is a partial-aggregating groupBy over event-type pairs
    (bounded by |types|²), and the normalization window runs on that
    tiny matrix.  The probability is one integer division rounded
    identically on both engines."""
    e = load_table(spark, sf_dir, "events")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(Window.partitionBy("from_type")), 6).alias(
            "p"
        ),
    ).orderBy("from_type", "to_type")


# ---------------------------------------------------------------------------
# q114 — MAD (median absolute deviation) outlier report
# ---------------------------------------------------------------------------


@query(
    "q114_mad_outliers",
    oracle="""
    WITH med AS (
        -- round med/mad at computation time: they feed the > 3*mad
        -- comparison, so an engine ulp difference would flip counts
        SELECT event_type, ROUND(MEDIAN(value), 6) AS med
        FROM events GROUP BY event_type
    ), mad AS (
        SELECT e.event_type,
               ROUND(MEDIAN(ABS(e.value - m.med)), 6) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type
    )
    SELECT e.event_type,
           m.med AS med,
           d.mad AS mad,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN ABS(e.value - m.med) > 3 * d.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    GROUP BY e.event_type, m.med, d.mad
    ORDER BY event_type
    """,
    survey="2.5-agg,X5",
)
def q114_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type via median absolute
    deviation — the robust-statistics counterpart of the z-score pass
    (q73): median and MAD are insensitive to the very outliers being
    hunted, so one extreme value can't mask others.

    Two grouped exact-percentile aggregations (map-side partial), each
    result re-entering via broadcast (one row per event type) — the
    events table is scanned, never shuffled on a data-sized key.  med
    and mad are rounded to 6 dp at computation time on both engines —
    they feed the > 3*mad comparison, so a last-ulp interpolation
    difference would otherwise flip outlier counts."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    with_med = e.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad")
    )
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .select("event_type", "med", "mad", "n_events", "n_outliers")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q138 — salted skew join (X6): hot-key join spread over sub-keys
# ---------------------------------------------------------------------------


@query(
    "q138_salted_skew_join",
    oracle="""
    WITH dim AS (
        SELECT event_type,
               length(event_type) * 10 AS type_weight
        FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) * MAX(d.type_weight)
                AS BIGINT) AS weighted_cents
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    survey="X6,2.5-agg",
)
def q138_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated dimension join, oracle-proven equivalent to the
    plain join: events are hot on event_type (5 keys carry the whole
    table — the worst case for a hash join's reducer skew), so the join
    runs through ``salted_join``: the fact side scatters over 8
    deterministic sub-keys, the 5-row dimension replicates 8×, and the
    shuffle key becomes (event_type, salt) — a hot key spreads over 8
    reducers instead of melting one.  The oracle is the UNSALTED join:
    a green hash row proves salting is a pure execution-strategy change
    with identical semantics.

    At 100 TB this is the explicit form of what AQE's skew-join split
    does when statistics catch it; explicit salting is the insurance
    for the cases runtime stats miss (first run, exchange reuse)."""
    from gmail_etl_spark.operators.skew import salted_join

    e = load_table(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn("type_weight", (F.length("event_type") * 10).cast("long"))
    )
    joined = salted_join(e, dim, key="event_type", salt_from="event_id", n=8)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long"))
                * F.max("type_weight")
            ).cast("long").alias("weighted_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q147 — two-phase aggregation on a skewed key (X6), oracle = plain agg
# ---------------------------------------------------------------------------


@query(
    "q147_two_phase_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_rows
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey="X6,2.5-agg",
)
def q147_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit two-phase aggregation on the hot event_type key: partial
    sums on (key, salt) then a final combine on key — the insurance form
    for aggregates whose partial-agg Spark disables (high-cardinality
    collect state) or where one reducer would otherwise take a whole
    key.  The oracle is the plain one-phase aggregate: a green hash row
    proves the decomposition is semantics-free.  Decimal partials keep
    the sum order-independent across the extra combine level."""
    from gmail_etl_spark.operators.skew import two_phase_agg

    e = load_table(spark, sf_dir, "events")
    return (
        two_phase_agg(e, key="event_type", value="value", salt_from="event_id", n=8)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q155 — sequential pattern mining: frequent per-user action trigrams
# ---------------------------------------------------------------------------


@query(
    "q155_event_trigrams",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               LEAD(event_type, 1) OVER w AS nxt1,
               LEAD(event_type, 2) OVER w AS nxt2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || nxt1 || '>' || nxt2 AS trigram,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT user_id) AS n_users
    FROM ordered
    WHERE nxt2 IS NOT NULL
    GROUP BY trigram
    ORDER BY n_occurrences DESC, trigram
    LIMIT 20
    """,
    survey="X5,2.5-window",
)
def q155_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining: the most frequent three-step action
    sequences across users (the behavioral n-grams a funnel designer or
    an agent-trajectory curator ranks).  Each user's event stream is
    ordered once (ts, event_id total order), trigrams come from two
    LEADs over that one window, and the count is a plain aggregate —
    one per-user shuffle plus one tiny trigram shuffle, no self-joins.

    At 100 TB the per-user window is the natural partitioning (user_id
    shuffle with AQE skew split for power users); the trigram domain is
    |event_types|³ — bounded, so the final aggregate is never large."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    ).filter(F.col("nxt2").isNotNull())
    return (
        ordered.select(
            F.concat_ws(">", "event_type", "nxt1", "nxt2").alias("trigram"),
            "user_id",
        )
        .groupBy("trigram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("trigram"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q165 — late-data audit: what a given watermark would have dropped
# ---------------------------------------------------------------------------


@query(
    "q165_late_data_audit",
    oracle="""
    WITH arrivals AS (
        -- event_id is the arrival proxy: the high-water mark of event
        -- time seen so far in arrival order
        SELECT event_id, ts, user_id,
               MAX(ts) OVER (ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) AS hwm
        FROM events
    )
    SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_start,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN ts < hwm - INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_late_30m,
           CAST(SUM(CASE WHEN ts < hwm - INTERVAL 5 MINUTE
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_late_5m
    FROM arrivals
    GROUP BY bucket_start
    ORDER BY bucket_start
    """,
    survey="X5,ST2",
)
def q165_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing, answered from history: per 10-minute window,
    how many events arrived LATER than a 5-minute / 30-minute watermark
    would tolerate (event time below the running event-time high-water
    mark, in arrival order, minus the delay).  This is the audit a
    streaming team runs before choosing `withWatermark` — too tight
    drops these counts on the floor, too loose holds state for nothing.

    One arrival-order running max (the same cumulative window the
    stream's watermark tracker maintains), then a tumbling-window
    rollup; exact integer counts.

    Scale shape: the running max is the two-phase distributed prefix
    (operators/distributed_window.py) — range-partition by arrival
    order, parallel per-partition running max, tiny broadcast carry —
    not a single-partition ``Window.orderBy``; row-identical by
    tests/test_distributed_window.py."""
    from gmail_etl_spark.operators.distributed_window import attach_prefix_agg

    e = load_table(spark, sf_dir, "events")
    arrivals = attach_prefix_agg(
        e.select("ts", "event_id"), ["event_id"], "ts", "hwm", op="max"
    ).select("ts", "hwm")
    late_30 = (F.col("ts") < F.col("hwm") - F.expr("INTERVAL 30 MINUTES")).cast("int")
    late_5 = (F.col("ts") < F.col("hwm") - F.expr("INTERVAL 5 MINUTES")).cast("int")
    return (
        arrivals.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(late_30).cast("long").alias("n_late_30m"),
            F.sum(late_5).cast("long").alias("n_late_5m"),
        )
        .select(
            F.col("w.start").cast("long").alias("bucket_start"),
            "n_events",
            "n_late_30m",
            "n_late_5m",
        )
        .orderBy("bucket_start")
    )


# ---------------------------------------------------------------------------
# q166 — exponential recency decay: per-user freshness-weighted activity
# ---------------------------------------------------------------------------


@query(
    "q166_recency_decay_scores",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS mx FROM events),
    aged AS (
        -- truncate EACH timestamp to whole seconds before differencing,
        -- matching Spark's unix_timestamp; epoch(interval) would keep
        -- fractional seconds and flip hour buckets at boundaries
        SELECT user_id,
               CAST(floor((floor(epoch((SELECT mx FROM anchor)))
                           - floor(epoch(ts))) / 3600) AS BIGINT) AS age_h
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(POWER(0.5, CAST(age_h AS DOUBLE) / 24.0), 9)
                AS DECIMAL(20,9))) AS DOUBLE) AS decayed_score
    FROM aged
    GROUP BY user_id
    ORDER BY user_id
    """,
    survey="X5,2.5-agg",
)
def q166_recency_decay_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-weighted activity: each event contributes
    0.5^(age_hours/24) — a 24-hour half-life — relative to the corpus
    max timestamp, summed per user.  The recency weighting behind data
    freshness sampling and decayed engagement metrics.

    Ages quantize to integer hours before the pow (exact on both
    engines); each decay term rounds to 9 dp and accumulates as exact
    DECIMAL (the order-proof discipline), so the per-user float sum is
    engine-identical.  One scalar anchor broadcast, one grouped sum."""
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("mx"))
    aged = e.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.floor(
            (F.unix_timestamp("mx") - F.unix_timestamp("ts")) / 3600
        ).alias("age_h"),
    )
    term = F.round(
        F.pow(F.lit(0.5), F.col("age_h").cast("double") / 24.0), 9
    ).cast("decimal(20,9)")
    return (
        aged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(term).cast("double").alias("decayed_score"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q167 — A/B comparison: two-proportion z-test across a hash split
# ---------------------------------------------------------------------------


@query(
    "q167_ab_proportion_test",
    oracle="""
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN substr(sha256(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 'A' ELSE 'B' END AS arm,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        FROM events
    ),
    arms AS (
        SELECT arm,
               COUNT(*) AS n,
               CAST(SUM(conv) AS BIGINT) AS conversions
        FROM assigned GROUP BY arm
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
            MAX(CASE WHEN arm = 'A' THEN conversions END) AS c_a,
            MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
            MAX(CASE WHEN arm = 'B' THEN conversions END) AS c_b
        FROM arms
    )
    SELECT n_a, c_a, n_b, c_b,
           ROUND(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
           ROUND(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
           ROUND(
             (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
             / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
    FROM wide
    """,
    survey="2.5-agg,sampling",
)
def q167_ab_proportion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analytics in-engine: users assign to arms by a
    cryptographic hash (deterministic, unstratified), conversion =
    purchase events, and the pooled two-proportion z-statistic comes out
    of one aggregation — the significance readout of an A/B readout
    pipeline.  Every input to the one float expression is an exact
    integer; the division/sqrt chain is identical on both engines and
    rounded in-query."""
    e = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(F.sha2(F.col("user_id").cast("string"), 256), 1, 1) < "8", "A"
    ).otherwise("B")
    assigned = e.select(
        arm.alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    arms = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").cast("long").alias("conversions")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "A", F.col("conversions"))).alias("c_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "B", F.col("conversions"))).alias("c_b"),
    )
    ra = F.col("c_a").cast("double") / F.col("n_a")
    rb = F.col("c_b").cast("double") / F.col("n_b")
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (ra - rb) / F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# q169 — mergeable-sketch rollup: HLL per window, unioned to the hour
# ---------------------------------------------------------------------------


# HASH-ORACLED as of round 9 via the q177/q256 exhaustive-parameter
# trick: a datasketches HLL sketch is EXACT (coupon list/set mode, no
# register estimation) while its coupon count stays far below 2^lgK, and
# lgK=21 clears the fixture's user cardinality (≤1500 at sf0.1) by two
# orders of magnitude — so every window estimate AND every sketch-union
# estimate IS the exact distinct count, and the oracle is plain
# COUNT(DISTINCT) at each grain.  Measured before converting: lgK=21
# per-day estimates and the all-days union equal exact at sf0.01/sf0.1.
# Estimation-mode behavior (register maxima, the ≥2^lgK regime) stays
# gated by the ≤5%-error property test in tests/test_operators.py.


@query(
    "q169_hll_sketch_rollup",
    oracle="""
    WITH f AS (
        SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_start,
               user_id
        FROM events
    ),
    fine AS (SELECT DISTINCT bucket_start FROM f),
    nw AS (
        SELECT CAST(floor(bucket_start / 3600) * 3600 AS BIGINT) AS hour_start,
               COUNT(*) AS n_windows
        FROM fine GROUP BY 1
    ),
    hu AS (
        SELECT CAST(floor(bucket_start / 3600) * 3600 AS BIGINT) AS hour_start,
               COUNT(DISTINCT user_id) AS approx_users
        FROM f GROUP BY 1
    )
    SELECT nw.hour_start, nw.n_windows, hu.approx_users
    FROM nw JOIN hu USING (hour_start)
    ORDER BY hour_start
    """,
    survey="2.5-agg,X5",
)
def q169_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch re-aggregation pattern that makes distinct counts
    composable at 100 TB: build an HLL sketch of user_id per 10-minute
    window (`hll_sketch_agg`), then UNION THE SKETCHES — not the data —
    up to the hour (`hll_union_agg`) and estimate.  A cube/rollup over
    distinct counts re-scans raw data once per grain; sketch union makes
    every coarser grain a cheap merge of the finer one's state (the
    datasketches property Spark 3.5+ exposes natively).  lgK=21 keeps
    the sketches in exact coupon mode at fixture scale, so the oracle
    replays every grain as COUNT(DISTINCT) — see the comment above."""
    e = load_table(spark, sf_dir, "events")
    fine = (
        e.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.expr("hll_sketch_agg(user_id, 21)").alias("sk"))
        .select(
            F.col("w.start").cast("long").alias("bucket_start"),
            (F.floor(F.col("w.start").cast("long") / 3600) * 3600).alias("hour_start"),
            "sk",
        )
    )
    return (
        fine.groupBy("hour_start")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").alias(
                "approx_users"
            ),
        )
        .orderBy("hour_start")
    )


# ---------------------------------------------------------------------------
# q170 — day-over-day deltas: the trend table behind every ops dashboard
# ---------------------------------------------------------------------------


@query(
    "q170_daily_value_deltas",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_start,
               COUNT(*) AS n_events,
               SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
        FROM events
        GROUP BY day_start
    )
    SELECT day_start, n_events, total_value,
           ROUND(total_value - LAG(total_value) OVER (ORDER BY day_start), 2)
               AS delta,
           ROUND((total_value - LAG(total_value) OVER (ORDER BY day_start))
                 / LAG(total_value) OVER (ORDER BY day_start) * 100, 4)
               AS pct_change
    FROM daily
    ORDER BY day_start
    """,
    survey="2.5-window,X5",
)
def q170_daily_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day trend table: daily event volume and exact-cents
    value totals with absolute and percentage deltas via LAG — the
    shape of every operational dashboard's top row.  The daily rollup
    is one partial-aggregating shuffle; the LAG window runs over one
    row per day (driver-trivial at any scale); deltas divide/round the
    already-exact totals identically on both engines."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
            .cast("long")
            .alias("day_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias(
                "total_value"
            ),
        )
    )
    w = Window.orderBy("day_start")
    prev = F.lag("total_value").over(w)
    return daily.select(
        "day_start",
        "n_events",
        "total_value",
        F.round(F.col("total_value") - prev, 2).alias("delta"),
        F.round((F.col("total_value") - prev) / prev * 100, 4).alias("pct_change"),
    ).orderBy("day_start")


# ---------------------------------------------------------------------------
# q171 — SLO percentile bands: P50/P95/P99 per event type per day
# ---------------------------------------------------------------------------


@query(
    "q171_slo_percentile_bands",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY day_start, event_type
    ORDER BY day_start, event_type
    """,
    survey="2.5-agg,X5",
)
def q171_slo_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SLO table: exact P50/P95/P99 of the value distribution per
    event type per day — the percentile bands an alerting rule
    thresholds.  One grouped exact-percentile aggregation (map-side
    partial); percentiles round in-query on both engines (the q68
    last-ulp discipline).  At 100 TB swap `percentile` for
    `approx_percentile` with a documented error budget — the query
    shape is unchanged."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
            .cast("long")
            .alias("day_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.percentile("value", F.lit(0.50)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
            F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        )
        .orderBy("day_start", "event_type")
    )


# ---------------------------------------------------------------------------
# q176 — mergeable quantile rollup: KLL per window, merged to the hour
# ---------------------------------------------------------------------------


# HASH-ORACLED as of round 9, same exhaustive-parameter argument as
# q177/q169: a KLL sketch below its k never compacts (no randomized
# compaction path is ever taken), so it holds every value and its
# quantile read is the EXACT order statistic under datasketches'
# inclusive-rank rule — sorted[ceil(p·n)] — which plain SQL replays
# with list_sort + index.  k=8192 clears the fixture's max hourly count
# (175 at sf0.1) by ~50×.  Measured before converting: 720/720 hour
# grains × (n, p50, p95, p99) equal at sf0.01 AND sf0.1.  Compacted
# (estimation-mode) behavior stays gated by the ≤3% rank-error test.


@query(
    "q176_kll_quantile_rollup",
    oracle="""
    WITH f AS (
        SELECT CAST(floor(floor(epoch(ts) / 600) * 600 / 3600) * 3600 AS BIGINT)
                   AS hour_start,
               CAST(value AS DOUBLE) AS v
        FROM events
    ),
    g AS (
        SELECT hour_start, COUNT(*) AS n_events, list_sort(list(v)) AS vs
        FROM f GROUP BY hour_start
    )
    SELECT hour_start,
           CAST(n_events AS BIGINT) AS n_events,
           round(vs[CAST(ceil(0.5 * n_events) AS BIGINT)], 6) AS p50,
           round(vs[CAST(ceil(0.95 * n_events) AS BIGINT)], 6) AS p95,
           round(vs[CAST(ceil(0.99 * n_events) AS BIGINT)], 6) AS p99
    FROM g
    ORDER BY hour_start
    """,
    survey="2.5-agg,X5",
)
def q176_kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile companion to q169's HLL rollup: a KLL doubles sketch
    of `value` per 10-minute window (`kll_sketch_agg_double`, k=8192 —
    exact mode at fixture scale, which is what makes this hash-oracled;
    see the comment above), then MERGE THE SKETCHES — not the data — up
    to the hour (`kll_merge_agg_double`) and read P50/P95/P99 off the
    merged state.  Exact grouped percentiles (q171) buffer every value
    per group and re-scan raw data once per grain; KLL state is
    O(k·log(n/k)) per window and every coarser grain is a cheap merge
    of the finer one's state, with a proven rank-error bound
    (~1.65/sqrt(k)) — the datasketches property Spark 4.1 exposes
    natively."""
    e = load_table(spark, sf_dir, "events")
    fine = (
        e.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.expr("kll_sketch_agg_double(CAST(value AS DOUBLE), 8192)").alias("sk"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            (F.floor(F.col("w.start").cast("long") / 3600) * 3600).alias("hour_start"),
            "sk",
            "n",
        )
    )
    merged = fine.groupBy("hour_start").agg(
        F.sum("n").alias("n_events"),
        F.expr("kll_merge_agg_double(sk)").alias("msk"),
    )
    return merged.select(
        "hour_start",
        "n_events",
        F.round(F.expr("kll_sketch_get_quantile_double(msk, 0.5)"), 6).alias("p50"),
        F.round(F.expr("kll_sketch_get_quantile_double(msk, 0.95)"), 6).alias("p95"),
        F.round(F.expr("kll_sketch_get_quantile_double(msk, 0.99)"), 6).alias("p99"),
    ).orderBy("hour_start")


# ---------------------------------------------------------------------------
# q180 — incremental aggregate maintenance: merge(state, delta) ≡ recompute
# ---------------------------------------------------------------------------


@query(
    "q180_incremental_agg_merge",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(floor(epoch(MAX(ts))) AS BIGINT) AS last_seen
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    survey="2.5-agg,X5,ST5",
)
def q180_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance, proven lossless: partition the
    stream at its final day boundary into STATE (all prior days — at
    100 TB, yesterday's materialized per-user rollup) and DELTA (the
    final day's new events), aggregate each side independently, and
    merge with a full outer join + coalesce (count/sum add, max takes
    greatest).  The oracle is the from-scratch GROUP BY over all
    events — a hash match PROVES merge(state, delta) ≡ recompute, the
    algebraic property that lets a daily pipeline touch only the new
    day's data instead of re-scanning the corpus.

    The split anchor (max event day) is a 1-row broadcast scalar (the
    q166 anchor pattern); both aggregates are ordinary partial-agg
    shuffles on user_id; the merge join co-partitions on the same key,
    so AQE coalesces it into the agg exchange."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("epoch"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    anchor = e.select(
        (F.floor(F.max("epoch") / 86400) * 86400).cast("long").alias("split_at")
    )
    tagged = e.join(F.broadcast(anchor))

    def _agg(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("total_cents"),
            F.max("epoch").alias("last_seen"),
        )

    state = _agg(tagged.filter(F.col("epoch") < F.col("split_at")))
    delta = _agg(tagged.filter(F.col("epoch") >= F.col("split_at")))
    s, d = state.alias("s"), delta.alias("d")
    return (
        s.join(d, F.col("s.user_id") == F.col("d.user_id"), "full_outer")
        .select(
            F.coalesce(F.col("s.user_id"), F.col("d.user_id")).alias("user_id"),
            (
                F.coalesce(F.col("s.n_events"), F.lit(0))
                + F.coalesce(F.col("d.n_events"), F.lit(0))
            ).alias("n_events"),
            (
                F.coalesce(F.col("s.total_cents"), F.lit(0))
                + F.coalesce(F.col("d.total_cents"), F.lit(0))
            ).alias("total_cents"),
            F.greatest(F.col("s.last_seen"), F.col("d.last_seen")).alias("last_seen"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q182 — hourly spine + last-observation-carried-forward gap fill
# ---------------------------------------------------------------------------


@query(
    "q182_gap_fill_locf",
    oracle="""
    WITH ev AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS ep,
               event_id, value
        FROM events WHERE user_id < 25
    ),
    hourly AS (
        SELECT user_id, (ep // 3600) * 3600 AS hour_start, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, (ep // 3600) * 3600
                   ORDER BY ep DESC, event_id DESC
               ) AS rn
        FROM ev
    ),
    obs AS (SELECT user_id, hour_start, value FROM hourly WHERE rn = 1),
    spans AS (
        SELECT user_id, MIN(hour_start) AS h0, MAX(hour_start) AS h1
        FROM obs GROUP BY user_id
    ),
    spine AS (
        SELECT user_id, h0 + 3600 * i AS hour_start
        FROM spans, unnest(generate_series(0, (h1 - h0) // 3600)) AS t(i)
    )
    SELECT s.user_id, s.hour_start,
           round(last_value(o.value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.hour_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_filled,
           (o.value IS NULL) AS is_gap
    FROM spine s LEFT JOIN obs o
      ON o.user_id = s.user_id AND o.hour_start = s.hour_start
    ORDER BY s.user_id, s.hour_start
    """,
    survey="X5,2.5-window",
)
def q182_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: per audited user (bounded cohort),
    build the dense hourly spine between their first and last active
    hour (sequence + explode — driver-free, the q100 spine pattern made
    per-key), left-join the last observation of each hour (row_number
    by (epoch, event_id), the deterministic 'latest wins'), and fill
    gaps by carrying the last non-null forward (`last(..., ignorenulls)`
    over an unbounded-preceding row frame — Spark's LOCF idiom, matched
    by DuckDB's `IGNORE NULLS`).  The fill window shuffles once on
    user_id; spine width is bounded by each user's own activity span,
    so a sparse user never inflates the frame.  This is the resample/
    ffill step every metrics store and feature pipeline runs before
    windowed training joins."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 25)
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("ep"),
            "event_id",
            "value",
        )
    )
    hour = (F.floor(F.col("ep") / 3600) * 3600).cast("long")
    w_pick = Window.partitionBy("user_id", "hour_start").orderBy(
        F.desc("ep"), F.desc("event_id")
    )
    obs = (
        e.withColumn("hour_start", hour)
        .withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("user_id", "hour_start", "value")
    )
    spans = obs.groupBy("user_id").agg(
        F.min("hour_start").alias("h0"), F.max("hour_start").alias("h1")
    )
    spine = spans.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.lit(3600).cast("long"))
        ).alias("hour_start"),
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(obs, ["user_id", "hour_start"], "left")
        .select(
            "user_id",
            "hour_start",
            F.round(F.last("value", ignorenulls=True).over(w_fill), 6).alias(
                "value_filled"
            ),
            F.col("value").isNull().alias("is_gap"),
        )
        .orderBy("user_id", "hour_start")
    )


# ---------------------------------------------------------------------------
# q183 — count-min probe: point-lookup frequencies off one shuffled row
# ---------------------------------------------------------------------------


# HASH-ORACLED as of round 9.  "No DuckDB equivalent" was true of the
# FUNCTION, not the VALUE: a count-min table is order-free integer
# counts — cell(i, c) = #rows whose row-i hash lands in column c — and
# the row hash is pure modular arithmetic (h = hashA[i]*item mod 2^64;
# h += h>>32; low 31 bits; mod width), which DuckDB replays in HUGEINT
# (the 127-bit product never overflows; mod 2^64 then mod 2^31 composes
# because 2^31 | 2^64).  The hashA constants are deterministic for the
# query's fixed seed 42 (Java Random stream) — embedded as literals and
# PINNED against the live sketch binary by
# tests/test_operators.py::test_cms_oracle_constants_pinned, so a Spark
# version changing its CMS layout fails loudly instead of silently
# diverging.  Estimates overcounting by design is irrelevant to
# oracle-ability: both engines compute the same deterministic overcount.

_Q183_DEPTH, _Q183_WIDTH, _Q183_SEED = 7, 2000, 42
_Q183_HASH_A = (
    1562431130, 117392763, 1467211248, 102948884,
    662969970, 2023087525, 595021505,
)
_Q183_PROBES = 25


def _q183_oracle() -> str:
    hashes = ", ".join(f"({i}, {a})" for i, a in enumerate(_Q183_HASH_A))
    probes = ", ".join(f"({i})" for i in range(_Q183_PROBES))
    # (hashA*item mod 2^64) → u; col = ((u + u>>32) mod 2^31) mod width.
    # All HUGEINT; user_id is non-negative in the fixture (a negative
    # item would need Java signed-wrap semantics this replay omits).
    col = (
        "CAST(((u + u // 4294967296) % 2147483648)"
        f" % {_Q183_WIDTH} AS BIGINT)"
    )
    u = "(CAST(h.a AS HUGEINT) * x.user_id) % CAST(18446744073709551616 AS HUGEINT)"
    return f"""
    WITH hashes(i, a) AS (VALUES {hashes}),
    probes(user_id) AS (VALUES {probes}),
    cells AS (
        SELECT i, col, COUNT(*) AS cnt
        FROM (
            SELECT h.i AS i, {col} AS col
            FROM (SELECT {u} AS u, h.i
                  FROM events x CROSS JOIN hashes h) AS h
        ) GROUP BY i, col
    ),
    probe_cols AS (
        SELECT user_id, i, {col} AS col
        FROM (SELECT x.user_id, h.i, {u} AS u
              FROM probes x CROSS JOIN hashes h) AS h
    ),
    est AS (
        SELECT pc.user_id, MIN(COALESCE(c.cnt, 0)) AS est_count
        FROM probe_cols pc
        LEFT JOIN cells c ON c.i = pc.i AND c.col = pc.col
        GROUP BY pc.user_id
    ),
    exact AS (
        SELECT user_id, COUNT(*) AS true_count
        FROM events WHERE user_id < {_Q183_PROBES}
        GROUP BY user_id
    )
    SELECT CAST(p.user_id AS BIGINT) AS user_id,
           CAST(e.est_count AS BIGINT) AS est_count,
           CAST(COALESCE(x.true_count, 0) AS BIGINT) AS true_count,
           CAST(e.est_count - COALESCE(x.true_count, 0) AS BIGINT) AS overcount
    FROM probes p
    JOIN est e USING (user_id)
    LEFT JOIN exact x ON x.user_id = p.user_id
    ORDER BY user_id
    """


@query(
    "q183_cms_probe_counts",
    oracle=_q183_oracle(),
    survey="2.5-agg,X5",
)
def q183_cms_probe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point lookups: one `count_min_sketch` aggregate
    (eps=0.001, confidence=0.99, fixed seed) compresses the full
    user-activity distribution into a ~110 KB binary that leaves the
    executors as a single row; the audited user ids are then probed by
    decoding that binary (operators/sketches.py — layout and row-hash
    verified bit-for-bit against the JVM impl in tests) and joined to
    their exact counts for the overcount audit.  At 100 TB the sketch
    is the only thing that crosses the wire for ANY number of probes —
    the per-probe exact join here is the audit, not the mechanism.
    Partial sketches merge by table addition, so the distributed
    aggregate is order-independent and deterministic under the fixed
    seed — which is also why it's hash-oracled: the DuckDB oracle
    rebuilds every probed cell with the same modular row-hash arithmetic
    (see the module comment above).  The CMS bounds (never undercounts,
    overcount ≤ eps·N w.p. ≥ confidence) stay gated in
    tests/test_operators.py."""
    from gmail_etl_spark.operators.sketches import cms_probe_longs

    probe_ids = list(range(_Q183_PROBES))
    e = load_table(spark, sf_dir, "events")
    raw = bytes(
        e.select(
            F.expr(
                "count_min_sketch(user_id, cast(0.001 as double),"
                f" cast(0.99 as double), {_Q183_SEED})"
            ).alias("sk")
        ).head()["sk"]
    )
    est = cms_probe_longs(raw, probe_ids)
    est_df = spark.createDataFrame(
        [(int(i), int(est[i])) for i in probe_ids], "user_id bigint, est_count bigint"
    )
    exact = (
        e.join(F.broadcast(est_df.select("user_id")), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    return (
        est_df.join(exact, "user_id", "left")
        .select(
            "user_id",
            "est_count",
            F.coalesce("true_count", F.lit(0)).alias("true_count"),
            (F.col("est_count") - F.coalesce("true_count", F.lit(0))).alias(
                "overcount"
            ),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q187 — grouped OLS drift: regression slope of daily volume per type
# ---------------------------------------------------------------------------


@query(
    "q187_daily_value_drift",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        GROUP BY event_type, day_idx
    ),
    anchored AS (
        SELECT event_type,
               day_idx - MIN(day_idx) OVER (PARTITION BY event_type) AS x,
               cents AS y
        FROM daily
    )
    SELECT event_type,
           COUNT(*) AS n_days,
           ROUND((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                 / (CAST(COUNT(*) AS DOUBLE) * SUM(x * x) - SUM(x) * SUM(x)),
                 4) AS slope_cents_per_day,
           ROUND((SUM(y) - ((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                            / (CAST(COUNT(*) AS DOUBLE) * SUM(x * x)
                               - SUM(x) * SUM(x))) * SUM(x))
                 / COUNT(*), 4) AS intercept_cents
    FROM anchored
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey="2.5-agg,X5",
)
def q187_daily_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend detection as grouped OLS: per event type, the least-squares
    slope (and intercept) of daily value totals against the day index —
    the one-number drift signal behind "is this source decaying?"
    alerts.  The regression reduces to five sufficient statistics
    (n, Σx, Σy, Σxy, Σx²) that stay EXACT integers until the final
    division: x is a small day offset, y integer cents, so every product
    fits a long and the oracle's float surface is one division + one
    4dp round, identical on both engines.  Shape: one daily partial-agg
    shuffle, a per-type MIN window to anchor x at zero (keeps Σx² small
    and the formula conditioning trivial), then a per-type fold —
    group count × 5 longs of state at any scale."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    w = Window.partitionBy("event_type")
    anchored = daily.select(
        "event_type",
        (F.col("day_idx") - F.min("day_idx").over(w)).alias("x"),
        F.col("cents").alias("y"),
    )
    n = F.count(F.lit(1))
    sx, sy = F.sum("x"), F.sum("y")
    sxy, sxx = F.sum(F.col("x") * F.col("y")), F.sum(F.col("x") * F.col("x"))
    slope = (n * sxy - sx * sy) / (n.cast("double") * sxx - sx * sx)
    return (
        anchored.groupBy("event_type")
        .agg(
            n.alias("n_days"),
            F.round(slope, 4).alias("slope_cents_per_day"),
            F.round((sy - slope * sx) / n, 4).alias("intercept_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q189 — association rules over session baskets (support/confidence/lift)
# ---------------------------------------------------------------------------


@query(
    "q189_session_association_rules",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_type,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 5 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id, event_type,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    ),
    baskets AS (
        SELECT DISTINCT user_id, session_no, event_type FROM sess
    ),
    n AS (SELECT COUNT(DISTINCT (user_id, session_no)) AS n_sessions FROM baskets),
    item AS (
        SELECT event_type, COUNT(*) AS cnt FROM baskets GROUP BY event_type
    ),
    pair AS (
        SELECT a.event_type AS antecedent, b.event_type AS consequent,
               COUNT(*) AS cnt_ab
        FROM baskets a
        JOIN baskets b
          ON a.user_id = b.user_id AND a.session_no = b.session_no
         AND a.event_type <> b.event_type
        GROUP BY antecedent, consequent
    )
    SELECT p.antecedent, p.consequent,
           (SELECT n_sessions FROM n) AS n_sessions,
           ia.cnt AS cnt_a, p.cnt_ab,
           round(CAST(p.cnt_ab AS DOUBLE) / ia.cnt, 6) AS confidence,
           round(CAST(p.cnt_ab AS DOUBLE) * (SELECT n_sessions FROM n)
                 / (ia.cnt * ic.cnt), 6) AS lift
    FROM pair p
    JOIN item ia ON ia.event_type = p.antecedent
    JOIN item ic ON ic.event_type = p.consequent
    ORDER BY p.antecedent, p.consequent
    """,
    survey="X5,2.5-agg",
)
def q189_session_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining over behavioral sessions: baskets are the
    distinct event types of each (user, 5-min-gap session) — q62's
    gaps-and-islands sessionization reused verbatim — and every directed
    type pair gets support, confidence (P(B|A)) and lift
    (P(AB)/(P(A)P(B))), the association-rule triple behind "users who X
    also Y".  Counts stay exact integers; the two ratios round to 6dp
    identically on both engines.  Shape: baskets are one
    window-plus-distinct over the events shuffle; the pair join runs
    WITHIN session keys (baskets per session ≤ |event-type vocabulary|,
    so the per-key expansion is a small clique — the q74 postings
    argument); item/pair tables are vocabulary-sized."""
    e = load_table(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts")
    flagged = e.select(
        "user_id",
        "ts",
        "event_type",
        # µs-exact gap compare: the oracle's `> INTERVAL 5 MINUTE` is
        # full-precision, so a seconds-truncated epoch diff would flip
        # sessions whose gap straddles 300.000000s (the q166 lesson)
        F.when(
            (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w_lag)
                > 300_000_000
            )
            | F.lag("ts").over(w_lag).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = flagged.select(
        "user_id",
        "event_type",
        F.sum("new_session")
        .over(w_lag.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_no"),
    )
    baskets = sess.select("user_id", "session_no", "event_type").distinct()
    n_sessions = baskets.select("user_id", "session_no").distinct().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    item = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    b2 = baskets.select(
        "user_id", "session_no", F.col("event_type").alias("consequent")
    )
    pair = (
        baskets.select("user_id", "session_no", F.col("event_type").alias("antecedent"))
        .join(b2, ["user_id", "session_no"])
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("cnt_ab"))
    )
    ia = item.select(F.col("event_type").alias("antecedent"), F.col("cnt").alias("cnt_a"))
    ic = item.select(F.col("event_type").alias("consequent"), F.col("cnt").alias("cnt_c"))
    return (
        pair.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "antecedent",
            "consequent",
            "n_sessions",
            "cnt_a",
            "cnt_ab",
            F.round(F.col("cnt_ab") / F.col("cnt_a"), 6).alias("confidence"),
            F.round(
                F.col("cnt_ab") * F.col("n_sessions")
                / (F.col("cnt_a") * F.col("cnt_c")),
                6,
            ).alias("lift"),
        )
        .orderBy("antecedent", "consequent")
    )


# ---------------------------------------------------------------------------
# q191 — sketch cube: one leaf scan, every grain a merge
# ---------------------------------------------------------------------------


# HASH-ORACLED as of round 9, same exact-coupon-mode argument as q169
# (see the comment there): at lgK=21 every per-cell sketch and every
# union grain is exact at fixture scale, so the oracle is a plain
# COUNT(DISTINCT) CUBE.  Merged-equals-one-shot stays asserted in tests.


@query(
    "q191_hll_cube_users",
    oracle="""
    SELECT event_type, day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS approx_users
    FROM (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day,
               user_id
        FROM events
    )
    GROUP BY CUBE (event_type, day)
    ORDER BY event_type NULLS LAST, day NULLS LAST
    """,
    survey="2.5-agg,X5",
)
def q191_hll_cube_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cube counterpart to q169's rollup: distinct users at all four
    grains of (event_type × day) — leaf, by-type, by-day, grand total —
    from ONE scan.  The leaf grain aggregates raw data into per-cell HLL
    sketches; every coarser grain is `hll_union_agg` over the leaf's
    few-KB state, so adding a grain costs a metadata-sized merge, not a
    re-scan.  A plain CUBE over COUNT(DISTINCT) re-shuffles the raw
    corpus once per grouping set — at 100 TB, four scans versus one.

    Distinct counts are not additive (the same user appears on many
    days), which is exactly why the state must be sketches; union takes
    register maxima, so merged estimates EQUAL the one-shot estimates
    at every grain — asserted exactly in tests, the q169/q176 merge
    discipline.  lgK=21 keeps every grain in exact coupon mode at
    fixture scale (see the comment above), which is what lets the
    oracle replay the cube as COUNT(DISTINCT)."""
    e = load_table(spark, sf_dir, "events")
    leaf = e.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long").alias("day"),
    ).agg(F.expr("hll_sketch_agg(user_id, 21)").alias("sk"))
    est = lambda c: F.expr(f"hll_sketch_estimate({c})").cast("long")  # noqa: E731

    leaf_out = leaf.select(
        "event_type", "day", est("sk").alias("approx_users")
    )
    by_type = leaf.groupBy("event_type").agg(
        F.expr("hll_union_agg(sk)").alias("m")
    ).select("event_type", F.lit(None).cast("long").alias("day"), est("m").alias("approx_users"))
    by_day = leaf.groupBy("day").agg(F.expr("hll_union_agg(sk)").alias("m")).select(
        F.lit(None).cast("string").alias("event_type"), "day", est("m").alias("approx_users")
    )
    total = leaf.agg(F.expr("hll_union_agg(sk)").alias("m")).select(
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("long").alias("day"),
        est("m").alias("approx_users"),
    )
    return (
        leaf_out.unionByName(by_type)
        .unionByName(by_day)
        .unionByName(total)
        .orderBy(
            F.col("event_type").asc_nulls_last(), F.col("day").asc_nulls_last()
        )
    )


# ---------------------------------------------------------------------------
# q255 — stream-stream interval join (view→purchase attribution)
# ---------------------------------------------------------------------------


@query(
    "q255_stream_stream_join",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id AS v_id, ts AS v_ts
        FROM events WHERE event_type = 'view'
    ),
    p AS (
        SELECT user_id, event_id AS p_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT v.user_id, v_id, p_id,
               epoch_us(p_ts) - epoch_us(v_ts) AS gap_us
        FROM v JOIN p ON v.user_id = p.user_id
                     AND p.p_ts >= v.v_ts
                     AND p.p_ts <= v.v_ts + INTERVAL 30 MINUTE
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT v_id) AS BIGINT) AS n_views,
           CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_purchases,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
    FROM j
    GROUP BY user_id
    ORDER BY user_id
    """,
    survey="ST2,X5,2.5-join",
)
def q255_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, driven end-to-end through Structured
    Streaming: the events table re-enters as TWO watermarked file-source
    streams (views, purchases), the inner join
    (streaming/jobs.py::stream_stream_attribution — already
    stream==batch-tested locally) runs in
    StreamingSymmetricHashJoinExec under an availableNow trigger into a
    memory sink, and the sunk pairs fold to a per-user attribution
    rollup.  Inner-join matches are append-emitted as found, so with the
    watermark covering the corpus span the streamed pair set IS the
    batch interval join — which the DuckDB oracle hashes.  At 100 TB the
    same plan runs with the watermark at the real late-data horizon so
    join state stays bounded ((watermark + within) of events per side).

    This is the only catalog entry that executes a streaming query
    inside the driver's correctness gate — the other streaming legs are
    batch-oracled in tests; the join leg is driver-hashed here."""
    import os
    import uuid

    from gmail_etl_spark.plans.catalog import normalize_nano_ts
    from gmail_etl_spark.streaming.jobs import stream_stream_attribution

    # testdata tables are single parquet FILES: the file-stream source
    # derives basePath from the path and requires a directory, so load
    # via a glob that matches exactly the one file — globs make the
    # source treat the parent directory as the base.  The rewrite is
    # only sound when sf_dir itself is glob-inert: metacharacters in
    # the directory would make the source match nothing and silently
    # stream zero rows, so fail loudly instead.
    if any(ch in sf_dir for ch in "*?[]{}"):
        raise ValueError(
            f"q255: sf_dir {sf_dir!r} contains glob metacharacters — the "
            "single-file stream-source glob rewrite would silently match "
            "nothing; point sf_dir at a glob-inert path"
        )
    batch_file = f"{sf_dir}/events.parquet"
    if not os.path.isfile(batch_file):
        raise FileNotFoundError(f"q255: {batch_file} missing")
    # The memory sink below materializes every joined pair on the
    # driver — the right shape for the ~sf0.01 correctness gate, NOT
    # for scale.  The operator itself is sink-agnostic (the 1M-event
    # harness writes parquet: tools/stream_join_scale.py); this guard
    # keeps the gate form from being lifted to a big corpus unmodified.
    size = os.path.getsize(batch_file)
    if size > 256 * 1024 * 1024:
        raise RuntimeError(
            f"q255: events.parquet is {size >> 20} MiB — the driver-gate "
            "memory sink would buffer every joined pair in driver memory; "
            "at scale run stream_stream_attribution with a parquet sink "
            "(see tools/stream_join_scale.py)"
        )
    path = f"{sf_dir}/events.parque[t]"
    probed = spark.read.parquet(batch_file).schema
    events = normalize_nano_ts(
        spark.readStream.schema(probed).parquet(path), "ts"
    )
    pairs = stream_stream_attribution(
        events,
        trigger_type="view",
        outcome_type="purchase",
        within="30 minutes",
        # corpus-span watermark: nothing is ever late, so the streamed
        # result is exactly the batch interval join (the oracle)
        watermark="3650 days",
    ).select(
        "user_id",
        F.col("trigger_id").alias("v_id"),
        F.col("outcome_id").alias("p_id"),
        (F.unix_micros("outcome_ts") - F.unix_micros("trigger_ts")).alias(
            "gap_us"
        ),
    )
    sink = f"q255_pairs_{uuid.uuid4().hex}"
    # smoke-tier state sizing (VERDICT r8 #8): a fresh availableNow
    # stream-stream join instantiates TWO state stores per shuffle
    # partition, and at the sf0.001 smoke tier that fixed per-store
    # setup cost dwarfs the row work (q255 was the slowest sweep row).
    # The state partition count is captured at query start and is a
    # PHYSICAL knob only — the joined pair set and the rollup are
    # partition-invariant — so the smoke sweep may cap it
    # (tools/sweep.py sets this env for the sf0.001 tier); unset, the
    # session default (cores-scaled) stands, which is the driver-gate
    # and production shape.
    state_parts = os.environ.get("SPARK_GRAFT_Q255_STATE_PARTITIONS")
    conf_key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(conf_key)
    if state_parts is not None:
        spark.conf.set(conf_key, str(int(state_parts)))
    try:
        q = (
            pairs.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_parts is not None:
            spark.conf.set(conf_key, saved)
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("v_id").cast("long").alias("n_views"),
            F.countDistinct("p_id").cast("long").alias("n_purchases"),
            F.sum("gap_us").cast("long").alias("total_gap_us"),
        )
        .orderBy("user_id")
    )
