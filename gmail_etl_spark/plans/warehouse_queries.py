"""Warehouse-operations catalog entries: funnels (plain, session-
scoped, attribution-window-bounded), cohort retention, SCD type-2
history with point-in-time lookup, MERGE-style upserts, recursive-CTE
reachability, spatial bucket joins, gaps-and-islands, activity heatmaps,
conversion latencies, negative edge sampling, calibration bins, and
data-contract quarantine — over the ``events`` table.

These are the classic product-analytics / dimensional-modeling shapes a
user of the reference pipeline would eventually reach for once messages
land in a warehouse (the reference stops at the CSV/ledger hand-off,
``gmail_etl.py:L1-L88``; this module is the downstream surface).  All
arithmetic follows the hash-stability discipline: integer counts and
cents everywhere, one division at the end mirrored verbatim in the
oracle, timestamps passed through raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmail_etl_spark.plans.catalog import load_table, query

# ---------------------------------------------------------------------------
# q197 — ordered-step funnel conversion (view -> click -> purchase)
# ---------------------------------------------------------------------------


@query(
    "q197_funnel_conversion",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    ),
    agg AS (
        SELECT (SELECT COUNT(*) FROM s1) AS u1,
               (SELECT COUNT(*) FROM s2) AS u2,
               (SELECT COUNT(*) FROM s3) AS u3
    )
    SELECT step, step_name, users,
           ROUND(users / CAST(base AS DOUBLE), 6) AS conv_from_first
    FROM (
        SELECT 1 AS step, 'view' AS step_name, u1 AS users, u1 AS base FROM agg
        UNION ALL
        SELECT 2, 'click', u2, u1 FROM agg
        UNION ALL
        SELECT 3, 'purchase', u3, u1 FROM agg
    )
    ORDER BY step
    """,
    survey="X5,2.5-agg",
)
def q197_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel: a user converts to step k only via an event
    strictly AFTER their step-(k-1) time — the min-timestamp chaining
    that distinguishes a real funnel from three independent filters.
    Each stage is a filtered per-user MIN aggregate joined to the
    previous stage's survivors, so the data volume shrinks monotonically
    down the funnel; at 100 TB each stage is one shuffle on user_id and
    later stages ride AQE's coalesced partitions as the survivor set
    collapses.  The 3-row readout is a single ``stack`` over one
    aggregate row — no driver loop, no cross join.  Conversion ratios
    divide two integer counts (deterministic across engines) and round
    to 6dp on both sides."""
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    funnel = s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    agg = funnel.agg(
        F.count("t1").alias("u1"),
        F.count("t2").alias("u2"),
        F.count("t3").alias("u3"),
    )
    return (
        agg.select(
            F.expr(
                "stack(3, 1, 'view', u1, u1, 2, 'click', u2, u1,"
                " 3, 'purchase', u3, u1) AS (step, step_name, users, base)"
            )
        )
        .select(
            "step",
            "step_name",
            "users",
            F.round(F.col("users") / F.col("base"), 6).alias("conv_from_first"),
        )
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# q198 — weekly cohort retention matrix
# ---------------------------------------------------------------------------


@query(
    "q198_cohort_retention",
    oracle="""
    WITH weekly AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week_idx
        FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(week_idx) AS cohort_week FROM weekly GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort_week, COUNT(*) AS cohort_size FROM cohort GROUP BY cohort_week
    ),
    activity AS (
        SELECT c.cohort_week, w.week_idx - c.cohort_week AS week_offset,
               COUNT(DISTINCT w.user_id) AS active_users
        FROM weekly w JOIN cohort c ON w.user_id = c.user_id
        GROUP BY c.cohort_week, week_offset
    )
    SELECT a.cohort_week, a.week_offset, a.active_users, s.cohort_size,
           ROUND(a.active_users / CAST(s.cohort_size AS DOUBLE), 6) AS retention
    FROM activity a JOIN sizes s ON a.cohort_week = s.cohort_week
    ORDER BY a.cohort_week, a.week_offset
    """,
    survey="X5,2.5-agg",
)
def q198_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active epoch-week, then
    for each (cohort, week-offset) cell the fraction of the cohort still
    active.  The classic triangular retention matrix, computed from two
    shuffles — one to build per-user distinct weeks (map-side combine
    collapses each user's events to <=5 rows here), one for the cohort
    fold — and a join back to cohort sizes that AQE broadcasts (the
    cohort-size table has one row per week, tiny at any corpus scale).
    All cells are exact integer counts; the retention ratio is the only
    float, divided and 6dp-rounded identically on both engines."""
    e = load_table(spark, sf_dir, "events")
    weekly = e.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 604800).cast("long").alias("week_idx"),
    ).distinct()
    cohort = weekly.groupBy("user_id").agg(F.min("week_idx").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    activity = (
        weekly.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
    return (
        activity.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_size",
            F.round(
                F.col("active_users") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# q199 — SCD type-2 state history (validity intervals from an event log)
# ---------------------------------------------------------------------------


@query(
    "q199_scd2_state_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, ts, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
        WHERE user_id < 20
    ),
    changes AS (
        SELECT user_id, event_id, ts, event_type
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS BIGINT)
               AS version,
           event_type AS state,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to
    FROM changes
    ORDER BY user_id, version
    """,
    survey="2.5-window,X5",
)
def q199_scd2_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 built from a raw event log:
    collapse consecutive repeats of the per-user state (lag), then emit
    versioned validity intervals [valid_from, valid_to) with an open
    (NULL) end for the current row — the standard dimension-build that
    turns an append-only log into point-in-time joinable history.  Both
    windows partition by user_id with a (ts, event_id) total order, so
    the whole build is ONE shuffle reused by lag, row_number and lead
    (Catalyst collapses same-key windows into one sort); at 100 TB this
    is the per-entity timeline pattern — state scales with one user's
    events, never the corpus.  The user_id < 20 slice bounds oracle
    output; timestamps pass through raw (no float surface)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_id", "ts", "event_type")
    )
    # event_id tie-break pins a TOTAL order — ts alone leaves version
    # assignment engine-dependent whenever two change rows share a ts
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id",
            F.row_number().over(w2).cast("long").alias("version"),
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w2).alias("valid_to"),
        )
        .orderBy("user_id", "version")
    )


# ---------------------------------------------------------------------------
# q200 — MERGE-style upsert (snapshot + late batch -> next snapshot)
# ---------------------------------------------------------------------------


@query(
    "q200_merge_upsert",
    oracle="""
    WITH ranked_before AS (
        SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS value_cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-15'
    ),
    target AS (
        SELECT user_id, ts, value_cents FROM ranked_before WHERE rn = 1
    ),
    ranked_after AS (
        SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS value_cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-15'
    ),
    updates AS (
        SELECT user_id, ts, value_cents FROM ranked_after WHERE rn = 1
    )
    SELECT COALESCE(t.user_id, u.user_id) AS user_id,
           COALESCE(u.value_cents, t.value_cents) AS value_cents,
           COALESCE(u.ts, t.ts) AS last_ts,
           CASE WHEN t.user_id IS NULL THEN 'inserted'
                WHEN u.user_id IS NULL THEN 'kept'
                ELSE 'updated' END AS action
    FROM target t FULL OUTER JOIN updates u ON t.user_id = u.user_id
    ORDER BY user_id
    """,
    survey="J2,2.5-window",
)
def q200_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a table format: the current per-user
    snapshot (latest value before the cutoff) full-outer-joined with a
    late batch's latest values — matched rows update, unmatched source
    rows insert, unmatched target rows carry forward, each tagged with
    its action.  This is the Delta/Iceberg upsert expressed as a plain
    shuffle join, and the generalization of the reference's ledger
    anti-join (J2, ``gmail_etl.py:L62-L78``) from insert-only to
    update-in-place.  Both 'latest per key' reductions are one
    row_number window over a (ts, event_id) DESC total order — at scale
    the window and the join share the user_id hash partitioning, so the
    merge costs one shuffle of each side and AQE handles the skewed
    super-user keys.  Values are integer cents; timestamps raw."""
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.select(
                "user_id",
                "ts",
                F.round(F.col("value") * 100).cast("long").alias("value_cents"),
                F.row_number().over(w).alias("rn"),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    target = latest(e.filter(F.col("ts") < cutoff))
    updates = latest(e.filter(F.col("ts") >= cutoff))
    t, u = target.alias("t"), updates.alias("u")
    return (
        t.join(u, F.col("t.user_id") == F.col("u.user_id"), "full_outer")
        .select(
            F.coalesce(F.col("t.user_id"), F.col("u.user_id")).alias("user_id"),
            F.coalesce(F.col("u.value_cents"), F.col("t.value_cents")).alias(
                "value_cents"
            ),
            F.coalesce(F.col("u.ts"), F.col("t.ts")).alias("last_ts"),
            F.when(F.col("t.user_id").isNull(), F.lit("inserted"))
            .when(F.col("u.user_id").isNull(), F.lit("kept"))
            .otherwise(F.lit("updated"))
            .alias("action"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q215 — recursive CTE reachability (one shared ANSI text, both engines)
# ---------------------------------------------------------------------------

#: Edge extraction — shared verbatim by both engines (as a Spark temp
#: view body and as the oracle's first CTE).
_Q215_EDGES_SQL = """
    WITH transitions AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type AS src, next_type AS dst, COUNT(*) AS cnt
    FROM transitions
    WHERE next_type IS NOT NULL AND next_type <> event_type
    GROUP BY src, dst
    HAVING COUNT(*) * 20 > (SELECT COUNT(*) FROM transitions
                            WHERE next_type IS NOT NULL
                              AND next_type <> event_type)
"""

#: Min-hop closure over `edges` — shared verbatim by both engines.
_Q215_CLOSURE_SQL = """
    WITH RECURSIVE reach(src, dst, hops) AS (
        SELECT src, dst, 1 FROM edges
        UNION ALL
        SELECT r.src, e.dst, r.hops + 1
        FROM reach r JOIN edges e ON r.dst = e.src
        WHERE r.hops < 4
    )
    SELECT src, dst, CAST(MIN(hops) AS BIGINT) AS min_hops
    FROM reach
    GROUP BY src, dst
    ORDER BY src, dst
"""

_Q215_ORACLE_SQL = (
    "WITH RECURSIVE edges AS (" + _Q215_EDGES_SQL + ")\n"
    + _Q215_CLOSURE_SQL.replace("WITH RECURSIVE reach", ", reach", 1).lstrip()
)


@query("q215_recursive_reachability", oracle=_Q215_ORACLE_SQL, survey="2.5-set,X5")
def q215_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE transitive closure (Spark 4 `WITH RECURSIVE`),
    proven at the q185 grain: shared ANSI fragments build the frequent
    event-type transition graph (lead window → edge counts with an
    above-average support threshold) and walk min-hop reachability over
    it, executed by BOTH `spark.sql` and DuckDB from the same text.  The
    hop bound (< 4) is the termination guard recursive closures need on
    cyclic graphs; MIN(hops) collapses the path multiset.

    The edge table is MATERIALIZED on the Spark side before the
    recursion (localCheckpoint, the q47 discipline): Spark's recursive
    execution re-evaluates the recursive term each iteration, and with
    an inlined CTE that would re-run the corpus-sized transition window
    per hop (measured 4×: 10 s → ~3 s at sf0.01).  Pinning the
    types×types edge table makes each iteration a join against ~20
    materialized rows — the recursion never touches the corpus again,
    which is exactly the 100 TB posture.  localCheckpoint instead of
    cache() because a catalog builder must not leak persistent state:
    cached entries live in the CacheManager until an explicit
    unpersist, so a 254-query sweep would accumulate one pinned table
    per invocation, while checkpoint blocks are released by the
    ContextCleaner when the DataFrame goes unreferenced.
    This is the SQL-standard face of the repo's iterative operators
    (q47 connected components, q156 PageRank, q181 k-core), for users
    who reach for WITH RECURSIVE first."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    edges = spark.sql(_Q215_EDGES_SQL).localCheckpoint(eager=True)
    edges.createOrReplaceTempView("edges")
    return spark.sql(_Q215_CLOSURE_SQL)


# ---------------------------------------------------------------------------
# q219 — funnel within sessions (ordered steps must share one session)
# ---------------------------------------------------------------------------


@query(
    "q219_session_funnel",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts,
                                            event_id) > INTERVAL 5 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts,
                                     event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, event_type,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    ),
    s1 AS (
        SELECT user_id, session_no, MIN(ts) AS t1 FROM sess
        WHERE event_type = 'view' GROUP BY user_id, session_no
    ),
    s2 AS (
        SELECT e.user_id, e.session_no, MIN(e.ts) AS t2
        FROM sess e JOIN s1 ON e.user_id = s1.user_id
                   AND e.session_no = s1.session_no
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id, e.session_no
    ),
    s3 AS (
        SELECT e.user_id, e.session_no, MIN(e.ts) AS t3
        FROM sess e JOIN s2 ON e.user_id = s2.user_id
                   AND e.session_no = s2.session_no
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id, e.session_no
    ),
    agg AS (
        SELECT (SELECT COUNT(*) FROM s1) AS u1,
               (SELECT COUNT(*) FROM s2) AS u2,
               (SELECT COUNT(*) FROM s3) AS u3
    )
    SELECT step, step_name, sessions,
           ROUND(sessions / CAST(base AS DOUBLE), 6) AS conv_from_first
    FROM (
        SELECT 1 AS step, 'view' AS step_name, u1 AS sessions, u1 AS base FROM agg
        UNION ALL SELECT 2, 'click', u2, u1 FROM agg
        UNION ALL SELECT 3, 'purchase', u3, u1 FROM agg
    )
    ORDER BY step
    """,
    survey="X5,2.5-window",
)
def q219_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The strict form of q197: funnel steps must occur in order WITHIN
    one 5-minute-gap session — the difference between 'eventually
    purchased' and 'purchased in the same visit'.  Sessionization is the
    q189 lag/cumsum assignment (µs-exact gap compare); each funnel stage
    is then a per-(user, session) MIN aggregate joined to the previous
    stage's surviving sessions, shrinking monotonically.  Counts divide
    as exact integers.  Shape: ONE window shuffle on user_id serves the
    sessionization; the three stage aggregates reuse the same
    (user, session) grain, so at scale this is one corpus shuffle plus
    session-grain folds."""
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs-exact gap compare (the q189/q166 lesson: never truncate epochs
    # before differencing)
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wo)
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(wo).isNull() | (gap > 300_000_000), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    ).select("user_id", "session_no", "ts", "event_type")
    keys = ["user_id", "session_no"]
    s1 = (
        sess.filter(F.col("event_type") == "view")
        .groupBy(*keys)
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        sess.filter(F.col("event_type") == "click")
        .join(s1, keys)
        .filter(F.col("ts") > F.col("t1"))
        .groupBy(*keys)
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        sess.filter(F.col("event_type") == "purchase")
        .join(s2, keys)
        .filter(F.col("ts") > F.col("t2"))
        .groupBy(*keys)
        .agg(F.min("ts").alias("t3"))
    )
    funnel = s1.join(s2, keys, "left").join(s3, keys, "left")
    agg = funnel.agg(
        F.count("t1").alias("u1"),
        F.count("t2").alias("u2"),
        F.count("t3").alias("u3"),
    )
    return (
        agg.select(
            F.expr(
                "stack(3, 1, 'view', u1, u1, 2, 'click', u2, u1,"
                " 3, 'purchase', u3, u1) AS (step, step_name, sessions, base)"
            )
        )
        .select(
            "step",
            "step_name",
            "sessions",
            F.round(F.col("sessions") / F.col("base"), 6).alias(
                "conv_from_first"
            ),
        )
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# q226 — spatial radius join via grid bucketing (cell join + exact refine)
# ---------------------------------------------------------------------------


@query(
    "q226_spatial_bucket_join",
    oracle="""
    WITH pts AS (
        SELECT event_id AS pid,
               (event_id * 2654435761) % 10000 AS x,
               (event_id * 40503 + 12345) % 10000 AS y
        FROM events
        WHERE event_id < 3000
    )
    SELECT a.pid AS a_id, b.pid AS b_id,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist_sq
    FROM pts a JOIN pts b ON a.pid < b.pid
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 2500
    ORDER BY a_id, b_id
    """,
    survey="2.5-join,X6",
)
def q226_spatial_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed radius join: find all point pairs within distance 50
    on a synthetic integer grid (coordinates derived from event ids by
    multiplicative hashing — deterministic and engine-portable).  The
    Spark plan is the standard scale shape: bucket each point into a
    50×50 grid cell, EXPLODE each point into its 3×3 neighboring cells,
    equi-join on the cell key, then refine with the exact integer
    distance test — cell size ≥ radius guarantees every qualifying pair
    shares at least one of the 9 cells, and dedup on the pair key
    removes multi-cell hits.  The oracle is the naive O(n²) join the
    bucketed algorithm must EQUAL — completeness of the cover is what
    the hash match certifies.  At 100 TB the cell join shuffles each
    point 9×, versus the quadratic blowup of the naive form; skewed
    cells follow the LSH hot-bucket playbook (salt or cap).  Distances
    stay squared integers — no sqrt, no float, no trig."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    pts = e.select(
        F.col("event_id").alias("pid"),
        ((F.col("event_id") * 2654435761) % 10000).alias("x"),
        ((F.col("event_id") * 40503 + 12345) % 10000).alias("y"),
    )
    cell = 50
    with_cells = pts.select(
        "pid",
        "x",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.floor(F.col("x") / cell) + dx).alias("cx"),
                        (F.floor(F.col("y") / cell) + dy).alias("cy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("c"),
    ).select("pid", "x", "y", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    # join points to candidate points whose HOME cell is one of a's 9
    home = pts.select(
        F.col("pid").alias("b_pid"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.floor(F.col("x") / cell).alias("cx"),
        F.floor(F.col("y") / cell).alias("cy"),
    )
    dist_sq = (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx")) + (
        F.col("y") - F.col("by")
    ) * (F.col("y") - F.col("by"))
    return (
        with_cells.join(home, ["cx", "cy"])
        .filter(F.col("pid") < F.col("b_pid"))
        .filter(dist_sq <= 2500)
        .select(
            F.col("pid").alias("a_id"),
            F.col("b_pid").alias("b_id"),
            dist_sq.alias("dist_sq"),
        )
        .dropDuplicates(["a_id", "b_id"])
        .orderBy("a_id", "b_id")
    )


# ---------------------------------------------------------------------------
# q227 — time-to-convert distribution (exact order statistics on µs gaps)
# ---------------------------------------------------------------------------


@query(
    "q227_time_to_convert",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_buy
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    gaps AS (
        SELECT p.user_id,
               epoch_us(p.t_buy) - epoch_us(v.t_view) AS gap_us
        FROM p JOIN v ON p.user_id = v.user_id
    ),
    grain AS (
        SELECT gap_us, COUNT(*) AS cnt FROM gaps GROUP BY gap_us
    ),
    cum AS (
        SELECT gap_us,
               SUM(cnt) OVER (ORDER BY gap_us ROWS UNBOUNDED PRECEDING)
                   AS cum_cnt,
               SUM(cnt) OVER () AS n
        FROM grain
    )
    SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_converted,
           CAST(floor(MIN(CASE WHEN cum_cnt * 4 >= n THEN gap_us END)
                      / 60000000) AS BIGINT) AS p25_minutes,
           CAST(floor(MIN(CASE WHEN cum_cnt * 2 >= n THEN gap_us END)
                      / 60000000) AS BIGINT) AS median_minutes,
           CAST(floor(MIN(CASE WHEN cum_cnt * 4 >= 3 * n THEN gap_us END)
                      / 60000000) AS BIGINT) AS p75_minutes
    FROM cum
    """,
    survey="X5,2.5-agg",
)
def q227_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: µs-exact gaps between each user's
    first view and first subsequent purchase, summarized as exact
    quartile order statistics via the q223 run-length recipe — integer
    rank tests on the cumulative gap table, then a floor to whole
    minutes, so neither percentile interpolation nor epoch truncation
    (the q166 trap) can split the engines.  Shape: two user-grain MIN
    aggregates (the funnel chaining), a gap projection, and the
    value-grain prefix window — conversion-latency analytics in two
    corpus shuffles.

    Scale shape: the gap grain is unbounded (up to one row per
    converting user), so the cumulative count uses the two-phase
    distributed prefix sum (operators/distributed_window.py) instead of
    a single-partition ``Window.orderBy``; the corpus total rides the
    same tiny carry frame."""
    from gmail_etl_spark.operators.distributed_window import attach_prefix_agg

    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    gaps = p.join(v, "user_id").select(
        (F.unix_micros("t_buy") - F.unix_micros("t_view")).alias("gap_us")
    )
    grain = gaps.groupBy("gap_us").agg(F.count(F.lit(1)).alias("cnt"))
    cum = attach_prefix_agg(
        grain, ["gap_us"], "cnt", "cum_cnt", op="sum", total_out="n"
    ).select("gap_us", "cum_cnt", "n")
    n, cc = F.col("n"), F.col("cum_cnt")
    return cum.agg(
        F.any_value("n").cast("long").alias("n_converted"),
        F.floor(
            F.min(F.when(cc * 4 >= n, F.col("gap_us"))) / 60000000
        )
        .cast("long")
        .alias("p25_minutes"),
        F.floor(
            F.min(F.when(cc * 2 >= n, F.col("gap_us"))) / 60000000
        )
        .cast("long")
        .alias("median_minutes"),
        F.floor(
            F.min(F.when(cc * 4 >= 3 * n, F.col("gap_us"))) / 60000000
        )
        .cast("long")
        .alias("p75_minutes"),
    )


# ---------------------------------------------------------------------------
# q234 — hour-of-day × day-of-week activity heatmap
# ---------------------------------------------------------------------------


@query(
    "q234_activity_heatmap",
    oracle="""
    SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hod,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY dow, hod
    ORDER BY dow, hod
    """,
    survey="2.5-agg,F8",
)
def q234_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical ops heatmap: event and unique-user counts per
    (day-of-week, hour-of-day) cell.  The only subtlety is calendar
    parity: Spark's dayofweek and DuckDB's dayofweek use different
    numbering (Sunday=1 vs Sunday=0), so the Spark side subtracts one
    — both engines then emit Sunday=0..Saturday=6 under the session's
    pinned UTC.  168-cell output, one partial-agg shuffle with map-side
    combine plus a distinct-count; exact integers throughout."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("dow", "hod")
    )


# ---------------------------------------------------------------------------
# q235 — deterministic negative sampling for link prediction
# ---------------------------------------------------------------------------


@query(
    "q235_negative_edge_samples",
    oracle="""
    WITH pos AS (
        SELECT DISTINCT LEAST(a.user_id, b.user_id) AS u,
               GREATEST(a.user_id, b.user_id) AS v
        FROM events a JOIN events b
          ON a.event_id = b.event_id - 1 AND a.user_id <> b.user_id
    ),
    cand AS (
        SELECT (s * 48271) % 150 AS u, ((s * 16807) + 7) % 150 AS v
        FROM (SELECT unnest(range(1, 2001)) AS s)
    ),
    neg AS (
        SELECT DISTINCT LEAST(u, v) AS u, GREATEST(u, v) AS v
        FROM cand WHERE u <> v
    )
    SELECT n.u, n.v
    FROM neg n
    LEFT JOIN pos p ON n.u = p.u AND n.v = p.v
    WHERE p.u IS NULL
    ORDER BY n.u, n.v
    """,
    survey="J1,X1",
)
def q235_negative_edge_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sampling for link-prediction training data: candidate
    user pairs drawn by a DETERMINISTIC congruential stream (reproducible
    across engines and runs — no RNG), minus the positive edges (users
    adjacent in the event-id sequence), via the ledger anti-join (J1)
    on the canonicalized pair key.  The reference's 'skip what the
    ledger already has' pattern IS negative sampling's rejection step;
    at 100 TB the positive set is the broadcast/bloom side and
    candidates stream map-side.  All arithmetic is integer; pair
    canonicalization (LEAST/GREATEST) makes the anti-join key unique."""
    e = load_table(spark, sf_dir, "events")
    a = e.select(F.col("event_id").alias("eid"), F.col("user_id").alias("ua"))
    b = e.select((F.col("event_id") - 1).alias("eid"), F.col("user_id").alias("ub"))
    pos = (
        a.join(b, "eid")
        .filter(F.col("ua") != F.col("ub"))
        .select(
            F.least("ua", "ub").alias("u"), F.greatest("ua", "ub").alias("v")
        )
        .distinct()
    )
    cand = spark.range(1, 2001).select(
        ((F.col("id") * 48271) % 150).alias("u"),
        (((F.col("id") * 16807) + 7) % 150).alias("v"),
    )
    neg = (
        cand.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    return (
        neg.join(pos, ["u", "v"], "left_anti")
        .orderBy("u", "v")
    )


# ---------------------------------------------------------------------------
# q236 — classifier calibration bins (reliability diagram)
# ---------------------------------------------------------------------------


@query(
    "q236_calibration_bins",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
               CAST(round(
                   1000000.0 / (1.0 + exp(-(-1.0
                       + 0.8 * ln(CAST(len(string_split(text, ' ')) AS DOUBLE))
                       - 2.5 * (len(list_filter(string_split(text, ' '),
                                     t -> t = 'a' OR t = 'the'))
                                / CAST(len(string_split(text, ' ')) AS DOUBLE))
                       + 1.5 * (len(list_distinct(string_split(text, ' ')))
                                / CAST(len(string_split(text, ' ')) AS DOUBLE)))))
                   ) AS BIGINT) AS score_u
        FROM documents
    )
    SELECT CAST(least(floor(score_u / 100000.0), 9) AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(pos) AS BIGINT) AS n_positive,
           ROUND(SUM(pos) / CAST(COUNT(*) AS DOUBLE), 6) AS observed_rate,
           ROUND((least(floor(score_u / 100000.0), 9) + 0.5) / 10.0, 2)
               AS bin_midpoint
    FROM scored
    GROUP BY bin, bin_midpoint
    ORDER BY bin
    """,
    survey="X3,2.5-agg",
)
def q236_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the q125 quality score against the
    English label: ten equal-width probability bins with observed
    positive rates — the calibration readout that complements q218's
    AUC (AUC measures ranking, this measures whether 0.8 MEANS 80%).
    Scores snap to the same 1e-6 integer grid as q218 before binning,
    so bin membership is an integer decision; rates are exact-count
    divisions.  One narrow scan + a 10-group fold."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    ntd = F.size(toks).cast("double")
    stop_ratio = F.size(F.filter(toks, lambda t: (t == "a") | (t == "the"))) / ntd
    uniq_ratio = F.size(F.array_distinct(toks)) / ntd
    z = F.lit(-1.0) + 0.8 * F.log(ntd) - 2.5 * stop_ratio + 1.5 * uniq_ratio
    score_u = F.round(F.lit(1000000.0) / (1.0 + F.exp(-z))).cast("long")
    bin_ = F.least(F.floor(F.col("score_u") / 100000.0), F.lit(9)).cast("long")
    return (
        d.select(
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
            score_u.alias("score_u"),
        )
        .groupBy(
            bin_.alias("bin"),
            F.round((bin_ + 0.5) / 10.0, 2).alias("bin_midpoint"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pos").cast("long").alias("n_positive"),
            F.round(
                F.sum("pos") / F.count(F.lit(1)).cast("double"), 6
            ).alias("observed_rate"),
        )
        .select(
            "bin", "n_docs", "n_positive", "observed_rate", "bin_midpoint"
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q237 — point-in-time lookup over the SCD2 history (time travel)
# ---------------------------------------------------------------------------


@query(
    "q237_point_in_time_lookup",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, ts, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
        WHERE user_id < 20
    ),
    changes AS (
        SELECT user_id, event_id, ts, event_type FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    versioned AS (
        SELECT user_id, event_type AS state, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM changes
    )
    SELECT user_id, state, valid_from
    FROM versioned
    WHERE valid_from <= TIMESTAMP '2024-01-15'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15')
    ORDER BY user_id
    """,
    survey="2.5-window,X5",
)
def q237_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the q199 dimension: each user's state AS OF a
    timestamp, read off the SCD2 validity intervals with the half-open
    [valid_from, valid_to) containment test — the lookup that makes the
    type-2 build worth its window shuffle (training-data snapshots 'as
    the world was' at cut time).  At scale this is a filter, not a
    join: the interval table is already user-grain, and a partitioned
    layout on valid_from would prune to one time slice.  Exactly one
    row per user active at the cut (intervals partition each user's
    timeline); timestamps pass through raw."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_id", "ts", "event_type")
    )
    # event_id tie-break pins a TOTAL order — ts alone leaves version
    # assignment engine-dependent whenever two change rows share a ts
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versioned = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
    cut = F.lit("2024-01-15").cast("timestamp")
    return (
        versioned.filter(
            (F.col("valid_from") <= cut)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > cut))
        )
        .select("user_id", "state", "valid_from")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q238 — gaps and islands: contiguous activity runs as interval rows
# ---------------------------------------------------------------------------


@query(
    "q238_activity_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx
        FROM events
        WHERE user_id < 25
    ),
    grouped AS (
        SELECT user_id, day_idx,
               day_idx - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                                 ORDER BY day_idx) AS BIGINT)
                   AS island_key
        FROM days
    )
    SELECT user_id,
           MIN(day_idx) AS island_start,
           MAX(day_idx) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS island_days
    FROM grouped
    GROUP BY user_id, island_key
    ORDER BY user_id, island_start
    """,
    survey="2.5-window",
)
def q238_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's contiguous runs of active days as
    (start, end, length) interval rows, via the classic
    `day − row_number()` trick — consecutive days share a constant
    difference, so the difference IS the island key and one groupBy
    materializes every island with no self-join, no recursion, no
    per-row state.  The interval-row complement to q228's bitmask
    scalar (islands enumerate the runs; the bitmask reduces them):
    bounded-domain problems get bit algebra, unbounded timelines get
    this.  Shape: distinct to day grain, one per-user window, one fold;
    the user slice bounds oracle output only."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    days = e.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_idx")
    grouped = days.withColumn(
        "island_key",
        F.col("day_idx") - F.row_number().over(w).cast("long"),
    )
    return (
        grouped.groupBy("user_id", "island_key")
        .agg(
            F.min("day_idx").alias("island_start"),
            F.max("day_idx").alias("island_end"),
            F.count(F.lit(1)).cast("long").alias("island_days"),
        )
        .drop("island_key")
        .orderBy("user_id", "island_start")
    )


# ---------------------------------------------------------------------------
# q241 — data-contract validation with quarantine reasons
# ---------------------------------------------------------------------------


@query(
    "q241_validation_quarantine",
    oracle="""
    WITH checked AS (
        SELECT event_id,
               concat_ws(',',
                   CASE WHEN value < 0 OR value > 1000 THEN 'value_range' END,
                   CASE WHEN event_type NOT IN
                        ('view','click','purchase','signup','error')
                        THEN 'unknown_type' END,
                   CASE WHEN ts < TIMESTAMP '2024-01-01'
                        OR ts >= TIMESTAMP '2024-02-01'
                        THEN 'ts_out_of_window' END,
                   CASE WHEN props IS NULL OR json_type(try_cast(props AS JSON))
                        IS DISTINCT FROM 'OBJECT'
                        THEN 'bad_props_json' END,
                   CASE WHEN user_id IS NULL OR user_id < 0
                        THEN 'bad_user' END) AS reasons
        FROM events
    )
    SELECT CASE WHEN reasons = '' THEN 'PASS' ELSE reasons END AS verdict,
           COUNT(*) AS n_rows,
           CAST(MIN(event_id) AS BIGINT) AS first_event_id
    FROM checked
    GROUP BY verdict
    ORDER BY verdict
    """,
    survey="P3,X3",
)
def q241_validation_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract enforcement at ingest: five row-level rules (value
    range, type vocabulary, timestamp window, JSON validity, key
    sanity) evaluated in ONE pass, with failing rows grouped by their
    full reason combination — the quarantine report that routes bad
    rows to a dead-letter table instead of silently dropping them (the
    skip-bad-blob S4 policy, promoted to row granularity with
    attribution).  Rule evaluation is a pure projection fused into the
    scan; the reason string is built with the same concat_ws/CASE text
    on both engines; counts are exact.  On the clean fixture every row
    lands in PASS — which is itself the assertion a contract check
    exists to make."""
    e = load_table(spark, sf_dir, "events")
    reasons = F.concat_ws(
        ",",
        F.when((F.col("value") < 0) | (F.col("value") > 1000), "value_range"),
        F.when(
            ~F.col("event_type").isin(
                "view", "click", "purchase", "signup", "error"
            ),
            "unknown_type",
        ),
        F.when(
            (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
            | (F.col("ts") >= F.lit("2024-02-01").cast("timestamp")),
            "ts_out_of_window",
        ),
        # "parses as a JSON object" on BOTH engines: from_json(map) is
        # null for invalid JSON and for valid non-object literals
        # ('null', '123', '[1]') alike, mirroring the oracle's
        # json_type(try_cast(... AS JSON)) IS DISTINCT FROM 'OBJECT' —
        # get_json_object('$') would quarantine the literal 'null' that
        # a bare json_valid() oracle passes.
        F.when(
            F.col("props").isNull()
            | F.from_json("props", "map<string,string>").isNull(),
            "bad_props_json",
        ),
        F.when(F.col("user_id").isNull() | (F.col("user_id") < 0), "bad_user"),
    )
    return (
        e.select("event_id", reasons.alias("reasons"))
        .select(
            F.when(F.col("reasons") == "", "PASS")
            .otherwise(F.col("reasons"))
            .alias("verdict"),
            "event_id",
        )
        .groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("event_id").cast("long").alias("first_event_id"),
        )
        .orderBy("verdict")
    )


# ---------------------------------------------------------------------------
# q242 — time-bounded conversion (purchase within 24h of first view)
# ---------------------------------------------------------------------------


@query(
    "q242_bounded_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
        SELECT v.user_id,
               MAX(CASE WHEN e.event_type = 'purchase' AND e.ts > v.t_view
                        AND epoch_us(e.ts) - epoch_us(v.t_view) <= 86400000000
                        THEN 1 ELSE 0 END) AS converted
        FROM v JOIN events e ON e.user_id = v.user_id
        GROUP BY v.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_viewers,
           CAST(SUM(converted) AS BIGINT) AS n_converted_24h,
           ROUND(SUM(converted) / CAST(COUNT(*) AS DOUBLE), 6) AS cvr_24h
    FROM conv
    """,
    survey="X5,2.5-agg",
)
def q242_bounded_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window conversion: a viewer counts as converted only
    if a purchase lands within 24 HOURS of their first view — the
    bounded form every marketing/attribution readout actually uses
    (unbounded funnels overcount).  The window test is a µs-exact
    integer comparison (the q166/q189 epoch discipline); the readout is
    two exact counts and one division.  Shape: per-user MIN, one join
    back on user_id, a per-user MAX flag, a 1-row fold."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    conv = (
        v.join(e, "user_id")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_view"))
                    & (
                        F.unix_micros("ts") - F.unix_micros("t_view")
                        <= 86400000000
                    ),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_viewers"),
        F.sum("converted").cast("long").alias("n_converted_24h"),
        F.round(
            F.sum("converted") / F.count(F.lit(1)).cast("double"), 6
        ).alias("cvr_24h"),
    )


# ---------------------------------------------------------------------------
# q251 — RFM segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------


@query(
    "q251_rfm_segmentation",
    oracle="""
    WITH horizon AS (SELECT MAX(ts) AS t_max FROM events),
    rfm AS (
        SELECT e.user_id,
               CAST(epoch_us((SELECT t_max FROM horizon)) - epoch_us(MAX(e.ts))
                    AS BIGINT) AS recency_us,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM events e GROUP BY e.user_id
    ),
    scored AS (
        SELECT user_id,
               NTILE(5) OVER (ORDER BY recency_us DESC, user_id) AS r,
               NTILE(5) OVER (ORDER BY frequency, user_id) AS f,
               NTILE(5) OVER (ORDER BY monetary_cents, user_id) AS m
        FROM rfm
    )
    SELECT concat(CAST(r AS VARCHAR), CAST(f AS VARCHAR), CAST(m AS VARCHAR))
               AS segment,
           COUNT(*) AS n_users,
           CAST(MIN(user_id) AS BIGINT) AS first_user_id
    FROM scored
    GROUP BY segment
    ORDER BY segment
    """,
    survey="2.5-window,X5",
)
def q251_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic lifecycle-marketing cut: per-user
    Recency (µs since last event, against the corpus horizon),
    Frequency (event count) and Monetary (integer cents), each scored
    into quintiles with NTILE under a (metric, user_id) TOTAL order
    (ntile assigns by row position — q216's determinism lesson — and
    recency sorts DESC so quintile 5 is most-recent, matching f/m where
    5 is best).  Output is the segment histogram: '555' champions down
    to '111' lost.  All three metrics are exact integers; no float
    anywhere.  One per-user fold, three quintile scorings, one segment
    fold.

    Scale shape: the user grain is unbounded, so each NTILE(5) is the
    two-phase distributed ntile (operators/distributed_window.py) —
    range-partition on the metric, parallel local rank, tiny broadcast
    carry, integer bucket arithmetic — never a single-partition sort of
    the user table; the three scorings rejoin on user_id."""
    from gmail_etl_spark.operators.distributed_window import attach_ntile

    e = load_table(spark, sf_dir, "events")
    horizon = e.agg(F.max("ts").alias("t_max"))
    rfm = (
        e.groupBy("user_id")
        .agg(
            F.max("ts").alias("t_last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            (F.unix_micros("t_max") - F.unix_micros("t_last")).alias(
                "recency_us"
            ),
            "frequency",
            "monetary_cents",
        )
    )
    r = attach_ntile(
        rfm.select("user_id", "recency_us"),
        [F.col("recency_us").desc(), "user_id"],
        5,
        "r",
    ).select("user_id", "r")
    f = attach_ntile(
        rfm.select("user_id", "frequency"), ["frequency", "user_id"], 5, "f"
    ).select("user_id", "f")
    m = attach_ntile(
        rfm.select("user_id", "monetary_cents"),
        ["monetary_cents", "user_id"],
        5,
        "m",
    ).select("user_id", "m")
    scored = r.join(f, "user_id").join(m, "user_id")
    return (
        scored.select(
            F.concat(
                F.col("r").cast("string"),
                F.col("f").cast("string"),
                F.col("m").cast("string"),
            ).alias("segment"),
            "user_id",
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("user_id").cast("long").alias("first_user_id"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# q252 — burstiness / bot-likeness from inter-event gap moments
# ---------------------------------------------------------------------------


@query(
    "q252_burstiness_audit",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id))
                   AS gap_us
        FROM events
    ),
    m AS (
        SELECT user_id,
               CAST(COUNT(gap_us) AS BIGINT) AS n,
               CAST(SUM(gap_us) AS BIGINT) AS s,
               SUM(CAST(gap_us AS HUGEINT) * gap_us) AS ss
        FROM gaps WHERE gap_us IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(gap_us) >= 20
    )
    SELECT user_id, n AS n_gaps,
           ROUND((sqrt(CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
                       / (n * CAST(n - 1 AS DOUBLE)))
                  - s / CAST(n AS DOUBLE))
                 / (sqrt(CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
                         / (n * CAST(n - 1 AS DOUBLE)))
                    + s / CAST(n AS DOUBLE)), 6) AS burstiness
    FROM m
    WHERE user_id < 30
    ORDER BY user_id
    """,
    survey="X5,2.5-window",
)
def q252_burstiness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-quality audit for training-data curation: the Goh–
    Barabási burstiness B = (σ−μ)/(σ+μ) of each user's inter-event
    gaps — B near −1 flags metronomic, bot-like regularity whose
    content a curation pipeline usually excludes; near 0 is Poisson,
    positive is bursty-human.  Gap sums are exact integers (µs-exact
    lag differences, HUGEINT/DECIMAL(38) for the squared sums), and σ
    and μ enter one identical scalar expression per row — same float
    discipline as q203's moment statistics.  Shape: one per-user
    window for the lags, a per-user fold; the user slice bounds
    output."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    dec = "decimal(38,0)"
    m = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("gap_us").cast("long").alias("s"),
            F.sum(F.col("gap_us").cast(dec) * F.col("gap_us").cast(dec)).alias(
                "ss"
            ),
        )
        .filter(F.col("n") >= 20)
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    sd = F.sqrt(
        (n.cast(dec) * ss - s.cast(dec) * s).cast("double")
        / (n * (n - 1).cast("double"))
    )
    mean = s / n.cast("double")
    return (
        m.filter(F.col("user_id") < 30)
        .select(
            "user_id",
            n.alias("n_gaps"),
            F.round((sd - mean) / (sd + mean), 6).alias("burstiness"),
        )
        .orderBy("user_id")
    )
