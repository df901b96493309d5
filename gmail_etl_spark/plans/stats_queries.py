"""Statistical-analytics catalog entries: autocorrelation, CUSUM
changepoints, exact-moment shape statistics, k-anonymity, TVD/KS drift,
Gini, Benford, EWMA-as-prefix-sum, rank tests (Mann-Whitney), survival
hazards, AQP estimates, exact (weighted) order statistics and CIs,
forecasting backtests, Bollinger breakouts, Pareto skylines, and the
experimentation suite (CUPED, quantile treatment effects, power/MDE,
Wilson intervals, Simpson reversal audit).

Each query keeps every aggregate an EXACT integer (counts, cents,
products of both) until one final scalar expression, so the only float
operations are deterministic IEEE ops on exact integer inputs —
division, sqrt (correctly rounded by IEEE-754), multiplication —
mirrored token-for-token in the DuckDB oracle and rounded in-query on
both sides.  This is the hash-stability discipline (DEVNOTES) applied
to second-, third- and fourth-moment statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmail_etl_spark.plans.catalog import load_table, query

# ---------------------------------------------------------------------------
# q201 — autocorrelation of daily event counts (lags 1..3)
# ---------------------------------------------------------------------------


@query(
    "q201_acf_daily_counts",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               COUNT(*) AS y
        FROM events
        GROUP BY event_type, day_idx
    ),
    lagged AS (
        SELECT event_type, day_idx, y,
               LEAD(day_idx, 1) OVER w AS d1, LEAD(y, 1) OVER w AS y1,
               LEAD(day_idx, 2) OVER w AS d2, LEAD(y, 2) OVER w AS y2,
               LEAD(day_idx, 3) OVER w AS d3, LEAD(y, 3) OVER w AS y3
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day_idx)
    ),
    stats AS (
        SELECT event_type,
               COUNT(*) AS n, SUM(y) AS s, SUM(y * y) AS ss,
               SUM(CASE WHEN d1 = day_idx + 1 THEN y * y1 ELSE 0 END) AS p1,
               SUM(CASE WHEN d1 = day_idx + 1 THEN y ELSE 0 END) AS h1,
               SUM(CASE WHEN d1 = day_idx + 1 THEN y1 ELSE 0 END) AS t1,
               SUM(CASE WHEN d1 = day_idx + 1 THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN d2 = day_idx + 2 THEN y * y2 ELSE 0 END) AS p2,
               SUM(CASE WHEN d2 = day_idx + 2 THEN y ELSE 0 END) AS h2,
               SUM(CASE WHEN d2 = day_idx + 2 THEN y2 ELSE 0 END) AS t2,
               SUM(CASE WHEN d2 = day_idx + 2 THEN 1 ELSE 0 END) AS n2,
               SUM(CASE WHEN d3 = day_idx + 3 THEN y * y3 ELSE 0 END) AS p3,
               SUM(CASE WHEN d3 = day_idx + 3 THEN y ELSE 0 END) AS h3,
               SUM(CASE WHEN d3 = day_idx + 3 THEN y3 ELSE 0 END) AS t3,
               SUM(CASE WHEN d3 = day_idx + 3 THEN 1 ELSE 0 END) AS n3
        FROM lagged
        GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           ROUND((n * n * p1 - n * s * (h1 + t1) + n1 * s * s)
                 / CAST(n * n * ss - n * s * s AS DOUBLE), 6) AS acf_lag1,
           ROUND((n * n * p2 - n * s * (h2 + t2) + n2 * s * s)
                 / CAST(n * n * ss - n * s * s AS DOUBLE), 6) AS acf_lag2,
           ROUND((n * n * p3 - n * s * (h3 + t3) + n3 * s * s)
                 / CAST(n * n * ss - n * s * s AS DOUBLE), 6) AS acf_lag3
    FROM stats
    ORDER BY event_type
    """,
    survey="X5,2.5-window",
)
def q201_acf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the per-type daily-count series at lags
    1–3 — the seasonality / burstiness signal behind ingest-anomaly
    alerts.  The ACF is computed entirely from exact integer sufficient
    statistics: with S=Σy, SS=Σy², and per-lag pair sums Pₖ=Σyₜyₜ₊ₖ,
    Hₖ/Tₖ (head/tail sums over matched pairs), the estimator
    rₖ = (n²Pₖ − nS(Hₖ+Tₖ) + nₖS²) / (n²SS − nS²) is ONE division of two
    exact integers — no float accumulates, so the 6dp round is
    engine-stable.  A day-gap guard (dₖ = day+k) keeps semantics honest
    on sparse series.  Shape: one partial-agg shuffle to daily grain
    (the big reduction), one per-type window sort over ~n_days rows,
    one per-type fold — window state is days-per-type, never events."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
    ).agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("event_type").orderBy("day_idx")
    lagged = daily.select(
        "event_type",
        "day_idx",
        "y",
        *[
            c
            for k in (1, 2, 3)
            for c in (
                F.lead("day_idx", k).over(w).alias(f"d{k}"),
                F.lead("y", k).over(w).alias(f"y{k}"),
            )
        ],
    )

    def pair_sums(k: int) -> list:
        ok = F.col(f"d{k}") == F.col("day_idx") + k
        return [
            F.sum(F.when(ok, F.col("y") * F.col(f"y{k}")).otherwise(0)).alias(f"p{k}"),
            F.sum(F.when(ok, F.col("y")).otherwise(0)).alias(f"h{k}"),
            F.sum(F.when(ok, F.col(f"y{k}")).otherwise(0)).alias(f"t{k}"),
            F.sum(F.when(ok, 1).otherwise(0)).alias(f"n{k}"),
        ]

    stats = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
        *pair_sums(1),
        *pair_sums(2),
        *pair_sums(3),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    den = (n * n * ss - n * s * s).cast("double")

    def acf(k: int):
        p, h, t, nk = (F.col(c + str(k)) for c in ("p", "h", "t", "n"))
        return F.round((n * n * p - n * s * (h + t) + nk * s * s) / den, 6)

    return stats.select(
        "event_type",
        n.cast("long").alias("n_days"),
        acf(1).alias("acf_lag1"),
        acf(2).alias("acf_lag2"),
        acf(3).alias("acf_lag3"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q202 — CUSUM changepoint over daily value totals
# ---------------------------------------------------------------------------


@query(
    "q202_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        GROUP BY event_type, day_idx
    ),
    cum AS (
        SELECT event_type, day_idx,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
               SUM(cents) OVER (PARTITION BY event_type ORDER BY day_idx
                                ROWS UNBOUNDED PRECEDING) AS csum,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               SUM(cents) OVER (PARTITION BY event_type) AS total
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day_idx)
    ),
    dev AS (
        SELECT event_type, day_idx,
               abs(n * csum - t * total) AS abs_dev_scaled, n
        FROM cum
    )
    SELECT event_type,
           MIN(CASE WHEN abs_dev_scaled = m THEN day_idx END) AS change_day_idx,
           ROUND(MAX(m / CAST(n AS DOUBLE)) / 100.0, 2) AS max_dev_dollars
    FROM (SELECT *, MAX(abs_dev_scaled) OVER (PARTITION BY event_type) AS m
          FROM dev)
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey="X5,2.5-window",
)
def q202_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint locator: per event type, the day where
    the cumulative deviation from the series mean |Σᵢ≤ₜyᵢ − t·ȳ| peaks —
    the maximum-likelihood single-changepoint estimate for a mean shift.
    Scaling by n clears the float mean: Dₜ = n·cumsumₜ − t·total is an
    EXACT integer, so the argmax (ties → earliest day) is exact and the
    one reported float (max deviation in dollars) is a single division +
    2dp round on both engines.  Shape: daily partial-agg shuffle, then
    per-type running-sum windows over ~30 rows/type — the window state
    is the daily grain, so a 1000× corpus only deepens the first
    map-side combine."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    wo = Window.partitionBy("event_type").orderBy("day_idx")
    wa = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day_idx",
        F.row_number().over(wo).cast("long").alias("t"),
        F.sum("cents").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "csum"
        ),
        F.count(F.lit(1)).over(wa).cast("long").alias("n"),
        F.sum("cents").over(wa).alias("total"),
    )
    dev = cum.select(
        "event_type",
        "day_idx",
        F.abs(F.col("n") * F.col("csum") - F.col("t") * F.col("total")).alias(
            "abs_dev_scaled"
        ),
        "n",
    ).withColumn("m", F.max("abs_dev_scaled").over(wa))
    return (
        dev.groupBy("event_type")
        .agg(
            F.min(
                F.when(F.col("abs_dev_scaled") == F.col("m"), F.col("day_idx"))
            ).alias("change_day_idx"),
            F.round(
                F.max(F.col("m") / F.col("n").cast("double")) / 100.0, 2
            ).alias("max_dev_dollars"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q203 — exact-moment skewness and excess kurtosis per event type
# ---------------------------------------------------------------------------


@query(
    "q203_moment_shape_stats",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS HUGEINT) AS v
        FROM events
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(v) AS s1, SUM(v * v) AS s2,
               SUM(v * v * v) AS s3, SUM(v * v * v * v) AS s4
        FROM c GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           ROUND(CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
                      AS DOUBLE)
                 / (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
                    * CAST(n * s2 - s1 * s1 AS DOUBLE)), 6) AS skewness,
           ROUND(CAST(n * n * n * s4 - 4 * n * n * s1 * s3
                      + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
                      AS DOUBLE)
                 / (CAST(n * s2 - s1 * s1 AS DOUBLE)
                    * CAST(n * s2 - s1 * s1 AS DOUBLE)) - 3.0, 6)
               AS excess_kurtosis
    FROM m
    ORDER BY event_type
    """,
    survey="2.5-agg,X3",
)
def q203_moment_shape_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per event type from EXACT
    integer power sums — the distribution-shape profile behind
    quality-gate alerts ('did the value distribution grow a heavy
    tail?').  Engines disagree on float accumulation order AND on
    skewness/kurtosis sample-vs-population conventions, so both are
    bypassed: S₁..S₄ accumulate exactly (DECIMAL(38,0) on Spark,
    HUGEINT in DuckDB — cents⁴ power sums need ~36 digits at 100k
    rows/group; beyond ~1e5 rows/group rescale the cents), then
    skew = B/(√A·A) and kurt = C/A² − 3 with A = nS₂−S₁²,
    B = n²S₃−3nS₁S₂+2S₁³, C = n³S₄−4n²S₁S₃+6nS₁²S₂−3S₁⁴ — every float
    op (int→double cast, sqrt, one multiply, one divide) is correctly
    rounded IEEE on identical exact inputs, so 6dp rounding is stable.
    Shape: map-side partial power sums, one tiny per-type fold; the
    whole query is one scan + one 5-row shuffle at any scale."""
    e = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("decimal(38,0)")
    m = e.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.sum(F.col("v") * F.col("v") * F.col("v")).alias("s3"),
        F.sum(F.col("v") * F.col("v") * F.col("v") * F.col("v")).alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    a = (n * s2 - s1 * s1).cast("double")
    b = (n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1).cast("double")
    c = (
        n * n * n * s4
        - 4 * n * n * s1 * s3
        + 6 * n * s1 * s1 * s2
        - 3 * s1 * s1 * s1 * s1
    ).cast("double")
    return m.select(
        "event_type",
        n.cast("long").alias("n_events"),
        F.round(b / (F.sqrt(a) * a), 6).alias("skewness"),
        F.round(c / (a * a) - 3.0, 6).alias("excess_kurtosis"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q204 — k-anonymity audit over quasi-identifier classes
# ---------------------------------------------------------------------------


@query(
    "q204_k_anonymity_audit",
    oracle="""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               COUNT(*) AS class_size,
               COUNT(DISTINCT CASE WHEN c_acctbal >= 0 THEN 'pos'
                                   ELSE 'neg' END) AS sensitive_diversity
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, class_size,
           CAST(sensitive_diversity AS BIGINT) AS sensitive_diversity,
           class_size < 5 AS at_risk
    FROM classes
    ORDER BY c_nationkey, c_mktsegment
    """,
    survey="X3,2.5-agg",
)
def q204_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance audit for training-data release: group records
    by their quasi-identifier tuple (nation, market segment), report
    each equivalence-class size and the diversity of a sensitive
    attribute within it (l-diversity on the account-balance sign), and
    flag classes below k=5 — the re-identification risk set a curation
    pipeline must suppress or generalize before export.  The corpus
    k-anonymity level is the min class_size; at_risk rows are the
    suppression worklist.  One partial-agg shuffle on the
    quasi-identifier key; class counts are exact integers, no float
    surface at all."""
    cst = load_table(spark, sf_dir, "customer")
    return (
        cst.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct(
                F.when(F.col("c_acctbal") >= 0, F.lit("pos")).otherwise(
                    F.lit("neg")
                )
            )
            .cast("long")
            .alias("sensitive_diversity"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            "sensitive_diversity",
            (F.col("class_size") < 5).alias("at_risk"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q205 — distribution drift between month halves (total-variation distance)
# ---------------------------------------------------------------------------


@query(
    "q205_distribution_drift",
    oracle="""
    WITH binned AS (
        SELECT event_type,
               CAST(floor(CAST(round(value * 100) AS BIGINT) / 3600.0)
                    AS BIGINT) AS bin,
               CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END AS h1,
               CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 0 ELSE 1 END AS h2
        FROM events
    ),
    per_bin AS (
        SELECT event_type, bin, SUM(h1) AS a, SUM(h2) AS b
        FROM binned GROUP BY event_type, bin
    ),
    tot AS (
        SELECT event_type, CAST(SUM(a) AS BIGINT) AS n1,
               CAST(SUM(b) AS BIGINT) AS n2
        FROM per_bin GROUP BY event_type
    ),
    dev AS (
        SELECT p.event_type, p.bin,
               abs(p.a * t.n2 - p.b * t.n1) AS cross_dev, t.n1, t.n2
        FROM per_bin p JOIN tot t ON p.event_type = t.event_type
    )
    SELECT event_type,
           ROUND(CAST(SUM(cross_dev) AS DOUBLE)
                 / (2.0 * ANY_VALUE(n1) * ANY_VALUE(n2)), 6) AS tvd,
           MIN(CASE WHEN cross_dev = m THEN bin END) AS worst_bin
    FROM (SELECT *, MAX(cross_dev) OVER (PARTITION BY event_type) AS m
          FROM dev)
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey="X3,2.5-agg",
)
def q205_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/serve drift check: total-variation distance between the
    first- and second-half-of-month value histograms per event type
    (16 fixed 36-dollar bins), plus the bin contributing the largest
    deviation.  The naive Σ|aᵢ/n₁ − bᵢ/n₂| sums floats in engine-
    specific order; clearing denominators makes every addend the EXACT
    integer |aᵢn₂ − bᵢn₁| so the sum is order-free and the single final
    division /(2n₁n₂) is deterministic.  Shape: one conditional-count
    shuffle to (type, bin) grain — 80 rows — then scalar joins; the
    drift readout costs one corpus scan at any scale."""
    e = load_table(spark, sf_dir, "events")
    half1 = (F.col("ts") < F.lit("2024-01-15").cast("timestamp")).cast("int")
    per_bin = (
        e.select(
            "event_type",
            F.floor(
                F.round(F.col("value") * 100).cast("long") / F.lit(3600.0)
            )
            .cast("long")
            .alias("bin"),
            half1.alias("h1"),
            (1 - half1).alias("h2"),
        )
        .groupBy("event_type", "bin")
        .agg(F.sum("h1").alias("a"), F.sum("h2").alias("b"))
    )
    tot = per_bin.groupBy("event_type").agg(
        F.sum("a").cast("long").alias("n1"), F.sum("b").cast("long").alias("n2")
    )
    dev = per_bin.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bin",
        F.abs(F.col("a") * F.col("n2") - F.col("b") * F.col("n1")).alias(
            "cross_dev"
        ),
        "n1",
        "n2",
    )
    wa = Window.partitionBy("event_type")
    return (
        dev.withColumn("m", F.max("cross_dev").over(wa))
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum("cross_dev").cast("double")
                / (2.0 * F.any_value("n1") * F.any_value("n2")),
                6,
            ).alias("tvd"),
            F.min(
                F.when(F.col("cross_dev") == F.col("m"), F.col("bin"))
            ).alias("worst_bin"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q206 — Gini concentration of customer spend per market segment
# ---------------------------------------------------------------------------


@query(
    "q206_gini_concentration",
    oracle="""
    WITH spend AS (
        SELECT c.c_mktsegment, c.c_custkey,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, c.c_custkey
    ),
    ranked AS (
        SELECT c_mktsegment, cents,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                       ORDER BY cents, c_custkey) AS BIGINT) AS i
        FROM spend
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(2 * SUM(i * cents) - (COUNT(*) + 1) * SUM(cents)
                      AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * SUM(cents)), 6) AS gini
    FROM ranked
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    survey="2.5-window,2.5-agg",
)
def q206_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration audit: the Gini coefficient of per-customer
    spend within each market segment, via the rank formula
    G = (2Σi·xᵢ − (n+1)Σx)/(nΣx) over cents sorted ascending (ties
    broken by custkey — equal values contribute identically under any
    tie order, so the rank tie-break is presentational, not semantic).
    Every term is an exact integer — rank times cents stays under 2⁶³
    past sf1 — and the one division is 6dp-rounded on both engines.
    Shape: the orders→customer join shuffles on custkey, the rank
    window shuffles on segment; both keys are high-cardinality or
    low-skew, and the window input is one row per customer, already
    reduced by the map-side spend aggregation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "c_custkey")
    ranked = spend.select(
        "c_mktsegment", "cents", F.row_number().over(w).cast("long").alias("i")
    )
    n = F.count(F.lit(1))
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            n.cast("long").alias("n_customers"),
            F.round(
                (2 * F.sum(F.col("i") * F.col("cents")) - (n + 1) * F.sum("cents"))
                .cast("double")
                / (n.cast("double") * F.sum("cents")),
                6,
            ).alias("gini"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q207 — Benford first-digit audit of order totals
# ---------------------------------------------------------------------------

#: log10(1 + 1/d) to 6dp, shared verbatim by both engines so the
#: expected-share column has zero float surface.
_BENFORD = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


@query(
    "q207_benford_audit",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders
    ),
    obs AS (
        SELECT digit, COUNT(*) AS observed FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM obs),
    expected AS (
        SELECT CAST(digit AS BIGINT) AS digit,
               CAST(expected_share AS DOUBLE) AS expected_share
        FROM (VALUES
            (1, 0.30103), (2, 0.176091), (3, 0.124939), (4, 0.09691),
            (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
            (9, 0.045757)) AS v(digit, expected_share)
    )
    SELECT e.digit,
           COALESCE(o.observed, 0) AS observed,
           ROUND(COALESCE(o.observed, 0) / CAST(t.n AS DOUBLE), 6)
               AS observed_share,
           e.expected_share,
           ROUND(abs(COALESCE(o.observed, 0) / CAST(t.n AS DOUBLE)
                     - e.expected_share), 6) AS abs_dev
    FROM expected e
    LEFT JOIN obs o ON o.digit = e.digit
    CROSS JOIN tot t
    ORDER BY e.digit
    """,
    survey="2.5-agg,X3",
)
def q207_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law data-quality audit: the first-digit distribution of
    integer order totals against the log10(1+1/d) expectation — the
    standard fabricated-or-truncated-data smoke test for an ingested
    numeric column.  Expected shares are 6dp literals shared verbatim
    by both engines, so the only computed floats are observed/n and one
    subtraction of a rounded literal — deterministic single IEEE ops.
    Shape: one 9-group conditional count (map-side combined), the
    9-row expectation broadcast, the 1-row total broadcast; the audit
    is a single scan at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    obs = (
        o.select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    expected = o.sparkSession.createDataFrame(
        [(d, s) for d, s in _BENFORD.items()], "digit bigint, expected_share double"
    )
    tot = obs.agg(F.sum("observed").cast("long").alias("n"))
    share = F.col("observed") / F.col("n").cast("double")
    return (
        expected.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("observed", F.lit(0)).alias("observed"),
            F.round(
                F.coalesce("observed", F.lit(0)) / F.col("n").cast("double"), 6
            ).alias("observed_share"),
            "expected_share",
            F.round(
                F.abs(
                    F.coalesce("observed", F.lit(0)) / F.col("n").cast("double")
                    - F.col("expected_share")
                ),
                6,
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# q208 — EWMA smoothing as exact integer prefix sums (alpha = 1/2)
# ---------------------------------------------------------------------------


@query(
    "q208_ewma_smoothing",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        GROUP BY event_type, day_idx
    ),
    indexed AS (
        SELECT event_type, day_idx, cents,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY day_idx) - 1 AS BIGINT) AS t
        FROM daily
    ),
    weighted AS (
        SELECT event_type, day_idx, cents, t,
               cents * (CASE WHEN t = 0 THEN 1
                             ELSE (CAST(1 AS BIGINT) << (t - 1)) END) AS wy
        FROM indexed
    )
    SELECT event_type, day_idx, cents,
           ROUND(CAST(SUM(wy) OVER (PARTITION BY event_type ORDER BY day_idx
                                    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST((CAST(1 AS BIGINT) << t) AS DOUBLE), 4)
               AS level_cents
    FROM weighted
    ORDER BY event_type, day_idx
    """,
    survey="X5,2.5-window",
)
def q208_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily value totals with
    α = 1/2, computed WITHOUT per-row float recursion: the recurrence
    levelₜ = (yₜ + levelₜ₋₁)/2 telescopes to Lₜ = Σwᵢyᵢ with integer
    weights w₀=1, wᵢ=2^(i−1), so the running state is ONE exact integer
    prefix sum and levelₜ = Lₜ/2ᵗ is a single power-of-two division —
    the float appears once per row on exact inputs, making the 4dp
    round engine-stable (Lₜ stays under 2⁶³ for series up to ~35 steps;
    longer series re-anchor per window, the standard segmented-scan
    trick).  This is the general recipe for linear recurrences on Spark:
    turn the sequential dependency into a weighted prefix sum a window
    can evaluate, instead of a driver loop or a per-row UDF."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    wo = Window.partitionBy("event_type").orderBy("day_idx")
    indexed = daily.withColumn(
        "t", (F.row_number().over(wo) - 1).cast("long")
    )
    weighted = indexed.withColumn(
        "wy",
        F.col("cents")
        * F.when(F.col("t") == 0, F.lit(1).cast("long")).otherwise(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(t - 1 AS INT))")
        ),
    )
    return weighted.select(
        "event_type",
        "day_idx",
        "cents",
        F.round(
            F.sum("wy")
            .over(wo.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(t AS INT)) AS DOUBLE)"),
            4,
        ).alias("level_cents"),
    ).orderBy("event_type", "day_idx")


# ---------------------------------------------------------------------------
# q212 — two-sample Kolmogorov–Smirnov drift test (exact ECDF arithmetic)
# ---------------------------------------------------------------------------


@query(
    "q212_ks_drift_test",
    oracle="""
    WITH tagged AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
               CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END AS h1
        FROM events
    ),
    grain AS (
        SELECT event_type, cents, SUM(h1) AS a, SUM(1 - h1) AS b
        FROM tagged GROUP BY event_type, cents
    ),
    cum AS (
        SELECT event_type, cents,
               SUM(a) OVER w AS ca, SUM(b) OVER w AS cb,
               SUM(a) OVER (PARTITION BY event_type) AS n1,
               SUM(b) OVER (PARTITION BY event_type) AS n2
        FROM grain
        WINDOW w AS (PARTITION BY event_type ORDER BY cents
                     ROWS UNBOUNDED PRECEDING)
    ),
    dev AS (
        SELECT event_type, cents, abs(ca * n2 - cb * n1) AS d_scaled, n1, n2
        FROM cum
    )
    SELECT event_type,
           ROUND(CAST(MAX(m) AS DOUBLE)
                 / (CAST(ANY_VALUE(n1) AS DOUBLE) * ANY_VALUE(n2)), 6) AS ks_d,
           MIN(CASE WHEN d_scaled = m THEN cents END) AS at_cents
    FROM (SELECT *, MAX(d_scaled) OVER (PARTITION BY event_type) AS m FROM dev)
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey="X3,2.5-window",
)
def q212_ks_drift_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the first- and
    second-half-of-month value distributions per event type — the
    binning-free companion to q205's TVD: D = max|F₁(v) − F₂(v)| over
    ECDF step points, with the argmax value reported.  Aggregating to
    value grain FIRST makes each cumulative count an exact ECDF step
    (no mid-tie evaluation), and cross-multiplying |c₁n₂ − c₂n₁| keeps
    every compared quantity an exact integer — the division by n₁n₂
    happens once, after the integer argmax.  Shape: one shuffle to
    (type, value) grain with map-side combine, one per-type window over
    the distinct-value table (run-length compressed, ~56k rows max per
    type regardless of corpus size — cents bound the grain), then a
    5-row fold."""
    e = load_table(spark, sf_dir, "events")
    h1 = (F.col("ts") < F.lit("2024-01-15").cast("timestamp")).cast("int")
    grain = (
        e.select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            h1.alias("h1"),
        )
        .groupBy("event_type", "cents")
        .agg(F.sum("h1").alias("a"), F.sum(1 - F.col("h1")).alias("b"))
    )
    wo = Window.partitionBy("event_type").orderBy("cents")
    wa = Window.partitionBy("event_type")
    cum = grain.select(
        "event_type",
        "cents",
        F.sum("a").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("ca"),
        F.sum("b").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cb"),
        F.sum("a").over(wa).alias("n1"),
        F.sum("b").over(wa).alias("n2"),
    )
    dev = cum.select(
        "event_type",
        "cents",
        F.abs(F.col("ca") * F.col("n2") - F.col("cb") * F.col("n1")).alias(
            "d_scaled"
        ),
        "n1",
        "n2",
    ).withColumn("m", F.max("d_scaled").over(wa))
    return (
        dev.groupBy("event_type")
        .agg(
            F.round(
                F.max("m").cast("double")
                / (F.any_value("n1").cast("double") * F.any_value("n2")),
                6,
            ).alias("ks_d"),
            F.min(
                F.when(F.col("d_scaled") == F.col("m"), F.col("cents"))
            ).alias("at_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q213 — Mann–Whitney U (one-vs-rest per event type, tie-corrected z)
# ---------------------------------------------------------------------------


@query(
    "q213_mann_whitney_u",
    oracle="""
    WITH vals AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    grain AS (
        SELECT cents, event_type, COUNT(*) AS cnt
        FROM vals GROUP BY cents, event_type
    ),
    vtot AS (
        SELECT cents, CAST(SUM(cnt) AS BIGINT) AS t,
               CAST(SUM(SUM(cnt)) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT) AS c_before
        FROM grain GROUP BY cents
    ),
    g_tot AS (
        SELECT CAST(SUM(t) AS BIGINT) AS n,
               CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
        FROM vtot
    ),
    rsum AS (
        SELECT g.event_type,
               CAST(SUM(g.cnt) AS BIGINT) AS n1,
               CAST(SUM(g.cnt * (2 * COALESCE(v.c_before, 0) + v.t + 1))
                    AS BIGINT) AS r1_x2
        FROM grain g JOIN vtot v ON g.cents = v.cents
        GROUP BY g.event_type
    )
    SELECT r.event_type, r.n1, (gl.n - r.n1) AS n2,
           ROUND((r.r1_x2 - r.n1 * (r.n1 + 1)) / 2.0, 1) AS u1,
           ROUND((r.r1_x2 - r.n1 * (r.n1 + 1) - r.n1 * (gl.n - r.n1))
                 * sqrt(CAST(3.0 AS DOUBLE) * gl.n * (gl.n - 1))
                 / sqrt(CAST(r.n1 * (gl.n - r.n1) AS DOUBLE)
                        * ((gl.n + 1) * gl.n * (gl.n - 1) - gl.tie_term)),
                 4) AS z_score
    FROM rsum r CROSS JOIN g_tot gl
    ORDER BY r.event_type
    """,
    survey="X3,2.5-agg",
)
def q213_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank test, one-vs-rest per event type: does this
    type's value distribution stochastically dominate the rest?  Tied
    ranks are handled exactly by DOUBLING: a value run of size t
    starting after c pooled observations has average rank (2c+t+1)/2,
    so 2·R₁ = Σ cnt·(2c+t+1) stays an exact integer, as do 2·U₁ and the
    tie-corrected variance numerator n₁n₂((n+1)n(n−1) − Σ(t³−t)).  The
    z-score is assembled from two exact-integer square roots (IEEE
    sqrt is correctly rounded) and one division — engine-stable at 4dp;
    U₁ itself is reported at its native half-integer resolution.
    Shape: one shuffle to (value, type) grain, a run-length prefix over
    distinct values via the two-phase distributed form
    (operators/distributed_window.py — no single-partition sort even if
    the value domain grows), broadcastable scalars, a per-type fold."""
    from gmail_etl_spark.operators.distributed_window import attach_prefix_agg

    e = load_table(spark, sf_dir, "events")
    vals = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    grain = vals.groupBy("cents", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    vtot = attach_prefix_agg(
        grain.groupBy("cents").agg(F.sum("cnt").cast("long").alias("t")),
        ["cents"],
        "t",
        "__cb",
        op="sum",
        inclusive=False,
    ).select(
        "cents",
        "t",
        F.coalesce(F.col("__cb"), F.lit(0)).cast("long").alias("c_before"),
    )
    glob = vtot.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_term"),
    )
    rsum = (
        grain.join(vtot, "cents")
        .groupBy("event_type")
        .agg(
            F.sum("cnt").cast("long").alias("n1"),
            F.sum(
                F.col("cnt") * (2 * F.col("c_before") + F.col("t") + 1)
            )
            .cast("long")
            .alias("r1_x2"),
        )
    )
    n, n1, r1_x2, tie = (
        F.col("n"),
        F.col("n1"),
        F.col("r1_x2"),
        F.col("tie_term"),
    )
    u1_x2 = r1_x2 - n1 * (n1 + 1)
    var_num = (n1 * (n - n1)).cast("double") * (
        (n + 1) * n * (n - 1) - tie
    )
    return (
        rsum.crossJoin(F.broadcast(glob))
        .select(
            "event_type",
            "n1",
            (n - n1).alias("n2"),
            F.round(u1_x2 / 2.0, 1).alias("u1"),
            F.round(
                (u1_x2 - n1 * (n - n1))
                * F.sqrt(F.lit(3.0) * n * (n - 1))
                / F.sqrt(var_num),
                4,
            ).alias("z_score"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q214 — discrete churn hazard per week (survival analysis, count-exact)
# ---------------------------------------------------------------------------


@query(
    "q214_churn_hazard",
    oracle="""
    WITH user_span AS (
        SELECT user_id,
               MIN(CAST(floor(epoch(ts) / 604800) AS BIGINT)) AS first_week,
               MAX(CAST(floor(epoch(ts) / 604800) AS BIGINT)) AS last_week
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(last_week) AS max_week FROM user_span),
    starts AS (
        SELECT first_week AS week, COUNT(*) AS s FROM user_span GROUP BY first_week
    ),
    ends AS (
        SELECT last_week AS week, COUNT(*) AS e FROM user_span GROUP BY last_week
    ),
    weeks AS (
        SELECT DISTINCT week FROM (SELECT week FROM starts
                                   UNION ALL SELECT week FROM ends)
    ),
    merged AS (
        SELECT w.week, COALESCE(s.s, 0) AS s, COALESCE(e.e, 0) AS e
        FROM weeks w
        LEFT JOIN starts s ON s.week = w.week
        LEFT JOIN ends e ON e.week = w.week
    ),
    risk AS (
        SELECT week,
               CAST(SUM(s) OVER (ORDER BY week ROWS UNBOUNDED PRECEDING)
                    - COALESCE(SUM(e) OVER (ORDER BY week
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS at_risk,
               CAST(e AS BIGINT) AS ended
        FROM merged
    )
    SELECT r.week, r.at_risk, r.ended,
           (r.week = h.max_week) AS censored,
           ROUND(CASE WHEN r.week = h.max_week THEN 0.0
                      ELSE r.ended / CAST(r.at_risk AS DOUBLE) END, 6) AS hazard
    FROM risk r CROSS JOIN horizon h
    ORDER BY r.week
    """,
    survey="X5,2.5-window",
)
def q214_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time survival analysis of user churn: per epoch-week,
    the number of users at risk (active span covers the week), the
    number whose LAST activity falls in it, and the hazard rate
    ended/at_risk — with the final week flagged censored (still-active
    users are not churners) and its hazard pinned to 0.  The risk set
    is reconstructed from per-user (first, last) spans via cumulative
    starts minus prior ends — two integer prefix sums over the week
    grain, never a user×week cross join — so every count is exact and
    the hazard is one division.  Shape: one per-user span aggregation
    (the only corpus-sized shuffle), then week-grain arithmetic on a
    handful of rows; the classic KM/life-table input assembled
    Spark-first."""
    e = load_table(spark, sf_dir, "events")
    week = F.floor(F.unix_timestamp("ts") / 604800).cast("long")
    span = e.select("user_id", week.alias("week")).groupBy("user_id").agg(
        F.min("week").alias("first_week"), F.max("week").alias("last_week")
    )
    starts = span.groupBy(F.col("first_week").alias("week")).agg(
        F.count(F.lit(1)).alias("s")
    )
    ends = span.groupBy(F.col("last_week").alias("week")).agg(
        F.count(F.lit(1)).alias("e")
    )
    merged = (
        starts.join(ends, "week", "full_outer")
        .select(
            "week",
            F.coalesce("s", F.lit(0)).alias("s"),
            F.coalesce("e", F.lit(0)).alias("e"),
        )
    )
    wv = Window.orderBy("week")
    risk = merged.select(
        "week",
        (
            F.sum("s").over(wv.rowsBetween(Window.unboundedPreceding, 0))
            - F.coalesce(
                F.sum("e").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
        )
        .cast("long")
        .alias("at_risk"),
        F.col("e").cast("long").alias("ended"),
    )
    horizon = span.agg(F.max("last_week").alias("max_week"))
    return (
        risk.crossJoin(F.broadcast(horizon))
        .select(
            "week",
            "at_risk",
            "ended",
            (F.col("week") == F.col("max_week")).alias("censored"),
            F.round(
                F.when(F.col("week") == F.col("max_week"), F.lit(0.0)).otherwise(
                    F.col("ended") / F.col("at_risk").cast("double")
                ),
                6,
            ).alias("hazard"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# q220 — Pareto frontier (2-D skyline via strict integer range frames)
# ---------------------------------------------------------------------------


@query(
    "q220_pareto_frontier",
    oracle="""
    WITH spend AS (
        SELECT o_custkey AS custkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey
    )
    SELECT custkey, cents, n_orders
    FROM (
        SELECT custkey, cents, n_orders,
               MAX(n_orders) OVER (ORDER BY cents DESC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS max_n_higher_spend,
               MAX(cents) OVER (ORDER BY n_orders DESC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS max_c_higher_n
        FROM spend
    )
    WHERE (max_n_higher_spend IS NULL OR max_n_higher_spend < n_orders)
      AND (max_c_higher_n IS NULL OR max_c_higher_n < cents)
    ORDER BY cents DESC
    """,
    survey="2.5-window",
)
def q220_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: customers not Pareto-dominated on (total spend,
    order count) — dominated means someone strictly better on one axis
    and at least as good on the other.  Both dominance tests reduce to
    range-frame window maxima over exact integers: max(n_orders) among
    STRICTLY higher spend is `ORDER BY cents DESC RANGE ... 1 PRECEDING`
    (the integer range frame excludes the current value's peers, giving
    strictness for free), and symmetrically for the other axis; a point
    survives iff both maxima are below its own coordinates.  No
    self-join, no O(n²) dominance pairs — two sorts of the customer
    aggregate.  All comparisons are integer; no float surface at all.
    The classic multi-criteria 'best customers / best configs' readout,
    and the 2-D special case of the general skyline.

    Scale shape: 'max over rows with a STRICTLY better value' factors
    through the value grain — group to distinct cents (resp. n_orders),
    take the per-value max of the other axis, then an EXCLUSIVE
    two-phase distributed prefix max over the value order
    (operators/distributed_window.py) and a join back on the value.
    Identical to the strict range frame (the per-value fold collapses
    peers; the exclusive prefix excludes the current value), with no
    single-partition sort of the unbounded customer grain."""
    from gmail_etl_spark.operators.distributed_window import attach_prefix_agg

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    by_cents = attach_prefix_agg(
        spend.groupBy("cents").agg(F.max("n_orders").alias("__grp_max_n")),
        [F.col("cents").desc()],
        "__grp_max_n",
        "max_n_higher_spend",
        op="max",
        inclusive=False,
    ).select("cents", "max_n_higher_spend")
    by_orders = attach_prefix_agg(
        spend.groupBy("n_orders").agg(F.max("cents").alias("__grp_max_c")),
        [F.col("n_orders").desc()],
        "__grp_max_c",
        "max_c_higher_n",
        op="max",
        inclusive=False,
    ).select("n_orders", "max_c_higher_n")
    dom = spend.join(by_cents, "cents").join(by_orders, "n_orders")
    return (
        dom.filter(
            (
                F.col("max_n_higher_spend").isNull()
                | (F.col("max_n_higher_spend") < F.col("n_orders"))
            )
            & (
                F.col("max_c_higher_n").isNull()
                | (F.col("max_c_higher_n") < F.col("cents"))
            )
        )
        .select("custkey", "cents", "n_orders")
        .orderBy(F.col("cents").desc())
    )


# ---------------------------------------------------------------------------
# q221 — anomaly flags via a fully-integer z-score comparison
# ---------------------------------------------------------------------------


@query(
    "q221_daily_anomaly_flags",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               COUNT(*) AS y
        FROM events
        GROUP BY event_type, day_idx
    ),
    stats AS (
        SELECT event_type, day_idx, y,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(y) OVER w AS BIGINT) AS s,
               CAST(SUM(y * y) OVER w AS BIGINT) AS ss
        FROM daily
        WINDOW w AS (PARTITION BY event_type)
    )
    SELECT event_type, day_idx, CAST(y AS BIGINT) AS n_events,
           ROUND((n * y - s) / sqrt(CAST(n * ss - s * s AS DOUBLE)), 4)
               AS z_score
    FROM stats
    WHERE n > 1
      AND (n * y - s) * (n * y - s) > 4 * (n * ss - s * s)
    ORDER BY event_type, day_idx
    """,
    survey="X5,2.5-agg",
)
def q221_daily_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume anomalies per event type: days whose count deviates
    more than 2σ from the type's mean — with the THRESHOLD TEST done in
    exact integer arithmetic.  z = (y−μ)/σ clears to
    z² > 4  ⇔  (ny − S)²·n > 4(n·SS − S²)·n (population σ), so the flag
    decision — the part where a ulp could flip a row in or out of the
    result — never touches a float; the reported z-score itself is one
    integer-fed sqrt + division, rounded 4dp for display.  Shape:
    daily-grain partial agg, one per-type window for the three
    sufficient statistics, a filtered projection — anomaly detection as
    a 1.5-shuffle query at any scale."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wa = Window.partitionBy("event_type")
    stats = daily.select(
        "event_type",
        "day_idx",
        "y",
        F.count(F.lit(1)).over(wa).cast("long").alias("n"),
        F.sum("y").over(wa).cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).over(wa).cast("long").alias("ss"),
    )
    n, s, ss, y = F.col("n"), F.col("s"), F.col("ss"), F.col("y")
    dev = n * y - s
    var_n2 = n * ss - s * s
    return (
        stats.filter((n > 1) & (dev * dev > 4 * var_n2))
        .select(
            "event_type",
            "day_idx",
            y.cast("long").alias("n_events"),
            F.round(dev / F.sqrt(var_n2.cast("double")), 4).alias("z_score"),
        )
        .orderBy("event_type", "day_idx")
    )


# ---------------------------------------------------------------------------
# q222 — AQP: deterministic hash-sample estimate with self-evaluation
# ---------------------------------------------------------------------------


@query(
    "q222_sampled_sum_estimate",
    oracle="""
    WITH base AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               ((l_orderkey * 2654435761 + l_linenumber * 40503) % 64 = 0)
                   AS in_sample
        FROM lineitem
    ),
    agg AS (
        SELECT l_returnflag,
               CAST(SUM(cents) AS BIGINT) AS exact_cents,
               CAST(COUNT(*) AS BIGINT) AS exact_rows,
               CAST(SUM(CASE WHEN in_sample THEN cents ELSE 0 END) AS BIGINT)
                   AS sample_cents,
               CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
                   AS sample_rows
        FROM base GROUP BY l_returnflag
    )
    SELECT l_returnflag, exact_rows, sample_rows,
           64 * sample_cents AS est_cents, exact_cents,
           ROUND((64 * sample_cents - exact_cents) * 1000000.0 / exact_cents,
                 1) AS err_ppm
    FROM agg
    ORDER BY l_returnflag
    """,
    survey="2.5-agg,X6",
)
def q222_sampled_sum_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing with a DETERMINISTIC sampling frame:
    a 1-in-64 multiplicative-hash sample of lineitem (Knuth constant on
    the integer key — portable to any engine, no RNG, no xxhash) scales
    up to a Horvitz–Thompson estimate of per-flag revenue, reported
    NEXT TO the exact answer with the error in ppm — the query evaluates
    its own approximation, which is how a 100 TB deployment decides
    whether the 64× cheaper scan is good enough.  All quantities are
    exact integers (the estimate is 64×an integer; the only float is
    the final error ratio).  The sample predicate is a pure projection —
    at scale it rides the parquet scan, and the same frame (same key,
    same constant) reproduces across runs, engines, and snapshots —
    the property 'TABLESAMPLE' cannot give you."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        (
            (
                F.col("l_orderkey") * F.lit(2654435761)
                + F.col("l_linenumber") * F.lit(40503)
            )
            % 64
            == 0
        ).alias("in_sample"),
    )
    agg = base.groupBy("l_returnflag").agg(
        F.sum("cents").cast("long").alias("exact_cents"),
        F.count(F.lit(1)).cast("long").alias("exact_rows"),
        F.sum(F.when(F.col("in_sample"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sample_cents"),
        F.sum(F.when(F.col("in_sample"), 1).otherwise(0))
        .cast("long")
        .alias("sample_rows"),
    )
    return agg.select(
        "l_returnflag",
        "exact_rows",
        "sample_rows",
        (64 * F.col("sample_cents")).alias("est_cents"),
        "exact_cents",
        F.round(
            (64 * F.col("sample_cents") - F.col("exact_cents"))
            * 1000000.0
            / F.col("exact_cents"),
            1,
        ).alias("err_ppm"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# q223 — exact order statistics from the run-length value grain
# ---------------------------------------------------------------------------


@query(
    "q223_exact_order_statistics",
    oracle="""
    WITH grain AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
               COUNT(*) AS cnt
        FROM events GROUP BY event_type, cents
    ),
    cum AS (
        SELECT event_type, cents,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cum_cnt,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM grain
    )
    SELECT event_type,
           CAST(ANY_VALUE(n) AS BIGINT) AS n_events,
           MIN(CASE WHEN cum_cnt * 2 >= n THEN cents END) AS median_cents,
           MIN(CASE WHEN cum_cnt * 10 >= 9 * n THEN cents END) AS p90_cents,
           MIN(CASE WHEN cum_cnt * 100 >= 99 * n THEN cents END) AS p99_cents
    FROM cum
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey="2.5-agg,X6",
)
def q223_exact_order_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles without interpolation: the lower order statistic
    at rank ⌈qn⌉, read off the cumulative run-length table with an
    integer rank test (cum·k ≥ q·k·n — no division, no float, no
    engine-specific interpolation convention, the ulp problem q68 had
    to round around simply doesn't exist).  The value grain bounds the
    window input at the domain size (≤56k cents rows per type) however
    large the corpus; this run-length trick is the exact-percentile
    companion to the KLL sketch rollup (q176): KLL for mergeable
    approximate state, this for exact answers when the value domain is
    bounded.  Shape: one (type, value) partial-agg shuffle with map-side
    combine, a per-type prefix window, a 5-row fold."""
    e = load_table(spark, sf_dir, "events")
    grain = e.groupBy(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wo = Window.partitionBy("event_type").orderBy("cents")
    wa = Window.partitionBy("event_type")
    cum = grain.select(
        "event_type",
        "cents",
        F.sum("cnt").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_cnt"
        ),
        F.sum("cnt").over(wa).alias("n"),
    )
    n, cc = F.col("n"), F.col("cum_cnt")
    return (
        cum.groupBy("event_type")
        .agg(
            F.any_value("n").cast("long").alias("n_events"),
            F.min(F.when(cc * 2 >= n, F.col("cents"))).alias("median_cents"),
            F.min(F.when(cc * 10 >= 9 * n, F.col("cents"))).alias("p90_cents"),
            F.min(F.when(cc * 100 >= 99 * n, F.col("cents"))).alias("p99_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q224 — walk-forward forecast evaluation (expanding-window OLS, exact MAE)
# ---------------------------------------------------------------------------


@query(
    "q224_walk_forward_forecast",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events
        GROUP BY event_type, day_idx
    ),
    anchored AS (
        SELECT event_type, y,
               CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS x
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day_idx)
    ),
    expanding AS (
        SELECT event_type, x, y,
               CAST(COUNT(*) OVER wp AS BIGINT) AS n,
               CAST(SUM(x) OVER wp AS BIGINT) AS sx,
               CAST(SUM(y) OVER wp AS BIGINT) AS sy,
               CAST(SUM(x * y) OVER wp AS BIGINT) AS sxy,
               CAST(SUM(x * x) OVER wp AS BIGINT) AS sxx
        FROM anchored
        WINDOW wp AS (PARTITION BY event_type ORDER BY x
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    forecast AS (
        SELECT event_type, x, y,
               CAST(round(
                   (sy * sxx - sx * sxy
                    + x * (n * sxy - sx * sy))
                   / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
                   AS forecast_cents
        FROM expanding
        WHERE n >= 5 AND n * sxx - sx * sx > 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_forecasts,
           ROUND(SUM(abs(forecast_cents - y)) / CAST(COUNT(*) AS DOUBLE)
                 / 100.0, 2) AS mae_dollars
    FROM forecast
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey="X5,2.5-window",
)
def q224_walk_forward_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward (leak-free) forecast evaluation of the q187 OLS
    drift model: for every day t, fit intercept+slope on days < t ONLY
    (the `1 PRECEDING` expanding frame is the no-lookahead guarantee)
    and score the prediction against the actual.  The per-row fit needs
    no loop: all five OLS sufficient statistics are expanding-window
    prefix sums of exact integers, and the forecast
    (S_y·S_xx − S_x·S_xy + x(nS_xy − S_xS_y))/(nS_xx − S_x²) is one
    division — ROUNDED TO INTEGER CENTS before the error, so the MAE
    numerator Σ|forecast − y| is an order-free integer sum and the
    reported MAE is a single division.  Shape: daily partial-agg
    shuffle, one per-type window sort shared by the row-number and all
    five prefix sums, a per-type fold — backtesting an entire model
    family in 1.5 shuffles."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))
    wo = Window.partitionBy("event_type").orderBy("day_idx")
    anchored = daily.select(
        "event_type", "y", (F.row_number().over(wo) - 1).cast("long").alias("x")
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    expanding = anchored.select(
        "event_type",
        "x",
        "y",
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
        F.sum("x").over(wp).cast("long").alias("sx"),
        F.sum("y").over(wp).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wp).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wp).cast("long").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (
        F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx")
    )
    det = n * sxx - sx * sx
    fc = F.round(
        (sy * sxx - sx * sxy + F.col("x") * (n * sxy - sx * sy))
        / det.cast("double")
    ).cast("long")
    forecast = expanding.filter((n >= 5) & (det > 0)).select(
        "event_type", "y", fc.alias("forecast_cents")
    )
    return (
        forecast.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_forecasts"),
            F.round(
                F.sum(F.abs(F.col("forecast_cents") - F.col("y")))
                / F.count(F.lit(1)).cast("double")
                / 100.0,
                2,
            ).alias("mae_dollars"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q225 — rolling Bollinger bands with integer-exact breakout flags
# ---------------------------------------------------------------------------


@query(
    "q225_bollinger_breakouts",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events
        GROUP BY event_type, day_idx
    ),
    rolling AS (
        SELECT event_type, day_idx, y,
               CAST(COUNT(*) OVER wr AS BIGINT) AS n,
               CAST(SUM(y) OVER wr AS BIGINT) AS s,
               CAST(SUM(y * y) OVER wr AS BIGINT) AS ss
        FROM daily
        WINDOW wr AS (PARTITION BY event_type ORDER BY day_idx
                      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day_idx, CAST(y AS BIGINT) AS cents,
           ROUND(s / CAST(n AS DOUBLE) / 100.0, 2) AS band_mid_dollars,
           CASE WHEN n * y - s > 0 THEN 'high' ELSE 'low' END AS side
    FROM rolling
    WHERE n >= 5
      AND (n * y - s) * (n * y - s) > 4 * (n * ss - s * s)
    ORDER BY event_type, day_idx
    """,
    survey="X5,2.5-window",
)
def q225_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakouts on a trailing window: days whose total
    leaves the ±2σ band of the PRIOR 7 days (the `1 PRECEDING` frame
    end keeps the tested day out of its own baseline).  Like q221 the
    band test clears denominators — (ny − S)² > 4(n·SS − S²) over the
    ROLLING sufficient statistics — so breakout membership is an exact
    integer decision per row; the reported band midpoint is one
    division.  The rolling frame is the only difference from the
    global-baseline detector: same three prefix-summable statistics,
    windowed to ROWS 7 PRECEDING — the pattern extends to any
    trailing-window model with polynomial sufficient statistics.
    Shape: daily grain, one per-type window, filtered projection."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))
    wr = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(-7, -1)
    )
    rolling = daily.select(
        "event_type",
        "day_idx",
        "y",
        F.count(F.lit(1)).over(wr).cast("long").alias("n"),
        F.sum("y").over(wr).cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).over(wr).cast("long").alias("ss"),
    )
    n, s, ss, y = F.col("n"), F.col("s"), F.col("ss"), F.col("y")
    dev = n * y - s
    return (
        rolling.filter((n >= 5) & (dev * dev > 4 * (n * ss - s * s)))
        .select(
            "event_type",
            "day_idx",
            y.cast("long").alias("cents"),
            F.round(s / n.cast("double") / 100.0, 2).alias("band_mid_dollars"),
            F.when(dev > 0, F.lit("high")).otherwise(F.lit("low")).alias("side"),
        )
        .orderBy("event_type", "day_idx")
    )


# ---------------------------------------------------------------------------
# q232 — weighted order statistics (weighted median / p90 by quantity)
# ---------------------------------------------------------------------------


@query(
    "q232_weighted_median",
    oracle="""
    WITH grain AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem
        GROUP BY l_returnflag, cents
    ),
    cum AS (
        SELECT l_returnflag, cents,
               SUM(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM grain
    )
    SELECT l_returnflag,
           CAST(ANY_VALUE(tw) AS BIGINT) AS total_weight,
           MIN(CASE WHEN cw * 2 >= tw THEN cents END) AS wmedian_cents,
           MIN(CASE WHEN cw * 10 >= 9 * tw THEN cents END) AS wp90_cents
    FROM cum
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    survey="2.5-agg,2.5-window",
)
def q232_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED order statistics: the quantity-weighted median and p90
    of line prices per return flag — 'the price at which half the UNITS
    (not half the line items) ship below'.  Same run-length recipe as
    q223 with the count replaced by an integer weight sum, and the same
    exactness argument: cumulative weights are exact integers, the rank
    test cw·k ≥ q·k·tw never divides, and no interpolation convention
    exists to disagree on.  Weighted quantiles are the curation
    workhorse (token-weighted doc-length cuts, size-weighted shard
    caps); this is the engine-exact form.  Shape: one (flag, value)
    partial-agg shuffle, per-flag prefix window over the value grain,
    4-row fold."""
    li = load_table(spark, sf_dir, "lineitem")
    grain = li.groupBy(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("w"))
    wo = Window.partitionBy("l_returnflag").orderBy("cents")
    wa = Window.partitionBy("l_returnflag")
    cum = grain.select(
        "l_returnflag",
        "cents",
        F.sum("w").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
        F.sum("w").over(wa).alias("tw"),
    )
    cw, tw = F.col("cw"), F.col("tw")
    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.any_value("tw").cast("long").alias("total_weight"),
            F.min(F.when(cw * 2 >= tw, F.col("cents"))).alias("wmedian_cents"),
            F.min(F.when(cw * 10 >= 9 * tw, F.col("cents"))).alias("wp90_cents"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q233 — dedup savings report (the operational readout of D1)
# ---------------------------------------------------------------------------


@query(
    "q233_dedup_savings",
    oracle="""
    WITH per_text AS (
        SELECT source, text, COUNT(*) AS copies,
               ANY_VALUE(n_chars) AS chars
        FROM documents
        GROUP BY source, text
    )
    SELECT source,
           CAST(SUM(copies) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS distinct_docs,
           CAST(SUM(copies) - COUNT(*) AS BIGINT) AS removable_docs,
           CAST(SUM((copies - 1) * chars) AS BIGINT) AS bytes_saved,
           ROUND(SUM((copies - 1) * chars)
                 / CAST(SUM(copies * chars) AS DOUBLE), 6) AS savings_ratio
    FROM per_text
    GROUP BY source
    ORDER BY source
    """,
    survey="D1,2.5-agg",
)
def q233_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capacity-planning readout of exact dedup (D1): per source,
    how many documents and bytes would within-source exact dedup
    reclaim.  Grouping by content directly (the oracle) equals grouping
    by its hash (the Spark side, which never shuffles the text — the
    sha2 projection is the q40 posture); copies−1 of each text's bytes
    are reclaimable.  All counts and byte totals are exact integers;
    the savings ratio is one division.  This is the report a 100 TB
    curation run uses to decide whether dedup pays for its shuffle."""
    d = load_table(spark, sf_dir, "documents")
    per_text = d.groupBy(
        "source", F.sha2(F.col("text"), 256).alias("h")
    ).agg(
        F.count(F.lit(1)).alias("copies"),
        F.any_value("n_chars").alias("chars"),
    )
    return (
        per_text.groupBy("source")
        .agg(
            F.sum("copies").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("distinct_docs"),
            (F.sum("copies") - F.count(F.lit(1))).cast("long").alias(
                "removable_docs"
            ),
            F.sum((F.col("copies") - 1) * F.col("chars"))
            .cast("long")
            .alias("bytes_saved"),
            F.round(
                F.sum((F.col("copies") - 1) * F.col("chars"))
                / F.sum(F.col("copies") * F.col("chars")).cast("double"),
                6,
            ).alias("savings_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q239 — CUPED variance reduction (exact sufficient statistics)
# ---------------------------------------------------------------------------


@query(
    "q239_cuped_adjustment",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS pre,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS post
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pre) AS BIGINT) AS sx,
               CAST(SUM(post) AS BIGINT) AS sy,
               CAST(SUM(pre * post) AS BIGINT) AS sxy,
               CAST(SUM(pre * pre) AS BIGINT) AS sxx
        FROM per_user
    ),
    arms AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_arm,
               CAST(SUM(post) AS BIGINT) AS sy_arm,
               CAST(SUM(pre) AS BIGINT) AS sx_arm
        FROM per_user GROUP BY arm
    )
    SELECT a.arm, a.n_arm,
           ROUND(a.sy_arm / CAST(a.n_arm AS DOUBLE) / 100.0, 4)
               AS mean_post_dollars,
           ROUND((a.sy_arm
                  - (CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                     / (g.n * g.sxx - g.sx * g.sx))
                    * (a.sx_arm - a.n_arm * (g.sx / CAST(g.n AS DOUBLE))))
                 / CAST(a.n_arm AS DOUBLE) / 100.0, 4)
               AS mean_cuped_dollars
    FROM arms a CROSS JOIN g
    ORDER BY a.arm
    """,
    survey="X5,2.5-agg",
)
def q239_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment-using-pre-experiment-data): adjust
    each arm's post-period mean by θ·(pre − μ_pre) with
    θ = cov(pre, post)/var(pre), the industry-standard variance
    reduction for A/B readouts — here over deterministic arms
    (user_id % 2, a seedless A/A split, so the adjusted means should
    nearly coincide).  Every sufficient statistic (n, Σx, Σy, Σxy, Σx²,
    and the per-arm sums) is an exact integer; θ and the adjustment are
    a handful of scalar float ops on those exact inputs, so 4dp
    rounding is engine-stable — the same discipline as the OLS drift
    model, because CUPED IS a regression adjustment.  Shape: one
    per-user shuffle, two tiny folds, a broadcast scalar join."""
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, cents).otherwise(0))
        .cast("long")
        .alias("pre"),
        F.sum(F.when(F.col("ts") >= cutoff, cents).otherwise(0))
        .cast("long")
        .alias("post"),
    ).withColumn("arm", (F.col("user_id") % 2).cast("long"))
    g = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pre").cast("long").alias("sx"),
        F.sum("post").cast("long").alias("sy"),
        F.sum(F.col("pre") * F.col("post")).cast("long").alias("sxy"),
        F.sum(F.col("pre") * F.col("pre")).cast("long").alias("sxx"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_arm"),
        F.sum("post").cast("long").alias("sy_arm"),
        F.sum("pre").cast("long").alias("sx_arm"),
    )
    theta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    mu_pre = F.col("sx") / F.col("n").cast("double")
    return (
        arms.crossJoin(F.broadcast(g))
        .select(
            "arm",
            "n_arm",
            F.round(
                F.col("sy_arm") / F.col("n_arm").cast("double") / 100.0, 4
            ).alias("mean_post_dollars"),
            F.round(
                (
                    F.col("sy_arm")
                    - theta * (F.col("sx_arm") - F.col("n_arm") * mu_pre)
                )
                / F.col("n_arm").cast("double")
                / 100.0,
                4,
            ).alias("mean_cuped_dollars"),
        )
        .orderBy("arm")
    )


# ---------------------------------------------------------------------------
# q240 — quantile treatment effect (exact per-arm order statistics)
# ---------------------------------------------------------------------------


@query(
    "q240_quantile_treatment_effect",
    oracle="""
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY user_id
    ),
    grain AS (
        SELECT arm, cents, COUNT(*) AS cnt FROM per_user GROUP BY arm, cents
    ),
    cum AS (
        SELECT arm, cents,
               SUM(cnt) OVER (PARTITION BY arm ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cc,
               SUM(cnt) OVER (PARTITION BY arm) AS n
        FROM grain
    ),
    qs AS (
        SELECT arm,
               MIN(CASE WHEN cc * 4 >= n THEN cents END) AS p25,
               MIN(CASE WHEN cc * 2 >= n THEN cents END) AS p50,
               MIN(CASE WHEN cc * 4 >= 3 * n THEN cents END) AS p75
        FROM cum GROUP BY arm
    )
    SELECT q AS quantile,
           MAX(CASE WHEN arm = 1 THEN v END)
           - MAX(CASE WHEN arm = 0 THEN v END) AS effect_cents
    FROM (
        SELECT arm, 'p25' AS q, p25 AS v FROM qs
        UNION ALL SELECT arm, 'p50', p50 FROM qs
        UNION ALL SELECT arm, 'p75', p75 FROM qs
    )
    GROUP BY q
    ORDER BY quantile
    """,
    survey="X5,2.5-agg",
)
def q240_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects: the arm-1-minus-arm-0 difference at
    p25/p50/p75 of per-user spend — what an experiment readout uses
    when the mean hides distributional shifts (heavy spenders moving
    differently from the median user).  Per-arm quantiles are EXACT
    lower order statistics from the run-length recipe, so the effect at
    each quantile is a difference of two exact integers — a fully
    deterministic distributional readout, no bootstrap, no
    interpolation.  Shape: per-user fold, per-arm value-grain prefix
    window, 3-row pivot."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    ).withColumn("arm", (F.col("user_id") % 2).cast("long"))
    grain = per_user.groupBy("arm", "cents").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wo = Window.partitionBy("arm").orderBy("cents")
    wa = Window.partitionBy("arm")
    cum = grain.select(
        "arm",
        "cents",
        F.sum("cnt").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cc"
        ),
        F.sum("cnt").over(wa).alias("n"),
    )
    cc, n = F.col("cc"), F.col("n")
    qs = cum.groupBy("arm").agg(
        F.min(F.when(cc * 4 >= n, F.col("cents"))).alias("p25"),
        F.min(F.when(cc * 2 >= n, F.col("cents"))).alias("p50"),
        F.min(F.when(cc * 4 >= 3 * n, F.col("cents"))).alias("p75"),
    )
    long = qs.select(
        "arm",
        F.expr(
            "stack(3, 'p25', p25, 'p50', p50, 'p75', p75) AS (quantile, v)"
        ),
    ).select("arm", "quantile", "v")
    return (
        long.groupBy("quantile")
        .agg(
            (
                F.max(F.when(F.col("arm") == 1, F.col("v")))
                - F.max(F.when(F.col("arm") == 0, F.col("v")))
            ).alias("effect_cents")
        )
        .orderBy("quantile")
    )


# ---------------------------------------------------------------------------
# q243 — A/B power analysis (minimum detectable effect from exact moments)
# ---------------------------------------------------------------------------


@query(
    "q243_power_analysis",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(cents * cents) AS BIGINT) AS ss
        FROM per_user
    )
    SELECT n AS n_users,
           ROUND(s / CAST(n AS DOUBLE) / 100.0, 2) AS mean_dollars,
           ROUND(CAST(2.801585 AS DOUBLE)
                 * sqrt(2.0 * (CAST(n * ss - s * s AS DOUBLE) / (n * (n - 1))))
                 / sqrt(CAST(n AS DOUBLE) / 2.0) / 100.0, 4)
               AS mde_dollars,
           ROUND(CAST(2.801585 AS DOUBLE)
                 * sqrt(2.0 * (CAST(n * ss - s * s AS DOUBLE) / (n * (n - 1))))
                 / sqrt(CAST(n AS DOUBLE) / 2.0)
                 / (s / CAST(n AS DOUBLE)), 6) AS mde_relative
    FROM m
    """,
    survey="X5,2.5-agg",
)
def q243_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sizing from the data itself: the minimum detectable
    effect of a 50/50 split at alpha=5% (two-sided) / power=80%, i.e.
    MDE = (z_{0.975}+z_{0.8})·sqrt(2s²/ (n/2)) with the sample variance
    s² from exact integer moments — the pre-registration number every
    A/B test needs BEFORE q167/q239 read anything out.  The z constants
    are 6dp literals shared by both engines (the same trick as q207's
    Benford table); every other input is an exact integer, so the few
    scalar float ops (two sqrts, divisions) are deterministic.  Shape:
    per-user fold then a 1-row reduction — the whole analysis is one
    aggregation pass."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    # single shared 6dp literal: z_{0.975}+z_{0.8}; summing two double
    # literals here vs DuckDB's exact-decimal addition could differ 1ulp
    zsum = F.lit(2.801585)
    sample_var = (n * ss - s * s).cast("double") / (n * (n - 1))
    mde_cents = zsum * F.sqrt(2.0 * sample_var) / F.sqrt(n.cast("double") / 2.0)
    return m.select(
        n.alias("n_users"),
        F.round(s / n.cast("double") / 100.0, 2).alias("mean_dollars"),
        F.round(mde_cents / 100.0, 4).alias("mde_dollars"),
        F.round(mde_cents / (s / n.cast("double")), 6).alias("mde_relative"),
    )


# ---------------------------------------------------------------------------
# q244 — Simpson's paradox check (exact-sign correlation comparison)
# ---------------------------------------------------------------------------


@query(
    "q244_simpson_check",
    oracle="""
    WITH pairs AS (
        SELECT c.c_mktsegment AS seg,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS x,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS y
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ),
    seg_stats AS (
        SELECT seg, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(x * y) AS HUGEINT) AS sxy
        FROM pairs GROUP BY seg
    ),
    pooled AS (
        SELECT CAST(SUM(n) AS HUGEINT) AS n, CAST(SUM(sx) AS HUGEINT) AS sx,
               CAST(SUM(sy) AS HUGEINT) AS sy, CAST(SUM(sxy) AS HUGEINT) AS sxy
        FROM seg_stats
    )
    SELECT s.seg,
           CAST(s.n AS BIGINT) AS n_pairs,
           CAST(sign(s.n * s.sxy - s.sx * s.sy) AS BIGINT) AS seg_corr_sign,
           CAST(sign(p.n * p.sxy - p.sx * p.sy) AS BIGINT) AS pooled_corr_sign,
           (sign(s.n * s.sxy - s.sx * s.sy)
            <> sign(p.n * p.sxy - p.sx * p.sy)) AS sign_reversed
    FROM seg_stats s CROSS JOIN pooled p
    ORDER BY s.seg
    """,
    survey="2.5-agg,X3",
)
def q244_simpson_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit: does the account-balance ↔ order-value
    association reverse sign inside any market segment relative to the
    pooled population?  Correlation SIGN equals the sign of the exact
    integer covariance numerator n·Σxy − Σx·Σy, so the reversal flag —
    the entire point of the audit — is decided in integer arithmetic
    (HUGEINT/DECIMAL(38): the cross products reach ~10³⁰ at sf1), never
    by a rounded correlation coefficient.  The aggregation-bias smoke
    test every segmented metric readout should ship with.  Shape: one
    join + segment fold, pooled stats reduced FROM the segment stats
    (no second scan), 5-row output."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    pairs = c.join(o, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    seg_stats = pairs.groupBy("seg").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
    )
    pooled = seg_stats.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxy").alias("sxy"),
    )
    s_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    p_num = F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy")
    return (
        seg_stats.crossJoin(
            F.broadcast(
                pooled.select(
                    F.col("n").alias("pn"),
                    F.col("sx").alias("psx"),
                    F.col("sy").alias("psy"),
                    F.col("sxy").alias("psxy"),
                )
            )
        )
        .select(
            "seg",
            F.col("n").cast("long").alias("n_pairs"),
            F.signum(s_num).cast("long").alias("seg_corr_sign"),
            F.signum(p_num).cast("long").alias("pooled_corr_sign"),
            (F.signum(s_num) != F.signum(p_num)).alias("sign_reversed"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q246 — distribution-free confidence interval for the median
# ---------------------------------------------------------------------------


@query(
    "q246_median_confidence_interval",
    oracle="""
    WITH grain AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
               COUNT(*) AS cnt
        FROM events GROUP BY event_type, cents
    ),
    cum AS (
        SELECT event_type, cents,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cc,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM grain
    ),
    ranks AS (
        SELECT event_type, cents, cc, n,
               CAST(floor(n / 2.0 - 0.979982 * sqrt(CAST(n AS DOUBLE)))
                    AS BIGINT) AS lo_rank,
               CAST(ceil(n / 2.0 + 1.0 + 0.979982 * sqrt(CAST(n AS DOUBLE)))
                    AS BIGINT) AS hi_rank
        FROM cum
    )
    SELECT event_type,
           CAST(ANY_VALUE(n) AS BIGINT) AS n_events,
           MIN(CASE WHEN cc * 2 >= n THEN cents END) AS median_cents,
           MIN(CASE WHEN cc >= lo_rank THEN cents END) AS ci_lo_cents,
           MIN(CASE WHEN cc >= hi_rank THEN cents END) AS ci_hi_cents
    FROM ranks
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey="2.5-agg,X6",
)
def q246_median_confidence_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median: the
    order-statistics bracket [x₍ₗ₎, x₍ᵤ₎] with
    l = ⌊n/2 − z·√n/2·…⌋ from the binomial normal approximation
    (0.979982 = z₀.₉₇₅/2 as a shared 6dp literal) — uncertainty-aware
    medians without bootstrap resampling, which a deterministic oracle
    could never reproduce.  The rank bounds are floats computed from
    exact n and a shared literal, floored/ceiled to integer ranks; the
    bracket values are then exact order statistics off the q223
    run-length table.  Same 1.5-shuffle shape as every order-statistic
    query here."""
    e = load_table(spark, sf_dir, "events")
    grain = e.groupBy(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wo = Window.partitionBy("event_type").orderBy("cents")
    wa = Window.partitionBy("event_type")
    cum = grain.select(
        "event_type",
        "cents",
        F.sum("cnt").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cc"
        ),
        F.sum("cnt").over(wa).alias("n"),
    )
    n, cc = F.col("n"), F.col("cc")
    z_half = F.lit(0.979982)
    lo_rank = F.floor(n / 2.0 - z_half * F.sqrt(n.cast("double"))).cast("long")
    hi_rank = F.ceil(n / 2.0 + 1.0 + z_half * F.sqrt(n.cast("double"))).cast(
        "long"
    )
    ranks = cum.select(
        "event_type",
        "cents",
        "cc",
        "n",
        lo_rank.alias("lo_rank"),
        hi_rank.alias("hi_rank"),
    )
    return (
        ranks.groupBy("event_type")
        .agg(
            F.any_value("n").cast("long").alias("n_events"),
            F.min(F.when(cc * 2 >= n, F.col("cents"))).alias("median_cents"),
            F.min(F.when(cc >= F.col("lo_rank"), F.col("cents"))).alias(
                "ci_lo_cents"
            ),
            F.min(F.when(cc >= F.col("hi_rank"), F.col("cents"))).alias(
                "ci_hi_cents"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q248 — Wilson score intervals for per-type daily error rates
# ---------------------------------------------------------------------------


@query(
    "q248_wilson_error_rates",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS errs
        FROM events GROUP BY day_idx
    )
    SELECT day_idx, n, errs,
           ROUND(errs / CAST(n AS DOUBLE), 6) AS rate,
           ROUND((errs + CAST(1.920829 AS DOUBLE)
                  - CAST(1.959964 AS DOUBLE)
                    * sqrt((errs * CAST(n - errs AS DOUBLE)) / n
                           + CAST(0.960207 AS DOUBLE)))
                 / (n + CAST(3.841459 AS DOUBLE)), 6) AS wilson_lo,
           ROUND((errs + CAST(1.920829 AS DOUBLE)
                  + CAST(1.959964 AS DOUBLE)
                    * sqrt((errs * CAST(n - errs AS DOUBLE)) / n
                           + CAST(0.960207 AS DOUBLE)))
                 / (n + CAST(3.841459 AS DOUBLE)), 6) AS wilson_hi
    FROM daily
    ORDER BY day_idx
    """,
    survey="X5,2.5-agg",
)
def q248_wilson_error_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily error-rate monitoring with Wilson score intervals — the
    binomial-proportion companion to q246's median brackets, and the
    interval that behaves correctly at small n and extreme rates where
    the naive ±z√(pq/n) fails.  The standard form
    (p̂ + z²/2n ± z√(p̂q̂/n + z²/4n²))/(1 + z²/n) is cleared to integer
    numerators: every z-derived constant (z, z²/2, z²/4, z²) is its OWN
    shared 6dp literal — never an arithmetic combination of another
    literal, per the q243 lesson — so both engines evaluate identical
    scalar expressions over exact counts.  Shape: one daily conditional
    count with map-side combine; 30 rows out."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errs"),
    )
    n, errs = F.col("n"), F.col("errs")
    z = F.lit(1.959964)
    z2_half = F.lit(1.920829)
    z2_quarter = F.lit(0.960207)
    z2 = F.lit(3.841459)
    root = F.sqrt((errs * (n - errs).cast("double")) / n + z2_quarter)
    return daily.select(
        "day_idx",
        "n",
        "errs",
        F.round(errs / n.cast("double"), 6).alias("rate"),
        F.round((errs + z2_half - z * root) / (n + z2), 6).alias("wilson_lo"),
        F.round((errs + z2_half + z * root) / (n + z2), 6).alias("wilson_hi"),
    ).orderBy("day_idx")


# ---------------------------------------------------------------------------
# q249 — Herfindahl concentration and effective source count
# ---------------------------------------------------------------------------


@query(
    "q249_source_concentration",
    oracle="""
    WITH counts AS (
        SELECT lang, source, COUNT(*) AS c
        FROM documents GROUP BY lang, source
    ),
    tot AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * c) AS BIGINT) AS sq
        FROM counts GROUP BY lang
    )
    SELECT lang, n AS n_docs,
           ROUND(sq / (CAST(n AS DOUBLE) * n), 6) AS hhi,
           ROUND((CAST(n AS DOUBLE) * n) / sq, 4) AS effective_sources
    FROM tot
    ORDER BY lang
    """,
    survey="X3,2.5-agg",
)
def q249_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-diversity audit: the Herfindahl index of source shares
    within each language (HHI = Σsᵢ² = Σcᵢ²/n², one division of exact
    integers) and its inverse — the EFFECTIVE number of sources, the
    single number that says 'this slice is really only ~3 sources deep'
    even when 20 are nominally present.  The Gini (q206) measures
    inequality; HHI measures concentration mass — a corpus mixer wants
    both before trusting q107's sampling weights.  All counts exact;
    two divisions of identical integers.  One (lang, source) partial-
    agg shuffle, per-lang fold."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq"),
    )
    n, sq = F.col("n"), F.col("sq")
    return tot.select(
        "lang",
        n.alias("n_docs"),
        F.round(sq / (n.cast("double") * n), 6).alias("hhi"),
        F.round((n.cast("double") * n) / sq, 4).alias("effective_sources"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# q250 — group-sequential monitoring (O'Brien-Fleming bounds by week)
# ---------------------------------------------------------------------------


@query(
    "q250_sequential_monitoring",
    oracle="""
    WITH weekly AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week_idx,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    anchored AS (
        SELECT arm, week_idx - (SELECT MIN(week_idx) FROM weekly) AS look,
               cents
        FROM weekly
    ),
    cum AS (
        SELECT look, arm,
               CAST(SUM(COUNT(*)) OVER w AS BIGINT) AS n,
               CAST(SUM(SUM(cents)) OVER w AS BIGINT) AS s,
               CAST(SUM(SUM(cents * cents)) OVER w AS BIGINT) AS ss
        FROM anchored
        GROUP BY look, arm
        WINDOW w AS (PARTITION BY arm ORDER BY look ROWS UNBOUNDED PRECEDING)
    ),
    wide AS (
        SELECT look,
               MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 0 THEN s END) AS s0,
               MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 1 THEN s END) AS s1,
               MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
        FROM cum GROUP BY look
    ),
    scored AS (
        SELECT look, n0, n1,
               (s1 / CAST(n1 AS DOUBLE) - s0 / CAST(n0 AS DOUBLE))
               / sqrt((CAST(n1 * ss1 - s1 * s1 AS DOUBLE) / (n1 * (n1 - 1)))
                      / n1
                      + (CAST(n0 * ss0 - s0 * s0 AS DOUBLE) / (n0 * (n0 - 1)))
                        / n0) AS z,
               CASE look WHEN 0 THEN CAST(4.562 AS DOUBLE)
                         WHEN 1 THEN CAST(3.226 AS DOUBLE)
                         WHEN 2 THEN CAST(2.634 AS DOUBLE)
                         WHEN 3 THEN CAST(2.281 AS DOUBLE)
                         ELSE CAST(2.040 AS DOUBLE) END AS obf_bound
        FROM wide
    )
    SELECT look, n0, n1, ROUND(z, 4) AS z, obf_bound,
           (abs(z) > obf_bound) AS crossed
    FROM scored
    ORDER BY look
    """,
    survey="X5,2.5-window",
)
def q250_sequential_monitoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential A/B monitoring: the cumulative two-sample z at
    each weekly look against O'Brien–Fleming spending bounds (3dp
    literals for 5 looks at overall α=5%) — the peeking-safe readout
    that q167's single z-test is NOT.  Cumulative (n, Σx, Σx²) per arm
    are exact integer prefix sums over the weekly grain; the z and the
    boundary compare are identical scalar float expressions on both
    engines, so the crossed flag cannot straddle them.  Shape: weekly
    per-arm partial aggregates (map-side), two tiny windows, a 5-row
    pivot — continuous monitoring priced at one aggregation pass."""
    e = load_table(spark, sf_dir, "events")
    weekly = e.select(
        (F.col("user_id") % 2).cast("long").alias("arm"),
        F.floor(F.unix_timestamp("ts") / 604800).cast("long").alias("week_idx"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    week0 = weekly.agg(F.min("week_idx").alias("w0"))
    anchored = weekly.crossJoin(F.broadcast(week0)).select(
        "arm", (F.col("week_idx") - F.col("w0")).alias("look"), "cents"
    )
    per = anchored.groupBy("look", "arm").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("cents").alias("sm"),
        F.sum(F.col("cents") * F.col("cents")).alias("sq"),
    )
    wc = Window.partitionBy("arm").orderBy("look").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per.select(
        "look",
        "arm",
        F.sum("cnt").over(wc).cast("long").alias("n"),
        F.sum("sm").over(wc).cast("long").alias("s"),
        F.sum("sq").over(wc).cast("long").alias("ss"),
    )
    wide = cum.groupBy("look").agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("arm") == 0, F.col("ss"))).alias("ss0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("arm") == 1, F.col("ss"))).alias("ss1"),
    )
    n0, s0, ss0 = F.col("n0"), F.col("s0"), F.col("ss0")
    n1, s1, ss1 = F.col("n1"), F.col("s1"), F.col("ss1")
    z = (s1 / n1.cast("double") - s0 / n0.cast("double")) / F.sqrt(
        ((n1 * ss1 - s1 * s1).cast("double") / (n1 * (n1 - 1))) / n1
        + ((n0 * ss0 - s0 * s0).cast("double") / (n0 * (n0 - 1))) / n0
    )
    bound = (
        F.when(F.col("look") == 0, F.lit(4.562))
        .when(F.col("look") == 1, F.lit(3.226))
        .when(F.col("look") == 2, F.lit(2.634))
        .when(F.col("look") == 3, F.lit(2.281))
        .otherwise(F.lit(2.040))
    )
    return (
        wide.select(
            "look",
            "n0",
            "n1",
            F.round(z, 4).alias("z"),
            bound.alias("obf_bound"),
            (F.abs(z) > bound).alias("crossed"),
        )
        .orderBy("look")
    )


# ---------------------------------------------------------------------------
# q253 — seasonally-adjusted anomalies (day-of-week baselines)
# ---------------------------------------------------------------------------


@query(
    "q253_dow_adjusted_anomalies",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               CAST(floor(epoch(ts) / 86400) % 7 AS BIGINT) AS dow,
               COUNT(*) AS y
        FROM events
        GROUP BY event_type, day_idx, dow
    ),
    base AS (
        SELECT event_type, day_idx, dow, y,
               CAST(COUNT(*) OVER wd AS BIGINT) AS n_dow,
               CAST(SUM(y) OVER wd AS BIGINT) AS s_dow
        FROM daily
        WINDOW wd AS (PARTITION BY event_type, dow)
    )
    SELECT event_type, day_idx, CAST(y AS BIGINT) AS n_events,
           ROUND(s_dow / CAST(n_dow AS DOUBLE), 2) AS dow_baseline
    FROM base
    WHERE n_dow > 1
      AND (n_dow * y - s_dow) * (n_dow * y - s_dow) * 25
          > 4 * s_dow * s_dow
    ORDER BY event_type, day_idx
    """,
    survey="X5,2.5-window",
)
def q253_dow_adjusted_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly flags: a day is anomalous only if it
    deviates more than 40% from ITS OWN day-of-week baseline — the
    adjustment that stops every Saturday from alarming against a
    weekday mean (the q221 detector's known blind spot).  The test
    |y − μ_dow|/μ_dow > 0.4 clears to the exact integer comparison
    (n·y − S)²·25 > 4·S² (0.4 = 2/5 squared cross-multiplied), so
    flag membership is ulp-proof; the baseline column is display-only.
    Epoch-day mod 7 gives the weekday without timezone/calendar
    functions, identical on both engines under pinned UTC.  Shape:
    daily grain, one (type, dow) window, filtered projection."""
    e = load_table(spark, sf_dir, "events")
    day_idx = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    daily = e.groupBy(
        "event_type",
        day_idx.alias("day_idx"),
        (day_idx % 7).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wd = Window.partitionBy("event_type", "dow")
    base = daily.select(
        "event_type",
        "day_idx",
        "y",
        F.count(F.lit(1)).over(wd).cast("long").alias("n_dow"),
        F.sum("y").over(wd).cast("long").alias("s_dow"),
    )
    n_dow, s_dow, y = F.col("n_dow"), F.col("s_dow"), F.col("y")
    dev = n_dow * y - s_dow
    return (
        base.filter((n_dow > 1) & (dev * dev * 25 > 4 * s_dow * s_dow))
        .select(
            "event_type",
            "day_idx",
            y.cast("long").alias("n_events"),
            F.round(s_dow / n_dow.cast("double"), 2).alias("dow_baseline"),
        )
        .orderBy("event_type", "day_idx")
    )


# ---------------------------------------------------------------------------
# q254 — peak concurrency (interval +1/−1 sweep)
# ---------------------------------------------------------------------------


@query(
    "q254_peak_concurrency",
    oracle="""
    WITH spans AS (
        SELECT user_id,
               epoch_us(MIN(ts)) AS start_us,
               epoch_us(MAX(ts)) + 300000000 AS end_us
        FROM events GROUP BY user_id
    ),
    points AS (
        SELECT start_us AS t, 1 AS delta FROM spans
        UNION ALL
        SELECT end_us AS t, -1 AS delta FROM spans
    ),
    swept AS (
        SELECT t,
               CAST(SUM(SUM(delta)) OVER (ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrency
        FROM points GROUP BY t
    )
    SELECT MAX(concurrency) AS peak_concurrency,
           MIN(CASE WHEN concurrency = m THEN t END) AS peak_at_us,
           CAST(COUNT(*) AS BIGINT) AS n_change_points
    FROM (SELECT *, MAX(concurrency) OVER () AS m FROM swept)
    """,
    survey="X5,2.5-window",
)
def q254_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via the classic +1/−1 boundary sweep: each
    user's presence span ([first event, last event + 5 min]) emits a
    start and an end point; grouping to distinct timestamps first and
    summing deltas (ends tie with starts at the SAME µs resolve in one
    group — the half-open convention), a running sum over time order
    gives the concurrency profile, and its max/argmax answer 'how many
    users were ever active at once, and when'.  Capacity planning as
    two integer prefix sums — no interval self-join, no densification.
    µs-exact epochs; all integers.  Shape: per-user span fold, a
    2-rows-per-user boundary table, one global time-ordered prefix sum
    over distinct change points.

    Scale shape: change points are unbounded (2 per user), so the
    running sum is the two-phase distributed prefix
    (operators/distributed_window.py), and the peak/argmax readout is a
    single struct-max aggregation (max of (concurrency, -t) pairs picks
    the highest concurrency, earliest time) — no global window at
    all."""
    from gmail_etl_spark.operators.distributed_window import attach_prefix_agg

    e = load_table(spark, sf_dir, "events")
    spans = e.groupBy("user_id").agg(
        F.unix_micros(F.min("ts")).alias("start_us"),
        (F.unix_micros(F.max("ts")) + 300000000).alias("end_us"),
    )
    points = spans.select(
        F.col("start_us").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(F.col("end_us").alias("t"), F.lit(-1).alias("delta"))
    )
    swept = attach_prefix_agg(
        points.groupBy("t").agg(F.sum("delta").alias("d")),
        ["t"],
        "d",
        "concurrency",
        op="sum",
    ).select("t", F.col("concurrency").cast("long").alias("concurrency"))
    return swept.agg(
        F.max("concurrency").alias("peak_concurrency"),
        F.max(
            F.struct(
                F.col("concurrency").alias("c"), (-F.col("t")).alias("neg_t")
            )
        ).alias("__peak"),
        F.count(F.lit(1)).cast("long").alias("n_change_points"),
    ).select(
        "peak_concurrency",
        (-F.col("__peak.neg_t")).cast("long").alias("peak_at_us"),
        "n_change_points",
    )
