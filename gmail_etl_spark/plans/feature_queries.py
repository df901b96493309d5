"""Feature-engineering and model-evaluation catalog entries: quantile
normalization, Naive Bayes likelihoods, chi-square selection, window
distribution functions, pivot/unpivot reshaping, rank-identity ROC AUC,
activity-bitmask streak algebra, the clamped-balance grouped-map kernel,
decision-stump training, deterministic LISTAGG, and blocked Levenshtein
linkage.

The model-training adjacencies of the curation pipeline: once documents
and events are deduplicated and filtered, these produce the features,
per-class statistics, and evaluation readouts a downstream trainer
consumes.  Everything follows the exact-integer discipline — counts and
contingency products stay integers (DECIMAL(38,0)/HUGEINT where
fourth-order products outgrow int64) with ONE final division mirrored
in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmail_etl_spark.plans.catalog import load_table, query

# ---------------------------------------------------------------------------
# q209 — per-group quantile normalization of a numeric feature
# ---------------------------------------------------------------------------


@query(
    "q209_quantile_normalize",
    oracle="""
    WITH ranked AS (
        SELECT event_id, event_type, user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               CAST(RANK() OVER (PARTITION BY event_type
                                 ORDER BY CAST(round(value * 100) AS BIGINT))
                    AS BIGINT) AS r,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM events
    )
    SELECT event_id, event_type, cents,
           ROUND((r - 1) / CAST(n - 1 AS DOUBLE), 6) AS quantile_rank
    FROM ranked
    WHERE user_id < 15
    ORDER BY event_id
    """,
    survey="2.5-window,X3",
)
def q209_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: replace each value by its within-group
    quantile rank (r−1)/(n−1) — the rank-based feature scaling that
    survives arbitrary monotone distortions and cross-source scale
    mismatch, standard prep for mixing heterogeneous feature sources.
    RANK (min-rank) over integer cents makes tied values land on
    identical ranks deterministically; the rank is an exact integer, so
    the one division is engine-stable at 6dp.  The user_id slice is
    applied AFTER ranking (ranks are corpus-wide, the output is a
    bounded sample of them).  Shape: one window shuffle per group key —
    at 100 TB this is the sort-based rank pattern; for skewed group
    sizes pre-aggregate to (value → count) grain and rank the run-length
    table instead."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("event_type").orderBy("cents")
    wa = Window.partitionBy("event_type")
    ranked = e.select(
        "event_id", "event_type", "user_id", cents.alias("cents")
    ).select(
        "event_id",
        "event_type",
        "user_id",
        "cents",
        F.rank().over(w).cast("long").alias("r"),
        F.count(F.lit(1)).over(wa).cast("long").alias("n"),
    )
    return (
        ranked.filter(F.col("user_id") < 15)
        .select(
            "event_id",
            "event_type",
            "cents",
            F.round((F.col("r") - 1) / (F.col("n") - 1).cast("double"), 6).alias(
                "quantile_rank"
            ),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q210 — Naive Bayes token likelihoods (add-one smoothing)
# ---------------------------------------------------------------------------


@query(
    "q210_nb_token_likelihoods",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    counts AS (
        SELECT lang, token, COUNT(*) AS c FROM tok GROUP BY lang, token
    ),
    label_tot AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM counts GROUP BY lang
    ),
    vocab AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM tok),
    ranked AS (
        SELECT c.lang, c.token, c.c, l.n_l, vocab.v,
               ROW_NUMBER() OVER (PARTITION BY c.lang
                                  ORDER BY c.c DESC, c.token) AS rnk
        FROM counts c
        JOIN label_tot l ON c.lang = l.lang
        CROSS JOIN vocab
    )
    SELECT lang, token, CAST(c AS BIGINT) AS token_count,
           ROUND((c + 1) / CAST(n_l + v AS DOUBLE), 6) AS smoothed_likelihood
    FROM ranked
    WHERE rnk <= 5
    ORDER BY lang, token_count DESC, token
    """,
    survey="X3,2.5-agg",
)
def q210_nb_token_likelihoods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Naive Bayes training as pure aggregation: per-class
    token counts plus add-one (Laplace) smoothing yield the model's
    P(token|class) table — the top-5 per class by count shown with the
    smoothed likelihood (c+1)/(N_class+V).  Counts, class totals and the
    vocabulary size are exact integers, so the likelihood is one
    division rounded 6dp on both engines; the (count DESC, token) total
    order makes the top-5 cut deterministic.  Shape: one (class, token)
    partial-agg shuffle over the exploded corpus (map-side combine does
    the heavy lifting), a broadcast class-total join, a 1-row vocabulary
    broadcast, and a per-class top-k window over class-vocabulary-sized
    input — model state never exceeds classes × vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("token"))
    counts = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    label_tot = counts.groupBy("lang").agg(F.sum("c").cast("long").alias("n_l"))
    vocab = tok.agg(F.count_distinct("token").cast("long").alias("v"))
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), "token")
    return (
        counts.join(F.broadcast(label_tot), "lang")
        .crossJoin(F.broadcast(vocab))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "lang",
            "token",
            F.col("c").cast("long").alias("token_count"),
            F.round(
                (F.col("c") + 1) / (F.col("n_l") + F.col("v")).cast("double"), 6
            ).alias("smoothed_likelihood"),
        )
        .orderBy("lang", F.col("token_count").desc(), "token")
    )


# ---------------------------------------------------------------------------
# q211 — chi-square feature selection per class
# ---------------------------------------------------------------------------


@query(
    "q211_chi2_feature_selection",
    oracle="""
    WITH pres AS (
        SELECT DISTINCT doc_id, lang,
               unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    n_docs AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM documents),
    lang_docs AS (
        SELECT lang, CAST(COUNT(DISTINCT doc_id) AS HUGEINT) AS n_lang
        FROM pres GROUP BY lang
    ),
    tok_docs AS (
        SELECT token, CAST(COUNT(DISTINCT doc_id) AS HUGEINT) AS n_tok
        FROM pres GROUP BY token
    ),
    cell AS (
        SELECT lang, token, CAST(COUNT(DISTINCT doc_id) AS HUGEINT) AS a
        FROM pres GROUP BY lang, token
    ),
    chi AS (
        SELECT c.lang, c.token, c.a,
               t.n_tok - c.a AS b,
               l.n_lang - c.a AS cc,
               n.n - t.n_tok - l.n_lang + c.a AS d,
               n.n AS n
        FROM cell c
        JOIN tok_docs t ON c.token = t.token
        JOIN lang_docs l ON c.lang = l.lang
        CROSS JOIN n_docs n
    ),
    scored AS (
        SELECT lang, token, CAST(a AS BIGINT) AS present_docs,
               ROUND(CAST(n * (a * d - b * cc) * (a * d - b * cc) AS DOUBLE)
                     / CAST((a + b) * (cc + d) * (a + cc) * (b + d)
                            AS DOUBLE), 4) AS chi2,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
                   ROUND(CAST(n * (a * d - b * cc) * (a * d - b * cc) AS DOUBLE)
                         / CAST((a + b) * (cc + d) * (a + cc) * (b + d)
                                AS DOUBLE), 4) DESC, token) AS rnk
        FROM chi
        WHERE (a + b) < n AND (a + cc) < n
    )
    SELECT lang, token, present_docs, chi2
    FROM scored
    WHERE rnk <= 5
    ORDER BY lang, chi2 DESC, token
    """,
    survey="X3,2.5-agg",
)
def q211_chi2_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square feature selection: for every (class, token) pair the
    2×2 document-presence contingency statistic
    χ² = n(ad−bc)²/((a+b)(c+d)(a+c)(b+d)), top-5 tokens per class — the
    label-association ranking used to pick classifier features or audit
    label leakage.  Unlike mutual information, χ² needs NO logarithm:
    all four cells derive from three count aggregates (pair, per-token,
    per-class) by exact integer arithmetic in DECIMAL(38,0)/HUGEINT
    (the fourth-order products outgrow int64 past ~30k documents), and
    the statistic is ONE division of two exact integers, 4dp-rounded
    inside the ranking's total order so the top-5 cut is engine-stable.
    Tokens present in every document (degenerate margin) are excluded.
    Shape: the exploded presence table aggregates three ways off one
    shuffle grain; margins broadcast back (classes and vocabulary are
    small); no all-pairs anything."""
    d = load_table(spark, sf_dir, "documents")
    pres = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).distinct()
    dec = "decimal(38,0)"
    n_docs = d.agg(F.count(F.lit(1)).cast(dec).alias("n"))
    lang_docs = pres.groupBy("lang").agg(
        F.count_distinct("doc_id").cast(dec).alias("n_lang")
    )
    tok_docs = pres.groupBy("token").agg(
        F.count_distinct("doc_id").cast(dec).alias("n_tok")
    )
    cell = pres.groupBy("lang", "token").agg(
        F.count_distinct("doc_id").cast(dec).alias("a")
    )
    chi = (
        cell.join(F.broadcast(tok_docs), "token")
        .join(F.broadcast(lang_docs), "lang")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "lang",
            "token",
            "a",
            (F.col("n_tok") - F.col("a")).alias("b"),
            (F.col("n_lang") - F.col("a")).alias("cc"),
            (F.col("n") - F.col("n_tok") - F.col("n_lang") + F.col("a")).alias("d"),
            "n",
        )
        .filter(
            ((F.col("a") + F.col("b")) < F.col("n"))
            & ((F.col("a") + F.col("cc")) < F.col("n"))
        )
    )
    num = (
        F.col("n")
        * (F.col("a") * F.col("d") - F.col("b") * F.col("cc"))
        * (F.col("a") * F.col("d") - F.col("b") * F.col("cc"))
    ).cast("double")
    den = (
        (F.col("a") + F.col("b"))
        * (F.col("cc") + F.col("d"))
        * (F.col("a") + F.col("cc"))
        * (F.col("b") + F.col("d"))
    ).cast("double")
    chi2 = F.round(num / den, 4)
    w = Window.partitionBy("lang").orderBy(chi2.desc(), "token")
    return (
        chi.withColumn("chi2", chi2)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "lang",
            "token",
            F.col("a").cast("long").alias("present_docs"),
            "chi2",
        )
        .orderBy("lang", F.col("chi2").desc(), "token")
    )


# ---------------------------------------------------------------------------
# q216 — window distribution functions (percent_rank / cume_dist / ntile)
# ---------------------------------------------------------------------------


@query(
    "q216_window_distribution_suite",
    oracle="""
    WITH cents AS (
        SELECT c_custkey, c_mktsegment,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer
    ),
    windowed AS (
        SELECT c_custkey, c_mktsegment, bal_cents,
               ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                          ORDER BY bal_cents), 6) AS pct_rank,
               ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment
                                       ORDER BY bal_cents), 6) AS cume,
               CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                                   ORDER BY bal_cents, c_custkey) AS BIGINT)
                   AS quartile
        FROM cents
    )
    SELECT c_custkey, c_mktsegment, bal_cents, pct_rank, cume, quartile
    FROM windowed
    WHERE c_custkey < 300
    ORDER BY c_custkey
    """,
    survey="2.5-window",
)
def q216_window_distribution_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard distribution window functions in one query:
    PERCENT_RANK and CUME_DIST over integer account-balance cents (both
    are ratios of exact integer ranks — (r−1)/(n−1) and peers≤/n — so
    6dp rounding is engine-stable) and NTILE(4) under a (value, key)
    TOTAL order, because ntile assigns by row position and an
    under-specified order would tie-break differently per engine.
    Ranks are computed over the full segment partitions; the custkey
    slice bounds output afterward.  One window shuffle per segment —
    the same sort serves all three functions."""
    c = load_table(spark, sf_dir, "customer")
    cents = c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    wv = Window.partitionBy("c_mktsegment").orderBy("bal_cents")
    wt = Window.partitionBy("c_mktsegment").orderBy("bal_cents", "c_custkey")
    return (
        cents.select(
            "c_custkey",
            "c_mktsegment",
            "bal_cents",
            F.round(F.percent_rank().over(wv), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(wv), 6).alias("cume"),
            F.ntile(4).over(wt).cast("long").alias("quartile"),
        )
        .filter(F.col("c_custkey") < 300)
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q217 — pivot → unpivot round trip (wide/long reshaping)
# ---------------------------------------------------------------------------


@query(
    "q217_unpivot_round_trip",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               event_type, COUNT(*) AS n
        FROM events GROUP BY day_idx, event_type
    ),
    wide AS (
        SELECT day_idx,
               COALESCE(SUM(CASE WHEN event_type = 'click' THEN n END), 0) AS click,
               COALESCE(SUM(CASE WHEN event_type = 'error' THEN n END), 0) AS error,
               COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN n END), 0) AS purchase,
               COALESCE(SUM(CASE WHEN event_type = 'signup' THEN n END), 0) AS signup,
               COALESCE(SUM(CASE WHEN event_type = 'view' THEN n END), 0) AS view
        FROM daily GROUP BY day_idx
    )
    SELECT day_idx, event_type, CAST(n AS BIGINT) AS n
    FROM (
        SELECT day_idx, 'click' AS event_type, click AS n FROM wide
        UNION ALL SELECT day_idx, 'error', error FROM wide
        UNION ALL SELECT day_idx, 'purchase', purchase FROM wide
        UNION ALL SELECT day_idx, 'signup', signup FROM wide
        UNION ALL SELECT day_idx, 'view', view FROM wide
    )
    WHERE n > 0
    ORDER BY day_idx, event_type
    """,
    survey="2.5-agg,P1",
)
def q217_unpivot_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide/long reshaping both ways: pivot the daily type counts into
    five columns, then `DataFrame.unpivot` (the SQL-standard melt,
    Spark 3.4+) back to long form — the round trip is self-certifying
    because the n > 0 filter drops exactly the zero-fill cells pivot
    fabricated, so the output must equal the original grouped counts.
    The pivot uses an EXPLICIT value list (the five types), which is the
    scale-correct form: an unlisted pivot triggers a distinct-value
    collect on the driver.  Counts are exact integers throughout.
    Shape: one (day, type) partial-agg shuffle, a day-grain pivot
    (30 rows), a width-5 unpivot — reshaping happens at aggregate
    grain, never on raw events."""
    e = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    daily = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    wide = (
        daily.groupBy("day_idx")
        .pivot("event_type", types)
        .sum("n")
        .na.fill(0, types)
    )
    return (
        wide.unpivot("day_idx", types, "event_type", "n")
        .filter(F.col("n") > 0)
        .select("day_idx", "event_type", F.col("n").cast("long").alias("n"))
        .orderBy("day_idx", "event_type")
    )


# ---------------------------------------------------------------------------
# q218 — ROC AUC from rank statistics (exact ties, no curve sweep)
# ---------------------------------------------------------------------------


@query(
    "q218_roc_auc",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
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
    ),
    grain AS (
        SELECT score_u, SUM(label) AS pos, SUM(1 - label) AS neg
        FROM scored GROUP BY score_u
    ),
    cum AS (
        SELECT score_u, pos, neg,
               CAST(COALESCE(SUM(pos + neg) OVER (ORDER BY score_u
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS c_before,
               CAST(pos + neg AS BIGINT) AS t
        FROM grain
    ),
    agg AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(neg) AS BIGINT) AS n_neg,
               CAST(SUM(pos * (2 * c_before + t + 1)) AS BIGINT) AS rpos_x2
        FROM cum
    )
    SELECT n_pos, n_neg,
           ROUND((rpos_x2 - n_pos * (n_pos + 1))
                 / (2.0 * n_pos * n_neg), 6) AS auc
    FROM agg
    """,
    survey="X3,2.5-window",
)
def q218_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the q125 quality score predicting English documents,
    WITHOUT sweeping thresholds: AUC equals the Mann–Whitney statistic
    (R⁺ − n⁺(n⁺+1)/2)/(n⁺n⁻) over score ranks, which the q213 doubled-
    tie-rank trick computes from exact integers once scores are snapped
    to a 1e-6 grid (the same 6dp resolution the score is reported at —
    ties on the grid get the exact average rank, the mid-point ROC
    convention).  The sigmoid/log floats appear only INSIDE the
    per-row score, recomputed bit-identically by both engines from the
    same literals; everything downstream is integer.  Shape: one
    (score, label) run-length shuffle, a global prefix-sum window over
    distinct scores, a 1-row fold — the standard distributed-AUC
    recipe, no per-pair comparison anywhere."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    ntd = F.size(toks).cast("double")
    stop_ratio = F.size(F.filter(toks, lambda t: (t == "a") | (t == "the"))) / ntd
    uniq_ratio = F.size(F.array_distinct(toks)) / ntd
    z = F.lit(-1.0) + 0.8 * F.log(ntd) - 2.5 * stop_ratio + 1.5 * uniq_ratio
    score_u = F.round(F.lit(1000000.0) / (1.0 + F.exp(-z))).cast("long")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
        score_u.alias("score_u"),
    )
    grain = scored.groupBy("score_u").agg(
        F.sum("label").alias("pos"), F.sum(1 - F.col("label")).alias("neg")
    )
    wv = Window.orderBy("score_u")
    cum = grain.select(
        "pos",
        F.coalesce(
            F.sum(F.col("pos") + F.col("neg")).over(
                wv.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("c_before"),
        (F.col("pos") + F.col("neg")).cast("long").alias("t"),
        "neg",
    )
    agg = cum.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(F.col("pos") * (2 * F.col("c_before") + F.col("t") + 1))
        .cast("long")
        .alias("rpos_x2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            (F.col("rpos_x2") - F.col("n_pos") * (F.col("n_pos") + 1))
            / (2.0 * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# q228 — activity bitmasks: per-user day masks, exact longest-streak algebra
# ---------------------------------------------------------------------------

#: Shared tail (runs verbatim on both engines over an `events_days`
#: relation): bit_or-packed activity masks, then the classic
#: longest-run-of-ones reduction m &= m << 1 unrolled 62 times (the
#: mask window admits day_offset 0..62, i.e. runs up to 63 days, and
#: step k can only be non-zero if a run of k+1 days exists) as a
#: chained-CTE ladder.  Each step is its own CTE level so every iterate
#: is a NAMED attribute — lateral column aliases would be inlined by
#: Spark's analyzer and the doubly-self-referencing step expression
#: would blow up exponentially (measured: analysis hangs at ~30 steps).
#: The shift clears bits >= 62 first (AND with 2^62-1): DuckDB raises
#: an overflow error on a signed left shift of a value with bit 62 set,
#: so a bare `m << 1` would ERROR for any user active on all 63 days;
#: the masked-off bits cannot contribute to `m & (m << 1)` anyway.
_Q228_SHIFT = "((m & 4611686018427387903) << 1)"
_Q228_LADDER = "\n".join(
    f"    s{k + 1} AS (SELECT user_id, active_days,"
    f" m & {_Q228_SHIFT} AS m,"
    f" streak + (CASE WHEN m & {_Q228_SHIFT} <> 0 THEN 1 ELSE 0 END)"
    f" AS streak"
    f" FROM s{k}),"
    for k in range(62)
)
_Q228_TAIL_SQL = f"""
    WITH masks AS (
        SELECT user_id,
               bit_or(CAST(1 AS BIGINT) << CAST(day_offset AS INT)) AS mask
        FROM events_days
        WHERE day_offset BETWEEN 0 AND 62
        GROUP BY user_id
    ),
    s0 AS (
        SELECT user_id, bit_count(mask) AS active_days, mask AS m,
               (CASE WHEN mask <> 0 THEN 1 ELSE 0 END) AS streak
        FROM masks
    ),
{_Q228_LADDER}
    final AS (SELECT user_id, active_days, streak FROM s62)
    SELECT CAST(streak AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(active_days) AS BIGINT) AS min_active_days,
           CAST(MAX(active_days) AS BIGINT) AS max_active_days
    FROM final
    GROUP BY streak
    ORDER BY longest_streak
"""

_Q228_ORACLE = (
    """
    WITH events_days AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT)
               - (SELECT MIN(CAST(floor(epoch(ts) / 86400) AS BIGINT))
                  FROM events) AS day_offset
        FROM events
    )"""
    + _Q228_TAIL_SQL.replace("WITH masks AS", ", masks AS", 1)
)


@query("q228_activity_bitmask_streaks", oracle=_Q228_ORACLE, survey="2.5-agg,X3")
def q228_activity_bitmask_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap analytics: each user's month of activity packed into ONE
    64-bit integer (bit_or of 1 << day_offset — the roaring-bitmap idea
    at word granularity), then the longest active streak computed by
    pure bit algebra: repeating m &= m << 1 shortens every run of ones
    by one, so the count of non-zero iterates IS the longest run.  The
    62-step unroll (one per possible extra day in the 63-day mask
    window) binds each iterate to its own CTE level (linear
    plan size; a naive inlining would be exponential), and the SAME
    generated SQL tail runs verbatim on both engines — only the
    day_offset prologue is engine-specific.  Bitmasks turn per-user
    presence questions (streaks, active-day counts, churn gaps) into
    integer ops on ONE ROW PER USER: at 100 TB the corpus reduces to a
    user-grain bitmask table in one shuffle, and every downstream
    readout is shuffle-free.  One word covers 63 days; longer horizons
    shard the mask into an array of words per quarter.  All integers,
    no float surface."""
    e = load_table(spark, sf_dir, "events")
    day_idx = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    day0 = e.agg(F.min(day_idx).alias("day0"))
    e.select(
        "user_id", day_idx.alias("day_idx")
    ).crossJoin(F.broadcast(day0)).select(
        "user_id", (F.col("day_idx") - F.col("day0")).alias("day_offset")
    ).createOrReplaceTempView("events_days")
    return spark.sql(_Q228_TAIL_SQL)


# ---------------------------------------------------------------------------
# q229 — capped running balance: the legitimate grouped-map Python case
# ---------------------------------------------------------------------------


@query(
    "q229_capped_running_balance",
    oracle="""
    WITH RECURSIVE deltas AS (
        SELECT user_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS BIGINT) AS rn,
               CASE WHEN event_type IN ('purchase', 'signup')
                    THEN CAST(round(value * 100) AS BIGINT)
                    ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
        FROM events
    ),
    walk(user_id, rn, bal, clamps) AS (
        SELECT user_id, rn,
               GREATEST(CAST(0 AS BIGINT),
                        LEAST(CAST(100000 AS BIGINT), delta)) AS bal,
               CASE WHEN delta < 0 OR delta > 100000 THEN 1 ELSE 0 END AS clamps
        FROM deltas WHERE rn = 1
        UNION ALL
        SELECT d.user_id, d.rn,
               GREATEST(CAST(0 AS BIGINT),
                        LEAST(CAST(100000 AS BIGINT), w.bal + d.delta)),
               w.clamps + CASE WHEN w.bal + d.delta < 0
                               OR w.bal + d.delta > 100000
                               THEN 1 ELSE 0 END
        FROM walk w JOIN deltas d
          ON d.user_id = w.user_id AND d.rn = w.rn + 1
    ),
    last AS (
        SELECT user_id, bal, clamps,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) AS r
        FROM walk
    )
    SELECT user_id, CAST(bal AS BIGINT) AS final_balance_cents,
           CAST(clamps AS BIGINT) AS n_clamped
    FROM last WHERE r = 1
    ORDER BY user_id
    """,
    survey="U1,2.5-window",
)
def q229_capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A clamped running balance (credits for purchase/signup, debits
    otherwise, held in [0, 1000.00]) — deliberately chosen because the
    clamp makes the recurrence NON-LINEAR: unlike the EWMA (q208) or
    the expanding OLS (q224), no weighted-prefix-sum rewrite exists, so
    this is the case where dropping to an Arrow-batched grouped-map
    kernel (`applyInPandas`) is the CORRECT engineering call, not a
    shortcut.  The kernel is a per-user sequential integer fold over
    (ts, event_id) order — state is one user's events, horizontally
    partitioned by the groupBy, never the corpus.  The oracle walks the
    same recurrence as a DuckDB recursive CTE, so the hash match proves
    the Python kernel's semantics step-for-step.  Everything stays
    integer cents; output is one row per user."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    deltas = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type").isin("purchase", "signup"),
            F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(-F.round(F.col("value") * 100).cast("long"))
        .alias("delta"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        bal, clamps = 0, 0
        for d in pdf["delta"].astype("int64"):
            raw = bal + int(d)
            if raw < 0 or raw > 100_000:
                clamps += 1
            bal = max(0, min(100_000, raw))
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "final_balance_cents": [bal],
                "n_clamped": [clamps],
            }
        )

    return (
        deltas.groupBy("user_id")
        .applyInPandas(
            fold,
            "user_id bigint, final_balance_cents bigint, n_clamped bigint",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q230 — decision-stump training with exact integer misclassification
# ---------------------------------------------------------------------------


@query(
    "q230_best_stump_threshold",
    oracle="""
    WITH labeled AS (
        SELECT n_chars,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents
    ),
    grain AS (
        SELECT n_chars, SUM(pos) AS p, SUM(1 - pos) AS q
        FROM labeled GROUP BY n_chars
    ),
    cum AS (
        SELECT n_chars,
               SUM(p) OVER w AS cp, SUM(q) OVER w AS cq,
               SUM(p) OVER () AS tp, SUM(q) OVER () AS tq
        FROM grain
        WINDOW w AS (ORDER BY n_chars ROWS UNBOUNDED PRECEDING)
    ),
    scored AS (
        SELECT n_chars AS threshold,
               CAST(LEAST(cp + (tq - cq), cq + (tp - cp)) AS BIGINT) AS errors,
               CAST(tp + tq AS BIGINT) AS n
        FROM cum
    ),
    best AS (
        SELECT threshold, errors, n,
               ROW_NUMBER() OVER (ORDER BY errors, threshold) AS r
        FROM scored
    )
    SELECT threshold, errors, n,
           ROUND(errors / CAST(n AS DOUBLE), 6) AS error_rate
    FROM best WHERE r = 1
    """,
    survey="X3,2.5-window",
)
def q230_best_stump_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training as a window query: the split
    `n_chars <= t` minimizing misclassification for predicting English
    documents, over EVERY candidate threshold at once.  Run-length
    prefix sums give each threshold's left/right class counts, and the
    stump may orient either way, so its error is
    min(cp + (tq − cq), cq + (tp − cp)) — all exact integers, argmin
    under an (errors, threshold) total order, no impurity ratio to go
    non-deterministic on.  Misclassification (not Gini) is chosen
    precisely because it keeps model SELECTION inside integer
    arithmetic; the error rate is display-only.  Shape: one value-grain
    shuffle, one prefix window over distinct n_chars (domain-bounded),
    a 1-row argmin — the 'train a model per feature per split' pattern
    that scales to wide feature matrices by adding a feature key to the
    partitioning."""
    d = load_table(spark, sf_dir, "documents")
    labeled = d.select(
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    grain = labeled.groupBy("n_chars").agg(
        F.sum("pos").alias("p"), F.sum(1 - F.col("pos")).alias("q")
    )
    wo = Window.orderBy("n_chars")
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = grain.select(
        "n_chars",
        F.sum("p").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cp"),
        F.sum("q").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cq"),
        F.sum("p").over(wall).alias("tp"),
        F.sum("q").over(wall).alias("tq"),
    )
    scored = cum.select(
        F.col("n_chars").alias("threshold"),
        F.least(
            F.col("cp") + (F.col("tq") - F.col("cq")),
            F.col("cq") + (F.col("tp") - F.col("cp")),
        )
        .cast("long")
        .alias("errors"),
        (F.col("tp") + F.col("tq")).cast("long").alias("n"),
    )
    wr = Window.orderBy("errors", "threshold")
    return (
        scored.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == 1)
        .select(
            "threshold",
            "errors",
            "n",
            F.round(F.col("errors") / F.col("n").cast("double"), 6).alias(
                "error_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q231 — deterministic LISTAGG (sorted group concatenation)
# ---------------------------------------------------------------------------


@query(
    "q231_sorted_group_concat",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS token
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           string_agg(token, ',' ORDER BY token) AS token_csv
    FROM tok
    GROUP BY lang
    ORDER BY lang
    """,
    survey="2.5-agg,F4",
)
def q231_sorted_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG with a DETERMINISTIC order: the per-language distinct
    token vocabulary concatenated in sorted order.  Spark's
    collect_list is partition-order-dependent, so the stable form is
    array_sort BEFORE array_join — mirroring SQL's
    `string_agg(... ORDER BY ...)`; without the sort this query would
    be flaky on any multi-partition run, which is exactly why the
    catalog pins the sorted idiom.  The aggregate state is the distinct
    per-group vocabulary (bounded by the token domain, not the corpus).
    One distinct shuffle + one group fold."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).distinct()
    return (
        tok.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.array_join(F.array_sort(F.collect_list("token")), ",").alias(
                "token_csv"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q245 — Levenshtein linkage (native edit distance, blocked)
# ---------------------------------------------------------------------------


@query(
    "q245_levenshtein_linkage",
    oracle="""
    WITH names AS (
        SELECT DISTINCT p_name FROM part
    ),
    blocked AS (
        SELECT n1.p_name AS a, n2.p_name AS b
        FROM names n1 JOIN names n2
          ON string_split(n1.p_name, ' ')[-1] = string_split(n2.p_name, ' ')[-1]
         AND n1.p_name < n2.p_name
    )
    SELECT a, b, CAST(levenshtein(a, b) AS BIGINT) AS edit_distance
    FROM blocked
    WHERE levenshtein(a, b) <= 3
    ORDER BY a, b
    """,
    survey="F1-F5,D2",
)
def q245_levenshtein_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance record linkage on the part vocabulary: distinct
    names blocked by their final token (the noun), then native
    Levenshtein ≤ 3 within each block — both engines ship the SAME
    dynamic-programming edit distance as a builtin, so this pins their
    agreement directly (the complement of q188, where the metric itself
    had to be implemented and proven).  Blocking is the point at scale:
    the equi-join on the blocking key turns the quadratic all-pairs
    problem into per-block cliques, exactly the LSH-bucket argument
    with a semantic key instead of a hash.  Distances are small
    integers; no float surface."""
    p = load_table(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    noun = F.element_at(F.split("p_name", " "), -1)
    n1 = names.select(F.col("p_name").alias("a"), noun.alias("k"))
    n2 = names.select(
        F.col("p_name").alias("b"),
        F.element_at(F.split("p_name", " "), -1).alias("k"),
    )
    return (
        n1.join(n2, "k")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.levenshtein("a", "b").cast("long").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 3)
        .orderBy("a", "b")
    )
