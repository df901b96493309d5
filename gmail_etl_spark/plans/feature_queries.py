"""Feature-engineering catalog entries: quantile normalization,
count-based Naive Bayes likelihoods, and chi-square feature selection.

The model-training adjacencies of the curation pipeline: once documents
and events are deduplicated and filtered, these produce the features and
per-class statistics a downstream trainer consumes.  Everything follows
the exact-integer discipline — counts and contingency products stay
integers (DECIMAL(38,0)/HUGEINT where fourth-order products outgrow
int64) with ONE final division mirrored in the oracle.
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
