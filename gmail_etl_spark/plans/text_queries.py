"""Text-analysis catalog (SURVEY §2.8 row X3): tokenization, token
stats, quality scoring, language features, fingerprinting — the
training-data-pipeline text operators, all JVM-side array/string
expressions (no Python in the hot path) with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmail_etl_spark.operators.text import with_winnow_fps
from gmail_etl_spark.plans.catalog import load_table, query

STOPWORDS = ("the", "a")


# ---------------------------------------------------------------------------
# q30 — corpus language distribution
# ---------------------------------------------------------------------------


@query(
    "q30_lang_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    survey="X3",
)
def q30_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q31 — per-document token statistics (headline text op)
# ---------------------------------------------------------------------------


@query(
    "q31_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           length(replace(text, ' ', '')) AS content_chars,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
    FROM documents
    ORDER BY doc_id
    """,
    survey="X3",
    headline=True,
)
def q31_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    content_chars = F.length(F.regexp_replace("text", " ", ""))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        content_chars.alias("content_chars"),
        (content_chars.cast("double") / F.size(toks).cast("double")).alias("avg_token_len"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q32 — global token frequency (explode → count → top-k)
# ---------------------------------------------------------------------------


@query(
    "q32_token_freq",
    oracle="""
    SELECT token, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 25
    """,
    survey="X3",
)
def q32_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q33 — quality scoring (stopword ratio bands)
# ---------------------------------------------------------------------------


@query(
    "q33_quality_score",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_filter(string_split(text, ' '),
                               t -> t IN ('{STOPWORDS[0]}', '{STOPWORDS[1]}'))) AS n_stopwords
        FROM documents
    )
    SELECT doc_id, n_tokens, n_stopwords,
           CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
           CASE WHEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) < 0.05 THEN 'low'
                WHEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) < 0.15 THEN 'mid'
                ELSE 'high' END AS stopword_band
    FROM scored
    ORDER BY doc_id
    """,
    survey="X3",
)
def q33_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    ratio = n_stop.cast("double") / n_tokens.cast("double")
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        ratio.alias("stopword_ratio"),
        F.when(ratio < 0.05, "low").when(ratio < 0.15, "mid").otherwise("high").alias(
            "stopword_band"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q34 — document fingerprint (normalized content hash)
# ---------------------------------------------------------------------------


@query(
    "q34_fingerprint",
    oracle="""
    SELECT doc_id,
           sha256(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
    survey="X3,D1",
)
def q34_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint: sorted distinct token set
    hashed — the canonical-form trick that catches shuffled duplicates
    exact hashing misses."""
    d = load_table(spark, sf_dir, "documents")
    canon = F.concat_ws(" ", F.sort_array(F.array_distinct(F.split("text", " "))))
    return d.select("doc_id", F.sha2(canon, 256).alias("fingerprint")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q35 — language-feature table (lang-ID heuristic features)
# ---------------------------------------------------------------------------


@query(
    "q35_langid_features",
    oracle="""
    SELECT lang,
           CAST(SUM(length(regexp_replace(text, '[^aeiou]', '', 'g'))) AS DOUBLE)
               / CAST(SUM(length(replace(text, ' ', ''))) AS DOUBLE) AS vowel_ratio,
           CAST(SUM(length(replace(text, ' ', ''))) AS DOUBLE)
               / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS mean_word_len,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    survey="X3",
)
def q35_langid_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language n-gram-style feature aggregates — the profile table a
    nearest-profile language-ID classifier scores against."""
    d = load_table(spark, sf_dir, "documents")
    vowels = F.length(F.regexp_replace("text", "[^aeiou]", ""))
    content = F.length(F.regexp_replace("text", " ", ""))
    n_toks = F.size(F.split("text", " "))
    return (
        d.select("lang", vowels.alias("v"), content.alias("c"), n_toks.alias("t"))
        .groupBy("lang")
        .agg(
            (F.sum("v").cast("double") / F.sum("c").cast("double")).alias("vowel_ratio"),
            (F.sum("c").cast("double") / F.sum("t").cast("double")).alias("mean_word_len"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q36 — BPE-ish regex token counting
# ---------------------------------------------------------------------------

#: word / number / single non-space symbol — the classic pre-tokenizer
#: shape used before BPE merges.
_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@query(
    "q36_token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
           len(string_split(text, ' ')) AS n_ws_tokens
    FROM documents
    ORDER BY doc_id
    """,
    survey="X3",
)
def q36_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias("n_bpe_tokens"),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q37 — rolling-hash fingerprint (polynomial over token stream)
# ---------------------------------------------------------------------------


@query(
    "q37_rolling_hash",
    oracle="""
    SELECT doc_id,
           list_reduce(
               list_transform(string_split(text, ' '), t -> length(t) + 1),
               (acc, x) -> (acc * 31 + x) % 1000000007
           ) AS rolling_fp
    FROM documents
    ORDER BY doc_id
    """,
    survey="X3,D1",
)
def q37_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash over the token-length stream — order
    sensitive (unlike q34's set fingerprint), so shuffled token order
    changes the fingerprint.  Pure JVM fold, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    fp = F.aggregate(
        F.transform(toks, lambda t: (F.length(t) + F.lit(1)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % 1000000007,
    )
    return d.select("doc_id", fp.alias("rolling_fp")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q38 — edit distance (fuzzy matching kernel)
# ---------------------------------------------------------------------------


@query(
    "q38_levenshtein",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS first_token,
           string_split(text, ' ')[-1] AS last_token,
           levenshtein(string_split(text, ' ')[1], string_split(text, ' ')[-1]) AS edit_dist
    FROM documents
    WHERE doc_id < 300
    ORDER BY doc_id
    """,
    survey="X3",
)
def q38_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = F.split(F.col("text"), " ")
    first, last = F.element_at(toks, 1), F.element_at(toks, -1)
    return d.select(
        "doc_id",
        first.alias("first_token"),
        last.alias("last_token"),
        F.levenshtein(first, last).alias("edit_dist"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q39 — language-ID classification (n-gram profile nearest-neighbor)
# ---------------------------------------------------------------------------


@query(
    "q39_langid_classify",
    oracle="""
    WITH train AS (SELECT * FROM documents WHERE doc_id >= 100),
    test AS (SELECT * FROM documents WHERE doc_id < 100),
    prof AS (
        SELECT lang, substr(text, i, 2) AS bigram, COUNT(*) AS prof_cnt
        FROM train, UNNEST(range(1, length(text))) AS t(i)
        GROUP BY lang, bigram
    ),
    vecs AS (
        SELECT doc_id, substr(text, i, 2) AS bigram, COUNT(*) AS doc_cnt
        FROM test, UNNEST(range(1, length(text))) AS t(i)
        GROUP BY doc_id, bigram
    ),
    scored AS (
        SELECT v.doc_id, p.lang,
               -- BIGINT: DuckDB SUM yields HUGEINT, which lands as float64
               -- in pandas and hash-mismatches Spark's int64
               CAST(SUM(v.doc_cnt * p.prof_cnt) AS BIGINT) AS score
        FROM vecs v JOIN prof p USING (bigram)
        GROUP BY v.doc_id, p.lang
    ),
    picked AS (
        SELECT doc_id, lang AS predicted_lang, score
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, lang) AS rn
            FROM scored
        )
        WHERE rn = 1
    )
    -- one row per test doc: a doc overlapping no profile keeps a null
    -- prediction (mirrors langid_classify's left join)
    SELECT t.doc_id, p.predicted_lang, p.score
    FROM (SELECT DISTINCT doc_id FROM test) t
    LEFT JOIN picked p USING (doc_id)
    ORDER BY doc_id
    """,
    survey="X3",
)
def q39_langid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-bigram profile language ID: profiles trained on doc_id>=100,
    docs under 100 classified by integer dot-product argmax — the full
    train/classify pipeline as one declarative plan
    (operators/text.py::langid_classify)."""
    from gmail_etl_spark.operators.text import langid_classify

    d = load_table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") >= 100)
    test = d.filter(F.col("doc_id") < 100)
    return langid_classify(train, test).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q93 — TF-IDF top terms per document
# ---------------------------------------------------------------------------


@query(
    "q93_tfidf_top_terms",
    oracle="""
    WITH tf AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents WHERE doc_id < 200
    ),
    tf_counts AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term
    ),
    df_counts AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ),
    n_docs AS (SELECT COUNT(*) AS n FROM documents WHERE doc_id < 200),
    scored AS (
        SELECT t.doc_id, t.term, t.tf, d.df,
               round(t.tf * ln(CAST((SELECT n FROM n_docs) AS DOUBLE) / d.df), 6)
                   AS tfidf
        FROM tf_counts t JOIN df_counts d USING (term)
    )
    SELECT doc_id, term, tf, df, tfidf
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS rn
        FROM scored
    )
    WHERE rn <= 3
    ORDER BY doc_id, tfidf DESC, term
    """,
    survey="X3",
)
def q93_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with integer tf/df and one rounded float step: the IDF log
    is the only non-integer operation, rounded in-query on both engines
    (libm ulp differences otherwise leak into the hash)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    # corpus size as a broadcast 1-row aggregate (no eager driver job)
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias(
                "tfidf"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", F.desc("tfidf"), "term")
    )


# ---------------------------------------------------------------------------
# q55 — quality-filter rule chain (Gopher/C4-style curation gates)
# ---------------------------------------------------------------------------


@query(
    "q55_quality_filter_rules",
    oracle="""
    WITH m AS (
        SELECT doc_id, lang,
               string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tokens,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
               length(text) AS n_chars_txt
        FROM documents
    ),
    r AS (
        SELECT doc_id,
               n_tokens,
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                   / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
               CAST(list_max(list_transform(list_distinct(toks),
                    t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE)
                   / CAST(n_tokens AS DOUBLE) AS top_tok_frac,
               CAST(n_digits AS DOUBLE) / CAST(n_chars_txt AS DOUBLE) AS digit_ratio,
               lang
        FROM m
    )
    SELECT doc_id, n_tokens,
           round(mean_tok_len, 6) AS mean_tok_len,
           round(top_tok_frac, 6) AS top_tok_frac,
           concat_ws(',',
               CASE WHEN n_tokens < 15 THEN 'min_tokens' END,
               CASE WHEN n_tokens > 5000 THEN 'max_tokens' END,
               CASE WHEN mean_tok_len < 2.0 OR mean_tok_len > 12.0 THEN 'mean_tok_len' END,
               CASE WHEN digit_ratio > 0.2 THEN 'digit_ratio' END,
               CASE WHEN top_tok_frac > 0.2 THEN 'top_tok_frac' END,
               CASE WHEN lang <> 'en' THEN 'lang' END) AS failed_rules,
           (n_tokens >= 15 AND n_tokens <= 5000
            AND mean_tok_len >= 2.0 AND mean_tok_len <= 12.0
            AND digit_ratio <= 0.2 AND top_tok_frac <= 0.2
            AND lang = 'en') AS keep
    FROM r
    ORDER BY doc_id
    """,
    survey="X3,P5",
)
def q55_quality_filter_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composable curation gates in the Gopher/C4 style: every rule is a
    named JVM-side predicate; the output carries the failed-rule list so
    downstream jobs can audit drop reasons.  All whole-stage-codegen
    expressions — no shuffle at all for a pure filter pass at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    mean_tok_len = (
        F.aggregate(F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, v: a + v)
        .cast("double") / n_tokens.cast("double")
    )
    top_tok_frac = (
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda t: F.size(F.filter(toks, lambda x: x == t)),
            )
        ).cast("double") / n_tokens.cast("double")
    )
    digit_ratio = (
        F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")).cast("double")
        / F.length(F.col("text")).cast("double")
    )
    rules = [
        ("min_tokens", n_tokens < 15),
        ("max_tokens", n_tokens > 5000),
        ("mean_tok_len", (mean_tok_len < 2.0) | (mean_tok_len > 12.0)),
        ("digit_ratio", digit_ratio > 0.2),
        ("top_tok_frac", top_tok_frac > 0.2),
        ("lang", F.col("lang") != "en"),
    ]
    failed = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in rules]
    )
    keep = None
    for _, cond in rules:
        keep = ~cond if keep is None else keep & ~cond
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(top_tok_frac, 6).alias("top_tok_frac"),
        failed.alias("failed_rules"),
        keep.alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q69 — sketch-based frequent items (approx_top_k)
# ---------------------------------------------------------------------------


@query(
    "q69_approx_top_tokens",
    oracle="""
    SELECT token, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 5
    """,
    survey="X3,2.5-agg",
)
def q69_approx_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent tokens via the approx_top_k sketch (mergeable partial
    sketches — one pass, no full groupBy materialization at 100 TB).
    The fixture vocabulary is far below the sketch's tracked-item budget,
    so counts are exact and the exact SQL top-k is a valid oracle (the
    k/k+1 boundary is tie-free at both gate scale factors)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .agg(F.expr("approx_top_k(token, 5)").alias("tk"))
        .select(F.inline("tk"))
        .select(F.col("item").alias("token"), F.col("count").alias("freq"))
        .orderBy(F.desc("freq"), "token")
    )


# ---------------------------------------------------------------------------
# q71 — fixed-size token chunking with overlap (LLM sequence prep)
# ---------------------------------------------------------------------------


@query(
    "q71_chunk_documents",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents WHERE doc_id < 100
    ),
    c AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, CAST(floor((n - 1) / 15) AS BIGINT))) AS chunk_id
        FROM t
    )
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(toks, chunk_id * 15 + 1, chunk_id * 15 + 20), ' ')
               AS chunk_text,
           len(list_slice(toks, chunk_id * 15 + 1, chunk_id * 15 + 20)) AS n_chunk_tokens
    FROM c
    ORDER BY doc_id, chunk_id
    """,
    survey="X3,P1",
)
def q71_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-token chunks, 5-token overlap (stride 15), final partial chunk
    kept — single map stage, no shuffle (see operators/text.py)."""
    from gmail_etl_spark.operators.text import chunk_documents

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return chunk_documents(d, chunk_tokens=20, overlap=5).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# q98 — intra-document repetition score (Gopher repetition gate)
# ---------------------------------------------------------------------------


@query(
    "q98_repetition_score",
    oracle="""
    WITH g AS (
        SELECT doc_id,
               len(string_split(text, ' ')) - 2 AS n_grams,
               len(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
               ))) AS n_distinct
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    )
    SELECT doc_id, n_grams, n_distinct,
           round(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 6) AS dup_gram_frac
    FROM g
    ORDER BY doc_id
    """,
    survey="X3",
)
def q98_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of repeated 3-grams inside each document — the Gopher
    repetition gate.  Pure array expressions; integer counts, one
    rounded division."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
    )
    return (
        d.filter(n >= 3)
        .select(
            "doc_id",
            (n - 2).alias("n_grams"),
            F.size(F.array_distinct(grams)).alias("n_distinct"),
        )
        .withColumn(
            "dup_gram_frac",
            F.round(1.0 - F.col("n_distinct").cast("double") / F.col("n_grams"), 6),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q101 — vocabulary build + token-id encoding (tokenizer training shape)
# ---------------------------------------------------------------------------


@query(
    "q101_encode_tokens",
    oracle="""
    WITH vocab AS (
        SELECT token, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) - 1 AS token_id
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY token_id
        LIMIT 32
    ),
    pos AS (
        SELECT doc_id, t.token, t.pos
        FROM documents,
             LATERAL (SELECT unnest(string_split(text, ' ')) AS token,
                             generate_subscripts(string_split(text, ' '), 1) AS pos) t
        WHERE doc_id < 50
    )
    SELECT p.doc_id,
           array_to_string(
               list(CAST(COALESCE(v.token_id, -1) AS VARCHAR) ORDER BY p.pos),
               ' ') AS ids,
           COUNT(*) AS n_tokens,
           CAST(SUM((v.token_id IS NULL)::INT) AS BIGINT) AS n_unk
    FROM pos p LEFT JOIN vocab v ON v.token = p.token
    GROUP BY p.doc_id
    ORDER BY p.doc_id
    """,
    survey="X3,2.5-agg",
)
def q101_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training shape: build a frequency-ranked vocabulary
    (top 32, deterministic tie-break), then encode each document as its
    token-id sequence with -1 for OOV.  The vocabulary is tiny →
    broadcast; encoding is posexplode + broadcast join + ordered
    re-aggregation.  At 100 TB the vocab build is one map-side-combined
    count and the encode pass never shuffles document content — only
    (doc_id, pos, id) triples.

    Scale shape: top-32 selection is ``orderBy(...).limit(32)`` —
    TakeOrderedAndProject does per-partition top-K and merges 32 rows
    on the driver — NOT a global row_number over the unbounded
    vocabulary; the id-assigning window then runs on a 32-row frame
    (bounded by the limit, whitelisted in test_scale_posture)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    top = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(32)
    )
    vocab = top.withColumn(
        "token_id",
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("token"))) - 1,
    ).select("token", "token_id")
    pos = (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
    )
    enc = pos.join(F.broadcast(vocab), "token", "left")
    return (
        enc.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "pos", F.coalesce("token_id", F.lit(-1)).alias("tid")
                            )
                        )
                    ),
                    lambda s: s["tid"].cast("string"),
                ),
                " ",
            ).alias("ids"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("token_id").isNull().cast("int")).alias("n_unk"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q102 — blocked edit-distance similarity join over the vocabulary
# ---------------------------------------------------------------------------


@query(
    "q103_winnow_fingerprint",
    oracle="""
    WITH h AS (
        SELECT doc_id, string_split(text, '') AS cs, length(text) AS n
        FROM documents
        WHERE length(text) >= 8
    ), hh AS (
        SELECT doc_id,
            list_transform(range(1, n - 5 + 2),
                i -> ((((ascii(cs[i])::BIGINT * 257 + ascii(cs[i+1])) * 257
                        + ascii(cs[i+2])) * 257
                        + ascii(cs[i+3])) * 257
                        + ascii(cs[i+4])) % 1000000007) AS hs
        FROM h
    ), w AS (
        SELECT doc_id,
            list_distinct(list_transform(range(1, len(hs) - 4 + 2),
                i -> list_min(hs[i:i+3]))) AS fps
        FROM hh
    )
    SELECT doc_id,
           len(fps) AS n_fingerprints,
           (list_sum(fps) % 1000000007)::BIGINT AS fp_checksum,
           list_min(fps) AS fp_min,
           list_max(fps) AS fp_max
    FROM w
    ORDER BY doc_id
    """,
    survey="X3,D2",
)
def q103_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    2003): a base-257 polynomial rolling hash over character 5-grams
    (mod 1e9+7, exact BIGINT arithmetic so DuckDB computes bit-identical
    values), then the minimum hash of each sliding window of 4 — the
    guarantee is every shared substring of length >= 8 yields a shared
    fingerprint, which is what plagiarism/near-dup detectors select on.
    All JVM-side higher-order functions (transform/slice/array_min): one
    narrow pass per document, no shuffle until the final sort, so at
    100 TB it scales linearly with corpus bytes."""
    d = load_table(spark, sf_dir, "documents")
    return (
        with_winnow_fps(d)
        .select(
            "doc_id",
            F.size("fps").cast("long").alias("n_fingerprints"),
            (
                F.aggregate("fps", F.lit(0).cast("long"), lambda a, x: a + x)
                % F.lit(1000000007).cast("long")
            ).alias("fp_checksum"),
            F.array_min("fps").alias("fp_min"),
            F.array_max("fps").alias("fp_max"),
        )
        .orderBy("doc_id")
    )


@query(
    "q102_token_edit_pairs",
    oracle="""
    WITH toks AS (
        SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT a.token AS a_token, b.token AS b_token,
           levenshtein(a.token, b.token) AS dist
    FROM toks a
    JOIN toks b
      ON substr(a.token, 1, 1) = substr(b.token, 1, 1)
     AND a.token < b.token
    WHERE levenshtein(a.token, b.token) <= 2
    ORDER BY a_token, b_token
    """,
    survey="X3,D2",
)
def q102_token_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-miss token pairs by edit distance with prefix blocking: the
    self-join keys on the first character (an equality key → hash join,
    never a cross join), then verifies lev ≤ 2 inside the block.  Same
    blocking in the oracle, so results are exact-identical; the blocking
    recall tradeoff is the documented scale strategy for string
    similarity joins."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token")).distinct()
    a = toks.select(F.col("token").alias("a_token"))
    b = toks.select(F.col("token").alias("b_token"))
    return (
        a.join(
            b,
            (F.substring("a_token", 1, 1) == F.substring("b_token", 1, 1))
            & (F.col("a_token") < F.col("b_token")),
        )
        .withColumn("dist", F.levenshtein("a_token", "b_token"))
        .filter(F.col("dist") <= 2)
        .orderBy("a_token", "b_token")
    )


# ---------------------------------------------------------------------------
# q105 — unigram LM negative-log-likelihood quality score (CCNet-style)
# ---------------------------------------------------------------------------


@query(
    "q105_unigram_lm_nll",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), vocab AS (
        SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
    ), total AS (
        SELECT SUM(cnt) AS tot FROM vocab
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(-ln(CAST(v.cnt AS DOUBLE)
                         / (SELECT CAST(tot AS DOUBLE) FROM total))), 6)
               AS avg_nll
    FROM toks t JOIN vocab v USING (token)
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    survey="X3",
)
def q105_unigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score (the CCNet/LLM-pipeline
    perplexity filter, with the LM trained on the corpus itself): token
    negative log-likelihood -ln(cnt/total) averaged per document.  High
    avg_nll = rare-token-heavy document (outlier/noise candidate), low =
    boilerplate-like; curation pipelines threshold both tails.

    Scale posture: the trained model is the unigram table — bounded by
    vocabulary size, not corpus size — so scoring is a broadcast join
    back onto the exploded token stream (no shuffle of the corpus side);
    both aggregations are partial (map-side combine on token, then on
    doc_id).  The corpus total is a broadcast one-row aggregate off the
    already-tiny vocab table.  The single float (ln) is rounded in-query on both
    engines after the per-doc average; tokens-per-doc is small enough
    that summation-order ulp noise sits far below the 1e-6 rounding
    grain."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    # corpus token total as a broadcast 1-row aggregate off the tiny
    # vocab table (no eager driver job)
    tot = vocab.agg(F.sum("cnt").cast("double").alias("total"))
    return (
        toks.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("cnt").cast("double") / F.col("total"))), 6
            ).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q112 — sparse TF-IDF cosine document pairs (inverted-index similarity)
# ---------------------------------------------------------------------------


@query(
    "q112_tfidf_cosine_pairs",
    oracle="""
    WITH tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents WHERE doc_id < 200)
        GROUP BY doc_id, term
    ), dfc AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), n_docs AS (
        SELECT COUNT(*) AS n FROM documents WHERE doc_id < 200
    ), w AS (
        SELECT t.doc_id, t.term,
               t.tf * ln(CAST((SELECT n FROM n_docs) AS DOUBLE) / d.df) AS w
        FROM tf t JOIN dfc d USING (term)
    ), norms AS (
        SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM w GROUP BY doc_id
    ), dot AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, SUM(a.w * b.w) AS d
        FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT a_id, b_id, ROUND(d / (na.nrm * nb.nrm), 6) AS cos_sim
    FROM dot
    JOIN norms na ON na.doc_id = a_id
    JOIN norms nb ON nb.doc_id = b_id
    WHERE ROUND(d / (na.nrm * nb.nrm), 6) >= 0.5
    ORDER BY a_id, b_id
    """,
    survey="X1,X3,D2",
)
def q112_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-vector document similarity: TF-IDF-weighted cosine over
    the token inverted index — the sparse counterpart of the dense
    embedding path (q46/q54).  Dot products accumulate only over SHARED
    terms (one postings pass, grouped per term and expanded i<j with
    the weight product attached), so cost is Σ df(term)², never n²,
    and document vectors are never materialized.

    The oracle states the dot product as a postings self-join — the
    relational definition; the Spark plan uses the one-shuffle grouped
    expansion (same results, half the postings shuffle).  Stop-list
    pruning (the df cap of q104) is the documented hot-key guard at
    100 TB; the fixture vocabulary is small enough to keep every term.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    # corpus size as a broadcast 1-row aggregate (no eager driver job)
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = (
        tf.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    dot = (
        w.groupBy("term")
        .agg(F.collect_list(F.struct("doc_id", "w")).alias("ps"))
        .filter(F.size("ps") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps) - i - 1),"
                    " y -> struct(least(x.doc_id, y.doc_id) as a_id,"
                    "             greatest(x.doc_id, y.doc_id) as b_id,"
                    "             x.w * y.w as wp))))"
                )
            ).alias("p")
        )
        .groupBy("p.a_id", "p.b_id")
        .agg(F.sum("p.wp").alias("d"))
    )
    na = norms.select(F.col("doc_id").alias("a_id"), F.col("nrm").alias("a_nrm"))
    nb = norms.select(F.col("doc_id").alias("b_id"), F.col("nrm").alias("b_nrm"))
    cos = F.round(F.col("d") / (F.col("a_nrm") * F.col("b_nrm")), 6)
    return (
        dot.join(F.broadcast(na), "a_id")
        .join(F.broadcast(nb), "b_id")
        .select("a_id", "b_id", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.5)
        .orderBy("a_id", "b_id")
    )


# ---------------------------------------------------------------------------
# q116 — PII detection / redaction (X3 extension; C4/Dolma-style scrub).
# Deterministic PII is injected per doc_id (the corpus itself is synthetic
# word soup), then detected + redacted by the dialect-neutral kernels in
# functions/pii.py; the oracle recomputes injection AND scrub verbatim.
# ---------------------------------------------------------------------------


@query(
    "q116_pii_redact",
    oracle="""
    WITH enriched AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com'
                    || CASE WHEN doc_id % 3 = 0
                            THEN ' call 415-555-'
                                 || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                            ELSE '' END
                    || CASE WHEN doc_id % 5 = 0
                            THEN ' ssn ' || CAST(doc_id % 900 + 100 AS VARCHAR)
                                 || '-' || CAST(doc_id % 90 + 10 AS VARCHAR)
                                 || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
                            ELSE '' END AS text
        FROM documents WHERE doc_id < 400
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text, '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS n_phones,
           len(regexp_extract_all(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS n_ssns,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                   '\\b\\d{3}-\\d{3}-\\d{4}\\b', '[PHONE]', 'g'),
               '\\b\\d{3}-\\d{2}-\\d{4}\\b', '[SSN]', 'g') AS clean_text
    FROM enriched
    ORDER BY doc_id
    """,
    survey="X3,F1-F5",
)
def q116_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: deterministic emails / phone numbers / SSNs are
    concatenated into each document, then counted and redacted with the
    JVM-side regexp kernels (functions/pii.py).  The oracle re-derives
    both the injection and the scrub, so a green row proves detection
    and replacement byte-for-byte.

    Scale posture: injection + 4 regex passes fuse into the scan's
    codegen stage — no shuffle before the presentation sort, no UDF."""
    from gmail_etl_spark.functions.pii import with_pii_report

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    did = F.col("doc_id")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            did.cast("string"),
            F.lit("@mail.example.com"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" call 415-555-"),
                    F.lpad((did * 7 % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" ssn "),
                    (did % 900 + 100).cast("string"),
                    F.lit("-"),
                    (did % 90 + 10).cast("string"),
                    F.lit("-"),
                    (did % 9000 + 1000).cast("string"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    return (
        with_pii_report(injected)
        .select(
            "doc_id",
            F.col("n_emails").cast("long").alias("n_emails"),
            F.col("n_phones").cast("long").alias("n_phones"),
            F.col("n_ssns").cast("long").alias("n_ssns"),
            "clean_text",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q117 — URL extraction + domain frequency (X3 extension; the provenance /
# link-graph pass every web-corpus pipeline runs).  URLs are injected
# deterministically per doc_id, extracted with one regexp_extract_all,
# and aggregated per domain.
# ---------------------------------------------------------------------------


@query(
    "q117_url_domains",
    oracle="""
    WITH enriched AS (
        SELECT doc_id,
               text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
                    || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                    || CASE WHEN doc_id % 2 = 0
                            THEN ' and http://www.host' || CAST(doc_id % 13 AS VARCHAR)
                                 || '.example.net/x'
                            ELSE '' END AS text
        FROM documents
    ),
    urls AS (
        SELECT doc_id, unnest(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
        FROM enriched
    )
    SELECT domain,
           COUNT(*) AS n_urls,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM urls
    GROUP BY domain
    ORDER BY domain
    """,
    survey="X3,2.5-agg",
)
def q117_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-domain profile: extract every URL host with one JVM-side
    ``regexp_extract_all`` over the injected corpus, explode, and count
    mentions + distinct documents per domain.

    Scale posture: extraction fuses into the scan stage; the only
    shuffle is the domain groupBy (partial aggregation map-side); the
    domain dimension is tiny so the result is never driver-bound."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://site"),
            (did % 7).cast("string"),
            F.lit(".example.org/p/"),
            did.cast("string"),
            F.when(
                did % 2 == 0,
                F.concat(
                    F.lit(" and http://www.host"),
                    (did % 13).cast("string"),
                    F.lit(".example.net/x"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    urls = injected.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("text", F.lit(r"https?://([A-Za-z0-9.-]+)"), 1)
        ).alias("domain"),
    )
    return (
        urls.groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("domain")
    )


# ---------------------------------------------------------------------------
# q118 — boilerplate line removal (X3/D1 extension; CCNet-style line-level
# dedup).  Documents get newline-separated footer lines injected per
# doc_id; any line whose text appears in >= 3 distinct documents is
# boilerplate and is stripped, preserving intra-document line order.
# ---------------------------------------------------------------------------


@query(
    "q118_boilerplate_lines",
    oracle="""
    WITH enriched AS (
        SELECT doc_id,
               text || chr(10) || 'subscribe to the source '
                    || CAST(doc_id % 4 AS VARCHAR) || ' newsletter'
                    || CASE WHEN doc_id % 2 = 0
                            THEN chr(10) || 'limited time promo offer'
                            ELSE '' END
                    || chr(10) || 'batch footer ' || CAST(doc_id % 250 AS VARCHAR)
                    AS text
        FROM documents
    ),
    lines AS (
        SELECT doc_id, i AS pos, ls[i] AS line
        FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM enriched),
             UNNEST(range(1, len(ls) + 1)) AS t(i)
    ),
    freq AS (
        SELECT line, COUNT(DISTINCT doc_id) AS nd FROM lines GROUP BY line
    )
    SELECT l.doc_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN f.nd >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           COALESCE(
               string_agg(CASE WHEN f.nd < 3 THEN l.line END, chr(10) ORDER BY l.pos),
               '') AS clean_text
    FROM lines l JOIN freq f USING (line)
    GROUP BY l.doc_id
    ORDER BY l.doc_id
    """,
    survey="X3,D1,2.5-agg",
)
def q118_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal: newline-split every document,
    count distinct documents per exact line text across the corpus, and
    strip lines appearing in >= 3 documents (injected footers), keeping
    the survivors in original order.

    Scale posture: two shuffles — the line-frequency groupBy (map-side
    partial agg; the join key is the line text, which at 100 TB should
    be a 64-bit hash of the line, kept as the raw string here so the
    oracle can join on it verbatim) and the per-doc reassembly groupBy.
    The frequency table is heavy-hitter skewed; AQE skew-join handles
    the hot boilerplate lines."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nsubscribe to the source "),
            (did % 4).cast("string"),
            F.lit(" newsletter"),
            F.when(did % 2 == 0, F.lit("\nlimited time promo offer")).otherwise(""),
            F.lit("\nbatch footer "),
            (did % 250).cast("string"),
        ).alias("text"),
    )
    lines = injected.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    )
    freq = lines.groupBy("line").agg(F.countDistinct("doc_id").alias("nd"))
    tagged = lines.join(freq, "line")
    keep_struct = F.when(F.col("nd") < 3, F.struct("pos", "line"))
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("nd") >= 3, 1).otherwise(0)).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(keep_struct)), lambda s: s["line"]
                ),
                "\n",
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q125 — model-based quality score (X3 extension; the fastText-classifier
# shape from CCNet/LLaMA data pipelines, with fixed interpretable
# weights so the score is exactly recomputable in SQL).
# ---------------------------------------------------------------------------


@query(
    "q125_quality_classifier",
    oracle="""
    WITH feats AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' ')))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS uniq_ratio,
               len(list_filter(string_split(text, ' '),
                               t -> t = 'a' OR t = 'the'))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio
        FROM documents
    )
    SELECT doc_id,
           n_tokens,
           round(1.0 / (1.0 + exp(-(-1.0 + 0.8 * ln(CAST(n_tokens AS DOUBLE))
                                    - 2.5 * stop_ratio + 1.5 * uniq_ratio))), 6)
               AS quality,
           (1.0 / (1.0 + exp(-(-1.0 + 0.8 * ln(CAST(n_tokens AS DOUBLE))
                               - 2.5 * stop_ratio + 1.5 * uniq_ratio))) >= 0.5)
               AS keep
    FROM feats
    ORDER BY doc_id
    """,
    survey="X3",
)
def q125_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over interpretable text features
    (log length, stopword ratio, type-token ratio) with fixed literal
    weights — the shape of the fastText/logistic quality filters in
    public LLM-corpus pipelines, reduced to column expressions so the
    sigmoid is bit-recomputable by the oracle.

    Scale posture: pure narrow pass fused into the scan (features,
    dot product, and sigmoid are one codegen stage; a learned model
    would broadcast its weight vector the same way)."""
    toks = F.split(F.col("text"), " ")
    nt = F.size(toks)
    ntd = nt.cast("double")
    uniq_ratio = F.size(F.array_distinct(toks)) / ntd
    stop_ratio = (
        F.size(F.filter(toks, lambda t: (t == "a") | (t == "the"))) / ntd
    )
    z = F.lit(-1.0) + 0.8 * F.log(ntd) - 2.5 * stop_ratio + 1.5 * uniq_ratio
    score = 1.0 / (1.0 + F.exp(-z))
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            nt.cast("long").alias("n_tokens"),
            F.round(score, 6).alias("quality"),
            (score >= 0.5).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q134 — BPE merge candidates: within-word adjacent symbol-pair counts
# ---------------------------------------------------------------------------


@query(
    "q134_bpe_merge_candidates",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id < 200
    ),
    pairs AS (
        SELECT substr(w || '_', i, 2) AS pair
        FROM words, UNNEST(range(1, length(w) + 1)) AS t(i)
        WHERE length(w) >= 1
    )
    SELECT pair, COUNT(*) AS cnt
    FROM pairs
    GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 25
    """,
    survey="X3",
)
def q134_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot statistic of BPE tokenizer training (Sennrich et al.
    2016): frequency of every adjacent symbol pair inside words — the
    top pair is the next merge rule.  Words carry the end-of-word
    marker '_' so final-position pairs are distinguishable, exactly as
    the original algorithm's vocabulary represents them.

    Scale posture: explode to (pair) and count — one map-side-combined
    shuffle of 2-char keys (bounded domain: |alphabet|²), so the
    reduce side is tiny no matter the corpus size; the top-25 is a
    total-ordered limit over that small aggregate.  This is the per-
    iteration inner loop a distributed BPE trainer re-runs after each
    merge."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    marked = F.concat(F.col("w"), F.lit("_"))
    pairs = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 1)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length(marked) - 1),
                    lambda i: F.substring(marked, i, F.lit(2)),
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q137 — per-domain curation rollup (canonical domain × quality signals)
# ---------------------------------------------------------------------------


@query(
    "q137_domain_quality_rollup",
    oracle="""
    WITH enriched AS (
        SELECT doc_id,
               text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
                    || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                    || CASE WHEN doc_id % 2 = 0
                            THEN ' and http://www.host' || CAST(doc_id % 13 AS VARCHAR)
                                 || '.example.net/x'
                            ELSE '' END AS text
        FROM documents
    ),
    urls AS (
        SELECT doc_id,
               unnest(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)) AS host
        FROM enriched
    ),
    canon AS (
        SELECT DISTINCT doc_id,
               lower(string_split(host, '.')[-2] || '.' ||
                     string_split(host, '.')[-1]) AS domain
        FROM urls
    ),
    quality AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               CASE WHEN len(string_split(text, ' ')) < 30 THEN 1 ELSE 0 END
                   AS short
        FROM documents
    )
    SELECT domain,
           COUNT(*) AS n_docs,
           CAST(SUM(q.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(q.short) AS BIGINT) AS n_short,
           ROUND(CAST(SUM(q.short) AS DOUBLE) / COUNT(*), 6) AS short_ratio
    FROM canon JOIN quality q USING (doc_id)
    GROUP BY domain
    ORDER BY domain
    """,
    survey="X3,2.5-agg",
)
def q137_domain_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The web-curation dashboard rollup: URL hosts canonicalized to a
    registrable-domain approximation (last two labels, lowercased),
    distinct per document, joined with per-document quality signals and
    aggregated per domain — the table a crawl-curation pass thresholds
    to drop low-quality domains wholesale (RefinedWeb/C4 style).

    Scale posture: extraction and canonicalization fuse into the scan;
    the distinct and the rollup shuffle only (doc_id, domain) pairs and
    tiny aggregates; the quality join is per-doc scalars.  Counts are
    exact integers; the one ratio divides identical integers on both
    engines and is rounded in-query."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://site"),
            (did % 7).cast("string"),
            F.lit(".example.org/p/"),
            did.cast("string"),
            F.when(
                did % 2 == 0,
                F.concat(
                    F.lit(" and http://www.host"),
                    (did % 13).cast("string"),
                    F.lit(".example.net/x"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    labels = F.split(F.col("host"), "\\.")
    canon = (
        injected.select(
            "doc_id",
            F.explode(
                F.expr(r"regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)")
            ).alias("host"),
        )
        .select(
            "doc_id",
            F.lower(
                F.concat_ws(
                    ".", F.element_at(labels, -2), F.element_at(labels, -1)
                )
            ).alias("domain"),
        )
        .distinct()
    )
    quality = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.when(F.size(F.split("text", " ")) < 30, 1).otherwise(0).alias("short"),
    )
    return (
        canon.join(quality, "doc_id")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("short").cast("long").alias("n_short"),
            F.round(
                F.sum("short").cast("double") / F.count(F.lit(1)), 6
            ).alias("short_ratio"),
        )
        .orderBy("domain")
    )


# ---------------------------------------------------------------------------
# q145 — feature hashing (the hashing-trick text vectorizer)
# ---------------------------------------------------------------------------


@query(
    "q145_feature_hashing",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 200
    ),
    h AS (
        SELECT doc_id,
               strpos('0123456789abcdef', substr(sha256(tok), 1, 1)) - 1 AS b,
               CASE WHEN (strpos('0123456789abcdef', substr(sha256(tok), 2, 1)) - 1)
                         % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM toks
    ),
    agg AS (
        SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v
        FROM h GROUP BY doc_id, b
    ),
    dense AS (
        SELECT doc_id, list(b ORDER BY b) AS bs, list(v ORDER BY b) AS vs
        FROM agg GROUP BY doc_id
    )
    SELECT doc_id,
           array_to_string(list_transform(range(0, 16), j ->
               CAST(COALESCE(vs[list_position(bs, j)], 0) AS VARCHAR)), ' ')
               AS features,
           CAST(list_sum(list_transform(vs, x -> abs(x))) AS BIGINT) AS l1_norm
    FROM dense
    ORDER BY doc_id
    """,
    survey="X3,X1",
)
def q145_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick vectorizer (Weinberger et al. 2009; the
    featurizer behind Vowpal-Wabbit-scale linear models): each token
    hashes to one of 16 buckets with a ±1 sign from a second hash bit,
    and a document's feature vector is the signed bucket count — no
    vocabulary build, no driver state, memory O(dims) regardless of
    corpus size.  Bucket and sign come from sha256 nibbles so both
    engines derive identical vectors; output is the dense vector as a
    space-joined integer string (canonicalizer-sortable) plus its L1
    norm.

    Scale posture: explode → two-level partial aggregation; nothing but
    (doc_id, bucket, count) crosses the shuffle — the classic
    featurization pass at 100 TB."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sha = F.sha2(F.col("tok"), 256)
    b = (F.instr(F.lit("0123456789abcdef"), F.substring(sha, 1, 1)) - 1).alias("b")
    s = (
        F.when(
            (F.instr(F.lit("0123456789abcdef"), F.substring(sha, 2, 1)) - 1) % 2 == 0,
            1,
        ).otherwise(-1)
    ).alias("s")
    agg = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .select("doc_id", b, s)
        .groupBy("doc_id", "b")
        .agg(F.sum("s").cast("long").alias("v"))
    )
    dense = agg.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("b", "v"))).alias("bv")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda j: F.coalesce(
            F.element_at(F.expr("map_from_arrays(bv.b, bv.v)"), j), F.lit(0)
        ),
    )
    return dense.select(
        "doc_id",
        F.array_join(
            F.transform(vec, lambda x: x.cast("string")), " "
        ).alias("features"),
        F.aggregate(
            F.col("bv"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.abs(x["v"]),
        ).alias("l1_norm"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q146 — compression-ratio quality signal (rows-only: no SQL zlib)
# ---------------------------------------------------------------------------


@query(
    "q146_compression_ratio",
    oracle=None,
    survey="X3,2.7-udf",
    rows_only_reason=(
        "zlib compressed sizes are library/level-specific and DuckDB has "
        "no compression function; gated by a discrimination property test"
    ),
)
def q146_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio (entropy proxy): the
    Gopher-style quality signal that catches templated/repetitive text
    (ratio far below prose) and binary-ish noise (ratio near 1).
    Rows-only — no SQL zlib; the discrimination property (repetitive ≪
    prose < random) is pinned in tests/test_operators.py."""
    from gmail_etl_spark.operators.text import attach_compression_ratio

    d = load_table(spark, sf_dir, "documents")
    return attach_compression_ratio(d).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q153 — per-source token entropy + KL divergence from the corpus mix
# ---------------------------------------------------------------------------


@query(
    "q153_source_token_entropy",
    oracle="""
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    per_source AS (
        SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY source, tok
    ),
    src_totals AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM per_source GROUP BY source
    ),
    corpus AS (
        SELECT tok, CAST(SUM(c) AS BIGINT) AS cc FROM per_source GROUP BY tok
    ),
    corpus_total AS (SELECT CAST(SUM(cc) AS BIGINT) AS nn FROM corpus)
    SELECT s.source,
           t.n AS n_tokens,
           COUNT(*) AS n_types,
           -- per-term round -> exact DECIMAL sum: float summation order
           -- can never differ between engines
           CAST(SUM(CAST(ROUND(
               -(CAST(s.c AS DOUBLE) / t.n)
                 * log2(CAST(s.c AS DOUBLE) / t.n), 6) AS DECIMAL(18,6)))
               AS DOUBLE) AS entropy_bits,
           CAST(SUM(CAST(ROUND(
               (CAST(s.c AS DOUBLE) / t.n)
                 * log2((CAST(s.c AS DOUBLE) / t.n)
                        / (CAST(c.cc AS DOUBLE) / (SELECT nn FROM corpus_total))),
               6) AS DECIMAL(18,6))) AS DOUBLE) AS kl_from_corpus
    FROM per_source s
    JOIN src_totals t USING (source)
    JOIN corpus c USING (tok)
    GROUP BY s.source, t.n
    ORDER BY s.source
    """,
    survey="X3,D1",
)
def q153_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health metrics per source: Shannon entropy of the token
    distribution (low = templated/repetitive source) and KL divergence
    from the whole-corpus distribution (high = domain shift — the
    quantity mixing recipes monitor when re-weighting sources).

    Engine-exactness: every p·log p term is rounded to 6 dp and summed
    as exact DECIMAL, so float accumulation ORDER — which differs
    between engines and within Spark across partitionings — cannot
    reach the result (the q73 integer-moment idea, generalized to
    irrational terms).  Scale posture: two partial-aggregating shuffles
    over (source, token) counts and a broadcast of the small corpus
    vocabulary; nothing text-sized moves."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.split("text", " ")).alias("tok"))
    per_source = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    src_totals = per_source.groupBy("source").agg(
        F.sum("c").cast("long").alias("n")
    )
    corpus = per_source.groupBy("tok").agg(F.sum("c").cast("long").alias("cc"))
    corpus_total = corpus.agg(F.sum("cc").cast("double").alias("nn"))
    p = F.col("c").cast("double") / F.col("n")
    q = F.col("cc").cast("double") / F.col("nn")
    ent_term = F.round(-p * F.log2(p), 6).cast("decimal(18,6)")
    kl_term = F.round(p * F.log2(p / q), 6).cast("decimal(18,6)")
    return (
        per_source.join(F.broadcast(src_totals), "source")
        .join(corpus, "tok")
        .crossJoin(F.broadcast(corpus_total))
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum(ent_term).cast("double").alias("entropy_bits"),
            F.sum(kl_term).cast("double").alias("kl_from_corpus"),
        )
        .select(
            "source",
            F.col("n").alias("n_tokens"),
            "n_types",
            "entropy_bits",
            "kl_from_corpus",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q160 — language-ID evaluation: confusion matrix of q39's classifier
# ---------------------------------------------------------------------------


@query(
    "q160_langid_confusion",
    oracle="""
    WITH train AS (SELECT * FROM documents WHERE doc_id >= 100),
    test AS (SELECT * FROM documents WHERE doc_id < 100),
    prof AS (
        SELECT lang, substr(text, i, 2) AS bigram, COUNT(*) AS prof_cnt
        FROM train, UNNEST(range(1, length(text))) AS t(i)
        GROUP BY lang, bigram
    ),
    vecs AS (
        SELECT doc_id, substr(text, i, 2) AS bigram, COUNT(*) AS doc_cnt
        FROM test, UNNEST(range(1, length(text))) AS t(i)
        GROUP BY doc_id, bigram
    ),
    scored AS (
        SELECT v.doc_id, p.lang,
               CAST(SUM(v.doc_cnt * p.prof_cnt) AS BIGINT) AS score
        FROM vecs v JOIN prof p USING (bigram)
        GROUP BY v.doc_id, p.lang
    ),
    pred AS (
        SELECT doc_id, lang AS predicted
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, lang) AS rn
            FROM scored
        )
        WHERE rn = 1
    )
    SELECT t.lang AS true_lang,
           p.predicted AS predicted_lang,
           COUNT(*) AS n_docs
    FROM test t JOIN pred p USING (doc_id)
    GROUP BY true_lang, predicted_lang
    ORDER BY true_lang, predicted_lang
    """,
    survey="X3,2.5-agg",
)
def q160_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model evaluation in-engine: the confusion matrix of the q39
    bigram-profile language classifier against the labeled test slice —
    the accuracy/error-mode table a curation team reviews before
    trusting an automatic language filter.  Composition: the q39
    classify plan joined back to truth labels, two tiny aggregations on
    top; everything stays in the same declarative pipeline (no model
    export/import round-trip)."""
    from gmail_etl_spark.operators.text import langid_classify

    d = load_table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") >= 100)
    test = d.filter(F.col("doc_id") < 100)
    pred = langid_classify(train, test).select("doc_id", "predicted_lang")
    return (
        test.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "predicted_lang")
    )


# ---------------------------------------------------------------------------
# q161 — normalization kernel: casefold, strip punctuation, collapse space
# ---------------------------------------------------------------------------


@query(
    "q161_normalize_text",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text,
           length(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g'))) AS norm_len,
           sha256(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g'))) AS norm_sha
    FROM documents
    WHERE doc_id < 300
    ORDER BY doc_id
    """,
    survey="X3,F1",
)
def q161_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical text-normalization kernel applied before hashing /
    dedup / shingling: casefold, replace every non-alphanumeric with a
    space, collapse runs, trim — with the normalized sha256 emitted so
    the oracle certifies the normalized BYTES, not just a length.
    Map-only regexp_replace chain in whole-stage codegen; at 100 TB
    this fuses into the ingest scan ahead of every dedup stage."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).alias("norm_len"),
        F.sha2(norm, 256).alias("norm_sha"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q164 — PMI co-occurrence mining: the strongest token associations
# ---------------------------------------------------------------------------


@query(
    "q164_token_pmi",
    oracle="""
    WITH docs AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents WHERE doc_id < 300
    ),
    n_docs AS (SELECT COUNT(*) AS n FROM docs),
    occurs AS (
        SELECT doc_id, unnest(toks) AS tok FROM docs
    ),
    tok_df AS (SELECT tok, COUNT(*) AS df FROM occurs GROUP BY tok),
    pairs AS (
        SELECT a.doc_id, a.tok AS tok_a, b.tok AS tok_b
        FROM occurs a JOIN occurs b
          ON a.doc_id = b.doc_id AND a.tok < b.tok
    ),
    pair_df AS (
        SELECT tok_a, tok_b, COUNT(*) AS co_df
        FROM pairs GROUP BY tok_a, tok_b
        HAVING COUNT(*) >= 5
    )
    SELECT tok_a, tok_b, co_df,
           ROUND(log2(
               (CAST(co_df AS DOUBLE) * (SELECT n FROM n_docs))
               / (CAST(da.df AS DOUBLE) * db.df)), 6) AS pmi
    FROM pair_df
    JOIN tok_df da ON da.tok = tok_a
    JOIN tok_df db ON db.tok = tok_b
    ORDER BY pmi DESC, tok_a, tok_b
    LIMIT 25
    """,
    survey="X3,2.5-agg",
)
def q164_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over document-level token
    co-occurrence — the classic word-association miner (collocations,
    topic seeds, leakage detection: suspiciously-glued token pairs often
    mark templated or machine-generated text).  PMI =
    log2(P(a,b) / (P(a)P(b))) at document granularity with a minimum
    co-occurrence support of 5.

    Scale posture: co-occurrence pairs explode per document (bounded by
    tokens-per-doc², the standard within-context blow-up — window the
    context, not the corpus); document frequencies broadcast back onto
    the bounded pair aggregate; the single log is rounded in-query on
    both engines and every input to it is an exact integer."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    docs = d.select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
    nd = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    occurs = docs.select("doc_id", F.explode("toks").alias("tok"))
    tok_df = occurs.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    a = occurs.select("doc_id", F.col("tok").alias("tok_a"))
    b = occurs.select("doc_id", F.col("tok").alias("tok_b"))
    pair_df = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("co_df"))
        .filter(F.col("co_df") >= 5)
    )
    da = tok_df.select(F.col("tok").alias("tok_a"), F.col("df").alias("df_a"))
    db = tok_df.select(F.col("tok").alias("tok_b"), F.col("df").alias("df_b"))
    pmi = F.round(
        F.log2(
            (F.col("co_df").cast("double") * F.col("n"))
            / (F.col("df_a").cast("double") * F.col("df_b"))
        ),
        6,
    )
    return (
        pair_df.join(F.broadcast(da), "tok_a")
        .join(F.broadcast(db), "tok_b")
        .crossJoin(F.broadcast(nd))
        .select("tok_a", "tok_b", "co_df", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "tok_a", "tok_b")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q173 — SFT sample assembly: chat-template rendering with role budgets
# ---------------------------------------------------------------------------


@query(
    "q173_chat_template_render",
    oracle="""
    WITH pairs AS (
        SELECT u.doc_id AS pair_id,
               u.text AS user_text,
               a.text AS assistant_text
        FROM documents u
        JOIN documents a ON a.doc_id = u.doc_id + 1
        WHERE u.doc_id % 2 = 0 AND u.doc_id < 400
    )
    SELECT pair_id,
           len(string_split(user_text, ' ')) AS user_tokens,
           len(string_split(assistant_text, ' ')) AS assistant_tokens,
           len(string_split(user_text, ' '))
             + len(string_split(assistant_text, ' ')) + 3 AS total_tokens,
           sha256('<|user|>' || user_text || '<|assistant|>'
                  || assistant_text || '<|end|>') AS rendered_sha
    FROM pairs
    ORDER BY pair_id
    """,
    survey="X3,2.5-agg",
)
def q173_chat_template_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SFT-data assembly step: pair documents into (user, assistant)
    turns, render them through a chat template with special tokens, and
    report per-role token budgets plus the rendered-bytes hash — what a
    fine-tuning pipeline materializes before packing (q72) and masking.
    The template's 3 special tokens count toward the sequence budget.

    A green row certifies the exact rendered BYTES (template placement
    included) via sha256, not just lengths.  Scale posture: one
    self-join on adjacent ids (at 100 TB the pairing key is a real
    conversation id and the join is bucketed); rendering is
    whole-stage-codegen string concat fused into the join output."""
    d = load_table(spark, sf_dir, "documents")
    u = d.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 400)).select(
        F.col("doc_id").alias("pair_id"), F.col("text").alias("user_text")
    )
    # explicit bound: Catalyst cannot infer the join-key range through
    # the -1 projection, and without it the assistant side scans the
    # whole table (verified via PushedFilters)
    a = d.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") < 401)).select(
        (F.col("doc_id") - 1).alias("pair_id"), F.col("text").alias("assistant_text")
    )
    pairs = u.join(a, "pair_id")
    ut = F.size(F.split("user_text", " "))
    at = F.size(F.split("assistant_text", " "))
    rendered = F.concat(
        F.lit("<|user|>"),
        F.col("user_text"),
        F.lit("<|assistant|>"),
        F.col("assistant_text"),
        F.lit("<|end|>"),
    )
    return pairs.select(
        "pair_id",
        ut.alias("user_tokens"),
        at.alias("assistant_tokens"),
        (ut + at + 3).alias("total_tokens"),
        F.sha2(rendered, 256).alias("rendered_sha"),
    ).orderBy("pair_id")


# ---------------------------------------------------------------------------
# q178 — exact heavy hitters via Misra–Gries candidates + verify pass
# ---------------------------------------------------------------------------


@query(
    "q178_heavy_hitter_shingles",
    oracle="""
    WITH tok AS (
        SELECT array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                   AS shingle
        FROM documents,
             unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS t(i)
    ),
    tot AS (SELECT COUNT(*) AS n FROM tok)
    SELECT shingle, COUNT(*) AS cnt,
           round(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot), 6) AS share
    FROM tok
    GROUP BY shingle
    HAVING COUNT(*) * 5000 >= (SELECT n FROM tot)
    ORDER BY cnt DESC, shingle
    """,
    survey="D2,X3",
)
def q178_heavy_hitter_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy-hitter shingles (share ≥ 1/5000 of all 3-shingle
    occurrences — the boilerplate/duplication signal) computed WITHOUT a
    full-universe GROUP BY: per-partition Misra–Gries summaries whose
    survivor union provably contains every global heavy hitter, then an
    exact count of only the candidates (broadcast semi-join ahead of the
    shuffle).  The oracle is the naive full GROUP BY + HAVING — a hash
    match proves the sketch's superset guarantee delivered the exact
    answer, q157's prove-the-pruning pattern applied to aggregation.
    At 100 TB the naive plan shuffles the full distinct-shingle universe
    (billions of keys); this plan shuffles ≤ capacity × partitions
    candidate rows plus one scalar total."""
    from gmail_etl_spark.operators.sketches import exact_heavy_hitters

    d = load_table(spark, sf_dir, "documents")
    # multiset shingles (occurrences, not the per-doc distinct sets the
    # MinHash operator uses): every 3-token window, docs under 3 tokens
    # contribute none — matching the oracle's generate_series bounds
    toks = F.split(F.col("text"), " ")
    occ = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    sh = d.select(F.explode(occ).alias("shingle"))
    return exact_heavy_hitters(sh, "shingle", denom=5000, k_margin=2)


# ---------------------------------------------------------------------------
# q184 — interpolated bigram LM: the next-order perplexity filter
# ---------------------------------------------------------------------------


@query(
    "q184_bigram_lm_nll",
    oracle="""
    WITH arrs AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ),
    big AS (
        SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
        FROM arrs, unnest(generate_series(1, len(a) - 1)) AS t(i)
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM big GROUP BY w1, w2),
    c1 AS (
        SELECT token, COUNT(*) AS n1
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
    ),
    tot AS (SELECT CAST(SUM(n1) AS DOUBLE) AS t FROM c1)
    SELECT b.doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(-ln(
               0.7 * (CAST(cc.n2 AS DOUBLE) / CAST(u1.n1 AS DOUBLE))
               + 0.3 * (CAST(u2.n1 AS DOUBLE) / (SELECT t FROM tot))
           )), 6) AS avg_nll
    FROM big b
    JOIN c2 cc ON cc.w1 = b.w1 AND cc.w2 = b.w2
    JOIN c1 u1 ON u1.token = b.w1
    JOIN c1 u2 ON u2.token = b.w2
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
    survey="X3",
)
def q184_bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order LM quality score: per-document average NLL under a
    Jelinek–Mercer-interpolated bigram model trained on the corpus
    itself — p(w₂|w₁) = 0.7·c(w₁w₂)/c(w₁) + 0.3·c(w₂)/T.  Interpolation
    (not backoff) keeps every observed bigram's probability a smooth
    function of two count tables, and a document's bigrams are by
    construction observed, so the score is total.  The bigram step is
    what separates fluent boilerplate (low NLL under q105's unigram
    model AND here) from bag-of-frequent-words noise (low unigram NLL,
    HIGH bigram NLL) — the standard second filter in a curation stack.

    Scale shape: model state = the two count tables; unigrams broadcast
    (vocabulary-sized), bigrams join on their natural key (at 100 TB the
    bigram table is itself big data — it shuffle-joins, map-side-combed
    on both sides, and would be count-pruned like any production LM).
    The corpus total rides the tiny unigram table as a 1-row broadcast
    (q105 pattern); ln rounds to 6dp in-query on both engines."""
    d = load_table(spark, sf_dir, "documents")
    a = F.split("text", " ")
    bigrams = F.when(
        F.size(a) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(a) - 1),
            lambda i: F.struct(
                F.element_at(a, i).alias("w1"),
                F.element_at(a, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<w1:string,w2:string>>)"))
    big = d.select("doc_id", F.explode(bigrams).alias("b")).select(
        "doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    toks = d.select(F.explode(a).alias("token"))
    c1 = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n1"))
    tot = c1.agg(F.sum("n1").cast("double").alias("t"))
    p = (
        F.lit(0.7) * (F.col("n2").cast("double") / F.col("u1_n").cast("double"))
        + F.lit(0.3) * (F.col("u2_n").cast("double") / F.col("t"))
    )
    return (
        big.join(c2, ["w1", "w2"])
        .join(
            F.broadcast(c1.select(F.col("token").alias("w1"), F.col("n1").alias("u1_n"))),
            "w1",
        )
        .join(
            F.broadcast(c1.select(F.col("token").alias("w2"), F.col("n1").alias("u2_n"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q186 — Python UDTF chunker through LATERAL (U-family API surface)
# ---------------------------------------------------------------------------


@query(
    "q186_udtf_chunk_spans",
    oracle="""
    WITH arrs AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents
        WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(i / 24 AS INT) AS chunk_id,
           CAST(i AS INT) AS start_tok,
           CAST(len(list_slice(a, i + 1, i + 32)) AS INT) AS n_tok,
           array_to_string(list_slice(a, i + 1, i + 32), ' ') AS chunk_text
    FROM arrs,
         unnest(generate_series(0, GREATEST(len(a) - 32 + 1, 1) - 1, 24)) AS t(i)
    ORDER BY doc_id, chunk_id
    """,
    survey="U1,X3",
)
def q186_udtf_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-4 Python UDTF surface under LATERAL: an Arrow-batched
    table function expands each document into overlapping 32-token
    spans (step 24) — the chunker shape whose boundary logic, in real
    pipelines, is arbitrary Python (tokenizer-aware splits) that column
    expressions can't host.  The oracle recomputes the identical span
    arithmetic in SQL, so the UDTF's row contract is hash-pinned, and
    q71 remains the pure-JVM fixed-width path for when Python isn't
    needed.  Bounded to the 200-doc audit slice: per-row Python (even
    Arrow-batched) prices every row — the UDTF is API surface, not the
    100 TB bulk path."""
    from gmail_etl_spark.operators.text import make_chunk_spans_udtf

    spark.udtf.register("chunk_spans", make_chunk_spans_udtf())
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    d.select("doc_id", "text").createOrReplaceTempView("_q186_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.start_tok, c.n_tok, c.chunk_text
        FROM _q186_docs d, LATERAL chunk_spans(d.text, 32, 24) AS c
        ORDER BY d.doc_id, c.chunk_id
        """
    )


# ---------------------------------------------------------------------------
# q188 — blocked Jaro–Winkler record linkage over part names
# ---------------------------------------------------------------------------


@query(
    "q188_jaro_winkler_linkage",
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_name,
               string_split(p_name, ' ')[-1] || '|' || p_name[1] AS blk
        FROM part WHERE p_partkey < 2000
    )
    SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
           a.p_name AS a_name, b.p_name AS b_name,
           round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
    FROM p a JOIN p b
      ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.93
    ORDER BY a_key, b_key
    """,
    survey="X3,D2",
)
def q188_jaro_winkler_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage, the blocking-plus-edit-similarity shape every
    entity-resolution pipeline runs: candidate part-name pairs blocked
    on (head noun, adjective initial) (equi-join on the block key — never a cross
    product), scored with an Arrow-batched Jaro–Winkler UDF, kept at
    ≥ 0.88.  The oracle re-scores every candidate with DuckDB's NATIVE
    jaro_winkler_similarity — a hash match is a pair-for-pair proof
    that the Python reimplementation (match window, transposition
    halving, thresholded prefix boost) is the same algorithm.  Blocks
    are value-bounded (parts per noun), so the pair expansion is
    Σ block² like every other candidate generator in the repo; at
    100 TB you'd block on (noun, first-char) the same way."""
    from gmail_etl_spark.operators.text import jaro_winkler_udf

    jw = jaro_winkler_udf()
    p = (
        load_table(spark, sf_dir, "part")
        # bounded audit slice (the q43/q139 discipline): the noun
        # vocabulary is small, so unbounded blocks grow linearly with SF
        # and the pair volume quadratically — the slice pins the
        # correctness surface at ~250k scored pairs per run
        .filter(F.col("p_partkey") < 2000)
        .select(
            "p_partkey",
            "p_name",
            F.concat(
                F.element_at(F.split("p_name", " "), -1),
                F.lit("|"),
                F.substring("p_name", 1, 1),
            ).alias("blk"),
        )
    )
    a = p.select(
        F.col("p_partkey").alias("a_key"), F.col("p_name").alias("a_name"), "blk"
    )
    b = p.select(
        F.col("p_partkey").alias("b_key"), F.col("p_name").alias("b_name"), "blk"
    )
    pairs = a.join(b, "blk").filter(F.col("a_key") < F.col("b_key"))
    scored = pairs.withColumn("jw_raw", jw(F.col("a_name"), F.col("b_name")))
    return (
        scored.filter(F.col("jw_raw") >= 0.93)
        .select(
            "a_key",
            "b_key",
            "a_name",
            "b_name",
            F.round("jw_raw", 6).alias("jw"),
        )
        .orderBy("a_key", "b_key")
    )


# ---------------------------------------------------------------------------
# q193 — rule ablation: which curation gate does the killing?
# ---------------------------------------------------------------------------

_Q193_RULES_SQL = """
        SELECT doc_id,
               n_tokens < 15 OR n_tokens > 5000 AS f_tokens,
               mean_tok_len < 2.0 OR mean_tok_len > 12.0 AS f_mean_len,
               digit_ratio > 0.2 AS f_digit,
               top_tok_frac > 0.2 AS f_top_tok,
               lang <> 'en' AS f_lang
        FROM r
"""


@query(
    "q193_rule_ablation",
    oracle="""
    WITH m AS (
        SELECT doc_id, lang,
               string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tokens,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
               length(text) AS n_chars_txt
        FROM documents
    ),
    r AS (
        SELECT doc_id,
               n_tokens,
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                   / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
               CAST(list_max(list_transform(list_distinct(toks),
                    t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE)
                   / CAST(n_tokens AS DOUBLE) AS top_tok_frac,
               CAST(n_digits AS DOUBLE) / CAST(n_chars_txt AS DOUBLE) AS digit_ratio,
               lang
        FROM m
    ),
    flags AS (
"""
    + _Q193_RULES_SQL
    + """
    ),
    unpv AS (
        SELECT doc_id, 'tokens' AS rule, f_tokens AS failed,
               (CAST(f_mean_len AS INT) + CAST(f_digit AS INT)
                + CAST(f_top_tok AS INT) + CAST(f_lang AS INT)) = 0 AS others_pass
        FROM flags
        UNION ALL
        SELECT doc_id, 'mean_len', f_mean_len,
               (CAST(f_tokens AS INT) + CAST(f_digit AS INT)
                + CAST(f_top_tok AS INT) + CAST(f_lang AS INT)) = 0
        FROM flags
        UNION ALL
        SELECT doc_id, 'digit', f_digit,
               (CAST(f_tokens AS INT) + CAST(f_mean_len AS INT)
                + CAST(f_top_tok AS INT) + CAST(f_lang AS INT)) = 0
        FROM flags
        UNION ALL
        SELECT doc_id, 'top_tok', f_top_tok,
               (CAST(f_tokens AS INT) + CAST(f_mean_len AS INT)
                + CAST(f_digit AS INT) + CAST(f_lang AS INT)) = 0
        FROM flags
        UNION ALL
        SELECT doc_id, 'lang', f_lang,
               (CAST(f_tokens AS INT) + CAST(f_mean_len AS INT)
                + CAST(f_digit AS INT) + CAST(f_top_tok AS INT)) = 0
        FROM flags
    )
    SELECT rule,
           CAST(SUM(CAST(failed AS INT)) AS BIGINT) AS n_failed,
           CAST(SUM(CAST(failed AND others_pass AS INT)) AS BIGINT) AS n_sole,
           round(CAST(SUM(CAST(failed AS INT)) AS DOUBLE)
                 / COUNT(*), 6) AS fail_rate
    FROM unpv
    GROUP BY rule
    ORDER BY rule
    """,
    survey="X3,P5",
)
def q193_rule_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-rule attribution, the ablation table every filter stack
    review starts from: per gate, how many documents fail it
    (`n_failed`), how many it ALONE kills (`n_sole` — the marginal
    impact: relaxing that rule recovers exactly those docs), and the
    corpus fail rate.  Sole-kill is where rule debates are settled —
    a rule with high n_failed but zero n_sole is redundant with the
    rest of the stack.  One narrow pass computes the five q55 flags, a
    stack() unpivot emits (doc, rule) pairs, one aggregation reduces to
    five rows.  Flag expressions mirror q55 exactly, so this table
    explains q55's keep column row-for-row."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    mean_tok_len = (
        F.aggregate(F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, v: a + v)
        .cast("double") / n_tokens.cast("double")
    )
    top_tok_frac = (
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda t: F.size(F.filter(toks, lambda x: x == t)),
            )
        ).cast("double")
        / n_tokens.cast("double")
    )
    digit_ratio = (
        F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")).cast("double")
        / F.length("text").cast("double")
    )
    flags = d.select(
        "doc_id",
        ((n_tokens < 15) | (n_tokens > 5000)).alias("f_tokens"),
        ((mean_tok_len < 2.0) | (mean_tok_len > 12.0)).alias("f_mean_len"),
        (digit_ratio > 0.2).alias("f_digit"),
        (top_tok_frac > 0.2).alias("f_top_tok"),
        (F.col("lang") != "en").alias("f_lang"),
    )
    names = ["tokens", "mean_len", "digit", "top_tok", "lang"]
    cols = ["f_tokens", "f_mean_len", "f_digit", "f_top_tok", "f_lang"]
    stack_args = []
    for name, col in zip(names, cols):
        others = [c for c in cols if c != col]
        others_pass = (
            sum(F.col(c).cast("int") for c in others) == 0
        )
        stack_args.append(
            F.struct(
                F.lit(name).alias("rule"),
                F.col(col).alias("failed"),
                others_pass.alias("others_pass"),
            )
        )
    unpv = flags.select(
        "doc_id", F.explode(F.array(*stack_args)).alias("u")
    ).select("doc_id", "u.rule", "u.failed", "u.others_pass")
    return (
        unpv.groupBy("rule")
        .agg(
            F.sum(F.col("failed").cast("int")).cast("long").alias("n_failed"),
            F.sum((F.col("failed") & F.col("others_pass")).cast("int"))
            .cast("long")
            .alias("n_sole"),
            F.round(
                F.sum(F.col("failed").cast("int")) / F.count(F.lit(1)), 6
            ).alias("fail_rate"),
        )
        .orderBy("rule")
    )


# ---------------------------------------------------------------------------
# q194 — BM25: the lexical retrieval leg, scored exactly
# ---------------------------------------------------------------------------


@query(
    "q194_bm25_scores",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY doc_id),
    stats AS (
        SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
               (SELECT AVG(CAST(dlen AS DOUBLE)) FROM dl) AS avg_len
    ),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    q AS (
        SELECT doc_id AS query_id, token AS q_token
        FROM tf WHERE doc_id < 5
    )
    SELECT q.query_id, t.doc_id AS doc_id,
           round(SUM(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (0.25 + 0.75 * dl.dlen / stats.avg_len))
           ), 6) AS bm25
    FROM q
    JOIN tf t ON t.token = q.q_token
    JOIN dl ON dl.doc_id = t.doc_id
    JOIN df ON df.token = t.token
    CROSS JOIN stats
    WHERE t.doc_id <> q.query_id
    GROUP BY q.query_id, t.doc_id
    ORDER BY query_id, t.doc_id
    """,
    survey="X3,X1",
)
def q194_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75), the standard lexical retrieval
    scorer: five query documents against the corpus via the inverted
    index — postings join on token, so cost is Σ df(t) over query
    terms, never |Q|×|D|.  idf uses the +1 form (always positive);
    tf saturation and length normalization are the textbook formula.
    The model state (df table, avg length, N) is vocabulary-sized;
    the per-(query, doc) sum is one grouped aggregation.  Scores round
    to 6dp in-query — q195 fuses these ranks with the vector leg."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs")).crossJoin(
        dl.agg(F.avg(F.col("dlen").cast("double")).alias("avg_len"))
    )
    q = tf.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), F.col("token").alias("q_token")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dlen") / F.col("avg_len"))
    )
    return (
        q.join(tf.withColumnRenamed("token", "q_token"), "q_token")
        .join(dl, "doc_id")
        .join(F.broadcast(df_t.withColumnRenamed("token", "q_token")), "q_token")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
        .orderBy("query_id", "doc_id")
    )


# ---------------------------------------------------------------------------
# q195 — hybrid retrieval: reciprocal-rank fusion of BM25 + cosine legs
# ---------------------------------------------------------------------------


@query(
    "q195_rrf_hybrid",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY doc_id),
    stats AS (
        SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
               (SELECT AVG(CAST(dlen AS DOUBLE)) FROM dl) AS avg_len
    ),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    q AS (SELECT doc_id AS query_id, token AS q_token FROM tf WHERE doc_id < 5),
    bm25 AS (
        SELECT q.query_id, t.doc_id AS doc_id,
               round(SUM(
                   ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (t.tf * 2.2)
                   / (t.tf + 1.2 * (0.25 + 0.75 * dl.dlen / stats.avg_len))
               ), 6) AS s
        FROM q
        JOIN tf t ON t.token = q.q_token
        JOIN dl ON dl.doc_id = t.doc_id
        JOIN df ON df.token = t.token
        CROSS JOIN stats
        WHERE t.doc_id <> q.query_id
        GROUP BY q.query_id, t.doc_id
    ),
    lex_rank AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, doc_id) AS r
        FROM bm25
    ),
    vec AS (
        SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 6) AS s
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < 5
    ),
    vec_rank AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, doc_id) AS r
        FROM vec
    ),
    fused AS (
        SELECT COALESCE(l.query_id, v.query_id) AS query_id,
               COALESCE(l.doc_id, v.doc_id) AS doc_id,
               round(COALESCE(1.0 / (60 + l.r), 0.0)
                     + COALESCE(1.0 / (60 + v.r), 0.0), 6) AS rrf
        FROM lex_rank l FULL OUTER JOIN vec_rank v
          ON v.query_id = l.query_id AND v.doc_id = l.doc_id
    )
    SELECT query_id, doc_id, rrf, rank FROM (
        SELECT query_id, doc_id, rrf,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rrf DESC, doc_id) AS rank
        FROM fused
    )
    WHERE rank <= 10
    ORDER BY query_id, rank
    """,
    survey="X1,X3",
)
def q195_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval the way modern RAG stacks ship it: the BM25
    lexical leg (q194) and the cosine vector leg (q50's discipline)
    each rank candidates per query, and reciprocal-rank fusion
    combines them — rrf = Σ 1/(60 + rank_leg), the parameter-free
    fusion from Cormack et al. that needs no score calibration
    between legs.  Ranks are computed over 6dp-rounded scores with id
    tie-breaks, so both engines rank identically; legs join FULL OUTER
    (a doc ranked by only one leg still scores).  Every piece is a
    bounded-query-set broadcast or a postings join; the fusion itself
    is rank arithmetic on (queries × candidates) rows."""
    from gmail_etl_spark.plans.catalog import CATALOG

    bm25 = CATALOG["q194_bm25_scores"].builder(spark, sf_dir).withColumnRenamed(
        "bm25", "s"
    )
    w_l = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("doc_id"))
    lex = bm25.select(
        "query_id", "doc_id", F.row_number().over(w_l).alias("r_lex")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
    )
    cand = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    dot = F.aggregate(
        F.zip_with("q_vec", "c_vec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    vec = (
        F.broadcast(anchors)
        .join(cand, F.col("query_id") != F.col("doc_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(dot / (nrm(F.col("q_vec")) * nrm(F.col("c_vec"))), 6).alias("s"),
        )
    )
    w_v = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("doc_id"))
    vecr = vec.select("query_id", "doc_id", F.row_number().over(w_v).alias("r_vec"))
    l, v = lex.alias("l"), vecr.alias("v")
    fused = (
        l.join(
            v,
            (F.col("l.query_id") == F.col("v.query_id"))
            & (F.col("l.doc_id") == F.col("v.doc_id")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("l.query_id"), F.col("v.query_id")).alias("query_id"),
            F.coalesce(F.col("l.doc_id"), F.col("v.doc_id")).alias("doc_id"),
            F.round(
                F.coalesce(1.0 / (60 + F.col("l.r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("v.r_vec")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= 10)
        .orderBy("query_id", "rank")
    )
