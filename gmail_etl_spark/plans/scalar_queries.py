"""Scalar-kernel catalog: F1–F10 (SURVEY §2.4) and the P2 header pivot,
exercised over the driver's tables so the DuckDB oracle can hash-check
them.  The same Column builders power the Gmail pipeline
(gmail_etl_spark/functions/scalar.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmail_etl_spark.plans.catalog import load_table, query

# ---------------------------------------------------------------------------
# q20 — string kernels F1/F2/F3/F4
# ---------------------------------------------------------------------------


@query(
    "q20_string_kernels",
    oracle="""
    SELECT doc_id,
           upper(lang) AS lang_upper,
           string_split(text, ' ')[1] AS first_token,
           string_split(text, ' ')[-1] AS last_token,
           trim(regexp_replace(source, 'src', '', 'g')) AS source_num,
           concat_ws('|', lang, source) AS lang_source
    FROM documents
    ORDER BY doc_id
    """,
    survey="F1,F2,F3,F4",
)
def q20_string_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_upper"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.trim(F.regexp_replace("source", "src", "")).alias("source_num"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q21 — regex sanitize F5
# ---------------------------------------------------------------------------


@query(
    "q21_regex_sanitize",
    oracle="""
    SELECT doc_id,
           length(regexp_replace(text, '[aeiou ]', '', 'g')) AS consonant_len,
           substr(regexp_replace(text, '[aeiou ]', '', 'g'), 1, 20) AS head20
    FROM documents
    ORDER BY doc_id
    """,
    survey="F5",
)
def q21_regex_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cleaned = F.regexp_replace("text", "[aeiou ]", "")
    return d.select(
        "doc_id",
        F.length(cleaned).alias("consonant_len"),
        F.substring(cleaned, 1, 20).alias("head20"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q22 — base64 bridge F6 (multimodal byte columns use the same path)
# ---------------------------------------------------------------------------


@query(
    "q22_base64_roundtrip",
    oracle="""
    SELECT doc_id,
           substr(base64(encode(text)), 1, 32) AS b64_head,
           octet_length(encode(text)) AS byte_len,
           length(text) AS char_len
    FROM documents
    ORDER BY doc_id
    """,
    survey="F6,X2",
)
def q22_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    b = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.substring(F.base64(b), 1, 32).alias("b64_head"),
        F.length(b).alias("byte_len"),
        F.length("text").alias("char_len"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q23 — date kernels F7/F8 (format, extract, roundtrip parse, datediff)
# ---------------------------------------------------------------------------


@query(
    "q23_date_kernels",
    oracle="""
    SELECT o_orderkey AS orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           strftime(o_orderdate, '%m/%d/%Y %H:%M:%S') AS date_str,
           CAST(o_orderdate AS TIMESTAMP) = strptime(strftime(o_orderdate, '%m/%d/%Y %H:%M:%S'),
                                                     '%m/%d/%Y %H:%M:%S') AS roundtrip_ok,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey < 3000
    ORDER BY orderkey
    """,
    survey="F7,F8",
)
def q23_date_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    fmt = "MM/dd/yyyy HH:mm:ss"
    date_str = F.date_format("o_orderdate", fmt)
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        date_str.alias("date_str"),
        (F.col("o_orderdate") == F.try_to_timestamp(date_str, F.lit(fmt))).alias("roundtrip_ok"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).alias("days_since_epoch_start"),
    ).orderBy("orderkey")


# ---------------------------------------------------------------------------
# q24 — JSON kernels F10/X4 over events.props
# ---------------------------------------------------------------------------


@query(
    "q24_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY k_bucket
    ORDER BY k_bucket
    """,
    survey="F10,X4",
)
def q24_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        e.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("k_bucket")
    )


# ---------------------------------------------------------------------------
# q25 — P2 header pivot: array<struct<k,v>> → map, last-wins
# ---------------------------------------------------------------------------


@query(
    "q25_header_pivot",
    oracle="""
    -- Oracle states the *result* of the last-wins pivot directly: the
    -- duplicate 'et' key resolves to the later entry (event_type || '!').
    SELECT event_id,
           event_type || '!' AS et_val,
           upper(event_type) AS upper_val
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
    survey="P2,F1",
)
def q25_header_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds a headers-like ARRAY<STRUCT<name,value>> with a duplicate
    key, pivots it through ``header_map`` (map_from_entries + LAST_WIN,
    reference ``resources/gmail_functions.py:270-283``), and extracts."""
    from gmail_etl_spark.functions.scalar import header_map

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    headers = F.array(
        F.struct(F.lit("ET").alias("name"), F.upper("event_type").alias("value")),
        F.struct(F.lit("et").alias("name"), F.col("event_type").alias("value")),
        F.struct(
            F.lit("Et").alias("name"), F.concat(F.col("event_type"), F.lit("!")).alias("value")
        ),
    )
    # All three names case-fold to key 'et'; LAST_WIN keeps the final
    # entry, so the pivot itself must yield event_type || '!'.
    m = header_map(headers)
    return e.select(
        "event_id",
        m["et"].alias("et_val"),
        F.upper("event_type").alias("upper_val"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# q27 — higher-order array functions (the P2/F9 machinery, generalized)
# ---------------------------------------------------------------------------


@query(
    "q27_array_hof",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS n_long_tokens,
           list_has_any(string_split(text, ' '), ['spark', 'query']) AS mentions_engine,
           list_reduce(list_transform(string_split(text, ' '), t -> length(t)),
                       (a, b) -> a + b) AS total_token_chars
    FROM documents
    WHERE doc_id < 300
    ORDER BY doc_id
    """,
    survey="F9,P2-hof",
)
def q27_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long_tokens"),
        F.exists(toks, lambda t: t.isin("spark", "query")).alias("mentions_engine"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0),
            lambda a, b: a + b,
        ).alias("total_token_chars"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q28 — regexp extraction (F12/F13 positional-parse family)
# ---------------------------------------------------------------------------


@query(
    "q28_regexp_extract",
    oracle="""
    SELECT doc_id,
           CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) AS source_id,
           regexp_extract(text, '^([a-z]+) ([a-z]+)', 2) AS second_word
    FROM documents
    ORDER BY doc_id
    """,
    survey="F12,F13",
)
def q28_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("source", r"src([0-9]+)", 1).cast("int").alias("source_id"),
        F.regexp_extract("text", r"^([a-z]+) ([a-z]+)", 2).alias("second_word"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q87/q88 — grouped pandas-UDF surface (UDAF + grouped map), oracle-exact
# ---------------------------------------------------------------------------


@query(
    "q87_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_quantity) AS BIGINT)) / 100.0
               / CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
               AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    survey="2.7-udaf",
)
def q87_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (Arrow-batched UDAF) with integer-exact
    internals, hash-matched against the pure-SQL weighted mean."""
    from gmail_etl_spark.functions.grouped import weighted_avg_price_cents

    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            weighted_avg_price_cents("l_extendedprice", "l_quantity").alias(
                "weighted_avg_price"
            )
        )
        .orderBy("l_returnflag")
    )


@query(
    "q88_grouped_map_sequence",
    oracle="""
    SELECT user_id, event_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT)
               AS seq
    FROM events
    ORDER BY user_id, seq
    """,
    survey="2.7-grouped-map",
)
def q88_grouped_map_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map: whole-group pandas computation
    (per-user ordinal sequence), checked against the window-function
    oracle."""
    from gmail_etl_spark.functions.grouped import per_key_sequence

    e = load_table(spark, sf_dir, "events")
    return per_key_sequence(e, "user_id", "ts", "event_id").orderBy("user_id", "seq")


# ---------------------------------------------------------------------------
# q140 — data-profiling audit: per-column null/distinct/range table
# ---------------------------------------------------------------------------


@query(
    "q140_profile_columns",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           COUNT(*) AS n_rows,
           CAST(SUM((o_custkey IS NULL)::INT) AS BIGINT) AS n_null,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM((o_orderstatus IS NULL)::INT) AS BIGINT),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*),
           CAST(SUM((o_orderpriority IS NULL)::INT) AS BIGINT),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    ORDER BY col_name
    """,
    survey="2.5-agg",
)
def q140_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling audit (the pre-ingest validation table every
    pipeline run emits): per column — row count, null count, distinct
    count, and min/max rendered as strings so one schema fits every
    column type.

    Scale posture: ONE pass over the table computes all columns'
    profiles in a single aggregate (partial map-side), then the tiny
    per-column rows are unpivoted driver-free with stack().  Profiling
    n columns costs one scan, not n."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("int")).cast("long").alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__null, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return (
        wide.select(
            "n_rows",
            F.expr(
                f"stack({len(cols)}, {stack_expr})"
                " as (col_name, n_null, n_distinct, min_val, max_val)"
            ),
        )
        .select("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
        .orderBy("col_name")
    )
