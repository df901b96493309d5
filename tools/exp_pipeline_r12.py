"""r12 experiment: duplicated heavy expressions in transform_stage1.

The bench plan shows header_map's map_from_entries built 3x per row
(subject/date/from) and the 6-format try_to_timestamp chain evaluated
twice (UDF null-gate + final coalesce).  Variants materialize the shared
subexpressions as columns (multi-referenced non-cheap aliases survive
CollapseProject).  All variants must produce the identical xxhash64
checksum over all output columns (the bench materializer).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from gmail_etl_spark.functions.dates import fuzzy_parse_ts
from gmail_etl_spark.functions.scalar import (
    _DATE_FORMATS,
    ascii_sanitize,
    body_text_fixed_depth,
    format_date_string,
    header_map,
    lenient_timestamp,
    parse_sender,
)
from gmail_etl_spark.functions.html import html_to_text
from gmail_etl_spark.functions.vendor import INDEED_SENDER, extract_indeed
from gmail_etl_spark.pipeline import transform_stage1
from gmail_etl_spark.session import get_spark
from gmail_etl_spark.sources.fixtures import fixture_raw_df

spark = get_spark("exp-pipeline-r12")
spark.sparkContext.setLogLevel("ERROR")

corpus = (
    fixture_raw_df(spark)
    .crossJoin(spark.range(2000).select(F.col("id").alias("_rep")))
    .withColumn("id", F.concat_ws("-", "id", "_rep"))
    .drop("_rep")
).localCheckpoint()


def v0():
    return transform_stage1(corpus)


def _final(base):
    return base.select(
        "id", "mimeType", "subject", "date_string", "from", "body",
        F.col("indeed.role").alias("role"),
        F.col("indeed.org").alias("org"),
        F.col("indeed.location").alias("location"),
    )


def v1():
    # materialized header map only
    base = corpus.select(
        F.col("id"), F.col("payload"), header_map(F.col("payload.headers")).alias("_hm")
    ).select(
        F.col("id"),
        F.col("payload.mimeType").alias("mimeType"),
        F.col("_hm")["subject"].alias("subject"),
        F.col("_hm")["date"].alias("raw_date"),
        parse_sender(F.col("_hm")["from"]).alias("from"),
        body_text_fixed_depth(F.col("payload")).alias("raw_body"),
    )
    fast = lenient_timestamp(F.col("raw_date"))
    base = base.withColumn(
        "date_string",
        format_date_string(
            F.coalesce(fast, fuzzy_parse_ts(F.when(fast.isNull(), F.col("raw_date"))))
        ),
    )
    base = base.withColumn("body", ascii_sanitize(html_to_text(F.col("raw_body"))))
    indeed = extract_indeed(F.when(F.col("from") == INDEED_SENDER, F.col("raw_body")))
    base = base.withColumn("indeed", F.when(F.col("from") == INDEED_SENDER, indeed))
    return _final(base)


def v2():
    # v1 + materialized fast-ts
    base = corpus.select(
        F.col("id"), F.col("payload"), header_map(F.col("payload.headers")).alias("_hm")
    ).select(
        F.col("id"),
        F.col("payload.mimeType").alias("mimeType"),
        F.col("_hm")["subject"].alias("subject"),
        F.col("_hm")["date"].alias("raw_date"),
        parse_sender(F.col("_hm")["from"]).alias("from"),
        body_text_fixed_depth(F.col("payload")).alias("raw_body"),
    )
    base = base.withColumn("_fast_ts", lenient_timestamp(F.col("raw_date")))
    base = base.withColumn(
        "date_string",
        format_date_string(
            F.coalesce(
                F.col("_fast_ts"),
                fuzzy_parse_ts(F.when(F.col("_fast_ts").isNull(), F.col("raw_date"))),
            )
        ),
    )
    base = base.withColumn("body", ascii_sanitize(html_to_text(F.col("raw_body"))))
    indeed = extract_indeed(F.when(F.col("from") == INDEED_SENDER, F.col("raw_body")))
    base = base.withColumn("indeed", F.when(F.col("from") == INDEED_SENDER, indeed))
    return _final(base)


def v3():
    # v2 + materialized cleaned date header (one regex pair, 6 parses)
    base = corpus.select(
        F.col("id"), F.col("payload"), header_map(F.col("payload.headers")).alias("_hm")
    ).select(
        F.col("id"),
        F.col("payload.mimeType").alias("mimeType"),
        F.col("_hm")["subject"].alias("subject"),
        F.col("_hm")["date"].alias("raw_date"),
        parse_sender(F.col("_hm")["from"]).alias("from"),
        body_text_fixed_depth(F.col("payload")).alias("raw_body"),
    )
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col("raw_date"), r"\s*\(.*\)$", ""), r"^[A-Za-z]{3},\s*", ""
    )
    base = base.withColumn("_clean_date", cleaned)
    base = base.withColumn(
        "_fast_ts",
        F.coalesce(
            *[F.try_to_timestamp(F.col("_clean_date"), F.lit(f)) for f in _DATE_FORMATS]
        ),
    )
    base = base.withColumn(
        "date_string",
        format_date_string(
            F.coalesce(
                F.col("_fast_ts"),
                fuzzy_parse_ts(F.when(F.col("_fast_ts").isNull(), F.col("raw_date"))),
            )
        ),
    )
    base = base.withColumn("body", ascii_sanitize(html_to_text(F.col("raw_body"))))
    indeed = extract_indeed(F.when(F.col("from") == INDEED_SENDER, F.col("raw_body")))
    base = base.withColumn("indeed", F.when(F.col("from") == INDEED_SENDER, indeed))
    return _final(base)


def run(df):
    hashed = df.select(F.xxhash64(*df.columns).alias("h"))
    row = hashed.agg(F.count(F.lit(1)).alias("n"), F.bit_xor("h").alias("x")).collect()[0]
    return row["n"], row["x"]


for name, fn in [("v0_current", v0), ("v1_hm", v1), ("v2_hm_fastts", v2), ("v3_hm_fastts_clean", v3)]:
    n, x = run(fn())  # warm + checksum
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: best3={best:.3f}s n={n} checksum={x}", flush=True)
