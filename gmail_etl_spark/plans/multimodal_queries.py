"""X2 multimodal catalog entry: the binary-column pipeline with its
deterministic decoder, oracle-checked on the byte-level features DuckDB
can recompute (length + sha256); width/height/format come from the
stub decoder convention and are exercised in unit tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmail_etl_spark.operators.multimodal import attach_media_features
from gmail_etl_spark.plans.catalog import load_table, query


@query(
    "q26_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS sha,
           substr(text, 5, 4) AS format
    FROM documents
    WHERE doc_id < 200 AND octet_length(encode(text)) >= 8
    ORDER BY media_id
    """,
    survey="X2,F6",
)
def q26_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as an opaque binary payload → mapInPandas feature
    extraction (real Arrow plumbing; deterministic fake decoder reads
    bytes 4:8 as the format tag — ascii text, so the oracle recomputes
    it with substr)."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 200) & (F.length(F.encode("text", "UTF-8")) >= 8)
    )
    media = d.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    feats = attach_media_features(media)
    return feats.select("media_id", "byte_len", "sha", "format").orderBy("media_id")


@query(
    "q29_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS sha
    FROM documents
    WHERE doc_id % 10 = 0 AND octet_length(encode(text)) >= 8
    ORDER BY media_id
    """,
    survey="X2",
)
def q29_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (every 10th media row, stable partition-local
    filter — no shuffle) composed with the mapInPandas feature
    extractor; the byte-level features oracle exactly as in q26."""
    from gmail_etl_spark.operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents").filter(
        F.length(F.encode("text", "UTF-8")) >= 8
    )
    media = d.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    sampled = sample_frames(media, every_n=10)
    feats = attach_media_features(sampled)
    return feats.select("media_id", "byte_len", "sha").orderBy("media_id")
