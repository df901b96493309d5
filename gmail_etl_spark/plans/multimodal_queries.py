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


@query(
    "q106_media_resize",
    oracle="""
    SELECT doc_id AS media_id,
           24 AS width,
           18 AS height,
           'png ' AS format,
           8 + LEAST(
               octet_length(encode(text)),
               GREATEST(1, CAST(FLOOR(
                   octet_length(encode(text))
                   * ((24 * 18) / CAST((doc_id % 64 + 1) * (doc_id % 32 + 1)
                                       AS DOUBLE))
               ) AS BIGINT))
           ) AS byte_len
    FROM documents
    WHERE doc_id < 300
    ORDER BY media_id
    """,
    survey="X2",
)
def q106_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage end-to-end: build media payloads under the header
    convention (2-byte dims from doc_id so the pixel ratio actually
    varies, 'png ' tag, document bytes as body), resize to 24x18 via
    the mapInPandas stand-in, and oracle the re-derived metadata —
    DuckDB recomputes the resized byte length arithmetically with the
    exact same op order (ratio = target/(ow*oh) as one double, body*ratio,
    floor), so the float path is bit-identical.

    Scale posture: one narrow mapInPandas pass; payload bytes cross the
    Arrow boundary once, no shuffle before the presentation sort."""
    from gmail_etl_spark.operators.multimodal import resize_media

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    payload = F.concat(
        F.unhex(F.lpad(F.hex((F.col("doc_id") % 64) + 1), 4, "0")),
        F.unhex(F.lpad(F.hex((F.col("doc_id") % 32) + 1), 4, "0")),
        F.encode(F.lit("png "), "UTF-8"),
        F.encode("text", "UTF-8"),
    )
    media = d.select(F.col("doc_id").alias("media_id"), payload.alias("payload"))
    return (
        resize_media(media, 24, 18)
        .select("media_id", "width", "height", "format", "byte_len")
        .orderBy("media_id")
    )
