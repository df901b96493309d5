"""X2 multimodal catalog entries: the binary-column pipeline with the
real stdlib decoders.

q26/q106 build genuine PNG payloads (deterministic pixels derived from
doc_id), push them through the mapInPandas decode / resize stages, and
oracle the *pixel-derived* metadata — DuckDB recomputes width, height,
and the pixel mean arithmetically from doc_id, so a green row proves the
scanlines were actually decompressed and de-filtered, not read off a
header.  q29 oracles the byte-level features (length + sha256) that are
decoder-independent.  q115 is the audio analogue: real RIFF/PCM WAV
payloads whose sample-derived features (duration, RMS, zero crossings)
the oracle recomputes arithmetically.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from gmail_etl_spark.operators.multimodal import attach_media_features, encode_png
from gmail_etl_spark.plans.catalog import load_table, query

_MEDIA_IN = StructType(
    [StructField("media_id", LongType()), StructField("payload", BinaryType())]
)


def _dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 64 + 1, doc_id % 32 + 1


def _synth_png_media(df: DataFrame, constant_color: bool) -> DataFrame:
    """doc_id → a real PNG payload, built executor-side in mapInPandas.

    Pixel content is a deterministic function of doc_id so the oracle
    can recompute pixel statistics in SQL:

    * gradient mode: every channel of row y equals y (height <= 32 <
      256), so the image mean is exactly (height - 1) / 2;
    * constant mode: every channel equals (doc_id * 37) % 256, which is
      invariant under resampling — the resize oracle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = []
            for doc_id in batch["doc_id"]:
                w, h = _dims(int(doc_id))
                if constant_color:
                    c = (int(doc_id) * 37) % 256
                    px = bytes([c]) * (w * h * 3)
                else:
                    px = b"".join(bytes([y]) * (w * 3) for y in range(h))
                payloads.append(encode_png(w, h, 3, px))
            yield pd.DataFrame({"media_id": batch["doc_id"], "payload": payloads})

    return df.select("doc_id").mapInPandas(run, _MEDIA_IN)


@query(
    "q26_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           'png' AS format,
           doc_id % 64 + 1 AS width,
           doc_id % 32 + 1 AS height,
           (doc_id % 32) / 2.0 AS px_mean
    FROM documents
    WHERE doc_id < 200
    ORDER BY media_id
    """,
    survey="X2,F6",
)
def q26_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real decode end-to-end: gradient PNGs built per doc_id, decoded by
    the stdlib PNG path (zlib inflate + de-filter), features oracled
    arithmetically — px_mean == (height-1)/2 only if the pixels really
    came back.

    Scale posture: payload bytes cross the Arrow boundary once per
    stage, no shuffle before the presentation sort."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    feats = attach_media_features(_synth_png_media(d, constant_color=False))
    return (
        feats.select(
            "media_id",
            "format",
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
            "px_mean",
        )
        .orderBy("media_id")
    )


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
    extractor; text payloads are not decodable images, so the features
    oracled here are the decoder-independent byte-level ones (the
    decoder's tolerant 'raw' degrade is exactly the corrupt-blob
    posture)."""
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
           'png' AS format,
           CAST((doc_id * 37) % 256 AS DOUBLE) AS px_mean
    FROM documents
    WHERE doc_id < 300
    ORDER BY media_id
    """,
    survey="X2",
)
def q106_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real resize end-to-end: constant-color PNGs (color derived from
    doc_id) decoded, nearest-neighbor resampled to 24x18, re-encoded as
    PNG, and the output metadata re-decoded from the re-encoded bytes.
    A constant image's mean is invariant under resampling, so px_mean ==
    (doc_id*37) % 256 proves decode → resample → encode → decode all
    round-tripped.

    Scale posture: one narrow mapInPandas pass per stage; payload bytes
    cross the Arrow boundary once each, no shuffle before the
    presentation sort."""
    from gmail_etl_spark.operators.multimodal import resize_media

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    media = _synth_png_media(d, constant_color=True)
    return (
        resize_media(media, 24, 18)
        .select(
            "media_id",
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
            "format",
            "px_mean",
        )
        .orderBy("media_id")
    )


@query(
    "q115_audio_features",
    oracle="""
    SELECT doc_id AS media_id,
           'wav' AS format,
           8000 AS sample_rate,
           1 AS channels,
           doc_id % 400 + 50 AS n_samples,
           CAST(doc_id % 400 + 50 AS DOUBLE) / 8000.0 AS duration_s,
           CAST((doc_id * 13) % 1000 + 100 AS DOUBLE) AS rms,
           (doc_id * 13) % 1000 + 100 AS peak,
           doc_id % 400 + 49 AS zero_crossings
    FROM documents
    WHERE doc_id < 300
    ORDER BY media_id
    """,
    survey="X2",
)
def q115_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode end-to-end: mono 16-bit PCM WAV payloads built
    per doc_id (an alternating ±A square wave, A = (doc_id*13)%1000+100,
    n = doc_id%400+50 samples at 8 kHz), decoded by the stdlib RIFF/PCM
    parser, features oracled arithmetically — RMS == A and
    zero_crossings == n-1 hold only if the PCM frames really came back.

    Scale posture: payload bytes cross the Arrow boundary once, no
    shuffle before the presentation sort (same as q26)."""
    from gmail_etl_spark.operators.audio import attach_audio_features, encode_wav

    def run(batches):
        for batch in batches:
            payloads = []
            for doc_id in batch["doc_id"]:
                amp = (int(doc_id) * 13) % 1000 + 100
                n = int(doc_id) % 400 + 50
                samples = [amp if i % 2 == 0 else -amp for i in range(n)]
                payloads.append(encode_wav(8000, samples))
            yield pd.DataFrame({"media_id": batch["doc_id"], "payload": payloads})

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    media = d.select("doc_id").mapInPandas(run, _MEDIA_IN)
    feats = attach_audio_features(media)
    return feats.select(
        "media_id",
        "format",
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("channels").cast("long").alias("channels"),
        "n_samples",
        "duration_s",
        "rms",
        F.col("peak").cast("long").alias("peak"),
        "zero_crossings",
    ).orderBy("media_id")


# ---------------------------------------------------------------------------
# q142/q143 — perceptual image hashing: dHash features + Hamming near-dups
# ---------------------------------------------------------------------------


def _synth_pattern_media(df: DataFrame) -> DataFrame:
    """doc_id → a real PNG whose pixel value at (x, y) is the integer
    pattern (x*7 + y*13 + doc_id*37) % 256 on every channel — rich
    enough that dHash discriminates, and recomputable arithmetically in
    SQL so the oracle can derive the exact hash without a decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = []
            for doc_id in batch["doc_id"]:
                did = int(doc_id)
                w, h = did % 64 + 1, did % 32 + 1
                px = bytes(
                    ((x * 7 + y * 13 + did * 37) % 256)
                    for y in range(h)
                    for x in range(w)
                    for _c in range(3)
                )
                payloads.append(encode_png(w, h, 3, px))
            yield pd.DataFrame({"media_id": batch["doc_id"], "payload": payloads})

    return df.select("doc_id").mapInPandas(run, _MEDIA_IN)


#: the dHash spec, as SQL: g(x,y) from the pattern, 9×8 floor resample,
#: bit i = y*8+x set when g(src(x),sy) < g(src(x+1),sy)
_DHASH_SQL = """
    WITH hashes AS (
        SELECT doc_id AS media_id,
               doc_id % 64 + 1 AS w,
               doc_id % 32 + 1 AS h,
               CAST(list_sum(list_transform(range(0, 64), i ->
                   CASE WHEN
                       (((i % 8) * (doc_id % 64 + 1) // 9) * 7
                        + ((i // 8) * (doc_id % 32 + 1) // 8) * 13
                        + doc_id * 37) % 256
                       <
                       ((((i % 8) + 1) * (doc_id % 64 + 1) // 9) * 7
                        + ((i // 8) * (doc_id % 32 + 1) // 8) * 13
                        + doc_id * 37) % 256
                   THEN CAST(power(2, i) AS HUGEINT) ELSE 0 END)) AS HUGEINT)
                   AS bits
        FROM documents WHERE doc_id < 150
    )
    SELECT media_id,
           CAST(bits // 4294967296 AS BIGINT) AS dhash_hi,
           CAST(bits % 4294967296 AS BIGINT) AS dhash_lo
    FROM hashes
"""


@query(
    "q142_image_dhash",
    oracle=_DHASH_SQL + " ORDER BY media_id",
    survey="X2,D2",
)
def q142_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual fingerprints through the REAL pipeline: pattern PNGs
    are encoded, zlib-inflated, de-filtered, grayscaled, 9×8
    nearest-resampled and difference-hashed executor-side — and the
    oracle recomputes the exact 64-bit hash arithmetically from the
    pattern, so a green row proves every stage of the decode+hash path
    bit-for-bit.  Map-only scale shape: one mapInPandas pass, no
    shuffle before the presentation sort."""
    from gmail_etl_spark.operators.multimodal import attach_dhash

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    media = _synth_pattern_media(d)
    return attach_dhash(media).orderBy("media_id")


@query(
    "q143_image_near_dup_pairs",
    oracle="WITH halves AS (" + _DHASH_SQL + """
    )
    SELECT a.media_id AS a_id, b.media_id AS b_id,
           CAST(bit_count(xor(a.dhash_hi, b.dhash_hi))
                + bit_count(xor(a.dhash_lo, b.dhash_lo)) AS BIGINT) AS hamming
    FROM halves a JOIN halves b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash_hi, b.dhash_hi))
          + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 3
    ORDER BY a_id, b_id""",
    survey="X2,D2",
)
def q143_image_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs at Hamming ≤ 3 over dHash, found with
    multi-index banding (4 × 16-bit bands; pigeonhole guarantees perfect
    recall at this radius) instead of the oracle's O(n²) join — a green
    hash row therefore proves the banded search EXACTLY reproduces the
    exhaustive result on real decoded images."""
    from gmail_etl_spark.operators.multimodal import attach_dhash, dhash_near_dup_pairs

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    feats = attach_dhash(_synth_pattern_media(d))
    return dhash_near_dup_pairs(feats, max_hamming=3).orderBy("a_id", "b_id")


# ---------------------------------------------------------------------------
# q144 — acoustic fingerprint over the real WAV decode
# ---------------------------------------------------------------------------


@query(
    "q144_audio_fingerprint",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(list_sum(list_transform(range(0, 32), i ->
               CASE WHEN
                   list_sum(list_transform(range(0, 8), k ->
                       abs(((i*8+k)*(i*8+k) + doc_id*29) % 2001 - 1000)))
                   <
                   list_sum(list_transform(range(0, 8), k ->
                       abs((((i+1)*8+k)*((i+1)*8+k) + doc_id*29) % 2001 - 1000)))
               THEN CAST(power(2, i) AS BIGINT) ELSE 0 END)) AS BIGINT)
               AS audio_fp
    FROM documents
    WHERE doc_id < 200
    ORDER BY media_id
    """,
    survey="X2,D2",
)
def q144_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic fingerprints through the REAL pipeline: deterministic
    PCM (sample i = (i² + doc_id·29) % 2001 − 1000, 264 samples, 16-bit
    WAV) is RIFF-encoded, parsed back by the stdlib decoder, framed to
    8-sample energies and delta-hashed to 32 bits — and the oracle
    recomputes the exact fingerprint arithmetically from the sample
    formula, proving the full encode→parse→frame→hash path bit-for-bit.
    Map-only scale shape, one Arrow crossing."""
    from gmail_etl_spark.operators.audio import attach_audio_fingerprint, encode_wav

    def run(batches):
        for batch in batches:
            payloads = []
            for doc_id in batch["doc_id"]:
                did = int(doc_id)
                samples = [((i * i + did * 29) % 2001) - 1000 for i in range(264)]
                payloads.append(encode_wav(8000, samples))
            yield pd.DataFrame({"media_id": batch["doc_id"], "payload": payloads})

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = d.select("doc_id").mapInPandas(run, _MEDIA_IN)
    return attach_audio_fingerprint(media).orderBy("media_id")


# ---------------------------------------------------------------------------
# q149 — multimodal training-sample assembly (text × embedding × image)
# ---------------------------------------------------------------------------


@query(
    "q149_multimodal_assembly",
    oracle="""
    WITH docs AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
        FROM documents WHERE doc_id < 250
    ),
    emb AS (SELECT vec_id, len(embedding) AS emb_dim FROM embeddings),
    img AS (
        SELECT doc_id AS media_id,
               doc_id % 64 + 1 AS img_w,
               doc_id % 32 + 1 AS img_h
        FROM documents WHERE doc_id < 150
    )
    SELECT d.doc_id, d.lang, d.n_tokens,
           (e.vec_id IS NOT NULL) AS has_embedding,
           COALESCE(e.emb_dim, 0) AS emb_dim,
           (i.media_id IS NOT NULL) AS has_image,
           COALESCE(i.img_w, 0) AS img_w,
           COALESCE(i.img_h, 0) AS img_h,
           (e.vec_id IS NOT NULL AND i.media_id IS NOT NULL) AS complete
    FROM docs d
    LEFT JOIN emb e ON e.vec_id = d.doc_id
    LEFT JOIN img i ON i.media_id = d.doc_id
    ORDER BY d.doc_id
    """,
    survey="X2,X1,2.5-agg",
)
def q149_multimodal_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sample-assembly join of a multimodal training pipeline: text
    records enriched with their embedding row and their image's REAL
    decoded dimensions (the media slice ends at doc_id 150, so a band of
    docs is text+embedding only), with per-modality presence flags and
    the ``complete`` bit a packing stage filters on.

    Scale posture: both enrichment sides join on the sample id — at
    100 TB all three tables would be bucketed on it, making this a
    shuffle-free zipper; here the dimension-sized sides broadcast.  The
    image dims come from the actual PNG decode (one mapInPandas pass),
    oracled arithmetically."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 250)
        .select("doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens"))
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.size("embedding").alias("emb_dim_raw")
    )
    media = attach_media_features(
        _synth_png_media(
            load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150),
            constant_color=False,
        )
    ).select("media_id", "width", "height")
    return (
        d.join(F.broadcast(emb), d["doc_id"] == emb["vec_id"], "left")
        .join(F.broadcast(media), d["doc_id"] == media["media_id"], "left")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.col("vec_id").isNotNull().alias("has_embedding"),
            F.coalesce("emb_dim_raw", F.lit(0)).cast("long").alias("emb_dim"),
            F.col("media_id").isNotNull().alias("has_image"),
            F.coalesce("width", F.lit(0)).cast("long").alias("img_w"),
            F.coalesce("height", F.lit(0)).cast("long").alias("img_h"),
            (F.col("vec_id").isNotNull() & F.col("media_id").isNotNull()).alias(
                "complete"
            ),
        )
        .orderBy("doc_id")
    )
