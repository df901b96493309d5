"""X2 — multimodal columns: opaque binary payloads + typed metadata.

Design (SURVEY §2.8 X2): media travels as a ``BinaryType`` column with a
metadata struct alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the heavy
bytes cross the Python boundary exactly once per batch and the Spark
side (schema, partitioning, batch shape) is identical whether the
decoder is real or stubbed.

The actual codecs (PIL/opencv/librosa) are NOT in this environment, so
``decode_image`` raises a clearly-marked NotImplementedError and the
pipeline runs with :func:`fake_image_features` — a deterministic stand-in
that reads a tiny header convention from the bytes.  Swapping in a real
decoder touches one function; every schema and plan stays fixed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media row: payload + typed metadata (format/width/height nullable —
#: populated by decode).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("format", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sha", StringType()),
    ]
)


def decode_image(payload: bytes) -> dict:  # pragma: no cover - stub
    """Real decoder hook.  Image/audio libs are not available in this
    container (see module docstring); a deployment implements this with
    PIL/opencv and deletes the raise."""
    raise NotImplementedError(
        "image decode requires PIL/opencv, not available in this environment; "
        "use fake_image_features for the deterministic test path"
    )


def fake_image_features(payload: bytes) -> dict:
    """Deterministic stand-in decoder.

    Convention: payload[0:2] = width, payload[2:4] = height (big-endian),
    payload[4:8] = format tag ascii.  Anything shorter is 'raw' with
    null dims — mirroring how a real decoder degrades on corrupt input.
    """
    if payload is None:
        return {"format": None, "width": None, "height": None}
    if len(payload) >= 8:
        return {
            "format": payload[4:8].decode("ascii", "replace"),
            "width": int.from_bytes(payload[0:2], "big"),
            "height": int.from_bytes(payload[2:4], "big"),
        }
    return {"format": "raw", "width": None, "height": None}


def attach_media_features(
    df: DataFrame, payload_col: str = "payload", use_real_decoder: bool = False
) -> DataFrame:
    """Decode/feature-extract stage: mapInPandas over the media table.

    Output schema == MEDIA_SCHEMA regardless of decoder, so downstream
    plans are decoder-agnostic.  Batch shape: Arrow batches bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — with ~10 MB
    media payloads set it to ~100 for executor-memory safety at scale.
    """
    import hashlib

    decoder = decode_image if use_real_decoder else fake_image_features
    out_fields = [f.name for f in MEDIA_SCHEMA.fields]
    in_cols = [c for c in df.columns]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = [decoder(p) for p in batch[payload_col]]
            out = pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "payload": batch[payload_col],
                    "format": [f["format"] for f in feats],
                    "byte_len": [
                        len(p) if p is not None else None for p in batch[payload_col]
                    ],
                    "width": pd.array([f["width"] for f in feats], dtype="Int32"),
                    "height": pd.array([f["height"] for f in feats], dtype="Int32"),
                    "sha": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in batch[payload_col]
                    ],
                }
            )
            yield out[out_fields]

    assert "media_id" in in_cols, "media table needs a media_id column"
    return df.mapInPandas(run, MEDIA_SCHEMA)


def resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in resize, same header convention as
    :func:`fake_image_features`: rewrite the dim header to the target,
    keep the format tag, and scale the body length by the pixel ratio
    (floor, min 1) — so byte_len responds to the resize the way a real
    re-encode roughly would.  A deployment replaces the body logic with
    PIL/opencv ``resize`` + re-encode; header/schema handling stays.
    """
    if payload is None or len(payload) < 8:
        return payload
    ow = int.from_bytes(payload[0:2], "big")
    oh = int.from_bytes(payload[2:4], "big")
    body = payload[8:]
    if ow > 0 and oh > 0:
        ratio = (width * height) / (ow * oh)
        keep = max(1, int(len(body) * ratio)) if body else 0
    else:
        keep = len(body)
    return (
        width.to_bytes(2, "big")
        + height.to_bytes(2, "big")
        + payload[4:8]
        + body[:keep]
    )


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
) -> DataFrame:
    """Resize stage: mapInPandas rewriting each payload to the target
    dimensions, then re-deriving the MEDIA_SCHEMA metadata (dims,
    byte_len, sha) from the resized bytes.  Same batch/memory posture
    as :func:`attach_media_features`; the stand-in byte transform is
    :func:`resize_payload` (real codec swaps in there alone).
    """
    import hashlib

    out_fields = [f.name for f in MEDIA_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            resized = [resize_payload(p, width, height) for p in batch[payload_col]]
            feats = [fake_image_features(p) for p in resized]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "payload": resized,
                    "format": [f["format"] for f in feats],
                    "byte_len": [len(p) if p is not None else None for p in resized],
                    "width": pd.array([f["width"] for f in feats], dtype="Int32"),
                    "height": pd.array([f["height"] for f in feats], dtype="Int32"),
                    "sha": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in resized
                    ],
                }
            )[out_fields]

    assert "media_id" in df.columns, "media table needs a media_id column"
    return df.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: keeps every n-th
    media row per (media_id div n) — the *distribution* shape of frame
    sampling (stable partitioning, no shuffle); the in-payload frame
    split itself belongs to the real decoder."""
    return df.filter((F.col("media_id") % every_n) == 0)


def binary_from_base64(col: Column) -> Column:
    """Bridge from the raw zone's base64url text (F6) to BinaryType."""
    return F.unbase64(F.translate(col, "-_", "+/"))
