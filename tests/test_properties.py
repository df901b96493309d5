"""Property-based tests (SURVEY §5.4) on the pure-Python kernels plus a
seeded structural fuzz of the body-scan ordering, and the UDTF.
"""

from __future__ import annotations

import base64
import json
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from gmail_etl_spark.functions.html import strip_html
from gmail_etl_spark.functions.vendor import extract_indeed_fields

# ---------------------------------------------------------------------------
# pure-python kernels never crash and obey basic invariants
# ---------------------------------------------------------------------------


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_strip_html_total(html):
    out = strip_html(html)
    assert out is not None
    assert "<script" not in out.lower() or "<" in html  # no tag survives intact parse


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_extract_indeed_total(html):
    role, org, location = extract_indeed_fields(html)
    # either a full triple or all-null — never a partial row (ref :219-220)
    assert (role is None) == (org is None) == (location is None)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_sender_parse_semantics(raw):
    """Python model of parse_sender (F2/F3): split '<' take last, strip
    '>' and whitespace — idempotent on its own output."""

    def model(s: str) -> str:
        return s.split("<")[-1].replace(">", "").strip()

    once = model(raw)
    assert model(once) == once or "<" in once  # idempotent unless '<' survived


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_b64url_roundtrip_bytes(data):
    encoded = base64.urlsafe_b64encode(data).decode()
    assert base64.urlsafe_b64decode(encoded) == data


# ---------------------------------------------------------------------------
# structural fuzz: body scan order matches the reference mechanism
# ---------------------------------------------------------------------------


def _random_payload(rng: random.Random, depth: int):
    """Random message payload within the depth-2 raw schema."""

    def body():
        if rng.random() < 0.3:
            return {"data": None}
        return {"data": base64.urlsafe_b64encode(
            f"t{rng.randrange(1000)}".encode()).decode()}

    node = {"mimeType": "x", "body": body()}
    if depth > 0 and rng.random() < 0.8:
        node["parts"] = [
            _random_payload(rng, depth - 1) for _ in range(rng.randrange(0, 4))
        ]
    else:
        node["parts"] = None
    return node


def test_body_scan_order_fuzz(spark):
    from pyspark.sql import functions as F

    from gmail_etl_spark.functions.scalar import body_text_fixed_depth
    from gmail_etl_spark.schemas import RAW_MESSAGE_SCHEMA

    rng = random.Random(42)
    msgs = []
    for i in range(40):
        payload = _random_payload(rng, 2)
        payload["headers"] = []
        msgs.append({"id": f"f{i:03d}", "payload": payload})

    def reference_scan(item):
        results = []

        def hook(d):
            if "data" in d:
                results.append(d["data"])
            return d

        json.loads(json.dumps(item), object_hook=hook)
        return [r for r in results if r is not None]

    df = spark.createDataFrame(msgs, RAW_MESSAGE_SCHEMA)
    got = {
        r["id"]: r["b"]
        for r in df.select("id", body_text_fixed_depth(F.col("payload")).alias("b")).collect()
    }
    for m in msgs:
        exp = " ".join(
            base64.urlsafe_b64decode(d).decode() for d in reference_scan(m)
        )
        assert got[m["id"]] == exp, m["id"]


# ---------------------------------------------------------------------------
# UDTF
# ---------------------------------------------------------------------------


def test_header_explode_udtf(spark):
    from pyspark.sql import functions as F

    from gmail_etl_spark.functions.udtf import HeaderExplode
    from gmail_etl_spark.sources.fixtures import fixture_raw_df

    spark.udtf.register("header_explode", HeaderExplode)
    fixture_raw_df(spark).select("id", F.col("payload.headers").alias("headers")
    ).createOrReplaceTempView("raw_msgs")
    out = spark.sql(
        """
        SELECT t.id, t.name, t.value, t.pos
        FROM raw_msgs, LATERAL header_explode(id, headers) t
        """
    )
    rows = out.collect()
    # m003 has duplicate Subject headers — visible here, hidden by last-wins
    m3 = [r for r in rows if r["id"] == "m003" and r["name"] == "subject"]
    assert len(m3) == 2
    assert [r["value"] for r in sorted(m3, key=lambda r: r["pos"])] == [
        "first subject",
        "second subject wins",
    ]


@given(
    st.integers(min_value=2, max_value=24),
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=40, deadline=None)
def test_dhash_stable_under_reencode(w, h, seed):
    """dHash is a function of the pixels: re-encoding the same pixel
    buffer as a fresh PNG (new zlib stream, new chunk layout) must give
    the identical hash, and both halves stay in uint32 range."""
    from gmail_etl_spark.operators.multimodal import dhash_halves, encode_png

    px = bytes(((x * 31 + y * 17 + seed) % 256) for y in range(h) for x in range(w) for _ in range(3))
    a = dhash_halves(encode_png(w, h, 3, px))
    b = dhash_halves(encode_png(w, h, 3, px))
    assert a == b
    assert 0 <= a[0] < 2**32 and 0 <= a[1] < 2**32


@given(st.lists(st.integers(min_value=-8000, max_value=8000), min_size=264, max_size=264))
@settings(max_examples=40, deadline=None)
def test_audio_fingerprint_gain_invariant(samples):
    """The energy-delta fingerprint depends only on the loudness
    contour's ordering, so a clean 2x gain (no clipping at 16-bit
    range) must not change a single bit."""
    from gmail_etl_spark.operators.audio import audio_fingerprint, encode_wav

    base = audio_fingerprint(encode_wav(8000, samples))
    louder = audio_fingerprint(encode_wav(8000, [s * 2 for s in samples]))
    assert base == louder
    assert base is not None and 0 <= base < 2**32
