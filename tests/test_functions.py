"""Unit goldens for the scalar kernels and UDF stages (SURVEY §5.2).

The reference-semantics checks here are *independent*: expected values
are hand-written or derived with json.loads object_hook (the
reference's own mechanism, reimplemented minimally), not with the
engine's code paths.
"""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from gmail_etl_spark.functions.html import strip_html
from gmail_etl_spark.functions.scalar import (
    ascii_sanitize,
    b64url_decode_utf8,
    body_text_fixed_depth,
    header_map,
    lenient_timestamp,
    parse_sender,
)
from gmail_etl_spark.functions.vendor import extract_indeed_fields
from gmail_etl_spark.schemas import RAW_MESSAGE_SCHEMA
from gmail_etl_spark.sources.fixtures import b64u, fixture_messages


def _one_value(spark, col, data=None, schema=None):
    if data is None:
        df = spark.range(1)
    else:
        df = spark.createDataFrame(data, schema)
    return df.select(col.alias("v")).collect()[0]["v"]


# ---------------------------------------------------------------------------
# P2 header pivot
# ---------------------------------------------------------------------------


def test_header_map_last_wins_case_insensitive(spark):
    data = [
        (
            [
                {"name": "Subject", "value": "first"},
                {"name": "SUBJECT", "value": "second"},
                {"name": "From", "value": "x@y.z"},
            ],
        )
    ]
    schema = "headers array<struct<name:string,value:string>>"
    df = spark.createDataFrame(data, schema)
    row = df.select(
        header_map(F.col("headers"))["subject"].alias("s"),
        header_map(F.col("headers"))["from"].alias("f"),
        header_map(F.col("headers"))["date"].alias("d"),
    ).collect()[0]
    assert row["s"] == "second"  # last wins
    assert row["f"] == "x@y.z"
    assert row["d"] is None  # missing header → null


# ---------------------------------------------------------------------------
# F2/F3 sender parse
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Alice Doe <alice@example.com>", "alice@example.com"),
        ("bob@example.com", "bob@example.com"),  # no angle brackets
        ("Weird <Nested <c@d.e>", "c@d.e"),  # split takes LAST segment
        ("  spaced  <s@t.u>  ", "s@t.u"),
        ("Trailing> <t@u.v>", "t@u.v"),
    ],
)
def test_parse_sender(spark, raw, expected):
    v = _one_value(spark, parse_sender(F.col("s")), [(raw,)], "s string")
    assert v == expected


# ---------------------------------------------------------------------------
# F5 ascii sanitize
# ---------------------------------------------------------------------------


def test_ascii_sanitize(spark):
    v = _one_value(
        spark, ascii_sanitize(F.col("s")), [("café\r\nnaïve±x",)], "s string"
    )
    # python reference: 'café\r\nnaïve±x'.encode('ascii','ignore') minus \r\n
    expected = (
        "café\r\nnaïve±x".encode("ascii", "ignore").decode().replace("\r", "").replace("\n", "")
    )
    assert v == expected == "cafnavex"


# ---------------------------------------------------------------------------
# F6 base64url decode
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("text", ["hello", "root~body?>", "nested>leaf?", "ü ünïcode"])
def test_b64url_roundtrip(spark, text):
    encoded = base64.urlsafe_b64encode(text.encode()).decode()
    v = _one_value(spark, b64url_decode_utf8(F.col("s")), [(encoded,)], "s string")
    assert v == text


# ---------------------------------------------------------------------------
# F7 lenient timestamp
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,expected_iso",
    [
        ("Mon, 15 May 2023 10:30:00 +0000", "2023-05-15 10:30:00"),
        ("15 May 2023 10:30:00 +0000", "2023-05-15 10:30:00"),
        ("Mon, 15 May 2023 10:30:00 +0200", "2023-05-15 08:30:00"),  # UTC normalized
        ("2023-05-15T10:30:00+00:00", "2023-05-15 10:30:00"),
        ("2023-05-15 10:30:00", "2023-05-15 10:30:00"),
        ("Mon, 15 May 2023 10:30:00 +0000 (UTC)", "2023-05-15 10:30:00"),
        ("Mon, 15 May 2023 10:30:00 GMT", "2023-05-15 10:30:00"),
        ("15 May 2023 10:30:00 UTC", "2023-05-15 10:30:00"),
        ("total garbage", None),
    ],
)
def test_lenient_timestamp(spark, raw, expected_iso):
    v = _one_value(
        spark,
        F.date_format(lenient_timestamp(F.col("s")), "yyyy-MM-dd HH:mm:ss"),
        [(raw,)],
        "s string",
    )
    assert v == expected_iso


# ---------------------------------------------------------------------------
# F9 body assembly: engine expression vs the reference's own mechanism
# (json.loads object_hook) on every fixture message
# ---------------------------------------------------------------------------


def _reference_scan(item: dict) -> list[str]:
    """The reference's find_json_values mechanism, verbatim semantics:
    object_hook collects dict['data'] at every dict close
    (``resources/gmail_functions.py:195-204``)."""
    results: list[str] = []

    def hook(d):
        if "data" in d:
            results.append(d["data"])
        return d

    json.loads(json.dumps(item), object_hook=hook)
    return [r for r in results if r is not None]


def test_body_assembly_matches_reference_scan(spark):
    msgs = fixture_messages()
    df = spark.createDataFrame(msgs, RAW_MESSAGE_SCHEMA)
    got = {
        r["id"]: r["body"]
        for r in df.select(
            "id", body_text_fixed_depth(F.col("payload")).alias("body")
        ).collect()
    }
    for item in msgs:
        expected = " ".join(
            base64.urlsafe_b64decode(d).decode("utf-8") for d in _reference_scan(item)
        )
        assert got[item["id"]] == expected, item["id"]


def test_body_assembly_multipart_order(spark):
    """Document order: payload.body, then per part: body before subparts."""
    msg = {
        "id": "order",
        "payload": {
            "mimeType": "multipart/mixed",
            "headers": [],
            "body": {"data": b64u("A")},
            "parts": [
                {
                    "mimeType": "m",
                    "body": {"data": b64u("B")},
                    "parts": [
                        {"mimeType": "t", "body": {"data": b64u("C")}},
                        {"mimeType": "t", "body": {"data": b64u("D")}},
                    ],
                },
                {"mimeType": "t", "body": {"data": b64u("E")}, "parts": None},
            ],
        },
    }
    df = spark.createDataFrame([msg], RAW_MESSAGE_SCHEMA)
    body = df.select(body_text_fixed_depth(F.col("payload")).alias("b")).collect()[0]["b"]
    assert body == "A B C D E"
    ref = " ".join(
        base64.urlsafe_b64decode(d).decode() for d in _reference_scan(msg)
    )
    assert body == ref


# ---------------------------------------------------------------------------
# U1 html → text
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "html,expected",
    [
        ("<p>Hello <b>world</b></p>", "Helloworld"),
        ("plain text", "plain text"),
        ("<div> a </div><div> b </div>", "ab"),
        ("<p>x&amp;y</p>", "x&y"),
        ("", ""),
    ],
)
def test_strip_html(html, expected):
    assert strip_html(html) == expected


def test_strip_html_nbsp_to_ascii():
    # &nbsp; → U+00A0 survives strip, dropped by ascii sanitize (ref :295)
    out = strip_html("<h1>Invoice&nbsp;42</h1>")
    assert out == "Invoice\xa042"
    assert out.encode("ascii", "ignore").decode() == "Invoice42"


# ---------------------------------------------------------------------------
# U3 indeed extract
# ---------------------------------------------------------------------------


def test_extract_indeed_positional():
    html = (
        '<div dir="rtl"><a>View</a><p>Engineer</p>'
        "<p>Acme - Chicago, IL</p><p>Acme Corp</p></div>"
    )
    assert extract_indeed_fields(html) == ("Engineer", "Acme Corp", "Chicago, IL")


def test_extract_indeed_malformed():
    assert extract_indeed_fields("<p>no rtl</p>") == (None, None, None)
    assert extract_indeed_fields(None) == (None, None, None)
    # rtl present but too few elements → positional IndexError → empty
    assert extract_indeed_fields('<div dir="rtl"><p>only one</p></div>') == (
        None,
        None,
        None,
    )


def test_extract_indeed_ignores_outside_rtl():
    html = (
        "<p>outside</p>"
        '<div dir="rtl"><a>a0</a><p>p1</p><p>x - loc</p><p>p3</p></div>'
        "<p>after</p>"
    )
    assert extract_indeed_fields(html) == ("p1", "p3", "loc")


def test_extract_indeed_bs4_edge_semantics():
    """Round-4 ADVICE cases: the engine kernel AND the q70 golden must
    both follow bs4-on-html.parser semantics on edge-case markup —
    unmatched/void end tags are ignored (cannot exit the rtl subtree
    early), an explicit ``<p/>`` self-close is an empty element that
    occupies a positional slot, a ``>`` inside a quoted attribute does
    not end the tag, and a void rtl root means an empty subtree even
    when a well-formed rtl element follows."""
    from gmail_etl_spark.plans.gmail_queries import _golden_indeed_fields

    cases = [
        # stray </span> with no matching open tag: ignored, not an exit
        (
            '<div dir="rtl"><p>A</p></span><a>B</a><p>C - D</p><a>E</a></div>',
            ("B", "E", "D"),
        ),
        # </br> closes a void element that was never open: ignored
        (
            '<div dir="rtl"><p>A</p></br><a>B</a><p>C - D</p><a>E</a></div>',
            ("B", "E", "D"),
        ),
        # <p/> is start+end: an empty element takes positional slot 0
        (
            '<div dir="rtl"><p/><a>B</a><p>C - D</p><a>E</a></div>',
            ("B", "E", "D"),
        ),
        # '>' inside a quoted attribute value does not end the tag
        (
            '<div dir="rtl"><p title="x > y">A</p><a>B</a>'
            "<p>C - D</p><a>E</a></div>",
            ("B", "E", "D"),
        ),
        # matching close pops everything above it (_popToTag): the
        # unclosed inner <span> dies with </div>, ending the subtree
        (
            '<div dir="rtl"><a>w</a><p>A</p><p>x - L</p><span></div>'
            "<p>tail - ignored</p>",
            (None, None, None),
        ),
        # first dir=rtl element is void → empty subtree, even though a
        # well-formed rtl div follows (bs4 find picks the first)
        (
            '<img dir="rtl"><div dir="rtl"><p>A</p><a>B</a>'
            "<p>C - D</p><a>E</a></div>",
            (None, None, None),
        ),
        # explicitly self-closed rtl root: same empty-subtree outcome
        (
            '<div dir="rtl"/><div dir="rtl"><p>A</p><a>B</a>'
            "<p>C - D</p><a>E</a></div>",
            (None, None, None),
        ),
        # _popToTag searches the FULL document stack: </section>
        # matches a tag opened OUTSIDE the rtl subtree, so it pops
        # everything above it INCLUDING the rtl root — subtree ends at
        # the first </section>, leaving only one element
        (
            '<section><div dir="rtl"><p>A</p></section><a>B</a>'
            "<p>C - D</p><a>E</a></div>",
            (None, None, None),
        ),
        # dir must be a real parsed attribute with the exact value
        # 'rtl': a data-dir attr, an rtlx value, or an uppercase RTL
        # value must NOT select the root (bs4 attrs matching is exact)
        (
            '<span data-dir="rtl"><p>1</p><a>2</a><p>3 - 4</p><a>5</a></span>',
            (None, None, None),
        ),
        (
            '<div dir="rtlx"><p>1</p><a>2</a><p>3 - 4</p><a>5</a></div>',
            (None, None, None),
        ),
        (
            '<div dir="RTL"><p>1</p><a>2</a><p>3 - 4</p><a>5</a></div>',
            (None, None, None),
        ),
        # an unquoted attribute value ending in '/' is NOT a self-close
        # (html.parser folds the '/' into the value), so <p data-x=1/>
        # opens normally and 'B' accrues to it
        (
            '<div dir="rtl"><a>X</a><p data-x=1/>B</p><p>C - D</p><a>E</a></div>',
            ("B", "E", "D"),
        ),
        # ...but an explicit ' />' after the value IS a self-close
        (
            '<div dir="rtl"><a>X</a><p data-x=1 />B</p><p>C - D</p><a>E</a></div>',
            ("", "E", "D"),
        ),
    ]
    for html, want in cases:
        assert extract_indeed_fields(html) == want, html
        assert _golden_indeed_fields(html) == want, html


def test_strip_html_malformed_markup_cases():
    """Adversarial/malformed markup: the stdlib fallback must never
    raise and must extract the visible text sensibly (the bs4
    'html.parser' flavor is built on the same stdlib tokenizer, so
    text-node events match; these pin the fallback's behavior)."""
    from gmail_etl_spark.functions.html import strip_html

    cases = {
        # unclosed tags
        "<div><p>open<b>bold": "openbold",
        # stray closing tags
        "</p>text</div>": "text",
        # comment excluded, text kept
        "a<!-- hidden -->b": "ab",
        # broken comment (never closed): the tokenizer cannot form a
        # comment token and emits the raw bytes as data
        "keep<!-- broken": "keep<!-- broken",
        # bare ampersand and broken entity survive as text
        "fish & chips &nosuch; ok": "fish & chips &nosuch; ok",
        # numeric/named entities decode
        "&lt;tag&gt; &#65;": "<tag> A",
        # attribute quote never closes: no tag token forms, the raw
        # prefix surfaces as data (same event bs4's html.parser sees)
        '<a href="x>link</a>done': '<a href="x>linkdone',
        # doctype and processing instructions are not text
        "<!DOCTYPE html><?xml version='1'?>body": "body",
        # deeply nested unclosed structure
        "<i>" * 200 + "deep": "deep",
    }
    for html, expected in cases.items():
        assert strip_html(html) == expected, html
    assert strip_html(None) is None
    assert strip_html("") == ""


def test_strip_html_bs4_parity_extended_corpus():
    """Round-3 verdict ask: a malformed-markup golden corpus pinned to
    BeautifulSoup(html,'html.parser').get_text(strip=True) semantics.

    bs4 is not installed in this environment, but its 'html.parser'
    tree builder tokenizes with THE SAME stdlib HTMLParser
    (convert_charrefs=True), and get_text() on bs4>=4.9 excludes
    Comment/Declaration/ProcessingInstruction strings — exactly the
    events the fallback drops.  So for every case below the expected
    value IS bs4's output by construction of the shared tokenizer.
    Divergence surface, enumerated: (a) bs4<4.9 included comments in
    get_text — out of scope, reference pins no version and modern bs4
    is the parity target; (b) lxml/html5lib builders re-tokenize
    differently — out of scope, the reference passes 'html.parser'
    (resources/gmail_functions.py:294); (c) none known otherwise."""
    from gmail_etl_spark.functions.html import strip_html

    cases = {
        # CDATA-mode elements: script/style bodies are ONE text node;
        # a '<p>' inside script is NOT markup (tokenizer switches to
        # CDATA mode until the matching close tag)
        "<script>if (a<b) { x='<p>'; }</script>tail": "if (a<b) { x='<p>'; }tail",
        "<style>p>a { color: red }</style>t": "p>a { color: red }t",
        # bare '<' followed by space is text, not a tag open
        "a < b and c > d": "a<b and c > d",
        # '<>' and '</>' produce no tag token; '<>' survives as data
        "text<>odd</>more": "text<>oddmore",
        # entity at end of input without semicolon still decodes
        "ends with &amp": "ends with &",
        # &nbsp; decodes to U+00A0 which str.strip() removes at node
        # edges but keeps mid-text
        "<p>\xa0lead</p><p>mid\xa0dle</p>": "leadmid\xa0dle",
        "<p>&nbsp;lead</p><p>mid&nbsp;dle</p>": "leadmid\xa0dle",
        # void elements contribute no text and break text nodes
        "<br>a<hr/>b<img src='x'>c": "abc",
        # attribute VALUES are never text, even when entity-laden
        '<a title="x &amp; y">z</a>': "z",
        # uppercase/mixed-case tags tokenize the same
        "<P>Mixed</P><DiV>case</dIv>": "Mixedcase",
        # whitespace-only nodes vanish under strip=True
        "<p>  </p>\n\t<p>x</p>  ": "x",
        # numeric entities: decimal, hex, out-of-ASCII (sanitize step
        # is downstream of strip_html, so unicode survives here)
        "&#8364; &#x20AC; &#65;": "€ € A",
        # conditional comment (IE-style) is a comment: dropped whole
        "x<!--[if IE]>hidden<![endif]-->y": "xy",
        # textarea is NOT CDATA-mode in html.parser (only script/style
        # are; HTML5's RCDATA textarea is a browser refinement neither
        # the stdlib tokenizer nor bs4-on-html.parser implements), so
        # the inner <p> tokenizes as markup
        "<textarea><p>raw</p></textarea>after": "rawafter",
    }
    for html, expected in cases.items():
        assert strip_html(html) == expected, html


def test_golden_strip_html_agrees_on_wellformed():
    """The q70 oracle's INDEPENDENT regex tokenizer and the engine's
    HTMLParser kernel must agree on well-formed markup (the fixture
    class) — the dual-implementation contract.  Malformed inputs are
    allowed to diverge (the regex golden has no CDATA mode / invalid-'<'
    recovery); the q70 fixture contains none, so any disagreement the
    driver surfaces is a REAL semantics bug in one side."""
    from gmail_etl_spark.functions.html import strip_html
    from gmail_etl_spark.plans.gmail_queries import _golden_strip_html

    wellformed = [
        "<html><head><title>T</title></head><body><p>b</p></body></html>",
        "<div dir=\"rtl\"><a href='u'>Apply</a><p>Role</p><p>Org - City</p></div>",
        "<p>x &amp; y &nbsp; z</p>",
        "<p>nested <a>link<em>em</em></a> done</p>",
        "<h1>Header</h1><p>Para one.</p><p>Para two.</p>",
        "<!-- note --><p>after comment</p>",
        "<p>&#65;&lt;ok&gt;</p>",
        "",
    ]
    for html in wellformed:
        assert _golden_strip_html(html) == strip_html(html), html


def test_strip_html_plaintext_fast_path_parity():
    """Rows without '<' or '&' take a str.strip() fast path (r12
    optimization).  Mechanism lock: the fast path must be bit-equal to
    the parser on every such input — randomized plain strings plus the
    whitespace/unicode edge cases, compared against a fast-path-free
    reimplementation of the parser route."""
    import random
    import string

    from gmail_etl_spark.functions.html import _TextExtractor, strip_html

    def parser_route(s: str) -> str:
        p = _TextExtractor()
        p.feed(s)
        p.close()
        return "".join(p.chunks)

    rng = random.Random(12012)
    alphabet = string.ascii_letters + string.digits + " \t\r\n.,;:!?'\"()-_/>«é☃"
    cases = [
        "", " ", "\r\n", "  padded  ", "a  b", "line1\r\nline2",
        "trailing>", ">leading", "unicode é☃ text", "\x00ctl\x7f",
    ] + ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120))) for _ in range(200)]
    for s in cases:
        assert "<" not in s and "&" not in s, s
        assert strip_html(s) == parser_route(s), repr(s)


def test_py_strip_ws_class_matches_str_isspace():
    """The JVM fast path's whitespace class must equal Python's
    str.strip() set EXACTLY — full-codepoint scan, so a unicode-table
    drift or a class typo can never silently desync the two paths."""
    import re

    from gmail_etl_spark.functions.html import _PY_STRIP_WS_CLASS

    pat = re.compile(_PY_STRIP_WS_CLASS)
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue  # unpaired surrogates: not valid text either side
        c = chr(cp)
        assert bool(pat.fullmatch(c)) == c.isspace(), hex(cp)


def test_strip_plain_text_jvm_gate_parity(spark):
    """The r13 JVM-side U1 gate (pipeline.py): for every row, the gated
    column — strip_plain_text for no-markup rows, the pandas UDF (fed
    NULL on gated rows) otherwise — must be byte-identical to the
    ungated html_to_text(raw_body).  Hostile inputs: exotic unicode
    whitespace at both ends, control chars, entities, tags, null,
    empty."""
    import random

    from pyspark.sql import functions as F

    from gmail_etl_spark.functions.html import (
        html_to_text,
        plain_text_no_markup,
        strip_plain_text,
    )

    ws = "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0      　"
    rng = random.Random(13013)
    rows = [
        (None,), ("",), ("   ",), (ws,), (f"{ws}padded{ws}",),
        (" line ",), ("\x1cctl\x1f",), ("no markup at all",),
        ("x < y maybe",), ("a &amp; b",), ("<p> html </p>",),
        ("<div> &nbsp;</div>",), ("ends with amp &",), ("< not a tag",),
    ] + [
        (
            "".join(rng.choice(ws)) * rng.randrange(0, 3)
            + "".join(rng.choice("abcXYZ09 é☃.:" + ws) for _ in range(rng.randrange(0, 60)))
            + "".join(rng.choice(ws)) * rng.randrange(0, 3),
        )
        for _ in range(120)
    ]
    df = spark.createDataFrame(rows, "raw_body string")
    plain = plain_text_no_markup(F.col("raw_body"))
    gated = F.when(plain, strip_plain_text(F.col("raw_body"))).otherwise(
        html_to_text(F.when(~plain, F.col("raw_body")))
    )
    out = df.select(
        gated.alias("gated"), html_to_text(F.col("raw_body")).alias("ungated")
    ).collect()
    for r in out:
        assert r["gated"] == r["ungated"], repr(r)
