"""Gmail-shaped JSON fixtures (FIXTURES.md §2).

Deterministic in-code message set covering every edge case the
reference's transform exercises: mixed-case headers, duplicate headers
(last-wins), missing headers, multipart base64url bodies, HTML bodies
with entities/unicode/CRLF, fuzzy dates, bracket-less senders, Indeed
enrichment (well-formed + malformed).  Dict insertion order mirrors the
Gmail API serialization (``body`` before ``parts``) because the
reference's recursive ``data`` scan is document-order sensitive
(``resources/gmail_functions.py:195-204``).
"""

from __future__ import annotations

import base64


def b64u(s: str) -> str:
    return base64.urlsafe_b64encode(s.encode("utf-8")).decode("ascii")


_INDEED_HTML = (
    '<html><body><div dir="rtl">'
    "<a href='#'>View application</a>"
    "<p>Software Engineer</p>"
    "<p>Acme Corp - Chicago, IL</p>"
    "<p>Acme Corp</p>"
    "</div><p>footer outside rtl</p></body></html>"
)

_PLAIN_HTML = (
    "<html><head><title>T</title></head><body>"
    "<h1>Invoice&nbsp;42</h1>\r\n<p>Total: 10&euro; café</p>"
    "<p>line1\r\nline2</p></body></html>"
)


def fixture_messages() -> list[dict]:
    """The raw-zone message list, shaped exactly like Gmail's JSON."""
    return [
        {  # 1. happy path
            "id": "m001",
            "payload": {
                "mimeType": "text/plain",
                "headers": [
                    {"name": "Subject", "value": "Hello there"},
                    {"name": "Date", "value": "Mon, 15 May 2023 10:30:00 +0000"},
                    {"name": "From", "value": "Alice Doe <alice@example.com>"},
                ],
                "body": {"data": b64u("Hello World")},
                "parts": None,
            },
        },
        {  # 2. mixed-case headers
            "id": "m002",
            "payload": {
                "mimeType": "text/plain",
                "headers": [
                    {"name": "SUBJECT", "value": "Caps matter not"},
                    {"name": "date", "value": "Tue, 16 May 2023 08:00:00 +0000"},
                    {"name": "FROM", "value": "Bob <bob@example.com>"},
                ],
                "body": {"data": b64u("case test")},
                "parts": None,
            },
        },
        {  # 3. duplicate Subject headers → last wins
            "id": "m003",
            "payload": {
                "mimeType": "text/plain",
                "headers": [
                    {"name": "Subject", "value": "first subject"},
                    {"name": "Subject", "value": "second subject wins"},
                    {"name": "Date", "value": "Wed, 17 May 2023 09:15:30 +0000"},
                    {"name": "From", "value": "Carol <carol@example.com>"},
                ],
                "body": {"data": b64u("dup header test")},
                "parts": None,
            },
        },
        {  # 4. missing Subject and Date → null columns
            "id": "m004",
            "payload": {
                "mimeType": "text/plain",
                "headers": [{"name": "From", "value": "Dave <dave@example.com>"}],
                "body": {"data": b64u("sparse row")},
                "parts": None,
            },
        },
        {  # 5. multipart: payload body + parts + nested parts; urlsafe chars
            "id": "m005",
            "payload": {
                "mimeType": "multipart/mixed",
                "headers": [
                    {"name": "Subject", "value": "multi part"},
                    {"name": "Date", "value": "Thu, 18 May 2023 23:59:59 +0000"},
                    {"name": "From", "value": "Eve <eve@example.com>"},
                ],
                "body": {"data": b64u("root~body?>")},
                "parts": [
                    {
                        "mimeType": "multipart/alternative",
                        "body": {"data": b64u("part-one")},
                        "parts": [
                            {"mimeType": "text/plain", "body": {"data": b64u("nested>leaf?")}},
                            {"mimeType": "text/html", "body": {"data": None}},
                        ],
                    },
                    {
                        "mimeType": "text/plain",
                        "body": {"data": b64u("part-two")},
                        "parts": None,
                    },
                ],
            },
        },
        {  # 6. HTML body with entities, unicode, CRLF
            "id": "m006",
            "payload": {
                "mimeType": "text/html",
                "headers": [
                    {"name": "Subject", "value": "Your invoice"},
                    {"name": "Date", "value": "Fri, 19 May 2023 12:00:00 +0000"},
                    {"name": "From", "value": "Billing <billing@shop.example>"},
                ],
                "body": {"data": b64u(_PLAIN_HTML)},
                "parts": None,
            },
        },
        {  # 7. fuzzy date → F7 chain misses, U2 dateutil fuzzy catches
            "id": "m007",
            "payload": {
                "mimeType": "text/plain",
                "headers": [
                    {"name": "Subject", "value": "odd date"},
                    {"name": "Date", "value": "on 15 Jan 2023 at 10:00:00 thanks"},
                    {"name": "From", "value": "Frank <frank@example.com>"},
                ],
                "body": {"data": b64u("fuzzy")},
                "parts": None,
            },
        },
        {  # 8. From without angle brackets
            "id": "m008",
            "payload": {
                "mimeType": "text/plain",
                "headers": [
                    {"name": "Subject", "value": "bare sender"},
                    {"name": "Date", "value": "Sat, 20 May 2023 07:45:00 +0000"},
                    {"name": "From", "value": "grace@example.com"},
                ],
                "body": {"data": b64u("no brackets")},
                "parts": None,
            },
        },
        {  # 9. Indeed mail → role/org/location enrichment
            "id": "m009",
            "payload": {
                "mimeType": "text/html",
                "headers": [
                    {"name": "Subject", "value": "Application received"},
                    {"name": "Date", "value": "Sun, 21 May 2023 18:30:00 +0000"},
                    {"name": "From", "value": "Indeed Apply <indeedapply@indeed.com>"},
                ],
                "body": {"data": b64u(_INDEED_HTML)},
                "parts": None,
            },
        },
        {  # 10. Indeed mail, malformed HTML (no dir=rtl) → empty struct
            "id": "m010",
            "payload": {
                "mimeType": "text/html",
                "headers": [
                    {"name": "Subject", "value": "Application received"},
                    {"name": "Date", "value": "Sun, 21 May 2023 19:00:00 +0000"},
                    {"name": "From", "value": "indeedapply@indeed.com"},
                ],
                "body": {"data": b64u("<html><body><p>no rtl element</p></body></html>")},
                "parts": None,
            },
        },
    ]


def fixture_raw_df(spark):
    """Fixture messages as a raw-zone DataFrame with the explicit schema."""
    from gmail_etl_spark.schemas import RAW_MESSAGE_SCHEMA

    return spark.createDataFrame(fixture_messages(), RAW_MESSAGE_SCHEMA)
