"""Scalar kernels F1–F10 (SURVEY §2.4) as composable Column expressions.

Everything here is pure ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen, no Python in the hot path.  Each builder cites the
reference behavior it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# P2 — header pivot (reference resources/gmail_functions.py:270-283)
# ---------------------------------------------------------------------------


def header_map(headers: Column) -> Column:
    """``ARRAY<STRUCT<name,value>>`` → ``MAP<lower(name), value>``.

    The reference loops over headers overwriting earlier matches, i.e.
    duplicate header names resolve **last-wins**; the session config
    ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` preserves exactly that.
    Lookup is then ``m['subject'] / m['date'] / m['from']`` —
    case-insensitive via the lower() key fold (F1).
    """
    return F.map_from_entries(
        F.transform(
            headers,
            lambda h: F.struct(
                F.lower(h["name"]).alias("key"), h["value"].alias("value")
            ),
        )
    )


# ---------------------------------------------------------------------------
# F2/F3 — sender parse (reference resources/gmail_functions.py:279-283)
# ---------------------------------------------------------------------------


def parse_sender(sender: Column) -> Column:
    """``"Name <a@x.com>"`` → ``a@x.com``: split on '<', take last,
    strip '>', trim — byte-for-byte the reference's logic, including the
    no-angle-bracket case (split yields one element, taken as-is)."""
    return F.trim(F.regexp_replace(F.element_at(F.split(sender, "<"), -1), ">", ""))


# ---------------------------------------------------------------------------
# F5 — ASCII sanitization (reference resources/gmail_functions.py:295)
# ---------------------------------------------------------------------------


def ascii_sanitize(text: Column) -> Column:
    """``encode('ascii','ignore')`` + drop CR/LF: delete every non-ASCII
    char and every carriage-return/newline."""
    return F.regexp_replace(text, r"[^\x00-\x7F]|[\r\n]", "")


# ---------------------------------------------------------------------------
# F6 — base64url → utf-8 (reference resources/gmail_functions.py:212,289)
# ---------------------------------------------------------------------------


def b64url_decode_utf8(data: Column) -> Column:
    """``base64.urlsafe_b64decode(x).decode('utf-8')``.

    Spark's ``unbase64`` takes standard base64; translate the urlsafe
    alphabet (``-_`` → ``+/``) first.  Python's decoder requires correct
    padding and Gmail emits padded data; Spark's is lenient either way.
    """
    return F.decode(F.unbase64(F.translate(data, "-_", "+/")), "UTF-8")


# ---------------------------------------------------------------------------
# F9 — body assembly, fixed-depth (reference resources/gmail_functions.py:286-291)
# ---------------------------------------------------------------------------


def body_text_fixed_depth(payload: Column) -> Column:
    """Concatenate every base64url ``data`` value in the message with
    ``' '`` separators, decoded to utf-8.

    The reference scans the whole JSON document for *every* value of key
    ``'data'`` (json.loads object_hook over ``json.dumps(item)``) and
    joins the decoded hits with ``' '``.  The object_hook fires when a
    dict *closes*; the only dicts carrying a ``data`` key are the
    ``body`` structs, which never nest inside each other, so hits arrive
    in plain document order.  Gmail serializes ``body`` before ``parts``
    within a part object, giving::

        payload.body.data,
        payload.parts[i].body.data,
        payload.parts[i].parts[j].body.data,   then parts[i+1] ...

    The unit tests lock this against an independent reimplementation of
    the recursive scan (tests/test_functions.py).
    """

    def _maybe(data: Column) -> Column:
        return F.when(data.isNotNull(), F.array(data)).otherwise(F.array())

    part_texts = F.flatten(
        F.transform(
            F.coalesce(payload["parts"], F.array()),
            lambda p: F.concat(
                _maybe(p["body"]["data"]),
                F.flatten(
                    F.transform(
                        F.coalesce(p["parts"], F.array()),
                        lambda sp: _maybe(sp["body"]["data"]),
                    )
                ),
            ),
        )
    )
    all_data = F.concat(_maybe(payload["body"]["data"]), part_texts)
    return F.array_join(F.transform(all_data, b64url_decode_utf8), " ")


# ---------------------------------------------------------------------------
# F7 — lenient timestamp parse (reference resources/gmail_functions.py:273-278)
# ---------------------------------------------------------------------------

#: RFC-2822 and common variants, tried in order (dateutil handles all of
#: these; the coalesce chain covers the non-fuzzy tail JVM-side).  The
#: weekday prefix is stripped upstream — Spark's proleptic parser
#: rejects day-of-week ('EEE') in parse patterns.
_DATE_FORMATS = (
    "d MMM yyyy HH:mm:ss Z",
    "d MMM yyyy HH:mm:ss zzz",
    "d MMM yyyy HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd HH:mm:ss",
    "MM/dd/yyyy HH:mm:ss",
)


def clean_date_header(date_str: Column) -> Column:
    """The pre-parse normalization of :func:`lenient_timestamp`: drop a
    trailing "(UTC)"-style comment and a leading "Mon, " weekday (Spark's
    proleptic parser rejects 'EEE' in parse patterns).  Exposed so a
    caller can MATERIALIZE the cleaned value as a column once — inlined
    into the 6-format coalesce it is re-evaluated per format attempt
    (two regexes × up to 6 tries per row; see ``transform_stage1``)."""
    cleaned = F.regexp_replace(date_str, r"\s*\(.*\)$", "")  # drop "(UTC)" comments
    return F.regexp_replace(cleaned, r"^[A-Za-z]{3},\s*", "")  # drop "Mon, " weekday


def lenient_timestamp_cleaned(cleaned: Column) -> Column:
    """``try_to_timestamp`` coalesce chain over an ALREADY-cleaned
    header (see :func:`clean_date_header`)."""
    return F.coalesce(
        *[F.try_to_timestamp(cleaned, F.lit(fmt)) for fmt in _DATE_FORMATS]
    )


def lenient_timestamp(date_str: Column) -> Column:
    """Best-effort parse of an email Date header.

    JVM-side ``try_to_timestamp`` coalesce chain over RFC-2822 variants;
    rows that every format misses stay null and a caller may route them
    through the ``fuzzy_parse_ts`` pandas UDF (U2) — keeping the Python
    path off the hot rows, mirroring the reference's try/except-fuzzy
    split (``resources/gmail_functions.py:274-277``).
    """
    return lenient_timestamp_cleaned(clean_date_header(date_str))


def format_date_string(ts: Column) -> Column:
    """Reference output format ``%D %H:%M:%S`` = ``MM/dd/yy HH:mm:ss``
    (``resources/gmail_functions.py:275``)."""
    return F.date_format(ts, "MM/dd/yy HH:mm:ss")
