from gmail_etl_spark.functions.dates import fuzzy_parse_ts, lenient_timestamp_with_fallback
from gmail_etl_spark.functions.html import html_to_text, strip_html
from gmail_etl_spark.functions.scalar import (
    ascii_sanitize,
    b64url_decode_utf8,
    body_text_fixed_depth,
    format_date_string,
    header_map,
    lenient_timestamp,
    parse_sender,
)
from gmail_etl_spark.functions.vendor import INDEED_SENDER, extract_indeed

__all__ = [
    "ascii_sanitize",
    "b64url_decode_utf8",
    "body_text_fixed_depth",
    "format_date_string",
    "header_map",
    "lenient_timestamp",
    "lenient_timestamp_with_fallback",
    "fuzzy_parse_ts",
    "parse_sender",
    "html_to_text",
    "strip_html",
    "extract_indeed",
    "INDEED_SENDER",
]
