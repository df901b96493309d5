"""U3 — vendor-specific enrichment (Indeed) as a pandas UDF.

Reference behavior (``resources/gmail_functions.py:207-221``): decode
the full body HTML, find the element with ``dir="rtl"``, collect the
stripped text of its ``<a>``/``<p>`` descendants **in document order**,
then positionally pick ``role = elements[1]``, ``org = elements[3]``,
``location = elements[2].split(' - ')[1]``; any failure → empty struct
(all-null columns).

The LinkedIn extractor is marked ``# BROKEN DO NOT USE`` in the
reference (``resources/gmail_functions.py:224``) with its call site
commented out (``:301-302``) — documented here, intentionally not
implemented.

Parity note: the reference applies this over the *decoded body HTML*
(it re-runs the base64 scan itself).  The engine passes the
already-assembled body HTML string (same bytes by construction of
``body_text_fixed_depth``), gated by the sender filter P5 *before* the
UDF so non-Indeed rows never cross the Python boundary.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

try:  # pragma: no cover
    from bs4 import BeautifulSoup  # type: ignore

    _HAS_BS4 = True
except Exception:  # pragma: no cover
    _HAS_BS4 = False

INDEED_SENDER = "indeedapply@indeed.com"

INDEED_STRUCT = StructType(
    [
        StructField("role", StringType()),
        StructField("org", StringType()),
        StructField("location", StringType()),
    ]
)


class _RtlCollector(HTMLParser):
    """Collect text of <a>/<p> descendants of the first dir="rtl" element."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.depth_in_rtl = 0  # >0 once inside the first rtl element
        self.rtl_seen = False
        # open a/p elements: index into self.elements (find_all returns
        # start-tag document order; each element's .text spans its subtree)
        self.open_idx: list[int] = []
        self.elements: list[str] = []

    def handle_starttag(self, tag, attrs):
        attrs = dict(attrs)
        if not self.rtl_seen and attrs.get("dir") == "rtl":
            self.rtl_seen = True
            self.depth_in_rtl = 1
            return
        if self.depth_in_rtl > 0:
            self.depth_in_rtl += 1
            if tag in ("a", "p"):
                self.open_idx.append(len(self.elements))
                self.elements.append("")

    def handle_endtag(self, tag):
        if self.depth_in_rtl > 0:
            if tag in ("a", "p") and self.open_idx:
                self.open_idx.pop()
            self.depth_in_rtl -= 1

    def handle_data(self, data):
        if self.depth_in_rtl > 0:
            for i in self.open_idx:  # text accrues to every open a/p ancestor
                self.elements[i] += data


def extract_indeed_fields(html: str | None) -> tuple[str | None, str | None, str | None]:
    if html is None:
        return (None, None, None)
    try:
        if _HAS_BS4:
            soup = BeautifulSoup(html, "html.parser")
            elements = [
                el.text.strip()
                for el in soup.find(attrs={"dir": "rtl"}).find_all(["a", "p"])
            ]
        else:
            collector = _RtlCollector()
            collector.feed(html)
            collector.close()
            if not collector.rtl_seen:
                return (None, None, None)
            elements = [e.strip() for e in collector.elements]
        return (
            elements[1],
            elements[3],
            elements[2].split(" - ")[1],
        )
    except Exception:
        return (None, None, None)


@pandas_udf(INDEED_STRUCT)
def extract_indeed(col: pd.Series) -> pd.DataFrame:
    rows = [extract_indeed_fields(x) for x in col]
    return pd.DataFrame(rows, columns=["role", "org", "location"])
