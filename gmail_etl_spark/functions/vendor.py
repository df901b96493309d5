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


#: HTML5 void elements — empty by definition, so one as the rtl root
#: means an empty subtree, and one inside the subtree never opens.
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _RtlCollector(HTMLParser):
    """Collect text of <a>/<p> descendants of the first dir="rtl" element.

    End-tag semantics match bs4-on-html.parser (``_popToTag``) against
    the FULL document stack, not a subtree-scoped one: bs4 keeps every
    open tag since document start, so an end tag matching an element
    opened OUTSIDE the rtl subtree pops everything above it —
    *including the rtl root*, ending the subtree.  An end tag with no
    open match anywhere is ignored (stray ``</span>`` or a
    void-element close like ``</br>`` cannot exit the subtree early).
    ``<p/>`` (explicit self-close, via html.parser's startendtag event)
    is an empty element occupying a positional slot, exactly as bs4
    emits it."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.rtl_seen = False
        self.done = False  # rtl subtree fully consumed
        self.stack: list[str] = []  # ALL open tags since document start
        self.root_depth: int | None = None  # len(stack) with root on top
        # open a/p elements: index into self.elements (find_all returns
        # start-tag document order; each element's .text spans its subtree)
        self.open_idx: list[int] = []
        self.elements: list[str] = []

    def handle_starttag(self, tag, attrs):
        if self.done:
            return
        if tag in _VOID_TAGS:
            # void elements never open; a void rtl root is an empty
            # subtree (bs4 still picks it — positional pick yields None)
            if self.root_depth is None and dict(attrs).get("dir") == "rtl":
                self.rtl_seen = True
                self.done = True
            return
        self.stack.append(tag)
        if self.root_depth is None:
            if dict(attrs).get("dir") == "rtl":
                self.rtl_seen = True
                self.root_depth = len(self.stack)
        elif tag in ("a", "p"):
            self.open_idx.append(len(self.elements))
            self.elements.append("")

    def handle_startendtag(self, tag, attrs):
        if self.done:
            return
        if self.root_depth is None:
            if dict(attrs).get("dir") == "rtl":
                self.rtl_seen = True
                self.done = True  # explicit self-close: empty subtree
            return
        if tag in ("a", "p"):
            self.elements.append("")  # empty element, closed immediately

    def handle_endtag(self, tag):
        if self.done or tag not in self.stack:
            return  # no open match anywhere: bs4 ignores it
        while self.stack:
            top = self.stack.pop()
            if (
                self.root_depth is not None
                and len(self.stack) >= self.root_depth
                and top in ("a", "p")
                and self.open_idx
            ):
                self.open_idx.pop()  # popped element was inside the subtree
            if top == tag:
                break
        if self.root_depth is not None and len(self.stack) < self.root_depth:
            self.done = True  # rtl root popped — subtree complete

    def handle_data(self, data):
        if self.done:
            return
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
