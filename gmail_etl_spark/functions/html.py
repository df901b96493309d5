"""U1 — HTML → text as an Arrow-vectorized pandas UDF (SURVEY §2.7).

The reference runs BeautifulSoup per message in a driver loop
(``resources/gmail_functions.py:294-295``).  Here the parse runs
executor-side over Arrow batches; the UDF is the *only* Python stage in
the pipeline and is fed a single pre-projected string column, so the
optimization barrier it creates is as narrow as possible (SURVEY §4).

bs4 is not a baked-in dependency, so the parser is stdlib
``html.parser`` with ``get_text(strip=True)``-equivalent semantics:
every text node is stripped and non-empty nodes concatenated without a
separator; character/entity references resolve to unicode first (so
``&nbsp;`` survives to the sanitize step, which drops it as non-ASCII,
matching the reference's ``encode('ascii','ignore')``).  If bs4 is
importable we delegate to it for exact parity.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

try:  # pragma: no cover - environment-dependent
    from bs4 import BeautifulSoup  # type: ignore

    _HAS_BS4 = True
except Exception:  # pragma: no cover
    _HAS_BS4 = False

#: Elements whose content BeautifulSoup's get_text would still emit but
#: browsers treat as non-content; the reference keeps them (html.parser
#: builds a plain tree), so we keep them too — except scripts/styles are
#: *data* to HTMLParser and still surface as text nodes.  Parity with
#: bs4 'html.parser' means: keep everything that is CDATA/text.


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []

    def handle_data(self, data: str) -> None:
        stripped = data.strip()
        if stripped:
            self.chunks.append(stripped)


def strip_html(html: str | None) -> str | None:
    """``BeautifulSoup(html,'html.parser').get_text(strip=True)``."""
    if html is None:
        return None
    if "<" not in html and "&" not in html:
        # plain-text fast path: with no tag-open and no entity the whole
        # input is ONE text node under either parser, so get_text(strip=
        # True) ≡ str.strip() — parity pinned by the randomized test in
        # tests/test_functions.py (guide §4.2: skip the parser when the
        # row provably doesn't need it)
        return html.strip()
    if _HAS_BS4:
        return BeautifulSoup(html, "html.parser").get_text(strip=True)
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    return "".join(parser.chunks)


@pandas_udf(StringType())
def html_to_text(col: pd.Series) -> pd.Series:
    return col.map(strip_html)


#: Every character Python's ``str.strip()`` (i.e. ``str.isspace()``)
#: treats as whitespace, as a Java regex character class.  NOT the same
#: set as Java's ``\s`` (ASCII-only) or ``(?U)\s`` (Unicode White_Space,
#: which misses U+001C-001F) — the class is enumerated so the JVM fast
#: path below is byte-identical to the Python fast path in
#: :func:`strip_html`; membership is pinned against a full-codepoint
#: ``str.isspace()`` scan by tests/test_functions.py.
_PY_STRIP_WS_CLASS = (
    "[\\x09-\\x0D\\x1C-\\x20\\x85\\xA0\\u1680\\u2000-\\u200A"
    "\\u2028-\\u2029\\u202F\\u205F\\u3000]"
)


def plain_text_no_markup(col: Column) -> Column:
    """True exactly where :func:`strip_html` takes its plain-text fast
    path: non-null input containing neither ``<`` (no tag can open) nor
    ``&`` (no character/entity reference) — the whole input is ONE text
    node under either parser flavor."""
    return col.isNotNull() & ~(col.contains("<") | col.contains("&"))


def strip_plain_text(col: Column) -> Column:
    """JVM-side ``str.strip()``: trims exactly Python's whitespace set
    (``_PY_STRIP_WS_CLASS``), so for rows satisfying
    :func:`plain_text_no_markup` this equals ``strip_html`` without
    crossing the Arrow boundary (guide §4.1 filter-before-UDF; parity
    pinned by the randomized test in tests/test_functions.py)."""
    return F.regexp_replace(
        col, f"^{_PY_STRIP_WS_CLASS}+|{_PY_STRIP_WS_CLASS}+$", ""
    )
