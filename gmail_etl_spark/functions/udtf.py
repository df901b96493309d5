"""Python UDTF (SURVEY §2.7): the engine's table-function extension
mechanism (Spark 3.5+ ``@udtf``).

``HeaderExplode`` is the UDTF form of the P2 header pivot: one input
row (message id + headers array) → one output row per header, with the
case-folded name — the building block for header analytics the
map-pivot can't express (e.g. counting duplicate headers, which
last-wins deliberately hides).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="id string, name string, value string, pos int")
class HeaderExplode:
    def eval(self, id: str, headers):  # noqa: A002 - matches column name
        if headers is None:
            return
        for pos, h in enumerate(headers):
            name = h["name"] if h["name"] is None else h["name"].lower()
            yield (id, name, h["value"], pos)
