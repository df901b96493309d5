"""Raw-zone and stage-1 schemas (SURVEY §1.1–§1.2).

The reference is schema-dynamic (Python dicts, pandas inference at
``resources/gmail_functions.py:305``); the engine fixes explicit
StructTypes.  Gmail's MIME tree is recursive; Spark structs are not, so
``parts`` is modeled to depth 2, which covers real multipart mail
(multipart/alternative inside multipart/mixed).  Deeper trees can keep
the residual subtree as a JSON string column parsed per level with
``from_json`` (SURVEY §1.1).
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_BODY = StructType([StructField("data", StringType())])

# Innermost (depth-2) part: leaf only.
_PART_LEAF = StructType(
    [
        StructField("mimeType", StringType()),
        StructField("body", _BODY),
    ]
)

_PART = StructType(
    [
        StructField("mimeType", StringType()),
        StructField("body", _BODY),
        StructField("parts", ArrayType(_PART_LEAF)),
    ]
)

#: Raw Gmail message resource — exactly the fields the reference reads
#: (``resources/gmail_functions.py:116,267,270,286``).
RAW_MESSAGE_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField(
            "payload",
            StructType(
                [
                    StructField("mimeType", StringType()),
                    StructField(
                        "headers",
                        ArrayType(
                            StructType(
                                [
                                    StructField("name", StringType()),
                                    StructField("value", StringType()),
                                ]
                            )
                        ),
                    ),
                    StructField("body", _BODY),
                    StructField("parts", ArrayType(_PART)),
                ]
            ),
        ),
    ]
)

#: Stage-1 flat table (``resources/gmail_functions.py:265-303``): all
#: nine columns nullable strings; ``role/org/location`` sparse (Indeed
#: mail only).
STAGE1_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("mimeType", StringType()),
        StructField("subject", StringType()),
        StructField("date_string", StringType()),
        StructField("from", StringType()),
        StructField("body", StringType()),
        StructField("role", StringType()),
        StructField("org", StringType()),
        StructField("location", StringType()),
    ]
)

#: Dedup ledger (``init.sql:25-28``) as a lake table.
LEDGER_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("date", StringType()),  # ISO date string; DateType on write
    ]
)
