"""U2 — fuzzy timestamp fallback (SURVEY §2.7).

Reference: ``dateutil.parser.parse(value)``, on failure
``parse(value, fuzzy=True)`` (``resources/gmail_functions.py:274-277``).
The engine parses the overwhelming majority of Date headers JVM-side via
the ``lenient_timestamp`` coalesce chain (F7); this UDF is applied only
to rows where that chain yields null, so the Python path sees the fuzzy
tail only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import TimestampType

try:  # pragma: no cover
    import dateutil.parser

    _HAS_DATEUTIL = True
except Exception:  # pragma: no cover
    _HAS_DATEUTIL = False


def _fuzzy_one(value: str | None):
    if value is None or not _HAS_DATEUTIL:
        return None
    try:
        return dateutil.parser.parse(value)
    except Exception:
        try:
            return dateutil.parser.parse(value, fuzzy=True)
        except Exception:
            return None


@pandas_udf(TimestampType())
def fuzzy_parse_ts(col: pd.Series) -> pd.Series:
    return pd.Series([_fuzzy_one(v) for v in col], dtype="datetime64[ns]")


def lenient_timestamp_with_fallback(date_str: Column) -> Column:
    """F7 chain first; U2 fuzzy UDF only where the chain missed."""
    from gmail_etl_spark.functions.scalar import lenient_timestamp

    fast = lenient_timestamp(date_str)
    return F.coalesce(fast, fuzzy_parse_ts(F.when(fast.isNull(), date_str)))
