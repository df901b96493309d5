"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full catalog from
``gmail_etl_spark.plans.catalog`` — one entry per implemented operator
row of SURVEY.md §2, each with a DuckDB oracle unless the operator is
approximate (those are rows-only by design and verified against their
exact counterparts in tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gmail_etl_spark.plans.catalog import (
    oracle_map,
    query_map,
    rows_only_reason_map,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q01 pricing summary) on /root/testdata/sf0.001."""
    qs = query_map()
    return qs["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_map()


def rows_only_reasons() -> dict[str, str]:
    """name -> rationale for every ``queries()`` entry deliberately
    absent from ``oracle_sql()`` (the driver records those as
    ``err:"no_oracle"``).  Each reason states why no exact SQL oracle
    can exist for the operator and which local invariant/recall/
    error-bound test covers it instead."""
    return rows_only_reason_map()
