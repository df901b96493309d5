"""Central query catalog: every operator from SURVEY.md §2 as a named,
oracle-checked query.

Each entry pairs a PySpark DataFrame builder with (where SQL-expressible)
an equivalent DuckDB SQL oracle over the same parquet tables.  The
driver's correctness gate and the local pytest oracle suite both consume
this registry; ``__spark_entry__.py`` re-exports it.

Hash-match discipline (the driver compares sorted-by-name columns and
value hashes):

* every computed column is aliased identically in Spark and SQL;
* double aggregations over money columns go through exact
  ``DECIMAL(18,2)`` sums then cast back to double, so the result is
  independent of accumulation order on both engines;
* result sets are made deterministic (stable ORDER BY with full
  tie-breaks wherever a LIMIT exists).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Columns stored as parquet TIMESTAMP(NANOS), which Spark reads as
#: epoch-nanosecond longs under ``legacy.parquet.nanosAsLong`` — the
#: loader truncates to microseconds (identically to DuckDB's µs cast).
_NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst prunes columns + pushes filters."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLUMNS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


@dataclass
class CatalogQuery:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    #: DuckDB SQL producing the identical result, or None → rows-only check
    oracle: str | None
    #: SURVEY §2 rows this query exercises (e.g. "P3,F1")
    survey: str = ""
    #: include in bench.py's headline set
    headline: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)


CATALOG: dict[str, CatalogQuery] = {}


#: Semantic configs every catalog query depends on.  All are
#: runtime-settable, so they are applied defensively to whatever session
#: the caller provides (the driver harness builds its own SparkSession
#: without gmail_etl_spark.session's config): LAST_WIN reproduces the
#: reference's last-wins header loop (P2), UTC pins epoch casts and
#: date formatting, nanosAsLong makes events.parquet readable.
_SEMANTIC_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_semantic_conf(spark: SparkSession) -> None:
    for k, v in _SEMANTIC_CONF.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)


def query(
    name: str,
    oracle: str | None,
    survey: str = "",
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_semantic_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        CATALOG[name] = CatalogQuery(
            name=name, builder=wrapped, oracle=oracle, survey=survey, headline=headline, tags=tags
        )
        return fn

    return deco


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: cq.builder for name, cq in CATALOG.items()}


def oracle_map() -> dict[str, str]:
    _ensure_loaded()
    return {name: cq.oracle for name, cq in CATALOG.items() if cq.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers catalog entries."""
    global _LOADED
    if _LOADED:
        return
    # Imported for registration side effects.
    from gmail_etl_spark.plans import relational, scalar_queries, text_queries  # noqa: F401
    from gmail_etl_spark.plans import dedup_queries, similarity_queries, event_queries  # noqa: F401
    from gmail_etl_spark.plans import gmail_queries, multimodal_queries  # noqa: F401
    from gmail_etl_spark.plans import sampling_queries, temporal_queries  # noqa: F401

    _LOADED = True
