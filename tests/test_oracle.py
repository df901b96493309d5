"""Primary correctness gate (SURVEY §5.1): every catalog query runs on
Spark and on DuckDB; results must match on row count, column names, and
values (order-insensitive, float-tolerant locally — the driver's gate
hashes, which is why the catalog pins order-independent arithmetic).
"""

from __future__ import annotations

import math

import pytest

from gmail_etl_spark.plans.catalog import CATALOG, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()

ORACLE_QUERIES = sorted(name for name, cq in CATALOG.items() if cq.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, cq in CATALOG.items() if cq.oracle is None)


def _canon(value):
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return round(value, 6)
    if isinstance(value, bool):
        return bool(value)
    return value


def _canon_rows(cols, rows):
    out = []
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    for row in rows:
        out.append(tuple(_canon(row[i]) for i in order))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    cq = CATALOG[name]
    sdf = cq.builder(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.execute(cq.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    canon_spark = _canon_rows(spark_cols, spark_rows)
    canon_duck = _canon_rows(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(canon_spark, canon_duck)) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    cq = CATALOG[name]
    sdf = cq.builder(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
