"""X6 scale-posture tests: the plans, not just the answers.

These assert the *physical* properties the 100 TB design depends on:
filters reach the parquet scan, dimensions broadcast, bucketed joins
avoid shuffles, salted operators match their plain equivalents.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from gmail_etl_spark.plans.catalog import CATALOG, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q01_filter_pushdown_and_pruning(spark):
    df = CATALOG["q01_pricing_summary"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned: orderkey/partkey/suppkey never read
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_q03_broadcasts_dimensions(spark):
    df = CATALOG["q03_region_revenue"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3  # region/nation/customer at least
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_q40_shuffles_hash_not_content(spark):
    df = CATALOG["q40_dedup_exact"].builder(spark, SF_DIR)
    plan = _plan(df)
    # the exchange operates on the projected hash, after text is dropped
    exchange_sections = plan.split("Exchange")
    assert len(exchange_sections) > 1
    assert "sha2" in plan


def test_salted_join_matches_plain_join(spark):
    from gmail_etl_spark.operators.skew import salted_join

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    plain = orders.join(customer, "o_custkey").groupBy("c_nationkey").count()
    salted = (
        salted_join(orders, customer, "o_custkey", salt_from="o_orderkey", n=4)
        .groupBy("c_nationkey")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_matches_plain(spark):
    from gmail_etl_spark.operators.skew import two_phase_agg

    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = (
        l.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    two = two_phase_agg(l, "l_returnflag", "l_quantity", salt_from="l_orderkey", n=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, two.collect()))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-located join: bucketing both fact tables by the join key lets
    the join run shuffle-free — the 100 TB pattern for repeated joins on
    the same key (ingest once, join many times)."""
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    try:
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(t_orders)
        l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(t_lineitem)
        bo, bl = spark.table(t_orders), spark.table(t_lineitem)
        joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"]).select(
            "o_orderkey", "l_extendedprice"
        )
        plan = _plan(joined)
        join_section = plan.split("Join")[0] + plan.split("Join")[1]
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join should not shuffle:\n" + plan[:2000]
        )
        assert joined.count() == l.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")
