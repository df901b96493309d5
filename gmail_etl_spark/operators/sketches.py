"""Bounded-memory summary operators for heavy-hitter detection.

The datasketches family (HLL distinct counts, KLL quantiles, theta set
operations) ships natively in Spark 4.1's SQL functions and is used
directly by the catalog queries (q169/q176/q177).  This module adds the
one mergeable summary Spark does NOT ship: Misra–Gries frequent-items,
whose survivors provably contain every item with frequency above 1/(k+1)
— the property that turns an approximate sketch into an EXACT
heavy-hitter query (q178) via a cheap verification pass.

Reference context: the reference repo (jwong924/gmail-etl) has no
sketching at all — its 300-message batches never need one.  At 100 TB a
token-frequency GROUP BY shuffles billions of distinct-token rows;
Misra–Gries candidate pruning shrinks that to (candidates × partitions)
plus a semi-join-filtered exact pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries, unioned.

    Classic guarantee (Misra & Gries 1982; Agarwal et al., "Mergeable
    Summaries", PODS 2012): a capacity-``k`` summary over ``n`` items
    undercounts any item by at most ``n/(k+1)``, so every item with true
    count > ``n/(k+1)`` survives with a positive counter.  Per
    partition, any item with local count > ``n_p/(k+1)`` survives that
    partition's summary; if an item's GLOBAL count exceeds ``N/(k+1)``
    then by averaging it must exceed ``n_p/(k+1)`` in at least one
    partition — so the union of survivors is a superset of the global
    heavy hitters.  (tests/test_operators.py property-checks this
    superset guarantee against adversarial skew.)

    Implementation is batch-weighted, not item-at-a-time: each Arrow
    batch is counted exactly with ``value_counts`` (C speed), merged
    into the running summary by weighted increment, and compacted by the
    mergeable-summaries rule — subtract the (k+1)-th largest counter
    from all and drop non-positives.  Each compaction subtracts at most
    n_seen/(k+1) in total, preserving the bound.

    Output: one ``col`` row per surviving candidate (distinct across
    partitions).  At most ``k × n_partitions`` rows leave the executors
    — independent of data volume, the entire point at 100 TB.
    """
    import pandas as pd

    def kernel(batches):
        counters: dict = {}
        for pdf in batches:
            for token, cnt in pdf[col].value_counts().items():
                counters[token] = counters.get(token, 0) + int(cnt)
            if len(counters) > k:
                # mergeable-summaries compaction: one decrement round
                # per overflow, vectorized over the whole summary
                ser = pd.Series(counters)
                cut = int(ser.nlargest(k + 1).iloc[-1])
                ser = ser - cut
                counters = ser[ser > 0].to_dict()
        yield pd.DataFrame({col: pd.Series(list(counters.keys()), dtype="object")})

    return items.select(col).mapInPandas(kernel, schema=f"{col} string").distinct()


def exact_heavy_hitters(
    items: DataFrame,
    col: str,
    denom: int,
    k_margin: int = 2,
) -> DataFrame:
    """EXACT items occurring in more than ``1/denom`` of all rows, found
    without a full-universe GROUP BY.

    Two passes: (1) ``misra_gries_candidates`` with capacity
    ``denom * k_margin`` — a superset of every item with share >
    1/(denom·k_margin+1) ⊇ share ≥ 1/denom; (2) an exact count of ONLY
    the candidate items (broadcast semi-join before the shuffle, so the
    aggregate's key space is ≤ k × partitions instead of the full
    universe), thresholded against the exact total.  Because pass 1 can
    only over-include, the result is exactly the true heavy-hitter set
    — verified against a plain GROUP BY oracle (q178).

    Returns (col, cnt, share) with share = cnt/total rounded to 6dp,
    ordered by (-cnt, col).
    """
    cands = misra_gries_candidates(items, col, denom * k_margin)
    total = items.select(F.count(F.lit(1)).alias("_total"))
    exact = (
        items.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.join(F.broadcast(total))
        .filter(F.col("cnt") * denom >= F.col("_total"))
        .select(
            col,
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
        )
        .orderBy(F.desc("cnt"), F.asc(col))
    )
