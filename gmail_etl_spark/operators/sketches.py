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

    # output schema mirrors the input column's type — hardcoding string
    # would break heavy-hitter queries over long/int item columns
    out_type = items.schema[col].dataType.simpleString()
    return (
        items.select(col).mapInPandas(kernel, schema=f"{col} {out_type}").distinct()
    )


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


# ---------------------------------------------------------------------------
# Spark-native count-min sketch: decode + probe
# ---------------------------------------------------------------------------

#: Java impl's modulus for the long-item hash (CountMinSketchImpl).
_CMS_PRIME = (1 << 31) - 1


def decode_count_min_sketch(raw: bytes):
    """Parse the binary produced by Spark SQL's ``count_min_sketch``
    aggregate (org.apache.spark.util.sketch.CountMinSketchImpl.writeTo,
    format V1): int version, long totalCount, int depth, int width,
    long hashA[depth], long table[depth][width] — all big-endian.
    Layout and the row-hash formula below are verified empirically
    against known item counts in tests (every row of the table must sum
    to totalCount).

    Returns (total_count, depth, width, hashA tuple, table as a
    depth×width numpy int64 array)."""
    import struct

    import numpy as np

    version, total, depth, width = struct.unpack(">iqii", raw[:20])
    if version != 1:
        raise ValueError(f"unsupported CountMinSketch version {version}")
    off = 20
    hash_a = struct.unpack(f">{depth}q", raw[off : off + depth * 8])
    off += depth * 8
    table = np.frombuffer(
        raw[off : off + depth * width * 8], dtype=">i8"
    ).reshape(depth, width).astype(np.int64)
    return total, depth, width, hash_a, table


def cms_probe_longs(raw: bytes, items: list[int]) -> dict[int, int]:
    """Point-estimate counts for long-typed items: per row i the Java
    impl computes ``h = hashA[i]*item; h += h >> 32; h &= 2^31-1;
    col = h % width`` and the estimate is the min counter across rows.
    The arithmetic-vs-logical shift difference from Java is immaterial:
    the sign-extension bits have zero low 32 bits and carries only
    propagate upward, so the masked low 31 bits agree.

    CMS never undercounts; overcount per probe exceeds eps·N with
    probability ≤ 1−confidence (gated in tests)."""
    total, depth, width, hash_a, table = decode_count_min_sketch(raw)
    m64 = 0xFFFFFFFFFFFFFFFF

    out = {}
    for item in items:
        est = None
        for i in range(depth):
            h = (hash_a[i] * int(item)) & m64
            h = (h + (h >> 32)) & m64
            h &= _CMS_PRIME
            c = int(table[i][h % width])
            est = c if est is None else min(est, c)
        out[int(item)] = est
    return out
