"""Temporal join operators Spark lacks as builtins (SURVEY §2.8 note on
custom operators): as-of join and banded range join, both expressed as
*compositions of existing DataFrame ops* — no UDFs, no driver loops —
so Catalyst still optimizes them and they scale like any shuffle.

As-of join (the time-series "latest value at or before t"):
    union the two inputs tagged by side, sort within each key by
    (ts, side), and carry the right side's columns forward with
    ``last(ignorenulls)`` over an unbounded-preceding window.  One
    shuffle on the key — the same cost as a plain join — versus the
    naive inequality join's quadratic explosion.

Range join (|a.ts - b.ts| <= band):
    bucket both sides to band-width buckets and join each left bucket
    to its three candidate buckets (b-1, b, b+1), then filter exactly.
    Each pair is examined once; shuffle keys are (key, bucket), which
    inherit the data's time distribution — at 100 TB pick the band so
    bucket cardinality stays ~uniform, or add a salt term for hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row: the most recent right row with
    ``right.ts <= left.ts`` in the same key group (backward-inclusive,
    the DuckDB/pandas ``merge_asof`` default).  Left rows with no prior
    right row keep nulls.

    ``right`` should be unique per (key, ts) — pre-dedupe otherwise,
    or ties make "the" latest row ambiguous on any engine.
    """
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r_proj = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    for c in left.columns:
        if c != key:
            r_proj = r_proj.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_cols:
        l_tagged = l_tagged.withColumn(
            f"{c}{suffix}", F.lit(None).cast(dict(right.dtypes)[c])
        )
    unioned = l_tagged.select(r_proj.columns).unionByName(r_proj.select(r_proj.columns))
    # right rows (side 0) sort before left rows at equal ts → inclusive
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).drop("_side", "_ts")
    for c in right_cols:
        out = out.drop(f"{c}{suffix}").withColumnRenamed(f"__carry_{c}", f"{c}{suffix}")
    return out


def range_join_pairs(
    df: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    band_seconds: int,
) -> DataFrame:
    """Self range join: all pairs (a, b) in the same key group with
    ``0 < b.ts - a.ts <= band`` and ``a.id < b.id`` ordering on equal
    ts.  Returns (key, a_id, b_id, dt_us)."""
    band_us = band_seconds * 1_000_000
    base = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
    ).withColumn("bucket", (F.col("ts_us") / F.lit(band_us)).cast("long"))
    # each left row probes buckets {b, b+1}: pairs are emitted once with
    # a as the earlier event, so only forward-adjacent buckets matter.
    left = base.select(
        "k", F.col("id").alias("a_id"), F.col("ts_us").alias("a_ts"),
        F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)).alias("jb"),
    )
    right = base.select(
        "k", F.col("id").alias("b_id"), F.col("ts_us").alias("b_ts"),
        F.col("bucket").alias("jb"),
    )
    dt = F.col("b_ts") - F.col("a_ts")
    return (
        left.join(right, ["k", "jb"])
        .filter(
            (dt > 0) & (dt <= band_us)
            | ((dt == 0) & (F.col("a_id") < F.col("b_id")))
        )
        .select(
            F.col("k").alias(key),
            "a_id",
            "b_id",
            dt.alias("dt_us"),
        )
        .dropDuplicates([key, "a_id", "b_id"])
    )
