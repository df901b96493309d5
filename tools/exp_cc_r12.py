"""r12 experiment: connected-components round cost on the bench pair set.

Variants (all must yield identical (n_components, label checksum)):
  A current        — shuffle_hash-hinted m join, distinct after each star
  B aqe_join       — no join hint: AQE broadcasts the per-node min table
                     when it is small, keeps shuffle joins when not
  C b_no_mid_dedup — B + large-star output canonicalized WITHOUT the
                     distinct (small-star's groupBy/dedup absorbs dupes)
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from gmail_etl_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
)
from gmail_etl_spark.session import get_spark
from gmail_etl_spark.synthetic import planted_near_dup_corpus

spark = get_spark("exp-cc-r12")
spark.sparkContext.setLogLevel("ERROR")
docs = planted_near_dup_corpus(spark, 100_000).cache()
docs.count()

pairs = minhash_lsh_pairs(
    docs, "doc_id", "text", k=3, n_hashes=16, bands=8, threshold=0.5,
    broadcast_verify=True,
).select(F.col("a_id").alias("u"), F.col("b_id").alias("v")).cache()
pairs.count()


def _canon(e: DataFrame, dedup: bool = True) -> DataFrame:
    out = (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    return out.distinct() if dedup else out


def _directed(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def cc_variant(edges: DataFrame, hint: bool, mid_dedup: bool, max_iter: int = 25):
    e = edges.select("u", "v").localCheckpoint(eager=True)

    def _star(d, large, dedup_out):
        nbrs = d if large else d.filter(F.col("v") <= F.col("u"))
        m = (
            nbrs.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("u", "_mn").alias("m"))
        )
        if hint:
            m = m.hint("shuffle_hash")
        if large:
            moved = (
                d.filter(F.col("v") > F.col("u"))
                .join(m, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
        else:
            moved = nbrs.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
        return _canon(moved.union(m.select(F.col("u"), F.col("m").alias("v"))), dedup_out)

    def _is_star_forest(d) -> bool:
        roles = d.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("node"), F.lit(1).alias("root"), F.lit(0).alias("leaf")),
                    F.struct(F.col("v").alias("node"), F.lit(0).alias("root"), F.lit(1).alias("leaf")),
                )
            ).alias("r")
        ).select("r.*")
        per_node = roles.groupBy("node").agg(
            F.max("root").alias("is_root"), F.sum("leaf").alias("leaf_deg")
        )
        return per_node.filter(
            (F.col("leaf_deg") > 1) | ((F.col("is_root") == 1) & (F.col("leaf_deg") > 0))
        ).isEmpty()

    rounds = 0
    for _ in range(max_iter):
        e = _star(_directed(e), large=True, dedup_out=mid_dedup)
        e = _star(_directed(e), large=False, dedup_out=True).localCheckpoint(eager=True)
        rounds += 1
        if _is_star_forest(e):
            break
    leaves = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("component")).distinct()
    return leaves.union(roots), rounds


def readout(comp: DataFrame):
    row = comp.agg(
        F.countDistinct("component").alias("n"),
        F.bit_xor(F.xxhash64("node", "component")).alias("x"),
    ).collect()[0]
    return row["n"], row["x"]


def run_current():
    return connected_components(pairs, canonical_input=True)


variants = [
    ("A_current_op", lambda: (run_current(), None)),
    ("B_aqe_join", lambda: cc_variant(pairs, hint=False, mid_dedup=True)),
    ("C_no_mid_dedup", lambda: cc_variant(pairs, hint=False, mid_dedup=False)),
    ("D_hint_no_mid_dedup", lambda: cc_variant(pairs, hint=True, mid_dedup=False)),
]

for name, fn in variants:
    comp, rounds = fn()
    n, x = readout(comp)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        comp2, _ = fn()
        readout(comp2)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: best3={best:.3f}s rounds={rounds} n={n} checksum={x}", flush=True)
