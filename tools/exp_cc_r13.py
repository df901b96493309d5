"""r13: interleaved A/B of connected_components probe/checkpoint fusion.

OLD = r12 shape: every star round ends with ``localCheckpoint(eager=
True)`` (one materialization job) followed by the structural
convergence probe (a second job over the just-stored partitions).

NEW = ``localCheckpoint(eager=False)``: the probe's own aggregation job
materializes the checkpoint — its shuffle-map stage computes every
partition of the round's edge set, so the checkpoint is complete before
the probe's verdict, and lineage is truncated exactly as before.  One
job per round instead of two; the pre-contraction block's three eager
checkpoints are fused the same way (the first consumer materializes
each).  Invariants untouched: the probe still runs every round on the
full canonical edge set.

Inputs: the bench near-dedup pair graph (447k pairs over 100k docs),
checkpointed once so both sides cluster the identical edge set.
Parity: exact (node, component) checksum.
"""

from __future__ import annotations

import os
import statistics
import time

from pyspark.sql import DataFrame, functions as F

from gmail_etl_spark.operators.dedup import (
    _canonical_edges,
    _directed,
    connected_components,
    minhash_lsh_pairs,
)
from gmail_etl_spark.session import get_spark
from gmail_etl_spark.synthetic import planted_near_dup_corpus

spark = get_spark("exp-cc-r13")
spark.sparkContext.setLogLevel("ERROR")
docs = planted_near_dup_corpus(spark, 100_000).cache()
docs.count()
pairs = (
    minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, n_hashes=16, bands=8, threshold=0.5,
        broadcast_verify=True,
    )
    .select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
    .localCheckpoint(eager=True)
)
print("pairs:", pairs.count(), flush=True)


def old_cc(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """r12 connected_components reproduced inline (eager per-round and
    pre-contraction checkpoints; everything else identical)."""
    e = edges.select("u", "v").localCheckpoint(eager=True)
    labels = (
        _directed(e)
        .groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select(F.col("u").alias("node"), F.least("u", "_mn").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    lu = labels.select(F.col("node").alias("u"), F.col("lbl").alias("lu")).hint("shuffle_hash")
    lv = labels.select(F.col("node").alias("v"), F.col("lbl").alias("lv")).hint("shuffle_hash")
    e = (
        e.join(lu, "u").join(lv, "v")
        .select(F.least("lu", "lv").alias("u"), F.greatest("lu", "lv").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _star(d: DataFrame, large: bool) -> DataFrame:
        nbrs = d if large else d.filter(F.col("v") <= F.col("u"))
        m = (
            nbrs.groupBy("u").agg(F.min("v").alias("_mn"))
            .select("u", F.least("u", "_mn").alias("m")).hint("shuffle_hash")
        )
        if large:
            moved = (
                d.filter(F.col("v") > F.col("u")).join(m, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
        else:
            moved = nbrs.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
        return _canonical_edges(
            moved.union(m.select(F.col("u"), F.col("m").alias("v"))), dedup=not large
        )

    def _probe(d: DataFrame) -> bool:
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

    converged = False
    for _ in range(max_iter):
        e = _star(_directed(e), large=True)
        e = _star(_directed(e), large=False).localCheckpoint(eager=True)
        if _probe(e):
            converged = True
            break
    assert converged
    leaves = e.select(F.col("v").alias("lbl2"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("lbl2"), F.col("u").alias("component")).distinct()
    comp2 = leaves.union(roots)
    return labels.join(comp2, labels["lbl"] == comp2["lbl2"], "left").select(
        labels["node"].alias("node"),
        F.coalesce(comp2["component"], labels["lbl"]).alias("component"),
    )


def checksum(df: DataFrame):
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64("node", "component")).alias("x")
    ).collect()[0]
    return row["n"], row["x"]


def run_old() -> None:
    assert old_cc(pairs).select("component").distinct().count() == 10_000


def run_new() -> None:
    assert (
        connected_components(pairs, canonical_input=True)
        .select("component").distinct().count() == 10_000
    )


print("checksum old:", checksum(old_cc(pairs)), flush=True)
print("checksum new:", checksum(connected_components(pairs, canonical_input=True)), flush=True)
assert checksum(old_cc(pairs)) == checksum(connected_components(pairs, canonical_input=True))

run_old(); run_new()  # warm
old_s, new_s = [], []
for i in range(6):
    t0 = time.perf_counter(); run_old(); old_s.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run_new(); new_s.append(time.perf_counter() - t0)
    print(
        f"round {i}: old={old_s[-1]:.3f} new={new_s[-1]:.3f} "
        f"load={os.getloadavg()[0]:.1f}",
        flush=True,
    )
print(f"OLD min={min(old_s):.3f} med={statistics.median(old_s):.3f}")
print(f"NEW min={min(new_s):.3f} med={statistics.median(new_s):.3f}")
