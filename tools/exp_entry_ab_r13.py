"""r13: interleaved same-process A/B of the FULL near-dedup bench entry.

OLD = r12 formulations reproduced inline: (a) the verify stage whose
jaccard expression is cloned into the join condition and the output
projection (up to 4 array_intersect evaluations per pair), (b) eager
per-round CC checkpoints (a materialize job plus a probe job per star
round).  The signature/bucket/candidate stages and the pre-contraction
are the CURRENT operators for both sides — they did not change this
round — so the A/B isolates exactly this round's two entry-affecting
changes.  NEW = the shipped operators (minhash_lsh_pairs +
connected_components).

Repeats alternate OLD/NEW so host-load drift cannot bias either side;
per-round loadavg recorded.
"""

from __future__ import annotations

import os
import statistics
import time

from pyspark.sql import DataFrame, functions as F

from gmail_etl_spark.operators.dedup import (
    _canonical_edges,
    _directed,
    _lsh_buckets,
    _lsh_sigs,
    capped_pair_candidates,
    connected_components,
    minhash_lsh_pairs,
)
from gmail_etl_spark.session import get_spark
from gmail_etl_spark.synthetic import planted_near_dup_corpus

spark = get_spark("exp-entry-ab-r13")
spark.sparkContext.setLogLevel("ERROR")
docs = planted_near_dup_corpus(spark, 100_000).cache()
docs.count()


# ---- OLD formulations (r12) -------------------------------------------------


def old_pairs() -> DataFrame:
    sigs = (
        _lsh_sigs(docs, "doc_id", "text", 3, 16)
        .select("id", "sig", "hsh")
        .localCheckpoint(eager=True)
    )
    buckets = _lsh_buckets(sigs, 16, 8)
    candidates = capped_pair_candidates(buckets, 512)
    sh = F.broadcast(sigs.select("id", "hsh"))
    c = (
        candidates.join(sh.select(F.col("id").alias("a_id"), F.col("hsh").alias("a_sh")), "a_id")
        .join(sh.select(F.col("id").alias("b_id"), F.col("hsh").alias("b_sh")), "b_id")
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size("a_sh") + F.size("b_sh") - inter
    return (
        c.select(
            "a_id", "b_id",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


def old_cc(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    e = edges.select("u", "v").localCheckpoint(eager=True)
    labels = (
        _directed(e).groupBy("u").agg(F.min("v").alias("_mn"))
        .select(F.col("u").alias("node"), F.least("u", "_mn").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    lu = labels.select(F.col("node").alias("u"), F.col("lbl").alias("lu")).hint("shuffle_hash")
    lv = labels.select(F.col("node").alias("v"), F.col("lbl").alias("lv")).hint("shuffle_hash")
    e = (
        e.join(lu, "u").join(lv, "v")
        .select(F.least("lu", "lv").alias("u"), F.greatest("lu", "lv").alias("v"))
        .filter(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)
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

    for _ in range(max_iter):
        e = _star(_directed(e), large=True)
        e = _star(_directed(e), large=False).localCheckpoint(eager=True)
        if _probe(e):
            break
    leaves = e.select(F.col("v").alias("lbl2"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("lbl2"), F.col("u").alias("component")).distinct()
    comp2 = leaves.union(roots)
    return labels.join(comp2, labels["lbl"] == comp2["lbl2"], "left").select(
        labels["node"].alias("node"),
        F.coalesce(comp2["component"], labels["lbl"]).alias("component"),
    )


def run_old() -> None:
    comp = old_cc(old_pairs().select(F.col("a_id").alias("u"), F.col("b_id").alias("v")))
    assert comp.select("component").distinct().count() == 10_000


def run_new() -> None:
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, n_hashes=16, bands=8, threshold=0.5,
        broadcast_verify=True,
    )
    comp = connected_components(
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")),
        canonical_input=True,
    )
    assert comp.select("component").distinct().count() == 10_000


run_old(); run_new()  # warm
old_s, new_s = [], []
for i in range(7):
    t0 = time.perf_counter(); run_old(); old_s.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run_new(); new_s.append(time.perf_counter() - t0)
    print(
        f"round {i}: old={old_s[-1]:.3f} new={new_s[-1]:.3f} "
        f"load={os.getloadavg()[0]:.1f}",
        flush=True,
    )
print(f"OLD min={min(old_s):.3f} med={statistics.median(old_s):.3f}")
print(f"NEW min={min(new_s):.3f} med={statistics.median(new_s):.3f}")
