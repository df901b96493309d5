"""r12: interleaved same-process A/B of the full near-dedup bench entry.

OLD = r11 formulation (inlined per-permutation base hash, mid-round CC
distinct) reproduced inline; NEW = the current operators.  Repeats
alternate OLD/NEW so host-load drift cannot bias either side.
"""

from __future__ import annotations

import os
import statistics
import time

from pyspark.sql import Column, DataFrame, functions as F

from gmail_etl_spark.operators.dedup import (
    _MH_P,
    _lsh_buckets,
    _mh_ab,
    _pairs_from_sigs,
    capped_pair_candidates,
    connected_components,
    minhash_lsh_pairs,
    shingles,
)
from gmail_etl_spark.session import get_spark
from gmail_etl_spark.synthetic import planted_near_dup_corpus

spark = get_spark("exp-entry-ab")
spark.sparkContext.setLogLevel("ERROR")
docs = planted_near_dup_corpus(spark, 100_000).cache()
docs.count()


# ---- OLD formulation (r11) --------------------------------------------------

def _old_minhash_signature(sh: Column, n_hashes: int) -> Column:
    base = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MH_P)))
    cols = []
    for i in range(n_hashes):
        a, b = _mh_ab(i)
        cols.append(
            F.array_min(
                F.transform(base, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MH_P)))
            )
        )
    return F.array(*cols)


def _old_lsh_sigs(df: DataFrame, n_hashes: int) -> DataFrame:
    return (
        df.select(F.col("doc_id").alias("id"), shingles(F.col("text"), 3).alias("shingles"))
        .withColumn("sig", _old_minhash_signature(F.col("shingles"), n_hashes))
        .withColumn("hsh", F.expr("array_distinct(transform(shingles, s -> xxhash64(s)))"))
    )


def _old_canon(e: DataFrame) -> DataFrame:
    return (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _old_cc(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    e = edges.select("u", "v").localCheckpoint(eager=True)

    def _directed(d):
        return d.union(d.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def _star(d, large):
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
        return _old_canon(moved.union(m.select(F.col("u"), F.col("m").alias("v"))))

    def _probe(d) -> bool:
        roles = d.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("node"), F.lit(1).alias("root"), F.lit(0).alias("leaf")),
                    F.struct(F.col("v").alias("node"), F.lit(0).alias("root"), F.lit(1).alias("leaf")),
                )
            ).alias("r")
        ).select("r.*")
        per_node = roles.groupBy("node").agg(F.max("root").alias("is_root"), F.sum("leaf").alias("leaf_deg"))
        return per_node.filter(
            (F.col("leaf_deg") > 1) | ((F.col("is_root") == 1) & (F.col("leaf_deg") > 0))
        ).isEmpty()

    for _ in range(max_iter):
        e = _star(_directed(e), True)
        e = _star(_directed(e), False).localCheckpoint(eager=True)
        if _probe(e):
            break
    leaves = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("component")).distinct()
    return leaves.union(roots)


def run_old() -> None:
    sigs = _old_lsh_sigs(docs, 16)
    pairs = _pairs_from_sigs(sigs, 16, 8, 0.5, 512, True)
    comp = _old_cc(pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")))
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


run_old(); run_new()  # warm both
old_s, new_s = [], []
for i in range(6):
    t0 = time.perf_counter(); run_old(); old_s.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run_new(); new_s.append(time.perf_counter() - t0)
    print(f"round {i}: old={old_s[-1]:.3f} new={new_s[-1]:.3f} load={os.getloadavg()[0]:.1f}", flush=True)
print(f"OLD min={min(old_s):.3f} med={statistics.median(old_s):.3f}")
print(f"NEW min={min(new_s):.3f} med={statistics.median(new_s):.3f}")
