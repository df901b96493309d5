"""Stage-by-stage timing of the bench near-dedup path at 100k docs:
signatures, band buckets, capped expansion (pre-verify candidates),
verified pairs, and CC — each stage timed by counting its output with
everything upstream already computed in the same plan (so stage N's
figure includes upstream recompute; deltas between successive figures
approximate per-stage cost under Spark's lazy evaluation).

Usage: PYTHONPATH=. python tools/profile_neardedup.py [--repeats 3]
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gmail_etl_spark.operators.dedup import (
        capped_pair_candidates,
        connected_components,
        minhash_lsh_pairs,
        minhash_signature,
        shingles,
    )
    from gmail_etl_spark.session import get_spark

    spark = get_spark("profile-neardedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.range(100_000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(29)),
                    lambda j: F.when(
                        j == F.pmod(F.col("id"), F.lit(10)).cast("int"),
                        F.conv(F.hex(F.abs(F.xxhash64(F.col("id"), j))), 16, 36),
                    ).otherwise(
                        F.conv(
                            F.hex(F.abs(F.xxhash64(F.floor(F.col("id") / 10), j))), 16, 36
                        )
                    ),
                ),
            ).alias("text"),
        )
        .repartition(32)
        .cache()
    )
    docs.count()

    n_hashes, bands = 16, 8
    rows_per_band = n_hashes // bands

    def sigs_df():
        return (
            docs.select(F.col("doc_id").alias("id"), shingles(F.col("text"), 3).alias("shingles"))
            .withColumn("sig", minhash_signature(F.col("shingles"), n_hashes))
            .withColumn(
                "hsh", F.expr("array_distinct(transform(shingles, s -> xxhash64(s)))")
            )
        )

    def banded_df():
        return sigs_df().select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.xxhash64(
                            F.lit(b),
                            *[
                                F.col("sig")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ],
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bucket"),
        )

    def buckets_df():
        return (
            banded_df()
            .groupBy("bucket")
            .agg(F.collect_list("id").alias("ids"))
            .filter(F.size("ids") > 1)
            .select(F.lit(0).alias("band"), "bucket", "ids")
        )

    def candidates_df():
        return capped_pair_candidates(buckets_df(), 512)

    def pairs_df():
        return minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, n_hashes=16, bands=8, threshold=0.5,
            broadcast_verify=True,
        )

    def cc_df():
        return connected_components(
            pairs_df().select(F.col("a_id").alias("u"), F.col("b_id").alias("v")),
            canonical_input=True,
        )

    stages = {
        "1_sigs": lambda: sigs_df().count(),
        "2_buckets": lambda: buckets_df().count(),
        "3_candidates": lambda: candidates_df().count(),
        "4_verified_pairs": lambda: pairs_df().count(),
        "5_cc_readout": lambda: cc_df().select("component").distinct().count(),
    }
    for name, fn in stages.items():
        fn()  # warm
        best = float("inf")
        n = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            n = fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.3f}s  rows={n}", flush=True)


if __name__ == "__main__":
    main()
