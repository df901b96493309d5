"""Stage-by-stage timing of the bench near-dedup path at 100k docs:
signatures, band buckets, capped expansion (pre-verify candidates),
verified pairs, and CC — each stage timed by counting its output with
everything upstream recomputed in the same plan (so stage N's figure
includes upstream recompute; deltas between successive figures
approximate per-stage cost under Spark's lazy evaluation).

Imports the operator's OWN stage builders (``_lsh_sigs``,
``_lsh_buckets``, ``capped_pair_candidates``) and the shared planted
corpus, so the profile can never desync from what
``minhash_lsh_pairs`` actually runs.

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
        _lsh_buckets,
        _lsh_sigs,
        capped_pair_candidates,
        connected_components,
        minhash_lsh_pairs,
    )
    from gmail_etl_spark.session import get_spark
    from gmail_etl_spark.synthetic import planted_near_dup_corpus

    spark = get_spark("profile-neardedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = planted_near_dup_corpus(spark, 100_000).cache()
    docs.count()

    n_hashes, bands = 16, 8

    def sigs_df():
        return _lsh_sigs(docs, "doc_id", "text", 3, n_hashes)

    def buckets_df():
        return _lsh_buckets(sigs_df(), n_hashes, bands)

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
