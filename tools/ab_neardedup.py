"""Isolated timing for the bench near-dedup entry: same corpus/params
as bench.py, prints per-repeat seconds + min/median so two working-tree
states can be A/B'd without paying for the full bench.

Usage: PYTHONPATH=. python tools/ab_neardedup.py [--repeats 7]
"""

from __future__ import annotations

import argparse
import os
import statistics
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=7)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gmail_etl_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from gmail_etl_spark.session import get_spark
    from gmail_etl_spark.synthetic import planted_near_dup_corpus

    spark = get_spark("ab-neardedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = planted_near_dup_corpus(spark, 100_000).cache()
    docs.count()

    def run() -> None:
        pairs = minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, n_hashes=16, bands=8, threshold=0.5,
            broadcast_verify=True,
        )
        comp = connected_components(
            pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")),
            canonical_input=True,
        )
        n_clusters = comp.select("component").distinct().count()
        assert n_clusters == 10_000, n_clusters

    run()  # warm
    samples = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        run()
        s = time.perf_counter() - t0
        samples.append(s)
        print(f"repeat {i}: {s:.3f}s  loadavg={os.getloadavg()[0]:.1f}", flush=True)
    print(
        f"min={min(samples):.3f} median={statistics.median(samples):.3f} "
        f"loadavg={[round(x, 2) for x in os.getloadavg()]}"
    )


if __name__ == "__main__":
    main()
