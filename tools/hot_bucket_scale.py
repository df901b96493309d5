"""Adversarial hot-bucket gate for the LSH salted pair cap at scale.

``capped_pair_candidates`` (operators/dedup.py) makes two claims that
unit tests pin only at n=300 (tests/test_operators.py::
test_minhash_lsh_cap_end_to_end):

  1. BOUNDEDNESS — an oversized bucket expands O(B · max_bucket) pairs,
     never the O(B²) clique (the regime where one 10k-doc near-identical
     blob in a 100 TB corpus would otherwise materialize 50M structs in
     a single task);
  2. CONNECTIVITY — although each band only emits within-chunk pairs,
     the chunk partitions are independently salted per band, so a
     duplicate blob far bigger than max_bucket still resolves to ONE
     connected component through cross-band chunk overlap.

This tool plants blobs three decades above the unit test and checks
both claims exactly: ``--group 10000`` with the shared generator makes
each group 30 docs with one unique token plus 9,970 byte-identical
copies — identical signatures, so every group is one hot bucket in
every band.  The candidate count is asserted against the analytic
O(B · max_bucket) bound, and connected components over the verified
pairs must equal the planted cluster count with every doc covered.

Usage: PYTHONPATH=. python tools/hot_bucket_scale.py [--n 50000]
       [--group 10000] [--max-bucket 32] [--out HOT_BUCKET_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--group", type=int, default=10_000)
    ap.add_argument("--max-bucket", type=int, default=32)
    ap.add_argument("--n-hashes", type=int, default=16)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--out", type=str, default=None)
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

    spark = get_spark("hot-bucket-scale")
    spark.sparkContext.setLogLevel("ERROR")
    n, group, mb = args.n, args.group, args.max_bucket
    n_clusters = math.ceil(n / group)
    docs = planted_near_dup_corpus(spark, n, group=group).cache()
    docs.count()

    # -- claim 1: boundedness of the capped expansion ------------------
    t0 = time.perf_counter()
    buckets = _lsh_buckets(
        _lsh_sigs(docs, "doc_id", "text", 3, args.n_hashes), args.n_hashes,
        args.bands,
    ).cache()
    bucket_sizes = [r["s"] for r in buckets.select(F.size("ids").alias("s")).collect()]
    candidates = capped_pair_candidates(buckets, mb)
    n_cand = candidates.count()
    cand_wall = round(time.perf_counter() - t0, 2)
    # per oversized bucket: ceil(B/mb) chunks x C(mb,2) pairs, before the
    # cross-band dedup — the loose analytic form of O(B * max_bucket)
    bound = sum(
        math.ceil(b / mb) * (mb * (mb - 1) // 2) if b > mb else b * (b - 1) // 2
        for b in bucket_sizes
    )
    clique = sum(
        g * (g - 1) // 2
        for g in [group] * (n // group) + ([n % group] if n % group else [])
    ) * args.bands
    assert n_cand <= bound, (n_cand, bound)
    buckets.unpersist()
    print(
        f"[ok] candidates={n_cand} <= analytic bound {bound} "
        f"(uncapped clique would be {clique}); {cand_wall}s"
    )

    # -- claim 2: connectivity of the blob through salted chunks -------
    t1 = time.perf_counter()
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, n_hashes=args.n_hashes,
        bands=args.bands, threshold=0.5, max_bucket=mb,
    )
    comp = connected_components(
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")),
        canonical_input=True,
    ).cache()
    k_comp = comp.select("component").distinct().count()
    covered = comp.count()
    cc_wall = round(time.perf_counter() - t1, 2)
    assert k_comp == n_clusters, (k_comp, n_clusters)
    assert covered == n, (covered, n)
    print(
        f"[ok] components={k_comp} (planted {n_clusters}), docs covered="
        f"{covered}/{n}; {cc_wall}s"
    )

    result = {
        "metric": "hot_bucket_scale",
        "n_docs": n,
        "group": group,
        "max_bucket": mb,
        "n_hashes": args.n_hashes,
        "bands": args.bands,
        "hot_bucket_sizes": sorted(set(b for b in bucket_sizes if b > mb))[-3:],
        "candidates": n_cand,
        "analytic_bound": bound,
        "uncapped_clique_pairs": clique,
        "candidates_vs_clique": round(n_cand / clique, 4),
        "components": k_comp,
        "docs_covered": covered,
        "candidate_wall_s": cand_wall,
        "pairs_cc_wall_s": cc_wall,
        "all_exact": True,
        "loadavg": list(os.getloadavg()),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
