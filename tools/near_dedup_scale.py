"""Near-dedup scaling series: planted-group corpus at N docs, time
minhash_lsh_pairs (+capped expansion + verify) -> connected_components
end-to-end and report cluster count vs planted.

Mirrors bench.py's 100k generator (groups of ``group`` near-identical
docs) at arbitrary N, so the per-decade scaling shape (100k -> 1M ->
10M) stays comparable round over round.  Default parameters are the
bench's legacy 16-hash/8-band constants; pass --target-recall to use
the S-curve preset instead.

Usage:
    PYTHONPATH=. python tools/near_dedup_scale.py --n 1000000 \
        [--partitions 64] [--target-recall 0.99]
"""

from __future__ import annotations

import argparse
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--group", type=int, default=10)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--target-recall", type=float, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gmail_etl_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from gmail_etl_spark.session import get_spark
    from gmail_etl_spark.synthetic import planted_near_dup_corpus

    spark = get_spark("near-dedup-scale")
    spark.sparkContext.setLogLevel("ERROR")
    n, group = args.n, args.group
    docs = planted_near_dup_corpus(
        spark, n, group=group, partitions=args.partitions
    )
    kwargs = {"k": 3, "threshold": 0.5}
    if args.target_recall is not None:
        kwargs["target_recall"] = args.target_recall
    else:
        kwargs.update(n_hashes=16, bands=8)
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", **kwargs)
    comp = connected_components(
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")),
        canonical_input=True,
    )
    n_clusters = comp.select("component").distinct().count()
    secs = time.perf_counter() - t0
    print(
        f"n={n} partitions={args.partitions} params={kwargs} "
        f"clusters={n_clusters} planted={n // group} secs={secs:.1f} "
        f"loadavg={os.getloadavg()}"
    )


if __name__ == "__main__":
    main()
