"""Connected-components convergence stress on adversarial shapes at
scale: disjoint PATH graphs (the worst case for round count — cliques
collapse in ~1 round, paths need ~log n alternations) and a random
binary forest.  Verifies exact labels arithmetically: node i of a
length-L path belongs to component floor(i / L) * L.

Usage:
    PYTHONPATH=. python tools/cc_chain_scale.py --nodes 1000000 \
        [--path-len 100000] [--shape path|forest]
"""

from __future__ import annotations

import argparse
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--path-len", type=int, default=100_000)
    ap.add_argument("--shape", choices=["path", "forest"], default="path")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gmail_etl_spark.operators.dedup import connected_components
    from gmail_etl_spark.session import get_spark

    spark = get_spark("cc-chain-scale")
    spark.sparkContext.setLogLevel("ERROR")
    n, plen = args.nodes, args.path_len

    if args.shape == "path":
        # disjoint paths i -> i+1 within each block of plen nodes
        edges = (
            spark.range(n - 1)
            .filter(F.pmod(F.col("id") + 1, F.lit(plen)) != 0)
            .select(F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
        )
        expected = F.floor(F.col("node") / plen) * plen
        n_expected = (n + plen - 1) // plen
    else:
        # random binary forest: each node i>0 attaches to a pseudo-random
        # parent in its block, biased toward long dependency chains
        parent = (
            F.floor(F.col("id") / plen) * plen
            + F.pmod(F.abs(F.xxhash64(F.col("id"))), F.pmod(F.col("id"), F.lit(plen)))
        )
        edges = (
            spark.range(n)
            .filter(F.pmod(F.col("id"), F.lit(plen)) != 0)
            .select(F.col("id").alias("u"), parent.alias("v"))
        )
        expected = F.floor(F.col("node") / plen) * plen
        n_expected = (n + plen - 1) // plen

    edges = edges.repartition(64)
    t0 = time.perf_counter()
    comp = connected_components(edges)
    bad = comp.filter(F.col("component") != expected).count()
    n_comp = comp.select("component").distinct().count()
    secs = time.perf_counter() - t0
    print(
        f"shape={args.shape} nodes={n} path_len={plen} "
        f"components={n_comp} expected={n_expected} mislabeled={bad} "
        f"secs={secs:.1f} loadavg={os.getloadavg()}"
    )
    assert bad == 0 and n_comp == n_expected


if __name__ == "__main__":
    main()
