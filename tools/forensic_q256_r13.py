"""r13 forensic: decompose q256_persisted_ivf_topk's sweep-tail wall
(13.26 s in LOCAL_SWEEP_r12opt_sf001) into its lifecycle phases, in a
fresh process at the sweep's scale, so the tail row carries its own
explanation (VERDICT r12 item 5).

Phases measured (each a separate wall):
  session    — SparkSession construction (JVM spin-up)
  load       — embeddings table read + count
  train      — train_kmeans alone (the quantizer save_ivf_index runs)
  save       — save_ivf_index end-to-end (train + partitioned write +
               centroid sidecar); save-train ~= write cost
  query      — query_ivf_index cold-reopen + probe + rank + collect
  oracle     — the DuckDB brute-force oracle the sweep also pays
  canon      — pandas canonicalization + hash (sweep bookkeeping)

Usage: PYTHONPATH=. python tools/forensic_q256_r13.py
       [--sf /root/testdata/sf0.001] [--out FORENSIC_r13_q256.json]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="FORENSIC_r13_q256.json")
    args = ap.parse_args()

    walls: dict[str, float] = {}

    def timed(name: str):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                walls[name] = round(time.perf_counter() - self.t0, 3)

        return _T()

    with timed("session"):
        from gmail_etl_spark.session import get_spark

        spark = get_spark("forensic-q256")
        spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    from pyspark.sql import functions as F

    from gmail_etl_spark.operators.similarity import (
        query_ivf_index,
        save_ivf_index,
        train_kmeans,
    )
    from gmail_etl_spark.plans.catalog import load_table

    with timed("load"):
        emb = load_table(spark, args.sf, "embeddings")
        n = emb.count()

    with timed("train"):
        train_kmeans(emb, "vec_id", "embedding", k=8, iters=3)[0].count()

    path = tempfile.mkdtemp(prefix="forensic_q256_")
    with timed("save"):
        save_ivf_index(spark, emb, path, k_cells=8, iters=3)

    with timed("query"):
        queries = emb.filter(F.col("vec_id") < 8)
        rows = (
            query_ivf_index(spark, path, queries, k=5, nprobe=8)
            .orderBy("query_id", "rank")
            .collect()
        )

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{args.sf}/embeddings.parquet')"
    )
    from gmail_etl_spark.plans.catalog import CATALOG, _ensure_loaded

    _ensure_loaded()
    sql = CATALOG["q256_persisted_ivf_topk"].oracle
    with timed("oracle"):
        orows = con.execute(sql).fetchall()

    with timed("canon"):
        import hashlib

        blob = repr(sorted(map(tuple, (tuple(r) for r in rows)))).encode()
        hashlib.sha256(blob).hexdigest()

    out = {
        "sf": args.sf,
        "n_embeddings": n,
        "spark_rows": len(rows),
        "oracle_rows": len(orows),
        "walls_sec": walls,
        "spark_total": round(
            walls["load"] + walls["save"] + walls["query"], 3
        ),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "note": (
            "q256's sweep tail is lifecycle, not a plan defect: the "
            "entry trains a k-means quantizer (3 Lloyd iterations, each "
            "an aggregation job), writes the corpus as a partitioned "
            "table plus sidecar, cold-reopens it, and probes all 8 "
            "cells (exhaustive by construction so the DuckDB brute-force "
            "oracle matches).  The sweep row additionally pays the "
            "oracle and canonicalization."
        ),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["walls_sec"]))
    print("->", args.out)


if __name__ == "__main__":
    main()
