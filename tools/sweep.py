"""Driver-faithful correctness sweep: run every oracled catalog query on
Spark AND DuckDB, canonicalize both results through pandas the way the
driver harness does, and compare row count, schema, and a value hash.

Crucially this comparison is *dtype-sensitive*: DuckDB's SUM(int) yields
HUGEINT, which pandas renders as float64 (``10.0``), while Spark emits
int64 (``10``) — the repo's float-tolerant pytest oracle treats those as
equal but the driver's hash does not.  This tool reproduces the strict
semantics so regressions are caught locally before a driver round.

Usage:
    python tools/sweep.py [--sf DIR] [--json OUT] [query ...]

``--json OUT`` additionally writes a per-query artifact
(name → {status, rows, secs, hash}) so a whole-catalog local sweep is
committable evidence, not just a terminal scroll.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v):
    """Dtype-tagged canonical form: int and float never collide."""
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{int(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        return f"f:{round(float(v), 6):.6f}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return f"t:{pd.Timestamp(v).isoformat()}"
    if isinstance(v, (datetime.date,)):
        return f"d:{v.isoformat()}"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    return f"s:{v}"


def canon(df) -> tuple[list[str], str, int]:
    """(sorted columns, value hash, row count) for a pandas DataFrame."""
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8"))
        h.update(b"\x1e")
    return cols, h.hexdigest(), len(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", default=None, help="write per-query results JSON")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import duckdb

    # smoke-tier knobs (BEFORE the catalog import — q259's oracle is
    # generated at module-import time from the batch tuple):
    # * q255 state sizing (VERDICT r8 #8): the stream-stream join's
    #   fixed state-store setup (2 stores per shuffle partition,
    #   cores-scaled) dominates its sf0.001 wall-clock; cap it there.
    #   Physical knob only — the result is partition-invariant.
    # * q259 batch count (VERDICT r9 #3): each cold availableNow
    #   micro-batch pays a fixed LSH+CC+publish overhead; 2 batches at
    #   the smoke tier still exercise the cross-batch history probe,
    #   and the oracle regenerates from the same tuple so the hash gate
    #   is unweakened in kind.  The sf0.01 driver-gate tier keeps the
    #   3-batch production shape.
    import os

    if args.sf.rstrip("/").endswith("sf0.001"):
        os.environ.setdefault("SPARK_GRAFT_Q255_STATE_PARTITIONS", "4")
        os.environ.setdefault("SPARK_GRAFT_Q259_BATCHES", "2")
        # q75/q110 k-means: 2 Lloyd iterations instead of 3 (plan and
        # oracle regenerate together; cross-engine hash gate unweakened)
        os.environ.setdefault("SPARK_GRAFT_Q75_ITERS", "2")

    from gmail_etl_spark.plans.catalog import CATALOG, _ensure_loaded
    from gmail_etl_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.queries or sorted(CATALOG)
    failed = []
    results: dict[str, dict] = {}
    for name in names:
        cq = CATALOG[name]
        t0 = time.time()
        try:
            spdf = cq.builder(spark, args.sf).toPandas()
        except Exception as e:
            failed.append(name)
            results[name] = {"status": "spark_error", "error": str(e)[:200]}
            print(f"FAIL {name}: spark error {e}")
            continue
        if cq.oracle is None:
            results[name] = {
                "status": "rows_only",
                "spark_rows": len(spdf),
                "secs": round(time.time() - t0, 2),
            }
            print(f"ok   {name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            dkdf = con.execute(cq.oracle).df()
        except Exception as e:
            failed.append(name)
            results[name] = {"status": "oracle_error", "error": str(e)[:200]}
            print(f"FAIL {name}: oracle error {e}")
            continue
        scols, shash, srows = canon(spdf)
        dcols, dhash, drows = canon(dkdf)
        ok = scols == dcols and shash == dhash and srows == drows
        results[name] = {
            "status": "match" if ok else "MISMATCH",
            "spark_rows": srows,
            "oracle_rows": drows,
            "value_hash": shash if ok else f"{shash[:16]}!={dhash[:16]}",
            "secs": round(time.time() - t0, 2),
        }
        status = "ok  " if ok else "FAIL"
        detail = ""
        if not ok:
            failed.append(name)
            if scols != dcols:
                detail = f" cols {scols} vs {dcols}"
            elif srows != drows:
                detail = f" rows {srows} vs {drows}"
            else:
                detail = " value-hash mismatch"
        print(f"{status} {name}: {srows} rows, {time.time()-t0:.1f}s{detail}")

    print(f"\n{len(names) - len(failed)}/{len(names)} green")
    if failed:
        print("failed:", " ".join(failed))
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(
                {"sf_dir": args.sf, "n_queries": len(names),
                 "n_green": len(names) - len(failed), "queries": results},
                f, indent=1, sort_keys=True,
            )
        print(f"wrote {args.json}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
