"""Reproducer + fix evidence for the round-8 distributed-window
corruption find (PID_CONSISTENCY_r08.json).

The round-7 two-phase global window computed ``spark_partition_id()``
independently in its local and carry branches.  Because (a)
``RangePartitioner`` seeds its boundary sampler with the RDD id — two
materializations of the "same" range exchange sample different
boundaries — and (b) exchange reuse is not guaranteed between the
branches (DeduplicateRelations re-aliases one; AQE materializes sibling
stages concurrently, so both can miss the stage cache), the branches
could disagree on the row→pid mapping.  The r7 INNER join then silently
dropped or mis-carried rows: nondeterministic wrong global ranks.

This tool replicates the r7 form inline and runs it N times at the
configuration that exposed the bug (5M rows, 4 cores, shuffle=8, cached
input), then runs the fixed operator (localCheckpoint barrier +
runtime reconciliation guard) N times — emitting one JSON line with
every checksum so the nondeterminism, and the fix, are committed
evidence rather than a session anecdote.

Usage: SPARK_GRAFT_CPUS=4 SPARK_GRAFT_SHUFFLE=8 \
           python tools/pid_forensic.py [--rows 5000000] [--runs 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmail_etl_spark.operators.distributed_window import (
        _LOC,
        _OFF,
        _CNT,
        PID,
        _order_cols,
        attach_row_number,
    )
    from gmail_etl_spark.session import get_spark

    spark = get_spark("pid-forensic")
    spark.sparkContext.setLogLevel("ERROR")

    def r7_attach_row_number(df, order_by, out="rn"):
        """The round-7 shape, replicated verbatim: AQE-sized range
        exchange, per-branch spark_partition_id, bare INNER join."""
        ranged = df.repartitionByRange(*_order_cols(order_by)).withColumn(
            PID, F.spark_partition_id()
        )
        w_local = Window.partitionBy(PID).orderBy(*_order_cols(order_by))
        local = ranged.withColumn(_LOC, F.row_number().over(w_local))
        counts = ranged.groupBy(PID).agg(F.count(F.lit(1)).alias(_CNT))
        w_off = Window.orderBy(PID).rowsBetween(Window.unboundedPreceding, -1)
        offsets = counts.select(
            PID, F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF)
        )
        joined = local.join(F.broadcast(offsets), PID)
        return joined.withColumn(
            out, (F.col(_LOC) + F.col(_OFF)).cast("long")
        ).drop(PID, _LOC, _OFF, _CNT)

    df = (
        spark.range(args.rows)
        .select(
            (F.xxhash64("id") % 1_000_003).alias("k"),
            F.col("id").alias("tie"),
        )
        .repartition(32)
        .cache()
    )
    df.count()

    def chk(out) -> tuple[int, int]:
        r = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("k", "tie", "rn")).alias("x"),
        ).collect()[0]
        return (r["n"], r["x"])

    w = Window.orderBy("k", "tie")
    # cast: row_number() is int, both two-phase forms emit long, and
    # xxhash64 is type-sensitive
    truth = chk(df.withColumn("rn", F.row_number().over(w).cast("long")))

    r7_checksums, fixed_checksums, guard_fired = [], [], 0
    for _ in range(args.runs):
        try:
            r7_checksums.append(chk(r7_attach_row_number(df, ["k", "tie"])))
        except Exception:  # noqa: BLE001 — divergence may also crash the join
            r7_checksums.append(("exception", None))
    for _ in range(args.runs):
        try:
            fixed_checksums.append(
                chk(attach_row_number(df, ["k", "tie"], out="rn"))
            )
        except Exception as e:  # the runtime guard raising counts as LOUD
            guard_fired += 1
            fixed_checksums.append(("guard_raised", str(e)[:80]))

    out = {
        "metric": "pid_consistency_forensic",
        "rows": args.rows,
        "runs": args.runs,
        "cpus": os.environ["SPARK_GRAFT_CPUS"],
        "truth_checksum": list(truth),
        "r7_form_checksums": [list(c) for c in r7_checksums],
        "r7_form_distinct": len({tuple(c) for c in r7_checksums}),
        "r7_form_all_correct": all(c == truth for c in r7_checksums),
        "fixed_form_checksums": [list(c) for c in fixed_checksums],
        "fixed_form_all_correct": all(c == truth for c in fixed_checksums),
        "fixed_form_guard_raised": guard_fired,
        "loadavg1": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
