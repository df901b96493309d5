"""Scale evidence for operators/distributed_window.py: exact global
rank/prefix at row counts where the single-partition window form is a
measurable straggler, with checksummed row-identity between the forms.

At sf0.1 the naive form WINS (one task sorting 150k rows is trivial and
two-phase pays ~3 extra stages — measured 2-3x overhead, DEVNOTES r7).
This tool measures where the curves cross and how they diverge: the
single window is one task end-to-end regardless of cores, while the
two-phase form's wall-clock tracks corpus/cores.

Usage::

    python tools/window_scale.py [N ...]     # default 5M 20M 100M

Prints one JSON line per N:
  {"n": ..., "single_window_sec": ..., "two_phase_sec": ...,
   "speedup": ..., "checksum_match": true}

The checksum is an order-independent bit_xor of xxhash64(id, rn,
ntile100) over every row — bit-identical ranks or the run fails.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main(sizes: list[int], repeats: int = 3) -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmail_etl_spark.operators.distributed_window import (
        attach_row_number,
        ntile_from_rn,
    )
    from gmail_etl_spark.session import get_spark

    spark = get_spark("window-scale")
    spark.sparkContext.setLogLevel("ERROR")

    # codegen/JIT warm-up on a tiny frame so the first measured entry
    # doesn't bill JVM warmup to whichever form runs first
    warm = spark.range(0, 100_000, 1, 8).select(
        "id", F.xxhash64("id").alias("k")
    )
    attach_row_number(warm, ["k", "id"], out="rn").agg(
        F.bit_xor(F.xxhash64("id", "rn"))
    ).collect()
    w0 = Window.orderBy("k", "id")
    warm.select("id", F.row_number().over(w0).alias("rn")).agg(
        F.bit_xor(F.xxhash64("id", "rn"))
    ).collect()

    for n in sizes:
        # synthetic frame: unique tie-broken order key derived by hash,
        # so the global order is a full shuffle-scale problem (no
        # pre-sorted shortcut) — 32 input partitions like a real scan
        base = (
            spark.range(0, n, 1, 32)
            .select(
                F.col("id"),
                F.xxhash64(F.col("id")).alias("k"),
            )
        )

        def checksum(df) -> int:
            return df.select(
                F.xxhash64("id", "rn", "t").alias("h")
            ).agg(F.bit_xor("h")).collect()[0][0]

        # best-of-N per leg (same discipline as bench.py): a single
        # measurement at these sizes is hostage to one GC stall or
        # first-at-scale JIT recompile — observed 3-25x outliers on
        # otherwise identical runs — and the MINIMUM is the
        # steady-state estimator that projects to a long-lived cluster
        def best_of(make_df) -> tuple[float, int]:
            best, chk = float("inf"), None
            for _ in range(repeats):
                t0 = time.perf_counter()
                c = checksum(make_df())
                best = min(best, time.perf_counter() - t0)
                assert chk is None or chk == c, "nondeterministic checksum"
                chk = c
            return best, c

        # two-phase distributed form
        def _two():
            two = attach_row_number(
                base, ["k", "id"], out="rn", total_out="nn"
            )
            return two.select(
                "id",
                "rn",
                ntile_from_rn(F.col("rn"), F.col("nn"), 100).alias("t"),
            )

        two_sec, c_two = best_of(_two)

        # naive single-partition window (the form the catalog banned)
        def _one():
            w = Window.orderBy("k", "id")
            return base.select(
                "id",
                F.row_number().over(w).cast("long").alias("rn"),
                F.ntile(100).over(w).alias("t"),
            )

        one_sec, c_one = best_of(_one)

        out = {
            "n": n,
            "single_window_sec": round(one_sec, 2),
            "two_phase_sec": round(two_sec, 2),
            "speedup": round(one_sec / two_sec, 2),
            "checksum_match": c_one == c_two,
            "repeats": repeats,
            "loadavg1": round(os.getloadavg()[0], 2),
        }
        print(json.dumps(out), flush=True)
        assert c_one == c_two, f"rank mismatch at n={n}"

    spark.stop()


if __name__ == "__main__":
    repeats = int(os.environ.get("WINDOW_SCALE_REPEATS", "3"))
    main(
        [int(a) for a in sys.argv[1:]] or [5_000_000, 20_000_000, 100_000_000],
        repeats=repeats,
    )
