#!/usr/bin/env python
"""Skew-mitigation A/B at scale (SURVEY §2.8 X6, operators/skew.py).

q179's skew audit and the posture tests pin the *plan* shape; this tool
measures the *runtime* story on a planted hot key, with all variants
verified row-count- and checksum-identical:

  fact: N rows (default 20M); ~25% of rows share key 0 (the hot key),
        the rest hash-uniform over 100k keys.  dim: 100k keys.
  The dim would normally broadcast (that IS the first-line fix); the
  tool disables auto-broadcast to isolate shuffle-join skew — the
  regime a 100 TB fact x 100 GB dim join actually lives in.

Variants:
  * sortmerge+AQE-skew   — Spark's runtime skew-split (the default we
                           ship in session.py)
  * sortmerge, skew OFF  — the naive plan: one straggler reducer owns
                           the hot key
  * salted_join, skew OFF — explicit (key, salt) scatter from
                           operators/skew.py: works even where AQE
                           can't see the skew (e.g. under a stateful
                           op boundary or a non-AQE engine)
Plus the aggregation leg: direct groupBy-sum vs two_phase_agg on the
same skewed key (expected ~equal thanks to partial aggregation — the
honest result; the explicit form exists for non-algebraic state).

Usage: python tools/skew_scale.py [--rows 20000000] [--repeats 3]
Emits one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_KEYS = 100_000


def _time_best(fn, repeats: int) -> float:
    fn()  # warm (codegen + exchange reuse primed the same way for all)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from gmail_etl_spark.operators.skew import salted_join, two_phase_agg
    from gmail_etl_spark.session import get_spark

    spark = get_spark("skew-scale")
    spark.sparkContext.setLogLevel("ERROR")

    fact = (
        spark.range(args.rows)
        .select(
            F.col("id"),
            F.when(F.pmod(F.xxhash64(F.lit("hot"), F.col("id")), F.lit(4)) == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64(F.lit("key"), F.col("id")), F.lit(N_KEYS)))
            .alias("k"),
            (F.pmod(F.xxhash64(F.lit("v"), F.col("id")), F.lit(1000)) / 10.0).alias("v"),
        )
        .repartition(32)
        .cache()
    )
    fact.count()
    dim = (
        spark.range(N_KEYS)
        .select(
            F.col("id").alias("k"),
            # bounded attr so the 64-bit checksum sum cannot overflow
            F.pmod(F.xxhash64(F.lit("attr"), F.col("id")), F.lit(1_000_003)).alias("attr"),
        )
        .cache()
    )
    dim.count()

    checksum = F.sum(F.round(F.col("v") * 10).cast("bigint") + F.col("attr")).alias("c")
    expected = None

    def run_join(df) -> None:
        nonlocal expected
        row = df.agg(F.count(F.lit(1)).alias("n"), checksum).collect()[0]
        got = (row["n"], row["c"])
        if expected is None:
            expected = got
        assert got == expected, f"variant diverged: {got} vs {expected}"

    conf = spark.conf
    results: dict[str, float] = {}
    # isolate shuffle-join skew: dim must not broadcast on its own
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        # scale AQE's skew gate to this corpus: the hot partition here is
        # ~120 MB, under the 256 MB default threshold that a real
        # cluster's partitions would clear — without this the "skew on"
        # and "skew off" variants compile to the same unsplit plan
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        results["sortmerge_aqe_skew"] = _time_best(
            lambda: run_join(fact.join(dim, "k")), args.repeats
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
        conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        results["sortmerge_skew_off"] = _time_best(
            lambda: run_join(fact.join(dim, "k")), args.repeats
        )
        results["salted32_skew_off"] = _time_best(
            lambda: run_join(salted_join(fact, dim, "k", salt_from="id", n=32)),
            args.repeats,
        )
    finally:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.unset("spark.sql.autoBroadcastJoinThreshold")
        conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    # aggregation leg (broadcast settings irrelevant: no join).  The
    # direct variant sums doubles (order-dependent in the last ulps);
    # two_phase_agg sums exactly in decimal — so n/r compare exactly
    # and the value checksum within float tolerance.
    agg_expected = None

    def run_agg(df) -> None:
        nonlocal agg_expected
        row = (
            df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("sum_value").alias("c"),
                F.sum("n_rows").alias("r"),
            ).collect()
        )[0]
        got = (row["n"], row["c"], row["r"])
        if agg_expected is None:
            agg_expected = got
        assert got[0] == agg_expected[0] and got[2] == agg_expected[2], (
            f"agg diverged: {got} vs {agg_expected}"
        )
        assert abs(got[1] - agg_expected[1]) <= 1e-6 * abs(agg_expected[1]), (
            f"agg checksum diverged: {got[1]} vs {agg_expected[1]}"
        )

    direct = (
        fact.groupBy("k")
        .agg(F.sum("v").alias("sum_value"), F.count(F.lit(1)).alias("n_rows"))
    )
    results["agg_direct"] = _time_best(lambda: run_agg(direct), args.repeats)
    results["agg_two_phase"] = _time_best(
        lambda: run_agg(two_phase_agg(fact, "k", "v", salt_from="id", n=32)),
        args.repeats,
    )

    print(
        json.dumps(
            {
                "metric": "skew_scale",
                "rows": args.rows,
                "hot_key_share": 0.25,
                "n_keys": N_KEYS,
                "seconds": results,
                "join_rows_and_checksum": list(expected),
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "repeats": args.repeats,
            }
        )
    )


if __name__ == "__main__":
    main()
