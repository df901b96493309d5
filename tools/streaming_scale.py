#!/usr/bin/env python
"""Streaming exactly-once + restart evidence at scale (ST1-ST5, X5).

The suite's streaming tests prove the semantics on hundreds of rows;
this tool proves them at millions and measures throughput.  It drives
TWO independent streaming consumers over the same growing events
directory, restarting each from its checkpoint as every chunk of files
arrives (C chunks -> C cold restarts per consumer, offsets recovered
from the checkpoint each time):

* **dedup leg** — ``dedup_events_stream`` (watermarked
  ``dropDuplicatesWithinWatermark``) -> parquet append sink.  The
  corpus carries ~5% planted exact-duplicate rows; the sink must end
  with exactly ``n`` rows (every duplicate dropped, no original lost).
* **rollup leg** — ``maintain_daily_rollup`` (foreachBatch additive
  merge with atomic version publish).  The final rollup must equal the
  from-scratch batch aggregate over the full corpus, bit-for-bit.

Both finals are verified against batch oracles computed over the same
files, so this is exactness evidence under restart, not just "it ran".

Corpus (deterministic, xxhash64-seeded — no RNG, replayable):
  event_id = id, ts = 2024-01-01T00:00:00Z + id seconds (event time is
  monotone in id, and chunks are id-ranged, so no event is ever behind
  the recovered watermark -> late-drop never fires and the dedup oracle
  is exact), value = hash-uniform in [0, 100) at cent precision,
  ~5% of ids emit one exact-duplicate row *within the same chunk*
  (inside the watermark horizon by construction).

Usage:
  python tools/streaming_scale.py [--events 5000000] [--chunks 6]

Emits one JSON line: per-chunk walls, events/sec for each leg, oracle
verdicts.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z


def _chunk_df(spark, lo: int, hi: int):
    base = (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(EPOCH_2024) + F.col("id")).alias("ts"),
            F.pmod(F.xxhash64(F.lit("user"), F.col("id")), F.lit(50)).alias("user_id"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("purchase"), F.lit("error")),
                (F.pmod(F.xxhash64(F.lit("type"), F.col("id")), F.lit(4)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(F.xxhash64(F.lit("value"), F.col("id")), F.lit(10000)) / 100.0).alias(
                "value"
            ),
        )
    )
    dups = base.filter(F.pmod(F.xxhash64(F.lit("dup"), F.col("event_id")), F.lit(20)) == 0)
    return base.unionByName(dups)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=5_000_000)
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--keep", action="store_true", help="keep the temp workdir")
    args = ap.parse_args()

    from gmail_etl_spark.session import get_spark
    from gmail_etl_spark.streaming.jobs import (
        dedup_events_stream,
        maintain_daily_rollup,
        read_daily_rollup,
        read_events_stream,
    )

    spark = get_spark("streaming-scale")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="streaming_scale_")
    src = os.path.join(work, "events")
    dedup_out = os.path.join(work, "dedup_out")
    dedup_ckpt = os.path.join(work, "dedup_ckpt")
    rollup_dir = os.path.join(work, "rollup")
    rollup_ckpt = os.path.join(work, "rollup_ckpt")
    os.makedirs(src)

    n = args.events
    bounds = [n * i // args.chunks for i in range(args.chunks + 1)]
    chunk_walls: list[dict] = []
    t_dedup = 0.0
    t_rollup = 0.0

    for i in range(args.chunks):
        lo, hi = bounds[i], bounds[i + 1]
        # new files land (id-ranged -> event time monotone across chunks)
        _chunk_df(spark, lo, hi).repartition(8).write.mode("append").parquet(src)

        # restart the dedup consumer from its checkpoint: only the new
        # files are ingested, dedup state carries over
        t0 = time.perf_counter()
        q = (
            dedup_events_stream(read_events_stream(spark, src))
            .writeStream.format("parquet")
            .option("path", dedup_out)
            .option("checkpointLocation", dedup_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        w_dedup = time.perf_counter() - t0
        t_dedup += w_dedup

        # restart the rollup maintainer the same way
        t1 = time.perf_counter()
        maintain_daily_rollup(spark, src, rollup_dir, rollup_ckpt)
        w_rollup = time.perf_counter() - t1
        t_rollup += w_rollup

        chunk_walls.append(
            {"chunk": i, "rows": hi - lo, "dedup_s": round(w_dedup, 2),
             "rollup_s": round(w_rollup, 2)}
        )
        print(f"chunk {i}: ids [{lo},{hi}) dedup {w_dedup:.1f}s "
              f"rollup {w_rollup:.1f}s", file=sys.stderr)

    # ---- batch oracles over the SAME files --------------------------------
    full = spark.read.parquet(src)
    n_raw = full.count()

    out = spark.read.parquet(dedup_out)
    n_out = out.count()
    n_out_distinct = out.select("event_id").distinct().count()
    # exactness beyond cardinality: the surviving rows' value checksum
    # must equal the batch-distinct checksum (cents are exact in bigint)
    cents = F.sum(F.round(F.col("value") * 100).cast("bigint"))
    out_cents = out.agg(cents.alias("c")).collect()[0]["c"]
    oracle_cents = (
        full.dropDuplicates(["event_id"]).agg(cents.alias("c")).collect()[0]["c"]
    )
    dedup_ok = (n_out == n) and (n_out_distinct == n) and (out_cents == oracle_cents)

    rollup_rows = {
        (r["day"].isoformat(), r["event_type"]): (r["n_events"], r["value_cents"])
        for r in read_daily_rollup(spark, rollup_dir).collect()
    }
    t2 = time.perf_counter()
    batch_rows = {
        (r["day"].isoformat(), r["event_type"]): (r["n_events"], r["value_cents"])
        for r in (
            full.groupBy(F.to_date("ts").alias("day"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
            )
            .collect()
        )
    }
    batch_agg_s = time.perf_counter() - t2
    rollup_ok = rollup_rows == batch_rows

    result = {
        "metric": "streaming_scale",
        "events": n,
        "raw_rows_with_dups": n_raw,
        "chunks": args.chunks,
        "restarts_per_consumer": args.chunks,
        "dedup_total_s": round(t_dedup, 2),
        "dedup_events_per_s": round(n_raw / t_dedup),
        "rollup_total_s": round(t_rollup, 2),
        "rollup_events_per_s": round(n_raw / t_rollup),
        "batch_rollup_oracle_s": round(batch_agg_s, 2),
        "rollup_groups": len(rollup_rows),
        "dedup_exact": dedup_ok,
        "rollup_exact": rollup_ok,
        "chunk_walls": chunk_walls,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(result))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    assert dedup_ok, (
        f"dedup leg inexact: rows={n_out} distinct={n_out_distinct} "
        f"expected={n} cents {out_cents} vs {oracle_cents}"
    )
    assert rollup_ok, "rollup leg != batch oracle"


if __name__ == "__main__":
    main()
