#!/usr/bin/env python
"""Stream-stream join exactness + throughput at scale (the q255 surface
under PRODUCTION conditions: bounded state and checkpoint restarts).

q255 proves the join driver-hash-exact with a corpus-span watermark (no
state eviction).  This tool proves the stronger operational claim: with
a REAL watermark ("1 hour") that actively evicts join state, chunked
file arrivals, and one cold checkpoint restart per chunk, the streamed
pair set still equals the batch interval join bit-for-bit.

Why eviction cannot lose a pair here: event time is monotone in id and
chunks are id-ranged, so when a purchase at ``p_ts`` arrives the view
side's watermark is at least ``p_ts − delay`` behind; a view is evicted
only once ``watermark > v_ts + within``, and every qualifying pair has
``p_ts ≤ v_ts + within < v_ts + within + delay`` — the eviction point.
So state stays bounded at (delay + within) of views/purchases per side
(the 100 TB posture) while losing nothing — which the batch oracle then
verifies, not assumes.

Corpus: the streaming_scale.py generator (deterministic xxhash64
fields, no RNG), restricted to its view/purchase rows.

Usage:
  python tools/stream_join_scale.py [--events 2000000] [--chunks 4]

Emits one JSON line: per-chunk walls, events/sec, pair count + checksum
vs the batch oracle.
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
    """Same deterministic generator as streaming_scale.py (kept in sync
    by the shared literal seeds), minus the planted duplicates — the
    join leg exercises state, not dedup."""
    return spark.range(lo, hi).select(
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--within", default="30 minutes")
    ap.add_argument("--watermark", default="1 hour")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from gmail_etl_spark.session import get_spark
    from gmail_etl_spark.streaming.jobs import stream_stream_attribution

    spark = get_spark("stream-join-scale")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_join_scale_")
    src = f"{work}/events"
    sink = f"{work}/pairs"
    ckpt = f"{work}/ckpt"
    os.makedirs(src, exist_ok=True)

    n, chunks = args.events, args.chunks
    per = n // chunks
    walls = []
    total_t0 = time.perf_counter()
    for c in range(chunks):
        lo, hi = c * per, (c + 1) * per if c < chunks - 1 else n
        _chunk_df(spark, lo, hi).write.mode("append").parquet(src)

        # cold consumer per chunk: offsets + join state recovered from
        # the checkpoint, exactly like a restarted production job
        t0 = time.perf_counter()
        probed = spark.read.parquet(src).schema
        events = spark.readStream.schema(probed).parquet(src)
        pairs = stream_stream_attribution(
            events,
            trigger_type="view",
            outcome_type="purchase",
            within=args.within,
            watermark=args.watermark,
        ).select(
            "user_id",
            "trigger_id",
            "outcome_id",
            (F.unix_micros("outcome_ts") - F.unix_micros("trigger_ts")).alias(
                "gap_us"
            ),
        )
        q = (
            pairs.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        walls.append(round(time.perf_counter() - t0, 2))
    stream_secs = time.perf_counter() - total_t0

    got = spark.read.parquet(sink)
    got_n = got.count()
    got_sum = got.select(
        F.xxhash64("user_id", "trigger_id", "outcome_id", "gap_us").alias("h")
    ).agg(F.bit_xor("h")).collect()[0][0]

    # batch oracle over the same files
    full = spark.read.parquet(src)
    v = full.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"),
        F.col("event_id").alias("trigger_id"),
        F.col("ts").alias("v_ts"),
    )
    p = full.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("outcome_id"),
        F.col("ts").alias("p_ts"),
    )
    exp = v.join(
        p,
        (F.col("vu") == F.col("pu"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {args.within}")),
    ).select(
        F.col("vu").alias("user_id"),
        "trigger_id",
        "outcome_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("gap_us"),
    )
    exp_n = exp.count()
    exp_sum = exp.select(
        F.xxhash64("user_id", "trigger_id", "outcome_id", "gap_us").alias("h")
    ).agg(F.bit_xor("h")).collect()[0][0]

    result = {
        "events": n,
        "chunks": chunks,
        "within": args.within,
        "watermark": args.watermark,
        "chunk_walls_sec": walls,
        "stream_total_sec": round(stream_secs, 2),
        "events_per_sec": int(n / stream_secs),
        "pairs_streamed": got_n,
        "pairs_batch_oracle": exp_n,
        "checksum_match": bool(got_n == exp_n and got_sum == exp_sum),
        "loadavg1": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(result))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    assert result["checksum_match"], "stream/batch pair mismatch"
    spark.stop()


if __name__ == "__main__":
    main()
