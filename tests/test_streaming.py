"""Streaming semantics tests (SURVEY §2.6): exactly-once ingest via
checkpoint (the ledger's replacement), blob archiving, and event-time
windows whose results must equal the batch catalog's q60 oracle query.
"""

from __future__ import annotations

import json
import os

import pytest

from gmail_etl_spark.sources.fixtures import fixture_messages
from gmail_etl_spark.streaming.jobs import (
    read_events_stream,
    stream_raw_to_stage1,
    windowed_event_counts,
)
from tests.conftest import SF_DIR


def test_stream_exactly_once_and_archive(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    msgs = fixture_messages()
    (raw / "b1.json").write_text(json.dumps(msgs[:6]))
    (raw / "b2.json").write_text(json.dumps(msgs[6:]))
    out = str(tmp_path / "stage1")
    ckpt = str(tmp_path / "ckpt")
    archive = str(tmp_path / "processed")

    stream_raw_to_stage1(spark, str(raw), out, ckpt, archive_dir=archive)
    first = spark.read.parquet(out)
    assert first.count() == len(msgs)

    # restart with no new files → nothing ingested (checkpoint = ledger)
    stream_raw_to_stage1(spark, str(raw), out, ckpt, archive_dir=archive)
    assert spark.read.parquet(out).count() == len(msgs)

    # new blob arrives → only its messages ingested
    extra = dict(msgs[0])
    extra = json.loads(json.dumps(extra))
    extra["id"] = "m999"
    (raw / "b3.json").write_text(json.dumps([extra]))
    stream_raw_to_stage1(spark, str(raw), out, ckpt, archive_dir=archive)
    final = spark.read.parquet(out)
    assert final.count() == len(msgs) + 1
    assert final.filter("id = 'm999'").count() == 1


def test_windowed_counts_match_batch_oracle(spark, tmp_path, duck):
    # file-source streams read directories, not single files
    events_dir = tmp_path / "events_src"
    events_dir.mkdir()
    import shutil

    shutil.copy(f"{SF_DIR}/events.parquet", events_dir / "part0.parquet")
    stream = read_events_stream(spark, str(events_dir))
    assert stream.isStreaming
    agg = windowed_event_counts(stream, "10 minutes", watermark="30 minutes")

    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("select * from win_counts").collect()
    }
    expected = {
        (r[0], r[1]): (r[2], round(r[3], 6))
        for r in duck.execute(
            """
            SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS bucket_start,
                   event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
            FROM events GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == expected


def test_stream_dedup_within_watermark(spark, tmp_path):
    import pandas as pd

    # two copies of each event in one file → stateful dedup keeps one
    src = tmp_path / "events_dup"
    src.mkdir()
    base = pd.read_parquet(f"{SF_DIR}/events.parquet").head(50)
    dup = pd.concat([base, base]).reset_index(drop=True)
    dup.to_parquet(src / "part0.parquet")

    from gmail_etl_spark.streaming.jobs import dedup_events_stream

    stream = read_events_stream(spark, str(src))
    deduped = dedup_events_stream(stream, watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.sql("select count(distinct event_id) c, count(*) n from dedup_out").collect()[0]
    assert n["n"] == 50 and n["c"] == 50


def test_streaming_session_windows_match_batch(spark, tmp_path):
    """Append-mode session_window stream over the events table must emit
    exactly the batch q62 sessions (availableNow drains everything, the
    final watermark closes all sessions except possibly the last — so
    compare on the emitted subset and require near-complete coverage)."""
    import shutil

    from gmail_etl_spark.streaming.jobs import read_events_stream, sessionized_event_counts

    events_dir = tmp_path / "ev_sess"
    events_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", events_dir / "part0.parquet")
    stream = sessionized_event_counts(read_events_stream(spark, str(events_dir)))
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in spark.sql("select * from sess_out").collect()
    }
    from gmail_etl_spark.plans.catalog import query_map

    batch = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in query_map()["q62_session_window"](spark, SF_DIR).collect()
    }
    assert got, "stream emitted no sessions"
    # every emitted session must match the batch result exactly
    for k, v in got.items():
        assert batch.get(k) == v, k
    # and coverage must be near-complete (only watermark-tail sessions may lag)
    assert len(got) >= len(batch) - 20
