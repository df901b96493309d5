"""applyInPandasWithState custom operator + Python DataSource tests."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_DIR


def test_running_user_totals_across_batches(spark, tmp_path):
    """State must carry across micro-batches: split events into two
    files, force one file per trigger, and check the final running
    totals equal the batch aggregation."""
    from gmail_etl_spark.streaming.jobs import read_events_stream
    from gmail_etl_spark.streaming.stateful import running_user_totals

    src = tmp_path / "ev"
    src.mkdir()
    base = pd.read_parquet(f"{SF_DIR}/events.parquet").head(200)
    base.iloc[:100].to_parquet(src / "a.parquet")
    base.iloc[100:].to_parquet(src / "b.parquet")

    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
        "value double, props string"
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    from pyspark.sql import functions as F

    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per user per batch → keep the last
    out = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
            FROM running_totals
        ) WHERE rn = 1
        """
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in out.collect()}
    exp = {
        int(uid): (int(g["event_id"].count()), round(float(g["value"].sum()), 2))
        for uid, g in base.groupby("user_id")
    }
    assert got == exp


def test_transform_with_state_matches_apply_in_pandas(spark, tmp_path):
    """The Spark 4 transformWithStateInPandas processor must produce the
    same final running totals as the applyInPandasWithState operator and
    the batch aggregation, with state carried across two triggers."""
    from gmail_etl_spark.streaming.stateful import running_user_totals_tws

    if running_user_totals_tws is None:
        import pytest

        pytest.skip("transformWithStateInPandas unavailable (needs pyspark>=4 + protobuf)")

    src = tmp_path / "ev"
    src.mkdir()
    base = pd.read_parquet(f"{SF_DIR}/events.parquet").head(200)
    base.iloc[:100].to_parquet(src / "a.parquet")
    base.iloc[100:].to_parquet(src / "b.parquet")

    from pyspark.sql import functions as F

    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
        "value double, props string"
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    q = (
        running_user_totals_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
            FROM tws_totals
        ) WHERE rn = 1
        """
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in out.collect()}
    exp = {
        int(uid): (int(g["event_id"].count()), round(float(g["value"].sum()), 2))
        for uid, g in base.groupby("user_id")
    }
    assert got == exp


def test_gmail_datasource_roundtrip(spark):
    """spark.read.format('gmail') must produce the same stage-1 output
    as the fixture DataFrame path."""
    from gmail_etl_spark.pipeline import transform_stage1
    from gmail_etl_spark.plans.gmail_queries import expected_stage1_rows
    from gmail_etl_spark.sources.gmail_datasource import GmailDataSource

    spark.dataSource.register(GmailDataSource)
    raw = spark.read.format("gmail").option("numPartitions", 3).load()
    assert raw.rdd.getNumPartitions() >= 2  # actually distributed
    got = {r["id"]: r["body"] for r in transform_stage1(raw).collect()}
    expected = {r["id"]: r["body"] for r in expected_stage1_rows()}
    assert got == expected


def test_gmail_datasource_limit(spark):
    from gmail_etl_spark.sources.gmail_datasource import GmailDataSource

    spark.dataSource.register(GmailDataSource)
    assert spark.read.format("gmail").option("limit", 4).load().count() == 4


def test_gmail_streaming_datasource_incremental(spark, tmp_path):
    """Spark 4 Python STREAMING data source: the Gmail poll loop as a
    first-class readStream source — offsets advance through the mailbox
    in capped micro-batches, every message arrives exactly once, and
    the rows equal the batch reader's."""
    from pyspark.sql import functions as F

    from gmail_etl_spark.sources.gmail_datasource import GmailDataSource

    spark.dataSource.register(GmailDataSource)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    batches: list[int] = []

    def process(batch_df, batch_id):
        n = batch_df.count()
        if n:
            batches.append(n)
            batch_df.select("id").write.mode("append").parquet(out)

    # three availableNow runs over one checkpoint: each restart resumes
    # from the committed offset and takes the next capped slice
    for _ in range(3):
        q = (
            spark.readStream.format("gmail")
            .option("maxMessagesPerBatch", 4)
            .load()
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    streamed = {r["id"] for r in spark.read.parquet(out).collect()}
    batch_ids = {
        r["id"]
        for r in spark.read.format("gmail").load().select("id").collect()
    }
    assert streamed == batch_ids and len(streamed) > 0
    assert len(batches) >= 3  # capped slices across restarts
    assert sum(batches) == len(streamed)  # exactly-once across restarts


def test_spike_detector_matches_sequential_scan(spark, tmp_path):
    """The stateful spike detector's alerts across 4 in-order
    micro-batches must equal a sequential Python scan of the whole log
    — per-event decisions consume the running state, so this is the
    order-dependence contract an aggregate cannot express."""
    import pandas as pd

    from gmail_etl_spark.streaming.stateful import detect_value_spikes
    from tests.conftest import SF_DIR

    src = tmp_path / "ev"
    src.mkdir()
    base = (
        pd.read_parquet(f"{SF_DIR}/events.parquet")
        .sort_values(["ts", "event_id"])
        .head(400)
        .reset_index(drop=True)
    )
    for i in range(4):
        base.iloc[i * 100 : (i + 1) * 100].to_parquet(src / f"{i}.parquet")

    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    out = detect_value_spikes(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("spikes")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["event_id"]): (r["value_cents"], r["running_mean_cents"])
        for r in spark.sql("select * from spikes").collect()
    }

    exp = {}
    state: dict[int, tuple[int, int]] = {}
    pdf = base.copy()
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    for r in pdf.sort_values(["ts", "event_id"]).itertuples():
        n, total = state.get(r.user_id, (0, 0))
        if n >= 3 and r.cents * n > 3 * total:
            exp[(r.user_id, r.event_id)] = (int(r.cents), total // n)
        state[r.user_id] = (n + 1, total + int(r.cents))

    assert got == exp and len(exp) > 0


def test_spike_detector_multi_chunk_batch(spark, tmp_path):
    """A group whose per-batch rows arrive as MANY Arrow chunks (forced
    via arrow.maxRecordsPerBatch=16) must alert identically to the
    sequential scan — regression for per-chunk sorting, which silently
    reorders events once a group spans more than one chunk."""
    import pandas as pd

    from gmail_etl_spark.streaming.stateful import detect_value_spikes
    from tests.conftest import SF_DIR

    src = tmp_path / "ev"
    src.mkdir()
    base = (
        pd.read_parquet(f"{SF_DIR}/events.parquet")
        .head(400)
        .reset_index(drop=True)
    )
    # one user, one file => one micro-batch whose group spans ~25 chunks;
    # reverse ts order on disk so chunk-local sorting gives a different
    # alert set than a global sort
    base["user_id"] = 1
    base.sort_values("ts", ascending=False).to_parquet(src / "0.parquet")

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        stream = spark.readStream.schema(
            "event_id bigint, ts timestamp_ntz, user_id bigint, "
            "event_type string, value double, props string"
        ).parquet(str(src))
        out = detect_value_spikes(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("spikes_chunked")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["user_id"], r["event_id"]): (
                r["value_cents"],
                r["running_mean_cents"],
            )
            for r in spark.sql("select * from spikes_chunked").collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    exp = {}
    n, total = 0, 0
    pdf = base.copy()
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    for r in pdf.sort_values(["ts", "event_id"]).itertuples():
        if n >= 3 and r.cents * n > 3 * total:
            exp[(1, r.event_id)] = (int(r.cents), total // n)
        n, total = n + 1, total + int(r.cents)

    assert got == exp and len(exp) > 0


def test_spike_detector_multi_user_multi_chunk(spark, tmp_path):
    """Combined stress: many users per batch AND chunked Arrow delivery
    (maxRecordsPerBatch=32) — group rows interleave across chunk
    boundaries, so both the per-group concat and the cross-group state
    isolation are exercised at once."""
    import pandas as pd

    from gmail_etl_spark.streaming.stateful import detect_value_spikes
    from tests.conftest import SF_DIR

    src = tmp_path / "ev"
    src.mkdir()
    base = (
        pd.read_parquet(f"{SF_DIR}/events.parquet")
        .head(600)
        .reset_index(drop=True)
    )
    base["user_id"] = base.index % 7  # 7 interleaved users
    base.sort_values("value", ascending=False).to_parquet(src / "0.parquet")

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        stream = spark.readStream.schema(
            "event_id bigint, ts timestamp_ntz, user_id bigint, "
            "event_type string, value double, props string"
        ).parquet(str(src))
        q = (
            detect_value_spikes(stream)
            .writeStream.format("memory")
            .queryName("spikes_mu")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["user_id"], r["event_id"]): (
                r["value_cents"],
                r["running_mean_cents"],
            )
            for r in spark.sql("select * from spikes_mu").collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    exp = {}
    state: dict[int, tuple[int, int]] = {}
    pdf = base.copy()
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    for r in pdf.sort_values(["ts", "event_id"]).itertuples():
        n, total = state.get(r.user_id, (0, 0))
        if n >= 3 and r.cents * n > 3 * total:
            exp[(r.user_id, r.event_id)] = (int(r.cents), total // n)
        state[r.user_id] = (n + 1, total + int(r.cents))

    assert got == exp and len(exp) > 0
