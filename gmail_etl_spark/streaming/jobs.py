"""Structured Streaming jobs (SURVEY §2.6 ST1–ST5, §2.8 X5).

The reference's incremental machinery maps 1:1 onto streaming
primitives:

* ST1 trigger/schedule  (`gmail_dag.py:5` @daily)            → ``trigger(availableNow=True)`` run per schedule
* ST2 exactly-once dedup (`gmail_functions.py:115-137`)      → checkpoint + ``dropDuplicates('id')``
* ST3 source progress    (`nextPageToken`, not persisted)    → source offsets in the checkpoint
* ST4 processed-commit   (move blob to raw/processed/, :312) → ``cleanSource='archive'``
* ST5 task DAG           (`gmail_dag.py:6-9`)                → ``foreachBatch`` composing both stages

The checkpoint *subsumes* the JDBC ledger: offsets + state make re-runs
ingest nothing, which is exactly what the `emails` table was for.  X5
adds what the reference never had — event-time windows + watermarks for
late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmail_etl_spark.pipeline import transform_stage1
from gmail_etl_spark.schemas import RAW_MESSAGE_SCHEMA

# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


def read_raw_stream(
    spark: SparkSession, raw_dir: str, archive_dir: str | None = None
) -> DataFrame:
    """S3/S4 as a file-source stream; ST4 via cleanSource archiving."""
    reader = (
        spark.readStream.schema(RAW_MESSAGE_SCHEMA)
        .option("multiLine", True)
        .option("mode", "PERMISSIVE")
        .option("maxFilesPerTrigger", 64)
    )
    if archive_dir is not None:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    return reader.json(raw_dir).filter(F.col("id").isNotNull())


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """Version-robust events stream: the parquet ``ts`` column is
    TIMESTAMP(NANOS), which different Spark versions surface differently
    (epoch-nano longs under ``legacy.parquet.nanosAsLong``, or µs
    TIMESTAMP_NTZ).  A one-off batch probe of the same path supplies the
    schema the running version actually produces — streams require an
    explicit schema — and ``normalize_nano_ts`` then lands either form
    on the same session-UTC TIMESTAMP, exactly like the batch loader."""
    from gmail_etl_spark.plans.catalog import normalize_nano_ts

    probed = spark.read.parquet(path).schema
    df = spark.readStream.schema(probed).parquet(path)
    return normalize_nano_ts(df, "ts")


# ---------------------------------------------------------------------------
# ST1/ST2/ST5 — the pipeline as an exactly-once stream
# ---------------------------------------------------------------------------


def stream_raw_to_stage1(
    spark: SparkSession,
    raw_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    archive_dir: str | None = None,
    await_termination: bool = True,
):
    """Raw blobs → stage-1 parquet, exactly-once.

    ``foreachBatch`` composes in-batch dedup + the full transform
    (ST5); the checkpoint carries source offsets (ST3) so a restart
    ingests only new blobs — the ledger's purpose with no ledger.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        stage1 = transform_stage1(batch_df.dropDuplicates(["id"]))
        stage1.write.mode("append").parquet(out_dir)

    q = (
        read_raw_stream(spark, raw_dir, archive_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


# ---------------------------------------------------------------------------
# X5 — event-time windows + watermark; ST2 — stateful dedup
# ---------------------------------------------------------------------------


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding counts — identical expression to the
    batch catalog q60/q61, so batch results oracle the stream."""
    win = (
        F.window("ts", window) if slide is None else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_events_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """ST2 as streaming state: drop duplicate event_ids within the
    watermark horizon (bounded state — the scalable form of the ledger)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sessionized_event_counts(events: DataFrame, gap: str = "5 minutes",
                             watermark: str = "1 hour") -> DataFrame:
    """X5 session windows under streaming semantics: watermarked
    ``session_window`` aggregation (append mode emits a session once the
    watermark passes its close).  Identical expression to batch q62, so
    the batch result oracles the stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


def _rollup_fs(spark: SparkSession, rollup_dir: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    base = jvm.org.apache.hadoop.fs.Path(rollup_dir)
    return jvm, base.getFileSystem(conf), base


def _resolve_rollup_version(spark: SparkSession, rollup_dir: str) -> tuple[str, int]:
    """Current rollup version: (data dir, last merged batch_id), or
    ("", -1) when no rollup exists yet.

    Prefers the ``_CURRENT`` pointer file; if the pointer is missing but
    version dirs exist (the sub-second crash window between publishing a
    new pointer and the old one's removal — or a crash during the very
    FIRST version's write, before any pointer existed — or a manual
    delete), falls back to the highest COMMITTED ``_v`` dir.  The
    ``_SUCCESS`` marker gates the fallback: a partial first-version dir
    (crash before job commit) must not be trusted, or its replayed
    batch would be skipped against corrupt state; any later partial dir
    is harmless because the data write completes before the old pointer
    is touched, so a surviving pointer always wins.
    """
    jvm, fs, base = _rollup_fs(spark, rollup_dir)
    ptr = jvm.org.apache.hadoop.fs.Path(rollup_dir, "_CURRENT")
    if fs.exists(ptr):
        stream = fs.open(ptr)
        try:
            raw = bytes(stream.readAllBytes())
        finally:
            stream.close()
        batch_id, name = raw.decode("utf-8").strip().split("\t")
        return f"{rollup_dir.rstrip('/')}/{name}", int(batch_id)
    if fs.exists(base):
        versions = sorted(
            s.getPath().getName()
            for s in fs.listStatus(base)
            if s.isDirectory()
            and s.getPath().getName().startswith("_v")
            and fs.exists(
                jvm.org.apache.hadoop.fs.Path(
                    f"{rollup_dir.rstrip('/')}/{s.getPath().getName()}", "_SUCCESS"
                )
            )
        )
        if versions:
            return f"{rollup_dir.rstrip('/')}/{versions[-1]}", int(versions[-1][2:])
    return "", -1


def _publish_rollup_version(
    spark: SparkSession, rollup_dir: str, merged: DataFrame, batch_id: int
) -> None:
    """Write ``merged`` as ``_v<batch_id>`` and atomically publish it via
    the ``_CURRENT`` pointer (shared by the additive rollup and the
    sketch-state rollup — see :func:`maintain_daily_rollup` for the
    crash-safety contract)."""
    version_name = f"_v{batch_id:015d}"
    new_dir = f"{rollup_dir.rstrip('/')}/{version_name}"
    merged.write.mode("overwrite").parquet(new_dir)
    jvm, fs, base = _rollup_fs(spark, rollup_dir)
    ptr = jvm.org.apache.hadoop.fs.Path(rollup_dir, "_CURRENT")
    tmp = jvm.org.apache.hadoop.fs.Path(rollup_dir, f"_CURRENT.{batch_id}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(f"{batch_id}\t{version_name}".encode("utf-8"))
    finally:
        out.close()
    if fs.exists(ptr):
        fs.delete(ptr, False)  # rename-over is non-portable; _resolve
        # falls back to the newest _v dir in this sub-second window
    fs.rename(tmp, ptr)
    # best-effort cleanup of superseded versions
    for s in fs.listStatus(base):
        name = s.getPath().getName()
        if s.isDirectory() and name.startswith("_v") and name != version_name:
            fs.delete(s.getPath(), True)


def read_daily_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Reader for the versioned rollup published by
    :func:`maintain_daily_rollup`."""
    data_dir, _ = _resolve_rollup_version(spark, rollup_dir)
    if not data_dir:
        raise FileNotFoundError(f"no rollup published under {rollup_dir}")
    return spark.read.parquet(data_dir)


def maintain_daily_rollup(
    spark: SparkSession,
    events_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
) -> None:
    """Incremental materialized-view maintenance: each micro-batch's
    partial aggregate (count + integer-cents sum per (day, event_type))
    merges ADDITIVELY into the persisted rollup — the streaming form of
    the hypertable rollup (q66).  Counts and integer sums are mergeable
    state, so the rollup equals the from-scratch batch aggregate after
    any sequence of triggers.

    Exactly-once despite foreachBatch's at-least-once contract: each
    merge writes a NEW version dir (``_v<batch_id>``) and then publishes
    it by renaming a pointer file (``_CURRENT``) over the old one — an
    atomic single-file operation, so readers (:func:`read_daily_rollup`)
    always see a complete version and the rollup is never absent
    mid-swap.  The pointer stores the last merged batch_id; a replayed
    batch (crash after publish, before the checkpoint committed) is
    detected by ``batch_id <= stored`` and skipped, so the additive
    merge never double-counts.  Only a genuinely missing rollup starts
    from scratch — read failures of an existing version propagate
    instead of silently resetting history.

    Contract: batch_ids are monotone within ONE checkpoint lineage; the
    rollup and its checkpoint move together.  Pointing a fresh
    checkpoint at an existing rollup treats the re-numbered batches as
    already merged — correct for re-processing the same files (ids
    restart at 0 over the same inputs), wrong if the fresh run also
    carries new files in those low-numbered batches; reset both
    together or neither.

    At 100 TB the rollup table is tiny relative to the fact stream
    (days × types), so the merge rewrite is cheap and the stream never
    re-reads history."""
    events = read_events_stream(spark, events_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_l = batch_df.sparkSession
        cur_dir, last_merged = _resolve_rollup_version(spark_l, rollup_dir)
        if batch_id <= last_merged:
            return  # at-least-once replay of an already-published merge
        inc = (
            batch_df.groupBy(
                F.to_date("ts").alias("day"), "event_type"
            ).agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
            )
        )
        if cur_dir:
            # a failure reading an EXISTING version must propagate — it
            # is a transient/corruption signal, not "no prior rollup"
            prev = spark_l.read.parquet(cur_dir)
            merged = (
                prev.unionByName(inc)
                .groupBy("day", "event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("value_cents").alias("value_cents"),
                )
            )
        else:
            merged = inc
        _publish_rollup_version(spark_l, rollup_dir, merged, batch_id)

    q = (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# X5 — stream-stream join (time-bounded correlation of two event streams)
# ---------------------------------------------------------------------------


def stream_stream_attribution(
    events: DataFrame,
    trigger_type: str = "click",
    outcome_type: str = "purchase",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: attribute each ``outcome_type`` event
    to the same user's preceding ``trigger_type`` events within
    ``within`` — the classic click→purchase attribution correlation.

    Both sides carry watermarks and the join condition bounds event
    time on both ends, so Spark can expire join state: per-side state
    is (watermark + within) of events, never unbounded.  The same
    expression runs in batch (the test oracles the stream against it).
    """
    a = (
        events.filter(F.col("event_type") == trigger_type)
        .select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("trigger_id"),
            F.col("ts").alias("trigger_ts"),
        )
        .withWatermark("trigger_ts", watermark)
    )
    b = (
        events.filter(F.col("event_type") == outcome_type)
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("outcome_id"),
            F.col("ts").alias("outcome_ts"),
        )
        .withWatermark("outcome_ts", watermark)
    )
    return a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("outcome_ts") >= F.col("trigger_ts"))
        & (F.col("outcome_ts") <= F.col("trigger_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("a_user").alias("user_id"),
        "trigger_id",
        "outcome_id",
        "trigger_ts",
        "outcome_ts",
    )


# ---------------------------------------------------------------------------
# streaming corpus scrub — the X3 PII pass as an incremental job
# ---------------------------------------------------------------------------


def stream_scrub_documents(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema_ddl: str = "doc_id bigint, text string",
) -> None:
    """Incremental PII scrub (availableNow): new document files are
    redacted with the q116 regexp kernels and appended as parquet,
    exactly-once via the checkpoint.  The scrub is stateless (a narrow
    map), so streaming adds no state store — the natural shape for a
    continuously-arriving 100 TB corpus where re-scrubbing history every
    run is the anti-pattern.
    """
    from gmail_etl_spark.functions.pii import with_pii_report

    stream = spark.readStream.schema(schema_ddl).parquet(docs_dir)
    scrubbed = with_pii_report(stream).drop("text")
    (
        scrubbed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# ST5/X5 — incremental DISTINCT-count state: mergeable sketches, not counts
# ---------------------------------------------------------------------------


def maintain_daily_distinct_sketch(
    spark: SparkSession,
    events_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
) -> None:
    """The sketch-state companion to :func:`maintain_daily_rollup`:
    per-day DISTINCT users cannot be maintained by adding counts (a
    returning user must not double-count across micro-batches), but the
    HLL register state IS mergeable — each batch aggregates its rows
    into one sketch per day (`hll_sketch_agg`) and unions it into the
    persisted per-day sketch (`hll_union_agg`).  Because HLL union takes
    the register-wise max, the final state after ANY partition of the
    stream into batches is byte-identical to the one-shot batch sketch —
    the test asserts estimate equality EXACTLY, not within tolerance.

    Same crash-safety contract as the additive rollup (versioned dirs +
    `_CURRENT` pointer + batch_id idempotence).  At 100 TB the state is
    days × 2^lgK bytes — the stream never re-reads history to answer
    "distinct users per day so far"."""
    events = read_events_stream(spark, events_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_l = batch_df.sparkSession
        cur_dir, last_merged = _resolve_rollup_version(spark_l, rollup_dir)
        if batch_id <= last_merged:
            return  # at-least-once replay of an already-published merge
        inc = batch_df.groupBy(F.to_date("ts").alias("day")).agg(
            F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
        )
        if cur_dir:
            prev = spark_l.read.parquet(cur_dir)
            merged = (
                prev.unionByName(inc)
                .groupBy("day")
                .agg(F.expr("hll_union_agg(sk)").alias("sk"))
            )
        else:
            merged = inc
        _publish_rollup_version(spark_l, rollup_dir, merged, batch_id)

    q = (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_daily_distinct_estimates(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Estimates off the published sketch state: (day, approx_users)."""
    return (
        read_daily_rollup(spark, rollup_dir)
        .select(
            "day",
            F.expr("hll_sketch_estimate(sk)").cast("long").alias("approx_users"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# X5 — streaming drift monitor (incremental TVD over maintained histograms)
# ---------------------------------------------------------------------------


def maintain_drift_histograms(
    spark: SparkSession,
    events_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    cutoff: str = "2024-01-15",
    bin_cents: int = 3600,
) -> None:
    """Incremental form of the q205 drift readout: maintain the per
    (event_type, value-bin) first-half/second-half counts ADDITIVELY
    across micro-batches, exactly like :func:`maintain_daily_rollup`
    (versioned dirs + ``_CURRENT`` pointer + batch_id idempotence), so
    the monitoring surface — total-variation distance between reference
    and live histograms — is always answerable from state that is
    days × types × bins small, without re-reading the stream.

    Counts are mergeable integers, so after ANY partition of the stream
    into batches the state equals the one-shot batch histogram and the
    TVD readout (:func:`read_drift_tvd`) hash-matches the q205 catalog
    query — the test asserts exact equality, not tolerance.  This is the
    general recipe: any drift statistic computed from per-bin counts
    (TVD, chi-square, PSI) becomes incrementally maintainable the moment
    its sufficient statistics are additive."""
    events = read_events_stream(spark, events_dir)
    cutoff_ts = F.lit(cutoff).cast("timestamp")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_l = batch_df.sparkSession
        cur_dir, last_merged = _resolve_rollup_version(spark_l, rollup_dir)
        if batch_id <= last_merged:
            return  # at-least-once replay of an already-published merge
        half1 = (F.col("ts") < cutoff_ts).cast("int")
        inc = (
            batch_df.select(
                "event_type",
                F.floor(
                    F.round(F.col("value") * 100).cast("long") / F.lit(float(bin_cents))
                )
                .cast("long")
                .alias("bin"),
                half1.alias("h1"),
                (1 - half1).alias("h2"),
            )
            .groupBy("event_type", "bin")
            .agg(F.sum("h1").alias("a"), F.sum("h2").alias("b"))
        )
        if cur_dir:
            prev = spark_l.read.parquet(cur_dir)
            merged = (
                prev.unionByName(inc)
                .groupBy("event_type", "bin")
                .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
            )
        else:
            merged = inc
        _publish_rollup_version(spark_l, rollup_dir, merged, batch_id)

    q = (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_drift_tvd(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """TVD readout off the maintained histogram state; column-for-column
    identical to the q205 catalog query (event_type, tvd, worst_bin)."""
    from pyspark.sql import Window

    per_bin = read_daily_rollup(spark, rollup_dir)
    tot = per_bin.groupBy("event_type").agg(
        F.sum("a").cast("long").alias("n1"), F.sum("b").cast("long").alias("n2")
    )
    dev = per_bin.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bin",
        F.abs(F.col("a") * F.col("n2") - F.col("b") * F.col("n1")).alias("cross_dev"),
        "n1",
        "n2",
    )
    wa = Window.partitionBy("event_type")
    return (
        dev.withColumn("m", F.max("cross_dev").over(wa))
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum("cross_dev").cast("double")
                / (2.0 * F.any_value("n1") * F.any_value("n2")),
                6,
            ).alias("tvd"),
            F.min(F.when(F.col("cross_dev") == F.col("m"), F.col("bin"))).alias(
                "worst_bin"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ST5/J2 — streaming upsert: latest-per-key snapshot maintained across batches
# ---------------------------------------------------------------------------


def maintain_latest_snapshot(
    spark: SparkSession,
    events_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
) -> None:
    """Streaming MERGE: maintain the per-user latest (ts, value) snapshot
    across micro-batches — the incremental form of the q200 upsert and
    the stateful generalization of the reference's insert-only ledger
    (J2).  Unlike the additive rollup, upsert state merges by MAX over
    the (ts, event_id) order; max is idempotent AND commutative, so the
    snapshot is correct under any batching and unchanged by replays —
    the batch_id guard here only saves work, it is not load-bearing for
    correctness (the additive rollup NEEDS it; this job would survive
    without it).

    Each batch reduces to one row per touched key (argmax via struct
    max), then merges with the persisted snapshot by the same struct
    max — the tie-break and ordering logic exists in exactly one
    expression.  State is keys × one row; at 100 TB the merge rewrite
    is bounded by the snapshot size, not the stream, and the same
    versioned-dir/_CURRENT publish keeps readers consistent mid-swap."""
    events = read_events_stream(spark, events_dir)

    def pick_latest(df: DataFrame) -> DataFrame:
        # argmax by (ts, event_id): struct max orders lexicographically;
        # operates on cents so persisted state re-merges without a
        # dollars round trip
        return (
            df.groupBy("user_id")
            .agg(F.max(F.struct("ts", "event_id", "value_cents")).alias("s"))
            .select(
                "user_id",
                F.col("s.ts").alias("ts"),
                F.col("s.event_id").alias("event_id"),
                F.col("s.value_cents").alias("value_cents"),
            )
        )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_l = batch_df.sparkSession
        cur_dir, last_merged = _resolve_rollup_version(spark_l, rollup_dir)
        if batch_id <= last_merged:
            return
        inc = pick_latest(
            batch_df.select(
                "user_id",
                "ts",
                "event_id",
                F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
            )
        )
        if cur_dir:
            prev = spark_l.read.parquet(cur_dir)
            merged = pick_latest(prev.unionByName(inc))
        else:
            merged = inc
        _publish_rollup_version(spark_l, rollup_dir, merged, batch_id)

    q = (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_latest_snapshot(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """The current per-user snapshot (user_id, ts, event_id, value_cents)."""
    return read_daily_rollup(spark, rollup_dir).orderBy("user_id")


# ---------------------------------------------------------------------------
# X5/sketches — streaming Misra-Gries heavy-hitter summary maintenance
# ---------------------------------------------------------------------------


def maintain_heavy_hitter_summary(
    spark: SparkSession,
    events_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    k: int = 50,
) -> None:
    """Streaming Misra–Gries: maintain a capacity-``k`` heavy-hitter
    summary of ``user_id`` across micro-batches.  MG summaries are
    MERGEABLE (Agarwal et al., PODS 2012): add counters item-wise, then
    compact by subtracting the (k+1)-th largest counter and dropping
    non-positives — the union of any batch partition keeps the classic
    guarantee, so after the whole stream every user with global count
    > N/(k+1) is present, and each stored counter undercounts its true
    count by at most N/(k+1).

    The merge runs entirely in DataFrame ops on the BOUNDED state: the
    batch's exact per-user counts union the persisted ≤k rows, fold by
    user, and the compaction cut is a window rank over ≤k+batch-users
    rows.  Unlike the max-merge snapshot, this state is NOT
    replay-idempotent (counters add), so the versioned-dir batch_id
    guard is load-bearing, exactly as for the additive rollup.  State
    leaving any executor is ≤k rows regardless of stream volume — the
    100 TB heavy-hitter monitor with constant memory."""
    events = read_events_stream(spark, events_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_l = batch_df.sparkSession
        cur_dir, last_merged = _resolve_rollup_version(spark_l, rollup_dir)
        if batch_id <= last_merged:
            return
        inc = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        if cur_dir:
            prev = spark_l.read.parquet(cur_dir)
            summed = (
                prev.unionByName(inc)
                .groupBy("user_id")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        else:
            summed = inc
        from pyspark.sql import Window as W

        ranked = summed.withColumn(
            "rk", F.row_number().over(W.orderBy(F.col("cnt").desc(), "user_id"))
        )
        # mergeable-summaries compaction: subtract the (k+1)-th largest
        # counter (0 when the summary fits), keep positives
        cut = ranked.filter(F.col("rk") == k + 1).select(
            F.col("cnt").alias("cut")
        )
        merged = (
            ranked.crossJoin(F.broadcast(cut.unionByName(
                ranked.sparkSession.createDataFrame([(0,)], "cut bigint")
            ).agg(F.max("cut").alias("cut"))))
            .select(
                "user_id", (F.col("cnt") - F.col("cut")).alias("cnt")
            )
            .filter(F.col("cnt") > 0)
        )
        _publish_rollup_version(spark_l, rollup_dir, merged, batch_id)

    q = (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_heavy_hitter_summary(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Current MG summary: (user_id, cnt lower-bound counter)."""
    return read_daily_rollup(spark, rollup_dir).orderBy(
        F.col("cnt").desc(), "user_id"
    )


# ---------------------------------------------------------------------------
# D2 × ST5 — streaming near-dup index: dedup new arrivals against the
# retained corpus (incremental MinHash-LSH)
# ---------------------------------------------------------------------------


def _resolve_index_head(spark: SparkSession, index_dir: str) -> int:
    """Last published batch_id of the append-only near-dup index, or -1.

    Same pointer-with-fallback discipline as
    :func:`_resolve_rollup_version`: prefer ``_CURRENT``; fall back to
    the highest COMMITTED ``_b`` dir.  The fallback checks the write
    job's ``_SUCCESS`` marker: a crash mid-write (before job commit,
    before any pointer exists) leaves a partial dir with no marker,
    which must NOT be treated as published — the replayed batch would
    otherwise be skipped forever against corrupt history.  A dir WITH
    the marker is complete, so skipping its replay is the correct
    idempotent outcome even though the pointer never advanced."""
    jvm, fs, base = _rollup_fs(spark, index_dir)
    ptr = jvm.org.apache.hadoop.fs.Path(index_dir, "_CURRENT")
    if fs.exists(ptr):
        stream = fs.open(ptr)
        try:
            raw = bytes(stream.readAllBytes())
        finally:
            stream.close()
        return int(raw.decode("utf-8").strip())
    if fs.exists(base):
        batches = sorted(
            s.getPath().getName()
            for s in fs.listStatus(base)
            if s.isDirectory()
            and s.getPath().getName().startswith("_b")
            and fs.exists(
                jvm.org.apache.hadoop.fs.Path(
                    f"{index_dir.rstrip('/')}/{s.getPath().getName()}", "_SUCCESS"
                )
            )
        )
        if batches:
            return int(batches[-1][2:])
    return -1


def _index_batch_dirs(spark: SparkSession, index_dir: str, head: int) -> list[str]:
    """Published batch dirs (``_b<id>`` with id ≤ head), oldest first."""
    if head < 0:
        return []
    jvm, fs, base = _rollup_fs(spark, index_dir)
    if not fs.exists(base):
        return []
    out = []
    for s in fs.listStatus(base):
        name = s.getPath().getName()
        if s.isDirectory() and name.startswith("_b") and int(name[2:]) <= head:
            out.append(f"{index_dir.rstrip('/')}/{name}")
    return sorted(out)


def _publish_index_batch(
    spark: SparkSession, index_dir: str, survivors: DataFrame, batch_id: int
) -> None:
    """Write ``survivors`` as ``_b<batch_id>`` then advance the
    ``_CURRENT`` pointer — the append-log variant of
    :func:`_publish_rollup_version` (no whole-index rewrite: unlike the
    rollups, the index grows with the retained corpus, so each batch
    publishes only its own survivors)."""
    new_dir = f"{index_dir.rstrip('/')}/_b{batch_id:015d}"
    survivors.write.mode("overwrite").parquet(new_dir)
    jvm, fs, base = _rollup_fs(spark, index_dir)
    ptr = jvm.org.apache.hadoop.fs.Path(index_dir, "_CURRENT")
    tmp = jvm.org.apache.hadoop.fs.Path(index_dir, f"_CURRENT.{batch_id}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(str(batch_id).encode("utf-8"))
    finally:
        out.close()
    if fs.exists(ptr):
        fs.delete(ptr, False)
    fs.rename(tmp, ptr)


def maintain_near_dup_index(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket: int = 512,
    hash_family: str = "xxhash64",
) -> None:
    """Incremental near-duplicate curation: each micro-batch is deduped
    IN-BATCH (MinHash-LSH pairs → connected components, exactly the
    batch operator) and AGAINST THE RETAINED CORPUS (LSH probe of the
    persisted signature index + exact hashed-shingle Jaccard verify);
    survivors append their (buckets, shingle-hash set) rows to the
    index.  The streaming form of ``near_dedup`` — what a continuously
    ingesting training-data pipeline actually runs: "is this new doc a
    near-copy of anything we already kept?"

    SEMANTICS — retained-corpus, not transitive closure: a doc is
    dropped iff it is within ``threshold`` of a KEPT doc (or loses the
    in-batch canonicalization).  Batch CC additionally merges chains
    A~B~C where A≁C; here, if B arrives after A (dropped as A's dup),
    a later C~B but C≁A is KEPT — there is no retained doc it
    duplicates.  That asymmetry is deliberate (dedup-against-kept is
    the production contract; a dropped doc cannot contaminate) and is
    pinned by tests/test_streaming.py; on corpora where every cluster
    member is within threshold of the cluster's first arrival (e.g.
    all-pairs-similar duplicate groups), the retained set equals the
    batch operator's canonical set exactly.

    Exactly-once: the index is an append-only log of per-batch survivor
    dirs (``_b<batch_id>``) behind a ``_CURRENT`` pointer; a replayed
    batch (crash after publish, before checkpoint commit) is detected
    by ``batch_id <= head`` and skipped, and readers only see dirs ≤
    head, so a crash between data write and pointer advance leaves an
    invisible (and then idempotently rewritten) dir.  Same contract as
    :func:`maintain_daily_rollup`: index and checkpoint move together.

    Scale shape: the probe broadcasts the MICRO-BATCH's band keys and
    streams the index exactly once (never the reverse — the index is
    the 100 TB side); the verify join pulls shingle-hash arrays only
    for candidate pairs.  Per batch the index grows by the survivors
    only; nothing is rewritten.  String content never enters the index
    — buckets and 64-bit shingle hashes only."""
    from gmail_etl_spark.operators.dedup import (
        _banded_keys,
        _lsh_sigs,
        minhash_lsh_pairs,
        near_dedup,
    )

    # schema sniff off the batch footer (readStream needs one up front)
    docs = (
        spark.readStream.schema(spark.read.parquet(docs_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_l = batch_df.sparkSession
        head = _resolve_index_head(spark_l, index_dir)
        if batch_id <= head:
            return  # at-least-once replay of an already-published batch
        sigs = _lsh_sigs(batch_df, id_col, text_col, k, n_hashes, hash_family)
        keys = _banded_keys(sigs, n_hashes, bands)
        hist_dirs = _index_batch_dirs(spark_l, index_dir, head)
        if hist_dirs:
            # ONE scan of the (100 TB-side) index: hsh rides along the
            # bucket explode, so candidate generation and verify share
            # the same read instead of two full passes; multi-band
            # collisions collapse in the groupBy (every h_hsh for a
            # given h_id is identical, so first() is exact)
            hist = spark_l.read.parquet(*hist_dirs)
            cand = (
                hist.select(
                    F.col("id").alias("h_id"),
                    F.col("hsh").alias("h_hsh"),
                    F.explode("buckets").alias("bucket"),
                )
                .join(
                    F.broadcast(keys.select(F.col("id").alias("b_id"), "bucket")),
                    "bucket",
                )
                .groupBy("b_id", "h_id")
                .agg(F.first("h_hsh").alias("h_hsh"))
            )
            inter = F.size(F.array_intersect("b_hsh", "h_hsh"))
            union = F.size("b_hsh") + F.size("h_hsh") - inter
            dup_ids = (
                cand.join(
                    F.broadcast(
                        sigs.select(
                            F.col("id").alias("b_id"), F.col("hsh").alias("b_hsh")
                        )
                    ),
                    "b_id",
                )
                .filter(
                    inter.cast("double") / union.cast("double") >= threshold
                )
                .select(F.col("b_id").alias(id_col))
                .distinct()
            )
            fresh = batch_df.join(dup_ids, id_col, "left_anti")
        else:
            fresh = batch_df
        pairs = minhash_lsh_pairs(
            fresh, id_col, text_col, k=k, n_hashes=n_hashes, bands=bands,
            threshold=threshold, max_bucket=max_bucket,
            hash_family=hash_family,
        )
        kept = near_dedup(fresh, id_col, pairs)
        kept_sigs = _lsh_sigs(kept, id_col, text_col, k, n_hashes, hash_family)
        survivors = (
            _banded_keys(kept_sigs, n_hashes, bands)
            .groupBy("id")
            .agg(F.collect_list("bucket").alias("buckets"))
            .join(kept_sigs.select("id", "hsh"), "id")
        )
        _publish_index_batch(spark_l, index_dir, survivors, batch_id)

    q = (
        docs.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_near_dup_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """Current retained set: (id, buckets, hsh) of every survivor
    published by :func:`maintain_near_dup_index`."""
    head = _resolve_index_head(spark, index_dir)
    dirs = _index_batch_dirs(spark, index_dir, head)
    if not dirs:
        raise FileNotFoundError(f"no near-dup index published under {index_dir}")
    return spark.read.parquet(*dirs)
