"""Sinks + file lifecycle (SURVEY §2.1 rows S2, S5, S6).

The idiomatic lake sink is parquet (``pipeline.write_stage1_parquet``);
these are the byte-compat forms of the reference's GCS writes plus the
batch file-archive commit marker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_json_array_blob(df: DataFrame, path: str) -> None:
    """S2 byte-compat: one JSON-array blob per write, like the
    reference's ``json.dumps(list)`` → single GCS object
    (``resources/gmail_functions.py:127-129``).

    Spark's native JSON sink writes JSON-lines across many part files —
    the right thing at scale; this compat form funnels through a single
    row/partition, so use it only for reference-shaped consumers and
    batch sizes that fit one blob (the reference caps at 300 messages).
    """
    arr = df.select(F.to_json(F.struct(*df.columns)).alias("j")).agg(
        F.concat(F.lit("["), F.concat_ws(",", F.collect_list("j")), F.lit("]")).alias(
            "blob"
        )
    )
    arr.coalesce(1).write.mode("overwrite").text(path)


def write_csv_compat(df: DataFrame, path: str) -> None:
    """S6: header + quote-all CSV (reference ``to_csv`` with
    QUOTE_NONNUMERIC, ``resources/gmail_functions.py:307-309``).
    quoteAll quotes numerics too — a superset every CSV reader accepts.
    For byte-exact output use :func:`write_csv_bytefidelity`."""
    df.write.mode("overwrite").option("header", True).option("quoteAll", True).csv(path)


def write_csv_bytefidelity(df: DataFrame, path: str, bom: bool = False) -> None:
    """S6 byte-exact: emulate the reference's
    ``df.to_csv(index=False, quoting=csv.QUOTE_NONNUMERIC,
    encoding='utf-8-sig')`` → GCS blob (``resources/gmail_functions.py:
    309``, ``:60``) down to the byte level:

    * header and every string field quoted, inner quotes doubled;
    * numeric fields unquoted; bools render ``True``/``False`` unquoted
      (Python's csv module treats bool as int, so QUOTE_NONNUMERIC
      leaves them bare);
    * nulls and NaN render as a *quoted* empty string in non-numeric
      and numeric columns alike (pandas' ``na_rep=''`` is a string, so
      QUOTE_NONNUMERIC quotes it);
    * ``\\n`` line terminator, trailing newline after the last row;
    * ``bom=False`` by default because the reference's ``utf-8-sig`` is
      dead code — ``to_csv`` with no path returns ``str`` (the encoding
      arg is ignored) and ``blob.open('w')`` writes plain UTF-8.  Pass
      ``bom=True`` for the byte form the reference *intended*.

    Float formatting matches Java's shortest-round-trip rendering, which
    agrees with Python repr for the values this pipeline emits; exotic
    magnitudes (>=1e16) can differ in exponent style.

    Like :func:`write_json_array_blob` this funnels through one file —
    it is a byte-compat sink for reference-shaped consumers (the
    reference writes one ~300-row blob per run), not the scale path
    (that's parquet).  Row order is preserved via
    ``monotonically_increasing_id`` (partition-ordinal ordering).
    """
    from pyspark.sql.types import BooleanType, DoubleType, FloatType, NumericType

    def render(fname: str) -> "F.Column":
        c = F.col(fname)
        dtype = df.schema[fname].dataType
        quoted_empty = F.lit('""')
        if isinstance(dtype, BooleanType):
            return F.when(c.isNull(), quoted_empty).otherwise(
                F.when(c, F.lit("True")).otherwise(F.lit("False"))
            )
        if isinstance(dtype, NumericType):
            missing = (
                c.isNull() | F.isnan(c)
                if isinstance(dtype, (DoubleType, FloatType))
                else c.isNull()
            )
            return F.when(missing, quoted_empty).otherwise(c.cast("string"))
        return F.concat(
            F.lit('"'),
            F.replace(F.coalesce(c.cast("string"), F.lit("")), F.lit('"'), F.lit('""')),
            F.lit('"'),
        )

    header = ",".join('"%s"' % name.replace('"', '""') for name in df.columns)
    if bom:
        header = "\ufeff" + header
    body = df.select(
        F.concat_ws(",", *[render(c) for c in df.columns]).alias("line")
    ).withColumn("_ord", F.monotonically_increasing_id())
    head = df.sparkSession.createDataFrame([(header, -1)], "line string, _ord long")
    (
        head.unionByName(body)
        .orderBy("_ord")
        .select("line")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def archive_files(spark: SparkSession, src_dir: str, archive_dir: str, suffix: str = ".json") -> int:
    """S5 batch form: move processed input files to an archive dir — the
    commit marker of ``move_gcs_blob`` (``resources/gmail_functions.py:
    87-98,312-315``).  Streaming jobs get this for free via
    ``cleanSource='archive'``; this is the batch equivalent through the
    Hadoop FS API (works on any supported filesystem: file://, gs://,
    s3a://...).  Returns the number of files moved."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src_path = jvm.org.apache.hadoop.fs.Path(src_dir)
    fs = src_path.getFileSystem(conf)
    dst_path = jvm.org.apache.hadoop.fs.Path(archive_dir)
    if not fs.exists(dst_path):
        fs.mkdirs(dst_path)
    moved = 0
    for status in fs.listStatus(src_path):
        p = status.getPath()
        if status.isFile() and p.getName().endswith(suffix):
            fs.rename(p, jvm.org.apache.hadoop.fs.Path(dst_path, p.getName()))
            moved += 1
    return moved


def upsert_by_key(
    spark: SparkSession,
    new_rows: DataFrame,
    table_path: str,
    key: str,
    order_col: str | None = None,
) -> None:
    """MERGE-style upsert into a parquet table: new rows win on key
    collision (latest by ``order_col`` if given, else new-batch wins).

    Plain-parquet formulation of the ledger/J2 write path: read existing,
    union, keep one row per key, rewrite.  On a real lake this is Delta/
    Iceberg MERGE INTO with file-level pruning; the full-rewrite form
    here is correct at any scale but costs a table rewrite — partition
    the table and restrict the rewrite to touched partitions when keys
    are partition-aligned.
    """
    from pyspark.sql import Window

    try:
        existing = spark.read.parquet(table_path)
        existing = existing.withColumn("_prio", F.lit(0))
    except Exception:
        existing = None
    ranked = new_rows.withColumn("_prio", F.lit(1))
    if existing is not None:
        ranked = existing.unionByName(ranked)
    order = [F.desc("_prio")] + ([F.desc(order_col)] if order_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    merged = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )
    # localCheckpoint materializes the merge before the overwrite breaks
    # its own input lineage (classic read-modify-overwrite hazard).
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(table_path)


def compact_parquet(spark: SparkSession, path: str, target_file_bytes: int = 134_217_728) -> int:
    """Small-file compaction: rewrite a parquet dir into
    ceil(bytes/target) files.  The 100 TB hygiene op — streaming sinks
    and per-batch appends accrete small files that wreck scan
    parallelism (one task per tiny file) and NameNode/list costs.
    Returns the new file count."""
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    df.localCheckpoint(eager=True).repartition(n_files).write.mode("overwrite").parquet(path)
    return n_files


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int,
    order_col: str | None = None,
) -> int:
    """Training-corpus export: JSON-lines output in size-targeted shards
    (the delivery format LLM data pipelines feed to trainers).

    ``rows_per_shard`` bounds every output file via Spark's
    ``maxRecordsPerFile`` — enforcement is per-writer-task, no extra
    shuffle.  With ``order_col`` the export first range-partitions on
    that column, so shards are globally ordered by key (shard i's keys
    all precede shard i+1's).  Note the exact shard BOUNDARIES are not
    bit-reproducible across runs: RangePartitioner seeds its boundary
    sampler with the RDD id (the round-8 distributed-window finding),
    so re-exports can split the same ordered rows at slightly different
    file offsets — the row SET and the global order are what's
    deterministic.  Without ``order_col``, existing partitioning is
    kept (cheapest path).  Returns the number of shard files written.

    Scale posture: range partitioning samples the key distribution, so
    shards stay balanced under skew; JSON encoding is JVM-side
    (``to_json`` codegen), never a Python loop.
    """
    out = df
    if order_col is not None:
        n = df.count()
        shards = max(1, -(-n // rows_per_shard))
        out = df.repartitionByRange(shards, F.col(order_col))
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
        .json(path)
    )
    spark = df.sparkSession
    files = [
        f
        for f in _list_files(spark, path)
        if f.rsplit("/", 1)[-1].startswith("part-")
    ]
    return len(files)


def _list_files(spark: SparkSession, path: str) -> list[str]:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    return [
        str(st.getPath())
        for st in fs.listStatus(p)
        if st.isFile()
    ]
