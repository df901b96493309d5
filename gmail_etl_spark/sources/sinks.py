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
    quoteAll quotes numerics too — a superset every CSV reader accepts;
    the utf-8-sig BOM is a pandas-ism intentionally not reproduced."""
    df.write.mode("overwrite").option("header", True).option("quoteAll", True).csv(path)


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
