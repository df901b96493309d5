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
