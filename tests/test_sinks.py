"""Sink compat + file lifecycle tests (S2/S5/S6)."""

from __future__ import annotations

import glob
import json

from gmail_etl_spark.pipeline import read_raw, transform_stage1
from gmail_etl_spark.sources.fixtures import fixture_messages, fixture_raw_df
from gmail_etl_spark.sources.sinks import (
    archive_files,
    write_csv_compat,
    write_json_array_blob,
)


def test_json_array_blob_roundtrips_through_read_raw(spark, tmp_path):
    """S2 blob is byte-shape-compatible: read_raw (multiLine array
    reader, S4) must parse what write_json_array_blob wrote."""
    raw = fixture_raw_df(spark)
    out = str(tmp_path / "blob")
    write_json_array_blob(raw, out)
    files = glob.glob(out + "/part-*")
    assert len(files) == 1  # single blob
    text = open(files[0]).read()
    parsed = json.loads(text)  # valid JSON array
    assert len(parsed) == raw.count()
    back = read_raw(spark, out + "/part-*")
    assert back.count() == raw.count()
    assert sorted(r["id"] for r in back.select("id").collect()) == sorted(
        m["id"] for m in fixture_messages()
    )


def test_csv_compat_sink(spark, tmp_path):
    stage1 = transform_stage1(fixture_raw_df(spark))
    out = str(tmp_path / "csv")
    write_csv_compat(stage1, out)
    back = (
        spark.read.option("header", True)
        .schema(stage1.schema)
        .csv(out)
    )
    assert back.count() == stage1.count()
    a = {r["id"]: r["subject"] for r in stage1.collect()}
    b = {r["id"]: r["subject"] for r in back.collect()}
    assert a == b
    # quoteAll: every field quoted
    line = open(glob.glob(out + "/part-*")[0]).readlines()[1]
    assert line.startswith('"')


def test_csv_bytefidelity_matches_pandas_golden(spark, tmp_path):
    """Golden-bytes parity with the reference's exact write: pandas
    to_csv(index=False, quoting=csv.QUOTE_NONNUMERIC) — quoted strings
    and header, bare numerics and bools, quoted-empty nulls/NaN,
    newline-in-field, trailing newline; plus the utf-8-sig BOM variant
    the reference *intended* (its encoding arg is dead code — to_csv
    with no path returns str)."""
    import csv

    import pandas as pd

    from gmail_etl_spark.sources.sinks import write_csv_bytefidelity

    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "subject": ["plain", 'has "quote"', "comma, inside"],
            "score": [1.5, 0.1, float("nan")],
            "flag": [True, False, True],
            "body": ["line1\nline2", "", None],
        }
    )
    golden = pdf.to_csv(index=False, quoting=csv.QUOTE_NONNUMERIC).encode("utf-8")
    sdf = spark.createDataFrame(
        [(1, "plain", 1.5, True, "line1\nline2"),
         (2, 'has "quote"', 0.1, False, ""),
         (3, "comma, inside", float("nan"), True, None)],
        "id long, subject string, score double, flag boolean, body string",
    )
    out = str(tmp_path / "csv_exact")
    write_csv_bytefidelity(sdf, out)
    got = open(glob.glob(out + "/part-*")[0], "rb").read()
    assert got == golden

    out_bom = str(tmp_path / "csv_bom")
    write_csv_bytefidelity(sdf, out_bom, bom=True)
    got_bom = open(glob.glob(out_bom + "/part-*")[0], "rb").read()
    assert got_bom == pdf.to_csv(
        index=False, quoting=csv.QUOTE_NONNUMERIC
    ).encode("utf-8-sig")
    assert got_bom[:3] == b"\xef\xbb\xbf"


def test_csv_bytefidelity_preserves_row_order_across_partitions(spark, tmp_path):
    from gmail_etl_spark.sources.sinks import write_csv_bytefidelity

    df = spark.range(100).selectExpr("id", "concat('row-', id) AS name").repartition(8, "id")
    # repartition scrambles physical order; the sink must preserve the
    # DataFrame's partition-ordinal order deterministically
    ordered = df.orderBy("id")
    out = str(tmp_path / "csv_order")
    write_csv_bytefidelity(ordered, out)
    lines = open(glob.glob(out + "/part-*")[0]).read().splitlines()
    assert lines[0] == '"id","name"'
    assert [int(line.split(",")[0]) for line in lines[1:]] == list(range(100))


def test_archive_files_moves_processed(spark, tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    (src / "a.json").write_text(json.dumps(fixture_messages()[:2]))
    (src / "b.json").write_text(json.dumps(fixture_messages()[2:4]))
    (src / "keep.txt").write_text("not a blob")
    moved = archive_files(spark, str(src), str(tmp_path / "processed"))
    assert moved == 2
    assert sorted(p.name for p in src.iterdir()) == ["keep.txt"]
    assert sorted(p.name for p in (tmp_path / "processed").iterdir()) == [
        "a.json",
        "b.json",
    ]


def test_upsert_by_key(spark, tmp_path):
    from gmail_etl_spark.sources.sinks import upsert_by_key

    path = str(tmp_path / "tbl")
    first = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "id long, v string, ver int"
    )
    upsert_by_key(spark, first, path, "id")
    second = spark.createDataFrame(
        [(2, "B2", 20), (4, "d", 20)], "id long, v string, ver int"
    )
    upsert_by_key(spark, second, path, "id")
    got = {r["id"]: (r["v"], r["ver"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("B2", 20), 3: ("c", 10), 4: ("d", 20)}


def test_compact_parquet_reduces_files(spark, tmp_path):
    from gmail_etl_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "frag")
    docs = spark.read.parquet(f"{__import__('tests.conftest', fromlist=['SF_DIR']).SF_DIR}/documents.parquet")
    docs.repartition(37).write.parquet(path)  # fragment: 37 tiny files
    before = len(glob.glob(path + "/part-*"))
    assert before == 37
    n = compact_parquet(spark, path, target_file_bytes=256 * 1024 * 1024)
    after = len(glob.glob(path + "/part-*"))
    assert after == n == 1
    assert spark.read.parquet(path).count() == docs.count()


def test_cli_stage1_and_query(spark, tmp_path):
    """CLI surface: stage1 batch + query subcommands (in-process main)."""
    import json as _json

    from gmail_etl_spark.cli import main
    from gmail_etl_spark.sources.fixtures import fixture_messages

    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "b.json").write_text(_json.dumps(fixture_messages()))
    rc = main(
        [
            "stage1",
            "--raw",
            str(raw) + "/*.json",
            "--out",
            str(tmp_path / "out"),
            "--ledger",
            str(tmp_path / "ledger"),
        ]
    )
    assert rc == 0
    assert spark.read.parquet(str(tmp_path / "out")).count() == len(fixture_messages())
    assert main(["query", "q10_distinct_flags", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert main(["query", "no_such_query"]) == 2


def test_jdbc_ledger_roundtrip_derby(spark, tmp_path):
    """S7 parity smoke against Derby embedded (the JDBC driver shipped
    inside Spark): create the reference-shaped emails ledger, append
    processed ids, read back via spark.read.jdbc, and anti-join a new
    batch — second pass ingests nothing, like the reference's
    get_emails_from_db gate."""
    from gmail_etl_spark.sources.jdbc_ledger import (
        derby_url,
        read_ledger_jdbc,
        unprocessed_against_jdbc_ledger,
        write_ledger_jdbc,
    )

    url = derby_url(str(tmp_path / "ledgerdb"))
    batch = spark.createDataFrame(
        [("m1", "2023-01-01"), ("m2", "2023-01-02")], "id string, date string"
    ).selectExpr("id", "CAST(date AS DATE) AS date")
    write_ledger_jdbc(batch, url, mode="overwrite")

    back = read_ledger_jdbc(spark, url)
    assert {r["id"] for r in back.collect()} == {"m1", "m2"}

    incoming = spark.createDataFrame(
        [("m1",), ("m2",), ("m3",)], "id string"
    )
    fresh = unprocessed_against_jdbc_ledger(incoming, url)
    assert {r["id"] for r in fresh.collect()} == {"m3"}

    # record the new id; now nothing is unprocessed (idempotent re-run)
    write_ledger_jdbc(
        fresh.selectExpr("id", "CAST('2023-01-03' AS DATE) AS date"), url
    )
    assert unprocessed_against_jdbc_ledger(incoming, url).count() == 0


def test_jsonl_shards_bounded_and_ordered(spark, tmp_path):
    """Sharded JSONL export: every shard <= rows_per_shard, all rows
    survive a roundtrip, stdlib-parsable lines, and with order_col the
    shards are globally range-ordered."""
    import json

    from pyspark.sql import functions as F

    from gmail_etl_spark.sources.sinks import write_jsonl_shards

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
    )
    out = str(tmp_path / "corpus")
    n_files = write_jsonl_shards(df, out, rows_per_shard=128, order_col="doc_id")
    assert n_files >= 8  # 1000 rows / 128 cap

    shard_rows = []
    files = sorted(p for p in (tmp_path / "corpus").iterdir() if p.name.startswith("part-"))
    for p in files:
        lines = p.read_text().splitlines()
        assert len(lines) <= 128
        rows = [json.loads(ln) for ln in lines]   # stdlib-parsable
        assert all(set(r) == {"doc_id", "text"} for r in rows)
        shard_rows.append([r["doc_id"] for r in rows])

    flat = [i for shard in shard_rows for i in shard]
    assert sorted(flat) == list(range(1000))      # lossless
    # range partitioning: shard id ranges must not interleave
    bounds = sorted((min(s), max(s)) for s in shard_rows if s)
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 < lo2

    # default path: no repartition, still bounded and lossless
    out2 = str(tmp_path / "corpus2")
    write_jsonl_shards(df, out2, rows_per_shard=100)
    back = spark.read.json(out2)
    assert back.count() == 1000


def test_orc_roundtrip_and_sharded_partition_write(spark, tmp_path):
    """Format breadth: ORC round-trips losslessly, and the q141 shard
    expression drives a partitioned write whose layout prunes to one
    shard directory on read."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    orc_path = str(tmp_path / "docs_orc")
    d.write.mode("overwrite").orc(orc_path)
    back = spark.read.orc(orc_path)
    assert back.count() == d.count()
    assert sorted(back.columns) == sorted(d.columns)
    assert {r["doc_id"] for r in back.collect()} == {r["doc_id"] for r in d.collect()}

    shard = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 1),
        )
        - 1
    ).cast("long")
    shard_path = str(tmp_path / "sharded")
    d.withColumn("shard", shard).write.mode("overwrite").partitionBy("shard").parquet(
        shard_path
    )
    one = spark.read.parquet(shard_path).filter(F.col("shard") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition pruning: only the shard=3 directory is scanned
    assert one.count() > 0
    assert "shard" not in plan.split("ReadSchema")[-1].split("]")[0]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Lake-layout evolution: a v2 writer adds a column; readers with
    mergeSchema see the union schema, v1 rows surface NULL for the new
    column, and plain readers keep working on the footer they pick."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id"), F.lit("a").alias("source")).write.parquet(out)
    spark.range(5, 8).select(
        F.col("id"), F.lit("b").alias("source"), F.lit(1.5).alias("quality")
    ).write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "source", "quality"}
    assert merged.count() == 8
    assert merged.filter(F.col("quality").isNull()).count() == 5
    assert merged.filter((F.col("source") == "b") & F.col("quality").isNotNull()).count() == 3
