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
