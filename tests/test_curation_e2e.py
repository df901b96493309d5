"""One composed curation run, end to end (the DEVNOTES pipeline claim
made executable): quality filter → exact dedup → near-dedup → train/eval
split → decontamination check → sequence packing, each stage feeding the
next, with the cross-stage invariants asserted in one place.

Each operator has its own oracle/property tests; what THIS test pins is
the composition: stages accept each other's outputs, row counts only
shrink where they must, duplicates never straddle the split boundary,
and packing conserves exactly the surviving rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmail_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    near_dedup,
)
from gmail_etl_spark.operators.sampling import (
    contamination_report,
    hash_split,
    pack_sequences,
)
from tests.conftest import SF_DIR


def test_composed_curation_run(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_raw = docs.count()

    # 1. quality gate: drop tiny documents (cheap rule stage)
    quality = docs.filter(F.size(F.split("text", " ")) >= 10)
    n_quality = quality.count()
    assert 0 < n_quality <= n_raw

    # 2. exact dedup: one canonical row per identical text
    exact = exact_dedup(quality, "doc_id", "text")
    canonical_ids = exact.select(
        F.col("canonical_id").alias("doc_id")
    ).distinct()
    stage2 = quality.join(canonical_ids, "doc_id")
    n_exact = stage2.count()
    assert n_exact <= n_quality
    assert stage2.select("text").distinct().count() == n_exact

    # 3. near-dedup: LSH pairs -> connected components -> canonical rows
    pairs = minhash_lsh_pairs(stage2, "doc_id", "text", threshold=0.8)
    stage3 = near_dedup(stage2, "doc_id", pairs)
    n_near = stage3.count()
    assert n_near <= n_exact

    # 4. content-keyed split: identical content can never straddle it
    split = hash_split(stage3, "text", train_pct=80)
    assert split.count() == n_near
    assert (
        split.groupBy("text")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )
    train = split.filter(F.col("split") == "train")
    evald = split.filter(F.col("split") == "eval")
    assert train.count() + evald.count() == n_near

    # 5. decontamination: eval docs are their own benchmark here, so a
    # doc sharing no 3-shingle with train scores 0; every score in [0,1]
    report = contamination_report(evald, train, "doc_id", "text")
    assert report.count() == evald.count()
    bad = report.filter(
        (F.col("contamination") < 0) | (F.col("contamination") > 1)
    )
    assert bad.count() == 0

    # 6. pack the clean train split into 512-token sequences
    with_tokens = train.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    packed = pack_sequences(with_tokens, "doc_id", "n_tokens", budget=512)
    # conservation: every surviving train doc appears exactly once
    assert packed.count() == with_tokens.count()
    assert (
        packed.groupBy("item_id").count().filter(F.col("count") > 1).count() == 0
    )
    # budget: no sequence exceeds 512 tokens unless it is a singleton
    over = (
        packed.groupBy("seq_id")
        .agg(
            F.sum("n_tokens").alias("seq_tokens"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter((F.col("seq_tokens") > 512) & (F.col("n_items") > 1))
    )
    assert over.count() == 0
