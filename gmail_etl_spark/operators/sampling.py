"""Dataset curation operators: deterministic splits, per-class caps,
stratified sampling, benchmark decontamination (SURVEY §2.8 — the
selection half of a training-data pipeline).

Reproducibility rule: every selection here keys on *content hashes or
ids*, never on RNG state, so re-running the pipeline (or running it on
a different cluster layout) selects the identical rows.  That is what
makes 100 TB curation auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_split(
    df: DataFrame, content_col: str, train_pct: int = 80
) -> DataFrame:
    """Deterministic train/eval split on a content hash.

    Bucket = first byte of sha2(content) (uniform 0..255); rows with
    bucket < 256*pct/100 are 'train'.  Content-keyed, so duplicate texts
    always land in the same split — id-keyed splits leak near-dups
    across the boundary.
    """
    bucket = F.conv(F.substring(F.sha2(F.col(content_col), 256), 1, 2), 16, 10).cast("int")
    threshold = int(256 * train_pct / 100)
    return df.withColumn(
        "split", F.when(bucket < threshold, "train").otherwise("eval")
    )


def per_class_cap(
    df: DataFrame, class_col: str, content_col: str, id_col: str, cap: int
) -> DataFrame:
    """Class-balanced cap: keep at most ``cap`` rows per class, chosen
    by content-hash order (deterministic, unbiased by ingestion order).
    The window shuffles one partition per class — for heavy classes at
    scale pre-aggregate with a (class, salt) two-phase variant."""
    w = Window.partitionBy(class_col).orderBy(
        F.sha2(F.col(content_col), 256), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict | float, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling: the quota-matching primitive for
    language/source mixing.  Seeded but RNG-based — use hash_split when
    byte-reproducibility across engines matters.

    ``fractions`` as a dict maps stratum → keep probability
    (``sampleBy``).  A single float applies the same probability to
    every stratum — per-row Bernoulli is then identical in distribution
    and needs no driver-side enumeration of the stratum domain, so the
    plan stays scan-shaped at any corpus size."""
    if isinstance(fractions, dict):
        return df.sampleBy(strata_col, fractions=fractions, seed=seed)
    return df.filter(F.rand(seed) < F.lit(float(fractions)))


def contamination_report(
    benchmark: DataFrame,
    train: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Benchmark decontamination: fraction of each benchmark document's
    k-token shingles that appear anywhere in the training corpus.

    Returns (id, n_shingles, n_contaminated, contamination) — flag or
    drop docs above a threshold before evaluation.  The train side
    reduces to a distinct-shingle set (one shuffle), the probe is a
    broadcast-friendly semi-join per shingle: integer counts, exact.
    """
    from gmail_etl_spark.operators.dedup import shingles

    bench_sh = benchmark.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), k)).alias("shingle"),
    )
    train_sh = (
        train.select(F.explode(shingles(F.col(text_col), k)).alias("shingle"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = bench_sh.join(train_sh, "shingle", "left")
    return joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        F.round(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("contamination"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int = 2048,
    n_buckets: int = 64,
    bucket_family: str = "xxhash64",
) -> DataFrame:
    """Greedy first-fit-decreasing packing of items (chunks/documents)
    into fixed-token training sequences.

    Packing is inherently sequential, so parallelism comes from sharding:
    items hash into ``n_buckets`` independent buckets (at 100 TB, raise
    n_buckets to ~tasks); each bucket packs deterministically in one
    ``applyInPandas`` group — sorted by (tokens desc, id), first fit.
    Output: (bucket, seq_id, item id, item tokens); sequence ids are
    globally unique as bucket * 1e9 + local index.

    Guarantees: every input row appears exactly once; no sequence
    exceeds ``budget`` (items larger than budget get a singleton
    sequence); byte-identical output across runs (total order + stable
    algorithm, no RNG).

    ``bucket_family="sha256"`` swaps the bucket hash for the portable
    cross-engine family (first 8 sha256 hex nibbles of the id's string
    form, mod ``n_buckets``) so a SQL oracle can replay the sharding —
    and since the in-bucket pack is a pure function of the sorted items,
    the WHOLE operator then replays (q72's oracle walks the first-fit
    recurrence as a recursive CTE over list state).  xxhash64 stays the
    throughput default.
    """
    import pandas as pd

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "item_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        seq_ids, seq_space = [], []  # seq_space[i] = remaining tokens
        assigned = []
        for n in pdf["n_tokens"]:
            n = int(n)
            for i, room in enumerate(seq_space):
                if n <= room:
                    seq_space[i] = room - n
                    assigned.append(i)
                    break
            else:
                seq_space.append(max(budget - n, 0))
                assigned.append(len(seq_space) - 1)
        pdf["seq_id"] = [bucket * 1_000_000_000 + i for i in assigned]
        return pdf[["bucket", "seq_id", "item_id", "n_tokens"]]

    if bucket_family == "sha256":
        bucket = F.pmod(
            F.conv(
                F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 8), 16, 10
            ).cast("long"),
            F.lit(n_buckets),
        )
    elif bucket_family == "xxhash64":
        bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    else:
        raise ValueError(f"unknown bucket_family: {bucket_family!r}")
    items = df.select(
        F.col(id_col).alias("item_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        bucket.alias("bucket"),
    )
    # item_id keeps the caller's id type (string uuids pack fine — the
    # in-bucket sort is (n_tokens desc, item_id asc) on either type)
    id_type = df.schema[id_col].dataType.simpleString()
    return items.groupBy("bucket").applyInPandas(
        _pack, f"bucket long, seq_id long, item_id {id_type}, n_tokens long"
    )
