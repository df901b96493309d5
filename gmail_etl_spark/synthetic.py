"""Deterministic synthetic corpora for benchmarks, scale gates, and
diagnostics.

The planted near-dup generator here is THE single definition shared by
``bench.py``, the 1M split-rate scale gate, and the ``tools/`` A/B,
profiling, and scaling scripts — their comparability rests on running
the same expressions, so the corpus must never be re-derived per call
site (a drift between copies would silently invalidate every recorded
A/B and the round-over-round bench series).

Everything is pure column expressions seeded by ``xxhash64`` — no RNG,
no Python in the path — so the corpus is bit-identical at any
parallelism (the topology-determinism requirement certified in
DEVNOTES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def planted_near_dup_corpus(
    spark: SparkSession,
    n: int,
    group: int = 10,
    partitions: int = 32,
    n_tokens: int = 30,
) -> DataFrame:
    """``n`` docs in consecutive groups of ``group`` near-identical
    texts: doc ``i`` carries ``n_tokens`` pseudo-random tokens derived
    from its group head ``floor(i / group)``, except the single position
    ``i mod group`` which is doc-unique — so same-group pairs share all
    but ≤2 of the ``n_tokens`` tokens (shingle Jaccard ≈ 0.8+, well
    above the 0.5 near-dup threshold) while cross-group pairs share
    none.  Exactly ``ceil(n / group)`` clusters are planted.

    Returns (doc_id long, text string), repartitioned to ``partitions``;
    callers cache if they intend repeated scans.
    """
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_tokens - 1)),
                    lambda j: F.when(
                        j == F.pmod(F.col("id"), F.lit(group)).cast("int"),
                        F.conv(F.hex(F.abs(F.xxhash64(F.col("id"), j))), 16, 36),
                    ).otherwise(
                        F.conv(
                            F.hex(
                                F.abs(F.xxhash64(F.floor(F.col("id") / group), j))
                            ),
                            16,
                            36,
                        )
                    ),
                ),
            ).alias("text"),
        )
        .repartition(partitions)
    )


def planted_embedding_corpus(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    n_centers: int = 64,
    noise: float = 0.05,
    partitions: int = 32,
) -> DataFrame:
    """``n`` vectors in ``dim`` dims planted around ``n_centers``
    well-separated centers: vector ``i`` = center ``i mod n_centers``
    plus per-coordinate noise, every component an ``xxhash64``-derived
    uniform in [-1, 1] (centers) / [-noise, +noise] (per-vector) — no
    RNG, bit-identical at any parallelism, same discipline as
    :func:`planted_near_dup_corpus`.

    Random centers in [-1,1]^dim sit ~sqrt(2·dim/3) apart (≈6.5 at
    dim=64) while the noise vector's norm is ~noise·sqrt(dim/3)
    (≈0.23 at the default), so each vector's nearest center is its
    planted one by a wide margin — ground truth for quantizer-recall
    checks.  Because ids 0..k-1 belong to k distinct centers (for
    k ≤ n_centers), :func:`~gmail_etl_spark.operators.similarity.
    train_kmeans`'s lowest-id init seeds every cell near a distinct
    planted center.

    Returns (vec_id long, embedding array<double>, center int),
    repartitioned to ``partitions``; callers cache for repeated scans.
    """
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    center = F.pmod(F.col("id"), F.lit(n_centers)).cast("int")

    def _unit(*seed_cols):
        # xxhash64-derived uniform in [-1, 1] with ~1e-3 granularity
        return F.pmod(F.xxhash64(*seed_cols), F.lit(2001)).cast(
            "double"
        ) / 1000.0 - 1.0

    return (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                dims,
                lambda j: _unit(center, j)
                + F.lit(float(noise)) * _unit(F.col("id"), j, F.lit("noise")),
            ).alias("embedding"),
            center.alias("center"),
        )
        .repartition(partitions)
    )


def write_mtime_ordered_batches(
    corpus: DataFrame,
    src_dir: str,
    chunk: int,
    id_col: str = "doc_id",
    prefix: str = "b",
) -> int:
    """Materialize ``corpus`` as one parquet FILE per ``chunk``-sized
    ``id_col`` range under ``src_dir``, with strictly increasing mtimes
    — the micro-batch fixture shape every streaming harness feeds to
    ``maxFilesPerTrigger=1`` sources (file order IS batch order).

    Single distributed pass: rows route to their batch via
    ``floor(id/chunk)`` and ``partitionBy`` writes them together, so
    the generator executes ONCE regardless of batch count (the per-
    range filter-rewrite shape re-executed it once per batch — O(batches
    × n) generation) and nothing flows through the driver (a 2M-row
    corpus does not fit ``toPandas``/driver.maxResultSize).  Returns the
    number of batch files written."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="_batches_", dir=os.path.dirname(src_dir) or ".")
    try:
        (
            corpus.withColumn(
                "__batch", F.floor(F.col(id_col) / F.lit(chunk)).cast("int")
            )
            .repartition("__batch")
            .write.mode("overwrite")
            .partitionBy("__batch")
            .parquet(stage)
        )
        os.makedirs(src_dir, exist_ok=True)
        n_files = 0
        for bdir in sorted(
            _glob.glob(os.path.join(stage, "__batch=*")),
            key=lambda p: int(p.rsplit("=", 1)[1]),
        ):
            parts = _glob.glob(os.path.join(bdir, "part-*.parquet"))
            assert len(parts) == 1, (bdir, parts)  # one hash partition per batch
            path = os.path.join(src_dir, f"{prefix}{n_files:04d}.parquet")
            os.replace(parts[0], path)
            os.utime(path, (1_000_000_000 + n_files,) * 2)
            n_files += 1
        return n_files
    finally:
        shutil.rmtree(stage, ignore_errors=True)
