"""Similarity search over embedding columns (SURVEY §2.8 X1).

Brute-force cosine top-k is the exactness baseline: a broadcast of the
(small) query set against a distributed corpus scan — no shuffle at all
until the final per-query top-k, which AQE keeps tiny.  The scale path
partitions the corpus into coarse cells (IVF) so each query probes a
cell subset; here the cell id is a column (label / any clustering
output), keeping the operator declarative.

The dot products run as JVM array expressions (``zip_with`` +
``aggregate``) — vectorized codegen, no Python.  Arrays are cast to
double so results are bit-identical to any double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two ARRAY<DOUBLE> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    cell_col: str | None = None,
) -> DataFrame:
    """Top-k corpus neighbors per query by cosine similarity.

    ``cell_col`` switches brute-force → IVF: the join keys on the cell
    so each query only scans its cell's corpus partition.  Returns
    (query_id, neighbor_id, sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
        *([F.col(cell_col).alias("q_cell")] if cell_col else []),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
        *([F.col(cell_col).alias("c_cell")] if cell_col else []),
    )
    if cell_col:
        joined = c.join(F.broadcast(q), F.col("q_cell") == F.col("c_cell"))
    else:
        joined = c.crossJoin(F.broadcast(q))
    scored = joined.filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
