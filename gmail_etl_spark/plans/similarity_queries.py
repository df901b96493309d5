"""Similarity-search catalog entries (X1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmail_etl_spark.operators.similarity import cosine_topk
from gmail_etl_spark.plans.catalog import load_table, query

# ---------------------------------------------------------------------------
# q50 — brute-force cosine top-k (exact baseline)
# ---------------------------------------------------------------------------


@query(
    "q50_knn_exact",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c_vec FROM embeddings),
    scored AS (
        SELECT q.query_id, c.neighbor_id,
               round(list_cosine_similarity(q.q_vec, c.c_vec), 6) AS sim
        FROM q CROSS JOIN c
        WHERE q.query_id <> c.neighbor_id
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    survey="X1",
    headline=True,
)
def q50_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(queries, emb, k=5).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q51 — IVF-partitioned kNN: probe only the query's coarse cell
# ---------------------------------------------------------------------------


@query(
    "q51_knn_ivf",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label AS cell, embedding::DOUBLE[] AS q_vec
               FROM embeddings WHERE vec_id < 20),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.q_vec, c.embedding::DOUBLE[]), 6) AS sim
        FROM q JOIN embeddings c ON c.label = q.cell
        WHERE q.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= 3
    ORDER BY query_id, rank
    """,
    survey="X1",
)
def q51_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF structure with the class label standing in as the coarse
    quantizer cell: each query probes one cell instead of the full
    corpus — the 100 TB shape (cells = partition key), exact within the
    probed cell, oracle-checkable because the cell assignment is a
    column."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return cosine_topk(queries, emb, k=3, cell_col="label").orderBy("query_id", "rank")
