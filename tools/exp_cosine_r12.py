"""r12 experiment: pre-join norm materialization for cosine_topk (q50).

cosine(q_vec, c_vec) recomputes _norm(c_vec) for EVERY query it is
scored against (n_queries x per corpus row) and _norm(q_vec) per corpus
row.  Variant B computes each side's norm once in its pre-join
projection; dot/(q_norm*c_norm) is the same double-precision expression
tree shape, so results are bit-identical.
"""

from __future__ import annotations

import time

from pyspark.sql import Window, functions as F

from gmail_etl_spark.operators.similarity import _dot, _norm, cosine_topk
from gmail_etl_spark.plans.catalog import load_table
from gmail_etl_spark.session import get_spark

spark = get_spark("exp-cosine-r12")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
emb = load_table(spark, sf_dir, "embeddings")
emb.count()


def vA():
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(queries, emb, k=5).orderBy("query_id", "rank")


def vB():
    queries = emb.filter(F.col("vec_id") < 10)
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
    ).withColumn("q_norm", _norm(F.col("q_vec")))
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    ).withColumn("c_norm", _norm(F.col("c_vec")))
    joined = c.crossJoin(F.broadcast(q))
    scored = joined.filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")), 6
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


def checksum(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64(*df.columns)).alias("x")
    ).collect()[0]
    return row["n"], row["x"]


for name, fn in [("A_current", vA), ("B_prenorm", vB)]:
    n, x = checksum(fn())
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fn().count()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: best5={best:.3f}s n={n} checksum={x}", flush=True)
