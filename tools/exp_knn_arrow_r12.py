"""r12 experiment: mapInPandas -> mapInArrow for cosine_topk_vectorized.

The pandas kernel pays pdf["c_vec"].tolist() -> np.array per batch (a
Python-object round trip over every element).  The Arrow kernel slices
the list column's values buffer directly (flatten + reshape — near
zero-copy).  The math is the same numpy ops, and the partial-top-k +
final-window merge is batching-independent, so results are identical.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from gmail_etl_spark.operators.similarity import cosine_topk_vectorized
from gmail_etl_spark.session import get_spark

spark = get_spark("exp-knn-arrow-r12")
spark.sparkContext.setLogLevel("ERROR")

emb = (
    spark.range(100_000)
    .select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)) / 500.0 - 1.0,
        ).alias("embedding"),
    )
    .repartition(32)
    .cache()
)
emb.count()


def vA():
    return cosine_topk_vectorized(emb.filter(F.col("vec_id") < 8), emb, k=10)


def vB():
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import Window

    queries, corpus, id_col, vec_col, k = (
        emb.filter(F.col("vec_id") < 8), emb, "vec_id", "embedding", 10
    )
    q_rows = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("q_vec"),
        ).collect()
    )
    q_ids = np.array([r["query_id"] for r in q_rows])
    q_mat = np.array([r["q_vec"] for r in q_rows], dtype=np.float64)
    q_norms = np.linalg.norm(q_mat, axis=1, keepdims=True)
    np.divide(q_mat, q_norms, out=q_mat, where=q_norms > 0)

    def _kernel(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            ids = b.column(0).to_numpy(zero_copy_only=False)
            lst = b.column(1)
            flat = lst.flatten().to_numpy(zero_copy_only=False)
            c = flat.reshape(b.num_rows, -1).astype(np.float64, copy=True)
            norms = np.linalg.norm(c, axis=1, keepdims=True)
            np.divide(c, norms, out=c, where=norms > 0)
            sims = c @ q_mat.T
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                col = sims[:, j]
                mask = ids != qid
                cand_ids, cand_sims = ids[mask], col[mask]
                if len(cand_ids) > k:
                    order = np.lexsort((cand_ids, -np.round(cand_sims, 6)))[:k]
                else:
                    order = np.arange(len(cand_ids))
                out_q.extend([qid] * len(order))
                out_n.extend(cand_ids[order])
                out_s.extend(cand_sims[order])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_q, type=pa.int64()),
                    pa.array(out_n, type=pa.int64()),
                    pa.array(np.asarray(out_s, dtype=np.float64), type=pa.float64()),
                ],
                names=["query_id", "neighbor_id", "sim"],
            )

    partials = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).mapInArrow(_kernel, "query_id bigint, neighbor_id bigint, sim double")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        partials.withColumn("sim", F.round("sim", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def checksum(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64(*df.columns)).alias("x")
    ).collect()[0]
    return row["n"], row["x"]


for name, fn in [("A_mapInPandas", vA), ("B_mapInArrow", vB)]:
    n, x = checksum(fn())
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        assert fn().count() == 80
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: best5={best:.3f}s n={n} checksum={x}", flush=True)
