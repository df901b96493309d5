"""r12 experiment: is the minhash base hash recomputed per permutation?

Times three formulations of the signature+bucket stage on the bench
corpus (100k docs), all bit-identical in output:

  A. current  — _lsh_sigs as shipped
  B. base-col — materialize the base-hash array as its own column, then
                16 array_min transforms over the column
  C. hsh-first — compute hsh (xxhash64 per shingle) once, derive base =
                transform(hsh, pmod) as a column, then the 16 mins

Prints bucket-count wall times and a checksum of the buckets frame so
equivalence is verified in the same run.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from gmail_etl_spark.operators.dedup import (
    _lsh_buckets,
    _lsh_sigs,
    _mh_ab,
    _MH_P,
    shingles,
)
from gmail_etl_spark.session import get_spark
from gmail_etl_spark.synthetic import planted_near_dup_corpus

spark = get_spark("exp-sigs-r12")
spark.sparkContext.setLogLevel("ERROR")
docs = planted_near_dup_corpus(spark, 100_000).cache()
docs.count()

n_hashes, bands = 16, 8


def sigs_A():
    return _lsh_sigs(docs, "doc_id", "text", 3, n_hashes)


def _perm_cols(base_col):
    cols = []
    for i in range(n_hashes):
        a, b = _mh_ab(i)
        cols.append(
            F.array_min(
                F.transform(base_col, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MH_P)))
            )
        )
    return F.array(*cols)


def sigs_B():
    return (
        docs.select(F.col("doc_id").alias("id"), shingles(F.col("text"), 3).alias("shingles"))
        .withColumn("_base", F.transform("shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(_MH_P))))
        .withColumn("sig", _perm_cols(F.col("_base")))
        .withColumn("hsh", F.expr("array_distinct(transform(shingles, s -> xxhash64(s)))"))
        .drop("_base")
    )


def sigs_C():
    return (
        docs.select(F.col("doc_id").alias("id"), shingles(F.col("text"), 3).alias("shingles"))
        .withColumn("hsh", F.expr("array_distinct(transform(shingles, s -> xxhash64(s)))"))
        .withColumn("_base", F.transform("hsh", lambda h: F.pmod(h, F.lit(_MH_P))))
        .withColumn("sig", _perm_cols(F.col("_base")))
        .drop("_base")
    )


def bucket_checksum(sigs):
    b = _lsh_buckets(sigs, n_hashes, bands)
    return b.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("bucket", F.expr("array_sort(ids)").cast("string"))).alias("x"),
    ).collect()[0]


for name, fn in [("A_current", sigs_A), ("B_base_col", sigs_B), ("C_hsh_first", sigs_C)]:
    chk = bucket_checksum(fn())  # warm + checksum
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        n = _lsh_buckets(fn(), n_hashes, bands).count()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: best3={best:.3f}s  n={chk['n']} checksum={chk['x']}", flush=True)
