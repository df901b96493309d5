"""r13: interleaved same-process A/B of the LSH exact-verify stage.

OLD = r12 formulation (jaccard expression built post-join and consumed
by BOTH the threshold filter and the output projection; Catalyst's
PushPredicateThroughNonJoin clones the full expression into the second
join's condition, so ``array_intersect`` runs ~4x per surviving pair —
see the committed plan ``plans/r12/near_dedup_pairs_subplan_after.txt``
lines 140/143).

NEW = per-side set sizes materialized below the join (size once per doc
instead of twice per pair) + the intersection materialized in ONE
projection, with a never-true non-deterministic OR-guard on the
threshold filter so the optimizer cannot push the predicate through the
projection and re-duplicate the non-cheap intersect (guide §1.2
per-task work; §4.4's stop-the-optimizer-duplicating principle applied
to a JVM expression).

Both sides run on the SAME eagerly-checkpointed signature and candidate
frames, so the A/B times the verify stage alone; parity is an exact
(count, xor of row hashes) checksum.  Repeats alternate OLD/NEW so host
load drift cannot bias either side.
"""

from __future__ import annotations

import os
import statistics
import time

from pyspark.sql import DataFrame, functions as F

from gmail_etl_spark.operators.dedup import (
    _lsh_buckets,
    _lsh_sigs,
    capped_pair_candidates,
)
from gmail_etl_spark.session import get_spark
from gmail_etl_spark.synthetic import planted_near_dup_corpus

N_HASHES, BANDS, THRESHOLD, MAX_BUCKET = 16, 8, 0.5, 512

spark = get_spark("exp-verify-r13")
spark.sparkContext.setLogLevel("ERROR")
docs = planted_near_dup_corpus(spark, 100_000).cache()
docs.count()

# shared stage inputs, materialized once (stage isolation per guide §1)
sigs = (
    _lsh_sigs(docs, "doc_id", "text", 3, N_HASHES)
    .select("id", "sig", "hsh")
    .localCheckpoint(eager=True)
)
cand = capped_pair_candidates(
    _lsh_buckets(sigs, N_HASHES, BANDS), MAX_BUCKET
).localCheckpoint(eager=True)


def old_verify(broadcast_verify: bool = True) -> DataFrame:
    sh = sigs.select("id", "hsh")
    sh = F.broadcast(sh) if broadcast_verify else sh.hint("shuffle_hash")
    c = (
        cand.join(sh.select(F.col("id").alias("a_id"), F.col("hsh").alias("a_sh")), "a_id")
        .join(sh.select(F.col("id").alias("b_id"), F.col("hsh").alias("b_sh")), "b_id")
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size("a_sh") + F.size("b_sh") - inter
    return (
        c.select(
            "a_id",
            "b_id",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= THRESHOLD)
    )


def new_verify(broadcast_verify: bool = True) -> DataFrame:
    sh = sigs.select("id", "hsh", F.size("hsh").alias("n"))
    sh = F.broadcast(sh) if broadcast_verify else sh.hint("shuffle_hash")
    c = (
        cand.join(
            sh.select(
                F.col("id").alias("a_id"), F.col("hsh").alias("a_sh"), F.col("n").alias("a_n")
            ),
            "a_id",
        )
        .join(
            sh.select(
                F.col("id").alias("b_id"), F.col("hsh").alias("b_sh"), F.col("n").alias("b_n")
            ),
            "b_id",
        )
    )
    with_inter = c.select(
        "a_id",
        "b_id",
        "a_n",
        "b_n",
        F.size(F.array_intersect("a_sh", "b_sh")).alias("_inter"),
    )
    jaccard = F.col("_inter").cast("double") / (
        F.col("a_n") + F.col("b_n") - F.col("_inter")
    ).cast("double")
    # greatest(jac, rand(42)-2) is value-identical (jaccard is in [0,1],
    # the rand term in [-2,-1)) but NON-DETERMINISTIC, which stops the
    # optimizer from (a) collapsing the projection back over the
    # non-cheap _inter alias and (b) pushing the threshold filter (and
    # with it a clone of the full intersect expression) into the join
    # condition.  A plain rand OR-guard in the filter does NOT work:
    # Spark 4 folds comparisons outside Rand's known [0,1) range.
    out = with_inter.select(
        "a_id",
        "b_id",
        F.greatest(jaccard, F.rand(42) - F.lit(2.0)).alias("jaccard"),
    )
    return out.filter(F.col("jaccard") >= F.lit(THRESHOLD))


def checksum(df: DataFrame):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("a_id", "b_id", F.col("jaccard").cast("string"))).alias("x"),
    ).collect()[0]
    return row["n"], row["x"]


def plan_intersects(df: DataFrame) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("array_intersect")


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


old_df, new_df = old_verify(), new_verify()
print("checksum old:", checksum(old_df), flush=True)
print("checksum new:", checksum(new_df), flush=True)
assert checksum(old_df) == checksum(new_df), "verify outputs diverged"
print("plan array_intersect count: old =", plan_intersects(old_df),
      " new =", plan_intersects(new_df), flush=True)

noop(old_df); noop(new_df)  # warm
old_s, new_s = [], []
for i in range(6):
    t0 = time.perf_counter(); noop(old_verify()); old_s.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); noop(new_verify()); new_s.append(time.perf_counter() - t0)
    print(
        f"round {i}: old={old_s[-1]:.3f} new={new_s[-1]:.3f} "
        f"load={os.getloadavg()[0]:.1f}",
        flush=True,
    )
print(f"OLD min={min(old_s):.3f} med={statistics.median(old_s):.3f}")
print(f"NEW min={min(new_s):.3f} med={statistics.median(new_s):.3f}")
