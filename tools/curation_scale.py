"""Composed curation pipeline at scale — the 100 TB training-data story
run as ONE chained job, with every stage's output EXACTLY checkable.

`tests/test_curation_e2e.py` pins the composition (stages accept each
other's outputs, counts only shrink where they must) at the sf0.001
fixture; the per-operator scale tools (`near_dedup_scale.py`,
`cc_chain_scale.py`, `pipeline_scale.py`) each measure ONE operator in
isolation.  What neither shows is the composed pipeline at millions of
docs — whether the stages still feed each other correctly when the
intermediates no longer fit a single partition, and where the wall-clock
actually goes across stage boundaries.  This tool plants a corpus whose
ground truth makes every stage's row count an EQUALITY, not a bound:

    raw   = n planted near-dup docs (groups of ``group``, n_tokens
            tokens each — the shared generator behind the bench and the
            1M/10M near-dedup series)
          + n//20 EXACT copies of docs 0..n//20-1 (ids offset by n, so
            min-id-wins canonicalization must recover exactly the
            originals)
          + n//50 junk docs of 3 tokens (ids offset by 2n; the junk
            token carries a ``zz_`` prefix so it cannot collide with the
            base-36 planted vocabulary)

    quality gate   drops exactly the junk        -> n + n//20 rows
    exact dedup    collapses exactly the copies  -> n rows (ids 0..n-1)
    near-dedup     collapses each planted group  -> n//group rows
    content split  no text straddles train/eval  (count preserved)
    decontam       planted groups share no 3-shingle -> every eval
                   doc's contamination == 0 exactly
    packing        conserves rows AND total tokens; no multi-item
                   sequence over budget

Near-dup note: because this harness asserts cluster count as a HARD
EQUALITY, it must plant a similarity/parameter margin under which zero
recall loss is the correct expectation — LSH misses are signature-level
correlated (a doc whose signature disagrees with its group head in
every band is isolated from the whole group at once), so the relevant
rate is per-DOC, not per-pair.  The bench's legacy 16-hash/8-band
(2-row) constants over 30-token docs give J ≈ 0.65 and a per-doc
isolation rate of (1-J²)⁸ ≈ 1.7e-4 — measured live: 10,001 clusters vs
10,000 planted at 100k docs, consistent with the r4 10M anomaly
(1,000,060).  The harness instead plants ``--n-tokens 60`` (same-group
J ≥ 0.81) and bands the same 16 hashes one row per band: per-doc
isolation (1-J)¹⁶ ≈ 3e-12, i.e. ≪ 1 expected miss even at 10M docs,
at identical signature cost.  Single-row bands admit more candidate
pairs, but cross-group docs share no tokens (so no minima), and the
exact-Jaccard verify filters anything a stray 64-bit collision adds —
recall is the only approximation, and the margin removes it.

Stage walls are measured with each stage's INPUT cached and counted
(warm), so a stage figure is that stage's own work (plus its first-scan
of the cached input), not a recompute of the whole upstream chain.

Usage:
    PYTHONPATH=. python tools/curation_scale.py [--n 2000000]
        [--group 10] [--n-tokens 60] [--partitions 64]
        [--out CURATION_SCALE_rN.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--group", type=int, default=10)
    ap.add_argument("--n-tokens", type=int, default=60)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--budget", type=int, default=512)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

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
    from gmail_etl_spark.session import get_spark
    from gmail_etl_spark.synthetic import planted_near_dup_corpus

    spark = get_spark("curation-scale")
    spark.sparkContext.setLogLevel("ERROR")

    n, group = args.n, args.group
    n_copies, n_junk = n // 20, n // 50
    planted = planted_near_dup_corpus(
        spark, n, group=group, partitions=args.partitions,
        n_tokens=args.n_tokens,
    )
    copies = (
        planted.filter(F.col("doc_id") < n_copies)
        .select((F.col("doc_id") + n).alias("doc_id"), "text")
    )
    junk = spark.range(n_junk).select(
        (F.col("id") + 2 * n).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("zz_"), F.col("id").cast("string")),
            F.lit("zz_b"),
            F.lit("zz_c"),
        ).alias("text"),
    )
    raw = planted.unionByName(copies).unionByName(junk).cache()
    n_raw = raw.count()
    assert n_raw == n + n_copies + n_junk, n_raw

    stages: list[dict] = []

    def stage(name: str, fn, expect: int | None, invariant: str) -> tuple:
        t0 = time.perf_counter()
        out_df, observed, extra = fn()
        wall = round(time.perf_counter() - t0, 2)
        ok = (expect is None) or (observed == expect)
        stages.append(
            {
                "stage": name,
                "rows_out": observed,
                "expected": expect,
                "wall_s": wall,
                "invariant": invariant,
                "ok": bool(ok),
                **extra,
            }
        )
        status = "ok" if ok else "FAIL"
        print(f"[{status}] {name}: rows={observed} expect={expect} {wall}s")
        assert ok, (name, observed, expect)
        return out_df

    # 1. quality gate — must drop exactly the junk docs
    def _quality():
        q = raw.filter(F.size(F.split("text", " ")) >= 10).cache()
        return q, q.count(), {}

    quality = stage(
        "quality_gate", _quality, n + n_copies,
        "drops exactly the n//50 planted 3-token junk docs",
    )

    # 2. exact dedup — must collapse exactly the planted copies, and
    # min-id-wins must recover the ORIGINAL ids (all < n)
    def _exact():
        canon = exact_dedup(quality, "doc_id", "text").select(
            F.col("canonical_id").alias("doc_id")
        )
        s2 = quality.join(canon, "doc_id").cache()
        cnt = s2.count()
        mx = s2.agg(F.max("doc_id")).collect()[0][0]
        assert mx == n - 1, mx
        return s2, cnt, {"max_canonical_id": mx}

    stage2 = stage(
        "exact_dedup", _exact, n,
        "collapses exactly the n//20 offset-id copies; min-id "
        "canonicalization recovers every original id",
    )
    raw.unpersist()

    # 3. near-dedup — LSH pairs -> CC -> one canonical doc per planted
    # group, as a hard equality (see module docstring on the margin)
    def _near():
        pairs = minhash_lsh_pairs(
            stage2, "doc_id", "text", k=3, n_hashes=16, bands=16,
            threshold=0.5,
        )
        s3 = near_dedup(stage2, "doc_id", pairs).cache()
        return s3, s3.count(), {}

    stage3 = stage(
        "near_dedup", _near, math.ceil(n / group),
        "one canonical row per planted group of ``group`` near-dups",
    )
    quality.unpersist()
    stage2.unpersist()

    # 4. content-keyed split — count preserved, no text straddles
    def _split():
        s = hash_split(stage3, "text", train_pct=80).cache()
        cnt = s.count()
        straddle = (
            s.groupBy("text")
            .agg(F.count_distinct("split").alias("k"))
            .filter(F.col("k") > 1)
            .count()
        )
        assert straddle == 0, straddle
        return s, cnt, {"straddling_texts": straddle}

    split = stage(
        "hash_split", _split, math.ceil(n / group),
        "content-keyed 80/20 split preserves count; no text straddles",
    )
    stage3.unpersist()

    train = split.filter(F.col("split") == "train").cache()
    evald = split.filter(F.col("split") == "eval").cache()
    n_train, n_eval = train.count(), evald.count()
    assert n_train + n_eval == math.ceil(n / group)

    # 5. decontamination — planted groups share no tokens, so every
    # eval doc's 3-shingle overlap with train is exactly zero
    def _decontam():
        rep = contamination_report(evald, train, "doc_id", "text")
        agg = rep.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("contamination").alias("mx"),
        ).collect()[0]
        assert agg["mx"] == 0.0, agg["mx"]
        return rep, agg["cnt"], {"max_contamination": agg["mx"]}

    stage(
        "decontamination", _decontam, n_eval,
        "one report row per eval doc; cross-group docs share no "
        "3-shingle, so max contamination == 0.0 exactly",
    )

    # 6. sequence packing — conserves rows and total tokens; no
    # multi-item sequence over budget
    def _pack():
        with_tokens = train.select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
        )
        packed = pack_sequences(
            with_tokens, "doc_id", "n_tokens", budget=args.budget
        ).cache()
        agg = packed.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_tokens").alias("tok"),
            F.count_distinct("item_id").alias("ids"),
            F.count_distinct("seq_id").alias("n_seqs"),
        ).collect()[0]
        assert agg["tok"] == n_train * args.n_tokens, agg["tok"]
        assert agg["ids"] == agg["cnt"], (agg["ids"], agg["cnt"])
        over = (
            packed.groupBy("seq_id")
            .agg(
                F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("m")
            )
            .filter((F.col("t") > args.budget) & (F.col("m") > 1))
            .count()
        )
        assert over == 0, over
        packed.unpersist()
        return packed, agg["cnt"], {
            "total_tokens": agg["tok"],
            "n_sequences": agg["n_seqs"],
            "overfull_multi_item_seqs": over,
        }

    stage(
        "pack_sequences", _pack, n_train,
        "every surviving train doc packed exactly once; total tokens "
        "conserved; no multi-item sequence exceeds the budget",
    )

    total = round(sum(s["wall_s"] for s in stages), 2)
    result = {
        "metric": "composed_curation_scale",
        "n_raw": n_raw,
        "n_planted": n,
        "group": group,
        "n_tokens": args.n_tokens,
        "partitions": args.partitions,
        "stages": stages,
        "total_wall_s": total,
        "raw_docs_per_sec": round(n_raw / total, 1),
        "all_invariants_exact": all(s["ok"] for s in stages),
        "loadavg": list(os.getloadavg()),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
