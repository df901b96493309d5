#!/usr/bin/env python
"""Per-round benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall-clock seconds.

Queries are materialized with a count-collect (``df.count()`` after the
full plan — no driver-side data transfer beyond the result cardinality),
timed individually after a session warm-up query so JVM startup isn't
billed to q-times.  ``total`` is the sum of query times (not session
startup).
"""

from __future__ import annotations

import json
import os
import time

# per-entry steady-state repeat counts — used by BOTH the timing loops
# and the emitted noise-protocol metadata, so the artifact can never
# misreport its own methodology
REPEATS_HEADLINE = 3
REPEATS_PIPELINE = 3
REPEATS_KNN = 5
REPEATS_NEAR_DEDUP = 7

# load gate (VERDICT r5 #2): the committed BENCH_r05 artifact was taken
# at loadavg 15-19 on 32 CPUs and read 2.2x the same code's quiet-window
# figure.  A timed artifact recorded under co-tenant load is worse than
# a late one, so the bench refuses to *start* until the host is quiet —
# bounded, so a driver-timed run can still complete on a busy host; the
# artifact then self-reports whether the gate held (load_gate.ok).
#
# ADVICE r6: (a) the constants are env-tunable — a caller with a tight
# wall-clock budget sets SPARK_GRAFT_LOAD_GATE_MAX_WAIT=0 to skip the
# wait entirely (the artifact still records the observed load); (b) a
# single 1-min loadavg sample lags ramping contention, so "quiet" now
# means TWO consecutive quiet samples a confirmation interval apart.
LOAD_GATE_RATIO = float(os.environ.get("SPARK_GRAFT_LOAD_GATE_RATIO", "0.25"))
LOAD_GATE_MAX_WAIT_SEC = float(
    os.environ.get("SPARK_GRAFT_LOAD_GATE_MAX_WAIT", "300")
)
LOAD_GATE_POLL_SEC = float(os.environ.get("SPARK_GRAFT_LOAD_GATE_POLL", "15"))
LOAD_GATE_CONFIRM_SEC = 5.0  # spacing of the two quiet samples

# noisy-entry retry (VERDICT r7 #7): the start gate can pass and
# co-tenant load still arrive mid-run; per-entry loadavg attributes it,
# and this pass RE-MEASURES any entry whose pre-entry loadavg exceeded
# the gate ratio — once, at the end, and only if the host is quiet by
# then (re-timing under the same noise would learn nothing).  Keeps the
# min of both measurements; the artifact self-describes every retry.
REPEAT_NOISY = os.environ.get("SPARK_GRAFT_REPEAT_NOISY", "1") != "0"
# retry cool-down (VERDICT r8 #4): at end-of-run the 1-min loadavg still
# carries the bench's OWN just-finished Spark work (a quiet-start run
# legitimately ends at ~16-20 on 32 CPUs), so the retry's quiet
# precondition never held in practice and the pass had never fired.
# Once the process idles, loadavg1 decays ~exp(-t/60); a bounded wait
# lets the retry distinguish self-heat (decays under the gate within a
# couple of minutes) from genuine co-tenancy (doesn't).
RETRY_COOLDOWN_MAX_SEC = float(
    os.environ.get("SPARK_GRAFT_RETRY_COOLDOWN_MAX", "150")
)
RETRY_COOLDOWN_POLL_SEC = 5.0

# same-host A/B vs the previous round's HEAD (VERDICT r10 #2): absolute
# figures drift ±10% hour-to-hour on this shared host (r9 code measured
# 16.3 s on the r10 host vs its committed 11.9 s), so the binding
# regression signal is RELATIVE — this run vs the prior round's code,
# measured back-to-back in the same quiet window with the same warm
# page cache.  The prior HEAD is git-archived to a temp dir and its own
# bench.py runs as a subprocess (its internal load gate waits out this
# run's self-heat); the emitted artifact carries {prev_total,
# head_total, ratio} as first-class JSON.  SPARK_GRAFT_PREV_AB=0
# disables (set automatically inside the subprocess); SPARK_GRAFT_PREV_REF
# overrides the auto-detected "round N:" boundary commit.
PREV_AB = os.environ.get("SPARK_GRAFT_PREV_AB", "1") != "0"
PREV_AB_TIMEOUT_SEC = float(os.environ.get("SPARK_GRAFT_PREV_AB_TIMEOUT", "1800"))


def _warm_page_cache(sf_dir: str) -> int:
    """Read every byte of the benchmark inputs once so neither side of
    the A/B pays cold-cache I/O (a first quiet run after heavy artifact
    churn measured 35.9 s vs 14.1 s warm — page-cache state is the
    dominant cross-session variable on this host)."""
    total = 0
    for root, _, files in os.walk(sf_dir):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while chunk := fh.read(1 << 22):
                    total += len(chunk)
    return total


def _resolve_prev_ref(repo: str) -> tuple[str, str] | None:
    """(sha, subject) of the previous round's closing commit: the newest
    commit whose subject starts with "round N:" (the per-round
    bookkeeping commit), or SPARK_GRAFT_PREV_REF if set."""
    import re
    import subprocess

    override = os.environ.get("SPARK_GRAFT_PREV_REF")
    if override:
        sha, subj = (
            subprocess.check_output(
                ["git", "log", "-1", "--format=%H\t%s", override],
                cwd=repo, text=True,
            ).strip().split("\t", 1)
        )
        return sha, subj
    out = subprocess.check_output(
        ["git", "log", "--format=%H\t%s"], cwd=repo, text=True
    )
    for line in out.splitlines():
        sha, _, subj = line.partition("\t")
        if re.match(r"^round \d+:", subj):
            return sha, subj
    return None


def _run_prev_bench(sf_dir: str) -> dict:
    """Archive the previous round's HEAD into a temp dir, run ITS
    bench.py there in a subprocess against the same data, and return
    its parsed JSON line plus the ref it measured."""
    import shutil
    import subprocess
    import sys
    import tarfile
    import tempfile
    from io import BytesIO

    repo = os.path.dirname(os.path.abspath(__file__))
    sha = subject = None
    tmp = tempfile.mkdtemp(prefix="bench_prev_")
    try:
        # inside the try: a bad SPARK_GRAFT_PREV_REF, a non-git tree,
        # or a missing git binary must degrade to an error FIELD — the
        # timed run's JSON line has already been earned at this point
        ref = _resolve_prev_ref(repo)
        if ref is None:
            return {"error": "no prior round-boundary commit found"}
        sha, subject = ref
        tar_bytes = subprocess.check_output(
            ["git", "archive", "--format=tar", sha], cwd=repo
        )
        with tarfile.open(fileobj=BytesIO(tar_bytes)) as tf:
            try:
                tf.extractall(tmp, filter="data")
            except TypeError:
                # Python < 3.12 without the filter backport: the archive
                # is our own git tree (trusted), so plain extraction is
                # safe — and the A/B evidence beats a silent skip
                # (ADVICE r11)
                tf.extractall(tmp)
        env = dict(os.environ)
        env["SPARK_GRAFT_PREV_AB"] = "0"  # no recursion
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        env["PYTHONPATH"] = tmp + os.pathsep + env.get("PYTHONPATH", "")
        # bound the child's quiet-wait: it mostly absorbs THIS run's
        # self-heat, which decays in ~1-2 min; don't let a driver-timed
        # bench stall the full 300 s default on a genuinely busy host
        env.setdefault("SPARK_GRAFT_LOAD_GATE_MAX_WAIT", "150")
        proc = subprocess.run(
            [sys.executable, "bench.py"],
            cwd=tmp, env=env, capture_output=True, text=True,
            timeout=PREV_AB_TIMEOUT_SEC,
        )
        parsed = None
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("{"):
                parsed = json.loads(line)
                break
        if parsed is None:
            return {
                "ref": sha, "subject": subject,
                "error": f"prev bench emitted no JSON (rc={proc.returncode}): "
                + proc.stderr[-500:],
            }
        return {"ref": sha, "subject": subject, "result": parsed}
    except Exception as exc:  # A/B is evidence, never a bench-breaker
        out = {"error": repr(exc)}
        if sha is not None:
            out["ref"], out["subject"] = sha, subject
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _wait_for_quiet_host() -> dict:
    """Block (bounded) until the host is quiet; return gate metadata.

    Quiet = 1-min loadavg per CPU under the ratio on two consecutive
    samples LOAD_GATE_CONFIRM_SEC apart (a single sample passes while
    load is still ramping, because the 1-min average lags)."""
    import sys

    cpus = os.cpu_count() or 1
    initial = os.getloadavg()[0]
    waited = 0.0
    load = initial
    quiet_streak = 1 if load / cpus <= LOAD_GATE_RATIO else 0
    while quiet_streak < 2 and waited < LOAD_GATE_MAX_WAIT_SEC:
        step = LOAD_GATE_CONFIRM_SEC if quiet_streak else LOAD_GATE_POLL_SEC
        if not quiet_streak:
            print(
                f"bench: loadavg {load:.1f}/{cpus} cpus exceeds gate "
                f"ratio {LOAD_GATE_RATIO}; waiting {step:.0f}s "
                f"({waited:.0f}/{LOAD_GATE_MAX_WAIT_SEC:.0f}s elapsed)",
                file=sys.stderr,
            )
        # clamp BOTH the sleep and the accounting to the remaining
        # budget, so waited_sec never overstates the actual wait
        sleep_for = min(step, LOAD_GATE_MAX_WAIT_SEC - waited)
        time.sleep(sleep_for)
        waited += sleep_for
        load = os.getloadavg()[0]
        quiet_streak = quiet_streak + 1 if load / cpus <= LOAD_GATE_RATIO else 0
    return {
        "ratio_threshold": LOAD_GATE_RATIO,
        "cpus": cpus,
        "initial_loadavg1": round(initial, 2),
        "start_loadavg1": round(load, 2),
        "start_loadavg5": round(os.getloadavg()[1], 2),
        "waited_sec": round(waited, 1),
        "confirmed_quiet_twice": quiet_streak >= 2,
        "ok_at_start": load / cpus <= LOAD_GATE_RATIO,
    }


def main() -> None:
    load_gate = _wait_for_quiet_host()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cache_warm_bytes = _warm_page_cache(sf_dir)
    from gmail_etl_spark.plans.catalog import CATALOG, _ensure_loaded
    from gmail_etl_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("gmail-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = {name: cq for name, cq in CATALOG.items() if cq.headline}
    # warm-up: touch every table once so file listing + footer reads are
    # not attributed to the first query.
    from gmail_etl_spark.plans.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    # one warm-up execution per query (JIT + codegen + broadcast warm),
    # then best-of-3 steady-state timings — the figure that projects to
    # a long-lived cluster, where plans run thousands of times.
    for name, cq in sorted(headline.items()):
        cq.builder(spark, sf_dir).count()

    # per-entry load attribution (VERDICT r6 #2): the start gate can
    # pass and co-tenant load still arrive mid-run; sampling loadavg
    # immediately before each timed entry lets a reader attribute any
    # outlier entry to host noise without a re-run.
    times: dict[str, float] = {}
    entry_loadavg: dict[str, float] = {}
    #: entry -> (repeat count, zero-arg steady-state runner) — collected
    #: as entries are timed so the noisy-entry retry pass at the end can
    #: re-measure any of them generically
    runners: dict[str, tuple[int, object]] = {}

    def _mark(name: str) -> None:
        entry_loadavg[name] = round(os.getloadavg()[0], 2)

    def _time_best(name: str, repeats: int, run) -> None:
        _mark(name)
        runners[name] = (repeats, run)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    for name, cq in sorted(headline.items()):

        def _headline_run(cq=cq) -> None:
            assert cq.builder(spark, sf_dir).count() >= 0

        _time_best(name, REPEATS_HEADLINE, _headline_run)

    # Gmail-pipeline throughput: the reference's whole workload is ~300
    # messages per serial run (resources/gmail_functions.py:151); here
    # 20,000 messages run through the full stage-1 transform (header
    # pivot, date parse, body decode, html strip, vendor enrichment).
    from pyspark.sql import functions as F

    from gmail_etl_spark.pipeline import transform_stage1
    from gmail_etl_spark.sources.fixtures import fixture_raw_df

    corpus = (
        fixture_raw_df(spark)
        .crossJoin(spark.range(2000).select(F.col("id").alias("_rep")))
        .withColumn("id", F.concat_ws("-", "id", "_rep"))
        .drop("_rep")
    )

    # count() is NOT a valid materializer here: transform_stage1 is pure
    # projection, so Catalyst column-prunes every stage — including the
    # three pandas UDFs — out of a count plan (verified: it contains no
    # ArrowEvalPython node).  Hashing every output column forces the
    # full transform while moving a single row to the driver.
    def _pipeline_run() -> int:
        out = transform_stage1(corpus)
        hashed = out.select(F.xxhash64(*out.columns).alias("h"))
        # bit_xor CONSUMES h — a bare count would let the pruner drop
        # the hash projection and re-introduce the same dead plan
        row = hashed.agg(
            F.count(F.lit(1)).alias("n"), F.bit_xor("h").alias("x")
        ).collect()[0]
        return row["n"]

    def _pipeline_timed() -> None:
        assert _pipeline_run() == 20000

    _pipeline_timed()  # warm
    _time_best("gmail_pipeline_20k_msgs", REPEATS_PIPELINE, _pipeline_timed)

    # --- scale-path entries (same methodology as the headline queries:
    # one warm-up run for JIT/codegen, then best-of-5 steady state; the
    # extra repeats vs the sub-second entries exist because these two
    # run long enough to straddle host-noise bursts (documented ±2×
    # co-tenant variance), and the minimum is the figure that projects
    # to a long-lived cluster) ---
    from gmail_etl_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from gmail_etl_spark.operators.similarity import cosine_topk_vectorized

    # 100k x 64-dim embeddings: brute-force cosine top-10 via the
    # Arrow/numpy kernel (one matmul per batch, partial top-k merge).
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

    def _knn_run() -> None:
        n = cosine_topk_vectorized(emb.filter(F.col("vec_id") < 8), emb, k=10).count()
        assert n == 80

    _knn_run()  # warm
    _time_best("knn_100k_vectorized", REPEATS_KNN, _knn_run)

    # 100k docs in planted near-dup groups of 10: MinHash+LSH candidate
    # pairs -> connected components -> exactly 10,000 clusters.
    from gmail_etl_spark.synthetic import planted_near_dup_corpus

    docs = planted_near_dup_corpus(spark, 100_000).cache()
    docs.count()

    def _dedup_run() -> None:
        # broadcast_verify: the 100k-doc hashed-shingle table is ~25 MB
        # — the documented fits-in-memory case for the broadcast verify
        # path (operators/dedup.py); corpus-scale callers keep the
        # default shuffle_hash plan.
        pairs = minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, n_hashes=16, bands=8, threshold=0.5,
            broadcast_verify=True,
        )
        # canonical_input: minhash_lsh_pairs emits distinct least/greatest
        # pairs by construction, so CC skips its canonicalizing shuffle.
        comp = connected_components(
            pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")),
            canonical_input=True,
        )
        n_clusters = comp.select("component").distinct().count()
        assert n_clusters == 10_000, n_clusters

    _dedup_run()  # warm
    # 7 repeats (vs 5 for the sub-second entries): this is the only
    # multi-second entry, so a single co-tenant noise burst can shadow
    # several repeats; the minimum over 7 is the steady-state estimator
    _time_best("near_dedup_100k_docs", REPEATS_NEAR_DEDUP, _dedup_run)

    # --- noisy-entry retry pass (VERDICT r7 #7): re-measure, once and
    # only on a by-now-quiet host, any entry whose pre-entry loadavg
    # exceeded the gate ratio; keep the min and self-describe ---
    cpus = load_gate["cpus"]
    noisy_entry_retries: dict[str, dict] = {}
    retry_cooldown = {"needed": False, "waited_sec": 0.0, "quiet": None}
    if REPEAT_NOISY:
        noisy = [
            n for n, la in entry_loadavg.items() if la / cpus > LOAD_GATE_RATIO
        ]
        if noisy:
            # bounded cool-down (VERDICT r8 #4): the end-of-run loadavg
            # is dominated by the bench's own just-finished work, so
            # without this wait the quiet precondition below never held
            # and the retry pass could not do its job for exactly the
            # entries that need it most.  Idle here until loadavg1
            # decays under the gate or the bound expires — self-heat
            # decays in ~1-2 min, genuine co-tenancy does not.
            retry_cooldown["needed"] = True
            waited = 0.0
            while (
                os.getloadavg()[0] / cpus > LOAD_GATE_RATIO
                and waited < RETRY_COOLDOWN_MAX_SEC
            ):
                step = min(
                    RETRY_COOLDOWN_POLL_SEC, RETRY_COOLDOWN_MAX_SEC - waited
                )
                time.sleep(step)
                waited += step
            retry_cooldown["waited_sec"] = round(waited, 1)
            retry_cooldown["quiet"] = (
                os.getloadavg()[0] / cpus <= LOAD_GATE_RATIO
            )
        for name, la in entry_loadavg.items():
            if la / cpus <= LOAD_GATE_RATIO:
                continue
            now = os.getloadavg()[0]
            info = {
                "entry_loadavg1": la,
                "retry_loadavg1": round(now, 2),
                "before_sec": times[name],
            }
            if now / cpus > LOAD_GATE_RATIO:
                # still noisy: a retry would just measure the same
                # co-tenancy — record the attempt, keep the figure
                info["retried"] = False
            else:
                repeats, run = runners[name]
                best = times[name]
                for _ in range(repeats):
                    t0 = time.perf_counter()
                    run()
                    best = min(best, time.perf_counter() - t0)
                times[name] = round(best, 3)
                info["retried"] = True
                info["after_sec"] = times[name]
            noisy_entry_retries[name] = info

    # --- same-host A/B vs the previous round's HEAD (VERDICT r10 #2):
    # runs LAST so the prev subprocess's own load gate waits out this
    # run's self-heat; the page cache is hot from this run, so both
    # sides measure warm-cache, same-window, same-host ---
    head_total = round(sum(times.values()), 3)
    prev_ab: dict = {"enabled": PREV_AB}
    if PREV_AB:
        # release this run's JVM (up to 24g heap + cached frames) before
        # the child measures: a resident parent biases prev_total via
        # memory/GC pressure and page-cache eviction the HEAD run never
        # saw — the A/B must be symmetric to be binding
        spark.stop()
        got = _run_prev_bench(sf_dir)
        prev_ab.update({k: got[k] for k in ("ref", "subject") if k in got})
        if "error" in got:
            prev_ab["error"] = got["error"]
        else:
            prev = got["result"]
            prev_ab.update(
                {
                    "prev_total": prev.get("value"),
                    "head_total": head_total,
                    "ratio_head_over_prev": (
                        round(head_total / prev["value"], 4)
                        if prev.get("value")
                        else None
                    ),
                    "cache_warmed": True,
                    "prev_load_gate_ok": prev.get("load_gate", {}).get("ok"),
                    "prev_queries": prev.get("queries"),
                }
            )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_wall_clock",
        "value": head_total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf_dir,
        # noise protocol (VERDICT r4 #7): one run on a shared host is
        # interpretable only against the load it ran under — emit the
        # 1/5/15-min loadavg and the per-entry repeat counts so the
        # committed figure can be read against the documented band
        # (near-dedup measured 6.9-9.0 s across same-code runs under
        # loadavg 4-16 since the fused star-forest probe; structural
        # floor ~6.9 s on a quiet host).
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        # 1-min loadavg sampled immediately before each timed entry
        # (VERDICT r6 #2): attributes per-entry noise without a re-run
        "queries_loadavg": entry_loadavg,
        # entries re-measured by the end-of-run quiet retry pass
        # (VERDICT r7 #7); empty when every entry started quiet
        "noisy_entry_retries": noisy_entry_retries,
        # bounded idle wait before the retry pass (VERDICT r8 #4) that
        # lets the bench's own end-of-run self-heat decay so the quiet
        # precondition can actually hold; needed=False when no entry
        # was noisy, quiet=False means co-tenancy outlasted the bound
        "retry_cooldown": retry_cooldown,
        # the gate's verdict: ok == quiet at start.  end_loadavg1 is
        # informational only — it necessarily includes the bench's own
        # local[32] Spark work (a quiet-start run legitimately ends at
        # loadavg ~16-20 on 32 CPUs), so it cannot gate.
        "load_gate": {
            **load_gate,
            "end_loadavg1": round(os.getloadavg()[0], 2),
            "ok": load_gate["ok_at_start"],
        },
        "repeats": {
            "headline_queries": REPEATS_HEADLINE,
            "gmail_pipeline_20k_msgs": REPEATS_PIPELINE,
            "knn_100k_vectorized": REPEATS_KNN,
            "near_dedup_100k_docs": REPEATS_NEAR_DEDUP,
        },
        # methodology (ADVICE r4): since round 4 the near-dedup entry
        # measures the broadcast_verify=True / canonical_input=True
        # fast path with best-of-7 minimums; r1-r3 artifacts measured
        # the default shuffle-verify path best-of-3 and are not
        # directly comparable for that entry.
        # relative regression protocol (VERDICT r10 #2): the binding
        # figure from r11 on is ratio_head_over_prev — same host, same
        # quiet window, same warm cache — not the absolute total (host
        # drifts ±10% hour-to-hour; see DEVNOTES round-10 close)
        "prev_ab": prev_ab,
        "cache_warm_bytes": cache_warm_bytes,
        "near_dedup_path": "broadcast_verify+canonical_input (since r4)",
        # methodology (r5): the pipeline entry now materializes via a
        # full-column xxhash64 checksum; r1-r4 artifacts used count(),
        # which Catalyst column-pruned past ALL transform stages (incl.
        # the pandas UDFs), so those figures measured corpus
        # construction only and are not comparable for that entry.
        "gmail_pipeline_materializer": "xxhash64 all-column checksum (since r5)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
