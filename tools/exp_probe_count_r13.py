"""r13 micro-A/B (VERDICT r12 item 6): does the uncapped near-dup
probe's visibility action — the ``cand.count()`` at
streaming/jobs.py's _probe_dup_ids, added in r12 for the
runaway-bucket warning (ADVICE r11) — cost noise-level wall on the
pruned path?

Method: build a real sharded index once (10k planted near-dup docs),
then interleave probes of a 2k-doc batch with ``max_bucket=None`` (the
only hot path that pays the count): leg A = stock code; leg B =
``DataFrame.count`` mock-patched to skip — ``cand.count()`` is the ONLY
``.count()`` inside the probe (the other actions are bounded
``.collect()`` calls on shard-id frames, and the result is materialized
here via ``.collect()``), so the patch isolates exactly the action
under test.  The count runs on the frame the probe just persisted (the
pins contract), so the expectation is a cheap in-memory scan.

Emits EXP_PROBE_COUNT_r13.json.
"""

from __future__ import annotations

import json
import os
import statistics
import tempfile
import time
from unittest import mock

from pyspark.sql import DataFrame

from gmail_etl_spark.session import get_spark
from gmail_etl_spark.streaming.jobs import (
    maintain_near_dup_index,
    probe_near_dup_index,
)
from gmail_etl_spark.synthetic import planted_near_dup_corpus

spark = get_spark("exp-probe-count-r13")
spark.sparkContext.setLogLevel("ERROR")

tmp = tempfile.mkdtemp(prefix="exp_probe_count_")
docs = planted_near_dup_corpus(spark, 10_000)
docs.write.mode("overwrite").parquet(f"{tmp}/docs")
maintain_near_dup_index(
    spark, f"{tmp}/docs", f"{tmp}/index", f"{tmp}/ckpt",
    k=3, n_hashes=16, bands=8, threshold=0.5,
)
probe_docs = planted_near_dup_corpus(spark, 2_000).cache()
probe_docs.count()


def run_probe() -> int:
    return len(
        probe_near_dup_index(
            spark, f"{tmp}/index", probe_docs,
            k=3, n_hashes=16, bands=8, threshold=0.5, max_bucket=None,
        ).collect()
    )


_real_count = DataFrame.count


def run_probe_nocount() -> int:
    with mock.patch.object(DataFrame, "count", lambda self: 0):
        return run_probe()


n_with = run_probe()
n_without = run_probe_nocount()
assert n_with == n_without and n_with > 0, (n_with, n_without)
print(f"probe hits: {n_with}", flush=True)

with_s, without_s = [], []
for i in range(6):
    t0 = time.perf_counter(); run_probe(); with_s.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run_probe_nocount(); without_s.append(time.perf_counter() - t0)
    print(
        f"round {i}: with_count={with_s[-1]:.3f} no_count={without_s[-1]:.3f} "
        f"load={os.getloadavg()[0]:.1f}",
        flush=True,
    )

out = {
    "probe_hits": n_with,
    "with_count_sec": [round(x, 3) for x in with_s],
    "no_count_sec": [round(x, 3) for x in without_s],
    "with_count_med": round(statistics.median(with_s), 3),
    "no_count_med": round(statistics.median(without_s), 3),
    "count_delta_med_sec": round(
        statistics.median(with_s) - statistics.median(without_s), 3
    ),
    "loadavg": [round(x, 2) for x in os.getloadavg()],
}
with open("EXP_PROBE_COUNT_r13.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps({k: out[k] for k in ("with_count_med", "no_count_med", "count_delta_med_sec")}))
