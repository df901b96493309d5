"""Plan-shape audit over the whole catalog: flags cartesian products,
nested-loop joins outside the documented whitelist (see
tests/test_scale_posture.py), and parquet scans with empty PushedFilters
in plans that push a LessThan elsewhere (the q173 class: a slice filter
that reaches one join branch but not the other).

Heuristic by design — run it when adding queries and adjudicate each
flag by hand; the hard assertions live in tests/test_scale_posture.py.

Usage: python tools/audit_plans.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import re
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from gmail_etl_spark.plans.catalog import CATALOG, _ensure_loaded
    from gmail_etl_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    flagged: list[tuple[str, str]] = []
    for name, cq in sorted(CATALOG.items()):
        try:
            df = cq.builder(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 - audit tool, report and move on
            flagged.append((name, f"ERROR {e}"))
            continue
        if "CartesianProduct" in plan:
            flagged.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan:
            flagged.append((name, "BroadcastNestedLoopJoin (check whitelist)"))
        scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        n_empty = sum(1 for s in scans if not s.strip())
        if n_empty and "LessThan" in plan:
            flagged.append((name, f"{n_empty}/{len(scans)} scans unpushed"))

    for name, why in flagged:
        print(f"{name}: {why}")
    print(f"flagged: {len(flagged)} of {len(CATALOG)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
