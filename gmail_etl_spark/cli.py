"""Command-line entry points — the operational surface a reference user
switches to (replacing the Airflow DAG's two tasks and the CLI fallback,
``gmail_dag.py:5-9`` / ``resources/gmail_functions.py:326-331``).

    python -m gmail_etl_spark.cli stage1 --raw DIR --out DIR [--ledger DIR] [--format parquet|csv]
    python -m gmail_etl_spark.cli stream --raw DIR --out DIR --checkpoint DIR [--archive DIR]
    python -m gmail_etl_spark.cli query NAME --sf-dir DIR [--limit N]

Run daily under any scheduler (cron/Airflow/dagster) — the batch form is
idempotent via the ledger, the stream form via its checkpoint.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gmail_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    s1 = sub.add_parser("stage1", help="batch raw->stage-1 (E2 lifecycle)")
    s1.add_argument("--raw", required=True, help="raw blob dir or glob")
    s1.add_argument("--out", required=True)
    s1.add_argument("--ledger", default=None, help="processed-ids parquet dir")
    s1.add_argument("--format", default="parquet", choices=["parquet", "csv"])

    st = sub.add_parser("stream", help="exactly-once streaming raw->stage-1 (ST1-ST5)")
    st.add_argument("--raw", required=True)
    st.add_argument("--out", required=True)
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--archive", default=None)

    q = sub.add_parser("query", help="run a catalog query and print rows")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from gmail_etl_spark.session import get_spark

    spark = get_spark(f"gmail-etl-{args.cmd}")
    if args.cmd == "stage1":
        from gmail_etl_spark.pipeline import run_pipeline

        df = run_pipeline(
            spark, args.raw, args.out, ledger_path=args.ledger, fmt=args.format
        )
        print(f"stage1 rows written: {df.count()}")
        return 0
    if args.cmd == "stream":
        from gmail_etl_spark.streaming.jobs import stream_raw_to_stage1

        stream_raw_to_stage1(
            spark, args.raw, args.out, args.checkpoint, archive_dir=args.archive
        )
        print("stream drained (availableNow)")
        return 0
    if args.cmd == "query":
        from gmail_etl_spark.plans.catalog import query_map

        qs = query_map()
        if args.name not in qs:
            print(f"unknown query {args.name}; available: {', '.join(sorted(qs))}")
            return 2
        qs[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
