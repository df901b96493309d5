"""Regenerate ``_SWEEP_PRIORITY`` in ``gmail_etl_spark/plans/catalog.py``.

The driver verifies queries in ``queries()`` iteration order under a
~50-query budget, so the priority list IS the evidence mechanism.
Policy (pinned by tests/test_scale_posture.py::
test_sweep_priority_covers_catalog_and_frontloads_backlog):

  1. queries with no driver CORRECTNESS row yet, in registration order;
  2. then stale-by-round — rows last verified in the oldest round first;
  3. rows-only queries (oracle=None) LAST: a driver visit can only ever
     record ``err: no_oracle`` for them, so they gain nothing from
     budget — their evidence lives in the local tolerance/recall gates.

Run after each round's ``CORRECTNESS_r0N.json`` lands, paste the output
over the existing tuple body, and update the round tuple in the guard
test.  Usage::

    python tools/gen_sweep_priority.py 1 2 3 4
"""

from __future__ import annotations

import json
import sys
import textwrap


def main(rounds: list[int]) -> None:
    from gmail_etl_spark.plans.catalog import CATALOG, _ensure_loaded

    _ensure_loaded()
    reg = list(CATALOG)
    rows_only = [q for q in reg if CATALOG[q].oracle is None]
    oracled = [q for q in reg if CATALOG[q].oracle is not None]
    last: dict[str, int] = {}
    for r in rounds:
        for q in json.load(open(f"CORRECTNESS_r{r:02d}.json")):
            if q in CATALOG:
                last[q] = max(last.get(q, 0), r)
    never = [q for q in oracled if q not in last]
    tiers = {r: [q for q in oracled if last.get(q) == r] for r in rounds}

    def emit(names: list[str], comment: str) -> str:
        body = ", ".join(f'"{n}"' for n in names) + ","
        wrapped = textwrap.fill(
            body, width=74, initial_indent="    ", subsequent_indent="    "
        )
        return f"    # -- {comment} --\n{wrapped}"

    parts = []
    if never:
        parts.append(emit(never, f"(1) never driver-tested ({len(never)})"))
    for i, r in enumerate(rounds):
        if tiers[r]:
            parts.append(
                emit(tiers[r], f"({i + 2}) last verified round {r} ({len(tiers[r])})")
            )
    parts.append(
        emit(
            rows_only,
            f"(last) rows-only by design ({len(rows_only)}) — a driver "
            "visit yields only err:no_oracle; never spend budget here",
        )
    )
    order = never + [q for r in rounds for q in tiers[r]] + rows_only
    assert sorted(order) == sorted(reg), "generated order must cover catalog"
    print("\n".join(parts))


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 2, 3, 4])
