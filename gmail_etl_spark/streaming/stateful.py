"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.6 — the extension point for operators Structured Streaming's
builtins can't express).

``running_user_totals`` keeps an explicit per-user accumulator (event
count + value total) across micro-batches — the generalization of the
reference's ledger state from "seen ids" to arbitrary per-key
aggregates.  State is per-key and partitioned by the groupBy, so it
scales horizontally; at 100 TB the knob that matters is state-store
size per key-partition, bounded here by one 2-field row per user.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-total) maintained across batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 arbitrary-state API
# ---------------------------------------------------------------------------

try:  # pyspark >= 4.0, and the TWS wire protocol needs protobuf at
    # runtime (its state-server messages are proto-encoded); environments
    # without google.protobuf fall back to applyInPandasWithState above.
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotalsProcessor(StatefulProcessor):
        """Same per-user accumulator as ``running_user_totals``, on the
        Spark 4 ``transformWithStateInPandas`` API: typed ValueState in
        the state store (RocksDB-backed on a cluster) instead of a
        single opaque state tuple — the forward-compatible form, with
        per-state TTL, timers, and list/map state available when an
        operator needs them."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    def running_user_totals_tws(events: DataFrame) -> DataFrame:
        """``running_user_totals`` through transformWithStateInPandas."""
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=UserTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - pyspark 3.x fallback
    running_user_totals_tws = None


# ---------------------------------------------------------------------------
# state-DEPENDENT per-event decisions (beyond the running accumulator)
# ---------------------------------------------------------------------------

SPIKE_OUTPUT_SCHEMA = "user_id bigint, event_id bigint, value_cents bigint, running_mean_cents bigint"
SPIKE_STATE_SCHEMA = "n bigint, total bigint"


def _detect_spikes(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    """Emit events whose value exceeds 3× the user's running mean AT THE
    TIME OF THE EVENT — the decision consumes state mid-stream, so
    output depends on event order, not just totals (what separates a
    stateful operator from an aggregate).  Rows are processed in
    (ts, event_id) order within each batch; integer cents keep the
    state exact and replay-stable."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0)
    out_event, out_val, out_mean = [], [], []
    # applyInPandasWithState delivers a group's batch rows as MULTIPLE
    # Arrow chunks (split at arrow.maxRecordsPerBatch, default 10k) with
    # no cross-chunk order guarantee, so materialize the whole batch and
    # sort ONCE — sorting per chunk would silently change which events
    # alert as soon as a group exceeds one chunk.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    pdf = (
        pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        if chunks
        else None
    )
    if pdf is not None:
        for eid, cents in zip(
            pdf["event_id"].astype("int64"), pdf["value_cents"].astype("int64")
        ):
            if n >= 3 and cents * n > 3 * total:
                out_event.append(int(eid))
                out_val.append(int(cents))
                out_mean.append(total // n)
            n += 1
            total += int(cents)
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_event),
            "event_id": out_event,
            "value_cents": out_val,
            "running_mean_cents": out_mean,
        }
    )


def detect_value_spikes(events: DataFrame) -> DataFrame:
    """Per-user spike alerts: value > 3× the running mean so far.

    The comparison cents·n > 3·total is exact integer arithmetic, and
    the running (n, total) state carries across micro-batches through
    the state store — with in-order delivery (availableNow over ordered
    files) the alert stream is identical to a sequential scan of the
    whole log, which the test asserts literally.  State per user is two
    integers; keys partition horizontally, the 100 TB contract for
    custom stateful operators."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _detect_spikes,
        outputStructType=SPIKE_OUTPUT_SCHEMA,
        stateStructType=SPIKE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
