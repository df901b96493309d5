"""S1 — Gmail REST source, Spark-shaped (SURVEY §2.1 row S1).

Reference behavior (``resources/gmail_functions.py:145-192``): a serial
driver loop — list page (token pagination), per-id ledger lookup, per-id
message GET, stop at 300.  Two of those three steps parallelize; one
does not:

* **pagination is inherently serial** (each page token comes from the
  previous response) → stays on the driver, exactly like the reference;
* **the ledger check** becomes one anti-join (J1);
* **the per-id GET** — the reference's N+1 hot loop — distributes via
  ``mapInPandas``: each executor partition opens its own client and
  fetches its slice of ids, so throughput scales with executors instead
  of being capped at one sequential HTTP stream.

No live Google calls here: the client is injected (SURVEY §7 phase 3).
``MockGmailClient`` serves the fixture corpus; a production client
implements the same two methods with requests + OAuth (the reference's
``get_token.py`` flow) and is constructed *inside* the executor via the
factory, so credentials/objects never pickle through the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession

from gmail_etl_spark.schemas import RAW_MESSAGE_SCHEMA

DEFAULT_LIMIT = 300  # reference cap, resources/gmail_functions.py:151


class GmailClient(Protocol):
    def list_message_ids(self, page_token: str | None) -> tuple[list[str], str | None]:
        """One list page → (ids, next_page_token|None)."""
        ...

    def get_message(self, message_id: str) -> dict:
        """Full message resource for one id."""
        ...


class MockGmailClient:
    """Deterministic in-memory client over a message corpus."""

    def __init__(self, messages: list[dict], page_size: int = 4) -> None:
        self._by_id = {m["id"]: m for m in messages}
        self._ids = [m["id"] for m in messages]
        self._page_size = page_size

    def list_message_ids(self, page_token: str | None) -> tuple[list[str], str | None]:
        start = int(page_token) if page_token else 0
        page = self._ids[start : start + self._page_size]
        nxt = start + self._page_size
        return page, (str(nxt) if nxt < len(self._ids) else None)

    def get_message(self, message_id: str) -> dict:
        return self._by_id[message_id]


def list_candidate_ids(
    client: GmailClient, limit: int = DEFAULT_LIMIT
) -> list[str]:
    """Driver-side pagination (serial by protocol, like the reference's
    loop at ``:162-184`` — but without the unguarded nextPageToken
    KeyError it exits through)."""
    ids: list[str] = []
    token: str | None = None
    while len(ids) < limit:
        page, token = client.list_message_ids(token)
        ids.extend(page)
        if token is None:
            break
    return ids[:limit]


def fetch_messages(
    spark: SparkSession,
    client_factory: Callable[[], GmailClient],
    limit: int = DEFAULT_LIMIT,
    ledger: DataFrame | None = None,
    fetch_partitions: int = 8,
) -> DataFrame:
    """E1 extract task as a distributed plan.

    ``client_factory`` is pickled to executors and invoked once per
    partition — connection setup amortizes over the partition's ids.
    """
    import pandas as pd

    driver_client = client_factory()
    ids = list_candidate_ids(driver_client, limit)
    ids_df = spark.createDataFrame([(i,) for i in ids], "id string")
    if ledger is not None:
        ids_df = ids_df.join(ledger.select("id"), "id", "left_anti")  # J1

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()  # one client per executor partition
        for batch in batches:
            rows = [client.get_message(i) for i in batch["id"]]
            if rows:
                yield pd.DataFrame(
                    {
                        "id": [r.get("id") for r in rows],
                        "payload": [r.get("payload") for r in rows],
                    }
                )

    return (
        ids_df.repartition(fetch_partitions)
        .mapInPandas(fetch_partition, RAW_MESSAGE_SCHEMA)
    )
