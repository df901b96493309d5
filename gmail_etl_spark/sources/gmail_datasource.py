"""S1 as a Spark 4 Python DataSource (SURVEY §2.1 row S1, idiomatic
form): ``spark.read.format("gmail")`` with partition-parallel message
fetch — the engine-native packaging of the fetcher in
``gmail_etl_spark/sources/gmail.py``.

The reader splits the candidate id list into ``numPartitions`` input
partitions; each executor partition instantiates its own client and
fetches its slice — identical distribution shape to ``fetch_messages``
but surfaced through the standard reader API, so it composes with every
downstream DataFrame op and shows up in the UI/plan as a scan.

The default client serves the deterministic fixture corpus (no network
in this environment); a production deployment registers a client
factory doing OAuth + requests, mirroring the reference's
``resources/get_token.py`` flow.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from gmail_etl_spark.schemas import RAW_MESSAGE_SCHEMA


def _message_row(msg: dict):
    """Gmail REST message dict → RAW_MESSAGE_SCHEMA tuple (shared by the
    batch and streaming readers)."""
    payload = msg.get("payload") or {}
    parts = payload.get("parts")
    return (
        msg.get("id"),
        (
            payload.get("mimeType"),
            [
                (h.get("name"), h.get("value"))
                for h in (payload.get("headers") or [])
            ],
            ((payload.get("body") or {}).get("data"),),
            None
            if parts is None
            else [
                (
                    p.get("mimeType"),
                    ((p.get("body") or {}).get("data"),),
                    None
                    if p.get("parts") is None
                    else [
                        (
                            sp.get("mimeType"),
                            ((sp.get("body") or {}).get("data"),),
                        )
                        for sp in p["parts"]
                    ],
                )
                for p in parts
            ],
        ),
    )


class _IdSlice(InputPartition):
    def __init__(self, ids: list[str]):
        self.ids = ids


class GmailDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.limit = int(options.get("limit", 300))  # reference cap, :151
        self.num_partitions = int(options.get("numPartitions", 4))

    def _client(self):
        from gmail_etl_spark.sources.fixtures import fixture_messages
        from gmail_etl_spark.sources.gmail import MockGmailClient

        return MockGmailClient(fixture_messages())

    def partitions(self):
        from gmail_etl_spark.sources.gmail import list_candidate_ids

        ids = list_candidate_ids(self._client(), self.limit)  # serial pagination
        n = max(1, self.num_partitions)
        chunk = max(1, (len(ids) + n - 1) // n)
        return [_IdSlice(ids[i : i + chunk]) for i in range(0, len(ids), chunk)]

    def read(self, partition: _IdSlice):
        client = self._client()  # one client per partition task
        for mid in partition.ids:
            yield _message_row(client.get_message(mid))


class GmailDataSource(DataSource):
    """Usage::

        spark.dataSource.register(GmailDataSource)
        raw = spark.read.format("gmail").option("limit", 300).load()
    """

    @classmethod
    def name(cls) -> str:
        return "gmail"

    def schema(self):
        return RAW_MESSAGE_SCHEMA

    def reader(self, schema) -> GmailDataSourceReader:
        return GmailDataSourceReader(self.options)

    def simpleStreamReader(self, schema) -> GmailSimpleStreamReader:
        return GmailSimpleStreamReader(self.options)


class GmailSimpleStreamReader(SimpleDataSourceStreamReader):
    """Incremental Gmail polling as a first-class streaming source —
    the reference's core loop ("fetch what's new since last run",
    ``resources/gmail_functions.py:154-185`` + the ledger) expressed as
    a Spark 4 Python streaming data source.

    Offsets: ``{"pos": n}`` — the count of messages already emitted
    from the mailbox's stable listing order.  ``read`` lists the current
    ids once (serial pagination, the reference's own wire pattern),
    fetches everything past ``pos``, and advances the offset;
    ``readBetweenOffsets`` re-fetches an exact slice for recovery
    replay, so a crashed-and-restarted query reproduces the same
    micro-batch from the checkpointed offsets.  Against the live API a
    production deployment keys offsets on Gmail's ``historyId``
    (``users.history.list``) instead of a position — the same
    shape: a monotone cursor the service replays from."""

    def __init__(self, options: dict):
        self.limit = int(options.get("limit", 300))
        self.batch_cap = int(options.get("maxMessagesPerBatch", 100))

    def _client(self):
        from gmail_etl_spark.sources.fixtures import fixture_messages
        from gmail_etl_spark.sources.gmail import MockGmailClient

        return MockGmailClient(fixture_messages())

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _ids(self, client) -> list[str]:
        from gmail_etl_spark.sources.gmail import list_candidate_ids

        return list_candidate_ids(client, self.limit)

    def read(self, start: dict):
        client = self._client()
        ids = self._ids(client)
        lo = int(start["pos"])
        hi = min(len(ids), lo + self.batch_cap)
        rows = iter([_message_row(client.get_message(m)) for m in ids[lo:hi]])
        return rows, {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        client = self._client()
        ids = self._ids(client)
        lo, hi = int(start["pos"]), int(end["pos"])
        return iter([_message_row(client.get_message(m)) for m in ids[lo:hi]])
