"""S7 — JDBC ledger parity: the reference's processed-message ledger as
a real ``spark.read.jdbc`` / ``DataFrameWriter.jdbc`` path.

The reference keeps a ``emails(id VARCHAR PRIMARY KEY, date date)``
table in a SQL database and anti-joins new message ids against it
(``init.sql:24-28``, ``resources/gmail_functions.py:28-50,115-126``).
The repo's scale path replaces this with a parquet ledger
(``pipeline.py``) — better at 100 TB because the ledger join stays a
distributed anti-join with no single DB endpoint — but the JDBC
protocol itself is part of the surface: deployments with an existing
relational ledger point these helpers at it unchanged.

Tested against Derby embedded (the JDBC driver that ships inside the
Spark distribution), so the smoke runs with zero extra infrastructure;
the same calls take any JDBC URL + driver class.

Scale notes: ``read_ledger_jdbc`` accepts partition bounds — without
them Spark reads a JDBC table through ONE task, which is fine for a
ledger probe but wrong for bulk extraction; ``write.jdbc`` writes one
connection per partition, so ``coalesce`` small DataFrames first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Derby embedded — in-JVM database whose jars ship with Spark (used by
#: the Hive metastore), hence always available in a Spark runtime.
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def derby_url(db_dir: str) -> str:
    return f"jdbc:derby:{db_dir};create=true"


def write_ledger_jdbc(
    df: DataFrame,
    url: str,
    table: str = "emails",
    driver: str = DERBY_DRIVER,
    mode: str = "append",
) -> None:
    """Record processed ids in the relational ledger (reference
    ``add_data_to_db``, ``gmail_functions.py:172-178``)."""
    (
        df.coalesce(1)  # a ledger append is tiny; one connection
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode(mode)
        .save()
    )


def read_ledger_jdbc(
    spark: SparkSession,
    url: str,
    table: str = "emails",
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Read the ledger through JDBC (reference ``get_emails_from_db``,
    ``gmail_functions.py:38-50``).  Pass partition bounds for any table
    big enough to matter — unpartitioned JDBC reads are single-task."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def unprocessed_against_jdbc_ledger(
    msgs: DataFrame,
    url: str,
    table: str = "emails",
    id_col: str = "id",
    driver: str = DERBY_DRIVER,
) -> DataFrame:
    """The reference's dedup gate (J1) against the relational ledger:
    keep messages whose id is not yet recorded.  Same left_anti shape as
    the parquet-ledger path in ``pipeline.py`` — the ledger side arrives
    through JDBC and is broadcast when small (Catalyst decides from the
    fetched size)."""
    ledger_ids = read_ledger_jdbc(msgs.sparkSession, url, table, driver).select(id_col)
    return msgs.join(ledger_ids, id_col, "left_anti")
