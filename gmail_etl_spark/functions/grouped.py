"""Grouped pandas-UDF surface (SURVEY §2.7): GROUPED_AGG (the UDAF
form) and grouped-map ``applyInPandas`` — the two extension classes the
scalar UDFs U1–U3 don't cover.

Both examples are written to be *oracle-exact*: integer arithmetic
inside the UDF, so results are independent of pandas' within-group row
order and a SQL oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_avg_price_cents(price: pd.Series, qty: pd.Series) -> float:
    """GROUPED_AGG UDAF: quantity-weighted mean price.

    Cents-and-units integer sums (numpy int64) → one float division at
    the end; exact regardless of accumulation order.
    """
    p = (price * 100).round().astype("int64")
    q = qty.round().astype("int64")
    total_q = int(q.sum())
    if total_q == 0:
        return None
    return float(int((p * q).sum()) / 100.0 / total_q)


def per_key_sequence(df: DataFrame, key: str, order: str, id_col: str) -> DataFrame:
    """Grouped-map applyInPandas: ordinal position of each row within
    its key group (ordered by ``order`` then ``id_col``).

    The pandas function sees one whole group at a time — the extension
    point for group-local algorithms (per-user sessionization, trajectory
    features, per-document span labeling) that window functions can't
    express.  This instance *is* window-expressible, which is what makes
    it SQL-oracle-checkable.
    """
    out_schema = f"{key} bigint, {id_col} bigint, seq int"

    def seq(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([order, id_col], kind="mergesort")
        return pd.DataFrame(
            {
                key: pdf[key].values,
                id_col: pdf[id_col].values,
                "seq": range(1, len(pdf) + 1),
            }
        )

    return df.select(key, order, id_col).groupBy(key).applyInPandas(seq, out_schema)


def arrow_value_histogram(
    df: DataFrame, key: str = "user_id", value_col: str = "value", bin_width: int = 50
) -> DataFrame:
    """Per-key value histogram through ``applyInArrow`` — the zero-copy
    grouped-map API (no pandas conversion at all; the kernel sees a
    ``pyarrow.Table`` and answers with one).  Counts are integers, so the
    operator is SQL-oracle-checkable despite the Python kernel.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def hist(tbl: pa.Table) -> pa.Table:
        key_val = tbl.column(key)[0].as_py()
        bins = pc.floor(pc.divide(tbl.column(value_col), float(bin_width)))
        counts = pa.table({"bin": bins.cast(pa.int64())}).group_by("bin").aggregate(
            [("bin", "count")]
        )
        n = counts.num_rows
        return pa.table(
            {
                key: pa.array([key_val] * n, pa.int64()),
                "bin": counts.column("bin"),
                "n": counts.column("bin_count"),
            }
        )

    return df.select(key, value_col).groupBy(key).applyInArrow(
        hist, f"{key} long, bin long, n long"
    )
