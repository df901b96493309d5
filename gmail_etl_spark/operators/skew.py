"""Skew-mitigation operators (SURVEY §2.8 X6).

AQE's skew-join splitting handles most skew at runtime; these operators
are the *explicit* forms for the cases AQE can't see:

* ``salted_join`` — replicate the small side N ways and scatter the
  skewed big side across N sub-keys.  Deterministic salt (hash of a
  second column), so plans stay replayable.
* ``two_phase_agg`` — pre-aggregate on (key, salt) then finish on key.
  For algebraic aggregates Spark's partial aggregation already does
  this map-side; the explicit form matters for high-cardinality
  ``collect_list``-style state or when the partial agg is disabled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: str, n: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n): hash of a non-key column, so the
    same row always lands in the same sub-partition (replayable plans,
    unlike rand()-based salting)."""
    return df.withColumn(col_name, F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: big scatters over n salts,
    small replicates n times; the shuffle key becomes (key, salt) so a
    hot key spreads over n reducers instead of one.

    Only big-side-preserving join types are supported: replication is
    invisible to inner/left/semi/anti results, but a right or full
    outer join would emit each UNMATCHED small-side row once per
    replica (n null-padded duplicates) — those types raise instead of
    silently corrupting."""
    normalized = how.lower().replace("_", "")
    if normalized not in (
        "inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"
    ):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins; {how!r} "
            "would duplicate unmatched small-side rows across salt "
            "replicas — salt the other side instead"
        )
    big_salted = with_salt(big, salt_from, n)
    small_replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n)]))
    )
    return big_salted.join(small_replicated, [key, "_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt_from: str,
    n: int = 8,
) -> DataFrame:
    """sum/count on a skewed key in two shuffles of bounded fan-in:
    (key, salt) partial → key final.  Returns (key, sum_value, n_rows).

    Partials accumulate in ``decimal(38,9)`` so the sum is
    order-independent across the extra combine level (float partials
    would make the result depend on salt assignment).  The decimal
    quantizes inputs at 9 decimal places and bounds |sum| < 10^29 —
    values finer than 1e-9 lose precision by design; pre-scale them if
    that matters."""
    partial = (
        with_salt(df, salt_from, n)
        .groupBy(key, "_salt")
        .agg(
            F.sum(F.col(value).cast("decimal(38,9)")).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("_psum").cast("double").alias("sum_value"),
            F.sum("_pcnt").alias("n_rows"),
        )
    )
