"""Text-analysis operators beyond scalar expressions (SURVEY §2.8 X3).

``langid_classify`` is the classic n-gram-profile language identifier
as a DataFrame composition: train char-bigram count profiles per label
on a training split, score each test document by the integer dot
product of its bigram counts against every profile, argmax with a
deterministic tie-break.  All counts are integers, so the result is
engine-exact and SQL-oracle-checkable.

Scale shape: profiles are (lang, bigram, count) — thousands of rows →
broadcast; the scoring join is doc-bigrams ⋈ broadcast profiles with a
map-side partial sum, so classification cost is linear in corpus size
with no large shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bigram_counts(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    ex = df.select(
        *id_cols,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(F.col(text_col)) - 1),
                lambda i: F.col(text_col).substr(i, F.lit(2)),
            )
        ).alias("bigram"),
    )
    return ex.groupBy(*id_cols, "bigram").agg(F.count(F.lit(1)).alias("cnt"))


def langid_classify(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Returns (id, predicted_lang, score): argmax over labels of the
    integer dot product between the document's bigram counts and the
    label's trained profile; ties break on label ascending."""
    profiles = _bigram_counts(train, [label_col], text_col).withColumnRenamed(
        "cnt", "prof_cnt"
    )
    doc_vecs = _bigram_counts(test, [id_col], text_col).withColumnRenamed(
        "cnt", "doc_cnt"
    )
    scored = (
        doc_vecs.join(F.broadcast(profiles), "bigram")
        .groupBy(id_col, label_col)
        .agg(F.sum(F.col("doc_cnt") * F.col("prof_cnt")).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc(label_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col(label_col).alias("predicted_lang"),
            "score",
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 20,
    overlap: int = 5,
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap — the
    standard LLM training-sequence prep.  Chunk i covers tokens
    [i*stride, i*stride + chunk_tokens), stride = chunk_tokens - overlap;
    the final partial chunk is kept.

    Pure JVM expressions: one ``posexplode`` over a computed chunk-index
    sequence, ``slice`` + ``concat_ws`` per chunk.  No shuffle at all —
    a 100 TB corpus chunks in a single map stage, and the output
    explodes ~n_tokens/stride rows per doc with no Python in the path.
    """
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, ... last start < n
    idx = F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int"))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("_toks"),
            F.explode(idx).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.concat_ws(
                " ", F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.size(
                F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
            ).alias("n_chunk_tokens"),
        )
    )
