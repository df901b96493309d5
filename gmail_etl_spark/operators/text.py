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

import pandas as pd
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
    """Returns (id, predicted_lang, score) — ONE row per test doc:
    argmax over labels of the integer dot product between the
    document's bigram counts and the label's trained profile; ties
    break on label ascending.  A doc whose bigrams overlap no profile
    (unseen script, or a text too short to produce bigrams) gets a
    null prediction and null score instead of silently vanishing from
    the output."""
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
    picked = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col(label_col).alias("predicted_lang"),
            "score",
        )
    )
    return test.select(id_col).distinct().join(picked, id_col, "left")


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
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk_tokens, got "
            f"overlap={overlap}, chunk_tokens={chunk_tokens} (stride would be <= 0)"
        )
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


def with_winnow_fps(
    df: DataFrame, text_col: str = "text", out_col: str = "fps"
) -> DataFrame:
    """Append winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    2003) of ``text_col`` as ``out_col``: a base-257 polynomial rolling
    hash of every character 5-gram (mod 1e9+7, exact BIGINT arithmetic
    so a SQL oracle computes bit-identical values), then the minimum
    hash of each sliding window of 4 consecutive 5-gram hashes,
    distinct.  Guarantee: any two documents sharing a substring of
    length >= 8 share >= 1 fingerprint.

    Filters to ``length(text) >= 8`` (shorter rows have no 5-gram
    window).  The character codes are materialized as an array FIRST
    (``split`` + ``ascii``, O(n)) and the gram hashes index it with
    O(1) ``element_at`` — per-position ``substring(text, i, 1)`` is
    O(i) on UTF8String, which turns the hash into O(n²) per document
    and is catastrophic when the optimizer re-inlines the expression
    into scan filters (explode's implied size>0 predicate does exactly
    that).  Built as chained projections — NOT one expression — so each
    array is evaluated once per consumer (CollapseProject re-inlines
    single combined expressions, same trap as the reverted MinHash
    pre-hash experiment, see DEVNOTES).  Pure JVM higher-order
    functions: one narrow pass per document, cost linear in document
    bytes, no Python worker, no shuffle.
    """
    cs = f"transform(split({text_col}, ''), c -> cast(ascii(c) as bigint))"
    hs = (
        "transform(sequence(1, size(_winnow_cs) - 4),"
        " i -> ((((element_at(_winnow_cs, i) * 257L"
        "       + element_at(_winnow_cs, i + 1)) * 257L"
        "       + element_at(_winnow_cs, i + 2)) * 257L"
        "       + element_at(_winnow_cs, i + 3)) * 257L"
        "       + element_at(_winnow_cs, i + 4)) % 1000000007L)"
    )
    return (
        df.filter(F.length(text_col) >= 8)
        .withColumn("_winnow_cs", F.expr(cs))
        .withColumn("_winnow_hs", F.expr(hs))
        .withColumn(
            out_col,
            F.expr(
                "array_distinct(transform(sequence(1, size(_winnow_hs) - 3),"
                " i -> array_min(slice(_winnow_hs, i, 4))))"
            ),
        )
        .drop("_winnow_cs", "_winnow_hs")
    )


def attach_compression_ratio(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """zlib compression ratio per document — the entropy-proxy quality
    signal of Gopher/RefinedWeb-style filters: highly repetitive or
    templated text compresses far below natural prose, near-random text
    barely compresses at all; curation thresholds both tails.

    Python is unavoidable (no SQL zlib), so this is an Arrow-batched
    pandas_udf over the pre-projected (id, text) pair — one narrow pass,
    no shuffle.  Returns (id, byte_len, compressed_len, ratio) with
    ratio rounded to 6 dp."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _clen(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6)) if t is not None else None
        )

    blen = F.length(F.encode(F.col(text_col), "UTF-8"))
    return df.select(
        F.col(id_col),
        blen.alias("byte_len"),
        _clen(F.col(text_col)).alias("compressed_len"),
    ).withColumn(
        "ratio",
        F.round(F.col("compressed_len").cast("double") / F.col("byte_len"), 6),
    )


# ---------------------------------------------------------------------------
# UDTF surface (U-family): arbitrary-Python row expansion, Arrow-batched
# ---------------------------------------------------------------------------


def make_chunk_spans_udtf():
    """Python UDTF (Spark 4 table function) emitting overlapping token
    spans per document — the API surface for chunkers whose boundary
    logic outgrows column expressions (tokenizer-aware splits, semantic
    boundaries).  For plain fixed-width chunking q71's JVM expression is
    the 100 TB path; this UDTF exists to cover the `spark.udtf` +
    LATERAL surface with Arrow batching (`useArrow=True`).

    Deterministic contract (oracled by q186): chunks start at
    0, step, 2·step, … < max(n_tokens − width + 1, 1) — short documents
    yield exactly one chunk of everything."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="chunk_id int, start_tok int, n_tok int, chunk_text string",
        useArrow=True,
    )
    class ChunkSpans:
        def eval(self, text: str, width: int, step: int):
            toks = text.split(" ")
            cid = 0
            for start in range(0, max(len(toks) - width + 1, 1), step):
                piece = toks[start : start + width]
                yield cid, start, len(piece), " ".join(piece)
                cid += 1

    return ChunkSpans


def jaro_winkler_udf():
    """Arrow-batched Jaro–Winkler similarity (classic Winkler variant:
    prefix boost, p=0.1, max prefix 4, applied only when jaro > 0.7 —
    validated pair-for-pair against DuckDB's native
    `jaro_winkler_similarity` in q188's oracle, 0 mismatches).  Python
    is the right host here: the match/transposition scan is irregular
    per-character control flow no column expression hosts; the UDF runs
    on pre-blocked candidate pairs only, never the cross product."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def _jaro(s1: str, s2: str) -> float:
        if s1 == s2:
            return 1.0
        l1, l2 = len(s1), len(s2)
        if not l1 or not l2:
            return 0.0
        win = max(max(l1, l2) // 2 - 1, 0)
        m1 = [False] * l1
        m2 = [False] * l2
        m = 0
        for i, c in enumerate(s1):
            for j in range(max(0, i - win), min(l2, i + win + 1)):
                if not m2[j] and s2[j] == c:
                    m1[i] = m2[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        t = 0
        k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        t //= 2
        return (m / l1 + m / l2 + (m - t) / m) / 3

    @pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for s1, s2 in zip(a, b):
            j = _jaro(s1, s2)
            if j > 0.7:
                l = 0
                for x, y in zip(s1[:4], s2[:4]):
                    if x != y:
                        break
                    l += 1
                j = j + l * 0.1 * (1 - j)
            out.append(j)
        return pd.Series(out)

    return jw
