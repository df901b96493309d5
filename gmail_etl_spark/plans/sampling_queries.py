"""Dataset-curation catalog entries: deterministic splits, class caps,
decontamination — all content-hash keyed so DuckDB reproduces them
exactly; plus RNG sampling as rows-only with statistical tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmail_etl_spark.operators.sampling import (
    contamination_report,
    hash_split,
    per_class_cap,
    stratified_sample,
)
from gmail_etl_spark.plans.catalog import load_table, query

# ---------------------------------------------------------------------------
# q94 — deterministic content-hash train/eval split
# ---------------------------------------------------------------------------


@query(
    "q94_hash_split",
    oracle="""
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id
    FROM (
        -- first hash byte < 0xcc (204 = floor(256*0.8)); fixed-width
        -- lowercase hex compares lexicographically == numerically
        SELECT doc_id,
               CASE WHEN substr(sha256(text), 1, 2) < 'cc'
                    THEN 'train' ELSE 'eval' END AS split
        FROM documents
    )
    GROUP BY split
    ORDER BY split
    """,
    survey="sampling,D1",
)
def q94_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        hash_split(d, "text", train_pct=80)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_id"))
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# q95 — class-balanced cap
# ---------------------------------------------------------------------------


@query(
    "q95_per_class_cap",
    oracle="""
    SELECT lang, doc_id
    FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY sha256(text), doc_id) AS rn
        FROM documents
    )
    WHERE rn <= 20
    ORDER BY lang, doc_id
    """,
    survey="sampling",
)
def q95_per_class_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        per_class_cap(d, "lang", "text", "doc_id", cap=20)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


# ---------------------------------------------------------------------------
# q96 — stratified sampling (RNG; rows-only, proportions tested)
# ---------------------------------------------------------------------------


@query(
    "q96_stratified_sample",
    oracle=None,
    survey="sampling",
    rows_only_reason=(
        "sampleBy draws depend on Spark's seeded RNG stream, which no "
        "SQL engine replays; gated by per-stratum proportion tests"
    ),
)
def q96_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform 50% per-language sample via the scalar-fraction form —
    no driver-side enumeration of the language domain, so the plan is a
    single filtered scan at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(d, "lang", 0.5)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q97 — benchmark decontamination report
# ---------------------------------------------------------------------------


@query(
    "q97_contamination",
    oracle="""
    WITH bench AS (SELECT * FROM documents WHERE doc_id < 50),
    train AS (SELECT * FROM documents WHERE doc_id >= 100),
    bench_sh AS (
        -- per-doc DISTINCT mirrors the operator's array_distinct
        SELECT DISTINCT doc_id AS id,
               array_to_string(toks[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM bench),
             UNNEST(range(1, greatest(len(toks) - 1, 2))) AS t(i)
    ),
    train_sh AS (
        SELECT DISTINCT array_to_string(toks[i:i+2], ' ') AS shingle
        FROM (SELECT string_split(text, ' ') AS toks FROM train),
             UNNEST(range(1, greatest(len(toks) - 1, 2))) AS t(i)
    )
    SELECT id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           ROUND(CAST(SUM(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS contamination
    FROM bench_sh b LEFT JOIN train_sh t USING (shingle)
    GROUP BY id
    ORDER BY id
    """,
    survey="sampling,D2",
)
def q97_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-containment decontamination (Dolma/RedPajama-style):
    flag benchmark docs whose 3-gram shingles blanket-appear in the
    training corpus."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < 50)
    train = d.filter(F.col("doc_id") >= 100)
    return contamination_report(bench, train, "doc_id", "text", k=3).orderBy("id")


# ---------------------------------------------------------------------------
# q72 — greedy sequence packing of token chunks, HASH-ORACLED as of
# round 9.  The old "order-dependent within partitions" rationale
# contradicted the operator's own contract — pack_sequences is
# byte-identical across runs (per-bucket total order + stable first-fit,
# no RNG), i.e. a pure data function.  The real blockers were (a) the
# xxhash64 bucket hash → swapped for the portable sha256-nibble family
# on this gate, and (b) the sequential first-fit recurrence → replayed
# by a DuckDB RECURSIVE CTE that walks one item per step per bucket,
# carrying the open-sequence remaining-space LIST as state
# (list_position finds the first fit; list_transform patches it).
# Capacity/coverage invariants stay tested in tests/test_operators.py.
# ---------------------------------------------------------------------------

_Q72_HEX = "0123456789abcdef"
_Q72_NIB8 = " + ".join(
    f"(strpos('{_Q72_HEX}', substr(sha256(CAST(item_id AS VARCHAR)), {i + 1}, 1)) - 1)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
)

_Q72_ORACLE = f"""
    WITH RECURSIVE t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents WHERE doc_id < 100
    ),
    c AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, CAST(floor((n - 1) / 15) AS BIGINT))) AS chunk_id
        FROM t
    ),
    items AS (
        SELECT item_id,
               len(list_slice(toks, chunk_id * 15 + 1, chunk_id * 15 + 20)) AS n,
               ({_Q72_NIB8}) % 64 AS bucket
        FROM (SELECT doc_id * 1000 + chunk_id AS item_id, toks, chunk_id FROM c)
    ),
    ord AS (
        SELECT bucket, item_id, n,
               ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY n DESC, item_id)
                   AS step
        FROM items
    ),
    sizes AS (SELECT bucket, COUNT(*) AS n_items FROM ord GROUP BY bucket),
    pack(bucket, step, spaces, assigned) AS (
        SELECT bucket, CAST(0 AS BIGINT), CAST([] AS BIGINT[]), CAST([] AS BIGINT[])
        FROM sizes
        UNION ALL
        SELECT p.bucket, p.step + 1,
               CASE WHEN NULLIF(list_position(list_transform(p.spaces, s -> s >= o.n), true), 0)
                         IS NOT NULL
                    THEN list_transform(p.spaces, (s, i) ->
                         CASE WHEN i = NULLIF(list_position(
                                  list_transform(p.spaces, s2 -> s2 >= o.n), true), 0)
                              THEN s - o.n ELSE s END)
                    ELSE list_append(p.spaces, greatest(64 - o.n, CAST(0 AS BIGINT)))
               END,
               list_append(p.assigned,
                   CAST(COALESCE(
                       NULLIF(list_position(list_transform(p.spaces, s -> s >= o.n), true), 0) - 1,
                       len(p.spaces)) AS BIGINT))
        FROM pack p
        JOIN ord o ON o.bucket = p.bucket AND o.step = p.step + 1
    ),
    done AS (
        SELECT p.bucket, p.assigned
        FROM pack p JOIN sizes s ON s.bucket = p.bucket AND p.step = s.n_items
    ),
    expand AS (
        SELECT bucket, assigned,
               unnest(range(1, len(assigned) + 1)) AS step
        FROM done
    )
    SELECT e.bucket,
           e.bucket * 1000000000 + e.assigned[e.step] AS seq_id,
           o.item_id, o.n AS n_tokens
    FROM expand e JOIN ord o ON o.bucket = e.bucket AND o.step = e.step
    ORDER BY e.bucket, seq_id, item_id
    """


@query(
    "q72_pack_sequences",
    oracle=_Q72_ORACLE,
    survey="X3,2.7-udf",
)
def q72_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk the corpus (q71 shape) then pack chunks into ≤64-token
    training sequences with first-fit-decreasing inside hash buckets —
    deterministic output (total order + stable algorithm, no RNG), which
    the DuckDB oracle replays step-for-step as a recursive CTE over the
    per-bucket remaining-space list (portable sha256 bucket family)."""
    from gmail_etl_spark.operators.sampling import pack_sequences
    from gmail_etl_spark.operators.text import chunk_documents

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    chunks = chunk_documents(d, chunk_tokens=20, overlap=5).select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("chunk_key"),
        "n_chunk_tokens",
    )
    return pack_sequences(
        chunks, "chunk_key", "n_chunk_tokens", budget=64, bucket_family="sha256"
    ).orderBy("bucket", "seq_id", "item_id")


# ---------------------------------------------------------------------------
# q107 — temperature-scaled source mixing weights
# ---------------------------------------------------------------------------


@query(
    "q107_source_mixing_weights",
    oracle="""
    WITH per_source AS (
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           ROUND(POWER(CAST(n_tokens AS DOUBLE), 0.7)
                 / SUM(POWER(CAST(n_tokens AS DOUBLE), 0.7)) OVER (), 6)
               AS weight,
           ROUND(1000000 * (POWER(CAST(n_tokens AS DOUBLE), 0.7)
                 / SUM(POWER(CAST(n_tokens AS DOUBLE), 0.7)) OVER ())
                 / CAST(n_tokens AS DOUBLE), 6) AS epochs_at_1m
    FROM per_source
    ORDER BY source
    """,
    survey="X3,D1",
)
def q107_source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights (the multi-corpus
    mixing computation in LLM training pipelines): weight_i =
    n_tokens_i^0.7 / Σ_j n_tokens_j^0.7, plus the implied epochs each
    source is traversed for a 1M-token budget — >1 means the source is
    over-sampled (up-weighted small corpus), <1 under-sampled.

    Scale posture: one partial-aggregating groupBy over the corpus
    (counts only cross the shuffle); the normalization window runs over
    one row per source — driver-trivial at any corpus size.  Floats are
    pow/division in the same op order on both engines, rounded
    in-query."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    p = F.pow(F.col("n_tokens").cast("double"), F.lit(0.7))
    total = F.sum(p).over(Window.partitionBy())
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(p / total, 6).alias("weight"),
        F.round(F.lit(1000000) * (p / total) / F.col("n_tokens").cast("double"), 6).alias(
            "epochs_at_1m"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q141 — deterministic training-shard assignment + balance audit
# ---------------------------------------------------------------------------


@query(
    "q141_shard_assignment",
    oracle="""
    WITH shards AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(strpos('0123456789abcdef',
                           substr(sha256(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                    AS BIGINT) AS shard
        FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_id,
           MAX(doc_id) AS max_id
    FROM shards
    GROUP BY shard
    ORDER BY shard
    """,
    survey="sampling,X6",
)
def q141_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last step of a training-data pipeline: assign every document
    a deterministic shard (id-keyed cryptographic hash nibble → 16
    shards, so re-runs land every doc in the same shard with no RNG
    state) and emit the per-shard balance audit — doc and token counts
    per shard — that a trainer checks before an epoch.  The sha256-hex
    scheme is the engine-exact form (q94's hash_split idiom); at 100 TB
    the same expression feeds ``write.partitionBy("shard")``.

    Scale posture: map-only shard assignment fused into the scan, one
    16-group aggregation — no data-sized shuffle; writing the shards is
    a partitioned write keyed on the same expression."""
    d = load_table(spark, sf_dir, "documents")
    shard = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 1),
        )
        - 1
    ).cast("long")
    return (
        d.select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
            shard.alias("shard"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# q148 — curation-funnel observability: per-stage survivor counts
# ---------------------------------------------------------------------------


@query(
    "q148_curation_funnel",
    oracle="""
    WITH base AS (
        SELECT doc_id, text, sha256(text) AS sha,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    quality AS (SELECT * FROM base WHERE n_tokens >= 25),
    deduped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY sha ORDER BY doc_id) AS rn
            FROM quality
        ) WHERE rn = 1
    ),
    decontaminated AS (
        SELECT d.* FROM deduped d
        WHERE NOT EXISTS (
            SELECT 1 FROM base b
            WHERE b.doc_id < 20 AND b.doc_id <> d.doc_id AND b.sha = d.sha
        )
    )
    SELECT
        (SELECT COUNT(*) FROM base) AS n_input,
        (SELECT COUNT(*) FROM quality) AS n_after_quality,
        (SELECT COUNT(*) FROM deduped) AS n_after_dedup,
        (SELECT COUNT(*) FROM decontaminated) AS n_after_decontamination,
        (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM decontaminated) AS surviving_tokens
    """,
    survey="X3,D1,sampling",
)
def q148_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability: the survivor-count funnel every curation
    run reports — input → quality filter (≥25 tokens) → exact dedup
    (first doc per content hash) → decontamination (drop anything whose
    content hash also appears in the doc_id<20 'benchmark' slice) —
    plus the surviving token budget.  One row, five counters: the
    numbers an operator watches to catch a filter suddenly eating the
    corpus.

    Scale posture: each stage is a narrow transformation on (doc_id,
    sha, n_tokens); content never shuffles; the five counters come from
    one aggregation over the final stage plus cheap stage counts — at
    100 TB this materializes as one pass with observation metrics, not
    five scans of the raw corpus."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.sha2("text", 256).alias("sha"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    quality = base.filter(F.col("n_tokens") >= 25)
    w = Window.partitionBy("sha").orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    # one row per sha (no join fan-out): a doc is contaminated when some
    # OTHER bench doc shares its hash — i.e. the bench group has >= 2
    # members, or its single member isn't this doc
    bench_shas = (
        base.filter(F.col("doc_id") < 20)
        .groupBy("sha")
        .agg(F.count(F.lit(1)).alias("b_cnt"), F.min("doc_id").alias("b_min"))
    )
    decon = (
        deduped.join(F.broadcast(bench_shas), "sha", "left")
        .filter(
            F.col("b_cnt").isNull()
            | ~((F.col("b_cnt") >= 2) | (F.col("b_min") != F.col("doc_id")))
        )
        .drop("b_cnt", "b_min")
    )
    return (
        base.agg(F.count(F.lit(1)).alias("n_input"))
        .crossJoin(quality.agg(F.count(F.lit(1)).alias("n_after_quality")))
        .crossJoin(deduped.agg(F.count(F.lit(1)).alias("n_after_dedup")))
        .crossJoin(
            decon.agg(
                F.count(F.lit(1)).alias("n_after_decontamination"),
                F.sum("n_tokens").cast("long").alias("surviving_tokens"),
            )
        )
    )


# ---------------------------------------------------------------------------
# q151 — curriculum deciles: difficulty-bucketed corpus statistics
# ---------------------------------------------------------------------------


@query(
    "q151_curriculum_deciles",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS ttr
        FROM documents
    ),
    buckets AS (
        SELECT *, NTILE(10) OVER (ORDER BY ttr, doc_id) AS decile
        FROM scored
    )
    SELECT decile,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(ttr) AS min_ttr,
           MAX(ttr) AS max_ttr
    FROM buckets
    GROUP BY decile
    ORDER BY decile
    """,
    survey="sampling,X3,2.5-window",
)
def q151_curriculum_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction: bucket the corpus into difficulty
    deciles by type-token ratio (repetitive/templated text scores low,
    lexically rich text high — the cheap difficulty proxy) and report
    each decile's doc count, token budget, and TTR range — the schedule
    table a curriculum-ordered training run consumes.

    Scale posture: the score is a map-only expression; the decile
    assignment is the EXACT two-phase distributed ntile
    (operators/distributed_window.py — range-partition, parallel local
    rank, tiny broadcast carry), not a single-partition global sort;
    the rollup is ten groups.  TTR is a ratio of integers from
    identical token arrays, rounded in-query on both engines."""
    from gmail_etl_spark.operators.distributed_window import attach_ntile

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double"),
            6,
        ).alias("ttr"),
    )
    return (
        attach_ntile(scored, ["ttr", "doc_id"], 10, "decile")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("ttr").alias("min_ttr"),
            F.max("ttr").alias("max_ttr"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q152 — greedy token-budget selection (take best docs until budget)
# ---------------------------------------------------------------------------


@query(
    "q152_token_budget_selection",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS ttr
        FROM documents
    ),
    running AS (
        SELECT *,
               CAST(SUM(n_tokens) OVER (ORDER BY ttr DESC, doc_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_tokens
        FROM scored
    )
    SELECT doc_id, n_tokens, ttr, cum_tokens
    FROM running
    WHERE cum_tokens <= 10000
    ORDER BY doc_id
    """,
    survey="sampling,2.5-window",
)
def q152_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained subset selection: rank the corpus by quality
    (TTR descending, deterministic tie-break) and keep documents while
    the running token total stays within the 10k budget — the greedy
    'best data under a token budget' step of data-constrained training
    recipes.

    Scale posture: the running total is the EXACT two-phase distributed
    prefix sum (operators/distributed_window.py) over the quality
    order — no single-partition sort of the corpus; the cumulative sum
    is exact integers, so the cut point is engine-exact."""
    from gmail_etl_spark.operators.distributed_window import attach_prefix_agg

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double"),
            6,
        ).alias("ttr"),
    )
    with_cum = attach_prefix_agg(
        scored,
        [F.desc("ttr"), F.asc("doc_id")],
        "n_tokens",
        "__cum",
        op="sum",
    )
    return (
        with_cum.withColumn("cum_tokens", F.col("__cum").cast("long"))
        .drop("__cum")
        .filter(F.col("cum_tokens") <= 10000)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q159 — deterministic weighted sampling (Efraimidis–Spirakis, hash-u)
# ---------------------------------------------------------------------------


@query(
    "q159_weighted_sample",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS w,
               -- uniform in (0,1) from the first 8 sha256 nibbles —
               -- deterministic, identical on every engine
               (CAST(list_sum(list_transform(range(1, 9), i ->
                    CAST(strpos('0123456789abcdef',
                                substr(sha256(CAST(doc_id AS VARCHAR)), i, 1)) - 1
                         AS BIGINT)
                    * CAST(power(16, 8 - i) AS BIGINT))) AS DOUBLE) + 1)
                 / 4294967297.0 AS u
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, w,
               ROUND(POWER(u, 1.0 / w), 9) AS k
        FROM scored
    )
    SELECT doc_id, CAST(w AS BIGINT) AS weight, k AS sample_key
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT 50
    """,
    survey="sampling",
)
def q159_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, fully deterministic: the
    Efraimidis–Spirakis A-ES scheme (key = u^(1/w), take the top-k
    keys) with the uniform drawn from a cryptographic hash of the id
    instead of an RNG — so the same corpus always yields the same
    sample, re-runs are reproducible, and a SQL oracle can verify the
    selection exactly.  Weight = token count (longer documents
    proportionally likelier), the distribution-correct primitive behind
    weighted source mixing.

    Scale posture: map-only key computation, one top-k (TakeOrdered —
    no full sort materialization); keys are rounded to 9 dp before
    ranking so a libm pow() last-ulp difference cannot reorder the
    selection, with doc_id as the total-order tie-break."""
    d = load_table(spark, sf_dir, "documents")
    sha = F.sha2(F.col("doc_id").cast("string"), 256)
    u_int = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: (
                (F.instr(F.lit("0123456789abcdef"), F.substring(sha, i, F.lit(1))) - 1)
                * F.pow(F.lit(16.0), (F.lit(8) - i).cast("double")).cast("long")
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = F.size(F.split("text", " "))
    u = (u_int.cast("double") + 1) / F.lit(4294967297.0)
    k = F.round(F.pow(u, 1.0 / w.cast("double")), 9)
    return (
        d.select(
            "doc_id",
            w.cast("long").alias("weight"),
            k.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q172 — erasure impact audit: cascade counts for a deletion list
# ---------------------------------------------------------------------------


@query(
    "q172_erasure_impact",
    oracle="""
    WITH victims AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 13 = 0
    )
    SELECT
        (SELECT COUNT(*) FROM victims) AS n_users,
        (SELECT COUNT(*) FROM events e
         WHERE EXISTS (SELECT 1 FROM victims v WHERE v.user_id = e.user_id))
            AS n_events,
        (SELECT COUNT(*) FROM orders o
         WHERE EXISTS (SELECT 1 FROM victims v WHERE v.user_id = o.o_custkey))
            AS n_orders,
        (SELECT COUNT(*) FROM lineitem l
         WHERE EXISTS (
             SELECT 1 FROM orders o
             JOIN victims v ON v.user_id = o.o_custkey
             WHERE o.o_orderkey = l.l_orderkey))
            AS n_lineitems
    """,
    survey="J1,2.5-agg",
)
def q172_erasure_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact audit: given a deletion list (users
    with id % 13 == 0 here), the row counts an erasure job will touch in
    every table that references them — directly (events, orders) and
    transitively (lineitems of their orders).  The dry-run report a
    compliance pass signs off before the actual anti-join rewrite.

    Scale posture: the deletion list broadcasts into three semi-joins
    (left_semi — no row widening); the transitive hop reuses the
    filtered orders' keys as the next broadcast.  Counts are exact."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    victims = e.filter(F.col("user_id") % 13 == 0).select("user_id").distinct()
    ev = e.join(F.broadcast(victims), "user_id", "left_semi")
    ord_hit = o.join(
        F.broadcast(victims.select(F.col("user_id").alias("o_custkey"))),
        "o_custkey",
        "left_semi",
    )
    li_hit = li.join(
        F.broadcast(ord_hit.select(F.col("o_orderkey").alias("l_orderkey"))),
        "l_orderkey",
        "left_semi",
    )
    return (
        victims.agg(F.count(F.lit(1)).alias("n_users"))
        .crossJoin(F.broadcast(ev.agg(F.count(F.lit(1)).alias("n_events"))))
        .crossJoin(F.broadcast(ord_hit.agg(F.count(F.lit(1)).alias("n_orders"))))
        .crossJoin(F.broadcast(li_hit.agg(F.count(F.lit(1)).alias("n_lineitems"))))
    )


# ---------------------------------------------------------------------------
# q258 — the COMPOSED curation pipeline as one hash-oracled row.  Every
# stage was already individually hash-oracled (q94 split, q97 decontam,
# q44 sha256-family MinHash LSH, q47/q48 recursive-CTE components, q72
# recursive-CTE packing); this row chains them on one corpus slice so
# the driver verifies the COMPOSITION — stage boundaries, not just
# operators — the same contract tests/test_curation_e2e.py pins locally
# and tools/curation_scale.py proves at 2M docs.  Output is one summary
# row per stage (count, id-sum, exact integer metric), so the hash
# covers every stage's full membership without shipping texts.
# ---------------------------------------------------------------------------

_Q258_BUDGET = 128

_Q258_HEX = "0123456789abcdef"
_Q258_NIB8 = " + ".join(
    f"(strpos('{_Q258_HEX}', substr(sha256(CAST(item_id AS VARCHAR)), {i + 1}, 1)) - 1)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
)


def _q258_oracle() -> str:
    from gmail_etl_spark.plans.dedup_queries import _sha_minhash_pair_ctes

    b = _Q258_BUDGET
    return f"""
    WITH RECURSIVE docs AS (
        -- the fixture plants NO exact-duplicate texts, so the slice is
        -- augmented with offset-id copies of the first 50 docs: the
        -- exact-dedup stage must collapse exactly those and min-id
        -- canonicalization must recover the originals (otherwise the
        -- stage would be identity-on-this-fixture, an unexercised path
        -- in the very gate meant to exercise the composition)
        SELECT doc_id, text, string_split(text, ' ') AS toks
        FROM documents WHERE doc_id < 1000
        UNION ALL
        SELECT doc_id + 100000, text, string_split(text, ' ')
        FROM documents WHERE doc_id < 50
    ),
    quality AS MATERIALIZED (SELECT * FROM docs WHERE len(toks) >= 20),
    canon AS (
        SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY sha256(text)
    ),
    stage2 AS MATERIALIZED (SELECT q.* FROM quality q JOIN canon USING (doc_id)),
    -- q44's sha256-family MinHash+LSH pipeline (shared emitter),
    -- sourced from stage2{_sha_minhash_pair_ctes("stage2", 0.5, out_cte="pairs")},
    -- q47's min-reachable-id connected components over the LSH pairs
    edges AS (SELECT a_id AS u, b_id AS v FROM pairs
              UNION SELECT b_id, a_id FROM pairs),
    reach(id, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT reach.id, edges.v FROM reach JOIN edges ON reach.r = edges.u
    ),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
    stage3 AS MATERIALIZED (
        SELECT s.* FROM stage2 s
        LEFT JOIN comp ON comp.id = s.doc_id
        WHERE comp.id IS NULL OR comp.component = s.doc_id
    ),
    -- q94's content-hash split (first hash byte < 0xcc = floor(256*0.8))
    train AS MATERIALIZED (SELECT * FROM stage3 WHERE substr(sha256(text), 1, 2) < 'cc'),
    evald AS MATERIALIZED (SELECT * FROM stage3 WHERE substr(sha256(text), 1, 2) >= 'cc'),
    -- q97's shingle-containment decontamination of eval against train
    bench_sh AS (
        SELECT DISTINCT doc_id AS id,
               array_to_string(toks[i:i+2], ' ') AS shingle
        FROM evald, UNNEST(range(1, greatest(len(toks) - 1, 2))) AS t(i)
    ),
    train_sh AS (
        SELECT DISTINCT array_to_string(toks[i:i+2], ' ') AS shingle
        FROM train, UNNEST(range(1, greatest(len(toks) - 1, 2))) AS t(i)
    ),
    decont AS (
        SELECT id,
               SUM(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_cont
        FROM bench_sh bs LEFT JOIN train_sh t USING (shingle)
        GROUP BY id
    ),
    -- q72's recursive first-fit-decreasing packing of the train split
    items AS (
        SELECT doc_id AS item_id, len(toks) AS n,
               ({_Q258_NIB8}) % 64 AS bucket
        FROM train
    ),
    ord AS (
        SELECT bucket, item_id, n,
               ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY n DESC, item_id)
                   AS step
        FROM items
    ),
    bsizes AS (SELECT bucket, COUNT(*) AS n_items FROM ord GROUP BY bucket),
    pack(bucket, step, spaces, assigned) AS (
        SELECT bucket, CAST(0 AS BIGINT), CAST([] AS BIGINT[]), CAST([] AS BIGINT[])
        FROM bsizes
        UNION ALL
        SELECT p.bucket, p.step + 1,
               CASE WHEN NULLIF(list_position(list_transform(p.spaces, s -> s >= o.n), true), 0)
                         IS NOT NULL
                    THEN list_transform(p.spaces, (s, i) ->
                         CASE WHEN i = NULLIF(list_position(
                                  list_transform(p.spaces, s2 -> s2 >= o.n), true), 0)
                              THEN s - o.n ELSE s END)
                    ELSE list_append(p.spaces, greatest({b} - o.n, CAST(0 AS BIGINT)))
               END,
               list_append(p.assigned,
                   CAST(COALESCE(
                       NULLIF(list_position(list_transform(p.spaces, s -> s >= o.n), true), 0) - 1,
                       len(p.spaces)) AS BIGINT))
        FROM pack p
        JOIN ord o ON o.bucket = p.bucket AND o.step = p.step + 1
    ),
    done AS (
        SELECT p.bucket, p.assigned
        FROM pack p JOIN bsizes s ON s.bucket = p.bucket AND p.step = s.n_items
    ),
    expand AS (
        SELECT bucket, assigned, unnest(range(1, len(assigned) + 1)) AS step
        FROM done
    ),
    packed AS (
        SELECT e.bucket,
               e.bucket * 1000000000 + e.assigned[e.step] AS seq_id,
               o.item_id
        FROM expand e JOIN ord o ON o.bucket = e.bucket AND o.step = e.step
    )
    SELECT '1_quality' AS stage, COUNT(*) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum, CAST(NULL AS DOUBLE) AS metric
    FROM quality
    UNION ALL
    SELECT '2_exact_dedup', COUNT(*), CAST(SUM(doc_id) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM stage2
    UNION ALL
    SELECT '3_near_dedup', COUNT(*), CAST(SUM(doc_id) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM stage3
    UNION ALL
    SELECT '4_split_train', COUNT(*), CAST(SUM(doc_id) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM train
    UNION ALL
    SELECT '4_split_eval', COUNT(*), CAST(SUM(doc_id) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM evald
    UNION ALL
    SELECT '5_decontamination', COUNT(*), CAST(SUM(id) AS BIGINT),
           CAST(SUM(n_cont) AS DOUBLE)
    FROM decont
    UNION ALL
    SELECT '6_pack', COUNT(*), CAST(SUM(item_id) AS BIGINT),
           CAST(COUNT(DISTINCT seq_id) AS DOUBLE)
    FROM packed
    ORDER BY stage
    """


@query(
    "q258_composed_curation",
    oracle=_q258_oracle(),
    survey="D1,D2,X3,sampling",
)
def q258_composed_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline as ONE driver-verified row:
    quality gate → exact dedup → sha256-family MinHash-LSH near-dedup →
    connected components → content-keyed split → decontamination →
    sequence packing, each stage feeding the next, summarized as one
    (count, id-sum, exact-metric) row per stage so the value hash pins
    every stage's full membership.

    The oracle chains the per-stage oracle techniques already proven on
    q94/q97/q44/q47/q72 — sha256-nibble hash arithmetic, a recursive
    min-reachable-id component CTE, and a recursive first-fit packing
    CTE — into one SQL statement over the same bounded slice.

    Scale shape: identical to the component operators' (each is
    individually posture-audited); the slice bound exists for the
    oracle's recursive fixpoints, not the Spark plan."""
    from gmail_etl_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        near_dedup,
    )
    from gmail_etl_spark.operators.sampling import pack_sequences
    from gmail_etl_spark.plans.dedup_queries import _Q44_BANDS, _Q44_N_HASHES

    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 1000)
        .select("doc_id", "text")
    )
    # planted exact copies — see the oracle's docs CTE comment
    d = base.unionByName(
        base.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    quality = d.filter(F.size(F.split("text", " ")) >= 20)
    canon = exact_dedup(quality, "doc_id", "text").select(
        F.col("canonical_id").alias("doc_id")
    )
    stage2 = quality.join(canon, "doc_id")
    pairs = minhash_lsh_pairs(
        stage2,
        "doc_id",
        "text",
        k=3,
        n_hashes=_Q44_N_HASHES,
        bands=_Q44_BANDS,
        threshold=0.5,
        max_bucket=1_000_000,
        hash_family="sha256",
    )
    # the seven summary branches below share this subtree; without a
    # cache each branch re-runs the whole LSH chain (the Spark-side
    # analog of the oracle's AS MATERIALIZED).  Bounded: ≤1050 rows of
    # (doc_id, text) at any SF, retained for the session like q256's
    # sidecar — the slice bound makes that a few hundred KB.
    stage3 = near_dedup(stage2, "doc_id", pairs).cache()
    split = hash_split(stage3, "text", train_pct=80)
    train = split.filter(F.col("split") == "train")
    evald = split.filter(F.col("split") == "eval")
    report = contamination_report(evald, train, "doc_id", "text", k=3)
    packed = pack_sequences(
        train.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens")),
        "doc_id",
        "n_tokens",
        budget=_Q258_BUDGET,
        bucket_family="sha256",
    )

    def _summ(df_: DataFrame, stage: str, idc: str, metric=None) -> DataFrame:
        agg = [
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col(idc)).cast("long").alias("id_sum"),
        ]
        if metric is not None:
            agg.append(metric.cast("double").alias("metric"))
        out = df_.agg(*agg)
        if metric is None:
            out = out.withColumn("metric", F.lit(None).cast("double"))
        return out.select(
            F.lit(stage).alias("stage"), "n_rows", "id_sum", "metric"
        )

    return (
        _summ(quality, "1_quality", "doc_id")
        .unionByName(_summ(stage2, "2_exact_dedup", "doc_id"))
        .unionByName(_summ(stage3, "3_near_dedup", "doc_id"))
        .unionByName(_summ(train, "4_split_train", "doc_id"))
        .unionByName(_summ(evald, "4_split_eval", "doc_id"))
        .unionByName(
            _summ(report, "5_decontamination", "id", metric=F.sum("n_contaminated"))
        )
        .unionByName(
            _summ(packed, "6_pack", "item_id", metric=F.count_distinct("seq_id"))
        )
        .orderBy("stage")
    )
