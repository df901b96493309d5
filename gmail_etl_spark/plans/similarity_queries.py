"""Similarity-search catalog entries (X1)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmail_etl_spark.operators.similarity import cosine_topk
from gmail_etl_spark.plans.catalog import load_table, query

# ---------------------------------------------------------------------------
# q50 — brute-force cosine top-k (exact baseline)
# ---------------------------------------------------------------------------


@query(
    "q50_knn_exact",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c_vec FROM embeddings),
    scored AS (
        SELECT q.query_id, c.neighbor_id,
               round(list_cosine_similarity(q.q_vec, c.c_vec), 6) AS sim
        FROM q CROSS JOIN c
        WHERE q.query_id <> c.neighbor_id
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    survey="X1",
    headline=True,
)
def q50_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(queries, emb, k=5).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q51 — IVF-partitioned kNN: probe only the query's coarse cell
# ---------------------------------------------------------------------------


@query(
    "q51_knn_ivf",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label AS cell, embedding::DOUBLE[] AS q_vec
               FROM embeddings WHERE vec_id < 20),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.q_vec, c.embedding::DOUBLE[]), 6) AS sim
        FROM q JOIN embeddings c ON c.label = q.cell
        WHERE q.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= 3
    ORDER BY query_id, rank
    """,
    survey="X1",
)
def q51_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF structure with the class label standing in as the coarse
    quantizer cell: each query probes one cell instead of the full
    corpus — the 100 TB shape (cells = partition key), exact within the
    probed cell, oracle-checkable because the cell assignment is a
    column."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return cosine_topk(queries, emb, k=3, cell_col="label").orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q53 — brute-force cosine top-k, Arrow/numpy kernel (X1 scale path)
# ---------------------------------------------------------------------------


@query(
    "q53_knn_vectorized",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c_vec FROM embeddings),
    scored AS (
        SELECT q.query_id, c.neighbor_id,
               round(list_cosine_similarity(q.q_vec, c.c_vec), 6) AS sim
        FROM q CROSS JOIN c
        WHERE q.query_id <> c.neighbor_id
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    survey="X1",
)
def q53_knn_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as q50, executed through the mapInPandas/BLAS
    kernel (one matmul per Arrow batch, per-batch partial top-k) — the
    form that holds at 100 TB, where per-row array expressions lose to
    batched linear algebra."""
    from gmail_etl_spark.operators.similarity import cosine_topk_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk_vectorized(queries, emb, k=5).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q54 — sign-random-projection LSH near-dup pairs (X1/D2 scale path),
# HASH-ORACLED as of round 9.
#
# Rows-only until round 9 on a "banding is probabilistic" rationale that
# conflated approximate-vs-truth with oracle-ability: the output is a
# deterministic function of the fixtures, and the oracle only has to
# REPLAY the algorithm.  Everything here replays exactly:
#   * the hyperplanes are deterministic splitmix64-derived double
#     LITERALS (operators.similarity._hyperplane) — the oracle embeds the
#     same constants, generated at import by the same function;
#   * each sign bit is a LEFT-ASSOCIATED 64-term dot product — Spark's
#     zip_with + aggregate fold (init 0.0) and the oracle's explicit
#     `0.0 + v[1]*c1 + …` chain execute the identical IEEE-754 op
#     sequence, so the bits agree bit-for-bit;
#   * the band bucket is xxhash64 over the band's r=4 bit columns — only
#     16 possible inputs per band, proven collision-free by
#     tests/test_operators.py::test_srp_band_bucket_hash_collision_free,
#     so grouping by the hash IS grouping by the bit tuple, which the
#     oracle replays as string-key equality;
#   * the exact-cosine verify mirrors q46's oracle form
#     (list_cosine_similarity + round 6), already proven green on the
#     SUPERSET of these pairs (q46 is the full O(n²) join on the same
#     seeded corpus at the same 0.99 threshold).
# The recall contract of banding stays pinned by the property tests and
# srp_params_for_recall.
# ---------------------------------------------------------------------------

_Q54_N_PLANES, _Q54_BANDS, _Q54_DIM = 16, 4, 64
_Q54_R = _Q54_N_PLANES // _Q54_BANDS


def _q54_oracle() -> str:
    from gmail_etl_spark.operators.similarity import _hyperplane

    bits = []
    for p in range(_Q54_N_PLANES):
        coeffs = _hyperplane(p, _Q54_DIM)
        dot = " + ".join(f"v[{j + 1}]*({c!r})" for j, c in enumerate(coeffs))
        bits.append(f"CASE WHEN (0.0 + {dot}) > 0 THEN 1 ELSE 0 END")
    bits_list = ",\n               ".join(bits)
    bkey = " || ',' || ".join(
        f"bits[{_Q54_R} * bb.band + {r + 1}]::VARCHAR" for r in range(_Q54_R)
    )
    return f"""
    WITH corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id < 100
        UNION ALL
        SELECT vec_id + 1000, embedding::DOUBLE[]
        FROM embeddings WHERE vec_id < 100
    ),
    sig AS (
        SELECT vec_id,
               [{bits_list}] AS bits
        FROM corpus
    ),
    banded AS (
        SELECT vec_id, bb.band AS band, {bkey} AS bkey
        FROM sig CROSS JOIN (SELECT unnest(range(0, {_Q54_BANDS})) AS band) bb
    ),
    cand AS (
        SELECT x.vec_id AS a_id, y.vec_id AS b_id
        FROM banded x
        JOIN banded y ON x.band = y.band AND x.bkey = y.bkey
                     AND x.vec_id < y.vec_id
        GROUP BY x.vec_id, y.vec_id
    )
    SELECT c.a_id, c.b_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS sim
    FROM cand c
    JOIN corpus a ON a.vec_id = c.a_id
    JOIN corpus b ON b.vec_id = c.b_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.99
    ORDER BY a_id, b_id
    """


@query(
    "q54_hyperplane_lsh",
    oracle=_q54_oracle(),
    survey="X1,D2",
)
def q54_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs without the O(n²) cross join: hyperplane
    LSH bucket join + exact-cosine verify (no false positives).  Corpus
    seeded with exact copies (ids +1000, as in q46) so the ≥0.99 band is
    the planted pairs — identical vectors collide in every band, so the
    banding loses none of them.  The DuckDB oracle replays the full
    pipeline (literal hyperplanes, left-associated sign dots, band
    buckets as bit tuples, exact-cosine verify) value-for-value."""
    from gmail_etl_spark.operators.similarity import hyperplane_lsh_pairs

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    copies = emb.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    corpus = emb.select("vec_id", "embedding").unionByName(copies)
    return hyperplane_lsh_pairs(
        corpus,
        "vec_id",
        "embedding",
        dim=_Q54_DIM,
        n_planes=_Q54_N_PLANES,
        bands=_Q54_BANDS,
        threshold=0.99,
    ).orderBy("a_id", "b_id")


# ---------------------------------------------------------------------------
# q46 — embedding-cosine near-duplicate pairs (D2 embedding variant)
# ---------------------------------------------------------------------------


@query(
    "q46_embedding_near_dup",
    oracle="""
    WITH corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id < 100
        UNION ALL
        SELECT vec_id + 1000, embedding::DOUBLE[]
        FROM embeddings WHERE vec_id < 100
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS sim
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.99
    ORDER BY a_id, b_id
    """,
    survey="D2,X1",
)
def q46_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-threshold near-dup over an embedding column: the corpus is
    seeded with exact copies (ids +1000) so the >=0.99 band is exactly
    the planted pairs — same construction on both engines."""
    from gmail_etl_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    copies = base.select((F.col("vec_id") + 1000).alias("vec_id"), "v")
    corpus = base.unionByName(copies)
    a = corpus.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va"))
    b = corpus.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb"))
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .filter(sim >= 0.99)
        .select("a_id", "b_id", F.round(sim, 6).alias("sim"))
        .orderBy("a_id", "b_id")
    )


# ---------------------------------------------------------------------------
# q52 — per-label centroids (IVF training shape), long form
# ---------------------------------------------------------------------------


@query(
    "q52_label_centroids",
    oracle="""
    WITH flat AS (
        SELECT label,
               generate_subscripts(embedding, 1) AS dim,
               unnest(embedding::DOUBLE[]) AS val
        FROM embeddings
    )
    SELECT label, dim,
           CAST(SUM(CAST(val AS DECIMAL(20,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS centroid_val
    FROM flat
    GROUP BY label, dim
    ORDER BY label, dim
    """,
    survey="X1",
)
def q52_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell centroid table — what an IVF coarse quantizer trains.
    posexplode → (label, dim) partial aggregation: one shuffle of
    (label, dim, partial-sum) triples regardless of corpus size.
    DECIMAL(20,12) sums keep the result accumulation-order-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
    ).select("label", (F.col("pos") + 1).alias("dim"), "val")
    return (
        flat.groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(20,12)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("centroid_val")
        )
        .orderBy("label", "dim")
    )


# ---------------------------------------------------------------------------
# q75 — learned IVF: k-means training + cell assignment, HASH-ORACLED as
# of round 9.  The old "iterative Lloyd's has no SQL formulation" was
# half-true: a FIXED number of iterations is just chained CTEs; the real
# blocker was the float centroid sums, whose value depends on
# accumulation order.  exact_updates=True makes the recompute order-free
# (DECIMAL(20,12) per-dim sums, one double division — the q52 centroid
# discipline), after which every stage replays exactly:
#   * init = the k lowest-id vectors (ROW_NUMBER/LIMIT);
#   * each squared distance is a LEFT-ASSOCIATED 64-term chain matching
#     Spark's zip_with+aggregate fold (init 0.0) bit-for-bit;
#   * argmin tie-break on cluster index = ORDER BY dist, cluster;
#   * empty clusters keep their previous centroid (LEFT JOIN+COALESCE).
# Lloyd-convergence properties stay pinned in tests/test_operators.py.
# ---------------------------------------------------------------------------

_Q75_K, _Q75_DIM = 8, 64
#: Lloyd iteration count — the q75/q110 smoke knob (the q259/q255
#: precedent): each iteration is a fixed-overhead collect job whose
#: cost dwarfs the row work at the sf0.001 smoke tier, so
#: tools/sweep.py sets SPARK_GRAFT_Q75_ITERS=2 there.  Spark plan AND
#: DuckDB oracle are both generated from this constant, so the two
#: engines always replay the same training loop; the sf0.01
#: driver-gate tier and the default keep the 3-iteration production
#: shape.  Values are bounded so a typo cannot silently train a
#: degenerate (0-iteration) or pathological quantizer.
_Q75_ITERS_RAW = os.environ.get("SPARK_GRAFT_Q75_ITERS", "3")
try:
    _Q75_ITERS = int(_Q75_ITERS_RAW)
    if not 1 <= _Q75_ITERS <= 8:
        raise ValueError
except ValueError:
    raise ValueError(
        f"SPARK_GRAFT_Q75_ITERS={_Q75_ITERS_RAW!r} is not supported; "
        "use an integer in 1..8 (the q75/q110 k-means smoke-tier "
        "iteration knob)"
    ) from None


def _kmeans_ctes(corpus_cte: str, k: int, iters: int, dim: int) -> tuple[str, str]:
    """CTE-chain fragment replaying train_kmeans(exact_updates=True) over
    ``corpus_cte`` (vec_id, v DOUBLE[]).  Returns (sql_fragment,
    final_assign_cte): the fragment defines c0..c{iters} and a1..a{iters+1};
    the final assignment CTE has (vec_id, v, cluster, dist, rn) with rn=1
    marking each vector's cell under the final centroids."""
    dist = "0.0 + " + " + ".join(
        f"(x.v[{j}]-c.c[{j}])*(x.v[{j}]-c.c[{j}])" for j in range(1, dim + 1)
    )
    parts = [
        f"""c0 AS (
        SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cluster, v AS c
        FROM {corpus_cte} ORDER BY vec_id LIMIT {k}
    )"""
    ]
    for t in range(1, iters + 2):
        parts.append(f"""a{t} AS (
        SELECT vec_id, v, cluster, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        FROM (SELECT x.vec_id, x.v, c.cluster, ({dist}) AS dist
              FROM {corpus_cte} x CROSS JOIN c{t - 1} c)
    )""")
        if t == iters + 1:
            break  # the last assignment is the output; no further update
        parts.append(f"""m{t} AS (
        SELECT cluster, d.d AS dim,
               CAST(SUM(CAST(v[d.d] AS DECIMAL(20,12))) AS DOUBLE) / COUNT(*) AS mu
        FROM a{t} CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS d) d
        WHERE rn = 1
        GROUP BY cluster, d.d
    )""")
        parts.append(f"""c{t} AS (
        SELECT o.cluster, COALESCE(n.c, o.c) AS c
        FROM c{t - 1} o LEFT JOIN (
            SELECT cluster, list(mu ORDER BY dim) AS c FROM m{t} GROUP BY cluster
        ) n USING (cluster)
    )""")
    return ",\n    ".join(parts), f"a{iters + 1}"


def _q75_oracle() -> str:
    ctes, final = _kmeans_ctes("corpus", _Q75_K, _Q75_ITERS, _Q75_DIM)
    return f"""
    WITH corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    {ctes}
    SELECT vec_id, CAST(cluster AS INT) AS cluster
    FROM {final} WHERE rn = 1 ORDER BY vec_id
    """


@query(
    "q75_kmeans_cells",
    oracle=_q75_oracle(),
    survey="X1",
)
def q75_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the IVF coarse quantizer (deterministic Lloyd's, k=8,
    3 iterations, order-free exact centroid updates) and emit each
    vector's learned cell — the input the cell-probe search (q51)
    consumes.  The DuckDB oracle replays the full training loop as
    chained CTEs (see the module comment above)."""
    from gmail_etl_spark.operators.similarity import train_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    assign, _ = train_kmeans(emb, k=_Q75_K, iters=_Q75_ITERS, exact_updates=True)
    return assign.select(F.col("id").alias("vec_id"), "cluster").orderBy("vec_id")


# q110 — HASH-ORACLED as of round 9: the full SemDeDup pipeline replays
# in SQL once the trainer is exact (see q75's module comment) — k-means
# CTE chain → within-cell pairs → cosine ≥ 0.995 with the EXACT fold
# replay (left-assoc dot and norms, so threshold decisions can't flip on
# engine ulps) → q47's recursive-CTE connected components → keep min id
# per component plus every unpaired row.


def _q110_oracle() -> str:
    dim = _Q75_DIM
    ctes, final = _kmeans_ctes("corpus", _Q75_K, _Q75_ITERS, dim)
    norm = "0.0 + " + " + ".join(f"v[{j}]*v[{j}]" for j in range(1, dim + 1))
    dot = "0.0 + " + " + ".join(f"va.v[{j}]*vb.v[{j}]" for j in range(1, dim + 1))
    return f"""
    WITH RECURSIVE corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 100000, embedding::DOUBLE[]
        FROM embeddings WHERE vec_id < 100
    ),
    {ctes},
    assign AS (SELECT vec_id, cluster FROM {final} WHERE rn = 1),
    vecs AS (SELECT vec_id, v, sqrt({norm}) AS nrm FROM corpus),
    sim_pairs AS (
        SELECT a.vec_id AS pu, b.vec_id AS pw
        FROM assign a
        JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN vecs va ON va.vec_id = a.vec_id
        JOIN vecs vb ON vb.vec_id = b.vec_id
        WHERE ({dot}) / (va.nrm * vb.nrm) >= 0.995
    ),
    edges AS (SELECT pu AS u, pw AS w FROM sim_pairs
              UNION SELECT pw, pu FROM sim_pairs),
    reach(id, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT reach.id, edges.w FROM reach JOIN edges ON reach.r = edges.u
    ),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
    SELECT c.vec_id
    FROM corpus c LEFT JOIN comp ON comp.id = c.vec_id
    WHERE comp.id IS NULL OR comp.component = c.vec_id
    ORDER BY vec_id
    """


@query(
    "q110_semantic_dedup",
    oracle=_q110_oracle(),
    survey="D2,X1",
)
def q110_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup: k-means cells bound the pairwise
    comparison, cosine >= 0.995 pairs cluster via connected components,
    one canonical vector survives per group.  The corpus is the
    embeddings table seeded with exact copies (ids +100000, as in q46)
    so the dedup provably fires: every copy must vanish in favor of its
    lower-id original, restoring the original row count.  The DuckDB
    oracle replays the entire pipeline — exact-update k-means, fold-exact
    cosine, recursive-CTE components; the planted-duplicate guarantee is
    also property-tested in tests/test_operators.py."""
    from gmail_etl_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return (
        semantic_dedup(
            emb.unionByName(copies),
            "vec_id",
            "embedding",
            k=_Q75_K,
            iters=_Q75_ITERS,
            exact_updates=True,
        )
        .select("vec_id")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q119 — int8 scalar quantization of the embedding column (X1 extension:
# the compression step ANN indexes apply before sharding).  Per-vector
# min/max affine quantization to 0..255 codes; the oracle re-derives the
# codes in SQL and matches on the *integer* code checksum (exact — no
# float accumulation) plus the order-independent max reconstruction
# error.
# ---------------------------------------------------------------------------


@query(
    "q119_int8_quantize",
    oracle="""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings
    ),
    ranged AS (
        SELECT vec_id, emb,
               list_aggregate(emb, 'min') AS mn,
               list_aggregate(emb, 'max') AS mx,
               (list_aggregate(emb, 'max') - list_aggregate(emb, 'min')) / 255.0
                   AS scale
        FROM base
    ),
    coded AS (
        SELECT vec_id, emb, mn, mx, scale,
               CASE WHEN scale > 0
                    THEN list_transform(emb,
                         x -> CAST(floor((x - mn) / scale + 0.5) AS BIGINT))
                    ELSE list_transform(emb, x -> CAST(0 AS BIGINT)) END AS codes
        FROM ranged
    )
    SELECT vec_id,
           len(emb) AS n_dims,
           round(mn, 6) AS vmin,
           round(mx, 6) AS vmax,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           round(list_max(
               list_transform(range(1, len(emb) + 1),
                   i -> abs(emb[i] - (mn + codes[i] * scale)))), 6) AS max_abs_err
    FROM coded
    ORDER BY vec_id
    """,
    survey="X1",
)
def q119_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (min/max affine) int8 quantization of embeddings, entirely
    in JVM array expressions: per-vector range, 0..255 code assignment
    via floor(x+0.5), and a reconstruction-error audit.  ``code_sum`` is
    an exact integer checksum over the codes, so a green row proves the
    quantized representation bit-for-bit; ``max_abs_err`` (an
    order-independent max, never a float sum) bounds the information
    loss — it must be <= scale/2 by construction.

    Scale posture: map-only over the vector scan (no shuffle before the
    presentation sort); at 100 TB this is the narrow pass that shrinks
    an ANN index 4x before the shard shuffle."""
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", emb_d.alias("emb"))
        .select(
            "vec_id",
            "emb",
            F.array_min("emb").alias("mn"),
            F.array_max("emb").alias("mx"),
            ((F.array_max("emb") - F.array_min("emb")) / 255.0).alias("scale"),
        )
        .select(
            "vec_id",
            "emb",
            "mn",
            "mx",
            "scale",
            F.when(
                F.col("scale") > 0,
                F.transform(
                    F.col("emb"),
                    lambda x: F.floor((x - F.col("mn")) / F.col("scale") + 0.5).cast(
                        "long"
                    ),
                ),
            )
            .otherwise(F.transform(F.col("emb"), lambda x: F.lit(0).cast("long")))
            .alias("codes"),
        )
    )
    recon_err = F.zip_with(
        F.col("emb"),
        F.col("codes"),
        lambda x, c: F.abs(x - (F.col("mn") + c * F.col("scale"))),
    )
    return base.select(
        "vec_id",
        F.size("emb").cast("long").alias("n_dims"),
        F.round("mn", 6).alias("vmin"),
        F.round("mx", 6).alias("vmax"),
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda acc, c: acc + c
        ).alias("code_sum"),
        F.round(F.array_max(recon_err), 6).alias("max_abs_err"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# q132 — product quantization: codebooks, encode, ADC top-k
# ---------------------------------------------------------------------------


@query(
    "q132_pq_adc_topk",
    oracle=None,
    survey="X1",
    rows_only_reason=(
        "PQ/ADC distances are codebook-quantized approximations; gated "
        "by a recall@k test vs exact top-k"
    ),
)
def q132_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate nearest neighbor (the classic IVFADC memory
    path, Jégou et al. 2011): train m=8 × ksub=16 subspace codebooks on
    a deterministic sample, encode the corpus to 8-code arrays, answer
    5 queries by asymmetric-distance top-10.

    Rows-only for the driver (k-means + per-subspace argmin has no sane
    SQL form); `tests/test_operators.py` checks code bounds,
    determinism, and recall@10 against exact L2 search."""
    from gmail_etl_spark.operators.similarity import pq_topk, train_pq

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq(emb, m=8, ksub=16, iters=3, sample_n=2048)
    queries = emb.orderBy("vec_id").limit(5)
    return pq_topk(queries, emb, books, k=10).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q135 — Johnson–Lindenstrauss signed random projection (dim 64 → 16)
# ---------------------------------------------------------------------------


@query(
    "q135_jl_projection",
    oracle="""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS fp
        FROM embeddings
    ),
    hashed AS (
        -- murmur-style xor-shift finalizer on (input dim, output dim):
        -- one affine multiply alone leaves lattice-correlated sign bits
        SELECT vec_id, fp,
               list_transform(range(0, 16), j ->
                   list_transform(range(1, len(fp) + 1), i ->
                       xor(
                         (xor(
                            (xor(((i-1)*2654435761 + j*97) % 2147483648,
                                 (((i-1)*2654435761 + j*97) % 2147483648) // 65536)
                             * 2246822519) % 2147483648,
                            ((xor(((i-1)*2654435761 + j*97) % 2147483648,
                                  (((i-1)*2654435761 + j*97) % 2147483648) // 65536)
                              * 2246822519) % 2147483648) // 8192)
                          * 3266489917) % 2147483648,
                         (((xor(
                            (xor(((i-1)*2654435761 + j*97) % 2147483648,
                                 (((i-1)*2654435761 + j*97) % 2147483648) // 65536)
                             * 2246822519) % 2147483648,
                            ((xor(((i-1)*2654435761 + j*97) % 2147483648,
                                  (((i-1)*2654435761 + j*97) % 2147483648) // 65536)
                              * 2246822519) % 2147483648) // 8192)
                          * 3266489917) % 2147483648) // 65536)
                       ) % 2)) AS bits
        FROM base
    ),
    proj AS (
        SELECT vec_id,
               list_transform(range(0, 16), j ->
                   CAST(list_sum(list_transform(range(1, len(fp) + 1), i ->
                       fp[i] * (2 * bits[j+1][i] - 1)
                   )) AS BIGINT)) AS codes
        FROM hashed
    )
    SELECT vec_id,
           16 AS k_dims,
           array_to_string(list_transform(codes, c -> CAST(c AS VARCHAR)), ' ')
               AS proj_fp
    FROM proj
    ORDER BY vec_id
    """,
    survey="X1",
)
def q135_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss signed random projection (Achlioptas 2003
    ±1 variant): each of the 16 output dims is a ±1-signed sum over the
    input vector, signs drawn from a deterministic multiplicative
    integer hash of (input dim, output dim) — no RNG state, identical
    on any engine.  The pairwise-distance-preserving dimensionality
    reducer that shrinks ANN index cost ~4× before sharding.

    Engine-exactness: inputs are fixed-pointed to 1e-6 BEFORE the
    signed accumulation, so every sum is integer arithmetic — no
    float-summation-order ulp anywhere — and the projected vector is
    emitted as a space-joined fixed-point string (sortable and hashable
    by the driver's canonicalizer; same information as the array).

    Scale posture: map-only over the embedding scan — no shuffle, no
    Python; whole-stage codegen over nested integer HOFs.  Distance
    preservation (the JL guarantee) is property-tested in
    tests/test_operators.py against exact pairwise distances."""
    emb_fp = F.expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))"
    )
    # murmur-style xor-shift finalizer on (i, j) → ±1 sign; all 31-bit
    # intermediate products stay inside int64 (max ~6.9e18)
    _h0 = "((i*2654435761 + j*97) % 2147483648)"
    _h1 = f"((({_h0} ^ ({_h0} div 65536)) * 2246822519) % 2147483648)"
    _h2 = f"((({_h1} ^ ({_h1} div 8192)) * 3266489917) % 2147483648)"
    _bit = f"(({_h2} ^ ({_h2} div 65536)) % 2)"
    codes = F.expr(
        "transform(sequence(0, 15), j -> "
        " aggregate(transform(fp, (x, i) -> "
        f"   x * (2 * {_bit} - 1)),"
        "  0L, (acc, v) -> acc + v))"
    )
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", emb_fp.alias("fp"))
        .select("vec_id", codes.alias("codes"))
        .select(
            "vec_id",
            F.lit(16).alias("k_dims"),
            F.array_join(
                F.expr("transform(codes, c -> cast(c as string))"), " "
            ).alias("proj_fp"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q136 — IVFADC: coarse cells + PQ/ADC + exact re-rank (the big-ANN stack)
# ---------------------------------------------------------------------------


@query(
    "q136_ivf_pq_topk",
    oracle=None,
    survey="X1",
    rows_only_reason=(
        "IVFADC results are probe-limited and PQ-quantized (approximate "
        "by architecture); gated by a recall@10 test vs exact top-k"
    ),
)
def q136_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production big-ANN architecture end-to-end (FAISS IVFADC):
    k-means coarse quantizer (8 cells) prunes each query to its 4
    nearest cells, PQ codebooks (m=8, ksub=16) score only those rows via
    ADC, and exact L2 re-ranks the 5× shortlist into the final top-10.

    Rows-only for the driver (k-means + PQ have no sane SQL form);
    recall@10 vs exact search is gated in tests/test_operators.py."""
    from gmail_etl_spark.operators.similarity import (
        ivf_pq_topk,
        train_kmeans,
        train_pq,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    _, centroids = train_kmeans(emb, k=8, iters=3)
    books = train_pq(emb, m=8, ksub=16, iters=3, sample_n=2048)
    queries = emb.orderBy("vec_id").limit(5)
    return ivf_pq_topk(
        queries, emb, books, centroids, k=10, nprobe=4, rerank=5
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q150 — Matryoshka truncation: prefix-truncate + renormalize embeddings
# ---------------------------------------------------------------------------


@query(
    "q150_matryoshka_truncate",
    oracle="""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings
    ),
    cut AS (
        SELECT vec_id,
               emb[1:16] AS head,
               sqrt(list_sum(list_transform(emb[1:16], x -> x * x))) AS head_norm,
               sqrt(list_sum(list_transform(emb, x -> x * x))) AS full_norm
        FROM base
    )
    SELECT vec_id,
           16 AS k_dims,
           ROUND(head_norm, 6) AS head_norm,
           ROUND(head_norm / full_norm, 6) AS energy_kept,
           ROUND(list_sum(list_transform(range(1, 17),
               i -> round(head[i] / head_norm, 6))), 6) AS unit_checksum
    FROM cut
    WHERE head_norm > 0
    ORDER BY vec_id
    """,
    survey="X1",
)
def q150_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style embedding truncation (Kusupati et al. 2022):
    keep the first 16 dims and renormalize to unit length — the standard
    cheap-tier representation for coarse ANN stages — reporting the head
    norm, the energy fraction the prefix retains, and a rounded checksum
    of the renormalized head vector (sum of its 6-dp components; the
    per-component values are engine-identical since every term is
    rounded before the order-independent... order-fixed sum).

    Scale posture: map-only array expressions fused into the scan; the
    natural upstream of the IVF/PQ stack (train the coarse quantizer on
    the 16-dim head, re-rank with the full vector — exactly q136's
    re-rank shape)."""
    emb = F.expr("transform(embedding, x -> cast(x as double))")
    head = F.slice(emb, 1, 16)
    sq = lambda a: F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )
    head_norm = F.sqrt(sq(head))
    full_norm = F.sqrt(sq(emb))
    unit_checksum = F.aggregate(
        F.transform(head, lambda x: F.round(x / head_norm, 6)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.lit(16).alias("k_dims"),
            F.round(head_norm, 6).alias("head_norm"),
            F.round(head_norm / full_norm, 6).alias("energy_kept"),
            F.round(unit_checksum, 6).alias("unit_checksum"),
        )
        .filter(F.col("head_norm") > 0)
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q162 — embedding outliers: farthest vectors from their label centroid
# ---------------------------------------------------------------------------


@query(
    "q162_embedding_outliers",
    oracle="""
    WITH flat AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS dim,
               unnest(embedding::DOUBLE[]) AS val
        FROM embeddings
    ),
    cent AS (
        SELECT label, dim,
               CAST(SUM(CAST(val AS DECIMAL(20,12))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS c
        FROM flat GROUP BY label, dim
    ),
    dists AS (
        SELECT f.vec_id, f.label,
               ROUND(CAST(SUM(CAST(ROUND((f.val - c.c) * (f.val - c.c), 12)
                       AS DECIMAL(26,12))) AS DOUBLE), 6) AS dist2
        FROM flat f JOIN cent c ON c.label = f.label AND c.dim = f.dim
        GROUP BY f.vec_id, f.label
    )
    SELECT label, vec_id, dist2, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY dist2 DESC, vec_id) AS rank
        FROM dists
    )
    WHERE rank <= 5
    ORDER BY label, rank
    """,
    survey="X1,2.5-window",
)
def q162_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality audit: the five vectors farthest from their
    label's centroid, per label — the mislabeled/corrupt-embedding
    candidates a curation pass reviews (the per-cluster analogue of the
    z-score outlier report q73).

    Engine-exactness chain: centroids from DECIMAL sums (q52), per-dim
    squared deviations rounded to 12 dp and DECIMAL-summed (the q153
    order-proof discipline), final distance rounded to 6 — so an
    order-dependent 64-term float sum never reaches the hash.  Shuffles
    carry (label, dim) partials and (vec, dim) triples; the centroid
    table broadcasts."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
    ).select("vec_id", "label", (F.col("pos") + 1).alias("dim"), "val")
    cent = flat.groupBy("label", "dim").agg(
        (
            F.sum(F.col("val").cast("decimal(20,12)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("c")
    )
    term = F.round((F.col("val") - F.col("c")) * (F.col("val") - F.col("c")), 12).cast(
        "decimal(26,12)"
    )
    dists = (
        flat.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("dist2"))
    )
    w = Window.partitionBy("label").orderBy(F.desc("dist2"), F.asc("vec_id"))
    return (
        dists.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("label", "vec_id", "dist2", "rank")
        .orderBy("label", "rank")
    )


# ---------------------------------------------------------------------------
# q190 — distributed PCA: fit on sufficient statistics, project map-only
# ---------------------------------------------------------------------------


@query(
    "q190_pca_project",
    oracle=None,
    survey="X1,X3",
    rows_only_reason=(
        "eigenvector sign/rotation is solver-specific, so projections "
        "differ engine-to-engine; gated by numpy-parity and "
        "orthonormality tests"
    ),
)
def q190_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA over the embedding corpus by the covariance method
    (operators/similarity.py:pca_fit): one mapInPandas pass reduces the
    corpus to d+d² sufficient statistics per batch, the driver eigensolves
    the 64×64 covariance, and projection onto the top-4 components is a
    second map-only pass with the component matrix as a plan literal —
    no shuffle in either pass, the only scalable PCA shape for 100 TB of
    embeddings.  Output: per-vector top-4 coordinates (6dp) plus label
    for downstream visualization/stratification.  Rows-only: eigenvector
    sign/float chains are not SQL; fidelity is gated in tests — spectrum
    vs numpy's PCA of the collected corpus, explained-variance ordering,
    and exact orthonormality of the returned basis."""
    from gmail_etl_spark.operators.similarity import pca_fit, pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    comps, ratios, mean = pca_fit(emb, "embedding", k=4)
    proj = pca_project(emb, "vec_id", "embedding", comps, mean)
    lbl = emb.select("vec_id", "label")
    return (
        proj.join(lbl, "vec_id")
        .select(
            "vec_id",
            "label",
            *[
                F.round(F.col("proj")[i], 6).alias(f"pc{i + 1}")
                for i in range(4)
            ],
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q192 — hard-negative mining: nearest neighbors with a DIFFERENT label
# ---------------------------------------------------------------------------


@query(
    "q192_hard_negatives",
    oracle="""
    WITH q AS (SELECT vec_id AS anchor_id, label AS a_label,
                      embedding::DOUBLE[] AS q_vec
               FROM embeddings WHERE vec_id < 40),
    scored AS (
        SELECT q.anchor_id, q.a_label,
               c.vec_id AS negative_id, c.label AS n_label,
               round(list_cosine_similarity(q.q_vec, c.embedding::DOUBLE[]), 6)
                   AS sim
        FROM q JOIN embeddings c ON c.label <> q.a_label
    )
    SELECT anchor_id, a_label, negative_id, n_label, sim, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                     ORDER BY sim DESC, negative_id) AS rank
        FROM scored
    )
    WHERE rank <= 5
    ORDER BY anchor_id, rank
    """,
    survey="X1",
)
def q192_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the top-5 most-similar vectors with a DIFFERENT label — the
    "closest wrong answers" that make the strongest negatives.  The
    label inequality rides the scored stream as a filter (at 100 TB
    you'd mine via the ANN index — q51/q136 — then label-filter the
    candidates; the exact form here IS the recall oracle for that).
    Same broadcast-queries / rounded-(sim, id) total-order discipline
    as q50, so partial top-k stays lossless."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
    )
    cand = emb.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    dot = F.aggregate(
        F.zip_with("q_vec", "c_vec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    scored = (
        F.broadcast(anchors)
        .join(cand, F.col("a_label") != F.col("n_label"))
        .select(
            "anchor_id",
            "a_label",
            "negative_id",
            "n_label",
            F.round(dot / (norm(F.col("q_vec")) * norm(F.col("c_vec"))), 6).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("sim"), F.asc("negative_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .orderBy("anchor_id", "rank")
    )


# ---------------------------------------------------------------------------
# q196 — retrieval evaluation: nDCG@10 with label-match relevance
# ---------------------------------------------------------------------------


@query(
    "q196_retrieval_ndcg",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label AS q_label,
                      embedding::DOUBLE[] AS q_vec
               FROM embeddings WHERE vec_id < 40),
    scored AS (
        SELECT q.query_id, q.q_label, c.vec_id AS doc_id, c.label AS d_label,
               round(list_cosine_similarity(q.q_vec, c.embedding::DOUBLE[]), 6)
                   AS sim
        FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, q_label, d_label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, doc_id) AS rank
        FROM scored
    ),
    topk AS (SELECT * FROM ranked WHERE rank <= 10),
    dcg AS (
        SELECT query_id,
               SUM(CASE WHEN d_label = q_label
                        THEN 1.0 / (ln(rank + 1.0) / ln(2.0)) ELSE 0.0 END)
                   AS dcg,
               CAST(SUM(CASE WHEN d_label = q_label THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_relevant
        FROM topk GROUP BY query_id
    ),
    ideal AS (
        SELECT i AS rank, 1.0 / (ln(i + 1.0) / ln(2.0)) AS gain
        FROM unnest(generate_series(1, 10)) AS t(i)
    ),
    idcg AS (
        SELECT d.query_id,
               SUM(CASE WHEN i.rank <= d.n_relevant THEN i.gain ELSE 0.0 END)
                   AS idcg
        FROM dcg d CROSS JOIN ideal i GROUP BY d.query_id
    )
    SELECT d.query_id, d.n_relevant,
           round(d.dcg, 6) AS dcg,
           round(CASE WHEN d.n_relevant = 0 THEN 0.0
                      ELSE d.dcg / i.idcg END, 6) AS ndcg
    FROM dcg d JOIN idcg i ON i.query_id = d.query_id
    ORDER BY d.query_id
    """,
    survey="X1",
)
def q196_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation closing the X1 loop (index → search →
    fuse → MEASURE): nDCG@10 of the exact-cosine ranking with
    same-label relevance — per query, DCG = Σ rel/log₂(rank+1) over the
    top 10, normalized by the ideal DCG for that query's relevant count
    (binary relevance ⇒ IDCG = the first n_relevant positions).
    Ranks come from the same rounded-(sim, id) total order as q50, so
    both engines rank — and therefore gain — identically; the log-ratio
    floats round at 6dp.  At 100 TB the eval set is the broadcast side
    and the corpus streams through the scorer once, exactly like
    serving."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
    )
    cand = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.col("label").alias("d_label"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    dot = F.aggregate(
        F.zip_with("q_vec", "c_vec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    scored = (
        F.broadcast(anchors)
        .join(cand, F.col("query_id") != F.col("doc_id"))
        .select(
            "query_id",
            "q_label",
            "doc_id",
            "d_label",
            F.round(dot / (nrm(F.col("q_vec")) * nrm(F.col("c_vec"))), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("doc_id"))
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 10
    )
    rel = (F.col("d_label") == F.col("q_label")).cast("int")
    gain = rel.cast("double") / (F.log(F.col("rank") + 1.0) / F.log(F.lit(2.0)))
    dcg = topk.groupBy("query_id").agg(
        F.sum(gain).alias("dcg"),
        F.sum(rel).cast("long").alias("n_relevant"),
    )
    ideal_gain = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_relevant"), F.lit(10)).cast("int")),
        F.lit(0.0),
        lambda acc, i: acc
        + F.lit(1.0) / (F.log(i.cast("double") + 1.0) / F.log(F.lit(2.0))),
    )
    return (
        dcg.select(
            "query_id",
            "n_relevant",
            F.round("dcg", 6).alias("dcg"),
            F.round(
                F.when(F.col("n_relevant") == 0, F.lit(0.0)).otherwise(
                    F.col("dcg") / ideal_gain
                ),
                6,
            ).alias("ndcg"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# q256 — persisted IVF index, end-to-end (save → load → probe → rank)
# ---------------------------------------------------------------------------


@query(
    "q256_persisted_ivf_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c_vec FROM embeddings),
    scored AS (
        SELECT q.query_id, c.neighbor_id,
               round(list_cosine_similarity(q.q_vec, c.c_vec), 6) AS sim
        FROM q CROSS JOIN c
        WHERE q.query_id <> c.neighbor_id
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    survey="X1",
)
def q256_persisted_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index lifecycle driven end-to-end INSIDE the hash
    gate: train the coarse quantizer, write the corpus as a
    cluster-partitioned parquet table plus centroid sidecar
    (save_ivf_index), re-open it cold, probe, and rank
    (query_ivf_index).  Probing with nprobe = k_cells is exhaustive, so
    the ANN result coincides with exact brute-force top-k — which the
    DuckDB oracle computes — making the save/load/probe/rank plumbing
    hash-verifiable even though a pruned probe is approximate.  The
    pruned-probe behavior itself (PartitionFilters reaching the reader,
    recall at nprobe < k_cells) is pinned by the operator tests; q51
    hash-gates the probed-cell semantics via the label-as-cell trick.
    At 100 TB the only change is nprobe: the layout already IS the
    partition-pruned index this query wrote."""
    import atexit
    import shutil
    import tempfile

    from gmail_etl_spark.operators.similarity import (
        query_ivf_index,
        save_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # mkdtemp per call keeps concurrent runs race-free; the result plan
    # is LAZY and scans the index at collect time, so the directory is
    # reclaimed at process exit, not here (bounded: one tiny dir per
    # builder call per process lifetime)
    path = tempfile.mkdtemp(prefix="q256_ivf_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    save_ivf_index(spark, emb, path, k_cells=8, iters=3)
    queries = emb.filter(F.col("vec_id") < 8)
    return query_ivf_index(spark, path, queries, k=5, nprobe=8).orderBy(
        "query_id", "rank"
    )
