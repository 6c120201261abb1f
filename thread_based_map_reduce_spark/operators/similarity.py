"""Similarity search over the ``embeddings`` table (mandated extension,
SURVEY §2.3): brute-force cosine top-k as the exactness baseline, plus two
scale paths — sign-LSH bucketing and IVF (centroid cells).

Scale design notes (the point of each variant):

- brute force is O(|Q|·N) with the query side broadcast — correct baseline,
  linear scans of the corpus stay JVM-side (zip_with/aggregate dot
  products, no Python);
- sign-LSH buckets the corpus ONCE by the sign pattern of the leading
  coordinates; search touches a single bucket (≈ N/256 vectors). The
  bucket id is a plain integer groupBy/join key, so at 100 TB this is one
  narrow shuffle + a per-bucket local scan;
- IVF assigns every vector to its nearest centroid (here: per-label means,
  i.e. k=10 cells, nprobe=1); search scans one cell. Centroids are tiny
  and broadcast; the corpus-side assignment is a broadcast-join + argmin —
  no shuffle of the embedding column at all.

Determinism for the oracle: all ranking orders carry ``vec_id`` tiebreaks;
centroid coordinates are rounded to 6 decimals on both engines before any
distance math (averaging order differs between engines at the ulp level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.vectors import cosine_similarity
from ..plans.catalog import register
from ..sources.registry import load_table

N_QUERIES = 10  # query set: vec_id < 10
DIMS = 64

_COS_SQL = (
    "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
    " / (sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
    " * sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])))"
)


@register(
    "ann_bruteforce_topk",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.qid, e.vec_id,
                   {_COS_SQL.format(a='q.qe', b='e.embedding')} AS cos
            FROM q JOIN embeddings e ON e.vec_id <> q.qid
        )
        SELECT qid, vec_id, CAST(rnk AS BIGINT) AS rnk, round(cos, 6) AS cos
        FROM (
            SELECT qid, vec_id, cos,
                   row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
            FROM scored
        )
        WHERE rnk <= 5
    """,
    doc="Exact top-5 cosine neighbors for 10 query vectors: broadcast queries x "
    "full scan + per-query window (the exactness baseline for ANN variants)",
    tags=("similarity", "ann"),
    bench=True,
)
def q_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine_similarity("qe", "embedding").alias("cos"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 5)
        .select("qid", "vec_id", "rnk", F.round("cos", 6).alias("cos"))
    )


def _sign_bucket_spark(col: str) -> F.Column:
    bucket = F.lit(0)
    for i in range(8):
        bucket = bucket + F.when(F.col(col)[i] > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket.cast("bigint")


_SIGN_BUCKET_SQL = " + ".join(
    f"(CASE WHEN {{e}}[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)" for i in range(8)
)


@register(
    "ann_lsh_bucketed",
    oracle=f"""
        WITH bucketed AS (
            SELECT vec_id, embedding,
                   CAST({_SIGN_BUCKET_SQL.format(e='embedding')} AS BIGINT) AS bucket
            FROM embeddings
        ),
        q AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM bucketed WHERE vec_id < {N_QUERIES}),
        scored AS (
            SELECT q.qid, e.vec_id,
                   {_COS_SQL.format(a='q.qe', b='e.embedding')} AS cos
            FROM q JOIN bucketed e ON e.bucket = q.bucket AND e.vec_id <> q.qid
        )
        SELECT qid, vec_id, CAST(rnk AS BIGINT) AS rnk, round(cos, 6) AS cos
        FROM (
            SELECT qid, vec_id, cos,
                   row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
            FROM scored
        )
        WHERE rnk <= 3
    """,
    doc="ANN via sign-LSH: bucket = sign bits of the 8 leading coordinates; "
    "search scans only the query's bucket (narrow integer join key at scale)",
    tags=("similarity", "ann", "lsh"),
)
def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.select("vec_id", "embedding", _sign_bucket_spark("embedding").alias("bucket"))
    q = bucketed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), F.col("bucket").alias("qbucket")
    )
    scored = (
        bucketed.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id", cosine_similarity("qe", "embedding").alias("cos"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("qid", "vec_id", "rnk", F.round("cos", 6).alias("cos"))
    )


@register(
    "ivf_search",
    oracle=f"""
        WITH dims AS (
            SELECT label, i, round(avg(embedding[i]), 6) AS c
            FROM embeddings, generate_series(1, {DIMS}) AS g(i)
            GROUP BY label, i
        ),
        centroids AS (
            SELECT label AS cell, list(c ORDER BY i) AS ce FROM dims GROUP BY label
        ),
        assigned AS (
            SELECT vec_id, embedding, cell FROM (
                SELECT e.vec_id, e.embedding, c.cell,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_COS_SQL.format(a='e.embedding', b='c.ce')} DESC, c.cell
                       ) AS rc
                FROM embeddings e CROSS JOIN centroids c
            ) WHERE rc = 1
        ),
        q AS (SELECT vec_id AS qid, embedding AS qe, cell FROM assigned WHERE vec_id < {N_QUERIES}),
        scored AS (
            SELECT q.qid, e.vec_id,
                   {_COS_SQL.format(a='q.qe', b='e.embedding')} AS cos
            FROM q JOIN assigned e ON e.cell = q.cell AND e.vec_id <> q.qid
        )
        SELECT qid, vec_id, CAST(rnk AS BIGINT) AS rnk, round(cos, 6) AS cos
        FROM (
            SELECT qid, vec_id, cos,
                   row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
            FROM scored
        )
        WHERE rnk <= 3
    """,
    doc="IVF search (k=10 cells from per-label centroids, nprobe=1): assign "
    "each vector to its nearest centroid via broadcast argmin, scan one cell "
    "per query. Centroids rounded to 6dp for cross-engine determinism.",
    tags=("similarity", "ann", "ivf"),
)
def q_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # per-label mean vector, deterministically rounded: posexplode → avg per
    # (label, dim) → re-assemble ordered by dim
    dims = (
        emb.select("label", F.posexplode("embedding").alias("i", "v"))
        .groupBy("label", "i")
        .agg(F.round(F.avg("v"), 6).alias("c"))
    )
    centroids = (
        dims.groupBy(F.col("label").alias("cell"))
        .agg(F.transform(F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]).alias("ce"))
    )
    # assign every vector to its nearest centroid (broadcast argmin — the
    # embedding column itself never shuffles)
    scored_cells = emb.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "embedding",
        "cell",
        cosine_similarity("embedding", "ce").alias("ccos"),
    )
    wc = W.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cell"))
    assigned = (
        scored_cells.withColumn("rc", F.row_number().over(wc))
        .where(F.col("rc") == 1)
        .select("vec_id", "embedding", "cell")
    )
    q = assigned.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), F.col("cell").alias("qcell")
    )
    scored = (
        assigned.join(
            F.broadcast(q),
            (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id", cosine_similarity("qe", "embedding").alias("cos"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("qid", "vec_id", "rnk", F.round("cos", 6).alias("cos"))
    )


@register(
    "embedding_norm_stats",
    oracle="""
        SELECT label,
               count(*) AS n,
               round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS avg_norm,
               round(min(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS min_norm,
               round(max(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS max_norm
        FROM embeddings
        GROUP BY label
    """,
    doc="Per-label L2-norm statistics (vector column profiling)",
    tags=("similarity", "stats"),
)
def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    norm = l2_norm("embedding")
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(norm), 6).alias("avg_norm"),
        F.round(F.min(norm), 6).alias("min_norm"),
        F.round(F.max(norm), 6).alias("max_norm"),
    )


@register(
    "centroid_per_label",
    oracle=f"""
        SELECT label,
               CAST(i AS BIGINT) AS dim,
               round(avg(embedding[i]::DOUBLE), 6) AS c
        FROM embeddings, range(1, {DIMS + 1}) t(i)
        WHERE label < 5
        GROUP BY label, i
    """,
    doc="Per-label centroid (the IVF training step): element-wise mean via "
    "posexplode + group on (label, dim) — narrow (label, dim, value) rows "
    "shuffle instead of whole vectors; rebuilding the dense centroid is a "
    "collect_list sorted by dim",
    tags=("similarity", "ivf", "agg"),
)
def q_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("label") < 5)
    return (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("p", "v"))
        .groupBy("label", (F.col("p") + 1).cast("bigint").alias("dim"))
        .agg(F.round(F.avg("v"), 6).alias("c"))
    )


@register(
    "vector_arithmetic",
    oracle="""
        SELECT vec_id,
               round(list_sum(list_transform(embedding::DOUBLE[], x -> x * 2.0)), 6) AS sum_scaled,
               round(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)), 6) AS sum_sq,
               round(list_max(embedding::DOUBLE[]), 6) AS max_c,
               round(list_min(embedding::DOUBLE[]), 6) AS min_c
        FROM embeddings
        WHERE vec_id < 100
    """,
    doc="Vector arithmetic via higher-order functions (scale / square / "
    "extrema folds), all JVM-side — the building blocks under cosine and "
    "normalization",
    tags=("similarity", "scalar", "array"),
)
def q_vector_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(F.transform(v, lambda x: x * 2.0), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("sum_scaled"),
        F.round(
            F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("sum_sq"),
        F.round(F.array_max(v), 6).alias("max_c"),
        F.round(F.array_min(v), 6).alias("min_c"),
    )


@register(
    "ann_recall_eval",
    oracle=f"""
        WITH bucketed AS (
            SELECT vec_id, embedding,
                   CAST({_SIGN_BUCKET_SQL.format(e='embedding')} AS BIGINT) AS bucket
            FROM embeddings
        ),
        q AS (
            SELECT vec_id AS qid, embedding AS qe, bucket
            FROM bucketed WHERE vec_id < {N_QUERIES}
        ),
        bf AS (
            SELECT qid, vec_id FROM (
                SELECT q.qid, e.vec_id,
                       row_number() OVER (
                           PARTITION BY q.qid
                           ORDER BY {_COS_SQL.format(a='q.qe', b='e.embedding')} DESC, e.vec_id
                       ) AS rnk
                FROM q JOIN embeddings e ON e.vec_id <> q.qid
            ) WHERE rnk <= 3
        ),
        lsh AS (
            SELECT qid, vec_id FROM (
                SELECT q.qid, e.vec_id,
                       row_number() OVER (
                           PARTITION BY q.qid
                           ORDER BY {_COS_SQL.format(a='q.qe', b='e.embedding')} DESC, e.vec_id
                       ) AS rnk
                FROM q JOIN bucketed e ON e.bucket = q.bucket AND e.vec_id <> q.qid
            ) WHERE rnk <= 3
        )
        SELECT b.qid,
               CAST(count(l.vec_id) AS BIGINT) AS hits,
               round(count(l.vec_id) / 3.0, 6) AS recall_at_3
        FROM bf b
        LEFT JOIN lsh l ON l.qid = b.qid AND l.vec_id = b.vec_id
        GROUP BY b.qid
    """,
    doc="ANN evaluation: recall@3 of the sign-LSH search against the "
    "brute-force ground truth, per query — the measurement loop any ANN "
    "deployment needs (run on a sampled query set at scale)",
    tags=("similarity", "ann", "eval"),
)
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.select("vec_id", "embedding", _sign_bucket_spark("embedding").alias("bucket"))
    q = bucketed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), F.col("bucket").alias("qbucket")
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    bf = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine_similarity("qe", "embedding").alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("qid", "vec_id")
    )
    lsh = (
        bucketed.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id", cosine_similarity("qe", "embedding").alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(F.col("qid").alias("lqid"), F.col("vec_id").alias("lvid"))
    )
    return (
        bf.join(
            lsh, (F.col("qid") == F.col("lqid")) & (F.col("vec_id") == F.col("lvid")), "left"
        )
        .groupBy("qid")
        .agg(
            F.count("lvid").alias("hits"),
            F.round(F.count("lvid") / 3.0, 6).alias("recall_at_3"),
        )
    )


def kmeans_train(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3
) -> tuple[DataFrame, list[float]]:
    """Deterministic Lloyd k-means over the embeddings (the real IVF
    training step): seeds = the k lowest vec_ids (no RNG), exactly
    ``iters`` assignment/recompute rounds, driver-coordinated like
    dedup_clusters with localCheckpoint lineage truncation.

    Returns (assignments DataFrame [vec_id, centroid], per-iteration
    inertia). Distances run JVM-side; centroids are collected to the
    driver each round (k × 64 doubles — tiny) and re-broadcast as
    literal arrays, so each round is one scan + one narrow shuffle."""
    from ..functions.vectors import dot_product

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .localCheckpoint()
    )
    centroids = [
        (i, r.v)
        for i, r in enumerate(emb.orderBy("vec_id").limit(k).collect())
    ]
    inertia_per_iter: list[float] = []
    assign = None
    for _ in range(iters):
        # squared distance to each centroid: |v|^2 - 2 v.c + |c|^2; argmin
        dist_cols = [
            (
                dot_product("v", F.array(*[F.lit(x) for x in c]))
                * -2.0
                + F.lit(sum(x * x for x in c))
            ).alias(f"d{ci}")
            for ci, c in centroids
        ]
        scored = emb.select("vec_id", "v", F.least(*[
            F.struct(d.alias("d"), F.lit(ci).alias("c"))
            for (ci, _), d in zip(centroids, dist_cols)
        ]).alias("best"))
        assign = scored.select(
            "vec_id", "v", F.col("best.c").alias("centroid"), F.col("best.d").alias("partial_d")
        )
        # inertia (+|v|^2 term, constant across centroids, added back)
        vnorm = F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)
        inertia = assign.agg(F.sum(F.col("partial_d") + vnorm)).first()[0]
        inertia_per_iter.append(float(inertia))
        # recompute centroids as per-dim means of members
        new_rows = (
            assign.select("centroid", F.posexplode("v").alias("dim", "val"))
            .groupBy("centroid", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("centroid")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("centroid", F.expr("transform(dm, s -> s.m)").alias("c"))
            .collect()
        )
        centroids = sorted((r.centroid, list(r.c)) for r in new_rows)
    return assign.select("vec_id", "centroid"), inertia_per_iter


@register(
    "ivf_kmeans_assignments",
    oracle=None,  # iterative Lloyd rounds: driver-coordinated, not single-statement SQL
    doc="Deterministic Lloyd k-means assignments (k=8, 3 iterations, "
    "lowest-vec_id seeds, no RNG) — the IVF training loop as the second "
    "iterative-algorithm showcase beside dedup_clusters; determinism, "
    "monotone inertia, and full assignment are pytest-verified "
    "(tests/test_kmeans.py)",
    tags=("similarity", "ivf", "iterative"),
)
def q_ivf_kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    assign, _ = kmeans_train(spark, sf_dir, k=8, iters=3)
    return assign


@register(
    "embeddings_dim_stats",
    oracle=f"""
        SELECT CAST(i AS BIGINT) AS dim,
               round(avg(embedding[i]::DOUBLE), 6) AS mean_c,
               round(stddev_samp(embedding[i]::DOUBLE), 6) AS sd_c,
               round(min(embedding[i]::DOUBLE), 6) AS min_c,
               round(max(embedding[i]::DOUBLE), 6) AS max_c
        FROM embeddings, range(1, {DIMS + 1}) t(i)
        GROUP BY i
    """,
    doc="Per-dimension corpus statistics (mean/std/extrema over all 64 "
    "dims) — the normalization/whitening preprocessing table; narrow "
    "(dim, value) rows shuffle, not whole vectors",
    tags=("similarity", "stats", "agg"),
)
def q_embeddings_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode(F.col("embedding").cast("array<double>")).alias("p", "v"))
        .groupBy((F.col("p") + 1).cast("bigint").alias("dim"))
        .agg(
            F.round(F.avg("v"), 6).alias("mean_c"),
            F.round(F.stddev_samp("v"), 6).alias("sd_c"),
            F.round(F.min("v"), 6).alias("min_c"),
            F.round(F.max("v"), 6).alias("max_c"),
        )
    )
