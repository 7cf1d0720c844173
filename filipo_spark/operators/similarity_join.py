"""Embedding similarity search: brute-force cosine top-k (the exactness
baseline) and an IVF-bucketed approximate variant (the scale path).

All vector math is native Catalyst lambda expressions over
``array<float>`` (``zip_with`` + ``aggregate``) — no UDF, stays in
codegen; the dot product of two 64-dim vectors is a tight JVM loop.

Scale shape: brute force is a crossJoin (query-set × corpus) — fine for
|queries| ≪ |corpus| with the query side broadcast; IVF turns it into
an equi-join on the centroid assignment, cutting compared pairs by the
centroid count (recall traded via ``n_probes``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (broadcast queries × corpus).
    Output: (query_id, neighbor_id, score) with rank ties broken by id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its n_probes nearest centroids (broadcast
    centroid table — tiny by construction)."""
    c = centroids.select(
        F.col("centroid_id"), F.col(vec_col).alias("cv")
    )
    # csim rounded to 6 decimals before the arg-max: makes the assignment
    # stable across engines (Spark vs DuckDB FP noise ~1e-15 could flip an
    # unrounded near-tie; rounding + centroid_id tie-break is deterministic)
    scored = df.crossJoin(F.broadcast(c)).select(
        id_col, vec_col,
        "centroid_id",
        F.round(cosine(F.col(vec_col), F.col("cv")), 6).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_probes)
        .select(id_col, vec_col, "centroid_id")
    )


def deterministic_centroids(
    corpus: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Seed centroids = the n corpus vectors with smallest md5(id) —
    deterministic, no iteration (k-means init without the k-means;
    adequate for bucketing, replaceable by trained centroids).

    Selection is a distributed TakeOrdered (``orderBy().limit(n)``), so
    only the n winning rows ever reach one task; numbering happens on
    that tiny result.  (The previous global no-partition window pulled
    the whole corpus through a single task.)"""
    seed = corpus.select(
        F.md5(F.col(id_col).cast("string")).alias("_m"),
        F.col(id_col).alias("_i"),
        F.col(vec_col),
    ).orderBy("_m", "_i").limit(n_centroids)
    w = Window.orderBy("_m", "_i")  # bounded: runs over <= n_centroids rows
    return seed.withColumn("centroid_id", F.row_number().over(w)).select(
        "centroid_id", F.col(vec_col)
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 16,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold),
    IVF-bucketed: each vector lands in its ``n_probes`` nearest centroid
    buckets and pairs are compared iff they share one — the self-join
    collapses from O(n²) to O(Σ bucket²), the same recall trade as
    ``ann_ivf_topk``.  The exact-cosine filter runs on candidates only."""
    cents = deterministic_centroids(corpus, n_centroids, id_col, vec_col)
    assigned = ivf_assign(corpus, cents, n_probes, id_col, vec_col)
    x = assigned.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "centroid_id"
    )
    y = assigned.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "centroid_id"
    )
    # dedup (id_a, id_b) candidates BEFORE scoring: a pair sharing
    # several probed buckets must pay the 64-dim dot product once, not
    # once per shared bucket (the vectors ride along — same bytes per id,
    # so the distinct collapses them with the pair)
    cands = (
        x.join(y, on="centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()
    )
    return cands.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos")
    ).where(F.col("cos") >= threshold)


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only vectors sharing a probed centroid
    bucket.  Recall vs brute force is asserted in tests."""
    cents = deterministic_centroids(corpus, n_centroids, id_col, vec_col)
    c_assign = ivf_assign(corpus, cents, 1, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "centroid_id"
    )
    q_assign = ivf_assign(queries, cents, n_probes, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "centroid_id"
    )
    # pair-dedup before the cosine (see embedding_near_dups): a
    # (query, neighbor) pair reached through 2+ probed buckets is scored once
    scored = (
        q_assign.join(c_assign, on="centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .distinct()
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
