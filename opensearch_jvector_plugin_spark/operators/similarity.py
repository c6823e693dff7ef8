"""Similarity search over an embedding column (array<float>).

Two paths, mirroring the reference's exact-vs-approximate split
(brute-force oracle VectorIdsKNNIterator.java:73-111 vs ANN graph search
JVectorReader.search JVectorReader.java:108-133):

- ``cosine_topk``: brute-force exact top-k — the baseline/oracle. Query
  vectors are broadcast; the scan is one pass over the embedding table
  (scales linearly, no shuffle besides the final per-query top-k window).
- ``ivf_topk``: IVF-style approximate top-k. "Training" is deterministic
  (centroids = the K lowest vec_ids — the reservoir-sample analog of
  OneBitScalarQuantizer.train's sampled mean, OneBitScalarQuantizer.java:61-65),
  assignment is argmin centroid distance, queries probe the nprobe nearest
  centroid buckets. At scale the bucket assignment is a write-once
  partitioning of the table; a probe reads nprobe/K of the data.

All expressions are built-in DataFrame ops in float64 with left-fold
summation — the DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .dedup import cosine_col


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, rank, vec_id, cosine).
    Ties broken by ascending vec_id."""
    e = emb.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("v")
    )
    q = queries.select(
        F.col(query_id_col).cast("int").alias("query_id"),
        F.col(query_vec_col).alias("qv"),
    )
    scored = e.join(F.broadcast(q)).withColumn(
        "cosine", cosine_col(F.col("v"), F.col("qv"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def bruteforce_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k per query under any SpaceType metric
    (SpaceType.java:43-160): (query_id, rank, vec_id, distance).

    Ordering follows the space (cosine/innerproduct descending, l2/l1/linf
    ascending), ties broken by ascending vec_id. One broadcast of the query
    set, one scan of the embedding table, bounded per-query window — the
    same 100 TB shape as cosine_topk."""
    from ..functions.spaces import (
        SPACE_ORDERING,
        inner_product_col,
        l1_col,
        l2_squared_col,
        linf_col,
    )

    exprs = {
        "cosine": cosine_col,
        "innerproduct": inner_product_col,
        "l2": l2_squared_col,
        "l1": l1_col,
        "linf": linf_col,
    }
    if metric not in exprs:
        raise ValueError(f"unknown space type {metric!r}")
    e = emb.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("v")
    )
    q = queries.select(
        F.col(query_id_col).cast("int").alias("query_id"),
        F.col(query_vec_col).alias("qv"),
    )
    scored = e.join(F.broadcast(q)).withColumn(
        "distance", exprs[metric](F.col("v"), F.col("qv"))
    )
    d6 = F.round(F.col("distance"), 6)
    order = d6.asc() if SPACE_ORDERING[metric] else d6.desc()
    w = W.partitionBy("query_id").orderBy(order, F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", d6.alias("distance"))
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF clustering: centroids = embeddings of the
    n_centroids lowest ids. Returns (assignments, centroids):
    assignments = (vec_id, centroid_id), centroids = (centroid_id, cvec)."""
    e = emb.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("v")
    )
    centroids = (
        e.orderBy("vec_id")
        .limit(n_centroids)
        .select(F.col("vec_id").cast("int").alias("centroid_id"),
                F.col("v").alias("cvec"))
    )
    scored = e.join(F.broadcast(centroids)).withColumn(
        "cos_c", cosine_col(F.col("v"), F.col("cvec"))
    )
    # Argmax as ONE map-side-combinable aggregation (max_by over a
    # (cos, -centroid_id) struct = highest cosine, ties to lowest id) —
    # no full sort of the N x K exploded rows, unlike a window rank.
    assign = scored.groupBy("vec_id").agg(
        F.max_by(
            "centroid_id",
            F.struct(F.col("cos_c"), (-F.col("centroid_id")).alias("nc")),
        ).alias("centroid_id")
    )
    return assign, centroids


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe closest centroid buckets.
    Deterministic end-to-end -> exactly reproducible by the SQL oracle."""
    assign, centroids = ivf_assign(emb, n_centroids, id_col, vec_col)
    q = queries.select(
        F.col(query_id_col).cast("int").alias("query_id"),
        F.col(query_vec_col).alias("qv"),
    )
    qc = q.join(F.broadcast(centroids)).withColumn(
        "cos_qc", cosine_col(F.col("qv"), F.col("cvec"))
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("cos_qc"), F.asc("centroid_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id")
    )
    e = emb.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("v")
    ).join(assign, "vec_id")
    cand = e.join(F.broadcast(probes), "centroid_id")
    scored = cand.join(F.broadcast(q), "query_id").withColumn(
        "cosine", cosine_col(F.col("v"), F.col("qv"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )
