"""Hybrid search fusion — combining lexical (BM25) and vector (k-NN)
rankings, the reference plugin's primary production use (an OpenSearch
k-NN field next to text fields, fused by the 2.x hybrid query's
normalization processor or by reciprocal rank fusion).

Two fusion operators, both over already-ranked inputs (query_id, rank,
doc_id[, score]) so they compose with ANY ranking this engine produces:

- **rrf_fuse** — reciprocal rank fusion (the classic public formula):
  rrf(d) = sum over rankings r of 1 / (k + rank_r(d)), k = 60 by
  default. Rank-only, so no score normalization is needed and the two
  modalities' incomparable score scales cannot fight.
- **minmax_fuse** — the normalization-processor shape: per (query,
  ranking) min-max normalize scores to [0, 1], then a weighted sum with
  a document missing from a ranking contributing 0 (the OpenSearch
  treatment). Degenerate rankings (max == min) normalize to 1.0 — the
  only hit is the best hit.

Both are hit-set-sized throughout: inputs are top-k relations (<= sum of
k rows per query), the union/groupBy shuffles only those narrow rows,
and the final round-6 (score desc, doc_id asc) rank is per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

RRF_K = 60


def _ranked_out(scored: DataFrame, score_col: str, k: int) -> DataFrame:
    s6 = F.round(F.col(score_col), 6)
    w = W.partitionBy("query_id").orderBy(s6.desc(), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select("query_id", "rank", "doc_id", s6.alias(score_col))
    )


def rrf_fuse(
    rankings: list[DataFrame], k: int = 10, rrf_k: int = RRF_K
) -> DataFrame:
    """Reciprocal rank fusion of N ranked relations, each (query_id, rank,
    doc_id, ...): (query_id, rank, doc_id, rrf_score) top-k per query."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col("query_id").cast("int").alias("query_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank").cast("double"))
             ).alias("_c"),
        )
        for r in rankings
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    scored = un.groupBy("query_id", "doc_id").agg(
        F.sum("_c").alias("rrf_score")
    )
    return _ranked_out(scored, "rrf_score", k)


def minmax_fuse(
    rankings: list[DataFrame],
    weights: list[float],
    k: int = 10,
    score_col: str = "score",
) -> DataFrame:
    """Normalization-processor fusion: per (query, ranking) min-max
    normalize `score_col`, weighted sum with missing docs contributing 0,
    (query_id, rank, doc_id, hybrid_score) top-k per query."""
    if len(rankings) != len(weights) or not rankings:
        raise ValueError("need one weight per ranking")
    parts = []
    for i, (r, wt) in enumerate(zip(rankings, weights)):
        wq = W.partitionBy("query_id")
        s = F.col(score_col).cast("double")
        norm = F.when(
            F.max(s).over(wq) == F.min(s).over(wq), F.lit(1.0)
        ).otherwise((s - F.min(s).over(wq)) /
                    (F.max(s).over(wq) - F.min(s).over(wq)))
        parts.append(
            r.select(
                F.col("query_id").cast("int").alias("query_id"),
                F.col("doc_id").cast("long").alias("doc_id"),
                (F.lit(float(wt)) * norm).alias("_c"),
            )
        )
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    scored = un.groupBy("query_id", "doc_id").agg(
        F.sum("_c").alias("hybrid_score")
    )
    return _ranked_out(scored, "hybrid_score", k)
