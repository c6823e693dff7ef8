"""Query rescorer — secondary-query rerank of the top primary window.

The text-side analog of the reference's vector rescore path
(RescoreContext.java:24-97: over-query the approximate index, then rerank
the window with exact scores — our ivf_search does the same in
vector_index.py). OpenSearch exposes the generic form on every search as
`rescore`: take the top `window_size` hits of the primary query, score them
with a (usually costlier) secondary query, and combine

    combined = query_weight * primary + rescore_query_weight * secondary

(score_mode=total, the default; a window hit the secondary query does not
match keeps `query_weight * primary`). Only the window re-sorts: re-scored
window hits occupy the first `window_size` ranks ordered by the combined
score, and below-window hits follow in their original primary order with
their original scores (Lucene QueryRescorer.rescore keeps the tail
untouched).

Plan shape: the primary window cut is the engine's standard bounded
per-query window (match-sized input, ≤ window_size rows out per query).
The secondary relation is joined to the WINDOW, not the corpus — so an
expensive secondary (phrase, proximity) only ever pays on
queries × window_size rows. Everything is round-6 deterministic:
window membership, the combined re-sort, and the tail order all tie-break
(score desc, doc_id asc) on round-6 scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def query_rescore(
    primary: DataFrame,
    secondary: DataFrame,
    window_size: int,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
) -> DataFrame:
    """(query_id, doc_id, score, in_window): combined scores for the top
    `window_size` primary hits, untouched primary scores for the rest.

    primary / secondary: (query_id, doc_id, score) relations; the
    secondary needs rows only for docs it matches (missing -> contributes
    nothing). The caller ranks the output with the two-level order
    (in_window desc, round-6 score desc, doc_id asc): window rows first by
    combined score, then the tail in primary order.
    """
    if window_size <= 0:
        raise ValueError(f"rescore window_size must be positive: {window_size}")
    w = W.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.asc("doc_id")
    )
    ranked = primary.withColumn("_prn", F.row_number().over(w))
    sec = secondary.select(
        "query_id", "doc_id", F.col("score").alias("_s2")
    )
    combined = (
        F.lit(float(query_weight)) * F.col("score")
        + F.lit(float(rescore_query_weight))
        * F.coalesce(F.col("_s2"), F.lit(0.0))
    )
    return ranked.join(sec, ["query_id", "doc_id"], "left").select(
        "query_id",
        "doc_id",
        F.when(F.col("_prn") <= window_size, combined)
        .otherwise(F.col("score"))
        .alias("score"),
        (F.col("_prn") <= window_size).alias("in_window"),
    )


def rescored_topk(rescored: DataFrame, ks: DataFrame) -> DataFrame:
    """(query_id, rank, doc_id, score): the rescorer's ranking contract —
    window block first (combined order), tail in primary order, cut per
    query at ks (query_id, _k)."""
    s6 = F.round(F.col("score"), 6)
    w = W.partitionBy("query_id").orderBy(
        F.col("in_window").desc(), s6.desc(), F.asc("doc_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("int"))
        .join(F.broadcast(ks), "query_id")
        .where(F.col("rank") <= F.col("_k"))
        .select("query_id", "rank", "doc_id", s6.alias("score"))
    )
