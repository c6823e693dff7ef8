"""Per-hit score breakdown — the `_explain` API.

Lucene's Explanation tree decomposes a BM25 hit score into per-term
contributions (idf x tf-norm x query weight); the reference surfaces the
same thing for its translated scores through KNNWeight#explain
(KNNWeight.java exposes the scoreTranslation per space type). Here the
breakdown is a relation: one row per (query, hit, matched term) carrying
the raw statistics (tf, dl, df) and the derived idf / contribution, so the
sum of `contrib` over a (query_id, doc_id) group IS the hit's score — the
invariant the unit tests pin against score_all.

Plan shape: identical to score_all up to the final sum — the postings scan
joins the broadcast (query, term) weights, then the broadcast hit set cuts
it to hit-sized data BEFORE anything aggregates. Explaining k hits of a
10^12-turn corpus therefore costs one postings-pruned scan, no shuffle of
corpus-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bm25 import bm25_idf, bm25_tf_norm
from ..plans.stats import corpus_stats, postings_df
from .score import query_terms_df


def explain_hits(
    corpus: DataFrame,
    queries: DataFrame,
    hits: DataFrame,
    stats=None,
    postings: DataFrame | None = None,
    term_df: DataFrame | None = None,
) -> DataFrame:
    """(query_id, doc_id, term, tf, dl, df, idf, contrib) for every query
    term matched in every hit. `hits` is a tiny (query_id, doc_id) set —
    typically a top-k result page. Pass persisted index state
    (postings/term_df/stats) to serve without rescanning the corpus."""
    from .score import resolve_corpus_state

    stats, postings, term_df, persisted = resolve_corpus_state(
        corpus, stats, postings, term_df
    )
    weighted = (
        query_terms_df(queries)
        .join(term_df, "term")
        .withColumn("idf", bm25_idf(F.col("df"), float(stats.n_docs)))
        .select("query_id", "term", "qtf", "df", "idf")
    )
    h = hits.select("query_id", "doc_id")
    out = (
        postings.join(F.broadcast(weighted), "term")
        .join(F.broadcast(h), ["query_id", "doc_id"])
        .select(
            "query_id",
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("dl").cast("long").alias("dl"),
            "df",
            F.round("idf", 6).alias("idf"),
            F.round(
                F.col("qtf")
                * F.col("idf")
                * bm25_tf_norm(F.col("tf"), F.col("dl"), stats.avgdl),
                6,
            ).alias("contrib"),
        )
    )
    if persisted is not None:
        out._ojs_persisted = persisted
    return out
