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


def compile_explain_weights(
    queries_pdf, term_dfs: dict, n_docs: int
) -> list[tuple[int, str, float, int, float]]:
    """Driver-side twin of explain's weighted subtree: rows
    (query_id, term, qtf, df, idf), absent terms dropped (the inner
    join's semantics) — same arithmetic as the Column path."""
    from collections import Counter

    from ..functions.bm25 import bm25_idf_py
    from ..functions.tokenizer import tokenize_text

    rows = []
    for r in queries_pdf.itertuples(index=False):
        qid = int(r.query_id)
        for term, qtf in sorted(Counter(tokenize_text(r.query_text)).items()):
            df = term_dfs.get(term)
            if df is not None:
                rows.append(
                    (qid, term, float(qtf), int(df),
                     bm25_idf_py(int(df), n_docs))
                )
    return rows


def explain_hits(
    corpus: DataFrame,
    queries: DataFrame,
    hits: DataFrame,
    stats=None,
    postings: DataFrame | None = None,
    term_df: DataFrame | None = None,
    weighted: DataFrame | None = None,
) -> DataFrame:
    """(query_id, doc_id, term, tf, dl, df, idf, contrib) for every query
    term matched in every hit. `hits` is a tiny (query_id, doc_id) set —
    typically a top-k result page. Pass persisted index state
    (postings/term_df/stats) to serve without rescanning the corpus;
    `weighted` is an optional precompiled (query_id, term, qtf, df, idf)
    frame from compile_explain_weights."""
    from .score import resolve_corpus_state

    if weighted is not None:
        from ..plans.stats import corpus_stats as _cs
        from ..plans.stats import postings_df as _pdf

        if postings is None:
            postings = _pdf(corpus)
        if stats is None:
            stats = _cs(corpus)
        persisted = None
    else:
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
