"""more_like_this — seed-document similarity queries.

OpenSearch's MLT query (Lucene MoreLikeThis) selects the seed document's
most "interesting" terms and runs them as a boolean query. Semantics kept
here (the Lucene defaults that shape the result set):

- term selection weight = tf(term, seed) x idf(term) — our engine-wide
  BM25 idf, round-6 like every ranking surface; ties break term-asc.
- `min_term_freq` (default 2): the term must occur at least that often in
  the seed document.
- `min_doc_freq` (default 5): the term must occur in at least that many
  corpus documents.
- `max_query_terms` (default 25): keep the top-weighted terms only.
- the seed document itself is excluded from the hits (the `like`-by-id
  contract), and each selected term contributes with query weight 1
  (`boost_terms` off, the default).

Plan shape: seeds are a handful of rows — every per-seed step (term
extraction, selection cut) happens on broadcast-joined, seed-sized data.
Scoring is exactly score_all's plan with the selected (query_id, term)
set as the broadcast query side, so the corpus-sized work is the same
postings derivation every scorer shares, plus nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.bm25 import bm25_idf, bm25_tf_norm
from ..plans.stats import corpus_stats, postings_df


def mlt_select_terms(
    postings: DataFrame,
    term_df: DataFrame,
    n_docs: float,
    seeds: DataFrame,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
) -> DataFrame:
    """(query_id, term, idf): the seed's interesting-term set.

    seeds: (query_id, seed_doc_id). Selection weight is round-6
    tf_seed x idf, ordered (weight desc, term asc), top max_query_terms.
    """
    seed_terms = postings.join(
        F.broadcast(seeds),
        postings["doc_id"] == seeds["seed_doc_id"],
    ).select("query_id", "term", F.col("tf").alias("tf_seed"))
    weighted = (
        seed_terms.where(F.col("tf_seed") >= min_term_freq)
        .join(term_df.where(F.col("df") >= min_doc_freq), "term")
        .withColumn("idf", bm25_idf(F.col("df"), n_docs))
        .withColumn("wsel", F.round(F.col("tf_seed") * F.col("idf"), 6))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("wsel").desc(), F.col("term").asc()
    )
    return (
        weighted.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_query_terms)
        .select("query_id", "term", "idf")
    )


def more_like_this(
    corpus: DataFrame,
    seeds: DataFrame,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    stats=None,
    postings: DataFrame | None = None,
    term_df: DataFrame | None = None,
) -> DataFrame:
    """(query_id, doc_id, score): BM25 over each seed's selected terms,
    seed document excluded. seeds: (query_id, seed_doc_id). Pass persisted
    index state (postings/term_df/stats) to serve without rescanning the
    corpus, exactly like score_all."""
    from .score import resolve_corpus_state

    stats, postings, term_df, persisted = resolve_corpus_state(
        corpus, stats, postings, term_df
    )
    sel = mlt_select_terms(
        postings,
        term_df,
        float(stats.n_docs),
        seeds,
        max_query_terms=max_query_terms,
        min_term_freq=min_term_freq,
        min_doc_freq=min_doc_freq,
    )
    contribs = postings.join(F.broadcast(sel), "term").select(
        "query_id",
        "doc_id",
        (
            F.col("idf") * bm25_tf_norm(F.col("tf"), F.col("dl"), stats.avgdl)
        ).alias("contrib"),
    )
    scored = contribs.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score")
    )
    # scored's query_id lineage traces back to seeds.query_id (through
    # sel), so joining against `seeds` directly resolves both sides to the
    # same attribute and the query_id equality degenerates to literal true
    # — which would exclude every seed doc from every query. Re-alias to
    # force fresh attributes.
    excl = seeds.select(
        F.col("query_id").alias("_xq"),
        F.col("seed_doc_id").alias("_xd"),
    )
    out = scored.join(
        F.broadcast(excl),
        (scored["query_id"] == excl["_xq"])
        & (scored["doc_id"] == excl["_xd"]),
        "left_anti",
    )
    if persisted is not None:
        out._ojs_persisted = persisted
    return out
