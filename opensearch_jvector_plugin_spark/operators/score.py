"""DataFrame-native BM25 scoring — the declarative path.

This is the engine's brute-force-exact scoring surface, the analog of the
reference's script-score / exact-scan fallback (KNNScoreScript scoring every
filtered doc via doc values, plugin/script/KNNScoringSpace.java:75-83, and
the VectorIdsKNNIterator exact scan). It is also the correctness oracle the
WAND index path must rank-match.

Everything is built-in DataFrame ops — Catalyst gets the whole plan:
- query terms and per-term stats are broadcast (small dims),
- the postings groupBy is map-side combined,
- top-k per query is a window over (query_id), never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.bm25 import bm25_idf, bm25_tf_norm
from ..functions.tokenizer import tokenize_col
from ..plans.stats import CorpusStats, corpus_stats, postings_df


def query_terms_df(queries: DataFrame) -> DataFrame:
    """(query_id, term, qtf) — duplicate query terms become qtf weight
    (Lucene BooleanQuery per-occurrence summation)."""
    return (
        queries.select(
            "query_id", F.explode(tokenize_col("query_text")).alias("term")
        )
        .groupBy("query_id", "term")
        .agg(F.count("*").cast("double").alias("qtf"))
    )


def compile_query_weights(
    queries_pdf, term_dfs: dict, n_docs: int
) -> list[tuple[int, str, float]]:
    """Driver-side twin of the `weighted` subtree (qterms ⨝ term_df →
    qtf * idf): rows (query_id, term, w), absent terms dropped — exactly
    the inner join's semantics, with the same left-assoc idf arithmetic
    (bm25_idf_py ≡ bm25_idf, the equivalence the indexed search path
    already relies on). The `_query_weights` compile discipline applied to
    the declarative scorer: query sets are bounded by contract, so the
    per-call explode/groupBy/join broadcast subtree is pure fixed cost
    (round 7)."""
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
                    (qid, term, float(qtf) * bm25_idf_py(int(df), n_docs))
                )
    return rows


def resolve_corpus_state(
    corpus: DataFrame | None,
    stats: CorpusStats | None = None,
    postings: DataFrame | None = None,
    term_df: DataFrame | None = None,
) -> tuple[CorpusStats, DataFrame, DataFrame, DataFrame | None]:
    """Shared state resolution for every declarative scorer: returns
    (stats, postings, term_df, persisted_handle_or_None).

    Pieces not provided are derived from `corpus` exactly as before (the
    round-7 refactor only centralizes the existing score_all logic): when
    postings must be derived AND term_df too, the postings subtree is
    persisted so the df side does not re-scan and re-explode the corpus
    (visible in .explain as two parquet scans otherwise). Callers that pass
    persisted index state (the same tables the segment index persists) get
    a zero-derivation plan — the serving discipline of the reference, which
    never rescans source data to answer a query."""
    derived_postings = postings is None
    if postings is None:
        postings = postings_df(corpus)
    if stats is None:
        stats = corpus_stats(corpus)
    persisted = None
    if term_df is None:
        if derived_postings:
            postings = persisted = postings.persist()
        term_df = postings.groupBy("term").agg(
            F.count("*").cast("long").alias("df")
        )
    return stats, postings, term_df, persisted


def score_all(
    corpus: DataFrame,
    queries: DataFrame,
    stats: CorpusStats | None = None,
    postings: DataFrame | None = None,
    term_df: DataFrame | None = None,
    weighted: DataFrame | None = None,
) -> DataFrame:
    """Exact BM25 score for every (query, matching doc): (query_id, doc_id,
    score). Pre-computed postings/df/stats can be passed to reuse a built
    index's state (they are the same tables the index persists).
    `weighted`: optional precompiled (query_id, term, w) frame from
    compile_query_weights — skips the qterms ⨝ term_df derivation."""
    persisted = None
    if weighted is None:
        stats, postings, term_df, persisted = resolve_corpus_state(
            corpus, stats, postings, term_df
        )
        qterms = query_terms_df(queries)
        # Small side: (query_id, term, qtf) ⨝ (term, df) -> per-(query,
        # term) idf.
        weighted = (
            qterms.join(term_df, "term")
            .withColumn("idf", bm25_idf(F.col("df"), float(stats.n_docs)))
            .select(
                "query_id", "term", (F.col("qtf") * F.col("idf")).alias("w")
            )
        )
    else:
        if postings is None:
            postings = postings_df(corpus)
        if stats is None:
            stats = corpus_stats(corpus)
    # Big side joins the broadcast query-term table: Catalyst prunes every
    # posting whose term no query mentions before anything else happens.
    scored = postings.join(F.broadcast(weighted), "term").select(
        "query_id",
        "doc_id",
        (F.col("w") * bm25_tf_norm(F.col("tf"), F.col("dl"), stats.avgdl)).alias(
            "contrib"
        ),
    )
    out = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score")
    )
    if persisted is not None:
        # Expose the cached handle (same discipline as plans/docids) so
        # callers can release executor storage once `out` is materialized —
        # repeated score_all calls otherwise accumulate cached partitions
        # for the session's lifetime.
        out._ojs_persisted = persisted
    return out


def topk(scores: DataFrame, queries: DataFrame) -> DataFrame:
    """Global top-k reduce: (query_id, rank, doc_id, score), rank 1-based,
    ties broken by ascending doc_id (the explicit tie-break the reference's
    score-desc sort needs for rank-identity, ResultUtil.java:107)."""
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = scores.withColumn("rank", F.row_number().over(w).cast("int"))
    ks = queries.select("query_id", F.col("k").cast("long").alias("_k"))
    return (
        ranked.join(F.broadcast(ks), "query_id")
        .where(F.col("rank") <= F.col("_k"))
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_topk_bruteforce(corpus: DataFrame, queries: DataFrame, **kw) -> DataFrame:
    """score_all + topk in one call — the flagship declarative query."""
    return topk(score_all(corpus, queries, **kw), queries)
