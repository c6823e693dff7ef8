"""Term-expansion queries: fuzzy (FuzzyQuery) and prefix (PrefixQuery).

Lucene's FuzzyQuery expands a query term to every dictionary term within
maxEdits via a Levenshtein automaton over the term FST and down-weights
matches by edit distance (FuzzyTermsEnum boost); the reference exposes it
through the text queries its `filter` clause wraps. Engine contract here
(documented, deliberately simplified — classic Levenshtein, no
transpositions, fixed maxEdits instead of Lucene's AUTO ladder):

    expand(q) = { t in dict : levenshtein(q, t) <= max_edits }
    boost(q,t) = 1 - levenshtein(q,t) / max(len(q), len(t))
    weight(query, t) = qtf(q) * boost(q,t) * idf(t)
    score(query, d) = sum over expanded terms of weight * tf_norm(tf, dl)

so an exact match (distance 0) contributes its full BM25 term score and
the fuzzy extras come in down-weighted. Both engines evaluate the SAME
operation order (qtf * boost * idf), and levenshtein() is a built-in on
both sides (JVM codegen in Spark, native in DuckDB) — no UDF.

Scale note: expansion scans the term DICTIONARY (|V| rows — millions at
100 TB, vs trillions of postings) with the small query-term set broadcast;
Lucene's FST automaton walk is an optimization of this same scan that cuts
|V| to the automaton's neighborhood. The postings side then proceeds
exactly like score_all: the expanded weight table broadcasts into the
postings scan, so fuzzy costs one dict scan more than an exact query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bm25 import bm25_idf, bm25_tf_norm
from ..plans.stats import CorpusStats, corpus_stats, postings_df
from .score import query_terms_df

MAX_EDITS = 1


def fuzzy_expand(
    qterms: DataFrame, term_df: DataFrame, n_docs: float,
    max_edits: int = MAX_EDITS,
) -> DataFrame:
    """(query_id, term, w): every dict term within max_edits of a query
    term, weighted qtf * boost * idf. qterms is broadcast (small by
    contract); the dict scan is the only full pass."""
    q = qterms.select(
        "query_id", F.col("term").alias("qterm"), "qtf"
    )
    ed = F.levenshtein(F.col("qterm"), F.col("term"))
    boost = F.lit(1.0) - ed.cast("double") / F.greatest(
        F.length("qterm"), F.length("term")
    ).cast("double")
    return (
        term_df.join(F.broadcast(q), ed <= max_edits)
        .select(
            "query_id",
            "term",
            (
                F.col("qtf") * boost * bm25_idf(F.col("df"), float(n_docs))
            ).alias("w"),
        )
    )


def prefix_expand(
    qterms: DataFrame, term_df: DataFrame, n_docs: float
) -> DataFrame:
    """PrefixQuery expansion: (query_id, term, w) for every dict term
    starting with a query term, weighted qtf * idf (the SCORING_BOOLEAN
    rewrite — Lucene's default constant-score rewrite is a filter, the
    scoring rewrite is the variant with a rank contract to oracle-check).
    Same dict-scan shape as fuzzy_expand; a term-range parquet filter
    (term >= p AND term < p+'\\uffff') would prune the dict scan further at
    100 TB — startswith keeps the three implementations trivially aligned."""
    q = qterms.select("query_id", F.col("term").alias("qterm"), "qtf")
    return (
        term_df.join(
            F.broadcast(q), F.col("term").startswith(F.col("qterm"))
        )
        .select(
            "query_id",
            "term",
            (F.col("qtf") * bm25_idf(F.col("df"), float(n_docs))).alias("w"),
        )
    )


def _expanded_scores(
    corpus: DataFrame, queries: DataFrame, expand_fn, stats: CorpusStats | None
) -> DataFrame:
    """Shared scoring tail for term-expansion queries: expanded weights
    broadcast into the postings scan, one map-side-combined groupBy —
    identical plan shape to score_all after expansion."""
    postings = postings_df(corpus).persist()
    try:
        if stats is None:
            stats = corpus_stats(corpus)
        term_df = postings.groupBy("term").agg(
            F.count("*").cast("long").alias("df")
        )
        weighted = expand_fn(query_terms_df(queries), term_df, stats.n_docs)
        scored = postings.join(F.broadcast(weighted), "term").select(
            "query_id",
            "doc_id",
            (
                F.col("w")
                * bm25_tf_norm(F.col("tf"), F.col("dl"), stats.avgdl)
            ).alias("contrib"),
        )
        out = scored.groupBy("query_id", "doc_id").agg(
            F.sum("contrib").alias("score")
        )
        out._ojs_persisted = postings
        return out
    except Exception:
        postings.unpersist()
        raise


def prefix_scores(
    corpus: DataFrame,
    queries: DataFrame,
    stats: CorpusStats | None = None,
) -> DataFrame:
    """(query_id, doc_id, score) under the prefix-expansion contract."""
    return _expanded_scores(corpus, queries, prefix_expand, stats)


def fuzzy_scores(
    corpus: DataFrame,
    queries: DataFrame,
    max_edits: int = MAX_EDITS,
    stats: CorpusStats | None = None,
) -> DataFrame:
    """(query_id, doc_id, score) under the fuzzy-expansion contract above."""

    def expand(qt, td, n):
        return fuzzy_expand(qt, td, n, max_edits)

    return _expanded_scores(corpus, queries, expand, stats)
