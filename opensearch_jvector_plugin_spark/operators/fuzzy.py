"""Term-expansion queries: fuzzy (FuzzyQuery), prefix (PrefixQuery),
wildcard (WildcardQuery) and regexp (RegexpQuery).

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

Wildcard and regexp queries (Lucene WildcardQuery / RegexpQuery,
MultiTermQuery siblings of PrefixQuery) use the same SCORING_BOOLEAN
rewrite as prefix: every dictionary term matching the pattern joins the
query with weight idf(term) (one pattern per query, implicit qtf = 1 —
patterns are not tokenizable text). The match predicates are JVM
built-ins (`LIKE` after `*`→`%` `?`→`_` translation; anchored `RLIKE`)
so all three implementations (Column, SQL oracle, any driver twin)
evaluate the same engine-native predicate — no UDF.

Scale note: expansion scans the term DICTIONARY (|V| rows — millions at
100 TB, vs trillions of postings) with the small query-term set broadcast;
Lucene's FST automaton walk is an optimization of this same scan that cuts
|V| to the automaton's neighborhood. The postings side then proceeds
exactly like score_all: the expanded weight table broadcasts into the
postings scan, so fuzzy costs one dict scan more than an exact query.
For the pattern queries all patterns project over ONE dict scan (a
struct-array explode, the phrase-projection discipline) rather than one
scan per pattern.

Expansion is CAPPED (Lucene FuzzyQuery maxExpansions=50 /
TopTermsBlendedFreqScoringRewrite; BooleanQuery maxClauseCount is the
hard analog): without a cap a `*e*`-class wildcard or a short fuzzy term
against a 100M-term dictionary would broadcast a dictionary-sized weight
table — executor OOM on adversarial-but-legal input. The cap is a
per-query window ON THE EXPANSION (matched terms only, far smaller than
the dict), selecting the top max_expansions terms by

    fuzzy:                    (boost DESC, df DESC, term ASC)
    prefix/wildcard/regexp:   (df DESC, term ASC)

— Lucene's top-terms rewrite keeps the highest-boost / highest-docFreq
terms; the trailing term ASC makes the cut deterministic across engines
(boost is exact rational arithmetic on both sides, so the double compares
identically). The SQL oracles encode the identical window
(entry_queries.py), so capped results stay hash-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.bm25 import bm25_idf, bm25_tf_norm
from ..plans.stats import CorpusStats, corpus_stats, postings_df
from .score import query_terms_df

MAX_EDITS = 1
# Lucene FuzzyQuery.defaultMaxExpansions == 50; shared by every
# multi-term rewrite here (fuzzy/prefix/wildcard/regexp).
MAX_EXPANSIONS = 50


def _cap_expansion(
    matched: DataFrame, partition_cols: list[str], order_cols: list,
    max_expansions: int,
) -> DataFrame:
    """Top-max_expansions per expansion group (the TopTermsRewrite cut),
    applied to the matched rows BEFORE any broadcast. The window shuffles
    only matched terms (<= dict, usually tiny); its output is bounded by
    groups * max_expansions."""
    w = W.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        matched.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(max_expansions))
        .drop("_rn")
    )


def fuzzy_expand(
    qterms: DataFrame, term_df: DataFrame, n_docs: float,
    max_edits: int = MAX_EDITS,
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """(query_id, term, w): the top-max_expansions dict terms within
    max_edits of each query term (per-(query, qterm) cut by boost DESC,
    df DESC, term ASC — the TopTermsBlendedFreqScoringRewrite selection),
    weighted qtf * boost * idf. qterms is broadcast (small by contract);
    the dict scan is the only full pass."""
    q = qterms.select(
        "query_id", F.col("term").alias("qterm"), "qtf"
    )
    ed = F.levenshtein(F.col("qterm"), F.col("term"))
    boost = F.lit(1.0) - ed.cast("double") / F.greatest(
        F.length("qterm"), F.length("term")
    ).cast("double")
    matched = term_df.join(F.broadcast(q), ed <= max_edits).select(
        "query_id", "qterm", "term", "df", "qtf", boost.alias("boost")
    )
    capped = _cap_expansion(
        matched,
        ["query_id", "qterm"],
        [F.desc("boost"), F.desc("df"), F.asc("term")],
        max_expansions,
    )
    return capped.select(
        "query_id",
        "term",
        (
            F.col("qtf") * F.col("boost")
            * bm25_idf(F.col("df"), float(n_docs))
        ).alias("w"),
    )


def prefix_expand(
    qterms: DataFrame, term_df: DataFrame, n_docs: float,
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """PrefixQuery expansion: (query_id, term, w) for the top-max_expansions
    dict terms starting with each query term (per-(query, qterm) cut by
    df DESC, term ASC), weighted qtf * idf (the SCORING_BOOLEAN
    rewrite — Lucene's default constant-score rewrite is a filter, the
    scoring rewrite is the variant with a rank contract to oracle-check).
    Same dict-scan shape as fuzzy_expand; a term-range parquet filter
    (term >= p AND term < p+'\\uffff') would prune the dict scan further at
    100 TB — startswith keeps the three implementations trivially aligned."""
    q = qterms.select("query_id", F.col("term").alias("qterm"), "qtf")
    matched = term_df.join(
        F.broadcast(q), F.col("term").startswith(F.col("qterm"))
    ).select("query_id", "qterm", "term", "df", "qtf")
    capped = _cap_expansion(
        matched,
        ["query_id", "qterm"],
        [F.desc("df"), F.asc("term")],
        max_expansions,
    )
    return capped.select(
        "query_id",
        "term",
        (F.col("qtf") * bm25_idf(F.col("df"), float(n_docs))).alias("w"),
    )


WILDCARD_CHARS = set("abcdefghijklmnopqrstuvwxyz0123456789*?")


def wildcard_to_like(pattern: str) -> str:
    """Translate a Lucene wildcard pattern (`*` any run, `?` one char) to
    the equivalent SQL LIKE pattern. Dictionary terms are `[a-z0-9]+` by
    the tokenizer contract, so patterns are restricted to that alphabet
    plus the two wildcards — nothing ever needs LIKE-escaping and the
    translation is the same string on both engines."""
    if not pattern or any(c not in WILDCARD_CHARS for c in pattern):
        raise ValueError(
            f"wildcard pattern must be non-empty [a-z0-9*?]+, got {pattern!r}"
        )
    return pattern.replace("*", "%").replace("?", "_")


def pattern_expand(
    term_df: DataFrame,
    n_docs: float,
    pats: list[tuple[int, str]],
    match_builder,
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """(query_id, term, w = idf) for the top-max_expansions dict terms
    matching each query's pattern (per-query cut by df DESC, term ASC).
    All patterns are projected over ONE dict scan: a per-term
    struct array (query_id, matched) exploded and filtered, so adding a
    pattern adds a codegen'd predicate, not a scan."""
    structs = [
        F.struct(
            F.lit(int(qid)).alias("query_id"),
            match_builder(F.col("term"), pat).alias("m"),
        )
        for qid, pat in pats
    ]
    matched = (
        term_df.select(
            "term", "df", F.explode(F.array(*structs)).alias("s")
        )
        .where(F.col("s.m"))
        .select(F.col("s.query_id").alias("query_id"), "term", "df")
    )
    capped = _cap_expansion(
        matched, ["query_id"], [F.desc("df"), F.asc("term")], max_expansions
    )
    return capped.select(
        "query_id",
        "term",
        bm25_idf(F.col("df"), float(n_docs)).alias("w"),
    )


def _pattern_scores(
    corpus: DataFrame,
    pats: list[tuple[int, str]],
    match_builder,
    stats: CorpusStats | None = None,
    max_expansions: int = MAX_EXPANSIONS,
    postings: DataFrame | None = None,
    term_df: DataFrame | None = None,
) -> DataFrame:
    """Shared scoring tail for single-pattern-per-query expansion. Pass
    persisted index state (postings/term_df/stats) to serve without
    rescanning the corpus, exactly like score_all."""
    from .score import resolve_corpus_state

    stats, postings, term_df, persisted = resolve_corpus_state(
        corpus, stats, postings, term_df
    )
    weighted = pattern_expand(
        term_df, stats.n_docs, pats, match_builder,
        max_expansions=max_expansions,
    )
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
    if persisted is not None:
        out._ojs_persisted = persisted
    return out


def wildcard_scores(
    corpus: DataFrame,
    pats: list[tuple[int, str]],
    stats: CorpusStats | None = None,
    max_expansions: int = MAX_EXPANSIONS,
    postings: DataFrame | None = None,
    term_df: DataFrame | None = None,
) -> DataFrame:
    """WildcardQuery under the scoring-boolean rewrite: pats is
    [(query_id, pattern)] with `*`/`?` wildcards; score = sum over matched
    dict terms of idf(term) * tf_norm."""
    like_pats = [(qid, wildcard_to_like(p)) for qid, p in pats]
    return _pattern_scores(
        corpus, like_pats, lambda term, p: term.like(p), stats,
        max_expansions=max_expansions, postings=postings, term_df=term_df,
    )


def regexp_scores(
    corpus: DataFrame,
    pats: list[tuple[int, str]],
    stats: CorpusStats | None = None,
    max_expansions: int = MAX_EXPANSIONS,
    postings: DataFrame | None = None,
    term_df: DataFrame | None = None,
) -> DataFrame:
    """RegexpQuery under the scoring-boolean rewrite: each pattern is
    implicitly anchored (Lucene matches the WHOLE term) — the Column side
    wraps it `^(?:pat)$` for the unanchored RLIKE, the oracle uses DuckDB's
    anchored regexp_full_match. Patterns must stay in the portable subset
    both regex engines share (character classes, alternation, `.` `*` `+`)."""
    return _pattern_scores(
        corpus,
        list(pats),
        lambda term, p: term.rlike(f"^(?:{p})$"),
        stats,
        max_expansions=max_expansions,
        postings=postings,
        term_df=term_df,
    )


def _expanded_scores(
    corpus: DataFrame,
    queries: DataFrame,
    expand_fn,
    stats: CorpusStats | None,
    postings: DataFrame | None = None,
    term_df: DataFrame | None = None,
) -> DataFrame:
    """Shared scoring tail for term-expansion queries: expanded weights
    broadcast into the postings scan, one map-side-combined groupBy —
    identical plan shape to score_all after expansion. Pass persisted
    index state (postings/term_df/stats) to serve without rescanning the
    corpus."""
    from .score import resolve_corpus_state

    stats, postings, term_df, persisted = resolve_corpus_state(
        corpus, stats, postings, term_df
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
    if persisted is not None:
        out._ojs_persisted = persisted
    return out


def prefix_scores(
    corpus: DataFrame,
    queries: DataFrame,
    stats: CorpusStats | None = None,
    max_expansions: int = MAX_EXPANSIONS,
    postings: DataFrame | None = None,
    term_df: DataFrame | None = None,
) -> DataFrame:
    """(query_id, doc_id, score) under the prefix-expansion contract."""

    def expand(qt, td, n):
        return prefix_expand(qt, td, n, max_expansions=max_expansions)

    return _expanded_scores(corpus, queries, expand, stats, postings, term_df)


def fuzzy_scores(
    corpus: DataFrame,
    queries: DataFrame,
    max_edits: int = MAX_EDITS,
    stats: CorpusStats | None = None,
    max_expansions: int = MAX_EXPANSIONS,
    postings: DataFrame | None = None,
    term_df: DataFrame | None = None,
) -> DataFrame:
    """(query_id, doc_id, score) under the fuzzy-expansion contract above."""

    def expand(qt, td, n):
        return fuzzy_expand(qt, td, n, max_edits, max_expansions)

    return _expanded_scores(corpus, queries, expand, stats, postings, term_df)
