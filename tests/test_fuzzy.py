"""Fuzzy term-expansion queries (operators/fuzzy.py): expansion set and
boosts, degenerate-to-exact behavior for isolated terms, empty expansion."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_plugin_spark.operators.fuzzy import (
    fuzzy_expand,
    fuzzy_scores,
)
from opensearch_jvector_plugin_spark.operators.score import (
    query_terms_df,
    score_all,
)
from opensearch_jvector_plugin_spark.plans.stats import postings_df


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["score"] = pdf["score"].round(6)
    return (
        pdf[["query_id", "doc_id", "score"]]
        .astype({"query_id": np.int64, "doc_id": np.int64})
        .sort_values(["query_id", "doc_id"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_fuzzy_expand_neighbors_and_boosts(spark, tiny_corpus_pdf):
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    postings = postings_df(corpus)
    term_df = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    queries = spark.createDataFrame(
        [(0, "term0001", 10)], "query_id INT, query_text STRING, k LONG"
    )
    exp = fuzzy_expand(query_terms_df(queries), term_df, 100.0).toPandas()
    terms = set(exp["term"])
    assert "term0001" in terms  # distance 0: itself
    # Single-digit substitutions of a dense vocab are distance-1 neighbors.
    assert len(terms) > 1
    for t in terms:
        assert sum(a != b for a, b in zip(t.ljust(8), "term0001")) <= 1 or (
            len(t) != 8
        )


def test_fuzzy_isolated_term_equals_plain_bm25(spark, tiny_corpus_pdf):
    """'hotcommon' has no distance-1 dictionary neighbor, so the fuzzy
    contract (boost 1.0 at distance 0) degenerates to exact BM25."""
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    queries = spark.createDataFrame(
        [(0, "hotcommon", 10)], "query_id INT, query_text STRING, k LONG"
    )
    fuzzy = _norm(fuzzy_scores(corpus, queries).toPandas())
    plain = _norm(score_all(corpus, queries).toPandas())
    pd.testing.assert_frame_equal(fuzzy, plain)


def test_prefix_exact_length_equals_plain_bm25(spark, tiny_corpus_pdf):
    """'hotcommon' is the only dict term it prefixes, so the prefix query
    degenerates to exact BM25 (w = qtf * idf, no boost in the contract)."""
    from opensearch_jvector_plugin_spark.operators.fuzzy import prefix_scores

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    queries = spark.createDataFrame(
        [(0, "hotcommon", 10)], "query_id INT, query_text STRING, k LONG"
    )
    pref = _norm(prefix_scores(corpus, queries).toPandas())
    plain = _norm(score_all(corpus, queries).toPandas())
    pd.testing.assert_frame_equal(pref, plain)


def test_prefix_wide_expansion_matches_python(spark, tiny_corpus_pdf):
    """Prefix 'hot' expands to both planted hot terms; every doc containing
    either must be scored."""
    from opensearch_jvector_plugin_spark.operators.fuzzy import prefix_scores
    from opensearch_jvector_plugin_spark.functions.tokenizer import (
        tokenize_text,
    )

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    queries = spark.createDataFrame(
        [(0, "hot", 10)], "query_id INT, query_text STRING, k LONG"
    )
    got = set(
        prefix_scores(corpus, queries).toPandas()["doc_id"].astype(int)
    )
    want = {
        int(d)
        for d, t in zip(tiny_corpus_pdf["doc_id"], tiny_corpus_pdf["text"])
        if any(tok.startswith("hot") for tok in tokenize_text(t))
    }
    assert got == want and len(want) > 0


def test_fuzzy_garbage_term_expands_to_nothing(spark, tiny_corpus_pdf):
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    queries = spark.createDataFrame(
        [(0, "zzzzzzzzzzzz", 10)], "query_id INT, query_text STRING, k LONG"
    )
    assert fuzzy_scores(corpus, queries).count() == 0


def test_wildcard_literal_pattern_equals_plain_bm25(spark, tiny_corpus_pdf):
    """A pattern with no wildcards LIKE-matches only the exact term, and
    the single-term scoring-boolean weight (idf, qtf=1) equals plain BM25
    for a one-term query."""
    from opensearch_jvector_plugin_spark.operators.fuzzy import (
        wildcard_scores,
    )

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    wild = _norm(wildcard_scores(corpus, [(0, "hotcommon")]).toPandas())
    queries = spark.createDataFrame(
        [(0, "hotcommon", 10)], "query_id INT, query_text STRING, k LONG"
    )
    plain = _norm(score_all(corpus, queries).toPandas())
    pd.testing.assert_frame_equal(wild, plain)


def test_wildcard_expansion_matches_fnmatch(spark, tiny_corpus_pdf):
    """`hot*n` must match exactly the dict terms fnmatch agrees with, and
    every doc containing any matched term is scored."""
    import fnmatch

    from opensearch_jvector_plugin_spark.functions.tokenizer import (
        tokenize_text,
    )
    from opensearch_jvector_plugin_spark.operators.fuzzy import (
        wildcard_scores,
    )

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    got = set(
        wildcard_scores(corpus, [(0, "t?rm000*")])
        .toPandas()["doc_id"].astype(int)
    )
    want = {
        int(d)
        for d, t in zip(tiny_corpus_pdf["doc_id"], tiny_corpus_pdf["text"])
        if any(
            fnmatch.fnmatchcase(tok, "t?rm000*") for tok in tokenize_text(t)
        )
    }
    assert got == want and len(want) > 0


def test_wildcard_rejects_bad_pattern(spark, tiny_corpus_pdf):
    from opensearch_jvector_plugin_spark.operators.fuzzy import (
        wildcard_to_like,
    )

    for bad in ["", "has space", "Upper", "per%cent", "un_der"]:
        with pytest.raises(ValueError):
            wildcard_to_like(bad)


def test_regexp_is_anchored_whole_term(spark, tiny_corpus_pdf):
    """`erm0001` is a substring of term0001 but must NOT match: Lucene
    RegexpQuery anchors the pattern to the whole term."""
    from opensearch_jvector_plugin_spark.operators.fuzzy import regexp_scores

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    assert regexp_scores(corpus, [(0, "erm0001")]).count() == 0
    assert regexp_scores(corpus, [(0, "term0001")]).count() > 0


def test_regexp_alternation_unions_terms(spark, tiny_corpus_pdf):
    """(a|b) scores exactly the union of the two terms' doc sets."""
    from opensearch_jvector_plugin_spark.functions.tokenizer import (
        tokenize_text,
    )
    from opensearch_jvector_plugin_spark.operators.fuzzy import regexp_scores

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    got = set(
        regexp_scores(corpus, [(0, "(hotcommon|hotrare)")])
        .toPandas()["doc_id"].astype(int)
    )
    want = {
        int(d)
        for d, t in zip(tiny_corpus_pdf["doc_id"], tiny_corpus_pdf["text"])
        if {"hotcommon", "hotrare"} & set(tokenize_text(t))
    }
    assert got == want and len(want) > 0


def test_wildcard_match_everything_caps_at_max_expansions(
    spark, tiny_corpus_pdf
):
    """A match-everything wildcard expands to EXACTLY max_expansions terms
    (the Lucene TopTermsRewrite cut, df DESC / term ASC), not the whole
    dictionary — the scale guard against adversarial wide patterns."""
    from opensearch_jvector_plugin_spark.operators.fuzzy import (
        pattern_expand,
        wildcard_scores,
    )
    from opensearch_jvector_plugin_spark.plans.stats import corpus_stats

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    postings = postings_df(corpus)
    term_df = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    ).cache()
    n_vocab = term_df.count()
    cap = 7
    assert n_vocab > cap  # the fixture vocab must exceed the cap
    exp = pattern_expand(
        term_df, 100.0, [(0, "%")], lambda t, p: t.like(p),
        max_expansions=cap,
    ).toPandas()
    assert len(exp) == cap
    # The cut keeps the highest-df terms, ties broken by term asc.
    tdf = term_df.toPandas().sort_values(
        ["df", "term"], ascending=[False, True], kind="mergesort"
    )
    assert sorted(exp["term"]) == sorted(tdf["term"].head(cap))

    # End-to-end: capped scoring only sees contributions from capped terms.
    scored = wildcard_scores(corpus, [(0, "*")], max_expansions=cap)
    got = scored.toPandas()
    assert len(got) > 0
    term_df.unpersist()


def test_fuzzy_expansion_cap_is_per_query_term(spark, tiny_corpus_pdf):
    """The fuzzy cap applies per (query, query-term): a two-term query may
    keep up to 2 * max_expansions expanded terms, each group cut by
    (boost DESC, df DESC, term ASC)."""
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    postings = postings_df(corpus)
    term_df = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    queries = spark.createDataFrame(
        [(0, "term0001 term0002", 10)],
        "query_id INT, query_text STRING, k LONG",
    )
    cap = 2
    exp = fuzzy_expand(
        query_terms_df(queries), term_df, 100.0, max_expansions=cap
    ).toPandas()
    assert len(exp) <= 2 * cap
    # Distance-0 self matches have boost 1.0 — always the top of each group.
    assert {"term0001", "term0002"} <= set(exp["term"])
