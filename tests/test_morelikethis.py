"""more_like_this (operators/morelikethis.py): selection filters
(min_term_freq / min_doc_freq / max_query_terms), seed exclusion, and the
score identity vs score_all over the selected term set."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_plugin_spark.operators.morelikethis import (
    mlt_select_terms,
    more_like_this,
)
from opensearch_jvector_plugin_spark.operators.score import score_all
from opensearch_jvector_plugin_spark.plans.stats import corpus_stats, postings_df


@pytest.fixture(scope="module")
def corpus(spark, tiny_corpus_pdf):
    return spark.createDataFrame(tiny_corpus_pdf)


def _selection(spark, corpus, seeds_rows, **kw):
    postings = postings_df(corpus)
    term_df = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    stats = corpus_stats(corpus)
    seeds = spark.createDataFrame(seeds_rows, "query_id INT, seed_doc_id LONG")
    return (
        mlt_select_terms(
            postings, term_df, float(stats.n_docs), seeds, **kw
        ).toPandas(),
        postings.toPandas(),
        term_df.toPandas(),
    )


def test_selection_filters_and_cut(spark, corpus):
    sel, postings, term_df = _selection(
        spark, corpus, [(0, 3)], max_query_terms=5, min_term_freq=2,
        min_doc_freq=5,
    )
    assert len(sel) <= 5
    seed_tf = postings[postings.doc_id == 3].set_index("term")["tf"]
    dfm = term_df.set_index("term")["df"]
    for t in sel.term:
        assert seed_tf[t] >= 2, f"{t} violates min_term_freq"
        assert dfm[t] >= 5, f"{t} violates min_doc_freq"
    # Every excluded seed term either failed a filter or lost the cut on
    # weight: check no filtered-out term beats the weakest selected term.
    n_docs = float(len(postings.doc_id.unique()))
    idf = np.log(1.0 + (n_docs - dfm + 0.5) / (dfm + 0.5))
    elig = [
        t for t in seed_tf.index
        if seed_tf[t] >= 2 and dfm.get(t, 0) >= 5
    ]
    w = {t: round(seed_tf[t] * idf[t], 6) for t in elig}
    kept = sorted(sel.term)
    best5 = sorted(sorted(elig, key=lambda t: (-w[t], t))[:5])
    assert kept == best5


def test_no_min_filters_keeps_singletons(spark, corpus):
    sel1, postings, _ = _selection(
        spark, corpus, [(0, 3)], max_query_terms=1000, min_term_freq=1,
        min_doc_freq=1,
    )
    # With filters off, every distinct seed term is selected.
    assert set(sel1.term) == set(
        postings[postings.doc_id == 3].term
    )


def test_cross_seed_docs_not_excluded(spark, corpus):
    # Regression: with two seeds, query 0 must only exclude ITS seed doc,
    # not query 1's — a self-referential join here once degenerated the
    # query_id equality to literal true and dropped both seeds everywhere.
    seeds = spark.createDataFrame(
        [(0, 3), (1, 5)], "query_id INT, seed_doc_id LONG"
    )
    got = more_like_this(
        corpus, seeds, max_query_terms=1000, min_term_freq=1, min_doc_freq=1
    ).toPandas()
    q0 = got[got.query_id == 0]
    q1 = got[got.query_id == 1]
    assert 3 not in set(q0.doc_id) and 5 not in set(q1.doc_id)
    # Every term is selected, so each seed shares a term with the other
    # seed's doc: the cross docs must appear.
    assert 5 in set(q0.doc_id), "query 0 wrongly excluded query 1's seed"
    assert 3 in set(q1.doc_id), "query 1 wrongly excluded query 0's seed"


def test_seed_excluded_and_score_identity(spark, corpus):
    seeds = spark.createDataFrame([(0, 3)], "query_id INT, seed_doc_id LONG")
    got = more_like_this(corpus, seeds, max_query_terms=8).toPandas()
    assert 3 not in set(got.doc_id)

    sel, _, _ = _selection(
        spark, corpus, [(0, 3)], max_query_terms=8, min_term_freq=2,
        min_doc_freq=5,
    )
    # Identity: MLT score == score_all with the selected terms as a plain
    # query (each term once -> qtf=1), on every non-seed doc.
    qdf = spark.createDataFrame(
        [(0, " ".join(sorted(sel.term)), 10)],
        "query_id INT, query_text STRING, k LONG",
    )
    want = (
        score_all(corpus, qdf)
        .where(F.col("doc_id") != 3)
        .toPandas()
        .set_index("doc_id")["score"]
        .sort_index()
    )
    gs = got.set_index("doc_id")["score"].sort_index()
    assert gs.index.equals(want.index)
    np.testing.assert_allclose(gs.to_numpy(), want.to_numpy(), rtol=1e-9)
