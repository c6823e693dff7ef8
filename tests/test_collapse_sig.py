"""collapse / function_score (operators/collapse.py) and significant_terms
(operators/aggs.py): group-best selection, modifier math + re-rank effect,
JLH values vs a numpy hand-computation."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_plugin_spark.operators.aggs import (
    significant_terms_agg,
)
from opensearch_jvector_plugin_spark.operators.collapse import (
    collapse_best_hits,
    field_value_factor,
)
from opensearch_jvector_plugin_spark.operators.score import score_all
from opensearch_jvector_plugin_spark.plans.stats import (
    corpus_stats,
    postings_df,
)


@pytest.fixture(scope="module")
def scored_attrs(spark):
    scored = spark.createDataFrame(
        # q0: group a has docs 1 (2.0) and 3 (3.0); group b doc 2; doc 4's
        # group is NULL. q1: ROUND-6 tie inside group a -> doc_id asc wins.
        [
            (0, 1, 2.0, "a"),
            (0, 3, 3.0, "a"),
            (0, 2, 2.5, "b"),
            (0, 4, 1.0, None),
            (1, 5, 1.0000004, "a"),
            (1, 6, 1.0000001, "a"),
        ],
        "query_id INT, doc_id LONG, score DOUBLE, grp STRING",
    )
    attrs = scored.select("doc_id", "grp").distinct()
    return scored.drop("grp"), attrs


def test_collapse_group_best(spark, scored_attrs):
    scored, attrs = scored_attrs
    got = (
        collapse_best_hits(scored, attrs, "grp")
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    # q0: best of group a = doc 3, group b = doc 2, NULL bucket = doc 4.
    assert list(got[got.query_id == 0].doc_id) == [2, 3, 4]
    # q1: scores tie at round-6 -> lower doc_id survives.
    assert list(got[got.query_id == 1].doc_id) == [5]


def test_fvf_modifiers_and_missing(spark):
    scored = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 2.0), (0, 3, 2.0)],
        "query_id INT, doc_id LONG, score DOUBLE",
    )
    attrs = spark.createDataFrame(
        [(1, 0), (2, 7), (3, None)], "doc_id LONG, v INT"
    )
    got = (
        field_value_factor(scored, attrs, "v", modifier="ln2p", missing=1.0)
        .toPandas()
        .set_index("doc_id")["score"]
    )
    assert got[1] == pytest.approx(2.0 * math.log(2.0))
    assert got[2] == pytest.approx(2.0 * math.log(9.0))
    assert got[3] == pytest.approx(2.0 * math.log(3.0))  # missing=1
    # Without `missing`, the NULL-valued hit is dropped.
    no_missing = field_value_factor(
        scored, attrs, "v", modifier="ln2p"
    ).toPandas()
    assert set(no_missing.doc_id) == {1, 2}
    # boost_mode=sum, factor scaling, square modifier.
    s = field_value_factor(
        scored, attrs, "v", factor=2.0, modifier="square", missing=0.0,
        boost_mode="sum",
    ).toPandas().set_index("doc_id")["score"]
    assert s[2] == pytest.approx(2.0 + 14.0**2)
    with pytest.raises(ValueError):
        field_value_factor(scored, attrs, "v", modifier="nope")


def test_fvf_reranks_before_cut(spark, tiny_corpus_pdf):
    """The boost must apply to the FULL scored relation: a later-turn doc
    with a slightly lower raw score overtakes under ln2p(turn_idx)."""
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    qdf = spark.createDataFrame(
        [(0, "term0001", 3)], "query_id INT, query_text STRING, k LONG"
    )
    scored = score_all(corpus, qdf)
    boosted = field_value_factor(
        scored, corpus.select("doc_id", "turn_idx"), "turn_idx",
        modifier="ln2p",
    ).toPandas()
    raw = scored.toPandas().set_index("doc_id")["score"]
    ti = tiny_corpus_pdf.set_index("doc_id")["turn_idx"]
    want = {
        d: raw[d] * math.log(2.0 + ti[d]) for d in raw.index
    }
    got = boosted.set_index("doc_id")["score"]
    assert set(got.index) == set(want)
    np.testing.assert_allclose(
        got.sort_index().to_numpy(),
        pd.Series(want).sort_index().to_numpy(),
        rtol=1e-9,
    )


def test_significant_terms_jlh(spark, tiny_corpus_pdf):
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    postings = postings_df(corpus)
    term_df = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    n_docs = float(corpus_stats(corpus).n_docs)
    # Foreground: q0 = docs containing term0001 (their shared vocabulary
    # should light up), q1 = an arbitrary doc range.
    pdf = postings.toPandas()
    fg0 = sorted(pdf[pdf.term == "term0001"].doc_id.unique())
    hits = spark.createDataFrame(
        [(0, int(d)) for d in fg0] + [(1, d) for d in range(10)],
        "query_id INT, doc_id LONG",
    )
    got = significant_terms_agg(
        hits, postings, term_df, n_docs, size=5, min_doc_count=2
    ).toPandas()

    # numpy oracle
    dfm = pdf.groupby("term").doc_id.nunique()
    rows = []
    for qid, fg in ((0, fg0), (1, list(range(10)))):
        sub = pdf[pdf.doc_id.isin(fg)]
        cnt = sub.groupby("term").doc_id.nunique()
        tot = float(len(fg))
        for t, dc in cnt.items():
            if dc < 2:
                continue
            fgp, bgp = dc / tot, dfm[t] / n_docs
            if fgp <= bgp:
                continue
            rows.append((qid, t, dc, dfm[t], round((fgp - bgp) * (fgp / bgp), 6)))
    want = pd.DataFrame(
        rows, columns=["query_id", "term", "doc_count", "bg_count", "score"]
    )
    want["rn"] = want.sort_values(
        ["score", "term"], ascending=[False, True]
    ).groupby("query_id").cumcount()
    want = (
        want.sort_values(["query_id", "score", "term"],
                         ascending=[True, False, True])
        .groupby("query_id").head(5).drop(columns="rn")
        .reset_index(drop=True)
    )
    gsort = got.sort_values(["query_id", "score", "term"],
                            ascending=[True, False, True]).reset_index(drop=True)
    assert len(gsort) == len(want)
    assert list(gsort.term) == list(want.term)
    assert list(gsort.doc_count) == list(want.doc_count)
    assert list(gsort.bg_count) == list(want.bg_count)
    np.testing.assert_allclose(gsort.score, want.score, atol=1e-6)
    # term0001 itself must be q0's top significant term (fg_pct = 1).
    assert gsort[gsort.query_id == 0].iloc[0].term == "term0001"


def test_significant_terms_validates_size(spark, tiny_corpus_pdf):
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    postings = postings_df(corpus)
    term_df = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    hits = spark.createDataFrame([(0, 1)], "query_id INT, doc_id LONG")
    with pytest.raises(ValueError):
        significant_terms_agg(hits, postings, term_df, 100.0, size=0)
