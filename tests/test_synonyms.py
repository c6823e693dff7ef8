"""SynonymQuery blending (operators/synonyms.py): blended df = max member
df, per-doc tf = sum of member tfs scored through ONE tf_norm, identity
without synonyms."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_plugin_spark.functions.bm25 import (
    bm25_idf_py,
    bm25_tf_norm_py,
)
from opensearch_jvector_plugin_spark.operators.score import score_all
from opensearch_jvector_plugin_spark.operators.synonyms import synonym_scores


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "join join alpha"),        # join tf=2
        (1, "merge alpha beta"),       # merge only
        (2, "join merge alpha"),       # both members
        (3, "merge beta"),             # merge only
        (4, "alpha beta gamma"),       # neither
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _queries(spark, text="join"):
    return spark.createDataFrame(
        [(0, text, 10)], "query_id INT, query_text STRING, k LONG"
    )


def _syn(spark):
    return spark.createDataFrame(
        [("join", "merge")], "term STRING, member STRING"
    )


def test_blended_df_and_summed_tf(spark, corpus):
    got = (
        synonym_scores(corpus, _queries(spark), _syn(spark))
        .toPandas()
        .set_index("doc_id")["score"]
    )
    # Matching docs: 0 (join), 1/3 (merge via synonym), 2 (both).
    assert set(got.index) == {0, 1, 2, 3}
    # Hand-computed: df_blend = max(df_join=2, df_merge=3) = 3; N=5;
    # avgdl = (3+3+3+2+3)/5 = 2.8; tf_blend: doc0=2, doc1=1, doc2=2, doc3=1.
    idf = bm25_idf_py(3, 5)
    for doc, tfb, dl in ((0, 2, 3), (1, 1, 3), (2, 2, 3), (3, 1, 2)):
        want = idf * bm25_tf_norm_py(tfb, dl, 2.8)
        assert got[doc] == pytest.approx(want, rel=1e-12), doc
    # One strong match: doc 2 (both members) scores EQUAL to doc 0
    # (join twice) — a single pseudo-term with tf 2, not two idf terms.
    assert got[2] == pytest.approx(got[0], rel=1e-12)


def test_no_synonyms_is_score_all_identity(spark, corpus):
    empty = spark.createDataFrame([], "term STRING, member STRING")
    q = _queries(spark, "join alpha")
    a = (
        synonym_scores(corpus, q, empty)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        score_all(corpus, q)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-12)


def test_out_of_corpus_member_is_inert(spark, corpus):
    syn = spark.createDataFrame(
        [("join", "zzznotaword")], "term STRING, member STRING"
    )
    q = _queries(spark)
    a = (
        synonym_scores(corpus, q, syn)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        score_all(corpus, q)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    # df_blend = max(df_join, 0) = df_join; no extra matches.
    pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-12)


def test_duplicate_query_terms_carry_qtf(spark, corpus):
    got = (
        synonym_scores(corpus, _queries(spark, "join join"), _syn(spark))
        .toPandas().set_index("doc_id")["score"]
    )
    once = (
        synonym_scores(corpus, _queries(spark, "join"), _syn(spark))
        .toPandas().set_index("doc_id")["score"]
    )
    for doc in got.index:
        assert got[doc] == pytest.approx(2 * once[doc], rel=1e-12)
