"""Rank-identity of the DataFrame-native BM25 path vs the pure-Python oracle
(the analog of the reference's exact score assertions,
KNNJVectorTests.java:79-95): docIDs exact, scores within rtol 1e-6, on the
reference query set including k edge cases (k=1, k>N, OOV, duplicate terms).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from opensearch_jvector_plugin_spark.operators.score import bm25_topk_bruteforce
from opensearch_jvector_plugin_spark.oracle import build_oracle_index, oracle_topk
from opensearch_jvector_plugin_spark.sources.transcripts import reference_queries


def assert_rank_identical(got: pd.DataFrame, want: pd.DataFrame, rtol=1e-6):
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(want), (len(got), len(want))
    assert got["query_id"].tolist() == want["query_id"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], want["score"], rtol=rtol)


def test_bruteforce_matches_oracle_tiny(spark, tiny_corpus_pdf):
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    queries_pdf = reference_queries(len(tiny_corpus_pdf))
    queries = spark.createDataFrame(queries_pdf)

    got = bm25_topk_bruteforce(corpus, queries).toPandas()
    want = oracle_topk(build_oracle_index(tiny_corpus_pdf), queries_pdf)
    assert_rank_identical(got, want)


def test_bruteforce_matches_oracle_small(spark, small_corpus_pdf):
    corpus = spark.createDataFrame(small_corpus_pdf).repartition(8)
    queries_pdf = reference_queries(len(small_corpus_pdf))
    queries = spark.createDataFrame(queries_pdf)

    got = bm25_topk_bruteforce(corpus, queries).toPandas()
    want = oracle_topk(build_oracle_index(small_corpus_pdf), queries_pdf)
    assert_rank_identical(got, want)
