"""script_score — the user-pluggable scorer surface.

The reference registers a scoring script engine
(KNNScoringScriptEngine.java:50) whose built-in functions are the
KNNScoringUtil registry (l2Squared/cosinesimil/innerProduct/l1Norm/
lInfNorm/hammingBit, KNNScoringUtil.java:98-409); a script_score query
scores every filtered document exactly. These tests pin:

- the registry carries exactly the reference's six function names;
- Column scorers evaluate JVM-side and match a hand-built expression;
- the pandas plug-in path scores Arrow batches and is fold-exact with the
  equivalent Catalyst Column (the determinism contract in the module doc);
- contract errors (wrong output shape, unknown space, hammingBit over
  float vectors) raise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_plugin_spark.functions.spaces import (
    inner_product_col,
    l1_col,
)
from opensearch_jvector_plugin_spark.operators.script_score import (
    SCRIPT_SPACES,
    knn_script_score,
    script_score,
)

D = 8
N_DOCS = 40
N_QUERIES = 3


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    emb = rng.normal(size=(N_DOCS, D)).astype(np.float32)
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(N_DOCS, dtype=np.int64),
             "embedding": list(emb)}
        )
    )
    queries = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": np.arange(N_QUERIES, dtype=np.int32),
             "query_vec": list(emb[:N_QUERIES])}
        )
    )
    return docs, queries, emb


def test_registry_matches_reference_names():
    # KNNScoringUtil.java:98-409 — the six script functions, by name
    assert sorted(SCRIPT_SPACES) == sorted(
        ["l2Squared", "cosinesimil", "innerProduct", "l1Norm", "lInfNorm",
         "hammingBit"]
    )


def test_column_scorer_matches_manual_expression(vectors, spark):
    docs, queries, _ = vectors
    cand = docs.select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("_v")
    ).crossJoin(
        F.broadcast(
            queries.select("query_id", F.col("query_vec").alias("_qv"))
        )
    )
    got = (
        script_score(cand, l1_col(F.col("_v"), F.col("_qv")))
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    want = (
        cand.select(
            F.col("query_id").cast("int").alias("query_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            l1_col(F.col("_v"), F.col("_qv")).cast("double").alias("score"),
        )
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_pandas_scorer_fold_exact_with_column_twin(vectors, spark):
    docs, queries, _ = vectors
    cand = docs.select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("_v")
    ).crossJoin(
        F.broadcast(
            queries.select("query_id", F.col("query_vec").alias("_qv"))
        )
    )

    def scorer(pdf):
        V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        Q = np.stack(pdf["_qv"].to_numpy()).astype(np.float64)
        ip = np.zeros(len(pdf), dtype=np.float64)
        l1 = np.zeros(len(pdf), dtype=np.float64)
        for d in range(V.shape[1]):
            ip = ip + V[:, d] * Q[:, d]
            l1 = l1 + np.abs(V[:, d] - Q[:, d])
        return ip / (1.0 + l1)

    got = (
        script_score(cand, scorer)
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    twin = (
        inner_product_col(F.col("_v"), F.col("_qv"))
        / (F.lit(1.0) + l1_col(F.col("_v"), F.col("_qv")))
    )
    want = (
        cand.select(
            F.col("query_id").cast("int").alias("query_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            twin.cast("double").alias("score"),
        )
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    # bit-exact, not approx: both sides fold dimension-at-a-time in float64
    pd.testing.assert_frame_equal(got, want)


def test_knn_script_score_topk_against_numpy(vectors, spark):
    docs, queries, emb = vectors
    k = 5
    got = (
        knn_script_score(docs, queries, space="l2Squared", k=k)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    e = emb.astype(np.float64)
    for qid in range(N_QUERIES):
        d2 = ((e - e[qid]) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(N_DOCS), np.round(d2, 6)))
        want_ids = order[:k]
        have = got[got.query_id == qid].sort_values("rank")
        assert list(have.doc_id) == list(want_ids)
        # query scores itself at distance 0, rank 1
        assert have.iloc[0].doc_id == qid and have.iloc[0].score == 0.0


def test_knn_script_score_descending_space(vectors, spark):
    docs, queries, _ = vectors
    got = knn_script_score(
        docs, queries, space="innerProduct", k=3
    ).toPandas()
    for _, grp in got.groupby("query_id"):
        s = grp.sort_values("rank").score.to_numpy()
        assert (np.diff(s) <= 0).all()  # similarity ranks descending


def test_contract_errors(vectors, spark):
    docs, queries, _ = vectors
    with pytest.raises(ValueError, match="unknown script space"):
        knn_script_score(docs, queries, space="nope", k=3)
    with pytest.raises(ValueError, match="hammingBit"):
        knn_script_score(docs, queries, space="hammingBit", k=3)

    cand = docs.select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("_v")
    ).crossJoin(
        F.broadcast(
            queries.select("query_id", F.col("query_vec").alias("_qv"))
        )
    )
    bad = script_score(cand, lambda pdf: np.zeros((len(pdf), 2)))
    with pytest.raises(Exception, match="one float per row"):
        bad.collect()
