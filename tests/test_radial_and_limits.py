"""Radial (min_score) search vs oracle, K_MAX validation contract, and an
adversarial-skew corpus (a term in 100% of documents)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from opensearch_jvector_plugin_spark.operators.build import build_index
from opensearch_jvector_plugin_spark.operators.query import (
    K_MAX,
    load_index,
    search,
    search_min_score,
)
from opensearch_jvector_plugin_spark.oracle import (
    build_oracle_index,
    oracle_radial,
    oracle_topk,
)
from opensearch_jvector_plugin_spark.sources.transcripts import (
    synthesize_transcripts_pdf,
)
from tests.test_bruteforce_rank_identity import assert_rank_identical


@pytest.fixture(scope="module")
def radial_built(spark, small_corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("radial") / "idx")
    build_index(spark.createDataFrame(small_corpus_pdf).repartition(4), d,
                seg_size=400)
    return d


def test_radial_rank_identity(spark, small_corpus_pdf, radial_built):
    oracle = build_oracle_index(small_corpus_pdf)
    queries = pd.DataFrame(
        [
            (0, "term0001", 0.1),
            (1, "raretermbbb hotcommon", 5.0),   # high bar: rare term required
            (2, "term0002 term0010", 0.5),
            (3, "hotcommon", 0.0),               # every match qualifies
            (4, "zzznope", 0.1),                 # OOV
            (5, "term0003 term0004 term0005", 100.0),  # nothing qualifies
        ],
        columns=["query_id", "query_text", "min_score"],
    )
    want = oracle_radial(oracle, queries)
    got = search_min_score(spark, load_index(radial_built), queries).toPandas()
    assert_rank_identical(got, want)
    # Sanity: the high-bar query prunes to only docs containing the rare term.
    q1 = want[want.query_id == 1]
    assert 0 < len(q1) <= 2


def test_radial_with_filter(spark, small_corpus_pdf, radial_built):
    oracle = build_oracle_index(small_corpus_pdf)
    allowed = np.sort(
        small_corpus_pdf.loc[small_corpus_pdf["role"] == "user", "doc_id"].to_numpy()
    )
    queries = pd.DataFrame(
        [(0, "term0001 hotfive", 0.3)],
        columns=["query_id", "query_text", "min_score"],
    )
    want = oracle_radial(oracle, queries,
                         filters={0: set(allowed.tolist())})
    got = search_min_score(
        spark, load_index(radial_built), queries, allowed_docs=allowed
    ).toPandas()
    assert_rank_identical(got, want)


def test_k_max_validation(spark, radial_built):
    idx = load_index(radial_built)
    bad = pd.DataFrame([(0, "term0001", K_MAX + 1)],
                       columns=["query_id", "query_text", "k"])
    with pytest.raises(ValueError, match="k must be in"):
        search(spark, idx, bad)
    bad0 = pd.DataFrame([(0, "term0001", 0)],
                        columns=["query_id", "query_text", "k"])
    with pytest.raises(ValueError, match="k must be in"):
        search(spark, idx, bad0)


def test_adversarial_skew_universal_term(spark, tmp_path):
    """A term present in EVERY document (the worst hot-term skew): build,
    query it alone and with a rare term; rank-identity must hold and the
    doc-range segmentation bounds each segment's posting list."""
    n = 1200
    pdf = synthesize_transcripts_pdf(np.arange(n), 120, 10, seed=42)
    pdf["text"] = pdf["text"] + " universalterm"
    pdf["doc_id"] = np.arange(n, dtype=np.int64)

    d = str(tmp_path / "skew")
    build_index(spark.createDataFrame(pdf).repartition(4), d, seg_size=200)
    oracle = build_oracle_index(pdf)
    queries = pd.DataFrame(
        [
            (0, "universalterm", 10),
            (1, "universalterm raretermaaa", 10),
            (2, "universalterm universalterm term0001", 25),
        ],
        columns=["query_id", "query_text", "k"],
    )
    want = oracle_topk(oracle, queries)
    got = search(spark, load_index(d), queries).toPandas()
    assert_rank_identical(got, want)
    # df of the universal term == corpus size (idf ~ ln(1 + 0.5/(N+0.5))).
    assert oracle.df["universalterm"] == n


def test_expand_hits_to_conversations(spark, small_corpus_pdf, radial_built):
    from opensearch_jvector_plugin_spark.operators.expand import (
        expand_hits_to_conversations,
    )

    corpus = spark.createDataFrame(small_corpus_pdf)
    queries = pd.DataFrame([(0, "raretermbbb", 5)],
                           columns=["query_id", "query_text", "k"])
    hits = search(spark, load_index(radial_built), queries)
    expanded = expand_hits_to_conversations(hits, corpus).toPandas()

    # Exactly the full conversations of the hit turns, nothing else.
    hit_ids = set(hits.toPandas()["doc_id"])
    want_convs = set(
        small_corpus_pdf.loc[
            small_corpus_pdf["doc_id"].isin(hit_ids), "conv_id"
        ]
    )
    assert set(expanded["conv_id"]) == want_convs
    want_rows = small_corpus_pdf[small_corpus_pdf["conv_id"].isin(want_convs)]
    assert len(expanded) == len(want_rows)
    # Every conversation comes back complete (10 turns each).
    assert (expanded.groupby("conv_id").size() == 10).all()


def test_tie_epsilon_boundary_exact_round6_topk(spark, tmp_path):
    """Many docs round-6-tie at the k-th boundary: the tie_epsilon path must
    return a candidate superset large enough that re-ranking on rounded
    scores with doc_id tie-break matches the oracle exactly. (A fixed +N
    raw-rank over-fetch fails this once more than N docs tie.)"""
    import pandas as pd
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from opensearch_jvector_plugin_spark.operators.query import search

    # 60 identical docs (exact score ties) + 40 distinct ones.
    rows = []
    for i in range(60):
        rows.append((f"conv{i:08d}", 0, "user", "alpha beta gamma", None)) 
    for i in range(60, 100):
        rows.append((f"conv{i:08d}", 0, "user",
                     "alpha " + " ".join(f"fill{j}" for j in range(i % 7)),
                     None))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool"])
    pdf["ts"] = pd.Timestamp("2024-01-01")
    pdf["doc_id"] = range(100)
    d = str(tmp_path / "ties")
    build_index(spark.createDataFrame(pdf).repartition(4), d, seg_size=25)

    queries = pd.DataFrame([(0, "alpha beta", 5)],
                           columns=["query_id", "query_text", "k"])
    res = search(spark, load_index(d), queries, tie_epsilon=1e-6)
    s6 = F.round(F.col("score"), 6)
    w = W.partitionBy("query_id").orderBy(s6.desc(), F.asc("doc_id"))
    got = (
        res.select("query_id", "doc_id", "score")
        .withColumn("r", F.row_number().over(w).cast("int"))
        .where(F.col("r") <= 5)
        .select("query_id", F.col("r").alias("rank"), "doc_id",
                s6.alias("score"))
        .toPandas()
    )
    oracle = build_oracle_index(pdf)
    want = oracle_topk(oracle, queries)
    # The 60 tied docs out-score the fillers; round-6 top-5 must be
    # doc_ids 0..4 exactly (lowest ids among the tie group).
    assert got["doc_id"].tolist() == want["doc_id"].tolist() == [0, 1, 2, 3, 4]
    assert_rank_identical(got, want)
