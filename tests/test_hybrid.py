"""Hybrid fusion (operators/hybrid.py): RRF arithmetic, min-max
normalization semantics, missing-doc treatment, validation."""

from __future__ import annotations

import pytest

from opensearch_jvector_plugin_spark.operators.hybrid import (
    minmax_fuse,
    rrf_fuse,
)


@pytest.fixture(scope="module")
def rankings(spark):
    lex = spark.createDataFrame(
        [(0, 1, 10, 5.0), (0, 2, 11, 3.0), (0, 3, 12, 1.0)],
        "query_id INT, rank INT, doc_id LONG, score DOUBLE",
    )
    vec = spark.createDataFrame(
        [(0, 1, 11, 0.9), (0, 2, 13, 0.5)],
        "query_id INT, rank INT, doc_id LONG, score DOUBLE",
    )
    return lex, vec


def test_rrf_arithmetic_and_overlap(spark, rankings):
    lex, vec = rankings
    got = rrf_fuse([lex, vec], k=10).toPandas().set_index("doc_id")
    # doc 11: lex rank 2 + vec rank 1 -> 1/62 + 1/61 (the overlap wins).
    assert got.loc[11, "rrf_score"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6)
    )
    assert got.loc[10, "rrf_score"] == pytest.approx(round(1 / 61, 6))
    assert got.loc[11, "rank"] == 1
    assert set(got.index) == {10, 11, 12, 13}
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([], k=5)


def test_minmax_normalization_and_missing_zero(spark, rankings):
    lex, vec = rankings
    got = (
        minmax_fuse([lex, vec], [0.5, 0.5], k=10)
        .toPandas()
        .set_index("doc_id")
    )
    # lex norms: 10->1.0, 11->0.5, 12->0.0; vec norms: 11->1.0, 13->0.0.
    assert got.loc[11, "hybrid_score"] == pytest.approx(0.5 * 0.5 + 0.5 * 1.0)
    assert got.loc[10, "hybrid_score"] == pytest.approx(0.5)  # missing vec = 0
    assert got.loc[12, "hybrid_score"] == pytest.approx(0.0)
    assert got.loc[13, "hybrid_score"] == pytest.approx(0.0)


def test_minmax_degenerate_single_hit_is_one(spark):
    one = spark.createDataFrame(
        [(0, 1, 7, 2.5)], "query_id INT, rank INT, doc_id LONG, score DOUBLE"
    )
    got = minmax_fuse([one], [1.0], k=5).toPandas()
    assert got["hybrid_score"].iloc[0] == 1.0
    with pytest.raises(ValueError, match="one weight per ranking"):
        minmax_fuse([one], [1.0, 2.0], k=5)
