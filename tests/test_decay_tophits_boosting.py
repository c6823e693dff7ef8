"""Decay function_score (operators/collapse.py), top_hits aggregation
(operators/aggs.py) and the boosting query (operators/phrase.py):
closed-form decay math, bucket ranking, demote-not-remove semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opensearch_jvector_plugin_spark.operators.aggs import top_hits_agg
from opensearch_jvector_plugin_spark.operators.collapse import decay_score
from opensearch_jvector_plugin_spark.operators.phrase import boosting_scores
from opensearch_jvector_plugin_spark.operators.score import score_all


@pytest.fixture(scope="module")
def scored(spark):
    return spark.createDataFrame(
        [(0, d, 2.0) for d in range(5)],
        "query_id INT, doc_id LONG, score DOUBLE",
    )


@pytest.fixture(scope="module")
def attrs(spark):
    # doc 0..3 at value 0/10/20/30; doc 4 missing the field.
    return spark.createDataFrame(
        [(0, 0.0), (1, 10.0), (2, 20.0), (3, 30.0), (4, None)],
        "doc_id LONG, v DOUBLE",
    )


def _vals(df):
    return {
        r.doc_id: r.score
        for r in df.select("doc_id", "score").collect()
    }


def test_decay_gauss_anchor_points(spark, scored, attrs):
    # origin=0, offset=10, scale=10, decay=0.5: doc0/doc1 inside the
    # offset -> factor 1; doc2 at dist=10=scale -> factor exactly 0.5;
    # doc4 (NULL) -> factor 1.
    out = _vals(decay_score(scored, attrs, "v", "gauss", 0.0, 10.0,
                            offset=10.0, decay=0.5))
    assert out[0] == pytest.approx(2.0)
    assert out[1] == pytest.approx(2.0)
    assert out[2] == pytest.approx(2.0 * 0.5)
    assert out[4] == pytest.approx(2.0)
    # gauss at dist=2*scale: decay^(4) (exp(-d^2/(2s^2)) shape)
    assert out[3] == pytest.approx(2.0 * 0.5 ** 4)


def test_decay_exp_and_linear(spark, scored, attrs):
    out = _vals(decay_score(scored, attrs, "v", "exp", 0.0, 10.0,
                            decay=0.5))
    # exp: factor = decay^(dist/scale)
    assert out[1] == pytest.approx(2.0 * 0.5)
    assert out[3] == pytest.approx(2.0 * 0.5 ** 3)
    lin = _vals(decay_score(scored, attrs, "v", "linear", 0.0, 10.0,
                            decay=0.5))
    # linear support s = scale/(1-decay) = 20: doc2 at the edge -> 0,
    # doc3 beyond -> clamped 0, doc1 halfway -> 0.5.
    assert lin[1] == pytest.approx(1.0)
    assert lin[2] == pytest.approx(0.0)
    assert lin[3] == pytest.approx(0.0)


def test_decay_sum_mode_and_validation(spark, scored, attrs):
    out = _vals(decay_score(scored, attrs, "v", "gauss", 0.0, 10.0,
                            boost_mode="sum"))
    assert out[0] == pytest.approx(2.0 + 1.0)
    for bad in (
        dict(fn="bogus", origin=0.0, scale=10.0),
        dict(fn="gauss", origin=0.0, scale=0.0),
        dict(fn="gauss", origin=0.0, scale=10.0, decay=1.0),
        dict(fn="gauss", origin=0.0, scale=10.0, boost_mode="max"),
    ):
        with pytest.raises(ValueError):
            decay_score(scored, attrs, "v", **bad)


def test_top_hits_buckets_cut_and_null_skip(spark):
    hits = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 2.0), (0, 3, 2.0), (0, 4, 1.0), (0, 5, 9.0)],
        "query_id INT, doc_id LONG, score DOUBLE",
    )
    attrs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, None)],
        "doc_id LONG, g STRING",
    )
    out = top_hits_agg(hits, attrs, "g", 2).toPandas()
    # doc 5's NULL bucket is skipped entirely; bucket a cut at 2 with the
    # round-6 tie (docs 2,3 at 2.0) broken doc_id asc.
    a = out[out.key == "a"].sort_values("hit_rank")
    assert list(a.doc_id) == [1, 2]
    b = out[out.key == "b"]
    assert list(b.doc_id) == [4]
    assert 5 not in set(out.doc_id)
    with pytest.raises(ValueError):
        top_hits_agg(hits, attrs, "g", 0)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta slow"),
        (2, "alpha slow slow"),
        (3, "beta gamma delta"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_boosting_demotes_but_never_removes(spark, corpus):
    bq = spark.createDataFrame(
        [(0, "alpha beta", "slow", 0.25)],
        "query_id INT, positive_text STRING, negative_text STRING,"
        " negative_boost DOUBLE",
    )
    got = _vals(boosting_scores(corpus, bq))
    plain = _vals(
        score_all(
            corpus,
            spark.createDataFrame(
                [(0, "alpha beta")], "query_id INT, query_text STRING"
            ),
        )
    )
    # Same hit set (demote-not-remove), exact 0.25x on negative matchers.
    assert set(got) == set(plain)
    for d in (1, 2):  # contain "slow"
        assert got[d] == pytest.approx(plain[d] * 0.25)
    for d in (0, 3):
        assert got[d] == pytest.approx(plain[d])


def test_boosting_oov_negative_is_identity(spark, corpus):
    bq = spark.createDataFrame(
        [(0, "gamma", "zzznothing", 0.5)],
        "query_id INT, positive_text STRING, negative_text STRING,"
        " negative_boost DOUBLE",
    )
    got = _vals(boosting_scores(corpus, bq))
    plain = _vals(
        score_all(
            corpus,
            spark.createDataFrame(
                [(0, "gamma")], "query_id INT, query_text STRING"
            ),
        )
    )
    assert got.keys() == plain.keys()
    for d in got:
        assert got[d] == pytest.approx(plain[d])


def test_cardinality_percentiles_range(spark):
    from opensearch_jvector_plugin_spark.operators.aggs import (
        cardinality_agg,
        percentiles_agg,
        range_agg,
    )

    hits = spark.createDataFrame(
        [(0, d, 1.0) for d in range(1, 6)] + [(1, 1, 1.0)],
        "query_id INT, doc_id LONG, score DOUBLE",
    )
    attrs = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", 1.0), (3, "b", 2.0), (4, None, 3.0),
         (5, "c", 4.0)],
        "doc_id LONG, g STRING, v DOUBLE",
    )
    card = {r.query_id: r.value for r in cardinality_agg(
        hits, attrs, "g").collect()}
    assert card == {0: 3, 1: 1}  # NULL g (doc 4) excluded
    approx = {r.query_id: r.value for r in cardinality_agg(
        hits, attrs, "g", exact=False).collect()}
    assert approx[1] == 1  # HLL exact at tiny cardinality

    pct = percentiles_agg(hits, attrs, "v", [0.0, 50.0, 100.0]).toPandas()
    q0 = pct[pct.query_id == 0].set_index("percent").value
    # v over q0's hits = [0,1,2,3,4]: exact interpolation
    assert q0[0.0] == 0.0 and q0[50.0] == 2.0 and q0[100.0] == 4.0
    import pytest as _pt
    with _pt.raises(ValueError):
        percentiles_agg(hits, attrs, "v", [150.0])
    with _pt.raises(ValueError):
        percentiles_agg(hits, attrs, "v", [])

    rng = range_agg(
        hits, attrs, "v", [(None, 2.0), (2.0, None), (1.0, 4.0)]
    ).toPandas()
    r0 = rng[rng.query_id == 0].set_index("range_key").doc_count
    # [0,1,2,3,4]: <2 -> 2; >=2 -> 3; [1,4) -> 3 (overlap allowed)
    assert r0["*-2"] == 2 and r0["2-*"] == 3 and r0["1-4"] == 3
    r1 = rng[rng.query_id == 1].set_index("range_key").doc_count
    # q1's single hit v=0: empty buckets still emitted with 0
    assert r1["*-2"] == 1 and r1["2-*"] == 0 and r1["1-4"] == 0
    with _pt.raises(ValueError):
        range_agg(hits, attrs, "v", [])


def test_new_operator_plans(spark):
    """Plan discipline for the round-5-late operators:

    - top_hits_agg broadcasts the hit set into the attr scan (the attrs
      side is never hash-exchanged on doc_id);
    - decay_score adds ONE projection over the doc-values join — no extra
      exchange beyond the join the scored relation already needs;
    - boosting_scores' demotion join keys on (query_id, doc_id) of
      match-sized relations only (no corpus-side Exchange other than the
      scoring aggregation's own)."""
    from opensearch_jvector_plugin_spark.operators.aggs import top_hits_agg
    from opensearch_jvector_plugin_spark.operators.collapse import decay_score

    hits = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 2.0)], "query_id INT, doc_id LONG, score DOUBLE"
    )
    attrs = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "doc_id LONG, g STRING, v DOUBLE"
    )
    th_plan = (
        top_hits_agg(hits, attrs, "g", 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in th_plan
    for line in th_plan.splitlines():
        if "Exchange hashpartitioning" in line:
            # only the per-(query, bucket) window partitioning survives
            assert "doc_id" not in line, line

    base = decay_score(hits, attrs, "v", "gauss", 0.0, 10.0)
    joined_only = hits.join(attrs.select("doc_id", "v"), "doc_id")
    n_ex = lambda df: df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange"
    )
    assert n_ex(base) == n_ex(joined_only)  # decay adds zero exchanges


def test_histogram_agg_gap_fill(spark):
    from opensearch_jvector_plugin_spark.operators.aggs import histogram_agg

    hits = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0)],
        "query_id INT, doc_id LONG, score DOUBLE",
    )
    attrs = spark.createDataFrame(
        [(1, 0.5), (2, 0.7), (3, 6.1)], "doc_id LONG, v DOUBLE"
    )
    out = histogram_agg(hits, attrs, "v", 2.0).toPandas()
    got = dict(zip(out.bucket_key, out.doc_count))
    # occupied buckets 0 and 6; gaps 2 and 4 emitted as zeros
    assert got == {0.0: 2, 2.0: 0, 4.0: 0, 6.0: 1}
    import pytest as _pt
    with _pt.raises(ValueError):
        histogram_agg(hits, attrs, "v", 0.0)
