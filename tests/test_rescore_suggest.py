"""Query rescorer (operators/rescorer.py) and term suggester
(operators/suggest.py): window combine semantics, tail preservation,
suggestion ranking and suggest_mode=missing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_plugin_spark.operators.rescorer import (
    query_rescore,
    rescored_topk,
)
from opensearch_jvector_plugin_spark.operators.suggest import term_suggest


@pytest.fixture(scope="module")
def primary(spark):
    # q0: five hits, primary order 10,11,12,13,14 (scores 5..1).
    return spark.createDataFrame(
        [(0, 10 + i, 5.0 - i) for i in range(5)],
        "query_id INT, doc_id LONG, score DOUBLE",
    )


def test_window_combines_and_tail_keeps_primary(spark, primary):
    # Secondary boosts the window's worst hit (doc 12) past the others;
    # doc 13/14 are below window=3 and must keep order AND score.
    secondary = spark.createDataFrame(
        [(0, 12, 10.0), (0, 14, 100.0)],  # doc 14's boost must be ignored
        "query_id INT, doc_id LONG, score DOUBLE",
    )
    ks = spark.createDataFrame([(0, 5)], "query_id INT, _k LONG")
    out = rescored_topk(
        query_rescore(primary, secondary, 3, query_weight=2.0,
                      rescore_query_weight=1.0),
        ks,
    ).toPandas().sort_values("rank")
    assert list(out.doc_id) == [12, 10, 11, 13, 14]
    # combined = 2*primary + secondary inside the window
    assert list(out.score)[:3] == [2 * 3.0 + 10.0, 10.0, 8.0]
    # tail: original primary scores, primary order
    assert list(out.score)[3:] == [2.0, 1.0]


def test_no_secondary_match_reorders_nothing(spark, primary):
    secondary = spark.createDataFrame(
        [], "query_id INT, doc_id LONG, score DOUBLE"
    )
    ks = spark.createDataFrame([(0, 5)], "query_id INT, _k LONG")
    out = rescored_topk(
        query_rescore(primary, secondary, 3), ks
    ).toPandas().sort_values("rank")
    assert list(out.doc_id) == [10, 11, 12, 13, 14]
    with pytest.raises(ValueError):
        query_rescore(primary, secondary, 0)


def test_term_suggest_ranking_and_missing_mode(spark):
    term_df = spark.createDataFrame(
        [("table", 40), ("cable", 7), ("tale", 40), ("scan", 9),
         ("data", 100), ("date", 12)],
        "term STRING, df LONG",
    )
    qdf = spark.createDataFrame(
        [(0, "tabel data"), (1, "zzz")],
        "query_id INT, query_text STRING",
    )
    got = term_suggest(term_df, qdf, size=2).toPandas()
    # "data" is in-dictionary -> no suggestions for it; "zzz" has no
    # same-prefix candidates.
    assert set(got.term) == {"tabel"}
    g = got.sort_values(["score", "df"], ascending=False)
    # ed(tabel,table)=2 -> 1-2/5=0.6; ed(tabel,tale)=2 over max(5,4) -> 0.6;
    # tie -> both df 40, then suggestion asc -> table before tale.
    # cable shares no first char... it does not ('c' != 't') -> excluded.
    assert list(g.suggestion) == ["table", "tale"]
    assert list(g.score) == [0.6, 0.6]
    # suggest_mode=always also corrects in-dictionary tokens.
    always = term_suggest(
        term_df, qdf, size=2, suggest_mode="always"
    ).toPandas()
    assert "data" in set(always.term)
    with pytest.raises(ValueError):
        term_suggest(term_df, qdf, size=0)
    with pytest.raises(ValueError):
        term_suggest(term_df, qdf, suggest_mode="bogus")


def test_phrase_suggest_bigram_lm(spark):
    import math

    import pandas as pd

    from opensearch_jvector_plugin_spark.operators.suggest import (
        lm_counts,
        phrase_suggest,
    )

    corpus = spark.createDataFrame(
        [
            (0, "table scan fast"),
            (1, "table scan slow"),
            (2, "table merge fast"),
            (3, "index scan fast"),
        ],
        "doc_id LONG, text STRING",
    )
    uni, bi, n, v = lm_counts(corpus)
    assert n == 12 and v == 6
    bim = {(r.v, r.w): r.cnt for r in bi.collect()}
    assert bim[("table", "scan")] == 2 and bim[("scan", "fast")] == 2

    q = pd.DataFrame({"query_id": [0, 1], "query_text":
                      ["tabel scan", "table scan"]})
    out = phrase_suggest(corpus, q, size=3).toPandas()
    # misspelled query: the corrected phrase must outrank the identity
    q0 = out[out.query_id == 0].sort_values("score", ascending=False)
    assert q0.iloc[0].suggestion == "table scan"
    assert "tabel scan" in set(q0.suggestion)  # identity still a candidate
    # all-in-dictionary query: identity wins (real-word likelihood 0.95
    # beats any (1-rwel)*sim channel for an equally-probable phrase)
    q1 = out[out.query_id == 1].sort_values("score", ascending=False)
    assert q1.iloc[0].suggestion == "table scan"
    # Hand-check q1's top score: channel 2*ln(.95), LM ln P(table) +
    # ln P(scan|table) with alpha=.5: count(table)=3, count(table scan)=2,
    # N=12, V=6 -> (3+.5)/(12+3) and (2+.5)/(3+3)
    want = round(2 * math.log(0.95) + math.log(3.5 / 15.0)
                 + math.log(2.5 / 6.0), 6)
    assert abs(q1.iloc[0].score - want) < 1e-9
    import pytest as _pt
    with _pt.raises(ValueError):
        phrase_suggest(corpus, q, size=0)
