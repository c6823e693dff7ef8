"""highlight_hits (operators/expand.py): window clamping at document
boundaries, first-occurrence-across-terms selection, hit-only scope."""

from __future__ import annotations

import pandas as pd

from opensearch_jvector_plugin_spark.operators.expand import highlight_hits


def test_highlight_window_clamps_and_picks_first_term(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta"),
            (1, "one two three four five six seven eight nine"),
            (2, "hit at start of doc"),
        ],
        "doc_id LONG, text STRING",
    )
    hits = spark.createDataFrame(
        [(0, 1, 0), (0, 2, 1), (1, 1, 2)],
        "query_id INT, rank INT, doc_id LONG",
    )
    qterms = spark.createDataFrame(
        # query 0: 'five' occurs at pos 5 in doc 1, 'delta' at pos 4 in
        # doc 0 -> first_pos is the min over the query's PRESENT terms.
        [(0, "delta"), (0, "five"), (1, "hit"), (1, "doc")],
        "query_id INT, term STRING",
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["first_pos"], r["snippet"])
        for r in highlight_hits(hits, corpus, qterms, window=2).collect()
    }
    # doc 0: 'delta' at 4, window 2..6
    assert got[(0, 0)] == (4, "beta gamma delta epsilon zeta")
    # doc 1: 'five' at 5, window 3..7
    assert got[(0, 1)] == (5, "three four five six seven")
    # doc 2: 'hit' at 1 -> window clamps at the doc start (1..3)
    assert got[(1, 2)] == (1, "hit at start")
    # only hit (query, doc) pairs are emitted
    assert set(got) == {(0, 0), (0, 1), (1, 2)}


def test_highlight_clamps_at_doc_end(spark):
    corpus = spark.createDataFrame(
        [(7, "a b c target")], "doc_id LONG, text STRING"
    )
    hits = spark.createDataFrame(
        [(3, 1, 7)], "query_id INT, rank INT, doc_id LONG"
    )
    qterms = spark.createDataFrame([(3, "target")], "query_id INT, term STRING")
    row = highlight_hits(hits, corpus, qterms, window=3).collect()[0]
    assert row["first_pos"] == 4
    assert row["snippet"] == "a b c target"
