"""docID assignment: the scalable offsets method must agree exactly with the
window oracle, and ids must be dense 0..N-1 in (conv_id, turn_idx) order."""

from __future__ import annotations

import numpy as np

from opensearch_jvector_plugin_spark.plans.docids import assign_doc_ids
from opensearch_jvector_plugin_spark.sources.transcripts import (
    synthesize_transcripts,
)


def test_offsets_matches_window_and_is_dense(spark):
    df = synthesize_transcripts(spark, 40, 10, seed=42, num_partitions=6)
    order = ["conv_id", "turn_idx"]

    got = (
        assign_doc_ids(df, order, method="offsets")
        .select("conv_id", "turn_idx", "doc_id")
        .orderBy(*order)
        .toPandas()
    )
    want = (
        assign_doc_ids(df, order, method="window")
        .select("conv_id", "turn_idx", "doc_id")
        .orderBy(*order)
        .toPandas()
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["doc_id"].tolist() == list(range(400))
    # Stable mapping: doc_id order == (conv_id, turn_idx) order.
    keys = list(zip(got["conv_id"], got["turn_idx"]))
    assert keys == sorted(keys)


def test_text_equality_under_docid_roundtrip(spark, tiny_corpus_pdf):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering after
    round-trip through docID assignment (the derived-source invariant)."""
    df = synthesize_transcripts(spark, 20, 5, seed=42, num_partitions=5)
    out = (
        assign_doc_ids(df, ["conv_id", "turn_idx"])
        .orderBy("doc_id")
        .select("text")
        .toPandas()
    )
    assert out["text"].tolist() == tiny_corpus_pdf["text"].tolist()
