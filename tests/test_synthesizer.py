"""Synthesizer invariants: determinism, partition-independence, planted
term frequencies, schema fidelity, and the per-turn text-equality contract
(analog of the reference's derived-source fidelity,
DerivedSourceVectorInjector.java:73-99)."""

from __future__ import annotations

import numpy as np

from opensearch_jvector_plugin_spark.functions.tokenizer import tokenize_text
from opensearch_jvector_plugin_spark.sources.transcripts import (
    HOT_TERMS,
    RARE_TERMS,
    TRANSCRIPT_SCHEMA,
    reference_queries,
    synthesize_transcripts,
    synthesize_transcripts_pdf,
)


def test_deterministic_and_batch_independent():
    a = synthesize_transcripts_pdf(np.arange(200), 20, 10, seed=42)
    b = synthesize_transcripts_pdf(np.arange(200), 20, 10, seed=42)
    assert a.equals(b)
    # Generating the same rows in two disjoint chunks yields identical rows.
    c1 = synthesize_transcripts_pdf(np.arange(0, 120), 20, 10, seed=42)
    c2 = synthesize_transcripts_pdf(np.arange(120, 200), 20, 10, seed=42)
    import pandas as pd

    c = pd.concat([c1, c2], ignore_index=True)
    assert a["text"].tolist() == c["text"].tolist()


def test_planted_term_document_frequencies():
    n = 600
    pdf = synthesize_transcripts_pdf(np.arange(n), 60, 10, seed=42)
    toksets = [set(tokenize_text(t)) for t in pdf["text"]]

    for term, mod in HOT_TERMS.items():
        df = sum(term in ts for ts in toksets)
        assert df == len([i for i in range(n) if i % mod == 0])
    for term, planted in RARE_TERMS.items():
        hits = [i for i, ts in enumerate(toksets) if term in ts]
        assert hits == [i for i in planted if i < n]


def test_lengths_in_contract_range():
    pdf = synthesize_transcripts_pdf(np.arange(500), 50, 10, seed=42)
    lens = pdf["text"].map(lambda t: len(tokenize_text(t)))
    # 5..120 stream tokens plus at most 2 planted terms.
    assert lens.min() >= 5
    assert lens.max() <= 122


def test_spark_generation_matches_driver_generation(spark):
    sdf = synthesize_transcripts(spark, 30, 10, seed=42, num_partitions=7)
    assert sdf.schema == TRANSCRIPT_SCHEMA
    got = sdf.orderBy("conv_id", "turn_idx").toPandas()
    want = synthesize_transcripts_pdf(np.arange(300), 30, 10, seed=42)
    # Per-turn text equality under stable (conv_id, turn_idx) ordering.
    assert got["text"].tolist() == want["text"].tolist()
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert got["role"].tolist() == want["role"].tolist()


def test_reference_queries_shape():
    q = reference_queries(100)
    assert set(q.columns) == {"query_id", "query_text", "k"}
    assert (q["k"] > 0).all()
    assert q["query_id"].is_unique
