"""Whole-segment encoder vs the posting-list oracle: every term's decoded
(docIDs, tfs, dls) must equal the pure-Python index, and block metadata must
be consistent."""

from __future__ import annotations

import numpy as np
import pandas as pd

from opensearch_jvector_plugin_spark.operators.codec import (
    SKIP_BLOCK,
    decode_postings,
)
from opensearch_jvector_plugin_spark.operators.segment import encode_segment
from opensearch_jvector_plugin_spark.oracle import build_oracle_index


def check_segment_against_oracle(pdf: pd.DataFrame):
    rows, summary = encode_segment(pdf["doc_id"].to_numpy(), pdf["text"])
    oracle = build_oracle_index(pdf)

    assert summary["n_docs"] == len(pdf)
    assert summary["sum_dl"] == sum(oracle.dl.values())
    assert summary["n_terms"] == len(oracle.tf)
    assert set(rows["term"]) == set(oracle.tf)

    for r in rows.itertuples(index=False):
        want = sorted(oracle.tf[r.term].items())
        dec = decode_postings(r.blob, int(r.df), int(r.tf_offset),
                              int(r.dl_offset), int(r.checksum))
        assert dec.doc_ids.tolist() == [d for d, _ in want], r.term
        assert dec.tfs.tolist() == [t for _, t in want], r.term
        assert dec.dls.tolist() == [oracle.dl[d] for d, _ in want], r.term
        # Block metadata consistency.
        n_blocks = (int(r.df) + SKIP_BLOCK - 1) // SKIP_BLOCK
        assert len(r.block_last_doc) == n_blocks
        assert r.block_last_doc[-1] == dec.doc_ids[-1]
        assert max(r.block_max_tf) == r.max_tf
        for b in range(n_blocks):
            lo, hi = b * SKIP_BLOCK, min((b + 1) * SKIP_BLOCK, int(r.df))
            assert r.block_last_doc[b] == dec.doc_ids[hi - 1]
            assert r.block_max_tf[b] == dec.tfs[lo:hi].max()
            assert r.block_min_dl[b] == dec.dls[lo:hi].min()
    return rows, summary


def test_tiny_segment_matches_oracle(tiny_corpus_pdf):
    check_segment_against_oracle(tiny_corpus_pdf)


def test_unsorted_input_and_gapped_docids(tiny_corpus_pdf):
    pdf = tiny_corpus_pdf.copy()
    pdf["doc_id"] = pdf["doc_id"] * 1000 + 17  # sparse global ids
    pdf = pdf.sample(frac=1.0, random_state=1).reset_index(drop=True)  # shuffle
    check_segment_against_oracle(pdf)


def test_empty_and_degenerate_docs():
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["", "...", "same same same", None],
        }
    )
    rows, summary = encode_segment(pdf["doc_id"].to_numpy(), pdf["text"])
    assert summary["n_docs"] == 4
    assert summary["sum_dl"] == 3
    assert rows["term"].tolist() == ["same"]
    assert rows["df"].tolist() == [1]
    assert rows["ctf"].tolist() == [3]
