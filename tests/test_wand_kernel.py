"""MaxScore kernel vs brute-force oracle — pure NumPy, no Spark. The kernel
must be rank-identical (pruning may only change work, never results)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from opensearch_jvector_plugin_spark.functions.bm25 import bm25_idf_py
from opensearch_jvector_plugin_spark.operators.codec import SKIP_BLOCK
from opensearch_jvector_plugin_spark.operators.segment import encode_segment
from opensearch_jvector_plugin_spark.operators.codec import decode_postings
from opensearch_jvector_plugin_spark.operators.wand import (
    maxscore_topk,
    term_upper_bound,
)
from opensearch_jvector_plugin_spark.oracle import (
    build_oracle_index,
    oracle_score_query,
)
from opensearch_jvector_plugin_spark.functions.tokenizer import tokenize_text
from collections import Counter


def run_kernel_query(pdf, query_text, k, allowed=None):
    """Encode the corpus as one segment, then answer via the kernel."""
    rows, summary = encode_segment(pdf["doc_id"].to_numpy(), pdf["text"])
    rows = rows.set_index("term")
    oracle = build_oracle_index(pdf)
    avgdl = summary["sum_dl"] / summary["n_docs"]

    qtf = Counter(tokenize_text(query_text))
    postings, weights, ubs = {}, {}, {}
    for term, cnt in qtf.items():
        if term not in rows.index:
            continue
        r = rows.loc[term]
        dec = decode_postings(r.blob, int(r.df), int(r.tf_offset),
                              int(r.dl_offset), int(r.checksum))
        postings[term] = (dec.doc_ids, dec.tfs, dec.dls)
        w = cnt * bm25_idf_py(int(r.df), oracle.n_docs)
        weights[term] = w
        ubs[term] = term_upper_bound(w, np.asarray(r.block_max_tf),
                                     np.asarray(r.block_min_dl), avgdl)

    docs, scores = maxscore_topk(postings, weights, ubs, k, avgdl,
                                 allowed=allowed)

    allowed_set = set(allowed.tolist()) if allowed is not None else None
    want = oracle_score_query(oracle, query_text, allowed_set)
    want_sorted = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert docs.tolist() == [d for d, _ in want_sorted]
    np.testing.assert_allclose(scores, [s for _, s in want_sorted], rtol=1e-9)
    return docs, scores


def test_kernel_rank_identity_small(small_corpus_pdf):
    queries = [
        ("term0001", 10),
        ("hotcommon", 10),                 # hot term (df ~ n/3)
        ("raretermaaa", 10),               # df = 1
        ("term0002 term0010", 10),
        ("term0001 term0003 term0007 raretermbbb", 25),
        ("hotcommon hotfive term0001", 10),  # hot terms should be prunable
        ("term0002 term0002", 10),         # duplicate terms -> qtf 2
        ("term0001", 1),
        ("term0009", 10**6),               # k > N
        ("zzzunknown", 10),                # OOV
    ]
    for q, k in queries:
        run_kernel_query(small_corpus_pdf, q, k)


def test_kernel_with_filter(small_corpus_pdf):
    allowed = small_corpus_pdf.loc[
        small_corpus_pdf["role"] == "assistant", "doc_id"
    ].to_numpy()
    allowed = np.sort(allowed)
    run_kernel_query(small_corpus_pdf, "term0001 hotcommon", 10, allowed=allowed)
    run_kernel_query(small_corpus_pdf, "hotfive", 10, allowed=allowed)
    # Empty filter -> no results.
    docs, scores = run_kernel_query(
        small_corpus_pdf, "term0001", 10, allowed=np.array([], dtype=np.int64)
    )
    assert len(docs) == 0


def test_kernel_prunes_hot_term(small_corpus_pdf):
    """The hot list must be looked up sparsely, not scanned: check the
    MaxScore split actually fires (non-essential set non-empty) for a
    rare+hot query where the rare term dominates."""
    rows, summary = encode_segment(
        small_corpus_pdf["doc_id"].to_numpy(), small_corpus_pdf["text"]
    )
    rows = rows.set_index("term")
    oracle = build_oracle_index(small_corpus_pdf)
    avgdl = summary["sum_dl"] / summary["n_docs"]
    ub = {}
    for term in ["raretermbbb", "hotcommon"]:
        r = rows.loc[term]
        w = bm25_idf_py(int(r.df), oracle.n_docs)
        ub[term] = term_upper_bound(w, np.asarray(r.block_max_tf),
                                    np.asarray(r.block_min_dl), avgdl)
    # The rare term's UB dwarfs the hot term's: for k=1 the hot list is
    # non-essential (its UB alone is below the rare-term seed threshold).
    assert ub["raretermbbb"] > ub["hotcommon"] * 2
