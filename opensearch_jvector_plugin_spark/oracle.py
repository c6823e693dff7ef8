"""Pure-Python/NumPy BM25 oracle — the engine's correctness authority.

Mirrors the reference's test strategy: analytically-computed expected scores
asserted exactly (reference test
src/test/java/org/opensearch/knn/index/codec/jvector/KNNJVectorTests.java:79-95
computes expected scores with VectorSimilarityFunction and asserts them), and
a brute-force ground-truth scan (reference
src/testFixtures/java/org/opensearch/knn/TestUtils.java:139 builds exact
neighbors with a priority queue). Here: tokenize -> df/tf/dl -> exact float64
BM25 for every (query, doc) -> sort by (-score, doc_id) -> top-k.

No Spark anywhere in this module.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .functions.bm25 import BM25_B, BM25_K1, bm25_idf_py
from .functions.tokenizer import tokenize_text


@dataclass
class OracleIndex:
    n_docs: int
    avgdl: float
    doc_ids: np.ndarray          # int64, sorted
    dl: dict[int, int]           # doc_id -> exact token count
    tf: dict[str, dict[int, int]]  # term -> {doc_id: tf}
    df: dict[str, int]           # term -> document frequency


def build_oracle_index(corpus: pd.DataFrame, text_col: str = "text",
                       doc_id_col: str = "doc_id") -> OracleIndex:
    tf: dict[str, dict[int, int]] = {}
    dl: dict[int, int] = {}
    doc_ids = []
    for doc_id, text in zip(corpus[doc_id_col], corpus[text_col]):
        doc_id = int(doc_id)
        toks = tokenize_text(text)
        dl[doc_id] = len(toks)
        doc_ids.append(doc_id)
        for term, cnt in Counter(toks).items():
            tf.setdefault(term, {})[doc_id] = cnt
    df = {term: len(postings) for term, postings in tf.items()}
    n = len(doc_ids)
    avgdl = float(sum(dl.values())) / n if n else 0.0
    return OracleIndex(
        n_docs=n,
        avgdl=avgdl,
        doc_ids=np.sort(np.array(doc_ids, dtype=np.int64)),
        dl=dl,
        tf=tf,
        df=df,
    )


def oracle_score_query(
    index: OracleIndex,
    query_text: str,
    allowed_doc_ids: set[int] | None = None,
) -> dict[int, float]:
    """Exact BM25 scores for every matching (optionally filtered) doc.

    Duplicate query terms contribute once per occurrence (qtf weighting).
    Summation is in sorted-term order with float64 — the deterministic
    order the engine kernels must reproduce.
    """
    qtf = Counter(tokenize_text(query_text))
    scores: dict[int, float] = {}
    for term in sorted(qtf):
        postings = index.tf.get(term)
        if not postings:
            continue
        idf = bm25_idf_py(index.df[term], index.n_docs)
        weight = float(qtf[term]) * idf
        for doc_id, tf in postings.items():
            if allowed_doc_ids is not None and doc_id not in allowed_doc_ids:
                continue
            dl = index.dl[doc_id]
            tf_norm = (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / index.avgdl)
            )
            scores[doc_id] = scores.get(doc_id, 0.0) + weight * tf_norm
    return scores


def oracle_radial(
    index: OracleIndex,
    queries: pd.DataFrame,
    filters: dict[int, set[int]] | None = None,
) -> pd.DataFrame:
    """Golden radial results: every doc with score >= min_score, ranked.
    `queries` columns: query_id, query_text, min_score."""
    out = []
    for q in queries.itertuples(index=False):
        allowed = filters.get(int(q.query_id)) if filters else None
        scores = oracle_score_query(index, q.query_text, allowed)
        ordered = sorted(
            ((d, s) for d, s in scores.items() if s >= float(q.min_score)),
            key=lambda kv: (-kv[1], kv[0]),
        )
        for rank, (doc_id, score) in enumerate(ordered, start=1):
            out.append((int(q.query_id), rank, doc_id, score))
    return pd.DataFrame(
        out, columns=["query_id", "rank", "doc_id", "score"]
    ).astype({"query_id": np.int32, "rank": np.int32, "doc_id": np.int64,
              "score": np.float64})


def oracle_topk(
    index: OracleIndex,
    queries: pd.DataFrame,
    filters: dict[int, set[int]] | None = None,
) -> pd.DataFrame:
    """Golden top-k (FIXTURES.md §3): rank 1-based, ties broken by doc_id.

    `queries` columns: query_id, query_text, k. `filters` optionally maps
    query_id -> allowed doc_id set (pre-filtering semantics, as in
    reference JVectorReader.java:128 acceptDocs)."""
    out = []
    for q in queries.itertuples(index=False):
        allowed = filters.get(int(q.query_id)) if filters else None
        scores = oracle_score_query(index, q.query_text, allowed)
        ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (doc_id, score) in enumerate(ordered[: int(q.k)], start=1):
            out.append((int(q.query_id), rank, doc_id, score))
    return pd.DataFrame(
        out, columns=["query_id", "rank", "doc_id", "score"]
    ).astype({"query_id": np.int32, "rank": np.int32, "doc_id": np.int64,
              "score": np.float64})
