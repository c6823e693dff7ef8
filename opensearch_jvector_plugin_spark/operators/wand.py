"""Block-max MaxScore top-k kernel — exact BM25 ranking with upper-bound
pruning, fully vectorized.

The two-phase idea of the reference (cheap upper-bound pass prunes, exact
scores rank — PQ approximate scorer + exact reranker,
JVectorReader.java:115-127; min-competitive-score early termination,
ResultUtil.reduceToTopK ResultUtil.java:32-57) re-expressed for posting
lists in NumPy instead of per-document cursor loops (which would be per-row
Python — banned):

  1. Per term upper bound: UB_t = w_t * max over skip blocks of
     tf_norm(block_max_tf, block_min_dl) — valid because tf_norm is
     increasing in tf and decreasing in dl. (The skip blocks earn their
     keep here: a per-block bound is much tighter than a whole-list bound.)
  2. Threshold seed θ0: the k-th largest single-term contribution of the
     highest-UB term is a LOWER bound on the true k-th best full score
     (every full score >= its own single-term contribution).
  3. MaxScore split: sort terms by UB ascending; the maximal prefix whose
     UB sum < θ0 is non-essential — no doc appearing ONLY in those lists
     can reach the top k. Candidates = union of essential lists' docIDs.
  4. Exact scores for candidates only: essential contributions are already
     materialized; non-essential (typically the hot, expensive lists)
     contribute via sorted-array lookup (searchsorted) at candidate docIDs
     only — never a full scan of the hot list.
  5. argpartition + lexsort top-k, ties broken by ascending docID.

Result is EXACT (rank-identical to brute force); pruning only affects work.
"""

from __future__ import annotations

import numpy as np

from ..functions.bm25 import BM25_B, BM25_K1


def _tf_norm_np(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    return (tf * (BM25_K1 + 1.0)) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl.astype(np.float64) / avgdl)
    )


def term_upper_bound(
    weight: float,
    block_max_tf: np.ndarray,
    block_min_dl: np.ndarray,
    avgdl: float,
) -> float:
    """UB over all postings of a term from its skip-block metadata."""
    ub = _tf_norm_np(
        np.asarray(block_max_tf, dtype=np.float64),
        np.asarray(block_min_dl, dtype=np.float64),
        avgdl,
    )
    return float(weight * ub.max())


def maxscore_topk(
    term_postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    term_weights: dict[str, float],
    term_ubs: dict[str, float],
    k: int,
    avgdl: float,
    allowed: np.ndarray | None = None,
    tf_norm_cache: dict[str, np.ndarray] | None = None,
    tie_epsilon: float = 0.0,
    denied: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k for one query over one segment.

    term_postings: term -> (doc_ids sorted asc, tfs, dls)
    term_weights:  term -> qtf * idf   (query-global, float64)
    term_ubs:      term -> upper bound on w * tf_norm (from skip blocks)
    allowed:       optional sorted array of permitted docIDs (pre-filter
                   semantics, the acceptDocs analog of JVectorReader.java:128)
    denied:        optional sorted array of EXCLUDED docIDs (the liveDocs
                   deleted set) — applied before any cut, like allowed
    tf_norm_cache: optional term -> tf_norm array cache shared across the
                   QUERY BATCH (tf_norm is query-independent; in batched
                   search each term's normalization is computed once per
                   segment, not once per query)
    tie_epsilon:   also return every doc scoring within tie_epsilon of the
                   k-th best (so a caller re-ranking on ROUNDED scores never
                   loses a rounded-tie candidate to the raw-score cut)

    Returns (doc_ids, scores) ranked by (-score, doc_id); length <= k when
    tie_epsilon == 0, otherwise k plus any epsilon-boundary ties.
    """
    terms = [t for t in sorted(term_postings) if term_weights.get(t)]
    if not terms or k <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    return _maxscore(term_postings, term_weights, term_ubs, k, None, avgdl,
                     allowed, tf_norm_cache, tie_epsilon, denied=denied)


def minscore_all(
    term_postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    term_weights: dict[str, float],
    term_ubs: dict[str, float],
    min_score: float,
    avgdl: float,
    allowed: np.ndarray | None = None,
    tf_norm_cache: dict[str, np.ndarray] | None = None,
    denied: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Radial-search analog (the reference's min_score / max_distance query
    mode, KNNQueryBuilder exactly-one-of {k, max_distance, min_score}):
    return EVERY doc scoring >= min_score, ranked. The MaxScore split works
    directly with θ0 = min_score — terms whose cumulative upper bounds stay
    below it cannot lift a doc over the threshold on their own."""
    terms = [t for t in sorted(term_postings) if term_weights.get(t)]
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    return _maxscore(term_postings, term_weights, term_ubs, None,
                     float(min_score), avgdl, allowed, tf_norm_cache, 0.0,
                     denied=denied)


def _maxscore(
    term_postings,
    term_weights,
    term_ubs,
    k,
    min_score,
    avgdl,
    allowed,
    tf_norm_cache,
    tie_epsilon=0.0,
    denied=None,
):
    terms = [t for t in sorted(term_postings) if term_weights.get(t)]
    if denied is not None and len(denied) == 0:
        denied = None
    if denied is not None and allowed is not None:
        # Fold the deleted set into the accept list once (both sorted).
        allowed = np.setdiff1d(allowed, denied, assume_unique=False)
        denied = None

    def norm_of(t):
        if tf_norm_cache is not None:
            arr = tf_norm_cache.get(t)
            if arr is None:
                doc, tf, dl = term_postings[t]
                arr = _tf_norm_np(tf, dl, avgdl)
                tf_norm_cache[t] = arr
            return arr
        doc, tf, dl = term_postings[t]
        return _tf_norm_np(tf, dl, avgdl)

    if allowed is not None:
        def filtered(t):
            doc = term_postings[t][0]
            if len(allowed):
                idx = np.searchsorted(allowed, doc)
                idx[idx == len(allowed)] = 0
                mask = allowed[idx] == doc
            else:
                mask = np.zeros(len(doc), bool)
            return doc[mask], norm_of(t)[mask]
    elif denied is not None:
        def filtered(t):
            doc = term_postings[t][0]
            idx = np.searchsorted(denied, doc)
            idx[idx == len(denied)] = 0
            mask = denied[idx] != doc
            return doc[mask], norm_of(t)[mask]
    else:
        def filtered(t):
            return term_postings[t][0], norm_of(t)

    data = {t: filtered(t) for t in terms}
    terms = [t for t in terms if len(data[t][0])]
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    # --- Single-term fast path: order is the contribution order.
    if len(terms) == 1:
        t = terms[0]
        doc, norm = data[t]
        scores = term_weights[t] * norm
        if min_score is not None:
            part = np.flatnonzero(scores >= min_score)
            order = np.lexsort((doc[part], -scores[part]))
            sel = part[order]
            return doc[sel], scores[sel]
        kk = min(k, len(doc))
        if kk < len(doc):
            kth = np.partition(scores, len(scores) - kk)[len(scores) - kk]
            part = np.flatnonzero(scores >= kth - tie_epsilon)
        else:
            part = np.arange(len(doc))
        order = np.lexsort((doc[part], -scores[part]))
        if tie_epsilon == 0.0:
            order = order[:kk]
        sel = part[order]
        return doc[sel], scores[sel]

    if min_score is not None:
        # Radial mode: the threshold IS the pruning bar.
        theta0 = float(min_score)
    else:
        # --- θ0 seed from the highest-UB term's own contributions.
        seed_term = max(terms, key=lambda t: term_ubs[t])
        sd, snorm = data[seed_term]
        seed_contrib = term_weights[seed_term] * snorm
        if len(seed_contrib) >= k:
            # Lower the pruning bar by tie_epsilon so an epsilon-boundary
            # doc can never be pruned as non-essential.
            theta0 = float(np.partition(seed_contrib, len(seed_contrib) - k)[
                len(seed_contrib) - k
            ]) - tie_epsilon
        else:
            theta0 = 0.0

    # --- MaxScore split (ascending UB prefix with cumsum < θ0 is prunable).
    by_ub = sorted(terms, key=lambda t: term_ubs[t])
    cum = 0.0
    non_essential: list[str] = []
    for t in by_ub:
        if cum + term_ubs[t] < theta0:
            cum += term_ubs[t]
            non_essential.append(t)
        else:
            break
    essential = [t for t in terms if t not in non_essential]
    if not essential:
        # Radial mode only: the sum of ALL term upper bounds is below
        # min_score — no document can qualify.
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    # --- Candidates: union of essential docIDs (sorted, deduped).
    cand = np.unique(np.concatenate([data[t][0] for t in essential]))
    scores = np.zeros(len(cand), dtype=np.float64)
    # Deterministic summation order (sorted term) = oracle's order.
    for t in sorted(terms):
        doc, norm = data[t]
        if t in non_essential:
            # Sparse lookup: contributions only at candidate positions.
            pos = np.searchsorted(doc, cand)
            pos_c = np.minimum(pos, len(doc) - 1)
            hit = doc[pos_c] == cand
            if not hit.any():
                continue
            scores[hit] += term_weights[t] * norm[pos_c[hit]]
        else:
            pos = np.searchsorted(cand, doc)  # every doc of t is in cand
            np.add.at(scores, pos, term_weights[t] * norm)

    if min_score is not None:
        part = np.flatnonzero(scores >= min_score)
        order = np.lexsort((cand[part], -scores[part]))
        sel = part[order]
        return cand[sel], scores[sel]

    kk = min(k, len(cand))
    if kk < len(cand):
        # Tie-aware cut: keep EVERY doc scoring >= the k-th largest value
        # minus tie_epsilon (argpartition alone would split ties
        # arbitrarily), then resolve ties by docID in the final sort.
        kth = np.partition(scores, len(scores) - kk)[len(scores) - kk]
        part = np.flatnonzero(scores >= kth - tie_epsilon)
    else:
        part = np.arange(len(cand))
    order = np.lexsort((cand[part], -scores[part]))
    if tie_epsilon == 0.0:
        order = order[:kk]
    sel = part[order]
    return cand[sel], scores[sel]
