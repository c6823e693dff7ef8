"""Term suggester — did-you-mean corrections from the index dictionary.

OpenSearch's term suggester (Lucene DirectSpellChecker over the index
terms) proposes per-term corrections for query tokens. Defaults kept here:

- `suggest_mode=missing`: only suggest for terms NOT in the index
  (df == 0); in-dictionary tokens emit nothing.
- `max_edits=2`: Levenshtein distance bound.
- `prefix_length=1`: candidates must share the leading character — the
  DirectSpellChecker pruning that also makes the dictionary scan
  partition-prunable at scale (a term-range filter on the first byte).
- `size`: top suggestions per (query, term), ordered score desc, then
  doc frequency desc, then suggestion asc (the SCORE_FIRST comparator:
  similarity, popularity, tie-break).
- score = 1 - distance / max(len(term), len(candidate)) — the normalized
  string similarity both our fuzzy-query boost and the SQL oracle use
  (round-6 at the cut, engine-wide determinism contract).

Plan shape: the query token set is tiny and broadcast; the dictionary
(term, df) relation — already materialized by every scorer — is the only
full scan, filtered by the prefix guard before the Levenshtein evaluates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.tokenizer import tokenize_col, tokenize_text


def term_suggest(
    term_df: DataFrame,
    queries: DataFrame,
    max_edits: int = 2,
    prefix_length: int = 1,
    size: int = 3,
    suggest_mode: str = "missing",
) -> DataFrame:
    """(query_id, term, suggestion, df, score): per query token, the top
    `size` dictionary corrections. queries: (query_id, query_text);
    term_df: (term, df) — the shared dictionary relation."""
    if size <= 0:
        raise ValueError(f"suggest size must be positive: {size}")
    if suggest_mode not in ("missing", "always"):
        raise ValueError(f"unsupported suggest_mode: {suggest_mode!r}")
    qterms = queries.select(
        "query_id", F.explode(tokenize_col("query_text")).alias("qterm")
    ).distinct()
    if suggest_mode == "missing":
        qterms = qterms.join(
            term_df.select(F.col("term").alias("qterm")), "qterm", "left_anti"
        )
    cand = term_df.select("term", "df")
    ed = F.levenshtein(F.col("qterm"), F.col("term"))
    joined = cand.join(
        F.broadcast(qterms),
        (
            F.substring(F.col("term"), 1, prefix_length)
            == F.substring(F.col("qterm"), 1, prefix_length)
        )
        & (ed <= max_edits)
        & (F.col("term") != F.col("qterm")),
    )
    score = F.lit(1.0) - ed.cast("double") / F.greatest(
        F.length("qterm"), F.length("term")
    ).cast("double")
    scored = joined.select(
        "query_id",
        F.col("qterm").alias("term"),
        F.col("term").alias("suggestion"),
        "df",
        F.round(score, 6).alias("score"),
    )
    w = W.partitionBy("query_id", "term").orderBy(
        F.col("score").desc(), F.col("df").desc(), F.col("suggestion").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= size)
        .select("query_id", "term", "suggestion", "df", "score")
    )


def lm_counts(corpus: DataFrame, text_col: str = "text",
              base: DataFrame | None = None):
    """(unigram_df, bigram_df, n_tokens, vocab_size): the corpus language
    model the phrase suggester scores against — unigram counts, adjacent
    within-document bigram counts, and the Laplace denominator constants.
    One tokenizing scan feeds both counts (the bigram projection is a
    higher-order zip of the token array with its own tail — pure Catalyst,
    no UDF, no self-join). `base`: optional pre-tokenized corpus
    (doc_id, toks) — the term-vectors sidecar — so the scans read persisted
    token arrays instead of re-tokenizing text."""
    if base is None:
        toks = corpus.select(tokenize_col(text_col).alias("_t"))
    else:
        toks = base.select(F.col("toks").alias("_t"))
    uni = (
        toks.select(F.explode("_t").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    bi = (
        toks.where(F.size("_t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(slice(_t, 1, size(_t) - 1),"
                    " (v, i) -> struct(v AS v, _t[i + 1] AS w))"
                )
            ).alias("_b")
        )
        .select(F.col("_b.v").alias("v"), F.col("_b.w").alias("w"))
        .groupBy("v", "w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    totals = uni.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count("*").cast("long").alias("v"),
    ).collect()[0]
    return uni, bi, int(totals["n"] or 0), int(totals["v"] or 0)


def _position_candidates(
    term_df: DataFrame,
    qtok: DataFrame,
    num_candidates: int,
    max_edits: int,
    prefix_length: int,
) -> DataFrame:
    """(query_id, pos, cand, sim, df): per query position, the top
    `num_candidates` dictionary corrections (the term_suggest ranking:
    round-6 similarity desc, df desc, term asc) PLUS the original token
    itself with sim 1.0 (Lucene DirectCandidateGenerator always keeps the
    observed term as a candidate; an OOV original carries df 0)."""
    ed = F.levenshtein(F.col("token"), F.col("term"))
    joined = term_df.select("term", "df").join(
        F.broadcast(qtok),
        (
            F.substring(F.col("term"), 1, prefix_length)
            == F.substring(F.col("token"), 1, prefix_length)
        )
        & (ed <= max_edits)
        & (F.col("term") != F.col("token")),
    )
    sim = F.round(
        F.lit(1.0)
        - ed.cast("double")
        / F.greatest(F.length("token"), F.length("term")).cast("double"),
        6,
    )
    w = W.partitionBy("query_id", "pos").orderBy(
        F.col("sim").desc(), F.col("df").desc(), F.col("cand").asc()
    )
    corrections = (
        joined.select(
            "query_id",
            "pos",
            F.col("term").alias("cand"),
            sim.alias("sim"),
            "df",
        )
        .where(F.col("sim") > 0.0)  # sim 0 would be ln(0) in the channel
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= num_candidates)
        .drop("_rn")
    )
    originals = qtok.join(
        term_df.select(F.col("term").alias("token"), "df"), "token", "left"
    ).select(
        "query_id",
        "pos",
        F.col("token").alias("cand"),
        F.lit(1.0).alias("sim"),
        F.coalesce("df", F.lit(0).cast("long")).alias("df"),
    )
    return corrections.unionByName(originals)


def phrase_suggest(
    corpus: DataFrame,
    queries: pd.DataFrame,
    size: int = 3,
    num_candidates: int = 3,
    max_edits: int = 2,
    prefix_length: int = 1,
    alpha: float = 0.5,
    real_word_error_likelihood: float = 0.95,
    text_col: str = "text",
    term_df: DataFrame | None = None,
    base: DataFrame | None = None,
) -> DataFrame:
    """Phrase suggester — whole-phrase did-you-mean over a corpus bigram
    language model (the OpenSearch `phrase` suggester / Lucene
    NoisyChannelSpellChecker + LaplaceScorer shape):

        score(c_1..c_T) = ln P_channel + ln P_LM        (reported round-6)
        P_LM   = Laplace-smoothed: P(c_1) * prod_i P(c_i | c_{i-1}),
                 P(w)   = (count(w) + a) / (N + a*V)
                 P(w|v) = (count(v,w) + a) / (count(v) + a*V)
        P_channel per position = real_word_error_likelihood if the
                 candidate IS the observed token AND the token is in the
                 dictionary (an OOV observation is presumed an error),
                 else (1 - rwel) * similarity(cand, token)

    queries: driver-side pandas (query_id, query_text) — query tokenization
    happens at plan-build time (the per-position candidate lattice is part
    of the PLAN, like every phrase operator in this engine). Candidates per
    position: _position_candidates. Returns (query_id, suggestion, score):
    the top `size` whole phrases per query, (round-6 score desc,
    suggestion asc).

    Plan shape at scale: two corpus-derived relations (dictionary df and
    the lm_counts unigram/bigram tables) are the only big inputs; the
    candidate lattice is queries x T x (num_candidates+1) rows, combos are
    <= (num_candidates+1)^T per query — both broadcast-sized. The LM counts
    are pruned DOWN to the candidate terms by a broadcast semi-join BEFORE
    any combo join, so every join the combos participate in keys on
    candidate-sized data (never a corpus-side shuffle)."""
    import math

    if size <= 0:
        raise ValueError(f"phrase_suggest size must be positive: {size}")
    if not 0.0 < real_word_error_likelihood < 1.0:
        raise ValueError(
            "real_word_error_likelihood must be in (0, 1):"
            f" {real_word_error_likelihood}"
        )
    spark = corpus.sparkSession
    toks_by_q: list[tuple[int, list[str]]] = [
        (int(r.query_id), tokenize_text(r.query_text))
        for r in queries.itertuples(index=False)
    ]
    toks_by_q = [(q, t) for q, t in toks_by_q if t]
    if not toks_by_q:
        return spark.createDataFrame(
            [], "query_id INT, suggestion STRING, score DOUBLE"
        )
    qtok = spark.createDataFrame(
        [(q, i, tok) for q, ts in toks_by_q for i, tok in enumerate(ts)],
        "query_id INT, pos INT, token STRING",
    )
    # df = docs containing the term (the same dictionary every scorer uses)
    if term_df is None:
        term_df = (
            corpus.select(
                "doc_id", F.explode_outer(tokenize_col(text_col)).alias("term")
            )
            .where(F.col("term").isNotNull())
            .distinct()
            .groupBy("term")
            .agg(F.count("*").cast("long").alias("df"))
        )
    cand = _position_candidates(
        term_df, qtok, num_candidates, max_edits, prefix_length
    ).persist()
    uni, bi, n_tokens, vocab = lm_counts(corpus, text_col, base=base)
    # Prune the LM tables to candidate terms before anything touches combos.
    cand_terms = cand.select(F.col("cand").alias("term")).distinct()
    uni_p = uni.join(F.broadcast(cand_terms), "term").collect()
    uni_map = {r["term"]: int(r["cnt"]) for r in uni_p}
    bi_p = bi.join(
        F.broadcast(cand_terms.select(F.col("term").alias("v"))), "v"
    ).join(
        F.broadcast(cand_terms.select(F.col("term").alias("w"))), "w"
    ).collect()
    bi_map = {(r["v"], r["w"]): int(r["cnt"]) for r in bi_p}
    cand_rows = cand.collect()
    cand.unpersist()
    by_qpos: dict[tuple[int, int], list] = {}
    for r in cand_rows:
        by_qpos.setdefault((r["query_id"], r["pos"]), []).append(r)
    # Enumerate the (bounded) lattice driver-side: <= (C+1)^T combos per
    # query on maps already pruned to candidate terms. The heavy lifting
    # (dictionary expansion, LM counting, pruning) all ran distributed.
    aV = alpha * float(vocab)
    log_rwel = math.log(real_word_error_likelihood)
    log_err = math.log(1.0 - real_word_error_likelihood)
    out_rows: list[tuple[int, str, float]] = []
    for qid, tokens in toks_by_q:
        tiers = [by_qpos.get((qid, i), []) for i in range(len(tokens))]
        if any(not t for t in tiers):
            continue  # a position with zero candidates cannot happen
        combos: list[tuple[list, float]] = [([], 0.0)]
        for i, tier in enumerate(tiers):
            nxt = []
            for prefix, acc in combos:
                for c in tier:
                    # Keeping the observed token costs rwel only when it
                    # exists in the dictionary; an OOV observation is
                    # presumed an error (channel 1-rwel, sim 1.0) — else
                    # the untouched misspelling always outranks its fix.
                    chan = (
                        log_rwel
                        if c["cand"] == tokens[i] and c["df"] > 0
                        else log_err + math.log(c["sim"])
                    )
                    if i == 0:
                        lm = math.log(
                            (uni_map.get(c["cand"], 0) + alpha)
                            / (n_tokens + aV)
                        )
                    else:
                        prev = prefix[-1]["cand"]
                        lm = math.log(
                            (bi_map.get((prev, c["cand"]), 0) + alpha)
                            / (uni_map.get(prev, 0) + aV)
                        )
                    nxt.append((prefix + [c], acc + chan + lm))
            combos = nxt
        scored = sorted(
            (
                (" ".join(c["cand"] for c in pre), round(s, 6))
                for pre, s in combos
            ),
            key=lambda t: (-t[1], t[0]),
        )
        for phrase, s in scored[:size]:
            out_rows.append((qid, phrase, s))
    return spark.createDataFrame(
        out_rows, "query_id INT, suggestion STRING, score DOUBLE"
    )
