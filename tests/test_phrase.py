"""Phrase + minimum_should_match query tests (operators/phrase.py):
expression-vs-Python-twin agreement (incl. overlap and tokenizer fold
chars), declarative-vs-indexed frame identity over a multi-segment index
against a pure-Python oracle, msm semantics, and plan-shape assertions
(candidate-broadcast verification join; the corpus is never shuffled)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_plugin_spark.functions.bm25 import (
    bm25_idf_py,
    bm25_tf_norm_py,
)
from opensearch_jvector_plugin_spark.functions.tokenizer import tokenize_text
from opensearch_jvector_plugin_spark.operators.build import build_index
from opensearch_jvector_plugin_spark.operators.phrase import (
    msm_scores,
    phrase_freq_col,
    phrase_freq_py,
    phrase_scores,
    search_phrase,
)
from opensearch_jvector_plugin_spark.operators.query import load_index
from opensearch_jvector_plugin_spark.operators.score import score_all

# (text, phrase terms, expected pf)
PF_CASES = [
    ("a b a b a b", ["a", "b"], 3),
    ("a a a a", ["a", "a"], 3),  # overlapping occurrences count
    ("K b", ["k", "b"], 1),  # KELVIN SIGN folds to 'k'
    ("İ x", ["i", "x"], 1),  # dotted capital I folds to 'i'
    ("foo-bar, baz!", ["foo", "bar", "baz"], 1),  # punctuation separates
    ("", ["a"], 0),
    (None, ["a"], 0),
    ("a", ["a"], 1),  # single-term phrase
    ("b a", ["a", "b"], 0),  # order matters
    ("x y", ["x", "y", "z"], 0),  # phrase longer than doc
]


def test_phrase_freq_col_matches_python_twin(spark):
    rows = [(i, t) for i, (t, _terms, _e) in enumerate(PF_CASES)]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    from opensearch_jvector_plugin_spark.functions.tokenizer import tokenize_col

    toks = F.col("toks")
    base = df.select("id", tokenize_col("text").alias("toks"))
    cols = [
        phrase_freq_col(toks, terms).alias(f"pf_{i}")
        for i, (_t, terms, _e) in enumerate(PF_CASES)
    ]
    got = {r["id"]: r for r in base.select("id", *cols).collect()}
    for i, (text, terms, expect) in enumerate(PF_CASES):
        assert got[i][f"pf_{i}"] == expect, (text, terms)
        assert phrase_freq_py(tokenize_text(text or ""), terms) == expect


def test_phrase_freq_randomized_batch_matches_twin(spark):
    """200 random texts over a tiny alphabet x 8 random phrases, compared
    in ONE Spark job against the pure-Python twin — the randomized
    contract pin for overlap/boundary behavior."""
    rng = np.random.default_rng(20260817)
    texts = [
        " ".join(rng.choice(["a", "b", "c"], size=rng.integers(0, 12)))
        for _ in range(200)
    ]
    phrases = [
        list(rng.choice(["a", "b", "c"], size=rng.integers(1, 4)))
        for _ in range(8)
    ]
    from opensearch_jvector_plugin_spark.functions.tokenizer import tokenize_col

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id INT, text STRING"
    )
    base = df.select("id", tokenize_col("text").alias("toks"))
    cols = [
        phrase_freq_col(F.col("toks"), terms).alias(f"pf_{j}")
        for j, terms in enumerate(phrases)
    ]
    got = {r["id"]: r for r in base.select("id", *cols).collect()}
    for i, text in enumerate(texts):
        toks = tokenize_text(text)
        for j, terms in enumerate(phrases):
            assert got[i][f"pf_{j}"] == phrase_freq_py(toks, terms), (
                text,
                terms,
            )


PHRASES = [
    (0, "term0001 term0002", 10),
    (1, "hotcommon hotfive", 10),  # planted adjacent suffix on i%15==0 docs
    (2, "term0003 term0003", 10),  # repeated-term phrase
    (3, "raretermaaa raretermbbb", 10),  # terms exist, never adjacent
    (4, "zzzoov term0001", 10),  # OOV term -> empty
    (5, "term0002", 5),  # single-term phrase == that term's BM25
]


def _python_phrase_oracle(pdf: pd.DataFrame, phrases) -> pd.DataFrame:
    toks = [tokenize_text(t) for t in pdf["text"]]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    out = []
    for qid, text, _k in phrases:
        terms = tokenize_text(text)
        if not terms:
            continue
        # occurrence-order idf left fold over per-term doc frequencies
        dfs = {
            t: sum(1 for tk in toks if t in tk) for t in set(terms)
        }
        w = bm25_idf_py(dfs[terms[0]], n)
        for t in terms[1:]:
            w += bm25_idf_py(dfs[t], n)
        for doc_id, tk in zip(pdf["doc_id"], toks):
            pf = phrase_freq_py(tk, terms)
            if pf > 0:
                out.append(
                    (qid, int(doc_id), w * bm25_tf_norm_py(pf, len(tk), avgdl))
                )
    return pd.DataFrame(out, columns=["query_id", "doc_id", "score"])


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["score"] = pdf["score"].round(6)
    pdf["query_id"] = pdf["query_id"].astype(np.int64)
    pdf["doc_id"] = pdf["doc_id"].astype(np.int64)
    return (
        pdf[["query_id", "doc_id", "score"]]
        .sort_values(["query_id", "doc_id"], kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def phrase_index(spark, tiny_corpus_pdf, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("phr") / "idx")
    corpus = spark.createDataFrame(tiny_corpus_pdf).repartition(4)
    build_index(corpus, idx_dir, seg_size=20)  # 5 segments
    return idx_dir


def test_phrase_declarative_matches_python_oracle(spark, tiny_corpus_pdf):
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    qpdf = pd.DataFrame(PHRASES, columns=["query_id", "query_text", "k"])
    got = _norm(phrase_scores(corpus, qpdf).toPandas())
    want = _norm(_python_phrase_oracle(tiny_corpus_pdf, PHRASES))
    assert want["query_id"].nunique() >= 3  # fixture really exercises matches
    pd.testing.assert_frame_equal(got, want)


def test_phrase_indexed_matches_declarative(spark, tiny_corpus_pdf, phrase_index):
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    qpdf = pd.DataFrame(PHRASES, columns=["query_id", "query_text", "k"])
    index = load_index(phrase_index)
    declarative = _norm(phrase_scores(corpus, qpdf).toPandas())
    served = search_phrase(spark, index, corpus, qpdf)
    got = _norm(served.toPandas())
    pd.testing.assert_frame_equal(got, declarative)


def test_phrase_indexed_plan_broadcasts_candidates(
    spark, tiny_corpus_pdf, phrase_index
):
    """The verification join must broadcast the conjunction-sized candidate
    set; the corpus side is scanned once and NEVER hash-exchanged on
    doc_id (the vector rerank's candidate-join discipline)."""
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    qpdf = pd.DataFrame(PHRASES, columns=["query_id", "query_text", "k"])
    served = search_phrase(spark, load_index(phrase_index), corpus, qpdf)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "doc_id" not in line, line


def test_phrase_declarative_plan_no_corpus_shuffle(spark, tiny_corpus_pdf):
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    qpdf = pd.DataFrame(PHRASES, columns=["query_id", "query_text", "k"])
    plan = (
        phrase_scores(corpus, qpdf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Only the 1-row stats aggregate exchanges (SinglePartition); per-doc
    # phrase counting is a pure projection joined to a broadcast.
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


MSM_Q = [
    (0, "term0001 term0002 term0003", 10),
    (1, "term0004 term0004 term0005", 10),  # duplicate collapses to 2 distinct
    (2, "raretermaaa term0001", 10),
]


def _msm_python(pdf: pd.DataFrame, queries, msm) -> set[tuple[int, int]]:
    toks = [set(tokenize_text(t)) for t in pdf["text"]]
    keep = set()
    for qid, text, _k in queries:
        terms = set(tokenize_text(text))
        need = msm[qid]
        for doc_id, tk in zip(pdf["doc_id"], toks):
            if len(terms & tk) >= need:
                keep.add((qid, int(doc_id)))
    return keep


def test_msm_one_equals_plain_scoring(spark, tiny_corpus_pdf):
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    queries = spark.createDataFrame(
        MSM_Q, "query_id INT, query_text STRING, k LONG"
    )
    plain = _norm(score_all(corpus, queries).toPandas())
    eased = _norm(
        msm_scores(corpus, queries, {q: 1 for q, _t, _k in MSM_Q}).toPandas()
    )
    pd.testing.assert_frame_equal(eased, plain)


def test_msm_filters_to_python_set_and_keeps_scores(spark, tiny_corpus_pdf):
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    queries = spark.createDataFrame(
        MSM_Q, "query_id INT, query_text STRING, k LONG"
    )
    msm = {0: 3, 1: 2, 2: 2}
    got = _norm(msm_scores(corpus, queries, msm).toPandas())
    want_keys = _msm_python(tiny_corpus_pdf, MSM_Q, msm)
    assert set(zip(got["query_id"], got["doc_id"])) == want_keys
    assert len(want_keys) > 0
    # Scores are the UNCHANGED full BM25 scores (the cut never rescores).
    plain = _norm(score_all(corpus, queries).toPandas())
    merged = got.merge(
        plain, on=["query_id", "doc_id"], suffixes=("", "_plain")
    )
    assert (merged["score"] == merged["score_plain"]).all()


def _near_py(tokens, t1, t2, slop):
    return sum(
        1
        for j, tok in enumerate(tokens)
        if tok == t2
        and any(
            tokens[i] == t1 for i in range(max(0, j - slop - 1), j)
        )
    )


def test_near_slop_zero_equals_bigram_phrase(spark, tiny_corpus_pdf):
    from opensearch_jvector_plugin_spark.operators.phrase import near_scores

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    near = _norm(
        near_scores(
            corpus,
            pd.DataFrame(
                [(1, "hotcommon", "hotfive", 0)],
                columns=["query_id", "term1", "term2", "slop"],
            ),
        ).toPandas()
    )
    phr = _norm(
        phrase_scores(
            corpus,
            pd.DataFrame(
                [(1, "hotcommon hotfive", 10)],
                columns=["query_id", "query_text", "k"],
            ),
        ).toPandas()
    )
    assert len(near) > 0
    pd.testing.assert_frame_equal(near, phr)


def test_near_counts_match_python_oracle(spark, tiny_corpus_pdf):
    from opensearch_jvector_plugin_spark.operators.phrase import (
        near_freq_col,
    )
    from opensearch_jvector_plugin_spark.functions.tokenizer import (
        tokenize_col,
    )

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    cases = [("term0001", "term0002", 2), ("the", "data", 4),
             ("hotcommon", "hotfive", 0)]
    cols = [
        near_freq_col(F.col("toks"), t1, t2, s).alias(f"pf_{i}")
        for i, (t1, t2, s) in enumerate(cases)
    ]
    got = {
        r["doc_id"]: r
        for r in corpus.select(
            "doc_id", tokenize_col("text").alias("toks")
        ).select("doc_id", *cols).collect()
    }
    hits = 0
    for doc_id, text in zip(tiny_corpus_pdf["doc_id"], tiny_corpus_pdf["text"]):
        toks = tokenize_text(text)
        for i, (t1, t2, s) in enumerate(cases):
            want = _near_py(toks, t1, t2, s)
            assert got[doc_id][f"pf_{i}"] == want
            hits += want > 0
    assert hits > 0


def _bool_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "query_id INT, must_text STRING, should_text STRING,"
        " must_not_text STRING, k LONG",
    )


def test_boolean_should_only_equals_plain_scoring(spark, tiny_corpus_pdf):
    from opensearch_jvector_plugin_spark.operators.phrase import boolean_scores

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    text = "term0001 term0002 term0003"
    got = _norm(
        boolean_scores(
            corpus, _bool_df(spark, [(0, "", text, "", 10)])
        ).toPandas()
    )
    plain = _norm(
        score_all(
            corpus,
            spark.createDataFrame(
                [(0, text, 10)], "query_id INT, query_text STRING, k LONG"
            ),
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got, plain)


def test_boolean_pure_must_equals_full_msm(spark, tiny_corpus_pdf):
    """must-only boolean == msm with msm = #distinct terms (and must terms
    DO score, Lucene MUST not FILTER)."""
    from opensearch_jvector_plugin_spark.operators.phrase import boolean_scores

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    text = "term0001 term0002"
    got = _norm(
        boolean_scores(
            corpus, _bool_df(spark, [(0, text, "", "", 10)])
        ).toPandas()
    )
    want = _norm(
        msm_scores(
            corpus,
            spark.createDataFrame(
                [(0, text, 10)], "query_id INT, query_text STRING, k LONG"
            ),
            {0: 2},
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_boolean_must_not_excludes_and_oov_must_empties(spark, tiny_corpus_pdf):
    from opensearch_jvector_plugin_spark.operators.phrase import boolean_scores

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    out = boolean_scores(
        corpus,
        _bool_df(
            spark,
            [
                (0, "", "term0001", "term0002", 10),
                (1, "zzznope term0001", "", "", 10),  # OOV must -> empty
            ],
        ),
    ).toPandas()
    assert 1 not in set(out["query_id"])
    kept = set(out[out["query_id"] == 0]["doc_id"].astype(int))
    both = {
        int(d)
        for d, t in zip(tiny_corpus_pdf["doc_id"], tiny_corpus_pdf["text"])
        if "term0001" in tokenize_text(t) and "term0002" in tokenize_text(t)
    }
    only = {
        int(d)
        for d, t in zip(tiny_corpus_pdf["doc_id"], tiny_corpus_pdf["text"])
        if "term0001" in tokenize_text(t)
        and "term0002" not in tokenize_text(t)
    }
    assert kept == only and kept.isdisjoint(both) and len(only) > 0


def test_msm_above_distinct_count_is_empty(spark, tiny_corpus_pdf):
    corpus = spark.createDataFrame(tiny_corpus_pdf)
    queries = spark.createDataFrame(
        [(1, "term0004 term0004 term0005", 10)],
        "query_id INT, query_text STRING, k LONG",
    )
    # 2 distinct terms; msm=3 can never be satisfied.
    assert msm_scores(corpus, queries, {1: 3}).count() == 0


def test_mpp_full_last_term_equals_exact_phrase(spark, tiny_corpus_pdf):
    """When the 'prefix' is a full term that no other dict term extends
    ('hotcommon'), match_phrase_prefix is frame-identical to the exact
    phrase: same pf (startswith == equality) and same weight (the prefix
    pseudo-term's union df == the term's df)."""
    from opensearch_jvector_plugin_spark.operators.phrase import (
        match_phrase_prefix_scores,
    )

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    # Find a bigram ending in hotcommon that actually occurs.
    row = next(
        t for t in tiny_corpus_pdf["text"]
        if "hotcommon" in tokenize_text(t)
        and tokenize_text(t).index("hotcommon") > 0
    )
    toks = tokenize_text(row)
    i = toks.index("hotcommon")
    text = f"{toks[i - 1]} hotcommon"
    qpdf = pd.DataFrame(
        [(0, text, 10)], columns=["query_id", "query_text", "k"]
    )
    mpp = (
        match_phrase_prefix_scores(corpus, qpdf)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ph = (
        phrase_scores(corpus, qpdf)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(mpp) > 0
    pd.testing.assert_frame_equal(mpp, ph, check_dtype=False)


def test_mpp_single_prefix_counts_prefix_tokens(spark, tiny_corpus_pdf):
    """A one-token query degenerates to the prefix pseudo-term: pf must
    equal the per-doc count of tokens starting with the prefix."""
    from opensearch_jvector_plugin_spark.operators.phrase import (
        match_phrase_prefix_scores,
    )

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    qpdf = pd.DataFrame(
        [(0, "hot", 10)], columns=["query_id", "query_text", "k"]
    )
    got = match_phrase_prefix_scores(corpus, qpdf).toPandas()
    docs_py = {
        int(d): sum(1 for t in tokenize_text(x) if t.startswith("hot"))
        for d, x in zip(tiny_corpus_pdf["doc_id"], tiny_corpus_pdf["text"])
    }
    want_docs = {d for d, c in docs_py.items() if c > 0}
    assert set(got["doc_id"].astype(int)) == want_docs and len(want_docs) > 0
    # Score recomputed from the python twin quantities must match.
    n = len(tiny_corpus_pdf)
    df_pseudo = len(want_docs)
    avgdl = float(
        np.mean([len(tokenize_text(t)) for t in tiny_corpus_pdf["text"]])
    )
    dls = {
        int(d): len(tokenize_text(t))
        for d, t in zip(tiny_corpus_pdf["doc_id"], tiny_corpus_pdf["text"])
    }
    for r in got.itertuples(index=False):
        want = bm25_idf_py(df_pseudo, float(n)) * bm25_tf_norm_py(
            docs_py[int(r.doc_id)], dls[int(r.doc_id)], avgdl
        )
        assert abs(r.score - want) < 1e-9


def test_mpp_unmatched_continuation_is_empty(spark, tiny_corpus_pdf):
    from opensearch_jvector_plugin_spark.operators.phrase import (
        match_phrase_prefix_scores,
    )

    corpus = spark.createDataFrame(tiny_corpus_pdf)
    qpdf = pd.DataFrame(
        [(0, "hotcommon zz", 10)], columns=["query_id", "query_text", "k"]
    )
    assert match_phrase_prefix_scores(corpus, qpdf).count() == 0


class TestSloppyPhrase:
    """N-term sloppy phrase (operators/phrase.sloppy_scores): minimal
    windows, extra+inversion distance, 1/(dist+1) weighting."""

    def _docs(self, spark):
        import pandas as pd

        return spark.createDataFrame(pd.DataFrame({
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [
                "alpha beta gamma",       # exact ordered trigram
                "beta alpha gamma",       # one inversion
                "alpha xx beta gamma",    # one-gap pair
                "alpha alpha beta",       # left-minimality case
                "gamma delta",            # missing terms
                "alpha beta alpha beta",  # overlapping occurrences
            ],
        }))

    def test_slop0_equals_phrase(self, spark):
        """slop=0 degenerates to the exact ordered phrase — frame-identical
        to phrase_scores on every doc (test-pins the VERDICT r5 contract)."""
        import pandas as pd

        from opensearch_jvector_plugin_spark.operators.phrase import (
            phrase_scores,
            sloppy_scores,
        )

        docs = self._docs(spark)
        sq = pd.DataFrame(
            {"query_id": [0, 1], "query_text": ["alpha beta", "beta gamma"],
             "slop": [0, 0]}
        )
        pq = pd.DataFrame(
            {"query_id": [0, 1], "query_text": ["alpha beta", "beta gamma"],
             "k": [10, 10]}
        )
        got = sloppy_scores(docs, sq).toPandas()
        want = phrase_scores(docs, pq).toPandas()
        key = ["query_id", "doc_id"]
        got = got.sort_values(key).reset_index(drop=True)
        want = want.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[key + ["score"]].round(9), want[key + ["score"]].round(9)
        )

    def test_inversion_and_gap_distances(self, spark):
        """Distance semantics: exact order -> dist 0 (weight 1), one
        inversion -> dist 1 (weight 1/2), one gap -> dist 1 (weight 1/2);
        the sloppy frequency feeds tf_norm, so weights order the scores."""
        import pandas as pd

        from opensearch_jvector_plugin_spark.operators.phrase import (
            sloppy_anchor_infos_col,
            sloppy_freq_from_infos,
        )
        from opensearch_jvector_plugin_spark.functions.tokenizer import (
            tokenize_col,
        )
        from pyspark.sql import functions as F

        docs = self._docs(spark)
        infos = sloppy_anchor_infos_col(
            tokenize_col("text"), ["alpha", "beta"], 2
        )
        pf = docs.select(
            "doc_id",
            sloppy_freq_from_infos(infos, 2).alias("pf"),
        ).toPandas().set_index("doc_id")["pf"]
        assert pf[0] == 1.0          # exact pair
        assert pf[1] == 0.5          # reversed -> dist 1
        assert pf[2] == 0.5          # one gap -> dist 1
        assert pf[3] == 1.0          # minimal window is [1,2] only
        assert pf[4] == 0.0          # missing term
        # Two exact occurrences (1.0 each) PLUS the middle reversed pair
        # "beta alpha" at dist 1 (0.5) — overlap counts, like phraseFreq.
        assert pf[5] == 2.5

    def test_duplicate_terms_rejected(self, spark):
        import pytest as _pytest

        from opensearch_jvector_plugin_spark.operators.phrase import (
            sloppy_anchor_infos_col,
        )
        from pyspark.sql import functions as F

        with _pytest.raises(ValueError, match="distinct"):
            sloppy_anchor_infos_col(F.col("toks"), ["data", "data"], 1)
