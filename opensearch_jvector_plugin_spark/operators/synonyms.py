"""Query-time synonym expansion with Lucene SynonymQuery semantics.

OpenSearch's `synonym_graph` token filter at query time rewrites a term
with synonyms into Lucene's SynonymQuery, which scores all members as ONE
pseudo-term with BLENDED statistics (SynonymQuery's docs: "scores as if
the terms were one"): document frequency = max over the members' df, and
per-document term frequency = sum of the members' tf. This preserves two
properties a naive OR misses: a common synonym cannot inflate idf (max-df
is the conservative blend), and a doc matching two synonyms is one strong
match, not two weak ones.

Plan (one corpus scan):
- query terms expand through the (term, member) synonym table — both
  sides tiny, broadcast;
- blended df = max member df, joined query-side (hit-sized);
- postings join the broadcast expansion on member; per (query, term, doc)
  the member tfs SUM (dl is per-doc constant — max() picks it), then the
  standard BM25 contribution and the per-query score sum.

The tokenizer stays frozen (synonyms are a QUERY-time rewrite, not an
analysis-chain change — index bytes are untouched), so every indexed and
declarative scorer still agrees on the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bm25 import bm25_idf, bm25_tf_norm
from ..plans.stats import CorpusStats, corpus_stats, postings_df
from .score import query_terms_df


def expand_synonyms(qterms: DataFrame, synonyms: DataFrame) -> DataFrame:
    """(query_id, term, member, qtf): each query term expands to its
    synonym-group members plus itself (identity rows are implicit — the
    synonym table needs only the non-trivial pairs)."""
    syn = synonyms.select("term", "member")
    identity = qterms.select("term").distinct().select(
        "term", F.col("term").alias("member")
    )
    groups = identity.unionByName(syn).distinct()
    return qterms.join(groups, "term").select(
        "query_id", "term", "member", "qtf"
    )


def compile_synonym_expansion(
    queries_pdf, synonyms: list[tuple[str, str]], term_dfs, n_docs: int
):
    """Driver-side twin of expand_synonyms + the blended-df weighting:
    rows (query_id, term, member, w) where members = {term} ∪ its synonym
    group, df_blend = max member df (absent members 0), and
    w = qtf * idf(df_blend) — float-identical to the Column pipeline
    (same left-assoc idf arithmetic, bm25_idf_py ≡ bm25_idf). Query sets
    and synonym tables are bounded by contract, so this is the
    `_query_weights` compile discipline applied to the synonym rewrite —
    it removes the per-call distinct/union/join/groupBy broadcast subtree
    (round 7; measured ~0.8s of a 2.6s call at sf0.1)."""
    from collections import Counter

    from ..functions.bm25 import bm25_idf_py
    from ..functions.tokenizer import tokenize_text

    groups: dict[str, set[str]] = {}
    for t, m in synonyms:
        groups.setdefault(t, set()).add(m)
    rows = []
    for r in queries_pdf.itertuples(index=False):
        qid = int(r.query_id)
        for term, qtf in Counter(tokenize_text(r.query_text)).items():
            members = sorted({term} | groups.get(term, set()))
            df_blend = max(int(term_dfs.get(m, 0)) for m in members)
            w = float(qtf) * bm25_idf_py(df_blend, n_docs)
            for m in members:
                rows.append((qid, term, m, w))
    return rows


def synonym_scores(
    corpus: DataFrame,
    queries: DataFrame,
    synonyms: DataFrame,
    stats: CorpusStats | None = None,
    postings: DataFrame | None = None,
    term_df: DataFrame | None = None,
    exp_terms: DataFrame | None = None,
) -> DataFrame:
    """Exact BM25 with SynonymQuery blending: (query_id, doc_id, score).

    `synonyms`: (term STRING, member STRING) non-trivial pairs (directed:
    a query term `term` also matches `member`). Pass persisted index
    state (postings/term_df/stats) to serve without rescanning the corpus,
    exactly like score_all. `exp_terms`: optional precompiled weighted
    expansion (query_id, term, member, w) from
    compile_synonym_expansion — skips the declarative expansion/blending
    subtree entirely."""
    derived = postings is None
    if postings is None:
        postings = postings_df(corpus)
    if stats is None:
        stats = corpus_stats(corpus)
    persisted = None
    if term_df is None and exp_terms is None:
        if derived:
            postings = persisted = postings.persist()
        term_df = postings.groupBy("term").agg(
            F.count("*").cast("long").alias("df")
        )

    if exp_terms is None:
        expansion = expand_synonyms(query_terms_df(queries), synonyms)
        # Blended df: max over the group's member dfs (absent members df=0).
        member_df = term_df.select(F.col("term").alias("member"), "df")
        blended = (
            expansion.join(member_df, "member", "left")
            .groupBy("query_id", "term")
            .agg(
                F.max(F.coalesce(F.col("df"), F.lit(0))).alias("df_blend"),
                F.first("qtf").alias("qtf"),
            )
            .withColumn(
                "idf", bm25_idf(F.col("df_blend"), float(stats.n_docs))
            )
            .select(
                "query_id", "term", (F.col("qtf") * F.col("idf")).alias("w")
            )
        )
        # Per-(query, term, doc): sum member tfs (SynonymQuery's single
        # pseudo-term), THEN one tf_norm — not a per-member sum of norms.
        exp_terms = expansion.select("query_id", "term", "member").join(
            F.broadcast(blended), ["query_id", "term"]
        )
    matches = (
        postings.join(
            F.broadcast(exp_terms),
            postings["term"] == exp_terms["member"],
        )
        .select(
            "query_id",
            exp_terms["term"].alias("qterm"),
            "doc_id",
            "tf",
            "dl",
            "w",
        )
        .groupBy("query_id", "qterm", "doc_id")
        .agg(
            F.sum("tf").alias("tf_blend"),
            F.max("dl").alias("dl"),
            F.first("w").alias("w"),
        )
    )
    scored = matches.select(
        "query_id",
        "doc_id",
        (
            F.col("w")
            * bm25_tf_norm(F.col("tf_blend"), F.col("dl"), stats.avgdl)
        ).alias("contrib"),
    )
    out = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score")
    )
    if persisted is not None:
        out._ojs_persisted = persisted
    return out
