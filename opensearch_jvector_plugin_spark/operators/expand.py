"""Hit expansion: from matched turns to whole conversations.

The nested-document expansion of the reference (ExpandNestedDocsQuery /
GroupedNestedDocIdSetIterator — expand child hits to sibling docs of the
same parent) mapped to transcripts: a BM25 hit is a TURN; consumers usually
want the surrounding CONVERSATION. Relationally this is a semi-join from
hits to the corpus on conv_id — broadcast when the hit set is small (the
common case: hits <= queries x k), sort-merge otherwise (Catalyst picks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_hits_to_conversations(
    hits: DataFrame,
    corpus: DataFrame,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """All turns of every conversation containing a hit turn.

    hits:   any DataFrame with a doc_id column (e.g. search() output)
    corpus: the transcript table WITH assigned doc_id
    Returns corpus rows (plus a hit_conv marker join key) ordered by
    (conv_id, turn_idx) downstream if the caller sorts.
    """
    hit_ids = hits.select(F.col(doc_id_col).alias("_hit_doc_id")).distinct()
    hit_convs = (
        corpus.join(
            F.broadcast(hit_ids),
            corpus[doc_id_col] == F.col("_hit_doc_id"),
            "left_semi",
        )
        .select("conv_id")
        .distinct()
    )
    return corpus.join(F.broadcast(hit_convs), "conv_id", "left_semi")


def highlight_hits(
    hits: DataFrame,
    corpus: DataFrame,
    qterms: DataFrame,
    window: int = 3,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    toksed: DataFrame | None = None,
) -> DataFrame:
    """Snippet extraction for search hits — the highlight phase analog.

    The reference returns stored fields alongside scores
    (KNN80DocValuesConsumer rides doc values through the codec) and leaves
    highlighting to OpenSearch's fetch phase, which re-analyzes the stored
    text of the HITS only. Same discipline here: the corpus scan
    broadcast-joins the (small) hit set first, so tokenization and position
    search run on |hits| rows, never the corpus.

    hits:   (query_id, rank, doc_id) — e.g. a ranked top-k output
    qterms: (query_id, term) — the per-query term table
    toksed: optional pre-tokenized corpus (doc_id, toks) — the term-vectors
            sidecar; when given the corpus text is not re-tokenized.
    Returns (query_id, rank, doc_id, first_pos, snippet): `first_pos` is
    the 1-based token position of the first occurrence of ANY query term
    (min over terms; every scored hit contains at least one), `snippet`
    the space-joined tokens within `window` positions of it.
    """
    from ..functions.tokenizer import tokenize_col

    if toksed is None:
        toksed = corpus.select(
            F.col(doc_id_col).cast("long").alias("doc_id"),
            tokenize_col(text_col).alias("toks"),
        )
    else:
        toksed = toksed.select("doc_id", "toks")
    hit_terms = hits.select("query_id", "rank", "doc_id").join(
        qterms.select("query_id", "term"), "query_id"
    )
    cand = toksed.join(F.broadcast(hit_terms), "doc_id")
    pos = cand.select(
        "query_id",
        "rank",
        "doc_id",
        "toks",
        F.array_position("toks", F.col("term")).alias("p"),
    )
    agged = pos.groupBy("query_id", "rank", "doc_id").agg(
        F.min(F.when(F.col("p") > 0, F.col("p"))).cast("long").alias(
            "first_pos"
        ),
        # All rows in a (query, doc) group carry the SAME doc's tokens.
        F.first("toks").alias("toks"),
    )
    start = F.greatest(F.col("first_pos") - F.lit(window), F.lit(1))
    end = F.least(F.col("first_pos") + F.lit(window), F.size("toks"))
    return agged.select(
        "query_id",
        "rank",
        "doc_id",
        "first_pos",
        F.concat_ws(
            " ", F.slice("toks", start, end - start + F.lit(1))
        ).alias("snippet"),
    )
