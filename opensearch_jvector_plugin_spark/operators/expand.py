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
