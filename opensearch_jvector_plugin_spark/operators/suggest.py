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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.tokenizer import tokenize_col


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
