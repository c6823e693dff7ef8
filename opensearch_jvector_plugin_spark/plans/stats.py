"""Corpus statistics — the engine's "trained state".

The reference computes quantization training state once, caches it, and
broadcasts it to queries (QuantizationStateCache wired at
plugin/JVectorKNNPlugin.java:171; reservoir-sampled training at
quantization/quantizer/OneBitScalarQuantizer.java:61-65). Our analog is the
global (N, avgdl) pair plus the per-term (df, ctf) table: computed once per
index build with a single map-side-combinable groupBy, persisted into the
index manifest, broadcast into query jobs.

Everything here is pure DataFrame API: Catalyst handles partial aggregation,
column pruning, and pushdown.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import tokenize_col


def postings_df(
    corpus: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf, dl) — the flat posting tuples.

    tokenize (JVM regexp, codegen'd) -> explode -> groupBy(doc,term,dl).count.
    The groupBy's partial aggregation combines duplicate terms within a doc
    map-side, so the shuffle carries one row per (doc, term), not per token.
    """
    toks = corpus.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        tokenize_col(text_col).alias("_toks"),
    ).select(
        "doc_id",
        F.size("_toks").cast("int").alias("dl"),
        F.explode("_toks").alias("term"),
    )
    return toks.groupBy("doc_id", "dl", "term").agg(
        F.count("*").cast("int").alias("tf")
    )


@dataclass
class CorpusStats:
    n_docs: int
    avgdl: float


def corpus_stats(corpus: DataFrame, text_col: str = "text") -> CorpusStats:
    """Global N and exact average document length (float64)."""
    row = corpus.select(
        F.count("*").alias("n"),
        F.avg(F.size(tokenize_col(text_col)).cast("double")).alias("avgdl"),
    ).collect()[0]
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"] or 0.0))


def term_stats(postings: DataFrame) -> DataFrame:
    """(term, df, ctf, max_tf) — global term statistics for BM25 idf and
    block-max planning. One shuffle, map-side combined."""
    return postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("ctf"),
        F.max("tf").cast("int").alias("max_tf"),
    )
