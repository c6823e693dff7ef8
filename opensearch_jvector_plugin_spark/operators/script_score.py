"""User-pluggable scorer surface — the script-score engine analog.

The reference registers a scoring script engine
(`plugin/script/KNNScoringScriptEngine.java:50`,
`JVectorKNNPlugin.java:249-252`): a `script_score` query scores EVERY
filtered document with a user-chosen function over doc values — the
exact-scan fallback (`plugin/script/KNNScoringSpace.java:75-83`), with a
fixed registry of built-in space functions
(`plugin/script/KNNScoringUtil.java:98-409`: l2Squared, cosinesimil,
innerProduct, l1Norm, lInfNorm, hammingBit).

Spark-first translation (SURVEY §2.9 extension point (a)):

- **Built-in spaces stay JVM-side**: SCRIPT_SPACES maps the reference's
  script-function names to the fold-exact Column builders in
  functions/spaces.py — whole-stage-codegen'd, zero Python, and
  bit-identical to the DuckDB oracle folds.
- **User scorers are Arrow-batched**: `script_score(candidates, scorer)`
  accepts any Python callable `pandas.DataFrame -> array-like of float64`
  and applies it via mapInPandas — the documented plug-in point for
  scoring logic the built-in registry lacks. Never per-row Python.
- `knn_script_score` is entry point D (SURVEY §3.4): candidates =
  (filtered docs) x (queries), scored exhaustively, window-ranked — the
  correctness-oracle path, and the serving fallback when no index fits
  the scoring function.

Determinism note: a user scorer that sums vector components should fold
dimension-at-a-time in array order (the `fold_*` helpers in
vector_index.py / the Column folds in spaces.py) if its output must be
bit-identical to a SQL twin; free-order numpy reductions differ in the
last ulp and can flip round-6 ties.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.spaces import (
    cosine_col,
    hamming_col,
    inner_product_col,
    l1_col,
    l2_squared_col,
    linf_col,
)

# KNNScoringUtil.java script-function registry, by the reference's names.
SCRIPT_SPACES: dict[str, Callable[[Column, Column], Column]] = {
    "l2Squared": l2_squared_col,
    "cosinesimil": cosine_col,
    "innerProduct": inner_product_col,
    "l1Norm": l1_col,
    "lInfNorm": linf_col,
    "hammingBit": hamming_col,
}

# Spaces where smaller = closer (ranked ascending), per the reference's
# scoreTranslation direction.
_ASCENDING_SPACES = {"l2Squared", "l1Norm", "lInfNorm", "hammingBit"}

SCORE_SCHEMA = "query_id INT, doc_id LONG, score DOUBLE"


def script_score(
    candidates: DataFrame,
    scorer: Column | Callable[[pd.DataFrame], "np.ndarray | pd.Series"],
) -> DataFrame:
    """Score an arbitrary (query_id, doc_id, ...) candidate relation with
    a pluggable scorer; returns (query_id, doc_id, score).

    scorer as a Column: evaluated JVM-side (use SCRIPT_SPACES builders or
    any Catalyst expression over the candidate columns) — the fast path.
    scorer as a callable: applied to Arrow-sized pandas batches of the
    candidate rows (all columns visible), must return one float per row —
    the user plug-in point."""
    if isinstance(scorer, Column):
        return candidates.select(
            F.col("query_id").cast("int").alias("query_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            scorer.cast("double").alias("score"),
        )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            s = np.asarray(scorer(pdf), dtype=np.float64)
            if s.shape != (len(pdf),):
                raise ValueError(
                    f"script scorer must return one float per row: got "
                    f"shape {s.shape} for {len(pdf)} rows"
                )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(np.int32),
                    "doc_id": pdf["doc_id"].to_numpy(np.int64),
                    "score": s,
                }
            )

    return candidates.mapInPandas(kernel, SCORE_SCHEMA)


def knn_script_score(
    docs: DataFrame,
    queries: DataFrame,
    space: str,
    k: int,
    doc_vec_col: str = "embedding",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
) -> DataFrame:
    """Entry point D (SURVEY §3.4): `script_score` with a built-in space —
    every doc scored against every query via the registered fold-exact
    Column, round-6 ranked (ascending for distance-like spaces), top-k.
    Returns (query_id, rank, doc_id, score).

    The doc side never shuffles: the (small by contract) query set is
    broadcast into a crossJoin and the only exchange is the rank window's.
    """
    if space not in SCRIPT_SPACES:
        raise ValueError(
            f"unknown script space {space!r}; "
            f"registered: {sorted(SCRIPT_SPACES)}"
        )
    if space == "hammingBit":
        raise ValueError(
            "hammingBit scores int64 fingerprints, not float vectors "
            "(KNNScoringUtil.calculateHammingBit) — use script_score() "
            "over fingerprint columns directly"
        )
    expr = SCRIPT_SPACES[space](F.col("_v"), F.col("_qv"))
    cand = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(doc_vec_col).alias("_v"),
    ).crossJoin(
        F.broadcast(
            queries.select(
                F.col("query_id").cast("int").alias("query_id"),
                F.col(query_vec_col).alias("_qv"),
            )
        )
    )
    scored = script_score(cand, expr)
    s6 = F.round(F.col("score"), 6)
    order = s6.asc() if space in _ASCENDING_SPACES else s6.desc()
    w = W.partitionBy("query_id").orderBy(order, F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select("query_id", "rank", "doc_id", s6.alias("score"))
    )
