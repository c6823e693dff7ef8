"""The BM25 scoring contract.

The reference plugin delegates similarity entirely to Lucene (its own scoring
vocabulary is SpaceType.scoreTranslation for vectors — see
reference src/main/java/org/opensearch/knn/index/SpaceType.java:43-161), so
for the full-text engine the formula is frozen HERE, Lucene-faithful:

    idf(t)       = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(t,d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q,d)   = sum over query term occurrences of idf(t) * tf_norm(t,d)

with k1 = 1.2, b = 0.75, float64 throughout. Deliberate documented deviation
from Lucene: document length `dl` is exact (no 1-byte norm quantization) —
rank-identity is defined against the pure-Python oracle in `oracle.py`, which
uses the same exact dl.

Duplicate query terms: each occurrence contributes (equivalently the distinct
term's contribution is weighted by its query term frequency qtf), matching
Lucene BooleanQuery's per-occurrence summation.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_idf(df_col: Column, n_docs: Column | float) -> Column:
    """Spark column: Lucene idf. Inputs promoted to double."""
    n = F.lit(float(n_docs)) if not isinstance(n_docs, Column) else n_docs
    d = df_col.cast("double")
    return F.log(F.lit(1.0) + (n - d + F.lit(0.5)) / (d + F.lit(0.5)))


def bm25_tf_norm(tf_col: Column, dl_col: Column, avgdl: Column | float) -> Column:
    """Spark column: Lucene tf normalization with exact dl."""
    a = F.lit(float(avgdl)) if not isinstance(avgdl, Column) else avgdl
    tf = tf_col.cast("double")
    dl = dl_col.cast("double")
    return (tf * F.lit(BM25_K1 + 1.0)) / (
        tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl / a)
    )


def bm25_idf_py(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_norm_py(tf: float, dl: float, avgdl: float) -> float:
    return (tf * (BM25_K1 + 1.0)) / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))


def bm25_idf_sql(df_expr: str, n_expr: str) -> str:
    """ANSI-SQL fragment (DuckDB) for the same idf."""
    return f"ln(1.0 + ({n_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5))"


def bm25_tf_norm_sql(tf_expr: str, dl_expr: str, avgdl_expr: str) -> str:
    return (
        f"(({tf_expr}) * {BM25_K1 + 1.0}) / "
        f"(({tf_expr}) + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ({dl_expr}) / ({avgdl_expr})))"
    )
