"""Vector space types as Catalyst column expressions.

Spark twins of the reference's SpaceType registry
(/root/reference/src/main/java/org/opensearch/knn/index/SpaceType.java:43-160:
l2, cosinesimil, l1, linf, innerproduct, hamming) and its scoring kernels
(KNNScoringUtil.java:98-100 l2Squared, :251 innerProduct, :120 l1Norm,
:142 lInfNorm).

Every expression is float64 with left-fold summation in array order, so the
DuckDB oracle fragments in entry_queries.py reproduce the values
bit-for-bit. Score translations mirror SpaceType.scoreTranslation — Lucene's
"bigger is better" contract over raw distances.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.dedup import cosine_col  # re-export: cosine lives with dedup

__all__ = [
    "cosine_col",
    "l2_squared_col",
    "l1_col",
    "linf_col",
    "inner_product_col",
    "hamming_col",
    "score_from_distance",
    "SPACE_ORDERING",
]


def _fold(arr: Column, init: float, merge) -> Column:
    return F.aggregate(arr, F.lit(init), merge)


def _pairs_double(a: Column, b: Column, fn) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return F.zip_with(ad, bd, fn)


def l2_squared_col(a: Column, b: Column) -> Column:
    """Squared euclidean distance (KNNScoringUtil.l2Squared)."""
    return _fold(
        _pairs_double(a, b, lambda x, y: (x - y) * (x - y)),
        0.0,
        lambda acc, x: acc + x,
    )


def l1_col(a: Column, b: Column) -> Column:
    """Manhattan distance (KNNScoringUtil.l1Norm)."""
    return _fold(
        _pairs_double(a, b, lambda x, y: F.abs(x - y)),
        0.0,
        lambda acc, x: acc + x,
    )


def linf_col(a: Column, b: Column) -> Column:
    """Chebyshev distance (KNNScoringUtil.lInfNorm)."""
    return _fold(
        _pairs_double(a, b, lambda x, y: F.abs(x - y)),
        0.0,
        lambda acc, x: F.greatest(acc, x),
    )


def inner_product_col(a: Column, b: Column) -> Column:
    """Raw dot product (KNNScoringUtil.innerProduct)."""
    return _fold(
        _pairs_double(a, b, lambda x, y: x * y), 0.0, lambda acc, x: acc + x
    )


def hamming_col(a: Column, b: Column) -> Column:
    """Bit-level hamming distance between two int64 fingerprints
    (KNNScoringUtil.calculateHammingBit)."""
    return F.bit_count(a.bitwiseXOR(b)).cast("int")


# metric -> (distance_is_ascending_better, score translation). Translations
# follow SpaceType.scoreTranslation: l2/l1/linf 1/(1+d); innerproduct
# d >= 0 ? d + 1 : 1/(1 - d); cosine (1 + cos)/2 (Lucene convention);
# hamming 1/(1+d).
SPACE_ORDERING = {
    "cosine": False,       # higher cosine = closer
    "innerproduct": False, # higher dot = closer
    "l2": True,            # lower distance = closer
    "l1": True,
    "linf": True,
    "hamming": True,
}


def score_from_distance(metric: str, d: Column) -> Column:
    """SpaceType.scoreTranslation: raw distance -> monotone descending score."""
    if metric in ("l2", "l1", "linf", "hamming"):
        return F.lit(1.0) / (F.lit(1.0) + d)
    if metric == "innerproduct":
        return F.when(d >= 0, d + 1.0).otherwise(F.lit(1.0) / (F.lit(1.0) - d))
    if metric == "cosine":
        return (F.lit(1.0) + d) / F.lit(2.0)
    raise ValueError(f"unknown space type {metric!r}")
