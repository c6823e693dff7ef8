"""Field collapsing and function_score — top-level search result shaping.

OpenSearch exposes both on every search the reference plugin's query types
participate in (the KNN/BM25 query produces the scored stream; collapse and
function_score are applied by the core search phase over doc values — the
same field-data surface KNNVectorIndexFieldData.java:1-60 plugs the
reference's vector fields into):

- **collapse**: keep only the best-scoring hit per distinct value of a
  doc-values field (e.g. one turn per conversation), then apply the normal
  top-k cut to the collapsed stream.
- **function_score / field_value_factor**: rescale every hit's relevance by
  a function of a numeric doc value — `modifier(factor * value)` combined
  with the query score via `boost_mode` — BEFORE ranking, so the re-rank
  can surface different documents than the raw query order.

Both consume the full scored relation (query_id, doc_id, score), not a
pre-cut hit set: collapsing/boosting after the cut would be wrong whenever
the survivor set differs from the raw top-k (the reason OpenSearch applies
them in the query phase).

Plan shape: the doc-value column arrives via an equi-join on doc_id between
the match-sized scored relation and the attribute projection — the Spark
analog of a doc-values lookup; both sides key on doc_id, so at scale this
co-partitions (and AQE broadcasts the attr side when a filter makes it
small). Everything downstream (group-best window, re-rank window) runs on
match-sized data with per-query partitioning.

Determinism contract (engine-wide): every ordering decision happens on
round-6 scores with doc_id-asc tie-break, so Spark and the SQL oracle rank
identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def collapse_best_hits(
    scored: DataFrame, attrs: DataFrame, field: str
) -> DataFrame:
    """(query_id, doc_id, score, <field>): the best hit per (query, field
    value) — round-6 score desc, doc_id asc within each group. NULL keys
    form a single bucket (window-partition semantics, identical in Spark
    and the SQL oracle). attrs: (doc_id, <field>) doc-values projection."""
    s = scored.join(attrs.select("doc_id", field), "doc_id")
    w = W.partitionBy("query_id", field).orderBy(
        F.round("score", 6).desc(), F.asc("doc_id")
    )
    return (
        s.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("query_id", "doc_id", "score", field)
    )


def _modifier(name: str, x: Column) -> Column:
    """OpenSearch field_value_factor modifiers (FieldValueFactorFunction
    semantics; log* are base-10, ln* natural)."""
    mods = {
        "none": lambda v: v,
        "log1p": lambda v: F.log10(v + F.lit(1.0)),
        "log2p": lambda v: F.log10(v + F.lit(2.0)),
        "ln1p": lambda v: F.log(v + F.lit(1.0)),
        "ln2p": lambda v: F.log(v + F.lit(2.0)),
        "square": lambda v: v * v,
        "sqrt": lambda v: F.sqrt(v),
        "reciprocal": lambda v: F.lit(1.0) / v,
    }
    if name not in mods:
        raise ValueError(f"unknown field_value_factor modifier: {name!r}")
    return mods[name](x)


def field_value_factor(
    scored: DataFrame,
    attrs: DataFrame,
    field: str,
    factor: float = 1.0,
    modifier: str = "none",
    missing: float | None = None,
    boost_mode: str = "multiply",
) -> DataFrame:
    """(query_id, doc_id, score): query score combined with
    modifier(factor * doc value). A NULL doc value uses `missing`; with no
    `missing` the hit is dropped (OpenSearch errors on missing values —
    dropping is the closed-form analog for a relation). boost_mode:
    'multiply' (default) or 'sum'."""
    val = F.col(field).cast("double")
    if missing is not None:
        val = F.coalesce(val, F.lit(float(missing)))
    fv = _modifier(modifier, F.lit(float(factor)) * val)
    if boost_mode == "multiply":
        combined = F.col("score") * fv
    elif boost_mode == "sum":
        combined = F.col("score") + fv
    else:
        raise ValueError(f"unsupported boost_mode: {boost_mode!r}")
    s = scored.join(attrs.select("doc_id", field), "doc_id")
    return s.where(fv.isNotNull()).select(
        "query_id", "doc_id", combined.alias("score")
    )


def decay_score(
    scored: DataFrame,
    attrs: DataFrame,
    field: str,
    fn: str,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
    boost_mode: str = "multiply",
) -> DataFrame:
    """function_score decay functions (OpenSearch DecayFunctionBuilder,
    numeric-field form): (query_id, doc_id, score) with the query score
    combined with

        dist   = max(0, |value - origin| - offset)
        gauss  : exp(-dist^2 / (2*sigma^2)),  sigma^2 = -scale^2 / (2*ln(decay))
        exp    : exp(ln(decay) / scale * dist)
        linear : max(0, (s - dist) / s),      s = scale / (1 - decay)

    so the function is exactly `decay` at distance `scale` past the offset.
    A NULL doc value yields function value 1.0 (the OpenSearch contract for
    documents missing the field). All three shapes are closed-form Catalyst
    expressions on the doc-values join — the same match-sized plan as
    field_value_factor, no UDF."""
    if scale <= 0:
        raise ValueError(f"decay scale must be positive: {scale}")
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0, 1): {decay}")
    import math

    val = F.col(field).cast("double")
    dist = F.greatest(
        F.lit(0.0), F.abs(val - F.lit(float(origin))) - F.lit(float(offset))
    )
    if fn == "gauss":
        sigma_sq = -(scale * scale) / (2.0 * math.log(decay))
        d = F.exp(-(dist * dist) / F.lit(2.0 * sigma_sq))
    elif fn == "exp":
        d = F.exp(F.lit(math.log(decay) / scale) * dist)
    elif fn == "linear":
        s = scale / (1.0 - decay)
        d = F.greatest(F.lit(0.0), (F.lit(s) - dist) / F.lit(s))
    else:
        raise ValueError(f"unknown decay function: {fn!r}")
    d = F.when(val.isNull(), F.lit(1.0)).otherwise(d)
    if boost_mode == "multiply":
        combined = F.col("score") * d
    elif boost_mode == "sum":
        combined = F.col("score") + d
    else:
        raise ValueError(f"unsupported boost_mode: {boost_mode!r}")
    return scored.join(attrs.select("doc_id", field), "doc_id").select(
        "query_id", "doc_id", combined.alias("score")
    )
