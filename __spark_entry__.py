"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: BM25 top-k served from a freshly built segment
               index over /root/testdata/sf0.001 documents.
queries()    — every implemented operator (SURVEY.md §2 + training-data
               pipeline ops), one callable per name.
oracle_sql() — the DuckDB-equivalent ANSI SQL for each query.

Implementation lives in opensearch_jvector_plugin_spark.entry_queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from opensearch_jvector_plugin_spark.entry_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["bm25_topk_indexed"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
