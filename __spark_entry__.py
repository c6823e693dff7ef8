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
    # Two oracles read persisted fixture parquets — make sure they exist
    # before the driver hands the SQL to DuckDB, regardless of whether the
    # Spark queries have run yet. Both fixtures are deterministic pandas
    # twins of what the Spark pipelines compute (see entry_queries).
    import glob
    import os

    from opensearch_jvector_plugin_spark.entry_queries import (
        IVF_PQ_M,
        IVF_REPLICAS,
        ORACLE_CENTROIDS_DIR,
        _corpus_auto_k,
        _transcript_parquet,
    )
    from opensearch_jvector_plugin_spark.operators.vector_index import (
        export_centroids_twin,
    )

    _transcript_parquet()
    sf_dirs = set(glob.glob("/root/testdata/sf*"))
    if os.environ.get("OJS_TEST_SF_DIR"):
        sf_dirs.add(os.environ["OJS_TEST_SF_DIR"])
    for d in sorted(sf_dirs):
        p = os.path.join(d, "embeddings.parquet")
        if os.path.exists(p):
            # Flagship serving twins at the k the scale-aware rule derives
            # for THIS corpus at the flagship replica count (round 5: the
            # rule is the default geometry, nothing is hardcoded)...
            k_flag = _corpus_auto_k(p, IVF_REPLICAS, IVF_PQ_M)
            for metric in ("cosine", "l2", "innerproduct"):
                export_centroids_twin(
                    p, ORACLE_CENTROIDS_DIR, n_centroids=k_flag,
                    metric=metric,
                )
            # ...and the replicas=1 twin for the ann_ivf_auto row.
            k_auto = _corpus_auto_k(p, 1)
            export_centroids_twin(
                p, ORACLE_CENTROIDS_DIR, n_centroids=k_auto, metric="cosine",
            )
    return dict(ORACLES)
