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
        IVF_CENTROIDS,
        ORACLE_CENTROIDS_DIR,
        _transcript_parquet,
    )
    from opensearch_jvector_plugin_spark.operators.vector_index import (
        export_centroids_twin,
    )

    _transcript_parquet()
    sf_dirs = set(glob.glob("/root/testdata/sf*"))
    if os.environ.get("OJS_TEST_SF_DIR"):
        sf_dirs.add(os.environ["OJS_TEST_SF_DIR"])
    import pyarrow.parquet as pq

    from opensearch_jvector_plugin_spark.operators.vector_index import (
        auto_n_centroids,
    )

    for d in sorted(sf_dirs):
        p = os.path.join(d, "embeddings.parquet")
        if os.path.exists(p):
            for metric in ("cosine", "l2", "innerproduct"):
                export_centroids_twin(
                    p, ORACLE_CENTROIDS_DIR, n_centroids=IVF_CENTROIDS,
                    metric=metric,
                )
            # ann_ivf_auto's oracle selects the twin at the k the
            # scale-aware rule derives for this corpus (round 4).
            t = pq.read_table(p, columns=["embedding"])
            k_auto = auto_n_centroids(t.num_rows, len(t.column("embedding")[0]))
            export_centroids_twin(
                p, ORACLE_CENTROIDS_DIR, n_centroids=k_auto, metric="cosine",
            )
    return dict(ORACLES)
