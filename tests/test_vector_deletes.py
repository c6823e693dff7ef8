"""Vector-side tombstones (operators/vector_index.delete_vectors): every
serving path filters immediately, compaction purges physically and resets
the list, appends of tombstoned ids are rejected until undeleted."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_plugin_spark.operators.vector_index import (
    append_vectors,
    build_vector_index,
    compact_vector_index,
    delete_vectors,
    ivf_search,
    ivf_search_exact,
    ivf_search_radial,
    load_vector_index,
    undelete_vectors,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture()
def vidx(spark, tmp_path):
    d = str(tmp_path / "vdel")
    emb = spark.read.parquet(EMB)
    build_vector_index(emb, d, n_centroids=8, pq_m=8)
    return d, emb


def _queries(emb):
    return emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def test_deletes_filter_every_serving_path(spark, vidx):
    d, emb = vidx
    idx = load_vector_index(d)
    q = _queries(emb)
    before = ivf_search_exact(spark, idx, q, k=5, nprobe=4).toPandas()
    # Each query's rank-1 is itself; delete query 0's own vector.
    delete_vectors(d, [0])
    idx2 = load_vector_index(d)
    assert list(idx2.deleted_ids()) == [0]

    exact = ivf_search_exact(spark, idx2, q, k=5, nprobe=4).toPandas()
    assert 0 not in set(exact["vec_id"])
    assert len(exact[exact.query_id == 0]) == 5  # k fills from live
    # Survivors keep identical scores (pure pre-filter).
    col = [c for c in before.columns if c not in
           ("query_id", "rank", "vec_id")][0]
    b = before[before.vec_id != 0].set_index(["query_id", "vec_id"])[col]
    a = exact.set_index(["query_id", "vec_id"])[col]
    for key, v in a.items():
        if key in b.index:
            assert v == b[key]

    quant = ivf_search(
        spark, idx2, q.toPandas(), k=5, nprobe=4,
        approximate_threshold=None,
    ).toPandas()
    assert 0 not in set(quant["vec_id"])
    rad = ivf_search_radial(
        spark, idx2, q, min_score=0.0, nprobe=4
    ).toPandas()
    assert 0 not in set(rad["vec_id"])


def test_compact_purges_and_resets(spark, vidx):
    d, emb = vidx
    delete_vectors(d, [1, 2, 999999])  # unknown id inert
    m0 = load_vector_index(d).manifest
    n0 = int(m0["n_vecs"])
    m1 = compact_vector_index(spark, d)
    assert m1["deleted"] == []
    assert m1["n_vecs"] == n0 - 2  # the unknown id purged nothing
    assert m1["purged_total"] == 2
    idx = load_vector_index(d)
    rows = idx.bucket_scan(spark).where(
        F.col("vec_id").isin([1, 2])
    ).count()
    assert rows == 0
    # Re-compact: nothing pending, n_vecs stable.
    m2 = compact_vector_index(spark, d)
    assert m2["n_vecs"] == m1["n_vecs"]


def test_append_rejects_tombstoned_until_undeleted(spark, vidx):
    d, emb = vidx
    delete_vectors(d, [7])
    batch = emb.where(F.col("vec_id") == 7)
    with pytest.raises(ValueError, match="tombstoned"):
        append_vectors(batch, d, batch_id=100)
    undelete_vectors(d, [7])
    m = append_vectors(batch, d, batch_id=100)
    assert any(a["batch_id"] == 100 for a in m["appends"])
    with pytest.raises(ValueError, match="negative"):
        delete_vectors(d, [-4])
