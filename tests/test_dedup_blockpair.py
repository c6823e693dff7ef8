"""embedding_near_dup_pairs: distributed block-pair GEMM must be EXACT
(all pairs >= threshold, across block boundaries) and must never
materialize the embedding table on the driver."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import DataFrame

from opensearch_jvector_plugin_spark.operators.dedup import (
    embedding_near_dup_pairs,
)

SF_DIR = os.environ.get("OJS_TEST_SF_DIR", "/root/testdata/sf0.001")
EMB = os.path.join(SF_DIR, "embeddings.parquet")
T = 0.4


def reference_pairs() -> pd.DataFrame:
    pdf = pd.read_parquet(EMB)
    ids = pdf["vec_id"].to_numpy(np.int64)
    mat = np.asarray([np.asarray(v, np.float64) for v in pdf["embedding"]])
    matn = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = matn @ matn.T
    ia, ib = np.nonzero((sims >= T) & (ids[:, None] < ids[None, :]))
    return (
        pd.DataFrame(
            {"doc_a": ids[ia], "doc_b": ids[ib],
             "cosine": np.round(sims[ia, ib], 6)}
        )
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def run(spark, **kw) -> pd.DataFrame:
    emb = spark.read.parquet(EMB)
    rows = embedding_near_dup_pairs(emb, threshold=T, **kw).collect()
    return (
        pd.DataFrame(rows, columns=["doc_a", "doc_b", "cosine"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def test_exact_across_blocks(spark, tmp_path):
    """block_rows small enough to force many blocks: cross-block pairs must
    survive (the correctness property bucketed/LSH approaches give up)."""
    want = reference_pairs()
    assert len(want) > 0
    got = run(spark, block_rows=128, work_dir=str(tmp_path / "store"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_single_block_degenerate(spark, tmp_path):
    got = run(spark, block_rows=10_000, work_dir=str(tmp_path / "s2"))
    pd.testing.assert_frame_equal(got, reference_pairs(), check_dtype=False)


def _clustered_corpus(n_clusters=8, per=50, dim=32, seed=11):
    """Tight angular clusters: the corpus shape real near-dup data has
    (duplicates concentrate) and where the bucketed path's triangle
    pruning must bite."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    for c in range(n_clusters):
        pts = centers[c][None, :] + 0.05 * rng.normal(size=(per, dim))
        rows.append(pts)
    mat = np.concatenate(rows).astype(np.float32)
    ids = np.arange(len(mat), dtype=np.int64)
    return ids, mat


def test_bucketed_neardup_exact_and_pruned(spark, tmp_path):
    """embedding_near_dup_pairs_bucketed must return EXACTLY the brute-force
    pair set (triangle bound + ADC error bound are conservative), and on
    clustered data must actually prune bucket pairs (the read-amplification
    win it exists for)."""
    from opensearch_jvector_plugin_spark.operators.dedup import (
        embedding_near_dup_pairs_bucketed,
    )
    from opensearch_jvector_plugin_spark.operators.vector_index import (
        build_vector_index,
        load_vector_index,
    )

    ids, mat = _clustered_corpus()
    thr = 0.9
    matn = mat.astype(np.float64)
    matn /= np.linalg.norm(matn, axis=1)[:, None]
    sims = matn @ matn.T
    ia, ib = np.nonzero((sims >= thr) & (ids[:, None] < ids[None, :]))
    want = (
        pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    assert len(want) > 100  # clusters produce real near-dup mass

    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": [r.tolist() for r in mat]}),
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    d = str(tmp_path / "vidx")
    build_vector_index(emb, d, n_centroids=8)
    idx = load_vector_index(d)
    out = embedding_near_dup_pairs_bucketed(spark, idx, threshold=thr)
    kept, total = out._ojs_bucket_pairs
    assert kept < total, (kept, total)  # triangle pruning bites
    got = (
        out.select("doc_a", "doc_b").toPandas()
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bucketed_neardup_matches_blockpair_on_harness_data(spark, tmp_path):
    """On the harness embeddings at the bench threshold the bucketed path
    must agree with the exact block-pair path pair-for-pair (same oracle —
    the driver gate contract)."""
    from opensearch_jvector_plugin_spark.operators.dedup import (
        embedding_near_dup_pairs_bucketed,
    )
    from opensearch_jvector_plugin_spark.operators.vector_index import (
        build_vector_index,
        load_vector_index,
    )

    emb = spark.read.parquet(EMB)
    d = str(tmp_path / "vidx_h")
    build_vector_index(emb, d, n_centroids=16)
    idx = load_vector_index(d)
    got = (
        embedding_near_dup_pairs_bucketed(spark, idx, threshold=T)
        .toPandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, reference_pairs(), check_dtype=False)


def test_no_driver_collect_of_embeddings(spark, tmp_path, monkeypatch):
    """The old implementation did src.toPandas() — a driver OOM beyond
    ~10^7 vectors. Ban toPandas for the whole operator invocation."""
    def banned(self):
        raise AssertionError("driver-side toPandas() in near-dup path")

    monkeypatch.setattr(DataFrame, "toPandas", banned)
    emb = spark.read.parquet(EMB)
    out = embedding_near_dup_pairs(
        emb, threshold=T, block_rows=256, work_dir=str(tmp_path / "s3")
    )
    assert out.count() == len(reference_pairs())
