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
