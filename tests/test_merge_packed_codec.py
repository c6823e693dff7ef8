"""Merge with codec='auto' (bit-packed blocks where smaller): results must
stay rank-identical, and the merged index should be no larger than the
varint merge."""

from __future__ import annotations

import os

from opensearch_jvector_plugin_spark.operators.build import build_index
from opensearch_jvector_plugin_spark.operators.merge import merge_segments
from opensearch_jvector_plugin_spark.operators.query import load_index, search
from opensearch_jvector_plugin_spark.oracle import build_oracle_index, oracle_topk
from opensearch_jvector_plugin_spark.sources.transcripts import reference_queries
from tests.test_bruteforce_rank_identity import assert_rank_identical


def _du(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def test_auto_codec_merge_rank_identity(spark, small_corpus_pdf, tmp_path):
    corpus = spark.createDataFrame(small_corpus_pdf).repartition(4)
    vdir = str(tmp_path / "v")
    pdir = str(tmp_path / "p")
    build_index(corpus, vdir, seg_size=250)
    build_index(corpus, pdir, seg_size=250)

    m_v = merge_segments(spark, load_index(vdir), codec="varint")
    m_p = merge_segments(spark, load_index(pdir), codec="auto")
    assert m_v["merged_segments"][0]["n_postings"] == \
        m_p["merged_segments"][0]["n_postings"]

    queries = reference_queries(2000)
    want = oracle_topk(build_oracle_index(small_corpus_pdf), queries)
    got = search(spark, load_index(pdir), queries, use_merged=True).toPandas()
    assert_rank_identical(got, want)

    assert _du(os.path.join(pdir, "merged")) <= _du(os.path.join(vdir, "merged"))
