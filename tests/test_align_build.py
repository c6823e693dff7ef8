"""Shuffle-free build path (align_partitions=True): each input partition
becomes a segment. Even with arbitrary (non-range) partitioning — i.e.
overlapping segment doc ranges — query results stay rank-identical, and a
merge re-sorts by docID so the merged index is crc-identical to a
single-segment build."""

from __future__ import annotations

from opensearch_jvector_plugin_spark.operators.build import (
    build_index,
    committed_segments,
)
from opensearch_jvector_plugin_spark.operators.merge import merge_segments
from opensearch_jvector_plugin_spark.operators.query import load_index, search
from opensearch_jvector_plugin_spark.oracle import build_oracle_index, oracle_topk
from opensearch_jvector_plugin_spark.sources.transcripts import reference_queries
from tests.test_bruteforce_rank_identity import assert_rank_identical


def test_align_build_rank_identity_and_merge_crc(spark, small_corpus_pdf, tmp_path):
    # Round-robin repartition -> interleaved doc ranges across partitions.
    corpus = spark.createDataFrame(small_corpus_pdf).repartition(6)
    adir = str(tmp_path / "aligned")
    onedir = str(tmp_path / "one")
    build_index(corpus, adir, align_partitions=True)
    build_index(corpus, onedir, seg_size=10**9)

    m = committed_segments(adir)
    assert len(m) == 6
    assert sum(x["n_docs"] for x in m.values()) == 2000

    queries = reference_queries(2000)
    want = oracle_topk(build_oracle_index(small_corpus_pdf), queries)
    got = search(spark, load_index(adir), queries).toPandas()
    assert_rank_identical(got, want)

    merged = merge_segments(spark, load_index(adir), fan_in=None)
    one_m = committed_segments(onedir)[0]
    assert merged["merged_segments"][0]["crc"] == one_m["crc"]
    assert merged["merged_segments"][0]["n_postings"] == one_m["n_postings"]

    got_m = search(spark, load_index(adir), queries, use_merged=True).toPandas()
    assert_rank_identical(got_m, want)
