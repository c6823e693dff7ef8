"""Freeze a tiny committed index as a backward-compatibility fixture.

The reference ships restart/rolling-upgrade suites (qa/restart-upgrade,
qa/rolling-upgrade) that assert an index written by version N is served by
version N+1. Our analog: this script builds a small index ONCE and the
bytes are committed to git (tests/fixtures/bwc_index_v1); tests/test_bwc.py
then asserts the CURRENT reader serves those frozen bytes with pinned
results. If the codec/manifest format drifts without a version bump (and a
migration path), the test fails.

Run only when intentionally RE-freezing the fixture after a deliberate,
version-bumped format change:

    python scripts/make_bwc_fixture.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURE_DIR = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "bwc_index_v1"
)

# Frozen corpus: 10 docs, 3 segments at seg_size=4. Chosen so the pinned
# query exercises multi-term scoring, an OOV term, and cross-segment merge
# of partial top-k.
BWC_DOCS = [
    (0, "spark shuffle join window"),
    (1, "merge segment posting varint"),
    (2, "spark spark spark index"),
    (3, "query kernel heap topk"),
    (4, "join broadcast hash join"),
    (5, "window rank dense row"),
    (6, "posting delta block max"),
    (7, "spark join merge window"),
    (8, "tokenizer fold unicode kelvin"),
    (9, "checksum footer sentinel commit"),
]

BWC_QUERIES = [(0, "spark join", 5), (1, "posting merge", 5)]


VEC_FIXTURE_DIR = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "bwc_vindex_v1"
)


def bwc_vectors():
    """Deterministic 40 x dim-8 corpus for the frozen vector index."""
    import numpy as np

    rng = np.random.default_rng(123)
    mat = rng.normal(size=(40, 8)).astype("float32")
    return [(int(i), [float(x) for x in mat[i]]) for i in range(40)]


def main() -> None:
    from opensearch_jvector_plugin_spark.operators.build import build_index
    from opensearch_jvector_plugin_spark.session import get_spark

    spark = get_spark(cores="4", app_name="bwc-fixture")
    out = os.path.abspath(FIXTURE_DIR)
    if os.path.exists(out):
        shutil.rmtree(out)
    corpus = spark.createDataFrame(BWC_DOCS, "doc_id LONG, text STRING")
    stats = build_index(corpus, out, seg_size=4)
    print("built fixture:", out, stats)

    # Vector-index fixture: full current format (replicas, int8 SQ, PQ).
    from opensearch_jvector_plugin_spark.operators.vector_index import (
        build_vector_index,
        ivf_search_exact,
        load_vector_index,
    )

    vout = os.path.abspath(VEC_FIXTURE_DIR)
    if os.path.exists(vout):
        shutil.rmtree(vout)
    emb = spark.createDataFrame(
        bwc_vectors(), "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    vman = build_vector_index(emb, vout, n_centroids=4, n_replicas=2,
                              pq_m=4)
    print("built vector fixture:", vout, vman)
    vq = emb.where("vec_id < 2").selectExpr(
        "cast(vec_id as int) as query_id", "embedding as query_vec"
    )
    vres = (
        ivf_search_exact(spark, load_vector_index(vout), vq, k=5, nprobe=2)
        .toPandas().sort_values(["query_id", "rank"])
    )
    for r in vres.itertuples(index=False):
        print(f"    ({r.query_id}, {r.rank}, {r.vec_id}, "
              f"{round(r.cosine, 6)}),")

    # Print the pinned expectations for test_bwc.py.
    import pandas as pd

    from opensearch_jvector_plugin_spark.operators.query import (
        load_index,
        search,
    )

    idx = load_index(out)
    qpdf = pd.DataFrame(BWC_QUERIES, columns=["query_id", "query_text", "k"])
    res = (
        search(spark, idx, qpdf)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    for r in res.itertuples(index=False):
        print(
            f"    ({r.query_id}, {r.rank}, {r.doc_id}, "
            f"{round(r.score, 6)}),"
        )
    spark.stop()


if __name__ == "__main__":
    main()
