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
