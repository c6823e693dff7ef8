"""spark-submit entry point: build (or resume) a transcript index.

Usage (via scripts/submit_example.sh or spark-submit directly):
    submit_build_job.py <input_parquet> <index_dir> [seg_size]

The input is a transcript table (conv_id, turn_idx, role, text, tool, ts);
docIDs are assigned with the scalable partition-offset method, then the
segment index is built with per-segment commit markers (safe to re-submit
after a failure: committed segments are skipped).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    input_path = sys.argv[1]
    index_dir = sys.argv[2]
    seg_size = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    spark = SparkSession.builder.appName("ojs-index-build").getOrCreate()
    from opensearch_jvector_plugin_spark.operators.build import build_index
    from opensearch_jvector_plugin_spark.plans.docids import assign_doc_ids

    corpus = assign_doc_ids(
        spark.read.parquet(input_path), ["conv_id", "turn_idx"]
    )
    stats = build_index(
        corpus, index_dir, seg_size=seg_size,
        input_fingerprint=input_path, resume=True,
    )
    print(stats)
    spark.stop()


if __name__ == "__main__":
    main()
