"""Codec frontier: recall@10 vs first-pass read volume for EVERY serving
codec in the compression-level registry (round 6 — x1..x32 all served).

One flagship-geometry index (auto-k, replicas=2) carries sq + pq + bq +
fp16 + mb2; a second build carries mb4 (one multi-bit width per index).
Every codec serves with the dimension-adaptive candidate pool at the
serving nprobe; recall is against the exact brute-force top-10 — so the
table reads as "bytes touched per vector in the first pass vs answer
quality", the dial a 100 TB deployment tunes.

Usage: python scripts/codec_frontier.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opensearch_jvector_plugin_spark.entry_queries import (  # noqa: E402
    IVF_REPLICAS,
    serving_nprobe,
)
from opensearch_jvector_plugin_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
)
from opensearch_jvector_plugin_spark.operators.vector_index import (  # noqa: E402
    build_vector_index,
    first_pass_k,
    ivf_search,
    ivf_search_exact,
    load_vector_index,
)
from opensearch_jvector_plugin_spark.session import get_spark  # noqa: E402

K = 10
N_QUERIES = 16
PQ_M = 8


def first_pass_bytes(codec: str, dim: int, pq_m: int) -> int:
    """Logical bytes read per vector by the codec's first pass."""
    return {
        "exact": 4 * dim,
        "fp16": 2 * dim,
        "sq": dim + 16,  # int8 codes + scale/norm doubles
        "pq": pq_m,
        "mb4": -(-4 * dim // 8),
        "mb2": -(-2 * dim // 8),
        "bq": -(-dim // 8),
    }[codec]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(cores=cpus, app_name="codec-frontier",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    d1 = tempfile.mkdtemp(prefix="ojs_frontier_a_")
    m = build_vector_index(emb, d1, n_centroids=None,
                           n_replicas=IVF_REPLICAS, pq_m=PQ_M, mb_bits=2,
                           fp16=True)
    d2 = tempfile.mkdtemp(prefix="ojs_frontier_b_")
    build_vector_index(emb, d2, n_centroids=None, n_replicas=IVF_REPLICAS,
                       mb_bits=4)
    idx1, idx2 = load_vector_index(d1), load_vector_index(d2)
    k_cent, dim = int(m["n_centroids"]), int(m["dim"])
    nprobe = serving_nprobe(k_cent)

    brute = cosine_topk(emb, queries, k=K).toPandas()

    def recall(got) -> float:
        hits = sum(
            len(set(brute[brute.query_id == q]["vec_id"])
                & set(got[got.query_id == q]["vec_id"]))
            for q in range(N_QUERIES)
        )
        return round(hits / (N_QUERIES * K), 4)

    qp = queries.toPandas()
    rows = {}
    rows["exact"] = recall(
        ivf_search_exact(spark, idx1, queries, k=K, nprobe=nprobe).toPandas()
    )
    for codec, idx in (("fp16", idx1), ("sq", idx1), ("pq", idx1),
                       ("mb4", idx2), ("mb2", idx1), ("bq", idx1)):
        rows[codec] = recall(
            ivf_search(spark, idx, qp, k=K, nprobe=nprobe, codec=codec,
                       approximate_threshold=None).toPandas()
        )
    out = {
        "sf_dir": sf_dir, "n_centroids": k_cent, "nprobe": nprobe,
        "replicas": IVF_REPLICAS, "dim": dim, "k": K,
        "adaptive_first_pass_k": first_pass_k(K, dim),
        "recall": rows,
        "first_pass_bytes_per_vector": {
            c: first_pass_bytes(c, dim, PQ_M) for c in rows
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
