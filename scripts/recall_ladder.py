"""Recall ladder for the quantized serving path (VERDICT r4 'next round'
#4): recall@10 vs brute force at three candidate-pool settings on the
flagship geometry (auto-k, replicas=2, nprobe=ceil(3k/8)), plus the
exact-path ceiling (probe recall — what the bucket selection alone
allows). The reference's quantized-path tests assert recall ~1.0 +- 0.05
(KNNJVectorTests.java:612-613); its oversample is dimension-adaptive
(RescoreContext.java:81-97), which is what first_pass_k mirrors.

Usage: python scripts/recall_ladder.py
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(cores=cpus, app_name="recall-ladder",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    d = tempfile.mkdtemp(prefix="ojs_recall_")
    m = build_vector_index(emb, d, n_centroids=None, n_replicas=IVF_REPLICAS)
    idx = load_vector_index(d)
    k_cent = int(m["n_centroids"])
    nprobe = serving_nprobe(k_cent)
    dim = int(m["dim"])

    brute = cosine_topk(emb, queries, k=K).toPandas()

    def recall(got) -> float:
        hits = sum(
            len(set(brute[brute.query_id == q]["vec_id"])
                & set(got[got.query_id == q]["vec_id"]))
            for q in range(N_QUERIES)
        )
        return round(hits / (N_QUERIES * K), 4)

    out = {
        "sf_dir": sf_dir, "n_centroids": k_cent, "nprobe": nprobe,
        "replicas": IVF_REPLICAS, "dim": dim, "k": K,
        "adaptive_first_pass_k": first_pass_k(K, dim),
    }
    exact = ivf_search_exact(spark, idx, queries, k=K, nprobe=nprobe)
    out["recall_probe_ceiling_exact"] = recall(exact.toPandas())
    qp = queries.toPandas()
    ladder = {}
    for label, oq in (("oq3_fetch30", 3), ("oq5_fetch50", 5),
                      ("adaptive_fetch%d" % first_pass_k(K, dim), None)):
        got = ivf_search(
            spark, idx, qp, k=K, nprobe=nprobe, over_query=oq,
            approximate_threshold=None,
        ).toPandas()
        ladder[label] = recall(got)
    out["recall_quantized_sq"] = ladder
    if m.get("pq_m"):
        out["recall_quantized_pq_adaptive"] = recall(
            ivf_search(spark, idx, qp, k=K, nprobe=nprobe, codec="pq",
                       approximate_threshold=None).toPandas()
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
