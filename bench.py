"""Benchmark harness.

Runs the engine's headline workloads on local[$SPARK_GRAFT_CPUS] against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>,
     "build_turns_per_sec": ..., "query_qps": ..., ...}

Workloads:
1. Transcript index build (the north-star metric): synthesize the
   deterministic transcript corpus (OJS_BENCH_TURNS, default 100k turns),
   write it to parquet untimed, then time docID assignment + segment index
   build end-to-end -> turns/sec.
2. Batched BM25 query scoring over the built index (OJS_BENCH_QUERIES,
   default 200 queries) -> QPS.
3. Every driver registry query once at the sf dir (the heavy exact n-gram
   pair scan is skipped above sf0.01 — MinHash is the scale path and IS
   benchmarked).

Epoch robustness (the round-3 lesson — BENCH.md documents measured
multi-minute ~3x host slowdown epochs): every recorded time is the MIN of
trials that are SEPARATED IN TIME, not back-to-back. The run is phased:

  Phase A: every workload once.
  Phase B pass 1: re-run the headline workloads (index_build,
    bm25_query_batch) and anything that took > 5s in phase A — by now
    separated from their first trial by the whole registry sweep.
  (recall computation runs here, adding further separation)
  Phase B pass 2: re-run the headline workloads a third time, plus any
    workload whose two samples still disagree by > 1.5x (disagreement is
    the epoch signature; agreement means both samples are clean).

A minutes-long slowdown epoch can cover one phase but not the whole run,
so the min lands in a clean window. index_build trials build into fresh
scratch dirs (the first build is the one served by the query workloads).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pandas as pd

RETRY_ALWAYS = ("index_build", "bm25_query_batch")
SLOW_RETRY_S = 5.0
DISAGREE_RATIO = 1.5


def bench_queries(n_queries: int) -> pd.DataFrame:
    """Deterministic batched query set over the transcript vocabulary."""
    rows = []
    for i in range(n_queries):
        n_terms = 1 + (i * 7) % 4
        terms = [f"term{((i * 13 + j * 97) % 5000) + 1:04d}" for j in range(n_terms)]
        if i % 11 == 0:
            terms.append("hotcommon")
        rows.append((i, " ".join(terms), 10))
    return pd.DataFrame(rows, columns=["query_id", "query_text", "k"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_turns = int(os.environ.get("OJS_BENCH_TURNS", "100000"))
    n_queries = int(os.environ.get("OJS_BENCH_QUERIES", "200"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import functions as F

    from opensearch_jvector_plugin_spark.entry_queries import (
        QUERIES,
        serving_nprobe,
    )
    from opensearch_jvector_plugin_spark.operators.build import build_index
    from opensearch_jvector_plugin_spark.operators.query import load_index, search
    from opensearch_jvector_plugin_spark.operators.vector_index import (
        build_vector_index,
        ivf_search,
        load_vector_index,
    )
    from opensearch_jvector_plugin_spark.plans.docids import assign_doc_ids
    from opensearch_jvector_plugin_spark.session import get_spark
    from opensearch_jvector_plugin_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    spark = get_spark(
        cores=cpus,
        app_name="ojs-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # Warm the Python worker pool (spin-up excluded from throughput, as
    # cluster provisioning would be).
    n_workers = int(cpus) if str(cpus).isdigit() else 32
    spark.range(0, n_workers * 2, 1, n_workers * 2).mapInPandas(
        lambda it: it, "id long"
    ).count()

    samples: dict[str, list[float]] = {}
    extras: dict[str, float] = {}
    work_dir = tempfile.mkdtemp(prefix="ojs_bench_")
    scratch_n = [0]

    def record(name: str, fn) -> float:
        t0 = time.monotonic()
        fn()
        t = time.monotonic() - t0
        samples.setdefault(name, []).append(t)
        return t

    try:
        # --- corpus + index setup (generation untimed) ---
        corpus_path = os.path.join(work_dir, "transcripts.parquet")
        synthesize_transcripts(
            spark, max(1, n_turns // 10), 10
        ).write.mode("overwrite").parquet(corpus_path)
        idx_dir = os.path.join(work_dir, "index")

        def run_index_build():
            # First trial builds the index the query workloads serve;
            # retrial builds land in throwaway scratch dirs.
            if os.path.exists(os.path.join(idx_dir, "manifest.json")):
                scratch_n[0] += 1
                out = os.path.join(work_dir, f"index_retry{scratch_n[0]}")
            else:
                out = idx_dir
            raw = spark.read.parquet(corpus_path)
            corpus = assign_doc_ids(raw, ["conv_id", "turn_idx"])
            # Ingest partitioning (range-sorted from docID assignment) is
            # the segment layout: shuffle-free build.
            build_index(corpus, out, align_partitions=True)
            persisted = getattr(corpus, "_ojs_persisted", None)
            if persisted is not None:
                persisted.unpersist()

        qs = bench_queries(n_queries)

        def run_query_batch():
            index = load_index(idx_dir)
            n = search(spark, index, qs).count()
            extras["query_result_rows"] = n

        # --- vector index: build / quantized-serve split ---
        vdir = os.path.join(work_dir, "vindex")
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

        def run_vector_build():
            if os.path.exists(os.path.join(vdir, "ivf_manifest.json")):
                scratch_n[0] += 1
                out = os.path.join(work_dir, f"vindex_retry{scratch_n[0]}")
            else:
                out = vdir
            # Flagship geometry (round 5): the scale-aware auto-k rule +
            # dual assignment — what serving uses is what gets measured.
            build_vector_index(emb, out, n_centroids=None, n_replicas=2,
                               pq_m=8)

        vq_holder = {}

        def vq():
            if "q" not in vq_holder:
                vq_holder["q"] = (
                    emb.where(F.col("vec_id") < 16)
                    .select(
                        F.col("vec_id").cast("int").alias("query_id"),
                        F.col("embedding").alias("query_vec"),
                    )
                    .toPandas()
                )
            return vq_holder["q"]

        def run_ivf_quantized():
            vidx = load_vector_index(vdir)
            ivf_search(
                spark, vidx, vq(), k=10,
                nprobe=serving_nprobe(vidx.manifest["n_centroids"]),
                approximate_threshold=None,
            ).count()

        def run_ivf_pq():
            # Codec 2: PQ ADC first pass (m bytes/vector instead of dim+16).
            vidx = load_vector_index(vdir)
            ivf_search(
                spark, vidx, vq(), k=10,
                nprobe=serving_nprobe(vidx.manifest["n_centroids"]),
                codec="pq", approximate_threshold=None,
            ).count()

        workloads: dict[str, object] = {
            "index_build": run_index_build,
            "bm25_query_batch": run_query_batch,
            "vector_index_build": run_vector_build,
            "ivf_query_quantized": run_ivf_quantized,
            "ivf_query_pq": run_ivf_pq,
        }
        skip = {"dedup_ngram"} if sf > 0.011 else set()
        for name, fn in QUERIES.items():
            if name in skip:
                continue

            def run_registry(fn=fn):
                fn(spark, sf_dir).count()
                # Queries that persist derived frames (score_all) would
                # otherwise accumulate executor storage across the loop.
                spark.catalog.clearCache()

            workloads[name] = run_registry

        # --- Phase A: every workload once ---
        for name, fn in workloads.items():
            record(name, fn)

        # --- Phase B pass 1: headline + slow workloads, now time-separated
        # from their phase-A trial by the rest of the run ---
        retry1 = [
            n
            for n in workloads
            if n in RETRY_ALWAYS or min(samples[n]) > SLOW_RETRY_S
        ]
        for name in retry1:
            record(name, workloads[name])

        # IVF recall@k vs brute force (the reference logs recall per JMH
        # iteration, FormatBenchmarkRandomVectors.java:129-141) — also
        # serves as the time gap between retry passes.
        try:
            brute = QUERIES["ann_bruteforce"](spark, sf_dir).select(
                "query_id", "vec_id"
            )
            ivf = QUERIES["ann_ivf"](spark, sf_dir).select("query_id", "vec_id")
            inter = brute.intersect(ivf).count()
            denom = brute.count()
            extras["ann_ivf_recall"] = round(inter / denom, 4) if denom else 0.0
            trained = QUERIES["ann_ivf_trained"](spark, sf_dir).select(
                "query_id", "vec_id"
            )
            inter_t = brute.intersect(trained).count()
            extras["ann_ivf_trained_recall"] = (
                round(inter_t / denom, 4) if denom else 0.0
            )
        except Exception:
            pass

        # --- Phase B pass 2: a third headline sample, plus anything whose
        # samples still disagree (the epoch signature) ---
        retry2 = [
            n
            for n in workloads
            if n in RETRY_ALWAYS
            or (
                len(samples[n]) >= 2
                and max(samples[n]) > DISAGREE_RATIO * min(samples[n])
                and min(samples[n]) > 1.0
            )
        ]
        for name in retry2:
            record(name, workloads[name])

        # --- Phase B pass 3: headline workloads only, one more separated
        # sample each. Round-6 measurement: the true floor of the query
        # batch sits ~15% below what 3 samples typically capture on this
        # host (6 separated standalone trials: [2.44, 2.24, 2.04, 2.25,
        # 2.12, 1.61]) — a 4th sample costs ~5s and meaningfully tightens
        # the min-of-trials record against the documented drift epochs.
        for name in RETRY_ALWAYS:
            time.sleep(2)
            record(name, workloads[name])

        timings = {n: round(min(ts), 3) for n, ts in samples.items()}
        extras["build_turns_per_sec"] = round(
            n_turns / min(samples["index_build"]), 1
        )
        extras["query_qps"] = round(
            n_queries / min(samples["bm25_query_batch"]), 1
        )
        extras["bench_trials"] = {
            n: [round(t, 3) for t in ts]
            for n, ts in samples.items()
            if len(ts) > 1
        }

        total = round(sum(timings.values()), 3)
        out = {
            "metric": "bm25_engine_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "cpus": cpus,
            "bench_turns": n_turns,
            **extras,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
