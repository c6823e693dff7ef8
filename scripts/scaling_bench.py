"""Scaling-efficiency evidence for the north rule.

No real cluster exists in this sandbox, so the two-cluster-size criterion is
evidenced by running the SAME build and batched-query jobs at local[N] and
local[4N] (default 8 vs 32 cores) on the SAME deterministic input, reporting
throughput at both plus

    efficiency = throughput(4N) / (4 * throughput(N))

for index build and batched query scoring. Each measurement runs in a fresh
subprocess (one JVM per parallelism level). Results are appended to BENCH.md.

Usage: python scripts/scaling_bench.py [--turns 200000] [--queries 400]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

WORKER = r"""
import json, os, sys, tempfile, time, shutil
from opensearch_jvector_plugin_spark.session import get_spark
from opensearch_jvector_plugin_spark.sources.transcripts import synthesize_transcripts
from opensearch_jvector_plugin_spark.plans.docids import assign_doc_ids
from opensearch_jvector_plugin_spark.operators.build import build_index
from opensearch_jvector_plugin_spark.operators.query import load_index, search
sys.path.insert(0, os.path.dirname(os.path.abspath("bench.py")))
from bench import bench_queries

cores = int(sys.argv[1]); n_turns = int(sys.argv[2]); n_queries = int(sys.argv[3])
corpus_path = sys.argv[4]

spark = get_spark(cores=cores, app_name=f"ojs-scale-{cores}",
                  extra_conf={
                      "spark.ui.showConsoleProgress": "false",
                      # One scan partition per ingest file: the aligned
                      # build's segment layout must not be re-packed by the
                      # scan (128 x ~4MB files would otherwise coalesce
                      # into ~4 partitions and starve parallelism).
                      "spark.sql.files.maxPartitionBytes": "8m",
                      "spark.sql.files.openCostInBytes": "8m",
                  })
if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
    # One-time ingest (untimed): synthesize + dense docID assignment. The
    # reference's equivalent (Lucene ingest assigns docIDs before flush)
    # is likewise outside its indexing-throughput numbers; the recurring
    # per-snapshot job we measure is build_index.
    raw = synthesize_transcripts(spark, n_turns // 10, 10)
    assign_doc_ids(raw, ["conv_id", "turn_idx"]).repartition(128).write.mode(
        "overwrite").parquet(corpus_path)
# Warm the Python worker pool (executor spin-up is excluded from throughput,
# as cluster provisioning would be): one trivial Arrow round-trip per core.
spark.range(0, cores * 2, 1, cores * 2).mapInPandas(
    lambda it: it, "id long").count()

work = tempfile.mkdtemp(prefix=f"ojs_scale_{cores}_")

# JMH-style measurement (the reference's own baseline is JMH with warmup
# iterations): 1 untimed warmup run amortizes JVM JIT + worker spin-up,
# then min over 2 timed iterations suppresses host noise.
def one_build(tag):
    idx_dir = os.path.join(work, f"index_{tag}")
    t0 = time.monotonic()
    corpus = spark.read.parquet(corpus_path)
    # Shuffle-free fast path: 128 ingest partitions -> 128 segments.
    build_index(corpus, idx_dir, align_partitions=True)
    return time.monotonic() - t0, idx_dir

one_build("warmup")
b1, idx_dir = one_build("t1")
b2, _ = one_build("t2")
build_s = min(b1, b2)

index = load_index(idx_dir)
qs = bench_queries(n_queries)
search(spark, index, qs.head(8)).count()          # warm the query path
times = []
rows = 0
for _ in range(2):
    t0 = time.monotonic()
    rows = search(spark, index, qs).count()
    times.append(time.monotonic() - t0)
query_s = min(times)

print(json.dumps({"cores": cores, "build_s": build_s, "query_s": query_s,
                  "rows": rows, "build_trials": [b1, b2],
                  "query_trials": times,
                  "build_tps": n_turns / build_s,
                  "query_qps": n_queries / query_s}))
shutil.rmtree(work, ignore_errors=True)
spark.stop()
"""


def run_level(cores: int, turns: int, queries: int, corpus_path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(turns), str(queries),
         corpus_path],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"worker at {cores} cores failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=200_000)
    ap.add_argument("--queries", type=int, default=400)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    args = ap.parse_args()

    import tempfile

    corpus_path = os.path.join(tempfile.gettempdir(),
                               f"ojs_scale_corpus_{args.turns}")
    r_small = run_level(args.small, args.turns, args.queries, corpus_path)
    r_large = run_level(args.large, args.turns, args.queries, corpus_path)

    ratio = args.large // args.small
    eff_build = r_large["build_tps"] / (ratio * r_small["build_tps"])
    eff_query = r_large["query_qps"] / (ratio * r_small["query_qps"])
    result = {
        "turns": args.turns,
        "queries": args.queries,
        "small": r_small,
        "large": r_large,
        "efficiency_build": round(eff_build, 3),
        "efficiency_query": round(eff_query, 3),
    }
    print(json.dumps(result, indent=1))

    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    lines = [
        "",
        f"## Scaling run {stamp} — {args.turns:,} turns, "
        f"{args.queries} queries, local[{args.small}] vs local[{args.large}]",
        "",
        "| metric | local[{s}] | local[{l}] | efficiency (target >= 0.8) |".format(
            s=args.small, l=args.large
        ),
        "|---|---|---|---|",
        "| index build (turns/sec) | {:.0f} | {:.0f} | **{:.3f}** |".format(
            r_small["build_tps"], r_large["build_tps"], eff_build
        ),
        "| batched BM25 query (QPS) | {:.1f} | {:.1f} | **{:.3f}** |".format(
            r_small["query_qps"], r_large["query_qps"], eff_query
        ),
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH.md"), "a") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
