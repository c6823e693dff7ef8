"""Epoch-robust scaling measurement: interleave the two parallelism levels
(small, large, small, large, ...) so sustained host slowdowns hit both
levels equally, then compare per-level MEDIANS.

Each iteration is a fresh spark-submit-style subprocess running one timed
build + one timed query batch at one level (after in-process warmup).
Usage: python scripts/scaling_interleaved.py [--turns N] [--queries Q]
       [--small 2] [--large 8] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

WORKER = r"""
import json, os, sys, tempfile, time, shutil
from opensearch_jvector_plugin_spark.session import get_spark
from opensearch_jvector_plugin_spark.operators.build import build_index
from opensearch_jvector_plugin_spark.operators.query import load_index, search
sys.path.insert(0, ".")
from bench import bench_queries

cores = int(sys.argv[1]); n_turns = int(sys.argv[2]); n_queries = int(sys.argv[3])
corpus_path = sys.argv[4]
spark = get_spark(cores=cores, app_name=f"ojs-il-{cores}", extra_conf={
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.files.maxPartitionBytes": "8m",
    "spark.sql.files.openCostInBytes": "8m"})
spark.range(0, cores * 2, 1, cores * 2).mapInPandas(lambda it: it, "id long").count()
work = tempfile.mkdtemp(prefix=f"ojs_il_{cores}_")
# warmup build (JIT), then timed build
build_index(spark.read.parquet(corpus_path), os.path.join(work, "w"),
            align_partitions=True)
t0 = time.monotonic()
build_index(spark.read.parquet(corpus_path), os.path.join(work, "t"),
            align_partitions=True)
build_s = time.monotonic() - t0
idx = load_index(os.path.join(work, "t"))
qs = bench_queries(n_queries)
search(spark, idx, qs.head(8)).count()
t0 = time.monotonic()
rows = search(spark, idx, qs).count()
query_s = time.monotonic() - t0
print(json.dumps({"cores": cores, "build_s": build_s, "query_s": query_s,
                  "rows": rows}))
shutil.rmtree(work, ignore_errors=True)
spark.stop()
"""


def run_once(cores, turns, queries, corpus_path, repo_root):
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(turns), str(queries),
         corpus_path],
        capture_output=True, text=True, cwd=repo_root,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(f"worker {cores} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_000_000)
    ap.add_argument("--queries", type=int, default=10_000)
    ap.add_argument("--small", type=int, default=2)
    ap.add_argument("--large", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    corpus_path = os.path.join("/tmp", f"ojs_scale_corpus_{args.turns}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        raise SystemExit(
            f"corpus missing at {corpus_path}; run scaling_bench.py once first"
        )

    samples = {args.small: [], args.large: []}
    for r in range(args.rounds):
        for cores in (args.small, args.large):  # interleaved
            res = run_once(cores, args.turns, args.queries, corpus_path,
                           repo_root)
            samples[cores].append(res)
            print(json.dumps({"round": r, **res}), flush=True)

    def med(cores, key):
        return statistics.median(s[key] for s in samples[cores])

    ratio = args.large // args.small
    eff_b = (args.turns / med(args.large, "build_s")) / (
        ratio * args.turns / med(args.small, "build_s"))
    eff_q = (args.queries / med(args.large, "query_s")) / (
        ratio * args.queries / med(args.small, "query_s"))
    summary = {
        "rounds": args.rounds,
        "median_build_s": {c: med(c, "build_s") for c in samples},
        "median_query_s": {c: med(c, "query_s") for c in samples},
        "efficiency_build_median": round(eff_b, 3),
        "efficiency_query_median": round(eff_q, 3),
    }
    print(json.dumps(summary, indent=1))
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open(os.path.join(repo_root, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Interleaved scaling run {stamp} — {args.turns:,} turns, "
            f"{args.queries} queries, {args.rounds} rounds, "
            f"local[{args.small}] vs local[{args.large}] (medians)\n\n"
            f"- build: {args.turns/med(args.small,'build_s'):.0f} -> "
            f"{args.turns/med(args.large,'build_s'):.0f} turns/s, "
            f"efficiency **{eff_b:.3f}**\n"
            f"- query: {args.queries/med(args.small,'query_s'):.1f} -> "
            f"{args.queries/med(args.large,'query_s'):.1f} QPS, "
            f"efficiency **{eff_q:.3f}**\n"
        )


if __name__ == "__main__":
    main()
