"""Phase profiler for dedup_minhash (VERDICT r4 'what's wrong' #2: the
driver record regressed 7.23s -> 8.56s on unchanged code; root-cause or
clear as host drift).

Times the pipeline's two phases separately, with epoch-separated trials
(the BENCH.md discipline — min of time-separated samples defeats the
host's multi-minute ~3x slowdown epochs):

  phase C (candidates): shingle -> signatures -> banding -> band self-join
      -> distinct candidate pairs          (cand.count())
  phase F (full):       the complete operator incl. exact-Jaccard
      verification of candidates            (out.count())

Verification cost ~= F - C (same lazy subtree re-evaluated; the shared
shingle frame is deliberately NOT persisted — A/B-measured slower in
round 3, BENCH.md).

Usage: python scripts/profile_minhash.py [trials]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opensearch_jvector_plugin_spark.operators import dedup as dd  # noqa: E402
from opensearch_jvector_plugin_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(cores=cpus, app_name="minhash-profile",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    n_workers = int(cpus) if str(cpus).isdigit() else 32
    spark.range(0, n_workers * 2, 1, n_workers * 2).mapInPandas(
        lambda it: it, "id long"
    ).count()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def phase_c() -> float:
        sh = dd.doc_shingles(docs, 3)
        sig = dd.minhash_signatures(docs, 3, shingles=sh)
        n_bands = dd.NUM_HASHES // dd.BAND_ROWS
        bands = []
        for bidx in range(n_bands):
            cols = [f"mh_{bidx * dd.BAND_ROWS + r}" for r in range(dd.BAND_ROWS)]
            bands.append(sig.select(
                "doc_id", F.lit(bidx).alias("band_idx"),
                F.concat_ws("_", *[F.col(c).cast("string") for c in cols])
                .alias("band_key"),
            ))
        banded = bands[0]
        for b in bands[1:]:
            banded = banded.unionAll(b)
        a, b = banded.alias("a"), banded.alias("b")
        cand = (
            a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        t0 = time.monotonic()
        n = cand.count()
        t = time.monotonic() - t0
        print(f"  phase C (candidates): {t:.2f}s  ({n} candidate pairs)")
        return t

    def phase_f() -> float:
        t0 = time.monotonic()
        n = dd.minhash_lsh_pairs(docs, 3, threshold=0.8).count()
        t = time.monotonic() - t0
        print(f"  phase F (full op):    {t:.2f}s  ({n} verified pairs)")
        return t

    cs, fs = [], []
    for i in range(trials):
        print(f"trial {i + 1}/{trials}")
        cs.append(phase_c())
        fs.append(phase_f())
        if i < trials - 1:
            time.sleep(20)  # epoch separation
    out = {
        "sf_dir": sf_dir, "cpus": cpus,
        "candidates_s": [round(x, 2) for x in cs],
        "full_s": [round(x, 2) for x in fs],
        "min_candidates_s": round(min(cs), 2),
        "min_full_s": round(min(fs), 2),
        "verify_cost_s": round(min(fs) - min(cs), 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
