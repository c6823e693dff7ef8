"""Phase profiler for dedup_simhash_pairs (VERDICT r5 'Performance':
the driver record moved 5.38s -> 7.06s on unchanged code; root-cause or
clear as host drift — the profile_minhash.py discipline).

Times the pipeline's phases separately, with epoch-separated trials
(min of time-separated samples defeats the host's multi-minute ~3x
slowdown epochs, BENCH.md):

  phase S (fingerprints): tokenize -> (doc, term) tf -> 60 conditional
      bit sums -> 60-bit simhash            (fp.count())
  phase C (candidates):   + 4-band unionAll -> band self-join ->
      distinct candidate pairs              (cand-shaped count())
  phase F (full):         the complete operator incl. the hamming cut
                                            (simhash_pairs().count())

Band-join cost ~= C - S; the hamming cut is a projection (F - C ~ 0).

Usage: python scripts/profile_simhash.py [trials]
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
    spark = get_spark(cores=cpus, app_name="simhash-profile",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    n_workers = int(cpus) if str(cpus).isdigit() else 32
    spark.range(0, n_workers * 2, 1, n_workers * 2).mapInPandas(
        lambda it: it, "id long"
    ).count()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def phase_s() -> float:
        fp = dd.simhash(docs)
        t0 = time.monotonic()
        n = fp.count()
        t = time.monotonic() - t0
        print(f"  phase S (fingerprints): {t:.2f}s  ({n} docs)")
        return t

    def phase_c() -> float:
        fp = dd.simhash(docs)
        bands = None
        for i in range(dd.SIMHASH_BANDS):
            part = fp.select(
                "doc_id", "simhash",
                F.lit(i).alias("band_idx"),
                F.shiftright(F.col("simhash"), i * 15)
                .bitwiseAND(F.lit((1 << 15) - 1))
                .alias("band_key"),
            )
            bands = part if bands is None else bands.unionAll(part)
        a, b = bands.alias("a"), bands.alias("b")
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
        print(f"  phase C (candidates):   {t:.2f}s  ({n} candidate pairs)")
        return t

    def phase_f() -> float:
        t0 = time.monotonic()
        n = dd.simhash_pairs(docs, max_hamming=3).count()
        t = time.monotonic() - t0
        print(f"  phase F (full op):      {t:.2f}s  ({n} pairs)")
        return t

    ss, cs, fs = [], [], []
    for i in range(trials):
        print(f"trial {i + 1}/{trials}")
        ss.append(phase_s())
        cs.append(phase_c())
        fs.append(phase_f())
        if i < trials - 1:
            time.sleep(20)  # epoch separation
    out = {
        "sf_dir": sf_dir, "cpus": cpus,
        "fingerprint_s": [round(x, 2) for x in ss],
        "candidates_s": [round(x, 2) for x in cs],
        "full_s": [round(x, 2) for x in fs],
        "min_fingerprint_s": round(min(ss), 2),
        "min_candidates_s": round(min(cs), 2),
        "min_full_s": round(min(fs), 2),
        "band_join_cost_s": round(min(cs) - min(ss), 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
