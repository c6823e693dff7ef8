"""Persisted IVF vector index: train -> build -> serve, the vector-side
analog of the text index's build/persist/serve lifecycle.

Mirrors the reference's disk-resident ANN value proposition
(JVectorReader.java:41,118-129 — DEFAULT_OVER_QUERY_FACTOR = 5 plus an exact
reranker over the approximate candidates; JVectorWriter.java:278-294 trains
PQ codebooks on a sample and persists them with the vectors;
OneBitScalarQuantizer.java:22-30,61-65 trains quantization state from a
reservoir sample), re-targeted from a graph to an IVF layout because IVF is
the shape Spark serves well: the index IS a partitioned table, and a probe
is a partition-pruned scan.

Lifecycle:

1. **Train** (`train_centroids`): spherical k-means (k-means++ init, fixed
   iteration count, deterministic seed) on a deterministically-sampled
   subset of the corpus — the reservoir-sample-then-train discipline of
   OneBitScalarQuantizer.train. Runs driver-side on <= sample_cap vectors
   (the sample is bounded regardless of corpus size; at 100 TB the sample
   collect is the only driver materialization and it is capped).
2. **Build** (`build_vector_index`): one distributed pass assigns every
   vector to its nearest centroid (round-6 argmax, lowest-centroid tie) and
   scalar-quantizes it to int8 with a stored per-vector scale + norm
   (the PQ-codebook analog), then writes the index as a parquet table
   partitioned by `centroid_id` — probing nprobe buckets is directory-level
   partition pruning, reading nprobe/K of the corpus. Commit = atomic
   manifest rename (same resume discipline as the text segments).
3. **Serve**:
   - `ivf_search_exact`: probe buckets, exact float64 cosine (left-fold
     Catalyst expression — bit-identical to the DuckDB oracle), top-k.
   - `ivf_search`: quantized first pass (int8 ADC dot product, reading ONLY
     the qvec/qscale/qnorm columns — 1/~4.7 of the full-precision bytes at
     dim 64), over-fetch k * over_query, then exact rerank of the
     candidates at full precision (the JVectorReader rerankerFor shape).

Everything is deterministic: same corpus -> same centroids -> same buckets
-> same results, on any partitioning/parallelism.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

SAMPLE_CAP = 65_536
DEFAULT_OVER_QUERY = 5  # JVectorReader.java:41 DEFAULT_OVER_QUERY_FACTOR
TRAIN_ITERS = 8
TRAIN_SEED = 7


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def sample_stride(n_vecs: int, cap: int = SAMPLE_CAP) -> int:
    """Deterministic training-sample rule shared by the Spark build and the
    pandas oracle twin: keep vec_ids with splitmix64(id) % stride == 0."""
    return max(1, (n_vecs + cap - 1) // cap)


def train_centroids(
    mat: np.ndarray,
    n_centroids: int,
    n_iters: int = TRAIN_ITERS,
    seed: int = TRAIN_SEED,
) -> np.ndarray:
    """Spherical k-means, fully deterministic.

    k-means++ init from a seeded RNG, fixed Lloyd iteration count, empty
    clusters reseeded to the point farthest from its centroid. Returns
    (n_centroids, dim) float64 UNIT-NORM centroids."""
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    matn = mat / np.maximum(norms, 1e-30)[:, None]
    n = len(matn)
    k = min(n_centroids, n)
    rng = np.random.default_rng(seed)

    # k-means++ seeding on cosine distance (1 - dot).
    cents = np.empty((k, matn.shape[1]), dtype=np.float64)
    first = int(rng.integers(n))
    cents[0] = matn[first]
    d2 = np.maximum(1.0 - matn @ cents[0], 0.0)
    for c in range(1, k):
        tot = d2.sum()
        if tot <= 0:
            cents[c] = matn[int(rng.integers(n))]
        else:
            r = rng.random() * tot
            idx = int(np.searchsorted(np.cumsum(d2), r))
            cents[c] = matn[min(idx, n - 1)]
        d2 = np.minimum(d2, np.maximum(1.0 - matn @ cents[c], 0.0))

    for _ in range(n_iters):
        sims = matn @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = matn[assign == c]
            if len(members) == 0:
                # Deterministic reseed: the globally worst-served point.
                worst = int(np.argmin(sims[np.arange(n), assign]))
                cents[c] = matn[worst]
                continue
            m = members.sum(axis=0)
            nrm = np.linalg.norm(m)
            cents[c] = m / nrm if nrm > 0 else cents[c]
    return cents


def assign_round6(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment on round-6 cosine, ties to the LOWEST
    centroid_id — the contract both the Spark build and the SQL oracle
    follow (np.argmax returns the first maximum)."""
    norms = np.linalg.norm(vecs, axis=1)
    vn = vecs / np.maximum(norms, 1e-30)[:, None]
    sims = np.round(vn @ cents.T, 6)
    return np.argmax(sims, axis=1).astype(np.int32)


def quantize_int8(vecs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-vector symmetric int8 scalar quantization (the 1-bit/multi-bit
    scalar-quantizer analog, OneBitScalarQuantizer.java:22-30): returns
    (qvecs int8 (n, d), scale float64 (n,), qnorm float64 (n,)) where
    dequantized = qvec * scale and qnorm = ||dequantized||."""
    vecs = np.asarray(vecs, dtype=np.float64)
    maxabs = np.abs(vecs).max(axis=1)
    scale = np.maximum(maxabs, 1e-30) / 127.0
    q = np.clip(np.round(vecs / scale[:, None]), -127, 127).astype(np.int8)
    qnorm = np.linalg.norm(q.astype(np.float64), axis=1) * scale
    return q, scale, qnorm


_BUCKET_SCHEMA = (
    "vec_id LONG, centroid_id INT, embedding ARRAY<FLOAT>, "
    "qvec BINARY, qscale DOUBLE, qnorm DOUBLE"
)


def build_vector_index(
    emb: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = SAMPLE_CAP,
    seed: int = TRAIN_SEED,
) -> dict:
    """Train + persist the IVF index under index_dir:

        centroids.parquet        (centroid_id, cvec double[], n_vecs)
        buckets/centroid_id=C/   (vec_id, embedding, qvec, qscale, qnorm)
        ivf_manifest.json        (commit marker, atomic rename)
    """
    spark = emb.sparkSession
    src = emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("embedding"),
    )
    n_vecs = src.count()
    stride = sample_stride(n_vecs, sample_cap)

    # Bounded, deterministic sample -> driver-side training (the reservoir
    # discipline: the collect is capped at ~sample_cap rows at ANY corpus
    # size; the stride filter runs distributed).
    sample = src
    if stride > 1:
        # splitmix is not expressible as a built-in; sample via a tiny
        # mapInPandas kernel (distributed filter, small output), keeping
        # the rule identical to the pandas twin.
        def _keep(batches):
            for pdf in batches:
                ids = pdf["vec_id"].to_numpy(np.int64)
                m = (_splitmix64(ids) % np.uint64(stride)) == 0
                yield pdf[m]

        sample = src.mapInPandas(_keep, src.schema)
    # Sort by vec_id so the training input is identical on ANY partitioning
    # (and identical to the pandas oracle twin, export_centroids_twin).
    sample_pdf = sample.toPandas().sort_values("vec_id").reset_index(drop=True)
    smat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in sample_pdf["embedding"]]
    )
    cents = train_centroids(smat, n_centroids, seed=seed)
    k = len(cents)

    os.makedirs(index_dir, exist_ok=True)
    cent_pdf = pd.DataFrame(
        {
            "centroid_id": np.arange(k, dtype=np.int32),
            "cvec": [c.tolist() for c in cents],
            "n_vecs": np.full(k, n_vecs, dtype=np.int64),
        }
    )
    tmp = os.path.join(index_dir, "_centroids.parquet.tmp")
    cent_pdf.to_parquet(tmp, index=False)
    os.replace(tmp, os.path.join(index_dir, "centroids.parquet"))

    # One distributed pass: assign + quantize, write bucketed.
    bc_cents = spark.sparkContext.broadcast(cents)

    def assign_quant(batches):
        cc = bc_cents.value
        for pdf in batches:
            vecs = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            if len(vecs) == 0:
                continue
            a = assign_round6(vecs, cc)
            q, scale, qnorm = quantize_int8(vecs)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(np.int64),
                    "centroid_id": a,
                    "embedding": pdf["embedding"],
                    "qvec": [r.tobytes() for r in q],
                    "qscale": scale,
                    "qnorm": qnorm,
                }
            )

    buckets = os.path.join(index_dir, "buckets")
    src.mapInPandas(assign_quant, _BUCKET_SCHEMA).write.partitionBy(
        "centroid_id"
    ).mode("overwrite").parquet(buckets)

    dim = int(len(sample_pdf["embedding"].iloc[0])) if len(sample_pdf) else 0
    manifest = {
        "n_vecs": int(n_vecs),
        "dim": dim,
        "n_centroids": int(k),
        "metric": "cosine",
        "seed": int(seed),
        "sample_stride": int(stride),
        "trained_on": int(len(sample_pdf)),
        "train_iters": TRAIN_ITERS,
    }
    tmpm = os.path.join(index_dir, "ivf_manifest.json.tmp")
    with open(tmpm, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmpm, os.path.join(index_dir, "ivf_manifest.json"))
    return manifest


def export_centroids_twin(
    emb_parquet: str,
    out_dir: str,
    n_centroids: int = 16,
    sample_cap: int = SAMPLE_CAP,
    seed: int = TRAIN_SEED,
) -> str:
    """Pandas twin of build_vector_index's TRAINING stage, for the DuckDB
    oracle: same deterministic sample rule, same trainer, same vec_id-sorted
    input — so the exported centroids are identical to the ones the Spark
    build persists. Files are keyed by corpus size (n_vecs column + file
    name), letting one oracle SQL string serve any scale factor."""
    import pyarrow.parquet as pq

    t = (
        pq.read_table(emb_parquet, columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    n = len(t)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{n}.parquet")
    if os.path.exists(path):
        return path
    stride = sample_stride(n, sample_cap)
    ids = t["vec_id"].to_numpy(np.int64)
    keep = (_splitmix64(ids) % np.uint64(stride)) == 0 if stride > 1 else (
        np.ones(n, dtype=bool)
    )
    mat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"][keep]]
    )
    cents = train_centroids(mat, n_centroids, seed=seed)
    pdf = pd.DataFrame(
        {
            "centroid_id": np.arange(len(cents), dtype=np.int32),
            "cvec": [c.tolist() for c in cents],
            "n_vecs": np.full(len(cents), n, dtype=np.int64),
        }
    )
    tmp = f"{path}.tmp{os.getpid()}"
    pdf.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


class VectorIndexHandle:
    def __init__(self, index_dir: str):
        with open(os.path.join(index_dir, "ivf_manifest.json")) as f:
            self.manifest = json.load(f)
        self.index_dir = index_dir
        cent_pdf = pd.read_parquet(os.path.join(index_dir, "centroids.parquet"))
        self.centroids = np.asarray(
            [np.asarray(c, dtype=np.float64) for c in cent_pdf["cvec"]]
        )

    @property
    def buckets_path(self) -> str:
        return os.path.join(self.index_dir, "buckets")


def load_vector_index(index_dir: str) -> VectorIndexHandle:
    return VectorIndexHandle(index_dir)


def _probes(
    index: VectorIndexHandle, queries: pd.DataFrame, nprobe: int
) -> pd.DataFrame:
    """(query_id, centroid_id) probe pairs: top-nprobe centroids per query
    by round-6 cosine, ties to lowest centroid_id (the SQL contract)."""
    qmat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in queries["query_vec"]]
    )
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1), 1e-30)[:, None]
    sims = np.round(qn @ index.centroids.T, 6)
    nprobe = min(nprobe, sims.shape[1])
    # argsort on (-sim, centroid_id): stable sort over cid after -sim.
    order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
    qids = np.repeat(queries["query_id"].to_numpy(np.int32), nprobe)
    return pd.DataFrame(
        {"query_id": qids, "centroid_id": order.ravel().astype(np.int32)}
    )


def ivf_search_exact(
    spark: SparkSession,
    index: VectorIndexHandle,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Probe nprobe buckets per query, score EXACT float64 cosine with the
    left-fold Catalyst expression (bit-identical to the DuckDB oracle),
    rank by round-6 desc / vec_id asc. The bucket scan is partition-pruned
    to the probed centroid_ids.

    `allowed`: optional DataFrame with a vec_id column — PRE-filter
    semantics (the acceptDocs analog of JVectorReader.java:128): the
    filter is applied to candidates BEFORE the top-k cut, so a filtered
    query still returns k results when k allowed matches exist in the
    probed buckets."""
    from .dedup import cosine_col

    qpdf = queries.toPandas()
    probes = _probes(index, qpdf, nprobe)
    probed_cids = sorted(set(int(c) for c in probes["centroid_id"]))
    probes_df = spark.createDataFrame(probes)
    q = spark.createDataFrame(
        qpdf[["query_id", "query_vec"]]
    ).select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("query_vec").alias("qv"),
    )
    bucket = (
        spark.read.parquet(index.buckets_path)
        .where(F.col("centroid_id").isin(probed_cids))
        .select("vec_id", "centroid_id", F.col("embedding").alias("v"))
    )
    if allowed is not None:
        bucket = bucket.join(
            allowed.select(F.col("vec_id").cast("long").alias("vec_id")),
            "vec_id", "left_semi",
        )
    cand = bucket.join(F.broadcast(probes_df), "centroid_id")
    scored = cand.join(F.broadcast(q), "query_id").withColumn(
        "cosine", cosine_col(F.col("v"), F.col("qv"))
    )
    c6 = F.round(F.col("cosine"), 6)
    w = W.partitionBy("query_id").orderBy(c6.desc(), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", c6.alias("cosine"))
    )


def ivf_search(
    spark: SparkSession,
    index: VectorIndexHandle,
    queries: pd.DataFrame,
    k: int = 10,
    nprobe: int = 4,
    over_query: int = DEFAULT_OVER_QUERY,
) -> DataFrame:
    """Quantized-first-pass search: int8 ADC over the probed buckets
    (reading ONLY qvec/qscale/qnorm — a fraction of the full-precision
    bytes), over-fetch k * over_query candidates per query, exact rerank at
    full precision. The JVectorReader.java:118-129 over-query + rerankerFor
    shape."""
    probes = _probes(index, queries, nprobe)
    probed_cids = sorted(set(int(c) for c in probes["centroid_id"]))
    probe_sets: dict[int, set] = {}
    for r in probes.itertuples(index=False):
        probe_sets.setdefault(int(r.centroid_id), set()).add(int(r.query_id))

    qmat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in queries["query_vec"]]
    )
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1), 1e-30)[:, None]
    qids = queries["query_id"].to_numpy(np.int32)
    dim = qmat.shape[1]
    fetch = int(k) * int(over_query)

    bc = spark.sparkContext.broadcast((qids, qn, probe_sets, dim, fetch))

    def adc(pdf: pd.DataFrame) -> pd.DataFrame:
        all_qids, qnv, psets, d, nf = bc.value
        cid = int(pdf["centroid_id"].iloc[0])
        wanted = psets.get(cid)
        if not wanted:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype=np.int32),
                 "vec_id": pd.Series([], dtype=np.int64),
                 "approx": pd.Series([], dtype=np.float64)}
            )
        qsel = np.flatnonzero(np.isin(all_qids, list(wanted)))
        vid = pdf["vec_id"].to_numpy(np.int64)
        qv = np.frombuffer(
            b"".join(pdf["qvec"]), dtype=np.int8
        ).reshape(len(pdf), d).astype(np.float64)
        scale = pdf["qscale"].to_numpy(np.float64)
        qnorm = np.maximum(pdf["qnorm"].to_numpy(np.float64), 1e-30)
        # approx cosine = (scale * (int8 . q)) / qnorm  — one GEMM per
        # (bucket, Arrow batch).
        sims = (qv @ qnv[qsel].T) * (scale / qnorm)[:, None]
        out_q, out_v, out_s = [], [], []
        for j, qi in enumerate(qsel):
            col = sims[:, j]
            nn = min(nf, len(col))
            part = np.argpartition(-col, nn - 1)[:nn]
            out_q.append(np.full(nn, all_qids[qi], dtype=np.int32))
            out_v.append(vid[part])
            out_s.append(col[part])
        return pd.DataFrame(
            {"query_id": np.concatenate(out_q),
             "vec_id": np.concatenate(out_v),
             "approx": np.concatenate(out_s)}
        )

    first = (
        spark.read.parquet(index.buckets_path)
        .where(F.col("centroid_id").isin(probed_cids))
        .select("centroid_id", "vec_id", "qvec", "qscale", "qnorm")
        .groupBy("centroid_id")
        .applyInPandas(adc, "query_id INT, vec_id LONG, approx DOUBLE")
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("vec_id"))
    cand = (
        first.withColumn("r", F.row_number().over(wf))
        .where(F.col("r") <= fetch)
        .select("query_id", "vec_id")
    )

    # Exact rerank: second partition-pruned scan reading full precision for
    # the surviving candidates only.
    from .dedup import cosine_col

    full = (
        spark.read.parquet(index.buckets_path)
        .where(F.col("centroid_id").isin(probed_cids))
        .select("vec_id", F.col("embedding").alias("v"))
    )
    q = spark.createDataFrame(
        queries[["query_id", "query_vec"]]
    ).select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("query_vec").alias("qv"),
    )
    scored = (
        full.join(cand, "vec_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine", cosine_col(F.col("v"), F.col("qv")))
    )
    c6 = F.round(F.col("cosine"), 6)
    w = W.partitionBy("query_id").orderBy(c6.desc(), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", c6.alias("cosine"))
    )
