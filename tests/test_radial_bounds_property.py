"""Property-based validation of the radial ADC error bounds (round 4).

The quantized radial paths rest on two mathematical claims:

  sq: with v = scale*q + e and ||e||_2 <= scale*sqrt(d)/2, the per-space
      upper bound computed in _radial_adc_survivors can never be below the
      exact metric (so cutting on it drops no qualifying vector);
  pq: |adc - exact| <= pqerr (cosine; * ||u|| for ip; additive on the l2
      distance), where pqerr is the stored reconstruction-error norm.

These are checked here directly on randomly generated vectors — no Spark,
no fixtures — mirroring the kernel arithmetic exactly (same dtype, same
operation shapes). Hypothesis drives dimension, scale spread, and query
geometry."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from opensearch_jvector_plugin_spark.operators.vector_index import (
    pq_encode_with_err,
    pq_lut,
    quantize_int8,
    train_pq_codebooks,
)


def _vectors(seed: int, n: int, d: int, spread: float) -> np.ndarray:
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d)) * (
        1.0 + spread * rng.random(size=(n, 1))
    )
    # Avoid exact zero vectors (not indexable under cosine anyway).
    mat[np.abs(mat).sum(axis=1) == 0] += 1.0
    return mat


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    d=st.sampled_from([4, 8, 16, 64]),
    spread=st.floats(0.0, 100.0),
)
def test_sq_bounds_dominate_exact_metrics(seed, d, spread):
    vecs = _vectors(seed, 64, d, spread)
    u = _vectors(seed + 1, 1, d, spread)[0]
    q, scale, qnorm = quantize_int8(vecs)
    qv = q.astype(np.float64)
    E = scale * (np.sqrt(d) / 2.0)
    uh = u / max(np.linalg.norm(u), 1e-30)

    # cosine: sign-aware divisor upper bound.
    exact_cos = (vecs @ uh) / np.linalg.norm(vecs, axis=1)
    num = (qv @ uh) * scale + E
    denom = np.where(num > 0, np.maximum(qnorm - E, 1e-30), qnorm + E)
    ub_cos = num / denom
    assert (ub_cos >= exact_cos - 1e-9).all()

    # innerproduct upper bound.
    exact_ip = vecs @ u
    ub_ip = (qv @ u) * scale + E * np.linalg.norm(u)
    assert (ub_ip >= exact_ip - 1e-9 * (1 + np.abs(exact_ip))).all()

    # l2: reconstructed distance can undershoot by at most E.
    exact_l2 = np.linalg.norm(vecs - u[None, :], axis=1)
    dots = (qv @ u) * scale
    approx = np.maximum(qnorm * qnorm - 2.0 * dots + u @ u, 0.0)
    lower = np.sqrt(approx) - E
    assert (lower <= exact_l2 + 1e-9 * (1 + exact_l2)).all()


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    d=st.sampled_from([8, 16]),
    m=st.sampled_from([2, 4]),
)
def test_pq_error_norm_bounds_adc(seed, d, m):
    vecs = _vectors(seed, 120, d, 2.0)
    u = _vectors(seed + 1, 1, d, 2.0)[0]
    for metric in ("cosine", "l2", "innerproduct"):
        books = train_pq_codebooks(vecs[:100], m, metric=metric)
        codes, err = pq_encode_with_err(vecs, books, metric)
        lut = pq_lut(u, books, metric)
        adc = lut[np.arange(m)[None, :], codes.astype(np.int64)].sum(axis=1)
        if metric == "cosine":
            exact = (vecs @ (u / max(np.linalg.norm(u), 1e-30))) / (
                np.linalg.norm(vecs, axis=1)
            )
            assert (np.abs(exact - adc) <= err + 1e-9).all()
        elif metric == "innerproduct":
            exact = vecs @ u
            bound = err * np.linalg.norm(u) + 1e-9 * (1 + np.abs(exact))
            assert (np.abs(exact - adc) <= bound).all()
        else:  # l2: lut is NEGATED approx squared distance
            exact = np.linalg.norm(vecs - u[None, :], axis=1)
            recon_dist = np.sqrt(np.maximum(-adc, 0.0))
            assert (
                np.abs(exact - recon_dist) <= err + 1e-9 * (1 + exact)
            ).all()
