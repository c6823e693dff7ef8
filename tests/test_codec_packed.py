"""Codec v2 (bit-packed blocks) round-trip tests + size comparison."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from opensearch_jvector_plugin_spark.operators.codec import varint_encode
from opensearch_jvector_plugin_spark.operators.codec_packed import (
    PACK_BLOCK,
    packed_decode,
    packed_encode,
)


def roundtrip(vals):
    v = np.asarray(vals, dtype=np.uint64)
    got = packed_decode(packed_encode(v))
    np.testing.assert_array_equal(got, v)


def test_edges():
    roundtrip([])
    roundtrip([0])
    roundtrip([0, 0, 0])
    roundtrip([1])
    roundtrip([2**63 - 1])
    roundtrip(np.arange(PACK_BLOCK))          # exactly one block
    roundtrip(np.arange(PACK_BLOCK + 1))      # one past
    roundtrip(np.arange(5 * PACK_BLOCK + 17))
    # Width variation across blocks: tiny then huge.
    roundtrip(np.concatenate([np.ones(PACK_BLOCK), np.full(PACK_BLOCK, 2**40)]))


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_roundtrip_property(vals):
    roundtrip(vals)


def test_packed_beats_varint_on_dense_deltas():
    """The typical postings case (small uniform deltas) should compress
    better bit-packed than varint (which pays a whole byte minimum)."""
    deltas = np.full(10 * PACK_BLOCK, 3, dtype=np.uint64)
    assert len(packed_encode(deltas)) < len(varint_encode(deltas))
