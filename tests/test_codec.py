"""Codec round-trip tests (FIXTURES.md §5): exact equality of decoded
(docIDs, tfs, dls, block maxima), checksum verification, corrupt-byte
detection — mirroring the reference's round-trip + checkFooter contract."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opensearch_jvector_plugin_spark.operators.codec import (
    SKIP_BLOCK,
    PostingList,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


def roundtrip(doc_ids, tfs=None, dls=None):
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    tfs = np.asarray(tfs if tfs is not None else np.ones(n), dtype=np.int64)
    dls = np.asarray(dls if dls is not None else np.full(n, 7), dtype=np.int64)
    enc = encode_postings("t", PostingList(doc_ids, tfs, dls))
    dec = decode_postings(enc.blob, enc.df, enc.tf_offset, enc.dl_offset, enc.checksum)
    np.testing.assert_array_equal(dec.doc_ids, doc_ids)
    np.testing.assert_array_equal(dec.tfs, tfs)
    np.testing.assert_array_equal(dec.dls, dls)
    return enc


def test_varint_roundtrip_edges():
    cases = [
        [0],
        [1],
        [127],
        [128],
        [16383],
        [16384],
        [2**31 - 5],
        [2**63 - 1],
        [0, 1, 127, 128, 300, 2**40, 5],
    ]
    for c in cases:
        v = np.array(c, dtype=np.uint64)
        assert varint_decode(varint_encode(v), len(c)).tolist() == c
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varint_roundtrip_property(vals):
    v = np.array(vals, dtype=np.uint64)
    got = varint_decode(varint_encode(v), len(vals))
    assert got.tolist() == vals


def test_fixture_lists_roundtrip():
    # FIXTURES.md §5 hand-built lists.
    roundtrip([0])
    roundtrip([0, 1, 2])
    roundtrip(np.arange(1024))  # dense run
    roundtrip([5, 1_000_000, 2**31 - 5])  # sparse gaps
    roundtrip(np.arange(SKIP_BLOCK))  # exactly one block boundary
    roundtrip(np.arange(SKIP_BLOCK + 1))  # one past


def test_block_metadata_planted_maxima():
    n = 3 * SKIP_BLOCK
    doc_ids = np.arange(n) * 3 + 1
    tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 50, dtype=np.int64)
    # Plant max-tf in first, middle, last block; min-dl in middle block.
    tfs[0] = 9
    tfs[SKIP_BLOCK + 7] = 11
    tfs[n - 1] = 13
    dls[SKIP_BLOCK + 3] = 6

    enc = roundtrip(doc_ids, tfs, dls)
    assert enc.block_max_tf.tolist() == [9, 11, 13]
    assert enc.block_min_dl.tolist() == [50, 6, 50]
    assert enc.block_last_doc.tolist() == [
        int(doc_ids[SKIP_BLOCK - 1]),
        int(doc_ids[2 * SKIP_BLOCK - 1]),
        int(doc_ids[n - 1]),
    ]
    assert enc.df == n
    assert enc.ctf == int(tfs.sum())
    assert enc.max_tf == 13


def test_corrupt_byte_detected():
    enc = roundtrip(np.arange(500), np.arange(500) % 7 + 1)
    for flip_at in [0, len(enc.blob) // 2, len(enc.blob) - 1]:
        bad = bytearray(enc.blob)
        bad[flip_at] ^= 0x01
        with pytest.raises(ValueError, match="checksum mismatch"):
            decode_postings(bytes(bad), enc.df, enc.tf_offset, enc.dl_offset, enc.checksum)


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError, match="empty"):
        encode_postings("t", PostingList(np.array([], dtype=np.int64),
                                         np.array([]), np.array([])))
    with pytest.raises(ValueError, match="not strictly increasing"):
        encode_postings("t", PostingList(np.array([3, 3]), np.array([1, 1]),
                                         np.array([5, 5])))
    with pytest.raises(ValueError, match="positive"):
        encode_postings("t", PostingList(np.array([1, 2]), np.array([1, 0]),
                                         np.array([5, 5])))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=1, max_value=5000),
        ),
        min_size=1,
        max_size=400,
        unique_by=lambda t: t[0],
    )
)
def test_postings_roundtrip_property(rows):
    rows.sort()
    doc_ids = np.array([r[0] for r in rows], dtype=np.int64)
    tfs = np.array([r[1] for r in rows], dtype=np.int64)
    dls = np.array([r[2] for r in rows], dtype=np.int64)
    roundtrip(doc_ids, tfs, dls)
