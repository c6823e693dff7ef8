"""Codec v2: FOR/PForDelta-style bit-packed posting blocks.

The reference gates a second, more compact representation behind a batch
threshold and a codec SPI (PQ block appended after the graph when
size >= minimumBatchSizeForQuantization, JVectorWriter.java:246-259;
codec service loading via META-INF/services). This module is our analog:
an alternative postings encoding selected per posting list, stored next to
the varint codec, chosen by whichever is smaller.

Layout (one stream, e.g. the docID-delta stream):

    header  varint(n_values)
    widths  one byte per 128-value block (bit width w of that block)
    blocks  ceil(128*w/8) bytes per block, values LSB-first bit-packed;
            the last block is zero-padded to 128 values

Pure NumPy; packing vectorizes across ALL blocks that share a width, so
the Python-level loop is over distinct widths (<= 64), not blocks.
"""

from __future__ import annotations

import numpy as np

PACK_BLOCK = 128


def _bit_width(v: np.ndarray) -> np.ndarray:
    """Bits needed per value (0 for value 0)."""
    w = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        w[nz] += 1
        tmp >>= np.uint64(1)
    return w


def packed_encode(values: np.ndarray) -> bytes:
    """Bit-pack a uint64 array in 128-value blocks with per-block width."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    from .codec import varint_encode

    head = varint_encode(np.array([n], dtype=np.uint64))
    if n == 0:
        return head
    n_blocks = (n + PACK_BLOCK - 1) // PACK_BLOCK
    pad = n_blocks * PACK_BLOCK - n
    vp = np.pad(v, (0, pad)).reshape(n_blocks, PACK_BLOCK)
    widths = _bit_width(vp.max(axis=1)).astype(np.uint8)

    # Per-block byte ranges in the output.
    blk_bytes = (widths.astype(np.int64) * PACK_BLOCK + 7) // 8
    ends = np.cumsum(blk_bytes)
    starts = ends - blk_bytes
    out = np.zeros(int(ends[-1]) if len(ends) else 0, dtype=np.uint8)

    for w in np.unique(widths):
        if w == 0:
            continue
        sel = np.flatnonzero(widths == w)
        vals = vp[sel]  # (m, 128)
        # (m, 128, w) LSB-first bits -> packbits little order per block.
        bits = (
            (vals[:, :, None] >> np.arange(w, dtype=np.uint64)[None, None, :])
            & np.uint64(1)
        ).astype(np.uint8)
        packed = np.packbits(bits.reshape(len(sel), -1), axis=1,
                             bitorder="little")
        nb = int(blk_bytes[sel[0]])
        idx = starts[sel][:, None] + np.arange(nb)[None, :]
        out[idx.ravel()] = packed[:, :nb].ravel()
    return head + widths.tobytes() + out.tobytes()


def packed_decode(buf: bytes) -> np.ndarray:
    from .codec import varint_decode

    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(0, dtype=np.uint64)
    # Parse the n_values varint (<= 10 bytes).
    head_len = int(np.flatnonzero(arr[:10] < 128)[0]) + 1
    n = int(varint_decode(buf[:head_len], 1)[0])
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    n_blocks = (n + PACK_BLOCK - 1) // PACK_BLOCK
    widths = arr[head_len:head_len + n_blocks].astype(np.int64)
    data = arr[head_len + n_blocks:]

    blk_bytes = (widths * PACK_BLOCK + 7) // 8
    ends = np.cumsum(blk_bytes)
    starts = ends - blk_bytes

    out = np.zeros(n_blocks * PACK_BLOCK, dtype=np.uint64)
    for w in np.unique(widths):
        if w == 0:
            continue
        sel = np.flatnonzero(widths == w)
        nb = int(blk_bytes[sel[0]])
        idx = starts[sel][:, None] + np.arange(nb)[None, :]
        chunk = data[idx.ravel()].reshape(len(sel), nb)
        bits = np.unpackbits(chunk, axis=1, bitorder="little")[
            :, : PACK_BLOCK * int(w)
        ].reshape(len(sel), PACK_BLOCK, int(w))
        vals = (bits.astype(np.uint64)
                << np.arange(int(w), dtype=np.uint64)[None, None, :]).sum(
            axis=2, dtype=np.uint64
        )
        out_idx = (sel[:, None] * PACK_BLOCK + np.arange(PACK_BLOCK)[None, :])
        out[out_idx.ravel()] = vals.ravel()
    return out[:n]
