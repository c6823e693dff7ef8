"""Posting-list codec: delta + varint encoding, skip blocks with block-max
metadata, CRC32-checksummed blobs. Pure NumPy — no Spark, no Python loops
over postings.

Format-lifecycle counterpart of the reference's codec files
(JVectorWriter.writeGraph serializing an in-memory structure into an on-disk
block with offsets recorded in a meta record, JVectorWriter.java:205-267 and
VectorIndexFieldMetadata JVectorWriter.java:296-331; versioned header +
checksum footer discipline JVectorWriter.java:93-107,344-349 /
JVectorReader.java:249-262). Layout per posting list (one term within one
segment):

    blob  = varint(doc_id deltas) || varint(tf) || varint(dl)
    meta  = df, ctf, max_tf,
            block arrays (one entry per SKIP_BLOCK docs):
              block_last_doc  — skip pointer (last docID in block)
              block_max_tf    — max tf in block        } together give an
              block_min_dl    — min dl in block        } upper bound on any
                                                         BM25 score in block
            byte offsets of the three varint sections, crc32 of the blob

Storing dl inline (instead of a separate norms file) makes every posting
list self-contained: the WAND kernel scores exactly from the blob with no
docID->norm random access, which is what lets the merged index be
term-partitioned without shipping a norms table. Costs ~1 varint byte per
posting; documented trade-off vs Lucene's separate norms stream.

The per-block (max_tf, min_dl) pair upper-bounds tf_norm because tf_norm is
increasing in tf and decreasing in dl — the analog of the reference's
two-phase cheap-bound-then-exact scoring (PQ approximate + exact rerank,
JVectorReader.java:115-127).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np

CODEC_VERSION = 1
SKIP_BLOCK = 128  # postings per skip block (Lucene's block size)


# ---------------------------------------------------------------- varint ---


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style varint encode of a uint64 array, fully vectorized.

    Each value emits ceil(bits/7) bytes; continuation bit 0x80 on all but
    the last byte of each value.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # Bytes needed per value: position of highest set bit / 7, min 1.
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits, 1)
    total = int(nbytes.sum())

    out = np.zeros(total, dtype=np.uint8)
    # End offset of each value's byte run.
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # Byte slot j of value i holds bits [7j, 7j+7) with cont bit if j < n-1.
    max_b = int(nbytes.max())
    for j in range(max_b):
        mask = nbytes > j
        idx = starts[mask] + j
        chunk = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) * np.uint8(0x80)
        out[idx] = chunk | cont
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Vectorized varint decode -> uint64 array."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = arr < 128
    # Group id for each byte: cumulative count of completed values before it.
    group = np.zeros(arr.size, dtype=np.int64)
    group[1:] = np.cumsum(is_last)[:-1]
    # Bit shift within group = byte position within its value * 7.
    starts_mask = np.ones(arr.size, dtype=bool)
    starts_mask[1:] = is_last[:-1]
    start_idx = np.flatnonzero(starts_mask)
    pos_in_group = np.arange(arr.size) - start_idx[group]
    contrib = (arr & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos_in_group.astype(np.uint64)
    )
    vals = np.add.reduceat(contrib, start_idx)
    if count is not None and vals.size != count:
        raise ValueError(f"decoded {vals.size} values, expected {count}")
    return vals


# ------------------------------------------------------------ posting list ---


@dataclass
class PostingList:
    """Decoded, docID-sorted posting list for one term in one segment."""

    doc_ids: np.ndarray  # int64, strictly increasing
    tfs: np.ndarray      # int64 > 0
    dls: np.ndarray      # int64 > 0 (exact doc length of each posting's doc)


CODEC_VARINT = 1
CODEC_PACKED = 2  # FOR bit-packed blocks (codec_packed.py)


@dataclass
class EncodedPostings:
    """One row of the segment postings table (the on-disk unit)."""

    term: str
    df: int
    ctf: int
    max_tf: int
    blob: bytes
    tf_offset: int
    dl_offset: int
    checksum: int
    block_last_doc: np.ndarray  # int64 per block
    block_max_tf: np.ndarray    # int32 per block
    block_min_dl: np.ndarray    # int32 per block
    codec: int = CODEC_VARINT


def encode_postings(
    term: str, pl: PostingList, codec: str = "varint"
) -> EncodedPostings:
    doc_ids = np.asarray(pl.doc_ids, dtype=np.int64)
    tfs = np.asarray(pl.tfs, dtype=np.int64)
    dls = np.asarray(pl.dls, dtype=np.int64)
    if doc_ids.size == 0:
        raise ValueError("empty posting list")
    if doc_ids.size > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError(f"doc_ids not strictly increasing for term {term!r}")
    if (tfs <= 0).any() or (dls <= 0).any():
        raise ValueError("tf and dl must be positive")

    deltas = np.empty_like(doc_ids)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])

    def enc(vals: np.ndarray) -> tuple[bytes, int]:
        v = vals.astype(np.uint64)
        if codec == "varint":
            return varint_encode(v), CODEC_VARINT
        from .codec_packed import packed_encode

        if codec == "packed":
            return packed_encode(v), CODEC_PACKED
        if codec == "auto":  # whichever is smaller, per list
            a = varint_encode(v)
            b = packed_encode(v)
            return (a, CODEC_VARINT) if len(a) <= len(b) else (b, CODEC_PACKED)
        raise ValueError(f"unknown codec {codec!r}")

    # One codec per posting list (all three sections share it).
    doc_bytes, codec_id = enc(deltas)
    if codec == "auto":
        codec = "varint" if codec_id == CODEC_VARINT else "packed"
    tf_bytes, _ = enc(tfs)
    dl_bytes, _ = enc(dls)
    blob = doc_bytes + tf_bytes + dl_bytes

    n = doc_ids.size
    n_blocks = (n + SKIP_BLOCK - 1) // SKIP_BLOCK
    pad = n_blocks * SKIP_BLOCK - n
    # Padded 2-D views for per-block reductions (pad is neutral for each op).
    did_p = np.pad(doc_ids, (0, pad), constant_values=doc_ids[-1]).reshape(
        n_blocks, SKIP_BLOCK
    )
    tf_p = np.pad(tfs, (0, pad), constant_values=0).reshape(n_blocks, SKIP_BLOCK)
    dl_p = np.pad(dls, (0, pad), constant_values=np.iinfo(np.int64).max).reshape(
        n_blocks, SKIP_BLOCK
    )

    return EncodedPostings(
        term=term,
        df=int(n),
        ctf=int(tfs.sum()),
        max_tf=int(tfs.max()),
        blob=blob,
        tf_offset=len(doc_bytes),
        dl_offset=len(doc_bytes) + len(tf_bytes),
        checksum=zlib.crc32(blob) & 0xFFFFFFFF,
        block_last_doc=did_p.max(axis=1).astype(np.int64),
        block_max_tf=tf_p.max(axis=1).astype(np.int32),
        block_min_dl=dl_p.min(axis=1).astype(np.int32),
        codec=codec_id,
    )


def decode_postings(
    blob: bytes,
    df: int,
    tf_offset: int,
    dl_offset: int,
    checksum: int | None = None,
    codec: int = CODEC_VARINT,
) -> PostingList:
    """Decode a blob back to (doc_ids, tfs, dls); verifies the checksum first
    (the CodecUtil.checkFooter contract — corrupt bytes must not decode)."""
    if checksum is not None:
        actual = zlib.crc32(blob) & 0xFFFFFFFF
        if actual != checksum:
            raise ValueError(
                f"postings checksum mismatch: stored={checksum} actual={actual}"
            )
    if codec == CODEC_VARINT:
        dec = varint_decode
    elif codec == CODEC_PACKED:
        from .codec_packed import packed_decode

        def dec(b, count):
            v = packed_decode(b)
            if count is not None and v.size != count:
                raise ValueError(f"decoded {v.size} values, expected {count}")
            return v
    else:
        raise ValueError(f"unknown codec id {codec}")
    deltas = dec(blob[:tf_offset], df)
    tfs = dec(blob[tf_offset:dl_offset], df)
    dls = dec(blob[dl_offset:], df)
    return PostingList(
        doc_ids=np.cumsum(deltas.astype(np.int64)),
        tfs=tfs.astype(np.int64),
        dls=dls.astype(np.int64),
    )


def decode_postings_batch(
    blobs: list[bytes],
    dfs: np.ndarray,
    checksums: np.ndarray | None = None,
) -> list[PostingList]:
    """Decode MANY varint posting lists in one vectorized pass.

    Concatenates every blob (each blob is three back-to-back whole varint
    streams: doc deltas, tfs, dls — so the concatenation is itself one
    valid varint stream of sum(3*df) values), runs a single varint decode,
    and splits by the known per-list counts. ~10x faster than per-list
    decode when lists are small relative to call overhead (the common case
    for a multi-thousand-term query batch).
    """
    if checksums is not None:
        for b, c in zip(blobs, checksums):
            actual = zlib.crc32(b) & 0xFFFFFFFF
            if actual != int(c):
                raise ValueError(
                    f"postings checksum mismatch: stored={int(c)} actual={actual}"
                )
    dfs = np.asarray(dfs, dtype=np.int64)
    big = b"".join(blobs)
    vals = varint_decode(big, int(3 * dfs.sum()))

    # Per-list section boundaries in VALUE space.
    ends = np.cumsum(3 * dfs)
    starts = ends - 3 * dfs
    out: list[PostingList] = []
    v64 = vals.astype(np.int64)
    for s, n in zip(starts, dfs):
        s = int(s)
        n = int(n)
        out.append(
            PostingList(
                doc_ids=np.cumsum(v64[s:s + n]),
                tfs=v64[s + n:s + 2 * n],
                dls=v64[s + 2 * n:s + 3 * n],
            )
        )
    return out
