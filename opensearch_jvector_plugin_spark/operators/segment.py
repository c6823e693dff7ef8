"""Vectorized whole-segment postings encoder.

The per-segment flush analog of the reference writer (accumulate values,
then freeze to disk: JVectorWriter.FieldWriter.addValue
JVectorWriter.java:406-432 + flush/writeField JVectorWriter.java:177-196),
re-expressed as batch NumPy over one Spark partition's documents:

tokenize (pandas str.findall) -> flatten -> lexsort by (term, doc) ->
run-length tf -> per-term delta+varint streams sliced from three
whole-segment buffers -> per-term skip-block metadata via reduceat.

The ONLY per-term Python work is byte-slicing and crc32 — every numeric
transform is a whole-segment NumPy op. This is the hot path of index build.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from ..functions.tokenizer import tokenize_series
from .codec import SKIP_BLOCK


def _varint_nbytes(v: np.ndarray) -> np.ndarray:
    """Bytes each uint64 value needs under LEB128 (vectorized)."""
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(7)
    return np.maximum(nbits, 1)


def _varint_encode_with_bounds(v: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode the whole array at once; return (buffer, end-offset per value)."""
    v = np.asarray(v, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbytes = _varint_nbytes(v)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        idx = starts[mask] + j
        chunk = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) * np.uint8(0x80)
        out[idx] = chunk | cont
    return out.tobytes(), ends


def encode_segment(
    doc_ids: np.ndarray, texts: pd.Series
) -> tuple[pd.DataFrame, dict]:
    """Encode one segment's postings.

    Returns (postings_rows, segment_summary):
      postings_rows columns: term, df, ctf, max_tf, tf_offset, dl_offset,
        checksum, blob, block_last_doc, block_max_tf, block_min_dl
      summary: n_docs, sum_dl, doc_lo, doc_hi, n_terms, n_postings, crc
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    texts = texts.iloc[order].reset_index(drop=True)

    tok_lists = tokenize_series(texts)
    dl_per_doc = tok_lists.map(len).to_numpy(dtype=np.int64)
    n_docs = len(doc_ids)
    summary = {
        "n_docs": int(n_docs),
        "sum_dl": int(dl_per_doc.sum()),
        "doc_lo": int(doc_ids.min()) if n_docs else -1,
        "doc_hi": int(doc_ids.max()) if n_docs else -1,
    }

    total_toks = int(dl_per_doc.sum())
    if total_toks == 0:
        empty = pd.DataFrame(
            columns=[
                "term", "df", "ctf", "max_tf", "tf_offset", "dl_offset",
                "checksum", "blob", "block_last_doc", "block_max_tf",
                "block_min_dl",
            ]
        )
        summary.update({"n_terms": 0, "n_postings": 0, "crc": 0})
        return empty, summary

    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists])
    tok_doc = np.repeat(np.arange(n_docs), dl_per_doc)

    # factorize terms -> int codes (C-speed), then one lexsort drives
    # everything: postings come out term-grouped and docID-sorted.
    codes, uniques = pd.factorize(flat_terms, sort=True)
    order = np.lexsort((tok_doc, codes))
    codes = codes[order]
    tok_doc = tok_doc[order]

    # Run-length boundaries of (term, doc) pairs -> tf.
    new_pair = np.ones(len(codes), dtype=bool)
    new_pair[1:] = (codes[1:] != codes[:-1]) | (tok_doc[1:] != tok_doc[:-1])
    pair_starts = np.flatnonzero(new_pair)
    tfs = np.diff(np.append(pair_starts, len(codes))).astype(np.int64)
    p_codes = codes[pair_starts]
    p_docidx = tok_doc[pair_starts]
    p_doc = doc_ids[p_docidx]
    p_dl = dl_per_doc[p_docidx]

    # Term group boundaries over the postings rows.
    new_term = np.ones(len(p_codes), dtype=bool)
    new_term[1:] = p_codes[1:] != p_codes[:-1]
    t_starts = np.flatnonzero(new_term)
    t_counts = np.diff(np.append(t_starts, len(p_codes))).astype(np.int64)
    n_terms = len(t_starts)

    # docID deltas with reset at term starts.
    deltas = np.empty_like(p_doc)
    deltas[0] = p_doc[0]
    deltas[1:] = p_doc[1:] - p_doc[:-1]
    deltas[t_starts] = p_doc[t_starts]

    doc_buf, doc_ends = _varint_encode_with_bounds(deltas.astype(np.uint64))
    tf_buf, tf_ends = _varint_encode_with_bounds(tfs.astype(np.uint64))
    dl_buf, dl_ends = _varint_encode_with_bounds(p_dl.astype(np.uint64))

    t_ends_rows = t_starts + t_counts  # exclusive end row of each term
    def sect_bounds(ends):
        hi = ends[t_ends_rows - 1]
        lo = np.empty_like(hi)
        lo[0] = 0
        lo[1:] = hi[:-1]
        return lo, hi

    d_lo, d_hi = sect_bounds(doc_ends)
    f_lo, f_hi = sect_bounds(tf_ends)
    l_lo, l_hi = sect_bounds(dl_ends)

    # Skip blocks: global start row of every block of every term.
    blocks_per_term = (t_counts + SKIP_BLOCK - 1) // SKIP_BLOCK
    total_blocks = int(blocks_per_term.sum())
    block_term = np.repeat(np.arange(n_terms), blocks_per_term)
    first_block = np.concatenate(([0], np.cumsum(blocks_per_term)[:-1]))
    block_in_term = np.arange(total_blocks) - first_block[block_term]
    block_starts = t_starts[block_term] + block_in_term * SKIP_BLOCK

    blk_last = np.maximum.reduceat(p_doc, block_starts)
    blk_maxtf = np.maximum.reduceat(tfs, block_starts).astype(np.int32)
    blk_mindl = np.minimum.reduceat(p_dl, block_starts).astype(np.int32)

    ctf = np.add.reduceat(tfs, t_starts).astype(np.int64)
    max_tf = np.maximum.reduceat(tfs, t_starts).astype(np.int32)

    mv_doc, mv_tf, mv_dl = memoryview(doc_buf), memoryview(tf_buf), memoryview(dl_buf)
    blobs, checksums = [], np.empty(n_terms, dtype=np.int64)
    seg_crc = 0
    for i in range(n_terms):
        blob = bytes(mv_doc[d_lo[i]:d_hi[i]]) + bytes(mv_tf[f_lo[i]:f_hi[i]]) + bytes(
            mv_dl[l_lo[i]:l_hi[i]]
        )
        blobs.append(blob)
        c = zlib.crc32(blob) & 0xFFFFFFFF
        checksums[i] = c
        seg_crc = zlib.crc32(blob, seg_crc) & 0xFFFFFFFF

    b_lo = first_block
    b_hi = first_block + blocks_per_term
    rows = pd.DataFrame(
        {
            "term": uniques.astype(object),
            "df": t_counts.astype(np.int32),
            "ctf": ctf,
            "max_tf": max_tf,
            "tf_offset": (d_hi - d_lo).astype(np.int32),
            "dl_offset": (d_hi - d_lo + f_hi - f_lo).astype(np.int32),
            "checksum": checksums,
            "blob": pd.Series(blobs, dtype=object),
            "block_last_doc": [blk_last[b_lo[i]:b_hi[i]] for i in range(n_terms)],
            "block_max_tf": [blk_maxtf[b_lo[i]:b_hi[i]] for i in range(n_terms)],
            "block_min_dl": [blk_mindl[b_lo[i]:b_hi[i]] for i in range(n_terms)],
        }
    )
    summary.update(
        {"n_terms": int(n_terms), "n_postings": int(len(p_codes)), "crc": int(seg_crc)}
    )
    return rows, summary
