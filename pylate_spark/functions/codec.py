"""Posting-list codec: delta encoding + varint compression, blocked,
with per-block max-score metadata.

This is the engine's analog of the reference's residual codec
(``pylate/indexes/stanford_nlp/codecs/residual.py:180-223`` compress /
``:271-309`` decompress): a compact binary payload per index cell plus
the side metadata needed for pruning. Where the reference stores
bit-packed quantized residuals per centroid, we store, per term,
docid-ascending postings as varint-encoded ``(delta, tf, dl)`` triples
in blocks of ``block_size``, and per block the exact quantities a
query-time upper bound needs: ``(first_docid, last_docid, n, max_tf,
min_dl, byte offset)``.

Storing ``max_tf`` and ``min_dl`` (rather than a precomputed max score)
keeps block upper bounds valid under incremental corpus growth: BM25's
term score is monotonically increasing in tf and decreasing in dl, so
``ub = idf_now * tfn(max_tf, min_dl)`` is a true upper bound for any
current (N, avgdl, df) — the property the reference loses when
centroids go stale after ``IndexUpdater.add`` (it warns about exactly
this, ``pylate/indexes/fast_plaid.py:210-227``).

Everything here is numpy-vectorized; no per-value Python loops (the
loops below are over *byte positions* (≤10) and fixed block structure,
not over postings).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["encode_postings", "decode_postings", "decode_docids", "PostingBlocks"]


# --- vectorized varint ----------------------------------------------------

def varint_encode_offsets(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a non-negative int array, fully vectorized.

    Returns ``(bytes_uint8, per_value_byte_offsets[n+1])`` — the single
    shared encoder core; the offsets let callers slice the stream at
    value boundaries (block offsets, per-group payload spans) without
    re-walking it. The loops below are over *byte positions* (≤10), not
    values.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    offs = np.zeros(v.size + 1, dtype=np.int64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), offs
    # bytes needed per value: 1 + floor(bit_length / 7) for bit_length>0
    nb = np.ones(v.shape, dtype=np.int64)
    for shift in range(7, 64, 7):
        nb += (v >> np.uint64(shift)) > 0
    np.cumsum(nb, out=offs[1:])
    out = np.zeros(offs[-1], dtype=np.uint8)
    for k in range(int(nb.max())):
        mask = nb > k
        chunk = (v[mask] >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > k).astype(np.uint8) << 7
        out[offs[:-1][mask] + k] = chunk.astype(np.uint8) | cont
    return out, offs


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int64 array, fully vectorized."""
    return varint_encode_offsets(values)[0].tobytes()


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a LEB128 stream to int64, fully vectorized.

    Pure integer path: one masked gather+shift per byte position
    (varints here are <= 9 bytes; typically 1-2), no float weights —
    the decode is memory-bandwidth-bound in the query hot path, so
    traffic per posting matters more than instruction count.
    """
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    # keep the per-byte intermediates at 1 byte each — materializing
    # them as int64 was 8× the payload in memory traffic, and the
    # decode is bandwidth-bound; widen to int64 only at the per-value
    # gather (which is 1-2 bytes/value in practice)
    low = b & 0x7F
    ends = (b & 0x80) == 0
    end_pos = np.flatnonzero(ends)
    n = end_pos.size
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = end_pos[:-1] + 1
    lens = end_pos - starts + 1
    vals = low[starts].astype(np.int64)
    for j in range(1, int(lens.max())):
        mask = lens > j
        vals[mask] |= low[starts[mask] + j].astype(np.int64) << (7 * j)
    return vals


# --- blocked posting payload ----------------------------------------------

@dataclass
class PostingBlocks:
    """Decoded side metadata for one term's payload (column arrays)."""

    first: np.ndarray   # int64 — first docid of each block (absolute)
    last: np.ndarray    # int64 — last docid of each block
    n: np.ndarray       # int32 — postings per block
    max_tf: np.ndarray  # int32
    min_dl: np.ndarray  # int32
    off: np.ndarray     # int64 — byte offset of each block in the payload


def encode_postings(
    docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block_size: int = 128
) -> tuple[bytes, PostingBlocks]:
    """Encode docid-ascending postings into (payload, block metadata).

    Payload layout per block: varint stream of interleaved
    ``delta, tf, dl`` per posting; the first posting's delta is taken
    against the block's ``first`` docid (hence 0). Blocks are
    self-contained, so (a) selected blocks decode without touching
    earlier bytes and (b) payloads of *adjacent docid ranges* (shards)
    concatenate into a valid payload — that is the trivial-fan-in SPIMI
    merge the doc-range sharding buys us.
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    npost = docids.size
    if npost == 0:
        empty = np.empty(0, dtype=np.int64)
        return b"", PostingBlocks(empty, empty, empty.astype(np.int32), empty.astype(np.int32), empty.astype(np.int32), empty)
    nblocks = (npost + block_size - 1) // block_size
    bstart = np.arange(nblocks, dtype=np.int64) * block_size
    bend = np.minimum(bstart + block_size, npost)

    deltas = np.diff(docids, prepend=docids[0])
    deltas[bstart] = docids[bstart] - docids[bstart]  # 0: delta vs block base
    # re-base: first posting of each block is encoded relative to block 'first'
    interleaved = np.empty(3 * npost, dtype=np.int64)
    interleaved[0::3] = deltas
    interleaved[1::3] = tfs
    interleaved[2::3] = dls

    # encode whole stream at once; compute per-block byte offsets from
    # per-value byte lengths so blocks stay independently sliceable
    payload, val_offs = varint_encode_offsets(interleaved)

    blk_off = val_offs[3 * bstart]
    # per-block aggregates via reduceat (vectorized segmented max/min)
    max_tf = np.maximum.reduceat(tfs, bstart).astype(np.int32)
    min_dl = np.minimum.reduceat(dls, bstart).astype(np.int32)
    blocks = PostingBlocks(
        first=docids[bstart].copy(),
        last=docids[bend - 1].copy(),
        n=(bend - bstart).astype(np.int32),
        max_tf=max_tf,
        min_dl=min_dl,
        off=blk_off.astype(np.int64),
    )
    return payload.tobytes(), blocks


def decode_postings(
    payload: bytes | np.ndarray, blocks: PostingBlocks, select: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode (docids, tfs, dls) from a payload; optionally only the
    block indices in ``select`` (block-skipping decode path)."""
    buf = np.frombuffer(payload, dtype=np.uint8) if isinstance(payload, (bytes, bytearray, memoryview)) else payload
    if buf.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    if select is None:
        vals = varint_decode(buf)
        firsts, ns = blocks.first, blocks.n
    else:
        select = np.asarray(select, dtype=np.int64)
        if select.size == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        off_ext = np.append(blocks.off, buf.size)
        spans = [buf[off_ext[i]: off_ext[i + 1]] for i in select]
        vals = varint_decode(np.concatenate(spans))
        firsts, ns = blocks.first[select], blocks.n[select]
    triples = vals.reshape(-1, 3)
    deltas, tfs, dls = triples[:, 0], triples[:, 1], triples[:, 2]
    # segmented cumsum: global cumsum then re-base each block to 'first'
    csum = np.cumsum(deltas)
    bstart = np.zeros(firsts.size, dtype=np.int64)
    np.cumsum(ns[:-1], out=bstart[1:])
    base = firsts - csum[bstart]
    docids = csum + np.repeat(base, ns)
    return docids, tfs.astype(np.int64), dls.astype(np.int64)


def decode_docids(payload: bytes | np.ndarray, blocks: PostingBlocks) -> np.ndarray:
    """Docids only (same cost as full decode here; kept for API clarity)."""
    return decode_postings(payload, blocks)[0]
