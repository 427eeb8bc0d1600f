"""Segment assembly: many terms' posting lists encoded in one
vectorized pass.

The reference compresses each chunk's embeddings in a single batched
codec call (``ResidualCodec.compress``,
``/root/reference/pylate/indexes/stanford_nlp/codecs/residual.py:180-198``)
rather than per-vector — we do the same at the posting-list level:
:func:`encode_group_frame` takes a pandas frame of ``(shard, term,
docid, tf, dl)`` rows sorted by ``(shard, term, docid)`` and emits one
segment row per ``(shard, term)`` group, computing deltas, varint
bytes, and per-block metadata for *all* groups simultaneously with
numpy (the only Python loop is the final per-group slice assembly).

:func:`group_carry_iterator` adapts this to ``mapInPandas`` streams:
Arrow batches split groups arbitrarily, so the trailing (possibly
incomplete) group of each batch is held back and prepended to the next
— bounded memory, no per-group Spark overhead (contrast with
``applyInPandas``, which would pay a Python call per (shard, term)
group — millions per batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import types as T

from pylate_spark.functions.codec import PostingBlocks

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("shard", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
        T.StructField("b_first", T.ArrayType(T.LongType()), False),
        T.StructField("b_last", T.ArrayType(T.LongType()), False),
        T.StructField("b_n", T.ArrayType(T.IntegerType()), False),
        T.StructField("b_max_tf", T.ArrayType(T.IntegerType()), False),
        T.StructField("b_min_dl", T.ArrayType(T.IntegerType()), False),
        T.StructField("b_off", T.ArrayType(T.LongType()), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def blocks_from_row(row) -> PostingBlocks:
    """Rehydrate :class:`PostingBlocks` from a segment row (pandas row
    or pyspark Row with the SEGMENT_SCHEMA block columns)."""
    return PostingBlocks(
        first=np.asarray(row["b_first"], dtype=np.int64),
        last=np.asarray(row["b_last"], dtype=np.int64),
        n=np.asarray(row["b_n"], dtype=np.int32),
        max_tf=np.asarray(row["b_max_tf"], dtype=np.int32),
        min_dl=np.asarray(row["b_min_dl"], dtype=np.int32),
        off=np.asarray(row["b_off"], dtype=np.int64),
    )


def _crc32_bucket(terms: pd.Series, n_buckets: int) -> np.ndarray:
    """crc32(term) % n_buckets — matches Spark's F.crc32 and Python's
    zlib.crc32, so query drivers can prune buckets without Spark."""
    import zlib

    return np.fromiter(
        (zlib.crc32(t.encode("utf-8")) % n_buckets for t in terms),
        dtype=np.int32,
        count=len(terms),
    )


def encode_group_frame(
    pdf: pd.DataFrame, block_size: int = 128, n_buckets: int = 64
) -> pd.DataFrame:
    """Encode a ``(shard, term, docid, tf, dl)`` frame (sorted by
    shard, term, docid) into segment rows. Fully vectorized across
    groups and blocks."""
    n = len(pdf)
    if n == 0:
        return pd.DataFrame(
            {f.name: pd.Series(dtype=object) for f in SEGMENT_SCHEMA.fields}
        )
    shard = pdf["shard"].to_numpy(dtype=np.int64)
    term = pdf["term"].to_numpy(dtype=object)
    docid = pdf["docid"].to_numpy(dtype=np.int64)
    tf = pdf["tf"].to_numpy(dtype=np.int64)
    dl = pdf["dl"].to_numpy(dtype=np.int64)

    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (term[1:] != term[:-1]) | (shard[1:] != shard[:-1])
    gstart = np.flatnonzero(change)
    ngroups = gstart.size
    gn = np.diff(np.append(gstart, n))
    gid = np.cumsum(change) - 1
    pos_in_g = np.arange(n, dtype=np.int64) - gstart[gid]

    bs_mask = (pos_in_g % block_size) == 0
    bs = np.flatnonzero(bs_mask)
    bend = np.append(bs[1:], n) - 1  # inclusive; blocks never span groups

    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = 0
    deltas[1:] = docid[1:] - docid[:-1]
    deltas[bs] = 0  # first posting of a block is its own base

    interleaved = np.empty(3 * n, dtype=np.int64)
    interleaved[0::3] = deltas
    interleaved[1::3] = tf
    interleaved[2::3] = dl

    v = interleaved.astype(np.uint64)
    nb = np.ones(v.shape, dtype=np.int64)
    for shift in range(7, 64, 7):
        nb += (v >> np.uint64(shift)) > 0
    val_offs = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nb, out=val_offs[1:])
    payload = np.zeros(val_offs[-1], dtype=np.uint8)
    for k in range(int(nb.max())):
        mask = nb > k
        chunk = (v[mask] >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > k).astype(np.uint8) << 7
        payload[val_offs[:-1][mask] + k] = chunk.astype(np.uint8) | cont
    payload_bytes = payload.tobytes()

    b_first = docid[bs]
    b_last = docid[bend]
    b_n = (bend - bs + 1).astype(np.int32)
    b_max_tf = np.maximum.reduceat(tf, bs).astype(np.int32)
    b_min_dl = np.minimum.reduceat(dl, bs).astype(np.int32)
    block_gid = gid[bs]
    b_off = val_offs[3 * bs] - val_offs[3 * gstart[block_gid]]

    g_cf = np.add.reduceat(tf, gstart)
    g_pay_start = val_offs[3 * gstart]
    g_pay_end = val_offs[3 * (gstart + gn)]
    nblocks_per_g = np.bincount(block_gid, minlength=ngroups)
    boff = np.zeros(ngroups + 1, dtype=np.int64)
    np.cumsum(nblocks_per_g, out=boff[1:])

    g_terms = term[gstart]
    buckets = _crc32_bucket(pd.Series(g_terms), n_buckets)
    mv = memoryview(payload_bytes)
    rows = {
        "bucket": buckets,
        "shard": shard[gstart],
        "term": g_terms,
        "df": gn.astype(np.int64),
        "cf": g_cf.astype(np.int64),
        "b_first": [b_first[boff[g]: boff[g + 1]].tolist() for g in range(ngroups)],
        "b_last": [b_last[boff[g]: boff[g + 1]].tolist() for g in range(ngroups)],
        "b_n": [b_n[boff[g]: boff[g + 1]].tolist() for g in range(ngroups)],
        "b_max_tf": [b_max_tf[boff[g]: boff[g + 1]].tolist() for g in range(ngroups)],
        "b_min_dl": [b_min_dl[boff[g]: boff[g + 1]].tolist() for g in range(ngroups)],
        "b_off": [b_off[boff[g]: boff[g + 1]].tolist() for g in range(ngroups)],
        "payload": [bytes(mv[g_pay_start[g]: g_pay_end[g]]) for g in range(ngroups)],
    }
    return pd.DataFrame(rows)


def encode_group_arrow(
    shard: np.ndarray,
    bucket: np.ndarray,
    term: np.ndarray,
    docid: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    block_size: int,
):
    """Arrow-native encode: same math as :func:`encode_group_frame`,
    but the per-group block-metadata lists and payload slices are built
    as zero-copy ``pa.ListArray``/``pa.BinaryArray`` structures —
    no per-group Python loop. Expects input sorted by (shard, term,
    docid); ``bucket`` is precomputed (crc32(term) % B, a native Spark
    column) so no Python hashing happens here either.
    """
    import pyarrow as pa

    n = docid.size
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (term[1:] != term[:-1]) | (shard[1:] != shard[:-1])
    gstart = np.flatnonzero(change)
    ngroups = gstart.size
    gn = np.diff(np.append(gstart, n))
    gid = np.cumsum(change) - 1
    pos_in_g = np.arange(n, dtype=np.int64) - gstart[gid]

    bs_mask = (pos_in_g % block_size) == 0
    bs = np.flatnonzero(bs_mask)
    bend = np.append(bs[1:], n) - 1

    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = 0
    deltas[1:] = docid[1:] - docid[:-1]
    deltas[bs] = 0

    interleaved = np.empty(3 * n, dtype=np.int64)
    interleaved[0::3] = deltas
    interleaved[1::3] = tf
    interleaved[2::3] = dl

    v = interleaved.astype(np.uint64)
    nb = np.ones(v.shape, dtype=np.int64)
    for shift in range(7, 64, 7):
        nb += (v >> np.uint64(shift)) > 0
    val_offs = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nb, out=val_offs[1:])
    payload = np.zeros(val_offs[-1], dtype=np.uint8)
    for k in range(int(nb.max())):
        mask = nb > k
        chunk = (v[mask] >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > k).astype(np.uint8) << 7
        payload[val_offs[:-1][mask] + k] = chunk.astype(np.uint8) | cont

    b_first = docid[bs]
    b_last = docid[bend]
    b_n = (bend - bs + 1).astype(np.int32)
    b_max_tf = np.maximum.reduceat(tf, bs).astype(np.int32)
    b_min_dl = np.minimum.reduceat(dl, bs).astype(np.int32)
    block_gid = gid[bs]
    b_off = val_offs[3 * bs] - val_offs[3 * gstart[block_gid]]

    g_cf = np.add.reduceat(tf, gstart).astype(np.int64)
    nblocks_per_g = np.bincount(block_gid, minlength=ngroups)
    boff = np.zeros(ngroups + 1, dtype=np.int32)
    np.cumsum(nblocks_per_g, out=boff[1:])
    list_offsets = pa.array(boff)

    # payload groups tile the byte stream contiguously → zero-copy binary
    pay_offs = np.empty(ngroups + 1, dtype=np.int32)
    pay_offs[:-1] = val_offs[3 * gstart]
    pay_offs[-1] = val_offs[-1]
    payload_arr = pa.Array.from_buffers(
        pa.binary(), ngroups,
        [None, pa.py_buffer(pay_offs.tobytes()), pa.py_buffer(payload.tobytes())],
    )

    def list_arr(vals, typ):
        return pa.ListArray.from_arrays(list_offsets, pa.array(vals, type=typ))

    return pa.RecordBatch.from_arrays(
        [
            pa.array(bucket[gstart], type=pa.int32()),
            pa.array(shard[gstart], type=pa.int64()),
            pa.array(term[gstart], type=pa.string()),
            pa.array(gn, type=pa.int64()),
            pa.array(g_cf, type=pa.int64()),
            list_arr(b_first, pa.int64()),
            list_arr(b_last, pa.int64()),
            list_arr(b_n, pa.int32()),
            list_arr(b_max_tf, pa.int32()),
            list_arr(b_min_dl, pa.int32()),
            list_arr(b_off, pa.int64()),
            payload_arr,
        ],
        names=[
            "bucket", "shard", "term", "df", "cf",
            "b_first", "b_last", "b_n", "b_max_tf", "b_min_dl", "b_off", "payload",
        ],
    )


def arrow_carry_iterator(batches, block_size: int):
    """mapInArrow adapter: encode complete (shard, term) groups per
    Arrow batch, carrying the trailing incomplete group forward.
    Input columns: shard, bucket, term, docid, tf, dl — sorted by
    (shard, term, docid) within the partition."""
    import pyarrow as pa

    leftover = None
    for rb in batches:
        tbl = pa.Table.from_batches([rb])
        if leftover is not None and leftover.num_rows:
            tbl = pa.concat_tables([leftover, tbl])
            leftover = None
        if tbl.num_rows == 0:
            continue
        shard = tbl.column("shard").to_numpy()
        term = np.asarray(tbl.column("term").to_pandas(), dtype=object)
        last_s, last_t = shard[-1], term[-1]
        is_tail = (shard == last_s) & (term == last_t)
        nz = np.flatnonzero(~is_tail)
        tail_start = (nz[-1] + 1) if nz.size else 0
        leftover = tbl.slice(tail_start).combine_chunks()
        if tail_start:
            head = tbl.slice(0, tail_start)
            yield encode_group_arrow(
                shard[:tail_start],
                head.column("bucket").to_numpy(),
                term[:tail_start],
                head.column("docid").to_numpy(),
                head.column("tf").to_numpy().astype(np.int64),
                head.column("dl").to_numpy().astype(np.int64),
                block_size,
            )
    if leftover is not None and leftover.num_rows:
        yield encode_group_arrow(
            leftover.column("shard").to_numpy(),
            leftover.column("bucket").to_numpy(),
            np.asarray(leftover.column("term").to_pandas(), dtype=object),
            leftover.column("docid").to_numpy(),
            leftover.column("tf").to_numpy().astype(np.int64),
            leftover.column("dl").to_numpy().astype(np.int64),
            block_size,
        )


def group_carry_iterator(
    batches: Iterator[pd.DataFrame],
    block_size: int,
    n_buckets: int,
    group_cols: tuple[str, str] = ("shard", "term"),
) -> Iterator[pd.DataFrame]:
    """mapInPandas adapter: encode complete (shard, term) groups per
    Arrow batch, carrying the trailing incomplete group forward."""
    leftover: pd.DataFrame | None = None
    for pdf in batches:
        if leftover is not None and len(leftover):
            pdf = pd.concat([leftover, pdf], ignore_index=True)
            leftover = None
        if not len(pdf):
            continue
        s = pdf[group_cols[0]].to_numpy()
        t = pdf[group_cols[1]].to_numpy(dtype=object)
        last_s, last_t = s[-1], t[-1]
        tail_start = len(pdf)
        # walk back over the trailing group only (bounded by group size)
        is_tail = (s == last_s) & (t == last_t)
        # find first index of the trailing run
        nz = np.flatnonzero(~is_tail)
        tail_start = (nz[-1] + 1) if nz.size else 0
        leftover = pdf.iloc[tail_start:].copy()
        head = pdf.iloc[:tail_start]
        if len(head):
            yield encode_group_frame(head, block_size=block_size, n_buckets=n_buckets)
    if leftover is not None and len(leftover):
        yield encode_group_frame(leftover, block_size=block_size, n_buckets=n_buckets)
