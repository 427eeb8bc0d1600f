"""Codec round-trip goldens — the analog of the reference's
compress/decompress symmetry tests (``codecs/residual.py``) and index
reload tests (``tests/test_fast_plaid.py``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pylate_spark.functions.codec import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)
from pylate_spark.plans.segments import encode_group_arrow, blocks_from_row


def test_varint_golden():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 10**12], dtype=np.int64)
    buf = varint_encode(vals)
    # 0..127 -> 1 byte, 128..16383 -> 2 bytes, etc.
    assert buf[0] == 0 and buf[1] == 1 and buf[2] == 127
    assert buf[3] == 0x80 and buf[4] == 0x01  # 128
    np.testing.assert_array_equal(varint_decode(buf), vals)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**52), max_size=200))
def test_varint_roundtrip_property(vals):
    arr = np.asarray(vals, dtype=np.int64)
    np.testing.assert_array_equal(varint_decode(varint_encode(arr)), arr)


def _random_postings(n, seed=0, max_docid=10**9):
    rng = np.random.Generator(np.random.Philox(key=seed, counter=0))
    docids = np.sort(rng.choice(max_docid, size=n, replace=False))
    tfs = rng.integers(1, 50, size=n)
    dls = rng.integers(5, 400, size=n)
    return docids.astype(np.int64), tfs.astype(np.int64), dls.astype(np.int64)


@pytest.mark.parametrize("n", [1, 5, 128, 129, 1000])
def test_postings_roundtrip(n):
    docids, tfs, dls = _random_postings(n)
    payload, blocks = encode_postings(docids, tfs, dls, block_size=128)
    d, t, l = decode_postings(payload, blocks)
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(l, dls)
    # block metadata invariants
    assert blocks.first[0] == docids[0]
    assert blocks.last[-1] == docids[-1]
    assert blocks.n.sum() == n
    assert blocks.max_tf.max() == tfs.max()
    assert blocks.min_dl.min() == dls.min()


@settings(max_examples=40, deadline=None)
@given(
    docid_steps=st.lists(st.integers(min_value=1, max_value=2**40), min_size=1, max_size=300),
    tf_seed=st.integers(min_value=0, max_value=2**31),
    block_size=st.sampled_from([1, 2, 64, 128, 1024]),
    base=st.sampled_from([0, 1, 2**31 - 1, 2**31, 10**12]),
)
def test_postings_roundtrip_property(docid_steps, tf_seed, block_size, base):
    """Property form of the round-trip: ANY strictly-increasing int64
    docid sequence (including gaps past 2^31 and bases past int32 — the
    class of bug the round-2 overflow fix caught once), any tf/dl, any
    block size must round-trip exactly, with valid block metadata."""
    docids = base + np.cumsum(np.asarray(docid_steps, dtype=np.int64))
    rng = np.random.Generator(np.random.Philox(key=tf_seed, counter=0))
    n = docids.size
    tfs = rng.integers(1, 1000, size=n).astype(np.int64)
    dls = rng.integers(1, 5000, size=n).astype(np.int64)
    payload, blocks = encode_postings(docids, tfs, dls, block_size=block_size)
    d, t, l = decode_postings(payload, blocks)
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(l, dls)
    assert blocks.n.sum() == n
    assert blocks.first[0] == docids[0] and blocks.last[-1] == docids[-1]
    # per-block bounds are true bounds (the pruning-soundness inputs)
    off = 0
    for i in range(blocks.n.size):
        m = int(blocks.n[i])
        assert blocks.max_tf[i] == tfs[off:off + m].max()
        assert blocks.min_dl[i] == dls[off:off + m].min()
        assert blocks.first[i] == docids[off] and blocks.last[i] == docids[off + m - 1]
        off += m


def test_selective_block_decode():
    docids, tfs, dls = _random_postings(1000, seed=3)
    payload, blocks = encode_postings(docids, tfs, dls, block_size=128)
    sel = np.array([0, 3, 7])
    d, t, l = decode_postings(payload, blocks, select=sel)
    expect = np.concatenate([np.arange(s * 128, min((s + 1) * 128, 1000)) for s in sel])
    np.testing.assert_array_equal(d, docids[expect])
    np.testing.assert_array_equal(t, tfs[expect])
    np.testing.assert_array_equal(l, dls[expect])


def test_encode_group_arrow_matches_single_term_codec():
    """The production multi-group Arrow encoder must emit exactly what
    the single-term codec emits per (shard, term)."""
    import zlib

    rng = np.random.Generator(np.random.Philox(key=9, counter=0))
    frames = []
    expected = {}
    for shard in (0, 1):
        for term in ("alpha", "beta", "gamma"):
            n = int(rng.integers(1, 400))
            base = shard * 10_000
            docids = base + np.sort(rng.choice(5000, size=n, replace=False))
            tfs = rng.integers(1, 30, size=n)
            dls = rng.integers(5, 300, size=n)
            frames.append(
                pd.DataFrame({"shard": shard, "term": term, "docid": docids, "tf": tfs, "dl": dls})
            )
            expected[(shard, term)] = (docids.astype(np.int64), tfs.astype(np.int64), dls.astype(np.int64))
    pdf = pd.concat(frames).sort_values(["shard", "term", "docid"]).reset_index(drop=True)
    buckets = np.array([zlib.crc32(t.encode()) % 8 for t in pdf["term"]], dtype=np.int64)
    out = encode_group_arrow(
        pdf["shard"].to_numpy(np.int64),
        buckets,
        pdf["term"].to_numpy(object),
        pdf["docid"].to_numpy(np.int64),
        pdf["tf"].to_numpy(np.int64),
        pdf["dl"].to_numpy(np.int64),
        64,
    ).to_pandas()
    assert len(out) == 6
    for _, row in out.iterrows():
        docids, tfs, dls = expected[(row["shard"], row["term"])]
        payload, blocks = encode_postings(docids, tfs, dls, block_size=64)
        assert bytes(row["payload"]) == payload
        d, t, l = decode_postings(row["payload"], blocks_from_row(row))
        np.testing.assert_array_equal(d, docids)
        np.testing.assert_array_equal(t, tfs)
        np.testing.assert_array_equal(l, dls)
        assert row["df"] == len(docids)
        assert row["cf"] == tfs.sum()
