"""Adversarial dedup property tests: on RANDOM tiny corpora, the
native-expression LSH and SimHash pair pipelines must equal pure-Python
brute-force oracles computed from first principles (regex tokenize →
md5 → min/band/vote) — the same sampling attack
``test_kernel_property.py`` runs on the scoring kernel, here aimed at
the higher-order-function expression surface (where round 5 found a
real nondeterminism bug the fixed fixtures missed: the two-parameter
lambda-closure pitfall, PLANS.md §10).

Small alphabets + short docs maximize collision events: shared bands,
empty-token docs, exact duplicates, single-term docs.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pylate_spark.functions.tokenize import tokenize_py
from pylate_spark.operators import dedup


def _tokens(text: str) -> list[str]:
    # the engine-default token definition (unicode since round 6)
    return tokenize_py(text)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# words from a tiny vocabulary + punctuation/case noise so tokenize
# normalization is exercised, with frequent cross-doc overlap
_word = st.sampled_from(["ax", "by", "cz", "d0", "e1", "AX!", "By,", "", "zz"])
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=12)


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs=_corpus, n_hashes=st.integers(2, 6), band_size=st.integers(1, 3))
def test_lsh_pairs_equal_bruteforce(spark, docs, n_hashes, band_size):
    rows = list(enumerate(docs))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(
            df, n_hashes=n_hashes, band_size=band_size
        ).collect()
    }
    # brute force from first principles
    sigs = {}
    for i, text in rows:
        terms = sorted(set(_tokens(text)))
        if not terms:
            continue
        sigs[i] = [min(_md5(f"{t}#{h}") for t in terms) for h in range(n_hashes)]
    n_bands = (n_hashes + band_size - 1) // band_size
    bands = {
        i: [
            _md5_band(sig[b * band_size : (b + 1) * band_size])
            for b in range(n_bands)
        ]
        for i, sig in sigs.items()
    }
    want = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b and any(x == y for x, y in zip(bands[a], bands[b]))
    }
    assert got == want


def _md5_band(vals: list[str]) -> str:
    return _md5("|".join(sorted(vals)))


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs=_corpus, r=st.integers(0, 6))
def test_simhash_pairs_equal_bruteforce(spark, docs, r):
    rows = list(enumerate(docs))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        (x["doc_a"], x["doc_b"], x["hamming"])
        for x in dedup.simhash_near_dup_pairs(df, max_hamming=r, bits=32).collect()
    }
    sh = {}
    for i, text in rows:
        toks = _tokens(text)
        if not toks:
            continue
        votes = [0] * 32
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t, c in tf.items():
            h = _md5(t)
            for j in range(32):
                votes[j] += c if h[j] >= "8" else -c
        sh[i] = sum(1 << j for j in range(32) if votes[j] > 0)
    want = {
        (a, b, bin(sh[a] ^ sh[b]).count("1"))
        for a in sh
        for b in sh
        if a < b and bin(sh[a] ^ sh[b]).count("1") <= r
    }
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=_corpus,
    n_hashes=st.integers(2, 6),
    band_size=st.integers(1, 3),
    cap=st.integers(1, 4),
)
def test_lsh_pairs_guarded_equal_bruteforce(spark, docs, n_hashes, band_size, cap):
    """r7 first-collision dedup under the mega-bucket guard: the pair
    set must equal the brute-force 'distinct over surviving-bucket
    joins' semantics — including the subtle case where a pair's
    earliest shared band is mega-pruned but a later band survives."""
    rows = list(enumerate(docs))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(
            df, n_hashes=n_hashes, band_size=band_size, max_bucket_size=cap
        ).collect()
    }
    sigs = {}
    for i, text in rows:
        terms = sorted(set(_tokens(text)))
        if terms:
            sigs[i] = [min(_md5(f"{t}#{h}") for t in terms) for h in range(n_hashes)]
    n_bands = (n_hashes + band_size - 1) // band_size
    bands = {
        i: [
            _md5_band(sig[b * band_size : (b + 1) * band_size])
            for b in range(n_bands)
        ]
        for i, sig in sigs.items()
    }
    from collections import Counter

    sizes = Counter((j, bh) for bs in bands.values() for j, bh in enumerate(bs))
    want = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b
        and any(
            x == y and sizes[(j, x)] <= cap
            for j, (x, y) in enumerate(zip(bands[a], bands[b]))
        )
    }
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs=_corpus, r=st.integers(0, 4), cap=st.integers(1, 4))
def test_simhash_pairs_guarded_equal_bruteforce(spark, docs, r, cap):
    """Same guarded first-collision property for the pigeonhole band
    join: exact 'bit_count(xor) <= r over surviving-bucket collisions'
    semantics, brute-forced from first principles."""
    rows = list(enumerate(docs))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        (x["doc_a"], x["doc_b"], x["hamming"])
        for x in dedup.simhash_near_dup_pairs(
            df, max_hamming=r, bits=32, max_bucket_size=cap
        ).collect()
    }
    sh = {}
    for i, text in rows:
        toks = _tokens(text)
        if not toks:
            continue
        votes = [0] * 32
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t, c in tf.items():
            h = _md5(t)
            for j in range(32):
                votes[j] += c if h[j] >= "8" else -c
        sh[i] = sum(1 << j for j in range(32) if votes[j] > 0)
    n_bands = r + 1
    width = (32 + n_bands - 1) // n_bands
    mask = (1 << width) - 1
    bands = {
        i: [(v >> (b * width)) & mask for b in range(n_bands)] for i, v in sh.items()
    }
    from collections import Counter

    sizes = Counter((j, bv) for bs in bands.values() for j, bv in enumerate(bs))
    want = {
        (a, b, bin(sh[a] ^ sh[b]).count("1"))
        for a in sh
        for b in sh
        if a < b
        and bin(sh[a] ^ sh[b]).count("1") <= r
        and any(
            x == y and sizes[(j, x)] <= cap
            for j, (x, y) in enumerate(zip(bands[a], bands[b]))
        )
    }
    assert got == want
