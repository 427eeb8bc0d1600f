"""End-to-end rank-identity: build index → search (both modes) →
compare against the pure-python oracle — the analog of the reference's
end-to-end retrieval tests (``tests/test_retriever.py:6-80``) plus its
legacy-equivalence pattern (``tests/test_colbert_scores.py:53-84``)."""

from __future__ import annotations

import numpy as np
import pytest

from pylate_spark.config import BM25Params, IndexConfig
from pylate_spark.oracle import OracleIndex
from pylate_spark.plans.build import build_index
from pylate_spark.plans.query import InvertedIndex, bm25_scan_topk

K = 10


def _oracle_results(pages_pdf, queries_pdf, k=K, allowed=None):
    docs = list(zip(range(len(pages_pdf)), pages_pdf["text"]))  # docid == url rank == index
    oracle = OracleIndex(docs)
    qs = list(zip(queries_pdf["query_id"], queries_pdf["text"]))
    return oracle.search_all(qs, k=k, allowed=allowed), oracle


def _collect_ranked(df):
    return [
        (r["query_id"], r["rank"], r["docid"], r["score"])
        for r in df.orderBy("query_id", "rank").collect()
    ]


def assert_rank_identical(got, want, score_tol=1e-5):
    got_ids = [(q, r, d) for q, r, d, _ in got]
    want_ids = [(q, r, d) for q, r, d, _ in want]
    assert got_ids == want_ids
    gs = np.array([s for *_, s in got])
    ws = np.array([s for *_, s in want])
    np.testing.assert_allclose(gs, ws, rtol=score_tol)


@pytest.fixture(scope="module")
def built_index(spark, pages_t2, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx") / "t2")
    cfg = IndexConfig(shard_size=256, block_size=64, term_buckets=16, bm25=BM25Params())
    manifest = build_index(spark, pages_t2, d, config=cfg, shards_per_batch=4)
    return d, manifest


def test_manifest_stats_match_oracle(built_index, pages_t2_pdf):
    d, manifest = built_index
    docs = list(zip(range(len(pages_t2_pdf)), pages_t2_pdf["text"]))
    oracle = OracleIndex(docs)
    assert manifest["n_docs"] == oracle.n_docs
    assert manifest["avgdl"] == pytest.approx(oracle.avgdl, rel=1e-12)
    assert manifest["finalized"]
    assert manifest["n_postings"] == sum(len(p) for p in oracle.postings.values())


@pytest.mark.parametrize("mode", ["exhaustive", "cascade"])
def test_search_rank_identical_to_oracle(spark, built_index, pages_t2_pdf, queries_pdf, mode):
    d, _ = built_index
    idx = InvertedIndex(spark, d)
    qs = list(zip(queries_pdf["query_id"].tolist(), queries_pdf["text"].tolist()))
    got = _collect_ranked(idx.search(qs, k=K, mode=mode))
    want, _ = _oracle_results(pages_t2_pdf, queries_pdf, k=K)
    assert_rank_identical(got, want)


def test_cascade_equals_exhaustive(spark, built_index, queries_pdf):
    """WAND-family pruning must be invisible in results (the reference's
    equivalence discipline)."""
    d, _ = built_index
    idx = InvertedIndex(spark, d)
    qs = list(zip(queries_pdf["query_id"].tolist(), queries_pdf["text"].tolist()))
    a = _collect_ranked(idx.search(qs, k=K, mode="cascade"))
    b = _collect_ranked(idx.search(qs, k=K, mode="exhaustive"))
    assert a == b


def test_subset_filter(spark, built_index, pages_t2_pdf, queries_pdf):
    """Allow-list restriction (reference: fast_plaid.py:318-340)."""
    d, _ = built_index
    idx = InvertedIndex(spark, d)
    allowed = list(range(0, len(pages_t2_pdf), 3))
    qs = list(zip(queries_pdf["query_id"].tolist()[:10], queries_pdf["text"].tolist()[:10]))
    got = _collect_ranked(idx.search(qs, k=K, subset=allowed))
    want, _ = _oracle_results(pages_t2_pdf, queries_pdf.iloc[:10], k=K, allowed=set(allowed))
    assert_rank_identical(got, want)


def test_final_merge_has_partial_window_group_limit(spark, built_index, queries_pdf):
    """The global top-k merge deliberately relies on Catalyst's
    WindowGroupLimit: a partial limit below the final exchange forwards
    at most k rows per query per map partition, which is what bounds
    the per-query reducer at the 10^6-shard design point (PLANS.md §1).
    Round 3 measured two hand-rolled pre-reductions as strictly worse
    and removed them — this pins the built-in so a plan regression
    (e.g. a window rewrite that defeats the optimization) is caught."""
    import contextlib
    import io

    d, _ = built_index
    idx = InvertedIndex(spark, d)
    qs = list(zip(queries_pdf["query_id"].tolist()[:5], queries_pdf["text"].tolist()[:5]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        idx.search(qs, k=K).explain("formatted")
    plan = buf.getvalue()
    assert plan.count("WindowGroupLimit") >= 2, plan  # partial + final
    assert "MapInPandas" not in plan, plan  # no redundant python hop


def test_subset_filter_large_broadcast(spark, built_index, pages_t2_pdf, queries_pdf):
    """A large allow-list (> SUBSET_BROADCAST_THRESHOLD) takes the
    broadcast path instead of riding every task closure; results must be
    rank-identical to the small-list closure path. The list is padded
    with nonexistent docids so its *semantics* equal the small list."""
    from pylate_spark.plans.query import SUBSET_BROADCAST_THRESHOLD

    d, _ = built_index
    idx = InvertedIndex(spark, d)
    allowed = list(range(0, len(pages_t2_pdf), 3))
    pad_base = 10_000_000  # far past any real docid
    big = allowed + list(range(pad_base, pad_base + SUBSET_BROADCAST_THRESHOLD + 5000))
    qs = list(zip(queries_pdf["query_id"].tolist()[:10], queries_pdf["text"].tolist()[:10]))
    got = _collect_ranked(idx.search(qs, k=K, subset=big))
    want, _ = _oracle_results(pages_t2_pdf, queries_pdf.iloc[:10], k=K, allowed=set(allowed))
    assert_rank_identical(got, want)


def test_scan_topk_matches_oracle(spark, pages_t2, pages_t2_pdf, queries_pdf):
    """Index-free declarative path (pure DataFrame ops)."""
    from pylate_spark.operators.docids import assign_docids

    with_ids = assign_docids(pages_t2, shard_size=256)
    docs = with_ids.select("docid", "text")
    queries = pages_t2.sparkSession.createDataFrame(queries_pdf.iloc[:15])
    got = _collect_ranked(bm25_scan_topk(docs, queries, k=K))
    want, _ = _oracle_results(pages_t2_pdf, queries_pdf.iloc[:15], k=K)
    assert_rank_identical(got, want)


def test_doc_vectors_roundtrip(spark, built_index, pages_t2_pdf):
    """Reconstructing a document's indexed representation must equal
    re-tokenizing its text (the get_documents_embeddings analog)."""
    from collections import Counter

    from pylate_spark.functions.tokenize import tokenize_py
    from pylate_spark.plans.query import InvertedIndex

    d, _ = built_index
    idx = InvertedIndex(spark, d)
    target = [5, 123, 1999]
    rows = idx.doc_vectors(target).collect()
    got = {}
    for r in rows:
        got.setdefault(r["docid"], {})[r["term"]] = (r["tf"], r["dl"])
    assert set(got) == set(target)
    for docid in target:
        toks = tokenize_py(pages_t2_pdf["text"].iloc[docid])
        want = Counter(toks)
        assert {t: tf for t, (tf, _) in got[docid].items()} == dict(want)
        assert all(dl == len(toks) for _, dl in got[docid].values())


def test_large_query_batch_broadcast(spark, tmp_path, monkeypatch):
    """A query batch whose planning payload (query-term pairs + idf)
    exceeds QUERYSET_BROADCAST_THRESHOLD must ride ONE broadcast per
    search, keeping the per-task closure small — the same treatment the
    subset allow-list gets. Built here: a ~10^5-distinct-term corpus
    where query i's terms are exactly doc i's terms (df=1 each), so
    rank 1 for query i must be docid i — a structural oracle that needs
    no python rescoring at this vocabulary size."""
    import pandas as pd

    import pylate_spark.plans.query as Q

    n_docs, tpd = 850, 120  # 102,000 distinct terms / query-term pairs
    pdf = pd.DataFrame(
        {
            "url": [f"https://bigq.example/{i:06d}" for i in range(n_docs)],
            "text": [" ".join(f"t{i:04d}x{j:03d}" for j in range(tpd)) for i in range(n_docs)],
        }
    )
    d = str(tmp_path / "bigq_idx")
    build_index(
        spark,
        spark.createDataFrame(pdf),
        d,
        config=IndexConfig(shard_size=128, block_size=32, term_buckets=8),
        shards_per_batch=4,
    )
    idx = InvertedIndex(spark, d)
    qs = [(i, pdf["text"].iloc[i]) for i in range(n_docs)]

    res = idx.search(qs, k=3).where("rank = 1").collect()
    assert idx._qset_bc is not None  # broadcast path engaged at default threshold
    # the closure shipped to every task must NOT contain the 10^5-term
    # payload (that's what the broadcast is for)
    assert idx._last_closure_bytes < 100_000, idx._last_closure_bytes
    assert {(r["query_id"], r["docid"]) for r in res} == {(i, i) for i in range(n_docs)}

    # identity between the broadcast path and the closure path
    sub = qs[:40]
    monkeypatch.setattr(Q, "QUERYSET_BROADCAST_THRESHOLD", 1)
    got_bc = _collect_ranked(idx.search(sub, k=5))
    small_closure = idx._last_closure_bytes
    monkeypatch.setattr(Q, "QUERYSET_BROADCAST_THRESHOLD", 1 << 40)
    got_closure = _collect_ranked(idx.search(sub, k=5))
    assert got_bc == got_closure
    assert idx._last_closure_bytes > small_closure  # payload moved back into the closure


def test_search_join_rank_identical(spark, built_index, queries_pdf):
    """The fully distributed (scatter-by-term) path must be
    rank-identical to the driver-planned kernel path on the same
    index — including after a delete (tombstones flow through the
    anti-join instead of the kernel mask)."""
    d, _ = built_index
    idx = InvertedIndex(spark, d)
    qdf = spark.createDataFrame(queries_pdf)
    qs = list(zip(queries_pdf["query_id"].tolist(), queries_pdf["text"].tolist()))
    got = _collect_ranked(idx.search_join(qdf, k=K, round_to=4))
    want = _collect_ranked(idx.search(qs, k=K, mode="exhaustive", round_to=4))
    assert got == want


def test_search_join_after_delete(spark, built_index, queries_pdf, tmp_path):
    import shutil

    from pylate_spark.plans.maintenance import delete_documents

    d, _ = built_index
    d2 = str(tmp_path / "join_del")
    shutil.copytree(d, d2)
    # delete the top doc of the first query, then both paths must agree
    idx = InvertedIndex(spark, d2)
    qdf = spark.createDataFrame(queries_pdf.iloc[:5])
    qs = list(zip(queries_pdf["query_id"].tolist()[:5], queries_pdf["text"].tolist()[:5]))
    top = idx.search(qs[:1], k=1).collect()[0]["docid"]
    delete_documents(spark, d2, [int(top)])
    idx = InvertedIndex(spark, d2)
    got = _collect_ranked(idx.search_join(qdf, k=K, round_to=4))
    want = _collect_ranked(idx.search(qs, k=K, mode="exhaustive", round_to=4))
    assert got == want
    assert not any(r[2] == top for r in got if r[0] == qs[0][0])


@pytest.mark.parametrize("cutoff", [0, 5, 10**9])
def test_search_join_two_phase_cutoff_sweep(spark, built_index, queries_pdf, cutoff):
    """The two-phase MaxScore plan must be exact at EVERY head/rare
    split: cutoff=0 routes every term through the head phase (all
    queries take the unbounded leg), 10^9 routes everything through
    phase 1 (pure rare scatter), 5 mixes both legs — all three must be
    rank-identical to the exhaustive kernel path."""
    d, _ = built_index
    idx = InvertedIndex(spark, d)
    qdf = spark.createDataFrame(queries_pdf.iloc[:12])
    qs = list(zip(queries_pdf["query_id"].tolist()[:12], queries_pdf["text"].tolist()[:12]))
    got = _collect_ranked(
        idx.search_join(qdf, k=K, round_to=4, two_phase=True, head_df_cutoff=cutoff)
    )
    want = _collect_ranked(idx.search(qs, k=K, mode="exhaustive", round_to=4))
    assert got == want


def test_search_join_auto_plan_choice(spark, built_index, queries_pdf, monkeypatch):
    """``two_phase="auto"`` is a cost-based choice from aggregate term
    stats only. Forcing the cutoff to the extremes pins both outcomes:
    cutoff=10^9 → no head terms → the estimator's head savings are 0 →
    single-phase; cutoff=0 → every shared term is a head term with
    positive fan-out savings → two-phase once the (calibrated,
    bench-scale) machinery constant is zeroed — a test corpus's few
    thousand replicated rows must NOT clear the real ~1.25M/core bar,
    which is itself the third pinned outcome. All plans must stay
    rank-identical to the exhaustive kernel path."""
    import pylate_spark.plans.query as Q

    d, _ = built_index
    idx = InvertedIndex(spark, d)
    qdf = spark.createDataFrame(queries_pdf.iloc[:12])
    qs = list(zip(queries_pdf["query_id"].tolist()[:12], queries_pdf["text"].tolist()[:12]))
    want = _collect_ranked(idx.search(qs, k=K, mode="exhaustive", round_to=4))

    got1 = _collect_ranked(idx.search_join(qdf, k=K, round_to=4, head_df_cutoff=10**9))
    assert idx._last_join_two_phase is False
    assert got1 == want

    # at the real machinery constant, a tiny corpus NEVER warrants
    # two-phase even with every term classed as head
    got2 = _collect_ranked(idx.search_join(qdf, k=K, round_to=4, head_df_cutoff=0))
    assert idx._last_join_two_phase is False
    assert got2 == want

    # zero the machinery bar → the estimator's stats-driven flip shows
    monkeypatch.setattr(Q, "JOIN_MACHINERY_ROWS_PER_CORE", 0)
    got3 = _collect_ranked(idx.search_join(qdf, k=K, round_to=4, head_df_cutoff=0))
    assert idx._last_join_two_phase is True
    assert got3 == want


def test_search_join_segment_scan_is_bucket_pruned(spark, built_index, queries_pdf):
    """The query terms' hash buckets must land as a literal IN-list in
    the segment scan's PartitionFilters (segments are written
    partitionBy(batch, bucket)) — the same directory-level pruning
    search() gets, proven here for the distributed path where DPP
    would decline (the terms side has no selective predicate). Checked
    on BOTH plan variants so neither regresses to a full layout scan."""
    import contextlib
    import io
    import re

    d, _ = built_index
    idx = InvertedIndex(spark, d)
    qdf = spark.createDataFrame(queries_pdf.iloc[:4])
    for cutoff in (10**9, 0):  # single-phase and two-phase plans
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            idx.search_join(qdf, k=K, head_df_cutoff=cutoff).explain("formatted")
        plan = buf.getvalue()
        hits = re.findall(r"PartitionFilters: \[([^\]]*bucket[^\]]*)\]", plan)
        assert hits, (cutoff, plan)  # bucket IN-list reached the scan
        # every segment scan leg in the plan is pruned, none full-scan
        seg_scans = [
            s for s in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
            if "batch" in s or "bucket" in s
        ]
        assert seg_scans and all("bucket" in s for s in seg_scans), (cutoff, plan)
        assert all(re.search(r"bucket.* (IN |INSET )", s) for s in hits), hits


def test_search_join_subset_parity(spark, built_index, pages_t2_pdf, queries_pdf):
    """search_join(subset=) must equal search(subset=) — the kernel
    path's allow-list (fast_plaid.py:318-340) on the distributed path,
    including through the two-phase split."""
    d, _ = built_index
    idx = InvertedIndex(spark, d)
    allowed = list(range(0, len(pages_t2_pdf), 3))
    qdf = spark.createDataFrame(queries_pdf.iloc[:10])
    qs = list(zip(queries_pdf["query_id"].tolist()[:10], queries_pdf["text"].tolist()[:10]))
    got = _collect_ranked(idx.search_join(qdf, k=K, round_to=4, subset=allowed))
    want = _collect_ranked(idx.search(qs, k=K, mode="exhaustive", round_to=4, subset=allowed))
    assert got == want
    # and with a forced head split, so the subset semi-join is exercised
    # on all three decode legs
    got2 = _collect_ranked(
        idx.search_join(
            qdf, k=K, round_to=4, subset=allowed, two_phase=True, head_df_cutoff=3
        )
    )
    assert got2 == want


def test_staging_plan_single_exchange_single_udf(spark, pages_t2):
    """The docid-assignment wide pass must keep exactly ONE shuffle
    exchange (width = bucket count, reused by the window — no second
    exchange at spark.sql.shuffle.partitions) and ONE evaluation of the
    bucket UDF (an offset-join formulation made Catalyst push an
    isnotnull filter below the UDF projection and evaluate it twice).
    Pins the staging bandwidth shape of SCALING.md round 4."""
    import contextlib
    import io

    from pylate_spark.operators.docids import assign_docids

    out = assign_docids(pages_t2.select("url", "text"), 256)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    assert tree.count("ArrowEvalPython") == 1, tree
    assert tree.count("Exchange") == 1, tree


def test_assign_docids_unicode_collation(spark):
    """The staging design depends on python str comparison (used by the
    boundary searchsorted UDF) agreeing with Spark's UTF8 binary sort
    (used inside each bucket): code-point order == UTF-8 byte order for
    valid UTF-8. Exercise it with multi-byte keys — accents, CJK,
    emoji (4-byte), key-prefix ties, digits-vs-letters — across enough
    rows to force many buckets, and require docid == python sorted
    rank exactly."""
    import pandas as pd

    from pylate_spark.operators.docids import assign_docids

    base = [
        "https://a.example/ü-umlaut", "https://a.example/u-plain",
        "https://a.example/日本語/ページ", "https://a.example/中文/页面",
        "https://a.example/🎉emoji", "https://a.example/🎈balloon",
        "https://a.example/", "https://a.example/0", "https://a.example/Z",
        "https://a.example/z", "https://a.example/~tilde",
        "https://café.example/é", "https://cafe.example/e",
    ]
    keys = list({f"{b}/{i:04d}" for b in base for i in range(40)}) + [""]
    pdf = pd.DataFrame({"url": keys + [None], "text": ["x"] * (len(keys) + 1)})
    out = assign_docids(
        spark.createDataFrame(pdf, "url string, text string"), 64, partitions=16
    )
    got = {r["url"]: r["docid"] for r in out.collect()}
    # a null key must not crash the searchsorted UDF; it ranks first —
    # strictly BEFORE a genuine empty-string key (the null-flag
    # secondary order; both bucket as "" but must stay deterministic)
    want = {u: i + 1 for i, u in enumerate(sorted(keys))}
    want[None] = 0
    assert want[""] == 1
    assert got == want
