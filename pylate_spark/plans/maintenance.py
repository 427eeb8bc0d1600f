"""Incremental index maintenance: add / delete / compact.

Reference analogs:
- ``add_documents`` without full rebuild —
  ``/root/reference/pylate/indexes/fast_plaid.py:210-227`` and
  ``stanford_nlp/index_updater.py:142-163`` (append new chunks, reuse
  trained codec). Our adds append whole new *build batches* (docids
  start at the next batch-aligned boundary so committed batches are
  never touched — the append is as atomic and resumable as the
  original build), then re-finalize term/corpus stats exactly.
- ``remove_documents`` — ``fast_plaid.py:232-276`` renumbers ids;
  ``index_updater.py:52-69,329-365`` rewrites IVF cells. We use
  tombstones instead (Iceberg-style row-level deletes): a small docid
  set consulted by the query kernel, with *exact* stats adjustment
  (df/cf per term, N, avgdl recomputed from the staged texts of the
  deleted docs), so post-delete scores remain rank-identical to a
  from-scratch oracle. Block metadata stays a valid upper bound under
  deletion (scores only shrink), so the pruning cascade stays exact.
- ``compact`` physically drops tombstoned postings and rewrites
  segments — the analog of the reference's chunk rewrite
  (``index_updater.py:414-460``).

Idempotence / replay contract (used by streaming ingest):
- batch geometry (``shards_per_batch``) is persisted in the manifest at
  build time; adds always reuse it, so new batch ids can never collide
  with committed ones (new ids are allocated past
  ``max(committed batch, staged docid range)``).
- every add is bracketed by manifest commits: a ``pending_add`` marker
  is written *before* staging (so a crash mid-staging is detected and
  the partial batch dirs purged on the next attempt), and the
  ``epoch_key`` (if any) is recorded (streaming keys as max applied
  epoch per checkpoint dir, arbitrary keys in ``applied_epochs``) in
  the same atomic manifest write that commits the staged rows — so a
  replayed epoch either finds its key (skip) or finds no trace of its
  rows (safe to redo). See :mod:`pylate_spark.streaming.ingest`.
"""

from __future__ import annotations

import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pylate_spark import storage
from pylate_spark.config import IndexConfig
from pylate_spark.functions.tokenize import terms_long
from pylate_spark.plans.build import (
    IndexPaths,
    _build_one_batch,
    _finalize,
    _stage_corpus,
    active_dir,
    bump_dir,
    gc_stale_versions,
    load_manifest,
    save_manifest,
)


def _now() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def _persisted_spb(manifest: dict, caller_value: int | None) -> int:
    """The batch geometry fixed at build time. A caller-supplied value
    is validated, never trusted: deriving batch numbers from a
    different shards_per_batch than the build's would collide new batch
    ids with committed manifest entries (silently dropping the docs)."""
    spb = int(manifest.get("shards_per_batch", caller_value or 64))
    if caller_value is not None and caller_value != spb:
        raise ValueError(
            f"index was built with shards_per_batch={spb}; "
            f"got {caller_value} — omit the argument to reuse the built geometry"
        )
    return spb


def _purge_staged_batches(staging_dir: str, first_batch: int) -> None:
    """Remove staged batch partitions >= first_batch (repair path for
    an add that crashed between staging write and manifest commit)."""
    for name in storage.listdir(staging_dir):
        if not name.startswith("batch="):
            continue
        try:
            b = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if b >= first_batch:
            storage.rmtree(storage.join(staging_dir, name))


def _epoch_parts(epoch_key: str) -> tuple[str, int] | None:
    """Split a streaming epoch key ``"{checkpoint_dir}#{epoch_id}"``
    into (stream id, epoch number); None if the tail is not a
    NON-NEGATIVE int. Negative tails are deliberately rejected:
    Structured Streaming epoch ids are non-negative, and accepting
    ``"x#-2"`` would make ``_epoch_applied`` compare ``-2 <= -1``
    (the never-applied default) and silently skip a never-applied
    add — exact-set semantics are the safe fallback for such keys."""
    sid, sep, e = epoch_key.rpartition("#")
    if sep and e.isdigit():
        return sid, int(e)
    return None


def _epoch_applied(manifest: dict, epoch_key: str, monotonic: bool) -> bool:
    if monotonic:
        parts = _epoch_parts(epoch_key)
        if parts is not None and parts[1] <= int(
            manifest.get("applied_epoch_max", {}).get(parts[0], -1)
        ):
            return True
    # exact-set semantics (and pre-round-3 manifests)
    return epoch_key in manifest.get("applied_epochs", [])


def _record_epoch(manifest: dict, epoch_key: str, monotonic: bool) -> None:
    """Record an applied epoch.

    ``monotonic=True`` (the streaming sink's own keys, shaped
    ``"{checkpoint_dir}#{epoch_id}"``): Structured Streaming epoch ids
    are monotonic per checkpoint dir and commit in order through the
    foreachBatch sink, so the max applied epoch per stream fully
    encodes the applied set — O(#streams) manifest growth instead of
    one list entry per micro-batch (O(n²) rewrite churn over a
    long-running stream). Arbitrary caller keys MUST use
    ``monotonic=False`` (exact set semantics): treating any key that
    happens to end in ``#<int>`` as monotonic would silently skip a
    never-applied add whose numeric tail is below a previous one."""
    if monotonic:
        parts = _epoch_parts(epoch_key)
        if parts is None:
            raise ValueError(
                f"monotonic epoch_key must end in '#<int>', got {epoch_key!r}"
            )
        m = manifest.setdefault("applied_epoch_max", {})
        m[parts[0]] = max(int(m.get(parts[0], -1)), parts[1])
    else:
        manifest.setdefault("applied_epochs", []).append(epoch_key)


def _repair_pending_add(paths: IndexPaths, manifest: dict) -> dict:
    """If a previous add crashed between its pending_add marker and the
    staging commit, its orphan staged rows were never indexed — purge
    them before ANY operation that consumes staging (delete stats
    deltas, compact's staging rewrite, docmap re-finalize), not just
    before the next add. The interrupted epoch's source replays it."""
    pending = manifest.get("pending_add")
    if pending:
        _purge_staged_batches(
            active_dir(paths, manifest, "staging"), int(pending["first_new_batch"])
        )
        manifest.pop("pending_add")
        save_manifest(paths, manifest)
    return manifest


def add_documents(
    spark: SparkSession,
    new_pages: DataFrame,
    index_dir: str,
    shards_per_batch: int | None = None,
    key_col: str = "url",
    text_col: str = "text",
    epoch_key: str | None = None,
    epoch_monotonic: bool = False,
) -> dict:
    """Append new documents as fresh build batches.

    New docids start at the next batch-aligned boundary past both the
    current staged maximum AND every batch id the manifest has ever
    committed, so (a) existing committed batches are untouched, (b)
    every (shard, term) run stays unique — no cross-batch posting merge
    is ever needed at query time — and (c) batch ids never collide even
    after a compact emptied the trailing batch.

    ``epoch_key`` makes the add idempotent per key (exactly-once under
    Structured Streaming epoch replay): an already-applied key returns
    immediately; a key whose previous attempt crashed mid-staging is
    detected via the ``pending_add`` manifest marker and its partial
    rows purged before redoing. ``epoch_monotonic=True`` (set by the
    streaming sink, whose ``"{checkpoint}#{epoch}"`` keys commit in
    increasing order) stores only the max applied epoch per stream;
    leave it False for arbitrary caller keys, which keep exact
    per-key semantics.
    """
    paths = IndexPaths(index_dir)
    manifest = load_manifest(paths)
    if not manifest.get("finalized"):
        # a previous add died mid-build: re-staging the same docs would
        # duplicate them under a second docid range — the caller must
        # first complete the interrupted add (without re-passing docs)
        raise ValueError(
            "index has an incomplete add in progress; call "
            "resume_add(spark, index_dir) to finish it, then retry"
        )
    if epoch_key is not None and _epoch_applied(manifest, epoch_key, epoch_monotonic):
        return manifest  # replayed epoch whose rows already committed
    config = IndexConfig.from_dict(manifest["config"])
    spb = _persisted_spb(manifest, shards_per_batch)
    batch_span = config.shard_size * spb

    manifest = _repair_pending_add(paths, manifest)

    staging_dir = active_dir(paths, manifest, "staging")
    cur_max = int(
        spark.read.parquet(staging_dir).agg(F.max("docid")).collect()[0][0] or -1
    )
    committed_max = max((int(k) for k in manifest.get("batches", {})), default=-1)
    next_batch = max(cur_max // batch_span, committed_max) + 1
    docid_base = next_batch * batch_span

    # pre-stage marker: committed BEFORE any staged row becomes visible,
    # so a crash inside the staging job is detectable and repairable
    manifest["pending_add"] = {
        "first_new_batch": next_batch,
        "docid_base": docid_base,
        "epoch_key": epoch_key,
        "at": _now(),
    }
    save_manifest(paths, manifest)

    _stage_corpus(
        spark, new_pages, paths, config, spb, key_col, text_col,
        docid_base=docid_base, staging_dir=staging_dir,
    )
    n_batches = int(
        spark.read.parquet(staging_dir).agg(F.max("batch")).collect()[0][0]
    ) + 1
    manifest["n_batches"] = n_batches
    manifest["finalized"] = False
    manifest.pop("pending_add", None)
    if epoch_key is not None:
        # recorded in the SAME atomic write that commits the staged rows:
        # a replay after this point skips; before it, finds purged rows
        _record_epoch(manifest, epoch_key, epoch_monotonic)
    manifest.setdefault("lineage", []).append(
        {"stage": "add_documents", "at": _now(),
         "docid_base": docid_base, "epoch_key": epoch_key}
    )
    save_manifest(paths, manifest)

    for batch in range(n_batches):
        key = str(batch)
        if manifest["batches"].get(key, {}).get("status") == "committed":
            continue
        manifest["batches"][key] = _build_one_batch(spark, paths, config, batch, spb, manifest)
        save_manifest(paths, manifest)
    return _finalize(spark, paths, config, manifest)


def resume_add(
    spark: SparkSession, index_dir: str, shards_per_batch: int | None = None
) -> dict:
    """Complete an interrupted ``add_documents`` (or initial build that
    was staged but killed mid-batches): builds every uncommitted batch
    from the already-staged corpus and re-finalizes. Idempotent — the
    staged rows carry their docids, so no re-staging and no duplicates
    (the resume discipline of ``collection_indexer.py:64-71``)."""
    paths = IndexPaths(index_dir)
    manifest = load_manifest(paths)
    manifest = _repair_pending_add(paths, manifest)
    if manifest.get("finalized"):
        return manifest
    if not manifest.get("staged"):
        raise ValueError("nothing staged at this index dir; use build_index")
    config = IndexConfig.from_dict(manifest["config"])
    spb = _persisted_spb(manifest, shards_per_batch)
    for batch in range(manifest["n_batches"]):
        key = str(batch)
        if manifest["batches"].get(key, {}).get("status") == "committed":
            continue
        manifest["batches"][key] = _build_one_batch(spark, paths, config, batch, spb, manifest)
        save_manifest(paths, manifest)
    return _finalize(spark, paths, config, manifest)


def delete_documents(spark: SparkSession, index_dir: str, docids: list[int]) -> dict:
    """Tombstone-delete docids with exact stats adjustment.

    The delete is ONE atomic commit: the new tombstone set and the
    adjusted term_stats are written as fresh versioned dirs, and both
    pointer flips land in the same manifest write as the corpus-stats
    update. A crash anywhere before that write leaves the old state
    fully live — a retry redoes the whole delete cleanly (an append-
    then-crash protocol would instead make the retry a silent no-op via
    the double-delete guard, permanently desynchronizing stats from the
    tombstone filter)."""
    paths = IndexPaths(index_dir)
    manifest = load_manifest(paths)
    if not manifest.get("finalized"):
        raise ValueError("delete_documents requires a finalized index")
    manifest = _repair_pending_add(paths, manifest)
    config = IndexConfig.from_dict(manifest["config"])

    ids_df = spark.createDataFrame([(int(d),) for d in docids], "docid long").distinct()
    tomb_dir = active_dir(paths, manifest, "tombstones")
    old_tomb = spark.read.parquet(tomb_dir) if storage.exists(tomb_dir) else None
    if old_tomb is not None:
        # idempotent: ignore ids already tombstoned (double-delete guard)
        ids_df = ids_df.join(old_tomb, "docid", "left_anti")
    ids_df = ids_df.cache()
    if ids_df.count() == 0:
        ids_df.unpersist(blocking=False)
        return manifest
    new_tomb = old_tomb.unionByName(ids_df) if old_tomb is not None else ids_df
    new_tomb.write.mode("overwrite").parquet(
        storage.join(paths.root, bump_dir(manifest, "tombstones"))
    )

    # exact per-term df/cf deltas from the deleted docs' staged text
    staged = spark.read.parquet(active_dir(paths, manifest, "staging"))
    deleted = staged.join(F.broadcast(ids_df), "docid", "inner")
    deltas = (
        terms_long(deleted.select("docid", "text"), pattern=config.token_pattern)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_del"), F.sum("tf").alias("cf_del"))
    )
    ts = spark.read.parquet(active_dir(paths, manifest, "term_stats"))
    new_ts = (
        ts.join(F.broadcast(deltas), "term", "left")
        .withColumn("df", F.col("df") - F.coalesce(F.col("df_del"), F.lit(0)))
        .withColumn("cf", F.col("cf") - F.coalesce(F.col("cf_del"), F.lit(0)))
        .drop("df_del", "cf_del")
        .where(F.col("df") > 0)
    )
    # versioned rewrite: write the new stats dir, flip the pointer in
    # the same manifest commit as the stats update below (no
    # delete-then-move window), GC the old version after
    new_ts.write.mode("overwrite").parquet(
        storage.join(paths.root, bump_dir(manifest, "term_stats"))
    )

    d = deleted.agg(
        F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("n"),
        F.sum("dl").alias("sum_dl"),
    ).collect()[0]
    n_del, dl_del = int(d["n"] or 0), int(d["sum_dl"] or 0)
    sum_dl = manifest.get("sum_dl", round(manifest["avgdl"] * manifest["n_docs"]))
    manifest["n_docs"] = manifest["n_docs"] - n_del
    manifest["sum_dl"] = sum_dl - dl_del
    manifest["avgdl"] = (manifest["sum_dl"] / manifest["n_docs"]) if manifest["n_docs"] else 0.0
    manifest.setdefault("lineage", []).append(
        {"stage": "delete_documents", "at": _now(), "n_deleted": n_del}
    )
    save_manifest(paths, manifest)
    gc_stale_versions(paths, manifest)
    ids_df.unpersist(blocking=False)
    return manifest


def compact(spark: SparkSession, index_dir: str) -> dict:
    """Physically remove tombstoned postings: decode → filter →
    re-encode, one *vectorized* codec pass per Arrow batch (all
    surviving groups of a batch are re-encoded in a single
    ``encode_group_arrow`` call — no per-row Python encode), rewrite
    the segments table, clear tombstones, re-finalize stats — the
    analog of the reference's chunk rewrite on delete
    (``index_updater.py:414-460``)."""
    paths = IndexPaths(index_dir)
    manifest = load_manifest(paths)
    config = IndexConfig.from_dict(manifest["config"])
    manifest = _repair_pending_add(paths, manifest)
    tomb_dir = active_dir(paths, manifest, "tombstones")
    if not storage.exists(tomb_dir):
        return manifest
    tomb = np.sort(
        spark.read.parquet(tomb_dir).toPandas()["docid"].to_numpy(np.int64)
    )
    if tomb.size == 0:
        return manifest
    tomb_bc = spark.sparkContext.broadcast(tomb)
    block_size = config.block_size

    def rewrite(batches):
        import pyarrow as pa

        from pylate_spark.functions.codec import decode_postings
        from pylate_spark.plans.segments import blocks_from_row, encode_group_arrow

        t = tomb_bc.value
        for rb in batches:
            pdf = pa.Table.from_batches([rb]).to_pandas()
            if not len(pdf):
                continue
            payloads = pdf["payload"].to_numpy(object)
            cols = {c: pdf[c].to_numpy(object) for c in
                    ("b_first", "b_last", "b_n", "b_max_tf", "b_min_dl", "b_off")}
            ds, tfs, dls, src, cnt = [], [], [], [], []
            for i in range(len(pdf)):
                row = {c: cols[c][i] for c in cols}
                d, tf, dl = decode_postings(payloads[i], blocks_from_row(row))
                keep = ~np.isin(d, t)
                n = int(keep.sum())
                if n == 0:
                    continue  # every posting of this run was deleted
                ds.append(d[keep])
                tfs.append(tf[keep])
                dls.append(dl[keep])
                src.append(i)
                cnt.append(n)
            if not ds:
                continue
            src_a = np.asarray(src, dtype=np.int64)
            cnt_a = np.asarray(cnt, dtype=np.int64)
            # groups stay contiguous: each input row is one complete
            # (shard, term) run (unique across the table by batch-aligned
            # docid construction), so concatenation in row order is a
            # valid group-sorted long frame
            yield encode_group_arrow(
                np.repeat(pdf["shard"].to_numpy(np.int64)[src_a], cnt_a),
                np.repeat(pdf["bucket"].to_numpy(np.int64)[src_a], cnt_a),
                np.repeat(pdf["term"].to_numpy(object)[src_a], cnt_a),
                np.concatenate(ds),
                np.concatenate(tfs),
                np.concatenate(dls),
                block_size,
            )

    from pylate_spark.plans.segments import SEGMENT_SCHEMA

    new = (
        spark.read.parquet(active_dir(paths, manifest, "segments"))
        .drop("batch")
        .mapInArrow(rewrite, schema=SEGMENT_SCHEMA)
        .withColumn("batch", F.lit(0))
        # co-locate buckets into one file each (small-files guard, same
        # as the build path) — the shuffle moves only compressed runs
        .repartition("bucket")
        .sortWithinPartitions("term", "shard")
    )
    # versioned rewrites: new segments + staging dirs become live only
    # at the manifest commit below; until then every reader still sees
    # the old versions (object-store-safe, no delete-then-move window)
    new_seg_dir = storage.join(paths.root, bump_dir(manifest, "segments"))
    new.write.mode("overwrite").partitionBy("batch", "bucket").parquet(new_seg_dir)

    # purge staging too, and re-derive per-batch doc stats, so a later
    # re-finalize (e.g. after add_documents) doesn't resurrect deleted
    # docs' contribution to N/avgdl
    tomb_df = spark.read.parquet(tomb_dir).distinct()
    # resolve the CURRENT staging dir before bumping its pointer
    staged = spark.read.parquet(active_dir(paths, manifest, "staging")).join(
        F.broadcast(tomb_df), "docid", "left_anti"
    )
    new_stg_dir = storage.join(paths.root, bump_dir(manifest, "staging"))
    staged.write.mode("overwrite").partitionBy("batch").parquet(new_stg_dir)
    per_batch = {
        int(r["batch"]): r
        for r in spark.read.parquet(new_stg_dir)
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("n_docs_tokenized"),
            F.sum("dl").alias("sum_dl"),
        )
        .collect()
    }
    for key, entry in manifest.get("batches", {}).items():
        r = per_batch.get(int(key))
        entry["n_docs"] = int(r["n_docs"]) if r is not None else 0
        entry["n_docs_tokenized"] = int(r["n_docs_tokenized"]) if r is not None else 0
        entry["sum_dl"] = int(r["sum_dl"]) if r is not None else 0
    manifest.setdefault("lineage", []).append(
        {"stage": "compact", "at": _now(), "n_tombstones_purged": int(tomb.size)}
    )
    save_manifest(paths, manifest)  # commit point: both dir flips live
    gc_stale_versions(paths, manifest)
    manifest = _finalize(spark, paths, config, manifest)
    # per-batch n_postings/bytes are stale after the rewrite (postings
    # moved to batch=0); refresh the manifest-level totals from the
    # rewritten segments so build metrics stay truthful
    m = (
        spark.read.parquet(active_dir(paths, manifest, "segments"))
        .agg(F.sum("df").alias("p"), F.sum(F.length("payload")).alias("b"))
        .collect()[0]
    )
    manifest["n_postings"] = int(m["p"] or 0)
    manifest["bytes"] = int(m["b"] or 0)
    save_manifest(paths, manifest)
    # tombstones are cleared LAST — only after the dir flips, _finalize
    # (docmap/stats rebuild) and the metrics refresh are all durable. A
    # crash anywhere before this line leaves the tombstone set intact,
    # so a re-run redoes the whole compact (as a no-op posting filter)
    # and converges; clearing earlier would make the re-run early-return
    # at the tombstone check with docmap/metrics still stale. The clear
    # is a pointer FLIP to a fresh (never-written) version name, not an
    # rmtree: an rmtree would yank the dir out from under a reader
    # holding the pre-compact manifest snapshot (whose old segments are
    # retained for GC_RETAIN_SECONDS — it needs the matching tombstones
    # to keep filtering deleted docs). The old dir retires through the
    # same retention window as every other superseded version.
    bump_dir(manifest, "tombstones")
    save_manifest(paths, manifest)
    gc_stale_versions(paths, manifest)
    tomb_bc.unpersist(blocking=False)
    return manifest


def rebuild_index(
    spark: SparkSession,
    index_dir: str,
    dst_dir: str,
    shards_per_batch: int | None = None,
) -> dict:
    """Physically rebuild the index's live snapshot into ``dst_dir``
    with a FRESH dense docid space — the docid-renumbering analog of
    the reference's ``remove()`` (``fast_plaid.py:259-269``, which
    renumbers ids on delete).

    :func:`compact` is the in-place option: it drops tombstoned
    postings but preserves the docid space, so ids grow sparse forever
    under churn (valid tombstone-style design, zero reader disruption).
    After heavy delete/add churn, a rebuild re-densifies ids
    (0..n_docs-1 in url order), restores doc-range shard balance, and
    resets batch fragmentation. It writes a complete NEW index root —
    the caller flips serving to ``dst_dir`` when done (a cross-root
    atomic rename doesn't exist on object stores; a root-level pointer
    flip in the serving layer is the same commit discipline the
    manifest uses for state dirs). External docid references (subsets,
    qrels keyed by docid) must be re-resolved through the new docmap
    via url.

    Returns the new manifest at ``dst_dir``."""
    paths = IndexPaths(index_dir)
    manifest = load_manifest(paths)
    if not manifest.get("finalized"):
        raise ValueError("rebuild_index requires a finalized index")
    manifest = _repair_pending_add(paths, manifest)
    config = IndexConfig.from_dict(manifest["config"])
    spb = _persisted_spb(manifest, shards_per_batch)

    live = spark.read.parquet(active_dir(paths, manifest, "staging"))
    tomb_dir = active_dir(paths, manifest, "tombstones")
    if storage.exists(tomb_dir):
        tomb = spark.read.parquet(tomb_dir).distinct()
        live = live.join(F.broadcast(tomb), "docid", "left_anti")

    from pylate_spark.plans.build import build_index

    new_manifest = build_index(
        spark, live.select("url", "text"), dst_dir, config=config, shards_per_batch=spb
    )
    # carry the applied-epoch record: the rebuilt index contains every
    # document those epochs added, so a stream replaying its last
    # in-flight epoch against the new root must still be skipped —
    # otherwise the first replay after the serving flip double-adds
    for k in ("applied_epoch_max", "applied_epochs"):
        if k in manifest:
            new_manifest[k] = manifest[k]
    new_manifest.setdefault("lineage", []).append(
        {"stage": "rebuild_index", "at": _now(), "src": index_dir}
    )
    save_manifest(IndexPaths(dst_dir), new_manifest)
    return new_manifest


def consolidate_segments(spark: SparkSession, index_dir: str) -> dict:
    """File-level segment consolidation: after many incremental adds,
    the segments table accumulates one directory tree per batch; this
    rewrites all rows into a single batch partition (~one file per
    term bucket) WITHOUT decoding payloads — per-(shard, term) runs are
    unique across batches by construction (batch-aligned docid bases),
    so consolidation is a pure file merge, the trivial-fan-in SPIMI
    merge at the storage layer. Reference analog: chunk consolidation
    in ``index_updater.py:414-460`` minus the recompression."""
    paths = IndexPaths(index_dir)
    manifest = load_manifest(paths)
    if not manifest.get("finalized"):
        raise ValueError("consolidate_segments requires a finalized index")
    manifest = _repair_pending_add(paths, manifest)
    seg = spark.read.parquet(active_dir(paths, manifest, "segments")).drop("batch")
    new_seg_dir = storage.join(paths.root, bump_dir(manifest, "segments"))
    (
        seg.withColumn("batch", F.lit(0))
        .repartition("bucket")
        .sortWithinPartitions("term", "shard")
        .write.mode("overwrite")
        .partitionBy("batch", "bucket")
        .parquet(new_seg_dir)
    )
    manifest.setdefault("lineage", []).append(
        {"stage": "consolidate_segments", "at": _now()}
    )
    save_manifest(paths, manifest)  # commit point: the dir flip is live
    gc_stale_versions(paths, manifest)
    return manifest
