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
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pylate_spark.config import IndexConfig
from pylate_spark.functions.tokenize import terms_long
from pylate_spark.plans.build import (
    IndexPaths,
    _build_one_batch,
    _finalize,
    _stage_corpus,
    load_manifest,
    save_manifest,
)


def add_documents(
    spark: SparkSession,
    new_pages: DataFrame,
    index_dir: str,
    shards_per_batch: int = 64,
    key_col: str = "url",
    text_col: str = "text",
) -> dict:
    """Append new documents as fresh build batches.

    New docids start at the next batch-aligned boundary past the
    current maximum, so (a) existing committed batches are untouched,
    (b) every (shard, term) run stays unique — no cross-batch posting
    merge is ever needed at query time.
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
    config = IndexConfig.from_dict(manifest["config"])
    batch_span = config.shard_size * shards_per_batch
    cur_max = int(
        spark.read.parquet(paths.staging).agg(F.max("docid")).collect()[0][0] or -1
    )
    docid_base = ((cur_max // batch_span) + 1) * batch_span

    _stage_corpus(
        spark, new_pages, paths, config, shards_per_batch, key_col, text_col,
        docid_base=docid_base,
    )
    n_batches = int(
        spark.read.parquet(paths.staging).agg(F.max("batch")).collect()[0][0]
    ) + 1
    manifest["n_batches"] = n_batches
    manifest["finalized"] = False
    manifest.setdefault("lineage", []).append(
        {"stage": "add_documents", "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
         "docid_base": docid_base}
    )
    save_manifest(paths, manifest)

    for batch in range(n_batches):
        key = str(batch)
        if manifest["batches"].get(key, {}).get("status") == "committed":
            continue
        manifest["batches"][key] = _build_one_batch(spark, paths, config, batch, shards_per_batch)
        save_manifest(paths, manifest)
    return _finalize(spark, paths, config, manifest)


def resume_add(spark: SparkSession, index_dir: str, shards_per_batch: int = 64) -> dict:
    """Complete an interrupted ``add_documents`` (or initial build that
    was staged but killed mid-batches): builds every uncommitted batch
    from the already-staged corpus and re-finalizes. Idempotent — the
    staged rows carry their docids, so no re-staging and no duplicates
    (the resume discipline of ``collection_indexer.py:64-71``)."""
    paths = IndexPaths(index_dir)
    manifest = load_manifest(paths)
    if manifest.get("finalized"):
        return manifest
    if not manifest.get("staged"):
        raise ValueError("nothing staged at this index dir; use build_index")
    config = IndexConfig.from_dict(manifest["config"])
    for batch in range(manifest["n_batches"]):
        key = str(batch)
        if manifest["batches"].get(key, {}).get("status") == "committed":
            continue
        manifest["batches"][key] = _build_one_batch(spark, paths, config, batch, shards_per_batch)
        save_manifest(paths, manifest)
    return _finalize(spark, paths, config, manifest)


def delete_documents(spark: SparkSession, index_dir: str, docids: list[int]) -> dict:
    """Tombstone-delete docids with exact stats adjustment."""
    paths = IndexPaths(index_dir)
    manifest = load_manifest(paths)
    if not manifest.get("finalized"):
        raise ValueError("delete_documents requires a finalized index")

    ids_df = spark.createDataFrame([(int(d),) for d in docids], "docid long").distinct()
    if os.path.exists(paths.tombstones):
        # idempotent: ignore ids already tombstoned (double-delete guard)
        ids_df = ids_df.join(spark.read.parquet(paths.tombstones), "docid", "left_anti")
    ids_df = ids_df.cache()
    if ids_df.count() == 0:
        return manifest
    ids_df.write.mode("append").parquet(paths.tombstones)

    # exact per-term df/cf deltas from the deleted docs' staged text
    staged = spark.read.parquet(paths.staging)
    deleted = staged.join(F.broadcast(ids_df), "docid", "inner")
    deltas = (
        terms_long(deleted.select("docid", "text"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_del"), F.sum("tf").alias("cf_del"))
    )
    ts = spark.read.parquet(paths.term_stats)
    new_ts = (
        ts.join(F.broadcast(deltas), "term", "left")
        .withColumn("df", F.col("df") - F.coalesce(F.col("df_del"), F.lit(0)))
        .withColumn("cf", F.col("cf") - F.coalesce(F.col("cf_del"), F.lit(0)))
        .drop("df_del", "cf_del")
        .where(F.col("df") > 0)
    )
    tmp = paths.term_stats + "_tmp"
    new_ts.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(paths.term_stats)
    os.replace(tmp, paths.term_stats)

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
        {"stage": "delete_documents", "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
         "n_deleted": n_del}
    )
    save_manifest(paths, manifest)
    return manifest


def compact(spark: SparkSession, index_dir: str, shards_per_batch: int = 64) -> dict:
    """Physically remove tombstoned postings: decode → filter →
    re-encode every segment row (vectorized per posting list), rewrite
    the segments table, clear tombstones, re-finalize stats — the
    analog of the reference's chunk rewrite on delete
    (``index_updater.py:414-460``)."""
    import numpy as np
    import pandas as pd

    from pylate_spark.functions.codec import decode_postings, encode_postings
    from pylate_spark.plans.segments import SEGMENT_SCHEMA, blocks_from_row, _crc32_bucket

    paths = IndexPaths(index_dir)
    manifest = load_manifest(paths)
    config = IndexConfig.from_dict(manifest["config"])
    if not os.path.exists(paths.tombstones):
        return manifest
    tomb = np.sort(
        spark.read.parquet(paths.tombstones).toPandas()["docid"].to_numpy(np.int64)
    )
    if tomb.size == 0:
        return manifest
    block_size = config.block_size
    n_buckets = config.term_buckets

    def rewrite(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                d, t, l = decode_postings(row["payload"], blocks_from_row(row))
                keep = ~np.isin(d, tomb)
                d, t, l = d[keep], t[keep], l[keep]
                if d.size == 0:
                    continue
                payload, blocks = encode_postings(d, t, l, block_size=block_size)
                out.append(
                    {
                        "bucket": int(_crc32_bucket(pd.Series([row["term"]]), n_buckets)[0]),
                        "shard": row["shard"],
                        "term": row["term"],
                        "df": int(d.size),
                        "cf": int(t.sum()),
                        "b_first": blocks.first.tolist(),
                        "b_last": blocks.last.tolist(),
                        "b_n": blocks.n.tolist(),
                        "b_max_tf": blocks.max_tf.tolist(),
                        "b_min_dl": blocks.min_dl.tolist(),
                        "b_off": blocks.off.tolist(),
                        "payload": payload,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    new = (
        spark.read.parquet(paths.segments)
        .drop("batch", "bucket")
        .mapInPandas(rewrite, schema=SEGMENT_SCHEMA)
        .withColumn("batch", F.lit(0))
    )
    tmp = paths.segments + "_tmp"
    new.write.mode("overwrite").partitionBy("batch", "bucket").parquet(tmp)
    shutil.rmtree(paths.segments)
    os.replace(tmp, paths.segments)

    # purge staging too, and re-derive per-batch doc stats, so a later
    # re-finalize (e.g. after add_documents) doesn't resurrect deleted
    # docs' contribution to N/avgdl
    tomb_df = spark.read.parquet(paths.tombstones).distinct()
    staged = spark.read.parquet(paths.staging).join(F.broadcast(tomb_df), "docid", "left_anti")
    stg_tmp = paths.staging + "_tmp"
    staged.write.mode("overwrite").partitionBy("batch").parquet(stg_tmp)
    shutil.rmtree(paths.staging)
    os.replace(stg_tmp, paths.staging)
    per_batch = {
        int(r["batch"]): r
        for r in spark.read.parquet(paths.staging)
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
    shutil.rmtree(paths.tombstones)
    manifest.setdefault("lineage", []).append(
        {"stage": "compact", "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
         "n_tombstones_purged": int(tomb.size)}
    )
    save_manifest(paths, manifest)
    return _finalize(spark, paths, config, manifest)


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
    seg = spark.read.parquet(paths.segments).drop("batch")
    tmp = paths.segments + "_tmp"
    (
        seg.withColumn("batch", F.lit(0))
        .repartition("bucket")
        .sortWithinPartitions("term", "shard")
        .write.mode("overwrite")
        .partitionBy("batch", "bucket")
        .parquet(tmp)
    )
    shutil.rmtree(paths.segments)
    os.replace(tmp, paths.segments)
    manifest.setdefault("lineage", []).append(
        {"stage": "consolidate_segments", "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    )
    save_manifest(paths, manifest)
    return manifest
