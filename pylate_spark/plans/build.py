"""SPIMI-style resumable index build.

Mirrors the reference's four-phase resumable build
(``setup → train → index → finalize``,
``/root/reference/pylate/indexes/stanford_nlp/indexing/collection_indexer.py:62-79``):

- **setup** (:func:`_stage_corpus`): deterministic dense docid
  assignment (url rank), doc-range sharding, native-expression token
  counting (``dl``), staged corpus written partitioned by build batch —
  the analog of ``plan.json`` + the saved collection chunks
  (``collection_indexer.py:81-121``).
- **index** (:func:`_build_one_batch`): per-batch SPIMI build. The
  *text* is exchanged once by doc-range shard; tokenize → local sort →
  posting-block encode then run fused in one wide stage, so the long
  ``(term, docid, tf, dl)`` rows never cross the network — they are
  born, sorted, and compressed inside their shard's partition. Resume
  skips batches whose manifest entry is committed, exactly as the
  reference skips already-saved chunks
  (``collection_indexer.py:408-449``, ``index_saver.py:21-50``).
- **finalize** (:func:`_finalize`): global term statistics (the SPIMI
  merge — per-(shard, term) runs aggregated per term; the recorded
  ``merge_fan_in`` is runs/term), docmap, manifest with corpus stats,
  config, lineage and per-batch metrics — the analog of
  ``metadata.json`` (``collection_indexer.py:578-591``).

Skew note (north_rule): the *salt* is the doc-range shard. A stopword's
postings are split across all shards, so no task ever materializes more
than ``shard_size`` postings for one term, and runs concatenate in
shard order into globally docid-sorted posting lists (merge = ordered
append, fan-in recorded per term).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pylate_spark import storage
from pylate_spark.config import IndexConfig
from pylate_spark.functions.tokenize import native_tokens_col, terms_long
from pylate_spark.operators.docids import assign_docids
from pylate_spark.plans.segments import SEGMENT_SCHEMA, arrow_carry_iterator

MANIFEST = "manifest.json"


@dataclass
class IndexPaths:
    """Index directory layout. ``root`` may be a plain local path or
    any URI PyArrow/Hadoop speak (``file://``, ``hdfs://``, ``s3://``)
    — all driver-side state access goes through
    :mod:`pylate_spark.storage`, never raw ``os``/``shutil``."""

    root: str

    @property
    def staging(self) -> str:
        return storage.join(self.root, "staging")

    @property
    def segments(self) -> str:
        return storage.join(self.root, "segments")

    @property
    def term_stats(self) -> str:
        return storage.join(self.root, "term_stats")

    @property
    def docmap(self) -> str:
        return storage.join(self.root, "docmap")

    @property
    def tombstones(self) -> str:
        return storage.join(self.root, "tombstones")

    @property
    def manifest(self) -> str:
        return storage.join(self.root, MANIFEST)


#: logical state directories whose rewrites are versioned
_VERSIONED = ("segments", "term_stats", "docmap", "staging", "tombstones")


def active_dir(paths: IndexPaths, manifest: dict, name: str) -> str:
    """Resolve a logical state dir (segments/term_stats/docmap/staging)
    to its current physical directory. Rewrites write a NEW versioned
    directory and flip this pointer inside the atomic manifest commit —
    the object-store-safe swap: there is never a window where the live
    directory has been deleted but its replacement not yet moved in
    (a delete-then-rename swap has exactly that window, and on S3 the
    'rename' is a long copy). Superseded versions are garbage-collected
    after the commit (:func:`gc_stale_versions`)."""
    return storage.join(paths.root, manifest.get("dirs", {}).get(name, name))


#: snapshot-retention window for superseded version dirs, seconds. 0 =
#: GC immediately after the commit that retired them (single-writer,
#: re-open-after-mutation discipline — fine for tests and batch jobs).
#: On a cluster with concurrent readers, set this LONGER than the
#: longest-running query: a reader that resolved active_dir pointers
#: before a rewrite keeps reading its (immutable) snapshot dirs until
#: the window expires — Iceberg's expire_snapshots(retention) model.
GC_RETAIN_SECONDS = float(os.environ.get("PYLATE_GC_RETAIN_S", "0"))


def bump_dir(manifest: dict, name: str) -> str:
    """Allocate the next version name for a logical dir and point the
    (in-memory) manifest at it. The caller writes the new data there,
    then commits via save_manifest — a crash in between leaves the old
    version active and the new dir as garbage for the next GC. The
    outgoing version is stamped into ``manifest["retired"]`` so the GC
    retention clock starts at this rewrite's commit."""
    cur = manifest.get("dirs", {}).get(name, name)
    tail = cur.rsplit("_v", 1)
    v = int(tail[1]) + 1 if len(tail) == 2 and tail[1].isdigit() else 1
    nxt = f"{name}_v{v}"
    manifest.setdefault("dirs", {})[name] = nxt
    # None = "retires at the NEXT manifest commit": save_manifest stamps
    # the actual time. Stamping here (allocation time) would let a long
    # rewrite consume the retention window before readers were even
    # exposed to the new version.
    manifest.setdefault("retired", {})[cur] = None
    return nxt


def gc_stale_versions(paths: IndexPaths, manifest: dict, retain_s: float | None = None) -> None:
    """Best-effort removal of superseded version dirs, with snapshot
    retention. Safe any time after the manifest commit; a crash mid-GC
    just leaves garbage for the next sweep.

    A superseded dir is removed once it has been retired (pointer
    flipped away from it) for at least ``retain_s`` seconds (default
    ``GC_RETAIN_SECONDS`` / ``$PYLATE_GC_RETAIN_S``). With a window of
    0 a reader holding a handle to a superseded version may fail after
    GC — re-open the index after mutations, as the reference does after
    IndexUpdater runs; with a window longer than the longest query,
    in-flight readers finish on their immutable snapshot first. Orphan
    dirs with no retirement record (a rewrite that crashed before its
    commit) are removed immediately at window 0, else get a clock
    started now."""
    import re

    retain = GC_RETAIN_SECONDS if retain_s is None else retain_s
    dirs = manifest.get("dirs", {})
    active = {dirs.get(n, n) for n in _VERSIONED}
    retired = manifest.setdefault("retired", {})
    pat = re.compile(r"^(" + "|".join(_VERSIONED) + r")(_v\d+)?$")
    now = time.time()
    present = set(storage.listdir(paths.root))
    changed = False
    for name in present:
        if not pat.match(name) or name in active:
            continue
        ts = retired.get(name)
        if ts is None:
            if retain <= 0:
                storage.rmtree(storage.join(paths.root, name))
            else:
                retired[name] = now  # crash orphan: start its clock
                changed = True
        elif now - float(ts) >= retain:
            storage.rmtree(storage.join(paths.root, name))
            retired.pop(name, None)
            changed = True
    # drop bookkeeping for dirs that are gone or became active again
    for name in list(retired):
        if name in active or name not in present:
            retired.pop(name, None)
            changed = True
    if changed:
        save_manifest(paths, manifest)


def load_manifest(paths: IndexPaths) -> dict:
    if storage.exists(paths.manifest):
        return json.loads(storage.read_text(paths.manifest))
    return {}


def save_manifest(paths: IndexPaths, manifest: dict) -> None:
    storage.makedirs(paths.root)
    # retirement clocks start NOW — the commit is when readers stop
    # being handed the old versions (see bump_dir)
    retired = manifest.get("retired", {})
    for name, ts in retired.items():
        if ts is None:
            retired[name] = time.time()
    # atomic commit point — see storage module notes on the semantics
    # per filesystem class
    storage.write_text(paths.manifest, json.dumps(manifest, indent=1, default=str))


def _stage_corpus(
    spark: SparkSession,
    pages: DataFrame,
    paths: IndexPaths,
    config: IndexConfig,
    shards_per_batch: int,
    key_col: str,
    text_col: str,
    docid_base: int = 0,
    staging_dir: str | None = None,
) -> None:
    """Write the staged corpus ``(batch, shard, docid, url, dl, text)``
    partitioned by batch. ``dl`` is computed with the *native*
    ``regexp_extract_all`` so corpus stats never re-tokenize (the UDF
    tokenizer is asserted equal to it in tests).

    Bandwidth shape (round 4): the full rows cross the wire exactly
    once — :func:`assign_docids` fixes the bucket geometry from a
    keys-only scan, so the text goes scan → one exchange → rank + dl +
    staged write fused in a single wide stage. (The round-3 form
    range-exchanged the text, pinned it DISK_ONLY and re-read it twice
    more — measured as the worst-scaling build phase on a
    bandwidth-capped box, SCALING.md §3.) The staged write is verified
    dense (max docid == row count - 1) before the caller commits the
    staging manifest entry — the cheap guard for the "input must be
    deterministically re-readable" contract of the two-pass docid
    assignment."""
    # project to the two columns the build needs before any exchange —
    # html and other payload columns would otherwise ride through the
    # exchange and the staging write (Catalyst prunes scans, but the
    # explicit select also bounds what the wide stage carries)
    pages = pages.select(key_col, text_col)
    with_ids = assign_docids(pages, config.shard_size, key_col=key_col)
    if docid_base:
        with_ids = with_ids.withColumn("docid", F.col("docid") + F.lit(docid_base)).withColumn(
            "shard", (F.col("docid") / F.lit(config.shard_size)).cast("long")
        )
    staged = (
        with_ids.withColumn("dl", F.size(native_tokens_col(text_col, config.token_pattern)))
        .withColumn("batch", (F.col("shard") / F.lit(shards_per_batch)).cast("long"))
        .select(
            "batch",
            "shard",
            "docid",
            F.col(key_col).alias("url"),
            "dl",
            F.col(text_col).alias("text"),
        )
    )
    out = staging_dir or paths.staging
    staged.write.mode("append").partitionBy("batch").parquet(out)
    # density guard (columns-pruned scan of what was just written): a
    # non-deterministic input DataFrame would desynchronize the counts
    # pass from the rank pass and corrupt docids silently
    # the docid >= base predicate hits parquet row-group stats, so an
    # incremental add (append into existing staging) skips old batches.
    # Moments, not just count+min+max: a counts-vs-rank desync that
    # PRESERVES the total row count (one bucket short, another long)
    # creates a duplicate docid plus a hole that min/max/count cannot
    # see — but it shifts the sum by (dup - hole) ≠ 0, and any
    # compensating multi-error set still moves the sum of squares.
    # Decimal(38) aggregation: int64 sums overflow at ~10^9 docs
    # (n·docid ~ 10^24 at the design point) and Spark wraps silently.
    d38 = F.col("docid").cast("decimal(38,0)")
    g = spark.read.parquet(out).where(F.col("docid") >= docid_base).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("docid").alias("mx"), F.min("docid").alias("mn"),
        F.sum(d38).alias("s1"), F.sum(d38 * d38).alias("s2"),
    ).collect()[0]
    n = int(g["n"] or 0)
    if n:
        b, hi = docid_base, docid_base + n - 1
        want_s1 = n * b + n * (n - 1) // 2
        want_s2 = sum((n * b * b, b * n * (n - 1), (n - 1) * n * (2 * n - 1) // 6))
        ok = (
            int(g["mn"]) == b and int(g["mx"]) == hi
            and int(g["s1"]) == want_s1 and int(g["s2"]) == want_s2
        )
        if not ok:
            raise RuntimeError(
                f"staged docids not dense: n={n}, min={g['mn']}, max={g['mx']}, "
                f"sum={g['s1']} (want {want_s1}), sumsq={g['s2']} (want {want_s2}), "
                f"base={docid_base} — is the input DataFrame deterministic across reads?"
            )


def _build_one_batch(
    spark: SparkSession,
    paths: IndexPaths,
    config: IndexConfig,
    batch: int,
    shards_per_batch: int,
    manifest: dict,
) -> dict:
    """Tokenize → shuffle-by-shard → encode → append segments for one
    batch of shards. Returns the manifest metrics entry."""
    t0 = time.time()
    seg_dir = active_dir(paths, manifest, "segments")
    staging_dir = active_dir(paths, manifest, "staging")
    # a batch that previously died mid-write is discarded wholesale —
    # the batch directory is the atomic unit of commit (the analog of
    # the reference's per-chunk save + chunk-exists resume check,
    # ``index_saver.py:28-50``)
    batch_dir = storage.join(seg_dir, f"batch={batch}")
    storage.rmtree(batch_dir)
    staged = spark.read.parquet(staging_dir).where(F.col("batch") == batch)
    block_size, n_buckets = config.block_size, config.term_buckets
    # SPIMI proper: exchange the *text* by doc-range shard first, then
    # tokenize → local sort → encode fused in ONE wide stage. The long
    # (term, docid, tf, dl) rows never cross the network: they are
    # born, sorted, and compressed inside their shard's partition. This
    # also pins tokenizer parallelism to shards_per_batch instead of
    # the staging file-split layout (file packing had been starving it
    # to a handful of straggler tasks).
    sharded = staged.repartition(shards_per_batch, "shard").select("docid", "text")
    tl = (
        terms_long(sharded, id_col="docid", text_col="text", pattern=config.token_pattern)
        .withColumn("shard", (F.col("docid") / F.lit(config.shard_size)).cast("long"))
        .withColumn("bucket", (F.crc32(F.col("term")) % F.lit(n_buckets)).cast("int"))
    )
    encoded = (
        tl.sortWithinPartitions("shard", "term", "docid")
        .select("shard", "bucket", "term", "docid", "tf", "dl")
        .mapInArrow(
            lambda it: arrow_carry_iterator(it, block_size),
            schema=SEGMENT_SCHEMA,
        )
        .withColumn("batch", F.lit(batch))
    )
    # co-locate each term bucket into one output file per batch:
    # without this, every encode task writes into every bucket dir
    # (tasks × buckets tiny files — a small-files explosion that slows
    # both the write and every later bucket-pruned query scan). The
    # extra shuffle moves only the compressed index, not the corpus.
    encoded = encoded.repartition("bucket").sortWithinPartitions("term", "shard")
    encoded.write.mode("append").partitionBy("batch", "bucket").parquet(seg_dir)

    # metrics from the written data (cheap column scan, no payload read)
    m = (
        spark.read.parquet(batch_dir)
        .agg(
            F.sum("df").alias("n_postings"),
            F.sum(F.length("payload")).alias("bytes"),
            F.count(F.lit(1)).alias("n_runs"),
        )
        .collect()[0]
    )
    d = (
        staged.agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"),
                   F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("n_docs_tokenized"))
        .collect()[0]
    )
    dt = time.time() - t0
    n_post = int(m["n_postings"] or 0)
    nbytes = int(m["bytes"] or 0)
    return {
        "status": "committed",
        "batch": batch,
        "n_docs": int(d["n_docs"]),
        "n_docs_tokenized": int(d["n_docs_tokenized"]),
        "sum_dl": int(d["sum_dl"] or 0),
        "n_postings": n_post,
        "n_runs": int(m["n_runs"] or 0),
        "bytes": nbytes,
        "build_sec": round(dt, 3),
        "docs_per_sec": round(int(d["n_docs"]) / dt, 1) if dt > 0 else None,
        "postings_per_sec": round(n_post / dt, 1) if dt > 0 else None,
        "bytes_per_posting": round(nbytes / n_post, 3) if n_post else None,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }


def _tombstone_deltas(spark: SparkSession, paths: IndexPaths, manifest: dict):
    """(per-term df/cf deltas DF, n_deleted_tokenized, deleted sum_dl)
    for all tombstoned docids, recomputed exactly from staged text.
    Returns (None, 0, 0) when there are no tombstones."""
    config = IndexConfig.from_dict(manifest["config"])
    tomb_dir = active_dir(paths, manifest, "tombstones")
    if not storage.exists(tomb_dir):
        return None, 0, 0
    tomb = spark.read.parquet(tomb_dir).distinct()
    staged = spark.read.parquet(active_dir(paths, manifest, "staging"))
    deleted = staged.join(F.broadcast(tomb), "docid", "inner")
    from pylate_spark.functions.tokenize import terms_long as _tl

    deltas = (
        _tl(deleted.select("docid", "text"), pattern=config.token_pattern)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_del"), F.sum("tf").alias("cf_del"))
    )
    d = deleted.agg(
        F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("n"),
        F.sum("dl").alias("sum_dl"),
    ).collect()[0]
    return deltas, int(d["n"] or 0), int(d["sum_dl"] or 0)


def _finalize(spark: SparkSession, paths: IndexPaths, config: IndexConfig, manifest: dict) -> dict:
    """Global term stats (SPIMI merge bookkeeping), docmap, corpus stats.
    Tombstoned documents are subtracted exactly, so re-finalizing after
    an incremental add preserves delete semantics. term_stats and docmap
    are written as NEW version dirs and flipped in the same manifest
    commit that flips ``finalized`` (an in-place overwrite would leave a
    torn directory on a crash mid-write)."""
    seg = spark.read.parquet(active_dir(paths, manifest, "segments"))
    ts = (
        seg.groupBy("term")
        .agg(
            F.sum("df").alias("df"),
            F.sum("cf").alias("cf"),
            F.max(F.array_max("b_max_tf")).alias("max_tf"),
            F.min(F.array_min("b_min_dl")).alias("min_dl"),
            F.count(F.lit(1)).alias("merge_fan_in"),
        )
    )
    deltas, n_del, dl_del = _tombstone_deltas(spark, paths, manifest)
    if deltas is not None:
        ts = (
            ts.join(F.broadcast(deltas), "term", "left")
            .withColumn("df", F.col("df") - F.coalesce(F.col("df_del"), F.lit(0)))
            .withColumn("cf", F.col("cf") - F.coalesce(F.col("cf_del"), F.lit(0)))
            .drop("df_del", "cf_del")
            .where(F.col("df") > 0)
        )
    staging_dir = active_dir(paths, manifest, "staging")
    ts_dir = storage.join(paths.root, bump_dir(manifest, "term_stats"))
    ts.write.mode("overwrite").parquet(ts_dir)

    staged = spark.read.parquet(staging_dir)
    dm_dir = storage.join(paths.root, bump_dir(manifest, "docmap"))
    staged.select("url", "docid", "shard", "dl").write.mode("overwrite").parquet(dm_dir)

    batches = manifest.get("batches", {})
    n_docs = sum(b["n_docs_tokenized"] for b in batches.values()) - n_del
    sum_dl = sum(b["sum_dl"] for b in batches.values()) - dl_del
    fan = spark.read.parquet(ts_dir).agg(
        F.avg("merge_fan_in").alias("avg"), F.max("merge_fan_in").alias("max")
    ).collect()[0]
    manifest.update(
        {
            "config": config.to_dict(),
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
            "n_postings": sum(b["n_postings"] for b in batches.values()),
            "bytes": sum(b["bytes"] for b in batches.values()),
            "merge_fan_in_avg": float(fan["avg"] or 0.0),
            "merge_fan_in_max": int(fan["max"] or 0),
            "finalized": True,
            "lineage": manifest.get("lineage", []),
        }
    )
    save_manifest(paths, manifest)  # atomic commit incl. the dir flips
    gc_stale_versions(paths, manifest)
    return manifest


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    config: IndexConfig | None = None,
    shards_per_batch: int = 64,
    key_col: str = "url",
    text_col: str = "text",
    resume: bool = False,
) -> dict:
    """Build (or resume building) the inverted index at ``index_dir``.

    Returns the final manifest. Idempotent per batch: a killed build
    rerun with ``resume=True`` skips committed batches (the kill/rerun
    test mirrors the reference's resume discipline,
    ``collection_indexer.py:64-71``).
    """
    config = config or IndexConfig()
    paths = IndexPaths(index_dir)
    manifest = load_manifest(paths) if resume else {}
    if manifest.get("finalized"):
        return manifest
    if not resume:
        storage.rmtree(paths.root)
    storage.makedirs(paths.root)

    if not manifest.get("staged"):
        staging_dir = active_dir(paths, manifest, "staging")
        storage.rmtree(staging_dir)  # killed mid-staging → redo atomically
        _stage_corpus(
            spark, pages, paths, config, shards_per_batch, key_col, text_col,
            staging_dir=staging_dir,
        )
        n_batches = (
            spark.read.parquet(staging_dir).agg(F.max("batch")).collect()[0][0] or 0
        ) + 1
        manifest = {
            "staged": True,
            "n_batches": int(n_batches),
            "config": config.to_dict(),
            # the batch geometry is part of the physical plan: docid →
            # batch mapping must stay stable across incremental adds
            # (add_documents validates against this persisted value)
            "shards_per_batch": int(shards_per_batch),
            "batches": {},
            "lineage": [
                {
                    "stage": "staging",
                    "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "source": "caller DataFrame",
                }
            ],
        }
        save_manifest(paths, manifest)

    for batch in range(manifest["n_batches"]):
        key = str(batch)
        if manifest["batches"].get(key, {}).get("status") == "committed":
            continue
        entry = _build_one_batch(spark, paths, config, batch, shards_per_batch, manifest)
        manifest["batches"][key] = entry
        save_manifest(paths, manifest)  # per-batch durable commit point

    return _finalize(spark, paths, config, manifest)
