"""Query-phase attribution for the scaling study: time the scan, the
kernel, and the merge layers of the batched search job separately at a
given master, so the non-scaling term in SCALING.json can be pinned to
a stage (the round-3 verdict asks for exactly this when job-level
efficiency misses 0.8).

Usage: python scripts/profile_query.py <master> [n_docs] [corpus_dir]

Phases measured (MIN of repeats each):
  scan   — bucket+term-pruned segment scan only (count)
  kernel — scan + per-shard scoring kernel, merge stripped
  full   — the whole job: Catalyst's WindowGroupLimit partial bounds
           the final merge map-side (PLANS.md §1); the two hand-rolled
           pre-reductions this script once compared were measured
           strictly worse and deleted (SCALING.md §3, git history)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, repeats=3):
    best = None
    for _ in range(repeats):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main(master: str, n_docs: int, corpus_dir: str) -> None:
    import zlib

    from pyspark.sql import functions as F

    import pylate_spark.plans.query as Q
    from pylate_spark.config import IndexConfig
    from pylate_spark.functions.tokenize import tokenize_py
    from pylate_spark.plans.build import build_index
    from pylate_spark.plans.query import InvertedIndex
    from pylate_spark.session import get_spark
    from pylate_spark.sources.synth import synth_pages, synth_queries_pandas

    spark = get_spark(app_name=f"profile_{master}", master=master)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if master.startswith("local-cluster"):
        subprocess.run(["sh", os.path.join(repo, "scripts", "make_pyfiles.sh")],
                       check=True, capture_output=True)
        spark.sparkContext.addPyFile(os.path.join(repo, "pylate_spark.zip"))

    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synth_pages(spark, n_docs).write.mode("overwrite").parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    cfg = IndexConfig(shard_size=16384, block_size=128, term_buckets=64)
    base = None if os.environ.get("PYLATE_SCALE_DISK") else "/dev/shm"
    idx_dir = tempfile.mkdtemp(prefix="pylate_prof_", dir=base)
    out: dict = {"master": master, "n_docs": n_docs}
    try:
        t0 = time.time()
        build_index(spark, pages, idx_dir, config=cfg, shards_per_batch=128)
        out["build_sec"] = round(time.time() - t0, 3)

        idx = InvertedIndex(spark, idx_dir)
        qpdf = synth_queries_pandas(2000)
        qset = list(zip(qpdf["query_id"].tolist(), qpdf["text"].tolist()))
        idx.search(qset[:8], k=10).count()  # warm everything

        # ---- scan only: replicate search()'s pruned segment scan ----
        terms = sorted({t for _, text in qset for t in tokenize_py(text)})
        buckets = sorted({zlib.crc32(t.encode()) % cfg.term_buckets for t in terms})
        seg = idx._seg.where(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        ).select("shard", "term", "payload")
        out["scan"] = timed(lambda: seg.count())

        # ---- kernel (scan + scoring, merge stripped) ----
        orig = Q._rank_topk
        Q._rank_topk = lambda scored, k: scored
        try:
            out["kernel"] = timed(lambda: idx.search(qset, k=10).count())
        finally:
            Q._rank_topk = orig

        out["full"] = timed(lambda: idx.search(qset, k=10).count())

        # ---- how many tasks did the kernel stage get? ----
        out["shuffle_partitions"] = int(spark.conf.get("spark.sql.shuffle.partitions"))
        out["scan_tasks"] = seg.rdd.getNumPartitions()
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        sys.argv[1],
        int(sys.argv[2]) if len(sys.argv) > 2 else 3_200_000,
        sys.argv[3] if len(sys.argv) > 3 else os.path.join(
            tempfile.gettempdir(), "pylate_scale_corpus_3200000"
        ),
    )
