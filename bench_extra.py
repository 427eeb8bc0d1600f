"""Isolated per-operator benchmarks for the optimization round
(guide §1.4: noop-sink timing so the computation is measured, not the
sink; §1.5: labeled jobs). bench.py is FROZEN for the driver's
measurement — numbers from here are cited in OPTIMIZATION_r07.md only.

Usage: python bench_extra.py <leg> [repeats]
Legs:
  lsh[:N]       lsh_candidate_pairs over N synth docs (default 1_000_000)
  simhash[:N]   simhash_near_dup_pairs over N synth docs
  clusters[:N]  dedup_clusters over simhash pairs of N synth docs
  scan          bm25_scan_topk catalog leg at $SPARK_GRAFT_SF_DIR
  lshcat        minhash_lsh_pairs catalog leg (band_size=2)
  annauto       probe_recall_curve + ivf_topk_auto (bench shape)
  annfull       ivf_topk full-scan 50k leg (bench shape)
  build[:N]     build_index over N synth docs (default 200_000)
  join[:N]      search_join, N queries (default 100) on 200k-doc index

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, repeats):
    out = []
    for i in range(repeats):
        spark.sparkContext.setJobDescription(f"{label} [{i}]")
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"leg": label, "samples": out, "min": min(out)}))
    return out


def synth_docs_dir(spark, n):
    from pyspark.sql import functions as F

    from pylate_spark.sources.synth import synth_pages

    d = tempfile.mkdtemp(prefix="pylate_bx_docs_")
    synth_pages(spark, n).select(
        F.xxhash64("url").alias("doc_id"), "text"
    ).write.mode("overwrite").parquet(d)
    return d


def main() -> None:
    leg = sys.argv[1] if len(sys.argv) > 1 else "lsh"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n = None
    if ":" in leg:
        leg, ns = leg.split(":", 1)
        n = int(ns)

    os.environ.setdefault("PYLATE_SPARK_DRIVER_MEM", "48g")
    from pylate_spark.session import get_spark

    spark = get_spark(app_name=f"bench_extra_{leg}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tmp: list[str] = []
    try:
        if leg in ("lsh", "simhash", "clusters"):
            from pylate_spark.operators import dedup

            d = synth_docs_dir(spark, n or 1_000_000)
            tmp.append(d)
            ddocs = spark.read.parquet(d)
            if leg == "lsh":
                timed(spark, f"lsh_pairs_{n or 1000000}", lambda: noop(
                    dedup.lsh_candidate_pairs(ddocs, n_hashes=8, band_size=4,
                                              max_bucket_size=2000)
                ), repeats)
            elif leg == "simhash":
                timed(spark, f"simhash_pairs_{n or 1000000}", lambda: noop(
                    dedup.simhash_near_dup_pairs(ddocs, max_hamming=2,
                                                 max_bucket_size=2000)
                ), repeats)
            else:
                spairs = dedup.simhash_near_dup_pairs(ddocs, max_hamming=2,
                                                      max_bucket_size=2000)
                timed(spark, f"clusters_{n or 1000000}", lambda: (
                    dedup.dedup_clusters(spairs).where("keep").count()
                ), repeats)
        elif leg == "scan":
            from pylate_spark.entry_queries import q_bm25_topk

            timed(spark, "bm25_scan_topk", lambda: noop(q_bm25_topk(spark, sf_dir)),
                  repeats)
        elif leg == "lshcat":
            from pylate_spark.entry_queries import q_lsh_pairs

            timed(spark, "minhash_lsh_pairs", lambda: noop(q_lsh_pairs(spark, sf_dir)),
                  repeats)
        elif leg == "annauto":
            from pyspark.sql import functions as F

            from pylate_spark.operators.similarity import (
                cosine_topk, ivf_topk_auto, probe_recall_curve, recall_at_k,
            )
            from pylate_spark.sources.synth import synth_embeddings

            emb = synth_embeddings(spark, 2000).cache()
            qs = emb.where(F.col("vec_id") < 20).select(
                F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
            )
            exact = cosine_topk(emb, qs, k=10).cache()
            exact.count()

            def run():
                curve = probe_recall_curve(emb, qs, k=10, n_planes=6, exact=exact)
                approx, n_probe = ivf_topk_auto(
                    emb, qs, target_recall=0.9, k=10, n_planes=6, curve=curve
                )
                recall_at_k(exact, approx, k=10).collect()

            timed(spark, "ann_auto_probe_target90", run, repeats)
        elif leg == "annfull":
            from pyspark.sql import functions as F

            from pylate_spark.operators.similarity import ivf_topk
            from pylate_spark.sources.synth import synth_embeddings

            def run():
                big = synth_embeddings(spark, 50_000)
                big_q = big.where(F.col("vec_id") < 20).select(
                    F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
                )
                ivf_topk(big, big_q, k=10, n_planes=6, n_probe=7).count()

            timed(spark, "ann_fullscan_probe7_50k", run, repeats)
        elif leg == "build":
            from pylate_spark.config import IndexConfig
            from pylate_spark.plans.build import build_index
            from pylate_spark.sources.synth import synth_pages

            n_docs = n or 200_000
            cores = spark.sparkContext.defaultParallelism
            corpus = tempfile.mkdtemp(prefix="pylate_bx_pages_")
            tmp.append(corpus)
            synth_pages(spark, n_docs).write.mode("overwrite").parquet(corpus)
            pages = spark.read.parquet(corpus)
            cfg = IndexConfig(shard_size=max(n_docs // (2 * cores), 4096),
                              block_size=128, term_buckets=64)

            def run():
                idx = tempfile.mkdtemp(prefix="pylate_bx_idx_")
                try:
                    build_index(spark, pages, idx, config=cfg,
                                shards_per_batch=4 * cores)
                finally:
                    shutil.rmtree(idx, ignore_errors=True)

            timed(spark, f"build_index_{n_docs}", run, repeats)
        elif leg == "join":
            import pandas as pd

            from pylate_spark.config import IndexConfig
            from pylate_spark.plans.build import build_index
            from pylate_spark.plans.query import InvertedIndex
            from pylate_spark.sources.synth import synth_pages, synth_queries_pandas

            nq = n or 100
            cores = spark.sparkContext.defaultParallelism
            corpus = tempfile.mkdtemp(prefix="pylate_bx_pages_")
            idx_dir = tempfile.mkdtemp(prefix="pylate_bx_idx_")
            tmp += [corpus, idx_dir]
            synth_pages(spark, 200_000).write.mode("overwrite").parquet(corpus)
            pages = spark.read.parquet(corpus)
            cfg = IndexConfig(shard_size=max(200_000 // (2 * cores), 4096),
                              block_size=128, term_buckets=64)
            build_index(spark, pages, idx_dir, config=cfg, shards_per_batch=4 * cores)
            idx = InvertedIndex(spark, idx_dir)
            qdf = spark.createDataFrame(
                pd.DataFrame(synth_queries_pandas(nq))
            )
            idx.search_join(qdf.limit(10), k=10).count()  # warm
            timed(spark, f"search_join_{nq}q",
                  lambda: idx.search_join(qdf, k=10).count(), repeats)
        else:
            raise SystemExit(f"unknown leg {leg}")
    finally:
        for d in tmp:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
