"""Single scaling-study run: build + query the same fixed workload at a
given parallelism; print one JSON line.

The sandbox proxy for the north rule's "N vs 4N executors" criterion
(BASELINE.md §B): identical input (deterministic synthetic corpus,
pre-materialized parquet), identical index geometry (shard_size,
shards_per_batch fixed — the index layout is a data property, not a
cluster property), only the executor-thread count changes.

Usage: python scripts/scaling_run.py <master> <n_docs> <corpus_dir>
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


def main(master: str, n_docs: int, corpus_dir: str,
         workers: int | None = None, exec_cores: int | None = None) -> None:
    from pylate_spark.config import IndexConfig
    from pylate_spark.plans.build import build_index
    from pylate_spark.plans.query import InvertedIndex
    from pylate_spark.session import get_spark
    from pylate_spark.sources.synth import synth_pages, synth_queries_pandas

    extra_conf = {}
    shuffle = None
    if master.startswith("spark://"):
        # standalone cluster (scripts/scaling_cluster.py): topology is
        # given explicitly — one executor per worker, all worker cores
        assert workers and exec_cores, "spark:// master needs workers+cores argv"
        extra_conf = {
            "spark.executor.cores": str(exec_cores),
            "spark.executor.memory": f"{int(os.environ.get('PYLATE_CLUSTER_WORKER_MB', '6144')) - 512}m",
            "spark.cores.max": str(workers * exec_cores),
        }
        shuffle = max(workers * exec_cores, 4)
    spark = get_spark(app_name=f"scaling_{master}", master=master,
                      shuffle_partitions=shuffle, extra_conf=extra_conf)
    if master.startswith(("local-cluster", "spark://")):
        # separate executor JVMs spawn their own python workers, which
        # don't inherit the driver's sys.path — ship the package the
        # way a real cluster run does (spark-submit --py-files analog)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(["sh", os.path.join(repo, "scripts", "make_pyfiles.sh")],
                       check=True, capture_output=True)
        spark.sparkContext.addPyFile(os.path.join(repo, "pylate_spark.zip"))
    if master.startswith("local-cluster["):
        # defaultParallelism is sampled before executors register in
        # standalone mode — derive total cores from the topology instead
        w, c, _ = (int(x) for x in master[14:-1].split(","))
        cores = w * c
    elif master.startswith("spark://"):
        cores = workers * exec_cores
    else:
        cores = spark.sparkContext.defaultParallelism

    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synth_pages(spark, n_docs).write.mode("overwrite").parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)

    cfg = IndexConfig(shard_size=16384, block_size=128, term_buckets=64)
    # index output on tmpfs: a real 4N-executor cluster has 4N nodes'
    # worth of local/DFS write bandwidth; this box has one shared NVMe,
    # which would turn the durable-write phases into a flat serial term
    # that measures the disk, not the engine. (Set PYLATE_SCALE_DISK=1
    # to keep the index on disk and measure that variant too.)
    base = None if os.environ.get("PYLATE_SCALE_DISK") else "/dev/shm"
    idx_dir = tempfile.mkdtemp(prefix=f"pylate_scale_{cores}_", dir=base)
    try:
        # warm the JVM AND the python UDF workers (fork + numpy/pandas
        # imports) with untimed mini-jobs so the measurement captures
        # steady-state throughput, not spin-up
        from pylate_spark.functions.tokenize import terms_long

        terms_long(pages.limit(2000).select("docid", "text")
                   if "docid" in pages.columns
                   else pages.limit(2000).selectExpr("url as docid_str", "text")
                   .selectExpr("crc32(docid_str) as docid", "text")).count()

        t0 = time.time()
        manifest = build_index(spark, pages, idx_dir, config=cfg, shards_per_batch=128)
        build_sec = time.time() - t0

        idx = InvertedIndex(spark, idx_dir)
        n_q = int(os.environ.get("PYLATE_SCALE_QUERIES", "2000"))
        qpdf = synth_queries_pandas(n_q)
        qset = list(zip(qpdf["query_id"].tolist(), qpdf["text"].tolist()))
        idx.search(qset[:8], k=10).count()  # warm the query path
        # MIN of repeats: the box is time-shared with ±40% swings; the
        # minimum is the least-contended (most cluster-like) observation
        # mode override: weak-scaling-by-corpus legs use "exhaustive",
        # where per-query work really is ~linear in postings — the
        # cascade's block-max pruning is SUBLINEAR in N, so an auto-mode
        # work-normalized efficiency would overstate weak scaling
        qmode = os.environ.get("PYLATE_SCALE_QUERY_MODE", "auto")
        query_sec = None
        for _ in range(3):
            t0 = time.time()
            idx.search(qset, k=10, mode=qmode).count()
            dt = time.time() - t0
            query_sec = dt if query_sec is None else min(query_sec, dt)

        print(
            json.dumps(
                {
                    "master": master,
                    "cores": cores,
                    "n_docs": n_docs,
                    "build_sec": round(build_sec, 3),
                    "build_docs_per_sec": round(n_docs / build_sec, 1),
                    "build_postings_per_sec": round(manifest["n_postings"] / build_sec, 1),
                    "query_sec": round(query_sec, 3),
                    "qps": round(n_q / query_sec, 2),
                    "n_queries": n_q,
                    "query_mode": qmode,
                }
            )
        )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main(
        sys.argv[1], int(sys.argv[2]), sys.argv[3],
        int(sys.argv[4]) if len(sys.argv) > 4 else None,
        int(sys.argv[5]) if len(sys.argv) > 5 else None,
    )
