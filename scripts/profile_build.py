"""Build-phase attribution at a pinned standalone cluster width:
times _stage_corpus / per-batch build / _finalize separately so the
non-scaling term in the build efficiency can be pinned to a phase.

Usage: python scripts/profile_build.py <workers> <cores> [n_docs]
(starts its own pinned cluster via scripts/scaling_cluster.Cluster)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scaling_cluster import MASTER_URL, Cluster  # noqa: E402


def run_inner(master: str, n_docs: int, corpus_dir: str, workers: int, cores: int) -> None:
    import pylate_spark.plans.build as B
    from pylate_spark.config import IndexConfig
    from pylate_spark.session import get_spark
    from pylate_spark.sources.synth import synth_pages

    times: dict[str, float] = {}

    def timing(name):
        orig = getattr(B, name)

        def f(*a, **k):
            t0 = time.time()
            r = orig(*a, **k)
            times[name] = round(times.get(name, 0.0) + time.time() - t0, 3)
            return r

        return f

    for name in ("_stage_corpus", "_build_one_batch", "_finalize"):
        setattr(B, name, timing(name))

    spark = get_spark(
        app_name="profile_build", master=master,
        shuffle_partitions=max(workers * cores, 4),
        extra_conf={
            "spark.executor.cores": str(cores),
            "spark.executor.memory": "5632m",
            "spark.cores.max": str(workers * cores),
        },
    )
    subprocess.run(["sh", os.path.join(REPO, "scripts", "make_pyfiles.sh")],
                   check=True, capture_output=True)
    spark.sparkContext.addPyFile(os.path.join(REPO, "pylate_spark.zip"))

    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synth_pages(spark, n_docs).write.mode("overwrite").parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    from pylate_spark.functions.tokenize import terms_long
    terms_long(pages.limit(2000).select(
        pages["url"].cast("string").alias("u"), "text").selectExpr(
        "crc32(u) as docid", "text")).count()  # warm python workers

    cfg = IndexConfig(shard_size=16384, block_size=128, term_buckets=64)
    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    idx_dir = tempfile.mkdtemp(prefix="pylate_pb_", dir=base)
    try:
        t0 = time.time()
        B.build_index(spark, pages, idx_dir, config=cfg, shards_per_batch=128)
        total = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    other = round(total - sum(times.values()), 3)
    print(json.dumps({"workers": workers, "cores": cores, "n_docs": n_docs,
                      "total": total, **times, "other": other}))


def main() -> None:
    if os.environ.get("PYLATE_PB_INNER"):
        run_inner(MASTER_URL, int(sys.argv[3]),
                  os.path.join(tempfile.gettempdir(),
                               f"pylate_scale_corpus_{sys.argv[3]}"),
                  int(sys.argv[1]), int(sys.argv[2]))
        return
    workers, cores = int(sys.argv[1]), int(sys.argv[2])
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 3_200_000
    with Cluster(workers, cores):
        env = dict(os.environ)
        env["PYLATE_PB_INNER"] = "1"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             str(workers), str(cores), str(n_docs)],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        )
        print(out.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
