"""Staging sub-step attribution at a pinned cluster width: times the
docid-assignment pieces (count, boundary sample, counts pass, wide
rank+dl+write pass) separately so a non-scaling staging term can be
pinned to a sub-step.

Usage: python scripts/profile_stage.py <workers> <cores> [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scaling_cluster import MASTER_URL, Cluster  # noqa: E402


def run_inner(master: str, n_docs: int, corpus_dir: str, workers: int, cores: int) -> None:
    from pyspark.sql import functions as F

    from pylate_spark.config import IndexConfig
    from pylate_spark.operators import docids as D
    from pylate_spark.session import get_spark
    from pylate_spark.sources.synth import synth_pages

    times: dict[str, float] = {}
    spark = get_spark(
        app_name="profile_stage", master=master,
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
    pages = spark.read.parquet(corpus_dir).select("url", "text")

    # warm the PYTHON UDF workers (fork + numpy/pandas import), not just
    # the JVM — F.md5 is JVM-native and spawns none, which let the first
    # pandas-UDF job inside assign_docids absorb worker cold-start and
    # inflate the prep_jobs attribution
    @F.pandas_udf("int")
    def _warm(s: pd.Series) -> pd.Series:
        return pd.Series(np.zeros(len(s), dtype=np.int32))

    pages.limit(2000).select(_warm(F.col("url"))).count()

    cfg = IndexConfig(shard_size=16384, block_size=128, term_buckets=64)

    from pylate_spark.functions.tokenize import native_tokens_col
    from pylate_spark.operators.docids import assign_docids

    # prep = everything assign_docids runs eagerly (count job + boundary
    # sample job + per-bucket counts job); wide = the single full-row
    # pass fused with dl + the partitioned staged write
    t0 = time.time()
    with_ids = assign_docids(pages, cfg.shard_size)
    times["prep_jobs"] = round(time.time() - t0, 3)

    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    out_dir = tempfile.mkdtemp(prefix="pylate_ps_", dir=base)
    try:
        staged = (
            with_ids.withColumn("dl", F.size(native_tokens_col("text")))
            .withColumn("batch", (F.col("shard") / F.lit(128)).cast("long"))
            .select("batch", "shard", "docid", "url", "dl", "text")
        )
        t0 = time.time()
        staged.write.mode("overwrite").partitionBy("batch").parquet(out_dir)
        times["wide_pass"] = round(time.time() - t0, 3)

        t0 = time.time()
        spark.read.parquet(out_dir).where(F.col("docid") >= 0).agg(
            F.count(F.lit(1)), F.max("docid"), F.min("docid")).collect()
        times["density_guard"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    n = n_docs
    print(json.dumps({"workers": workers, "cores": cores, "n_docs": n, **times}))


def main() -> None:
    if os.environ.get("PYLATE_PS_INNER"):
        run_inner(MASTER_URL, int(sys.argv[3]),
                  os.path.join(tempfile.gettempdir(),
                               f"pylate_scale_corpus_{sys.argv[3]}"),
                  int(sys.argv[1]), int(sys.argv[2]))
        return
    workers, cores = int(sys.argv[1]), int(sys.argv[2])
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 3_200_000
    with Cluster(workers, cores):
        env = dict(os.environ)
        env["PYLATE_PS_INNER"] = "1"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             str(workers), str(cores), str(n_docs)],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            sys.exit(out.returncode)
        print(out.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
