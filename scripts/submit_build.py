"""spark-submit entrypoint: build an index over a pages table, then run
the reference query set — the cluster deployment shape the north rule
names (``spark-submit --py-files pylate_spark.zip scripts/submit_build.py``).

Usage:
  spark-submit [--master ...] --py-files pylate_spark.zip \
      scripts/submit_build.py <pages_parquet_or_synth:N> <index_dir> [k]

The pages argument is either a parquet path with the input_hint schema
``(url, warc_ts, html, text, lang)`` or ``synth:N`` for the
deterministic N-doc corpus. On a real deployment the read would be
``spark.read.format("iceberg").load(...)`` — gated behind import-try
since the Iceberg runtime jars are not in this image.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def read_pages(spark: SparkSession, src: str):
    if src.startswith("synth:"):
        from pylate_spark.sources.synth import synth_pages

        return synth_pages(spark, int(src.split(":", 1)[1]))
    if src.startswith("iceberg:"):
        try:
            return spark.read.format("iceberg").load(src.split(":", 1)[1])
        except Exception as e:  # pragma: no cover - jars not in this image
            raise RuntimeError(
                "Iceberg runtime jars not on the classpath; add "
                "--packages org.apache.iceberg:iceberg-spark-runtime-..."
            ) from e
    return spark.read.parquet(src)


def main() -> None:
    src, index_dir = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    # under spark-submit the session/master comes from the submit conf
    spark = SparkSession.builder.appName("pylate_spark_build").getOrCreate()
    from pylate_spark.plans.build import build_index
    from pylate_spark.plans.query import InvertedIndex
    from pylate_spark.sources.synth import synth_queries_pandas

    t0 = time.time()
    manifest = build_index(spark, read_pages(spark, src), index_dir, resume=True)
    build_sec = time.time() - t0

    qpdf = synth_queries_pandas(100)
    qset = list(zip(qpdf["query_id"].tolist(), qpdf["text"].tolist()))
    t0 = time.time()
    n = InvertedIndex(spark, index_dir).search(qset, k=k).count()
    print(
        json.dumps(
            {
                "n_docs": manifest["n_docs"],
                "n_postings": manifest["n_postings"],
                "build_sec": round(build_sec, 2),
                "query_sec": round(time.time() - t0, 2),
                "result_rows": n,
            }
        )
    )


if __name__ == "__main__":
    main()
