"""Calibrate search_join's ``two_phase="auto"`` machinery bar for THIS
deployment — the persisted-protocol version of the round-5 sweep in
PLANS.md §9b (the ANN probe curve got the same treatment in
``probe_recall_curve``; this is the join plan's twin).

Protocol: build (or reuse) a synthetic index, then for each batch size
run the SAME batch through the single-phase and forced two-phase plans
(interleaved min-of-N), alongside the ``head_saved``/``rare_repl``
aggregate estimates the auto rule consults. The printed suggestion is
the smallest per-core bar that keeps every measured losing point
single-phase with ~10× headroom (the safety-valve discipline: a wrong
two-phase pick costs a small constant, a wrong single-phase pick at
web scale is unbounded — see plans/query.JOIN_MACHINERY_ROWS_PER_CORE).

Apply the result via ``IndexConfig(join_machinery_rows_per_core=...)``
at build time or the ``PYLATE_JOIN_MACHINERY_ROWS_PER_CORE`` env var
at query time.

Usage:
    python scripts/calibrate_join.py [--docs 200000] [--batches 100,400,1000,4000]
        [--index-dir DIR]   # reuse an existing index instead of building
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--batches", default="100,400,1000,4000")
    ap.add_argument("--index-dir", default=None)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import pandas as pd
    from pyspark.sql import functions as F

    from pylate_spark.config import IndexConfig
    from pylate_spark.plans.build import build_index
    from pylate_spark.plans.query import InvertedIndex
    from pylate_spark.session import get_spark
    from pylate_spark.sources.synth import synth_pages, synth_queries_pandas

    spark = get_spark(app_name="calibrate_join")
    cores = spark.sparkContext.defaultParallelism

    idx_dir = args.index_dir
    if idx_dir is None:
        idx_dir = tempfile.mkdtemp(prefix="pylate_cal_idx_")
        cfg = IndexConfig(
            shard_size=max(args.docs // (2 * cores), 4096),
            block_size=128,
            term_buckets=64,
        )
        build_index(spark, synth_pages(spark, args.docs), idx_dir, config=cfg,
                    shards_per_batch=4 * cores)
    idx = InvertedIndex(spark, idx_dir)

    batches = [int(b) for b in args.batches.split(",")]
    qall = synth_queries_pandas(max(batches))
    idx.search_join(
        spark.createDataFrame(qall.head(10)), k=10
    ).count()  # warm workers

    points = []
    for nq in batches:
        qdf = spark.createDataFrame(qall.head(nq)).cache()
        qdf.count()
        # the same aggregate estimate auto consults (one tiny job)
        from pylate_spark.functions.tokenize import make_tokenize_udf

        qt = qdf.select(
            "query_id",
            F.explode(F.array_distinct(make_tokenize_udf(
                idx.config.token_pattern)(F.col("text")))).alias("term"),
        )
        from pylate_spark.plans.build import active_dir

        stats = spark.read.parquet(
            active_dir(idx.paths, idx.manifest, "term_stats")
        ).select("term", "df")
        cutoff = max(256, idx.n_docs // 20)
        est = (
            qt.join(stats, "term").groupBy("term")
            .agg(F.count(F.lit(1)).alias("nq"), F.first("df").alias("df"))
            .agg(
                F.sum(F.when(F.col("df") > cutoff, F.col("df") * (F.col("nq") - 1))
                      .otherwise(F.lit(0))).alias("head_saved"),
                F.sum(F.when(F.col("df") <= cutoff, F.col("df") * F.col("nq"))
                      .otherwise(F.lit(0))).alias("rare_repl"),
            ).collect()[0]
        )
        best = {"single": 1e18, "two": 1e18}
        for _ in range(args.repeats):
            t0 = time.time()
            idx.search_join(qdf, k=10, two_phase=False).count()
            best["single"] = min(best["single"], time.time() - t0)
            t0 = time.time()
            idx.search_join(qdf, k=10, two_phase=True).count()
            best["two"] = min(best["two"], time.time() - t0)
        points.append({
            "n_queries": nq,
            "head_saved": int(est["head_saved"] or 0),
            "rare_repl": int(est["rare_repl"] or 0),
            "single_phase_s": round(best["single"], 2),
            "two_phase_s": round(best["two"], 2),
        })
        qdf.unpersist(blocking=False)
        print(json.dumps(points[-1]), file=sys.stderr)

    # smallest bar that keeps every measured two-phase LOSS single-phase,
    # with 10x headroom. Only POSITIVE losing margins bind: a loss with
    # head_saved <= rare_repl is already single-phase at ANY non-negative
    # bar, and a negative suggestion would make auto engage two-phase
    # even when head_saved < rare_repl — the opposite of the safety
    # valve's intent. No positive losing margin -> None ("keep default").
    margins = [
        m
        for p in points
        if p["two_phase_s"] > p["single_phase_s"]
        and (m := p["head_saved"] - p["rare_repl"]) > 0
    ]
    suggested = max(margins) * 10 // cores if margins else None
    print(json.dumps({
        "cores": cores,
        "points": points,
        "suggested_join_machinery_rows_per_core": suggested,
        "note": "apply via IndexConfig(join_machinery_rows_per_core=...) "
                "or PYLATE_JOIN_MACHINERY_ROWS_PER_CORE",
    }))


if __name__ == "__main__":
    main()
