"""One-command retrieval-quality evaluation over a (docs, queries,
qrels) parquet triple — the CLI analog of the reference's BEIR flow
(``/root/reference/pylate/evaluation/beir.py:37-87,143-207``:
``load_beir`` → retrieve → ``evaluate``), but distributed: build (or
reuse) the inverted index, search the full query set through the
auto-mode kernel, join qrels, print mean nDCG@k / hits@k / recall@k.

Usage:
    python scripts/eval.py DOCS.parquet QUERIES.parquet QRELS.parquet \
        [--index-dir DIR] [--k 10] [--key-col url] [--text-col text] \
        [--format parquet] [--per-query]

Inputs:
- DOCS: any table with (--key-col, --text-col) columns (default
  url/text — the BASELINE.json pages shape).
- QUERIES: (query_id long, text string).
- QRELS: (query_id long, relevance) plus either ``docid`` (index docid
  space) or the doc key column (e.g. ``url``) — keys are resolved to
  docids through the index docmap, the id↔key translation the reference
  keeps in its pickled maps (``fast_plaid.py:136-174``).

``--index-dir``: reuse a finalized index there if present (skip the
build); otherwise build into it (default: a temp dir). ``--format``
reads the three inputs through any Spark datasource (iceberg/orc/...;
see pylate_spark.sources.reader).

Prints one JSON line with the mean metrics (and optionally the
per-query table).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("docs")
    ap.add_argument("queries")
    ap.add_argument("qrels")
    ap.add_argument("--index-dir", default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--key-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--format", default=None, dest="fmt",
                    help="Spark datasource for the inputs (default parquet)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--per-query", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from pylate_spark.evaluation import evaluate_index
    from pylate_spark.plans.build import IndexPaths, build_index, load_manifest
    from pylate_spark.plans.query import InvertedIndex
    from pylate_spark.session import get_spark
    from pylate_spark.sources.reader import read_table

    spark = get_spark(app_name="pylate_eval", master=args.master)
    docs = read_table(spark, args.docs, format=args.fmt)
    queries = read_table(spark, args.queries, format=args.fmt).select("query_id", "text")
    qrels = read_table(spark, args.qrels, format=args.fmt)

    index_dir = args.index_dir or tempfile.mkdtemp(prefix="pylate_eval_idx_")
    if load_manifest(IndexPaths(index_dir)).get("finalized"):
        print(f"# reusing finalized index at {index_dir}", file=sys.stderr)
    else:
        build_index(spark, docs, index_dir, key_col=args.key_col, text_col=args.text_col)

    if "docid" not in qrels.columns:
        # resolve doc keys → index docids through the docmap. LEFT join:
        # a judged-relevant doc that is not in the index must stay in
        # the qrels (with a null docid that can never be retrieved) so
        # it counts as a MISS in recall/nDCG denominators — an inner
        # join would silently shrink the judgment set and overstate
        # quality on a corpus-mismatched index.
        # The docmap is one row per corpus DOCUMENT (10^12 at the
        # design point) — never broadcast it. The qrels are the small
        # side: broadcast the judged KEYS into a left-semi join that
        # prunes the docmap scan down to ≤ |qrels| rows (no docmap
        # shuffle anywhere), then that pruned map is itself small
        # enough to broadcast into the left join.
        docmap = InvertedIndex(spark, index_dir).docmap().select(
            F.col("url").alias(args.key_col), "docid"
        )
        judged_keys = qrels.select(args.key_col).distinct()
        judged_map = docmap.join(F.broadcast(judged_keys), args.key_col, "left_semi")
        qrels = qrels.join(F.broadcast(judged_map), args.key_col, "left").drop(args.key_col)
        n_unresolved = qrels.where(F.col("docid").isNull()).count()
        if n_unresolved:
            print(f"# {n_unresolved} qrels rows reference docs not in the index "
                  "(counted as misses)", file=sys.stderr)
    qrels = qrels.select("query_id", "docid", "relevance")

    per_query = evaluate_index(spark, index_dir, queries, qrels, k=args.k)
    means = per_query.agg(
        F.avg("ndcg").alias("ndcg"),
        F.avg("hits").alias("hits"),
        F.avg("recall").alias("recall"),
        F.count(F.lit(1)).alias("n_queries"),
    ).collect()[0]
    summary = {
        f"ndcg@{args.k}": round(float(means["ndcg"]), 4),
        f"hits@{args.k}": round(float(means["hits"]), 4),
        f"recall@{args.k}": round(float(means["recall"]), 4),
        "n_queries": int(means["n_queries"]),
        "index_dir": index_dir,
    }
    if args.per_query:
        for r in per_query.orderBy("query_id").collect():
            print(json.dumps({k: (round(float(v), 4) if isinstance(v, float) else v)
                              for k, v in r.asDict().items()}))
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
