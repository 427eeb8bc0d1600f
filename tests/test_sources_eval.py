"""Source-format boundary + eval CLI smoke tests.

The format seam (``sources/reader.read_table``) is what makes an
Iceberg deployment a configuration change: everything downstream takes
DataFrames. No Iceberg jars exist in this sandbox, so the seam is
exercised with the datasources that are present (parquet, json,
catalog tables) — the ``format="iceberg"`` path is the same
``spark.read.format(...).load(...)`` call."""

from __future__ import annotations

import json

import pytest

from pylate_spark.sources.reader import read_table
from pylate_spark.sources.synth import synth_pages_pandas, synth_queries_pandas


@pytest.fixture(scope="module")
def pages_pdf():
    return synth_pages_pandas(120)


def test_read_table_parquet_default(spark, tmp_path, pages_pdf):
    p = str(tmp_path / "pages_pq")
    spark.createDataFrame(pages_pdf).write.parquet(p)
    assert read_table(spark, p).count() == 120


def test_read_table_other_datasource(spark, tmp_path, pages_pdf):
    """format= routes through spark.read.format(...).load(...) — the
    exact call shape an iceberg/orc/delta deployment uses."""
    p = str(tmp_path / "pages_json")
    spark.createDataFrame(pages_pdf).select("url", "text", "lang").write.json(p)
    df = read_table(spark, p, format="json")
    assert df.count() == 120 and "text" in df.columns


def test_read_table_catalog_identifier(spark, pages_pdf):
    """format='table' resolves catalog identifiers — how Iceberg tables
    are addressed on a real cluster (spark.table('cat.db.pages'))."""
    spark.createDataFrame(pages_pdf).createOrReplaceTempView("pages_view_t")
    assert read_table(spark, "pages_view_t", format="table").count() == 120


def test_read_table_env_default(spark, tmp_path, pages_pdf, monkeypatch):
    p = str(tmp_path / "pages_json2")
    spark.createDataFrame(pages_pdf).select("url", "text").write.json(p)
    monkeypatch.setenv("PYLATE_SPARK_FORMAT", "json")
    assert read_table(spark, p).count() == 120


def test_eval_cli_end_to_end(spark, tmp_path, capsys):
    """scripts/eval.py over a mini (docs, queries, qrels) triple:
    build → search → metrics, qrels keyed by URL (docmap resolution)."""
    import sys

    sys.path.insert(0, "scripts")
    import importlib

    eval_mod = importlib.import_module("eval")

    docs_pdf = synth_pages_pandas(150)
    queries_pdf = synth_queries_pandas(10)
    # graded qrels keyed by URL: relevance = # distinct query terms in doc
    import pandas as pd

    rows = []
    for qid, qtext in zip(queries_pdf["query_id"], queries_pdf["text"]):
        qterms = set(qtext.lower().split())
        for url, text in zip(docs_pdf["url"], docs_pdf["text"]):
            rel = len(qterms & set(text.lower().split()))
            if rel > 0:
                rows.append((int(qid), url, rel))
    qrels_pdf = pd.DataFrame(rows, columns=["query_id", "url", "relevance"])

    d = str(tmp_path / "docs.parquet")
    q = str(tmp_path / "queries.parquet")
    r = str(tmp_path / "qrels.parquet")
    spark.createDataFrame(docs_pdf).write.parquet(d)
    spark.createDataFrame(queries_pdf).write.parquet(q)
    spark.createDataFrame(qrels_pdf).write.parquet(r)

    summary = eval_mod.main([d, q, r, "--index-dir", str(tmp_path / "idx"), "--k", "10"])
    assert summary["n_queries"] >= 8  # queries with ≥1 judged+retrieved doc
    assert 0.0 < summary["ndcg@10"] <= 1.0
    assert 0.0 < summary["recall@10"] <= 1.0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out) == summary

    # reuse path: a second run must skip the build and still evaluate
    summary2 = eval_mod.main([d, q, r, "--index-dir", str(tmp_path / "idx")])
    assert summary2["ndcg@10"] == summary["ndcg@10"]
