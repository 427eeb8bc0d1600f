"""Streaming ingest tests: foreachBatch index updates must land
exactly-once and produce the same index as a batch add (the streaming
analog of the reference's incremental-add tests,
``tests/test_fast_plaid.py``)."""

from __future__ import annotations

import pytest

from pylate_spark.config import IndexConfig
from pylate_spark.plans.build import build_index
from pylate_spark.plans.query import InvertedIndex
from pylate_spark.sources.synth import PAGES_SCHEMA, synth_pages_pandas
from pylate_spark.streaming.ingest import ingest_monitor, stream_index_updates

CFG = IndexConfig(shard_size=64, block_size=32, term_buckets=8)
QUERIES = [(0, "the w00004"), (1, "w00001 w00002")]


def test_stream_index_updates(spark, tmp_path):
    base_pdf = synth_pages_pandas(200)
    idx_dir = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(base_pdf), idx_dir, config=CFG, shards_per_batch=2)
    before = InvertedIndex(spark, idx_dir).n_docs

    # stream source: a directory of parquet files appearing over time
    src = tmp_path / "incoming"
    src.mkdir()
    extra = synth_pages_pandas(80, seed=321)
    spark.createDataFrame(extra).write.mode("overwrite").parquet(str(src / "f1"))

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(str(src / "f1"))
    q = stream_index_updates(
        stream, idx_dir, checkpoint_dir=str(tmp_path / "ckpt"), shards_per_batch=2
    )
    q.awaitTermination(120)

    idx = InvertedIndex(spark, idx_dir)
    assert idx.n_docs == before + 80
    res = idx.search(QUERIES, k=5)
    assert res.count() > 0

    # restart with the same checkpoint: no re-ingest (exactly-once)
    stream2 = spark.readStream.schema(PAGES_SCHEMA).parquet(str(src / "f1"))
    q2 = stream_index_updates(
        stream2, idx_dir, checkpoint_dir=str(tmp_path / "ckpt"), shards_per_batch=2
    )
    q2.awaitTermination(60)
    assert InvertedIndex(spark, idx_dir).n_docs == before + 80


def test_ingest_monitor(spark, tmp_path):
    pdf = synth_pages_pandas(100)
    src = tmp_path / "mon"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(str(src))
    agg = ingest_monitor(stream, watermark="1 hour", window="1 minute")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("mon_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM mon_out").collect()
    assert sum(r["n_pages"] for r in rows) == 100
    langs = {r["lang"] for r in rows}
    assert "en" in langs and "de" in langs
