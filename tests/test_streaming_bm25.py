"""Continuous BM25 indexing: a document stream grown into the persisted
inverted index one epoch-partial batch per micro-batch must serve
EXACTLY like a one-shot batch build over the same corpus (every global
BM25 statistic is a sum the serve path folds), across arbitrary
micro-batch splits, with or without a batch bootstrap — and compaction
must fold the accumulated epochs without changing anything served."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from akumuli_spark.pipeline import text as T
from akumuli_spark.sources.testdata import load_table
from akumuli_spark.streaming.bm25 import start_streaming_bm25_index
from tests.conftest import SF_DIR

D_SCHEMA = "doc_id long, text string"
QS = [(1, "fast table scan"), (2, "hash join merge")]


def _stream_docs(spark, docs_rows, in_dir: str, cuts):
    os.makedirs(in_dir)
    for i in range(len(cuts) - 1):
        spark.createDataFrame(docs_rows[cuts[i]:cuts[i + 1]], D_SCHEMA) \
            .coalesce(1).write.parquet(os.path.join(in_dir, f"c{i}"))
    return (
        spark.readStream.schema(D_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )


def test_streaming_bm25_matches_batch_build(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    rows = [(r["doc_id"], r["text"])
            for r in docs.filter(F.col("doc_id") < 120).collect()]

    # batch-bootstrapped index (epoch 0) + streamed remainder
    idx = str(tmp_path / "bm25")
    boot = spark.createDataFrame(rows[:40], D_SCHEMA)
    T.build_bm25_index(boot, idx)
    stream = _stream_docs(
        spark, rows[40:], str(tmp_path / "in"), [0, 7, 30, 31, len(rows) - 40]
    )
    q = start_streaming_bm25_index(stream, idx, str(tmp_path / "chk"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    full = str(tmp_path / "full")
    T.build_bm25_index(spark.createDataFrame(rows, D_SCHEMA), full)
    want = sorted(map(tuple, T.bm25_topk_from_index(
        spark, full, QS, k=5).collect()))
    assert sorted(map(tuple, T.bm25_topk_from_index(
        spark, idx, QS, k=5).collect())) == want

    # the stream's epochs (1..n) coexist with the bootstrap's epoch 0;
    # compaction folds them all back into 0 and changes nothing served
    epochs = {
        r["epoch"]
        for r in spark.read.parquet(f"{idx}/stats").select("epoch").collect()
    }
    assert 0 in epochs and len(epochs) > 2
    T.compact_bm25_index(spark, idx)
    assert sorted(map(tuple, T.bm25_topk_from_index(
        spark, idx, QS, k=5).collect())) == want


def test_streaming_bm25_creates_index_from_nothing(spark, tmp_path):
    """No bootstrap: the first micro-batch creates the index layout."""
    docs = load_table(spark, SF_DIR, "documents")
    rows = [(r["doc_id"], r["text"])
            for r in docs.filter(F.col("doc_id") < 60).collect()]
    idx = str(tmp_path / "bm25")
    stream = _stream_docs(
        spark, rows, str(tmp_path / "in"), [0, 25, len(rows)]
    )
    q = start_streaming_bm25_index(stream, idx, str(tmp_path / "chk"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    full = str(tmp_path / "full")
    T.build_bm25_index(spark.createDataFrame(rows, D_SCHEMA), full)
    assert sorted(map(tuple, T.bm25_topk_from_index(
        spark, idx, QS, k=5).collect())) == sorted(map(tuple, (
            T.bm25_topk_from_index(spark, full, QS, k=5).collect())))
