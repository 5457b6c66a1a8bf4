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
    # three streamed epochs: a mid-size batch, a ONE-document batch (the
    # tiny-partial edge), and the remainder — one fewer batch than r14's
    # shape, same edges (driver verify window, OPTIMIZATION_r15.md §11)
    stream = _stream_docs(
        spark, rows[40:], str(tmp_path / "in"), [0, 30, 31, len(rows) - 40]
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


def test_streaming_retrieval_fusion_mid_stream_parity(spark, tmp_path):
    """End-to-end streaming retrieval (VERDICT r10 Next #8): one
    document stream feeds BOTH retrieval-side sinks — the BM25 index
    (continuous epoch-partial appends) and the fingerprint dedup store
    (SimHash signatures, batch-vs-store pairing) — and after EVERY
    micro-batch a hybrid_rrf serve composed from the growing index and
    a fixed dense list equals the same fusion over a one-shot batch
    index built on exactly the streamed prefix.  The dedup store grows
    in lockstep with the index, so the two sinks stay one corpus."""
    from akumuli_spark.pipeline import similarity as S
    from akumuli_spark.pipeline.dedup import simhash_signatures
    from akumuli_spark.streaming.fingerprint import (
        start_streaming_fingerprint_dedup,
    )

    docs = load_table(spark, SF_DIR, "documents")
    rows = [(r["doc_id"], r["text"])
            for r in docs.filter(F.col("doc_id") < 90).collect()]
    # two micro-batches: parity is still checked after EVERY batch
    # (mid-stream at 45 and at the end); each extra batch costs a full
    # batch reference build (driver verify window, OPTIMIZATION_r15.md §11)
    cuts = [0, 45, 90]
    embs = load_table(spark, SF_DIR, "embeddings")
    dense = S.cosine_topk(embs, [1, 2], k=5).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    ).localCheckpoint(eager=True)  # fixed dense list across the stream

    in_docs = str(tmp_path / "in_docs")
    in_sigs = str(tmp_path / "in_sigs")
    os.makedirs(in_docs)
    os.makedirs(in_sigs)
    idx = str(tmp_path / "bm25")
    store = str(tmp_path / "sig_store")
    pairs = str(tmp_path / "sig_pairs")

    doc_stream = (
        spark.readStream.schema(D_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_docs, "*"))
    )
    sig_stream = (
        spark.readStream.schema("id long, simhash long")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_sigs, "*"))
    )
    q_idx = start_streaming_bm25_index(doc_stream, idx,
                                       str(tmp_path / "chk_idx"))
    q_sig = start_streaming_fingerprint_dedup(
        sig_stream, store, pairs, str(tmp_path / "chk_sig"))
    try:
        for i in range(len(cuts) - 1):
            chunk = spark.createDataFrame(rows[cuts[i]:cuts[i + 1]], D_SCHEMA)
            chunk.coalesce(1).write.parquet(os.path.join(in_docs, f"c{i}"))
            simhash_signatures(chunk).select("id", "simhash").coalesce(1) \
                .write.parquet(os.path.join(in_sigs, f"c{i}"))
            q_idx.processAllAvailable()
            q_sig.processAllAvailable()

            # mid-stream hybrid serve from the GROWING index
            sparse = T.bm25_topk_from_index(spark, idx, QS, k=5)
            got = sorted(map(tuple, T.hybrid_rrf(
                sparse, dense, k=5).collect()))
            # reference: batch build over exactly the streamed prefix
            ref = str(tmp_path / f"ref{i}")
            T.build_bm25_index(
                spark.createDataFrame(rows[:cuts[i + 1]], D_SCHEMA), ref)
            want = sorted(map(tuple, T.hybrid_rrf(
                T.bm25_topk_from_index(spark, ref, QS, k=5),
                dense, k=5,
            ).collect()))
            assert got == want, f"prefix {cuts[i + 1]}"
            # the dedup store grew in lockstep with the index
            assert spark.read.parquet(store).count() == cuts[i + 1]
    finally:
        q_idx.stop()
        q_sig.stop()


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
