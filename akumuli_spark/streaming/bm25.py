"""Continuous BM25 indexing — the retrieval twin of
``streaming.fingerprint``: an arriving document stream grows the
persisted inverted index (``pipeline.text.build_bm25_index`` layout)
one epoch-keyed partial batch per micro-batch.

Because every global BM25 statistic is a SUM (df, N, Σdl), each batch
lands as partial rows that the serve path folds — served idf is EXACT
after every batch, never stale, and nothing is rebuilt (the Lucene
segment-merge trade the batch layout already sidesteps; see
``build_bm25_index``).

Exactly-once: ``append_bm25_index`` writes all three tables under
``epoch = foreachBatch epoch_id + 1`` with dynamic partition overwrite,
so a retried epoch replaces its own partials bit-for-bit — the repo's
epoch-keyed store protocol.  Epoch 0 is reserved for a batch
:func:`~akumuli_spark.pipeline.text.build_bm25_index` bootstrap (and
for :func:`~akumuli_spark.pipeline.text.compact_bm25_index`, which
folds all epochs back into 0).  One stream per index; to re-point a
NEW stream (fresh checkpoint — epoch ids restart) at an existing
index, compact first so the restarted epochs can't collide with the
old stream's partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def start_streaming_bm25_index(docs: DataFrame, index_dir: str,
                               checkpoint_dir: str):
    """Wire the document stream (doc_id, text) into a foreachBatch sink
    that grows the BM25 index at ``index_dir``.  Serve at any time with
    :func:`~akumuli_spark.pipeline.text.bm25_topk_from_index` — a serve
    planned mid-append returns exactly the pre- or the post-batch
    answer, never a mix: appends land postings LAST and the serve path
    folds only epochs whose postings are visible (the snapshot gate in
    ``bm25_topk_from_index``; pinned by
    ``test_bm25_mid_append_serve_is_pre_or_post``)."""
    from akumuli_spark.pipeline.text import append_bm25_index

    def handle(batch: DataFrame, epoch_id: int) -> None:
        # +1: epoch 0 is the batch-bootstrap/compaction namespace
        append_bm25_index(
            batch.select("doc_id", "text"), index_dir,
            epoch=int(epoch_id) + 1,
        )

    return (
        docs.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle)
        .start()
    )
