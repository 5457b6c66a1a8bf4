"""Continuous sketch rollup — the analytics twin of ``streaming.bm25``:
an arriving event stream grows the persisted mergeable-sketch store
(:mod:`akumuli_spark.sources.sketch_store`) one epoch-keyed partial
batch per micro-batch, so distinct-count and quantile serving over any
bucket-aligned range is exact after every batch and never re-scans the
stream's history.

This is the continuous-rollup half the reference delegates to its
real-time ingest path (akumulid ingestion pipeline + in-tree SubtreeRef
stats, nbtree.h) — but for the NON-decomposable aggregates (distincts,
quantiles) those in-tree stats cannot answer.

Exactly-once: each micro-batch lands under ``epoch = foreachBatch
epoch_id + 1`` with dynamic partition overwrite, so a replayed batch
(crash before the checkpoint commit) replaces its own partials
bit-for-bit — the repo's epoch-keyed store protocol.  Epoch 0 is the
batch-bootstrap / :func:`~akumuli_spark.sources.sketch_store.compact_sketch_store`
namespace.  One stream per store; to re-point a NEW stream (fresh
checkpoint — epoch ids restart) at an existing store, compact first so
restarted epochs cannot collide with the old stream's partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def start_streaming_sketch_store(events: DataFrame, store_dir: str,
                                 checkpoint_dir: str):
    """Wire an event stream into a foreachBatch sink that grows the
    sketch store at ``store_dir`` (which must already exist — built by
    :func:`~akumuli_spark.sources.sketch_store.build_sketch_store`,
    possibly over an empty frame, so the layout contract is pinned
    before the stream starts).  Serve at any time with
    ``distinct_over_range`` / ``quantiles_over_range``: a serve planned
    mid-append sees either none or all of a batch's partials per table
    — each table write is a partition replace, and the serve-time fold
    is insensitive to an epoch being present in one table and not yet
    the other ONLY for the table it reads (distincts read hll, quantiles
    read hist), so each answer is individually pre- or post-batch."""
    from akumuli_spark.sources.sketch_store import append_sketch_store

    def handle(batch: DataFrame, epoch_id: int) -> None:
        # +1: epoch 0 is the batch-bootstrap/compaction namespace
        append_sketch_store(batch, store_dir, epoch=int(epoch_id) + 1)

    return (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle)
        .start()
    )
