"""Continuous z-store ingest — the metrics stream grown into the
Z-ordered store (:mod:`akumuli_spark.sources.zorder`) one clustered,
snapshot-published batch per micro-batch.

Each micro-batch is clustered under the store's layout contract, landed
as invisible files, and made visible by one atomic manifest publish —
so a concurrent dashboard query (through ``ZorderDatabase``) always
sees whole batches, never a torn one.  Exactly-once: the batch's epoch
(foreachBatch epoch_id + 1; 0 is the build/re-cluster namespace) is
recorded in the manifest rows, and a replayed batch whose epoch is
already committed is a no-op — the repo's epoch protocol, realized
through the manifest ledger since data files here are immutable.  A
replay that re-lands files after a pre-publish crash leaves invisible
orphans for ``vacuum_zorder``.

Per-batch files erode pruning over time (each covers its batch's
rectangles); schedule ``zorder_metrics_table`` re-clusters as the
OPTIMIZE cadence, exactly like compaction on the layout and BM25
stores.  One stream per store — restarted checkpoints restart epoch
ids, so re-cluster first (epoch rows fold to 0) before re-pointing a
new stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def start_streaming_zorder_ingest(metrics: DataFrame, store_dir: str,
                                  checkpoint_dir: str):
    """Wire a metrics stream (engine schema or any frame with series,
    metric, ts_ns, value) into a foreachBatch sink that grows the
    z-store at ``store_dir`` (built first — possibly over an empty
    frame — so the layout contract is pinned)."""
    from akumuli_spark.sources.zorder import zorder_append

    def handle(batch: DataFrame, epoch_id: int) -> None:
        # +1: epoch 0 is the build/re-cluster namespace
        zorder_append(batch.sparkSession, batch, store_dir,
                      epoch=int(epoch_id) + 1)

    return (
        metrics.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle)
        .start()
    )
