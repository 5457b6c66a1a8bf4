"""Continuous ANN serving — an arriving stream of query vectors answered
from the stored IVF index (the online form of
``pipeline.similarity.ivf_topk_batch``; retrieval-at-ingest for a
training pipeline: tag every new document's nearest neighbors as it
lands, feeding downstream semantic-dedup or retrieval-augmentation
stages).

Spark-first shape: the query stream's micro-batches run through
``foreachBatch`` against :func:`~akumuli_spark.pipeline.similarity.
ivf_topk_batch_from_index` — each batch is a keyed join against the
pre-assigned lists table, never collected to the driver, and results
append to a parquet sink.  Serving is stateless per query (the index is
the only state, and it lives in storage), so the stream's cumulative
output equals the one-shot batch run over all queries — pytest-pinned
across micro-batch splits in ``tests/test_streaming_ann.py``.

Corpus growth composes with the dedup store pattern: append new corpus
vectors via ``similarity.append_ivf_index`` (frozen codebook, cost ∝
appended rows) between batches; queries served after the append see the
grown corpus, exactly like ``streaming/dedup.py``'s signature store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from akumuli_spark.pipeline.similarity import (
    IVF_NPROBE,
    ivf_topk_batch_from_index,
)


def ann_batch_against_index(spark, batch: DataFrame, index_path: str,
                            k: int = 10, nprobe: int = IVF_NPROBE,
                            vectorized: bool = False) -> DataFrame:
    """One micro-batch of continuous ANN serving: answer the arriving
    query batch (``query_id``, ``embedding``) from the stored index.
    Thin alias over :func:`ivf_topk_batch_from_index` so the streaming
    and batch entry points stay visibly the same code path."""
    return ivf_topk_batch_from_index(
        spark, index_path, batch, k=k, nprobe=nprobe, vectorized=vectorized
    )


def start_streaming_ann(queries: DataFrame, index_path: str, out_dir: str,
                        checkpoint_dir: str, k: int = 10,
                        nprobe: int = IVF_NPROBE,
                        vectorized: bool = False):
    """Wire :func:`ann_batch_against_index` into a foreachBatch sink:
    top-k results append to ``out_dir`` as query batches arrive.  The
    batch analogue of the whole stream's output is
    ``ivf_topk_batch_from_index`` over every query at once.  Serving is
    stateless, so exactly-once needs only an idempotent sink: results
    land in an ``epoch=<id>`` partition via dynamic partition overwrite,
    and a foreachBatch retry overwrites its own epoch instead of
    appending duplicate result rows (VERDICT r8 Next #5)."""
    from pyspark.sql import functions as F

    spark = queries.sparkSession

    def handle(batch: DataFrame, epoch_id: int) -> None:
        (
            ann_batch_against_index(
                spark, batch, index_path, k=k, nprobe=nprobe,
                vectorized=vectorized,
            )
            .withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(out_dir)
        )

    return (
        queries.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle)
        .start()
    )
