"""Structured-Streaming ingestion: RESP PDUs → parsed samples → parquet.

This is the Spark-native replacement for the reference's whole write path
(TcpServer → RESPProtocolParser → WAL → NB+tree,
/root/reference/akumulid/tcp_server.h:35-124, storage2.cpp:144-204):

* transport: any streaming source that yields complete PDU chunks as a
  string column (socket, Kafka, files); tests use the file source.
* parse: :func:`akumuli_spark.sources.resp.parse_resp_stage` — one
  Arrow-batched Python stage, the only non-JVM hop.
* durability: the parquet sink + checkpoint directory replace the WAL
  (exactly-once within a query via the streaming commit log).
* late writes: the reference rejects writes into sealed storage windows
  with AKU_ELATE_WRITE (include/akumuli_def.h:154).  Here a watermark on
  event time bounds state, and ``foreachBatch`` splits each micro-batch
  into accepted rows vs late rows (older than ``late_after`` behind the
  max timestamp already committed for that series) which go to a rejects
  sink instead of vanishing silently.

Scale notes: the sink partitions by ``metric`` so queries prune partitions
on the metric predicate; within a micro-batch rows are sorted by
(series, ts) before writing so parquet row groups carry tight min/max
stats for time-range pushdown (the honest analogue of the reference's
time-ordered NB+tree leaves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from akumuli_spark.sources.resp import parse_resp_stage


def parsed_stream_from_files(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source transport: each text file contains complete PDUs.
    ``wholetext`` keeps a file's PDUs together in one row — the line-mode
    source would split multi-line PDUs across rows."""
    raw = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(input_dir)
    )
    return parse_resp_stage(raw, column="value")


def start_parquet_ingest(
    parsed: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    rejects_dir: str | None = None,
    late_after_ns: int = 60 * 10**9,
):
    """Start the ingest query.  Accepted rows append to ``out_dir``
    (partitioned by metric); rows arriving more than ``late_after_ns``
    behind the already-committed max ts of their series are written to
    ``rejects_dir`` (mirroring AKU_ELATE_WRITE as data, not an error
    code)."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.sort("series", "ts_ns")
        if rejects_dir is None:
            batch.write.mode("append").partitionBy("metric").parquet(out_dir)
            return
        try:
            existing = spark.read.parquet(out_dir)
            highwater = existing.groupBy("series").agg(
                F.max("ts_ns").alias("__hw")
            )
        except Exception:  # first batch: sink is empty
            highwater = None
        if highwater is None:
            accepted, late = batch, None
        else:
            joined = batch.join(F.broadcast(highwater), "series", "left")
            accepted = joined.filter(
                F.col("__hw").isNull()
                | (F.col("ts_ns") > F.col("__hw") - F.lit(late_after_ns))
            ).drop("__hw")
            late = joined.filter(
                F.col("__hw").isNotNull()
                & (F.col("ts_ns") <= F.col("__hw") - F.lit(late_after_ns))
            ).drop("__hw")
        accepted.write.mode("append").partitionBy("metric").parquet(out_dir)
        if late is not None:
            late.write.mode("append").parquet(rejects_dir)

    return (
        parsed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )


def windowed_rollup_stream(parsed: DataFrame, step: str = "1 minute",
                           watermark: str = "10 minutes") -> DataFrame:
    """Continuous pre-aggregation: the streaming analogue of the NB+tree's
    aggregate-carrying inner nodes (SURVEY.md §4.1c) — a base-step rollup
    {count,sum,min,max} per (series, window) maintained incrementally,
    usable to answer coarse group-aggregate queries without rescanning
    raw data."""
    with_ts = parsed.withColumn(
        "ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long"))
    )
    return (
        with_ts.withWatermark("ts", watermark)
        .groupBy(F.col("series"), F.window("ts", step).alias("w"))
        .agg(
            F.count("value").alias("count"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            # first-sample ts partial: group-aggregate emits the bin's
            # first timestamp (AggregationResult::_begin), so the rollup
            # must carry it like the NB+tree's SubtreeRef does
            F.min("ts_ns").alias("min_ts"),
        )
        .select(
            "series",
            F.unix_micros(F.col("w.start")).alias("bucket_us"),
            "count", "sum", "min", "max", "min_ts",
        )
    )
