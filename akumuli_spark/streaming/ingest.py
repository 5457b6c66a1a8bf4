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


def parsed_stream_from_files(spark: SparkSession, input_dir: str,
                             on_error: str = "fail") -> DataFrame:
    """File-source transport: each text file contains complete PDUs.
    ``wholetext`` keeps a file's PDUs together in one row — the line-mode
    source would split multi-line PDUs across rows.  For a UDP-fed spool
    (sources/udp.py) pass ``on_error="skip"``: bad datagrams are dropped
    like the reference's UDP server does."""
    raw = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(input_dir)
    )
    return parse_resp_stage(raw, column="value", on_error=on_error)


class HighWaterState:
    """Incremental per-series high-water marks for the late-write gate.

    The reference keeps the last committed timestamp per series in its
    in-memory index and rejects older-than-window writes in O(1)
    (AKU_ELATE_WRITE); re-scanning the committed sink every micro-batch
    would instead be O(history) — a full-table read per batch at 100 TB.
    This state is O(series): seeded ONCE from the sink at (re)start (so
    restarts recover without a WAL replay), then advanced from each
    batch's own per-series max.
    """

    def __init__(self) -> None:
        self.marks: dict[str, int] | None = None
        self.seed_scans = 0  # sink scans performed (must stay ≤ 1)

    def seed(self, spark: SparkSession, out_dir: str) -> None:
        if self.marks is not None:
            return
        self.seed_scans += 1
        try:
            existing = spark.read.parquet(out_dir)
            self.marks = {
                r["series"]: r["__hw"]
                for r in existing.groupBy("series")
                .agg(F.max("ts_ns").alias("__hw"))
                .collect()
            }
        except Exception:  # empty sink: nothing committed yet
            self.marks = {}

    def advance(self, per_series_max: list) -> None:
        assert self.marks is not None
        for row in per_series_max:
            prev = self.marks.get(row["series"])
            if prev is None or row["__m"] > prev:
                self.marks[row["series"]] = row["__m"]


def start_parquet_ingest(
    parsed: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    rejects_dir: str | None = None,
    late_after_ns: int = 60 * 10**9,
    state: HighWaterState | None = None,
):
    """Start the ingest query.  Accepted rows append to ``out_dir``
    (partitioned by metric); rows arriving more than ``late_after_ns``
    behind the already-committed max ts of their series are written to
    ``rejects_dir`` (mirroring AKU_ELATE_WRITE as data, not an error
    code).  The per-series high-water mark is maintained incrementally in
    ``state`` (O(series), one sink scan at startup only — never per
    batch); pass your own :class:`HighWaterState` to observe or pre-seed
    it."""
    hw_state = state if state is not None else HighWaterState()

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.sort("series", "ts_ns")
        if rejects_dir is None:
            batch.write.mode("append").partitionBy("metric").parquet(out_dir)
            return
        hw_state.seed(spark, out_dir)
        marks = hw_state.marks or {}
        batch = batch.persist()
        try:
            if marks:
                highwater = spark.createDataFrame(
                    list(marks.items()), "series string, __hw long"
                )
                joined = batch.join(F.broadcast(highwater), "series", "left")
                accepted = joined.filter(
                    F.col("__hw").isNull()
                    | (F.col("ts_ns") > F.col("__hw") - F.lit(late_after_ns))
                ).drop("__hw")
                late = joined.filter(
                    F.col("__hw").isNotNull()
                    & (F.col("ts_ns") <= F.col("__hw") - F.lit(late_after_ns))
                ).drop("__hw")
            else:
                accepted, late = batch, None
            accepted = accepted.persist()
            accepted.write.mode("append").partitionBy("metric").parquet(out_dir)
            if late is not None:
                late.write.mode("append").parquet(rejects_dir)
            # O(series-in-batch) rows — the only driver-side state update
            hw_state.advance(
                accepted.groupBy("series").agg(F.max("ts_ns").alias("__m")).collect()
            )
            accepted.unpersist()
        finally:
            batch.unpersist()

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
