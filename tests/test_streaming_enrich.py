"""Streaming as-of enrichment: micro-batch splits and restarts must
reproduce the batch asof_join exactly."""

from __future__ import annotations

import os
import random

import pytest

from akumuli_spark.operators.asof import asof_join
from akumuli_spark.streaming.enrich import streaming_asof_join

SCHEMA = "series string, metric string, ts_ns long, value double"


def _rows(seed: int = 11, n_per: int = 40):
    # unique timestamps per (tagset, metric) stream, interleaved tags
    rng = random.Random(seed)
    rows = []
    for tag in ("a", "b"):
        ts_pool = rng.sample(range(1, 100_000), 2 * n_per)
        for i, ts in enumerate(sorted(ts_pool)):
            m = "L" if i % 3 != 0 else "R"  # ~2:1 left:right mix
            rows.append((f"{m} u={tag}", m, ts, rng.random()))
    return sorted(rows, key=lambda r: r[2])


def _write_chunk(spark, dir_: str, name: str, rows) -> None:
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(dir_, name))


def _expected(spark, rows):
    frame = spark.createDataFrame(rows, SCHEMA)
    out = asof_join(frame, "L", "R", 0, 200_000)
    return {
        (r["series"], r["ts_ns"]): (r["L"], r["R"]) for r in out.collect()
    }


def test_streaming_asof_matches_batch_across_microbatches(spark, tmp_path):
    rows = _rows()
    in_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    os.makedirs(in_dir)
    # time-ordered chunks: batches split the stream at arbitrary points
    cuts = [0, 17, 40, 41, 100, len(rows)]
    for i in range(len(cuts) - 1):
        _write_chunk(spark, in_dir, f"c{i}", rows[cuts[i]:cuts[i + 1]])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    q = (
        streaming_asof_join(stream, "L", "R")
        .writeStream.format("memory").queryName("asof_sink")
        .option("checkpointLocation", chk).outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["series"], r["ts_ns"]): (r["left_value"], r["right_value"])
        for r in spark.sql("SELECT * FROM asof_sink").collect()
    }
    assert got == _expected(spark, rows)


def test_streaming_asof_tolerance_and_validation(spark, tmp_path):
    rows = [
        ("R u=x", "R", 100, 5.0),
        ("L u=x", "L", 150, 1.0),   # Δ=50 ≤ tol
        ("L u=x", "L", 400, 2.0),   # Δ=300 > tol → NULL
    ]
    in_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    os.makedirs(in_dir)
    _write_chunk(spark, in_dir, "c0", rows)
    stream = spark.readStream.schema(SCHEMA).parquet(os.path.join(in_dir, "*"))
    q = (
        streaming_asof_join(stream, "L", "R", tolerance_ns=100)
        .writeStream.format("memory").queryName("asof_tol_sink")
        .option("checkpointLocation", chk).outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["ts_ns"]: r["right_value"]
        for r in spark.sql("SELECT * FROM asof_tol_sink").collect()
    }
    assert got == {150: 5.0, 400: None}
    with pytest.raises(ValueError, match="tolerance"):
        streaming_asof_join(
            spark.readStream.schema(SCHEMA).parquet(in_dir), "L", "R",
            tolerance_ns=0,
        )


def test_streaming_asof_group_spans_arrow_chunks(spark, tmp_path):
    # Force one key's micro-batch slice across MANY Arrow chunks (batch
    # size 16) with file order deliberately scrambled: the (ts, side)
    # walk must still see the whole batch in global ts order.
    rng = random.Random(3)
    rows = _rows(seed=3, n_per=60)
    scrambled = rows[:]
    rng.shuffle(scrambled)
    in_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    os.makedirs(in_dir)
    _write_chunk(spark, in_dir, "c0", scrambled)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        stream = spark.readStream.schema(SCHEMA).parquet(
            os.path.join(in_dir, "*"))
        q = (
            streaming_asof_join(stream, "L", "R")
            .writeStream.format("memory").queryName("asof_chunks_sink")
            .option("checkpointLocation", chk).outputMode("append").start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if old is not None:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {
        (r["series"], r["ts_ns"]): (r["left_value"], r["right_value"])
        for r in spark.sql("SELECT * FROM asof_chunks_sink").collect()
    }
    assert got == _expected(spark, rows)
