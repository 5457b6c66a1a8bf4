"""Streaming exact dedup: first-arrival keep set must equal the batch
exact_duplicates keep set for an id-ordered stream, across arbitrary
micro-batch splits and a checkpoint restart."""

from __future__ import annotations

import os

from akumuli_spark.pipeline.dedup import exact_duplicates
from akumuli_spark.streaming.dedup import streaming_exact_dedup

SCHEMA = "doc_id long, text string"


def _rows(n: int = 60, n_distinct: int = 20):
    # deterministic dup pattern: text i uses i % n_distinct, so every
    # fingerprint recurs three times across the id range
    return [(i, f"document body {i % n_distinct}") for i in range(n)]


def _run_stream(spark, in_dir: str, chk: str, name: str):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", chk).outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"select * from {name}").collect()


def test_streaming_dedup_matches_batch_keep_set(spark, tmp_path):
    rows = _rows()
    in_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    os.makedirs(in_dir)
    # id-ordered chunks with boundaries mid-dup-group
    cuts = [0, 7, 19, 20, 44, len(rows)]
    for i in range(len(cuts) - 1):
        df = spark.createDataFrame(rows[cuts[i]:cuts[i + 1]], SCHEMA)
        df.coalesce(1).write.parquet(os.path.join(in_dir, f"c{i}"))

    got = _run_stream(spark, in_dir, chk, "dedup_sink")
    batch = exact_duplicates(
        spark.createDataFrame(rows, SCHEMA)
    ).collect()
    assert {(r["fingerprint"], r["doc_id"]) for r in got} == {
        (r["fingerprint"], r["keep_id"]) for r in batch
    }
    # exactly one survivor per fingerprint
    assert len(got) == len({r["fingerprint"] for r in got})


def test_streaming_dedup_checkpoint_restart_keeps_state(spark, tmp_path):
    """Restart from the checkpoint: fingerprints seen before the restart
    must stay suppressed after it.  Parquet sink — the memory sink does
    not support checkpoint recovery."""
    rows = _rows()
    in_dir = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)

    def start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(in_dir, "*"))
        )
        return (
            streaming_exact_dedup(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk).outputMode("append").start()
        )

    spark.createDataFrame(rows[:30], SCHEMA).coalesce(1).write.parquet(
        os.path.join(in_dir, "c0")
    )
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # second half arrives after a restart: every fingerprint already seen
    # must stay suppressed (state restored from the checkpoint)
    spark.createDataFrame(rows[30:], SCHEMA).coalesce(1).write.parquet(
        os.path.join(in_dir, "c1")
    )
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = spark.read.parquet(out_dir).collect()
    batch = exact_duplicates(spark.createDataFrame(rows, SCHEMA)).collect()
    assert {(r["fingerprint"], r["doc_id"]) for r in got} == {
        (r["fingerprint"], r["keep_id"]) for r in batch
    }
