"""Stateful streaming EWMA forecast: micro-batch increments and
checkpoint restarts must reproduce the batch recursion bit-for-bit."""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

from akumuli_spark.query.apply import _forecast_preds
from akumuli_spark.streaming.detect import streaming_ewma_forecast

ALPHA = 0.3


def _series_values(series: str, n: int) -> list[float]:
    # deterministic, series-dependent, with a spike to make errors move
    base = float(ord(series[-1]))
    return [base + (i % 7) + (100.0 if i == 20 else 0.0) for i in range(n)]


def _write_chunk(spark, dir_: str, name: str, lo: int, hi: int) -> None:
    rows = [
        (s, i * 10**9, v)
        for s in ("cpu a", "cpu b", "mem c")
        for i, v in enumerate(_series_values(s, hi))
        if lo <= i < hi
    ]
    df = spark.createDataFrame(rows, "series string, ts_ns long, value double")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(dir_, name))


def _expected(n: int) -> dict[tuple[str, int], tuple[float | None, float | None]]:
    out = {}
    for s in ("cpu a", "cpu b", "mem c"):
        xs = _series_values(s, n)
        preds = _forecast_preds(xs, "ewma", ALPHA, 0.0, 0.0, 0)
        for i, (p, x) in enumerate(zip(preds, xs)):
            out[(s, i * 10**9)] = (
                (None, None) if math.isnan(p) else (p, p - x)
            )
    return out


def _collect_sink(spark, table: str) -> dict:
    rows = spark.sql(f"SELECT * FROM {table}").collect()
    return {
        (r["series"], r["ts_ns"]): (r["forecast"], r["err"]) for r in rows
    }


def _start(spark, in_dir: str, chk: str, table: str):
    stream = (
        spark.readStream.schema("series string, ts_ns long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    out = streaming_ewma_forecast(stream, alpha=ALPHA)
    return (
        out.writeStream.format("memory").queryName(table)
        .option("checkpointLocation", chk).outputMode("append").start()
    )


def test_streaming_ewma_matches_batch_across_microbatches(spark, tmp_path):
    """24 steps per series split into 3 files; maxFilesPerTrigger=1
    forces ≥3 micro-batches, so warm-up state (the first 10 frames span
    two files) crosses the state store at least twice."""
    in_dir = str(tmp_path / "in")
    for k, (lo, hi) in enumerate([(0, 8), (8, 16), (16, 24)]):
        _write_chunk(spark, in_dir, f"chunk{k}", lo, hi)
    q = _start(spark, in_dir, str(tmp_path / "chk"), "ewma_sink")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _collect_sink(spark, "ewma_sink")
    want = _expected(24)
    assert len(got) == 3 * 24
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=0.0, nan_ok=False), k


def _start_parquet(spark, in_dir: str, chk: str, out_dir: str):
    stream = (
        spark.readStream.schema("series string, ts_ns long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    out = streaming_ewma_forecast(stream, alpha=ALPHA)
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk).outputMode("append").start()
    )


def test_streaming_ewma_state_survives_restart(spark, tmp_path):
    """Stop after the first file, restart from the checkpoint with two
    more files: the resumed query must continue the same recursion (no
    re-warm-up, no replayed rows).  Parquet sink — the memory sink does
    not support checkpoint recovery."""
    in_dir = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    _write_chunk(spark, in_dir, "chunk0", 0, 12)
    q = _start_parquet(spark, in_dir, chk, out_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    read = lambda: {  # noqa: E731
        (r["series"], r["ts_ns"]): (r["forecast"], r["err"])
        for r in spark.read.parquet(out_dir).collect()
    }
    first = read()
    assert len(first) == 3 * 12

    _write_chunk(spark, in_dir, "chunk1", 12, 18)
    _write_chunk(spark, in_dir, "chunk2", 18, 24)
    q2 = _start_parquet(spark, in_dir, chk, out_dir)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    resumed = read()
    # exactly-once sink: all 24 steps present exactly once, and the
    # post-restart rows continue the carried state (no re-warm-up)
    want = _expected(24)
    assert resumed.keys() == want.keys()
    for k, v in resumed.items():
        assert v == pytest.approx(want[k], abs=0.0, nan_ok=False), k


def test_streaming_ewma_rejects_bad_alpha(spark):
    df = spark.createDataFrame([], "series string, ts_ns long, value double")
    with pytest.raises(ValueError, match="alpha"):
        streaming_ewma_forecast(df, alpha=1.5)
