"""Streaming SpaceSaving: per-shard state folded across micro-batches
must equal a sequential reference fold, and the merged report must obey
the batch sketch's guarantee rule."""

from __future__ import annotations

import hashlib
import math
import os

import pytest

from akumuli_spark.streaming.frequent import (
    heavy_hitters_report,
    streaming_spacesaver,
)

ERROR = 0.25  # M = 4 counters per shard: evictions genuinely occur
N_SHARDS = 2


def _shard(series: str) -> int:
    return int(hashlib.md5(series.encode()).hexdigest()[:8], 16) % N_SHARDS


def _rows(n_steps: int):
    # skewed stream over 10 series: s0/s1 dominate, the tail churns the
    # small counters so evictions happen
    rows = []
    for i in range(n_steps):
        if i % 3 == 0:
            s = "s0"
        elif i % 3 == 1:
            s = "s1"
        else:
            s = f"t{i % 17}"
        rows.append((s, i * 10**9, 1.0 + (i % 2)))
    return rows


def _model_fold(rows, M: int):
    """Sequential SpaceSaving reference (the same fold the batch
    sketch's property test models), counters keyed by series."""
    counters: dict[str, list] = {}
    total = 0.0
    for s, t, w in sorted(rows, key=lambda r: (r[1], r[0])):
        if s in counters:
            counters[s][0] += w
        elif len(counters) < M:
            counters[s] = [w, 0.0, t]
        else:
            victim = min(counters.items(), key=lambda kv: (kv[1][0], kv[0]))
            minc = victim[1][0]
            del counters[victim[0]]
            counters[s] = [w + minc, minc, t]
        total += w
    return counters, total


def test_streaming_spacesaver_matches_sequential_fold(spark, tmp_path):
    rows = _rows(120)
    in_dir = str(tmp_path / "in")
    # three time-ordered chunks → ≥3 micro-batches with state carry
    for k, (lo, hi) in enumerate([(0, 40), (40, 80), (80, 120)]):
        df = spark.createDataFrame(
            rows[lo:hi], "series string, ts_ns long, value double"
        )
        df.coalesce(1).write.parquet(os.path.join(in_dir, f"chunk{k}"))
    stream = (
        spark.readStream.schema("series string, ts_ns long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    out = streaming_spacesaver(stream, error=ERROR, n_shards=N_SHARDS)
    q = (
        out.writeStream.format("memory").queryName("ss_sink")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    summaries = spark.sql("SELECT * FROM ss_sink")
    latest = {
        r["shard"]: r
        for r in summaries.orderBy("seq").collect()  # last wins per shard
    }
    M = max(1, int(math.ceil(1.0 / ERROR)))
    for shard in range(N_SHARDS):
        shard_rows = [r for r in rows if _shard(r[0]) == shard]
        want, want_total = _model_fold(shard_rows, M)
        got = latest[shard]
        got_counters = {
            s: (c, e, t)
            for s, c, e, t in zip(
                got["series"], got["cnt"], got["err"], got["ts_ns"]
            )
        }
        assert got_counters == {
            s: (v[0], v[1], v[2]) for s, v in want.items()
        }, f"shard {shard}"
        assert got["total"] == pytest.approx(want_total)

    # report: guaranteed-count rule against the exact truth
    report = heavy_hitters_report(summaries, portion=0.2).collect()
    exact = {}
    for s, _, w in rows:
        exact[s] = exact.get(s, 0.0) + w
    n_total = sum(exact.values())
    reported = {r["series"] for r in report}
    # everything reported must truly exceed portion·N (guarantee is a
    # LOWER bound on the true count)
    for r in report:
        assert exact[r["series"]] > 0.2 * n_total - 1e-9, r
    # and the two dominant series must be found
    assert {"s0", "s1"} <= reported
    # sorted by estimate descending
    vals = [r["value"] for r in report]
    assert vals == sorted(vals, reverse=True)


def test_streaming_spacesaver_rejects_bad_error(spark):
    df = spark.createDataFrame([], "series string, ts_ns long, value double")
    with pytest.raises(ValueError, match="error"):
        streaming_spacesaver(df, error=0.0)
