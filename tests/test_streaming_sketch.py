"""Continuous sketch rollup: an event stream folded into the persisted
sketch store one epoch per micro-batch must serve EXACTLY like a batch
build over the same prefix — across arbitrary micro-batch splits, from
a data bootstrap or an empty-frame bootstrap — and compaction must fold
the accumulated epochs without changing anything served."""

from __future__ import annotations

import os

from akumuli_spark.sources.sketch_store import (
    build_sketch_store,
    compact_sketch_store,
    distinct_over_range,
    quantiles_over_range,
)
from akumuli_spark.streaming.sketch import start_streaming_sketch_store

DAY = 86_400 * 10**9
QS = [0.5, 0.9]
E_SCHEMA = "event_type string, user_id int, value double, ts_ns long"


def _rows_for(days, seed_shift=0):
    rows = []
    for d in days:
        for i in range(200):
            rows.append((
                ["click", "view"][i % 2],
                (i * 11 + d + seed_shift) % 61,
                float((i * 17 + d) % 400) / 3.0,
                d * DAY + i * (DAY // 200),
            ))
    return rows


def _stream(spark, rows, in_dir: str, cuts):
    os.makedirs(in_dir)
    for i in range(len(cuts) - 1):
        spark.createDataFrame(rows[cuts[i]:cuts[i + 1]], E_SCHEMA) \
            .coalesce(1).write.parquet(os.path.join(in_dir, f"c{i}"))
    return (
        spark.readStream.schema(E_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )


def _serve(spark, path):
    d = sorted(tuple(r) for r in
               distinct_over_range(spark, path, 0, 8 * DAY).collect())
    q = sorted(tuple(r) for r in
               quantiles_over_range(spark, path, 0, 8 * DAY, QS).collect())
    return d, q


def test_streaming_sketch_matches_batch_build(spark, tmp_path):
    boot_rows = _rows_for(range(3))
    live_rows = _rows_for(range(2, 8), seed_shift=23)

    # batch-bootstrapped store (epoch 0) + streamed remainder
    store = str(tmp_path / "store")
    build_sketch_store(
        spark.createDataFrame(boot_rows, E_SCHEMA), store,
        group_col="event_type", distinct_col="user_id", value_col="value",
    )
    n = len(live_rows)
    stream = _stream(spark, live_rows, str(tmp_path / "in"),
                     [0, n // 5, n // 2, n // 2 + 1, n])
    q = start_streaming_sketch_store(stream, store, str(tmp_path / "chk"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    full = str(tmp_path / "full")
    build_sketch_store(
        spark.createDataFrame(boot_rows + live_rows, E_SCHEMA), full,
        group_col="event_type", distinct_col="user_id", value_col="value",
    )
    want = _serve(spark, full)
    assert _serve(spark, store) == want

    # the stream's epochs (1..n) coexist with the bootstrap's epoch 0;
    # compaction folds them all back into 0 and changes nothing served
    epochs = {d for d in os.listdir(os.path.join(store, "hll"))
              if d.startswith("epoch=")}
    assert "epoch=0" in epochs and len(epochs) > 2
    compact_sketch_store(spark, store)
    assert _serve(spark, store) == want


def test_streaming_from_empty_bootstrap(spark, tmp_path):
    """An empty-frame bootstrap pins the layout contract before the
    first event arrives — the pure-streaming deployment shape."""
    store = str(tmp_path / "store")
    empty = spark.createDataFrame([], E_SCHEMA)
    build_sketch_store(empty, store, group_col="event_type",
                       distinct_col="user_id", value_col="value")
    # pre-stream serve answers empty, never crashes
    assert distinct_over_range(spark, store, 0, DAY).count() == 0
    assert quantiles_over_range(spark, store, 0, DAY, QS).count() == 0

    rows = _rows_for(range(4))
    stream = _stream(spark, rows, str(tmp_path / "in"),
                     [0, len(rows) // 3, len(rows)])
    q = start_streaming_sketch_store(stream, store, str(tmp_path / "chk"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    full = str(tmp_path / "full")
    build_sketch_store(
        spark.createDataFrame(rows, E_SCHEMA), full,
        group_col="event_type", distinct_col="user_id", value_col="value",
    )
    assert _serve(spark, store) == _serve(spark, full)
