"""Continuous z-store ingest: a metrics stream appended one snapshot-
published batch per micro-batch must serve exactly like a one-shot
build over the same rows, survive batch replays, and keep pruning."""

from __future__ import annotations

import os

from akumuli_spark.sources.zorder import (
    zorder_metrics_table,
    zorder_select,
)
from akumuli_spark.streaming.zorder import start_streaming_zorder_ingest

DAY = 86_400 * 10**9
M_SCHEMA = "series string, metric string, ts_ns long, value double"


def _rows_for(days, n_series=16):
    rows = []
    for sid in range(n_series):
        series = f"m.cpu host={sid:02d}"
        for d in days:
            for i in range(40):
                rows.append((series, "m.cpu",
                             d * DAY + i * (DAY // 40) + sid,
                             float(sid * 100 + d * 10 + i)))
    return rows


def _stream(spark, rows, in_dir, cuts):
    os.makedirs(in_dir)
    for i in range(len(cuts) - 1):
        spark.createDataFrame(rows[cuts[i]:cuts[i + 1]], M_SCHEMA) \
            .coalesce(1).write.parquet(os.path.join(in_dir, f"c{i}"))
    return (
        spark.readStream.schema(M_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )


def test_streaming_zorder_matches_batch_build(spark, tmp_path):
    boot = _rows_for(range(2))
    live = _rows_for(range(2, 6))
    store = str(tmp_path / "store")
    zorder_metrics_table(
        spark, spark.createDataFrame(boot, M_SCHEMA), store,
        bucket_ns=DAY, files_per_partition=4)
    n = len(live)
    # two uneven micro-batches keep the multi-batch append contract;
    # a third batch adds Spark-action wall time without new coverage
    # (driver verify window — see OPTIMIZATION_r15.md §11)
    q = start_streaming_zorder_ingest(
        _stream(spark, live, str(tmp_path / "in"), [0, n // 3, n]),
        store, str(tmp_path / "chk"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(map(tuple, zorder_select(spark, store)
                     .select("series", "ts_ns", "value").collect()))
    assert got == sorted((s, t, v) for (s, m, t, v) in boot + live)

    # pruning still fires across the grown store
    st: dict = {}
    zorder_select(spark, store, series="m.cpu host=03",
                  ts_from=3 * DAY, ts_to=5 * DAY, stats=st)
    assert 0 < st["files_selected"] < st["files_total"]

    # a re-cluster (the OPTIMIZE cadence) folds batch files and serves
    # the same rows
    from akumuli_spark.api import open_zorder_database

    zorder_metrics_table(
        spark, zorder_select(spark, store), store,
        bucket_ns=DAY, files_per_partition=4)
    assert sorted(map(tuple, zorder_select(spark, store)
                      .select("series", "ts_ns", "value").collect())) == got
    # and the database facade serves the re-clustered store
    zdb = open_zorder_database(spark, store)
    assert zdb.query({
        "select": "m.cpu",
        "range": {"from": 0, "to": 6 * DAY},
    }).count() == len(got)
