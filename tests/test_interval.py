"""Bucketized interval join: boundary semantics, multi-bucket spans,
bucket-width invariance, overlap fan-out."""

from __future__ import annotations

import pytest

from akumuli_spark.operators.interval import interval_join


def _samples(spark, tss):
    return spark.createDataFrame(
        [(t, float(i)) for i, t in enumerate(tss)], "ts_ns long, value double"
    )


def _intervals(spark, spans):
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(spans)],
        "interval_id long, start_ns long, end_ns long",
    )


def _pairs(spark, tss, spans, bucket_ns):
    out = interval_join(
        _samples(spark, tss), _intervals(spark, spans), bucket_ns
    )
    return sorted((r["ts_ns"], r["interval_id"]) for r in out.collect())


def test_semi_open_boundaries(spark):
    # start inclusive, end exclusive — the engine's range contract
    got = _pairs(spark, [100, 199, 200], [(100, 200)], bucket_ns=50)
    assert got == [(100, 0), (199, 0)]


def test_interval_spanning_many_buckets(spark):
    # span 10 buckets: every in-range sample found exactly once
    tss = list(range(0, 1000, 37))
    got = _pairs(spark, tss, [(111, 888)], bucket_ns=100)
    want = sorted((t, 0) for t in tss if 111 <= t < 888)
    assert got == want


@pytest.mark.parametrize("bucket_ns", [1, 7, 100, 10_000])
def test_bucket_width_invariance(spark, bucket_ns):
    tss = [5, 50, 123, 124, 125, 400, 999]
    spans = [(50, 125), (120, 130), (124, 124), (990, 10_000)]
    got = _pairs(spark, tss, spans, bucket_ns)
    want = sorted(
        (t, i)
        for t in tss
        for i, (a, b) in enumerate(spans)
        if a <= t < b
    )
    assert got == want


def test_overlapping_intervals_fan_out(spark):
    # one sample inside three overlapping windows → three pairs
    got = _pairs(spark, [500], [(0, 1000), (400, 600), (499, 501)], 250)
    assert got == [(500, 0), (500, 1), (500, 2)]


def test_empty_and_inverted_intervals_dropped(spark):
    got = _pairs(spark, [10], [(10, 10), (20, 5)], 4)
    assert got == []


def test_bucket_ns_validation(spark):
    with pytest.raises(ValueError):
        interval_join(_samples(spark, [1]), _intervals(spark, [(0, 1)]), 0)


def test_stream_static_interval_join_matches_batch(spark, tmp_path):
    """interval_join is a plain equi-join + filter, so it runs unchanged
    as a stream-static join — streamed samples against a static interval
    table must produce exactly the batch pairs across micro-batch splits
    (the streaming-enrichment deployment shape)."""
    import os

    tss = [5, 50, 123, 124, 125, 400, 999]
    spans = [(50, 125), (120, 130), (990, 10_000)]
    samples = _samples(spark, tss)
    intervals = _intervals(spark, spans)
    want = sorted(
        (r["ts_ns"], r["interval_id"])
        for r in interval_join(samples, intervals, 100).collect()
    )

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    rows = [(t, float(i)) for i, t in enumerate(tss)]
    for i, cut in enumerate([(0, 2), (2, 3), (3, 7)]):
        spark.createDataFrame(
            rows[cut[0]:cut[1]], "ts_ns long, value double"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"c{i}"))

    stream = (
        spark.readStream.schema("ts_ns long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    q = (
        interval_join(stream, intervals, 100)
        .writeStream.format("memory").queryName("iv_sink")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["ts_ns"], r["interval_id"])
        for r in spark.sql("select * from iv_sink").collect()
    )
    assert got == want and len(want) == 7


def test_anti_join_complements_inner(spark):
    tss = [5, 50, 123, 124, 125, 400, 999]
    spans = [(50, 125), (990, 10_000)]
    from akumuli_spark.operators.interval import interval_anti_join

    samples, intervals = _samples(spark, tss), _intervals(spark, spans)
    inside = {r["ts_ns"] for r in
              interval_join(samples, intervals, 64).collect()}
    outside = sorted(
        r["ts_ns"] for r in
        interval_anti_join(samples, intervals, 64).collect()
    )
    assert outside == sorted(set(tss) - inside)
    assert outside == [5, 125, 400]


def test_anti_join_keeps_duplicate_samples(spark):
    # two samples at the same uncovered ts both survive (distinct is on
    # the cover set, not the data)
    samples = spark.createDataFrame(
        [(7, 1.0), (7, 2.0), (100, 3.0)], "ts_ns long, value double"
    )
    intervals = _intervals(spark, [(90, 200)])
    from akumuli_spark.operators.interval import interval_anti_join

    got = sorted(
        (r["ts_ns"], r["value"])
        for r in interval_anti_join(samples, intervals, 50).collect()
    )
    assert got == [(7, 1.0), (7, 2.0)]


def test_int64_precision_buckets(spark):
    """Epoch-ns timestamps (~1.7e18) exceed double's 2^53 exact range:
    `floor(ts / b)` through IEEE double misbuckets values within ~256 ns
    of a bucket boundary.  The bucket key must use exact int64 floor
    division — pin boundary-straddling pairs at full epoch magnitude."""
    b = 1_000_000_000
    edge = 1_700_000_000_000_000_000
    tss = [edge - 1, edge, edge + 1]
    spans = [
        (edge - b, edge),        # covers only edge-1
        (edge, edge + b),        # covers edge, edge+1
        (edge - 1, edge + 1),    # covers edge-1, edge
    ]
    got = _pairs(spark, tss, spans, b)
    assert got == [
        (edge - 1, 0), (edge - 1, 2),
        (edge, 1), (edge, 2),
        (edge + 1, 1),
    ]


def test_bucket_helper_exact_vs_python(spark):
    """_bucket == Python // on adversarial near-boundary int64 values."""
    from pyspark.sql import functions as F

    from akumuli_spark.operators.interval import _bucket

    b = 1_000_000_000
    vals = [
        1_699_999_999_999_999_999, 1_700_000_000_999_999_999,
        1_700_000_001_999_999_999, 1_700_000_000_000_000_000,
        0, 1, b - 1, b, -1, -b, -b - 1,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r["x"]: r["b"] for r in
           df.select("x", _bucket("x", b).alias("b")).collect()}
    assert got == {v: v // b for v in vals}
