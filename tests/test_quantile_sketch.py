"""Log-histogram quantile sketch: error bound, merge algebra, sign
classes, nearest-rank semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from akumuli_spark.operators.quantile_sketch import (
    approx_quantiles,
    log_histogram,
    quantiles_from_histogram,
)


def _est(df, col, qs, groups=(), k=64):
    return {
        (*(r[g] for g in groups), r["q"]): r["est"]
        for r in approx_quantiles(df, col, qs, groups, k).collect()
    }


def test_relative_error_bound(spark):
    # uniform 1..100k: every estimate within the e^(1/2k)-1 bin bound
    df = spark.range(1, 100_001).select((F.col("id")).cast("double").alias("v"))
    k = 64
    bound = math.exp(1.0 / (2 * k)) - 1.0 + 1e-12
    for q in (0.01, 0.5, 0.9, 0.99):
        got = _est(df, "v", [q], k=k)[(q,)]
        exact = math.ceil(q * 100_000)  # nearest-rank on 1..N uniform
        assert abs(got - exact) / exact <= bound + 0.01, (q, got, exact)


def test_sign_classes_and_zero(spark):
    df = spark.createDataFrame(
        [(-100.0,), (-1.0,), (0.0,), (1.0,), (100.0,)], "v double"
    )
    got = _est(df, "v", [0.2, 0.4, 0.6, 0.8, 1.0])
    assert got[(0.6,)] == 0.0                       # the exact-zero bin
    assert got[(0.4,)] < 0.0 < got[(0.8,)]
    assert abs(got[(0.2,)] + 100) / 100 < 0.01      # mirrored magnitude
    assert abs(got[(0.4,)] + 1) < 0.01
    assert abs(got[(1.0,)] - 100) / 100 < 0.01


def test_merge_equals_whole(spark):
    a = spark.range(1, 5_000).select(F.col("id").cast("double").alias("v"))
    b = spark.range(3_000, 9_000).select(F.col("id").cast("double").alias("v"))
    whole = log_histogram(a.union(b), "v")
    merged = (
        log_histogram(a, "v").union(log_histogram(b, "v"))
        .groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    qw = quantiles_from_histogram(whole, [0.5, 0.99]).collect()
    qm = quantiles_from_histogram(merged, [0.5, 0.99]).collect()
    assert sorted(map(tuple, qw)) == sorted(map(tuple, qm))


def test_state_is_bounded(spark):
    # a million values spanning 6 decades → a few hundred bins, not 1M
    df = spark.range(1, 1_000_001).select(
        (F.col("id") / 1000.0).alias("v")
    )
    assert log_histogram(df, "v", k=64).count() < 64 * 16


def test_nulls_and_nans_skipped(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (float("nan"),), (3.0,)], "v double"
    )
    got = _est(df, "v", [1.0])
    assert abs(got[(1.0,)] - 3.0) / 3.0 < 0.01


def test_grouped_independence(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 9999.0)], "g string, v double"
    )
    got = _est(df, "v", [1.0], groups=("g",))
    assert abs(got[("a", 1.0)] - 20.0) / 20.0 < 0.01
    assert abs(got[("b", 1.0)] - 9999.0) / 9999.0 < 0.01


def test_validation(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        approx_quantiles(df, "v", [])
    with pytest.raises(ValueError):
        approx_quantiles(df, "v", [0.0])
    with pytest.raises(ValueError):
        approx_quantiles(df, "v", [1.5])
    with pytest.raises(ValueError):
        log_histogram(df, "v", k=0)


def test_streaming_histogram_matches_batch(spark, tmp_path):
    """log_histogram is a plain stateful agg — streaming complete-mode
    bin table after all micro-batches equals the batch histogram."""
    import os

    rows = [(float(1 + (i * 7) % 500),) for i in range(2_000)]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, cut in enumerate([(0, 400), (400, 1500), (1500, 2000)]):
        spark.createDataFrame(rows[cut[0]:cut[1]], "v double").coalesce(
            1
        ).write.parquet(os.path.join(in_dir, f"c{i}"))

    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    q = (
        log_histogram(stream, "v")
        .writeStream.format("memory").queryName("qs_sink")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("complete").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.sql("select * from qs_sink").collect()))
    want = sorted(
        map(tuple,
            log_histogram(spark.createDataFrame(rows, "v double"), "v").collect())
    )
    assert got == want
