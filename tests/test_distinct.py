"""HLL distinct sketch: accuracy, merge algebra, invariances.

The cross-engine estimate equality is the oracle entries'
(events_distinct_users_hll, text_distinct_tokens_hll) job; these tests
pin the sketch's algebraic contract — the properties a production
pipeline leans on when it persists and merges register tables.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from akumuli_spark.operators.distinct import (
    approx_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _est(df, col, groups=(), b=8):
    return {
        tuple(r[g] for g in groups): r["approx_distinct"]
        for r in approx_distinct(df, col, groups, b).collect()
    }


def test_accuracy_within_hll_band(spark):
    # 20_000 distinct seeded values, m=256 → sigma ≈ 1.04/16 = 6.5%;
    # input is fixed so the estimate is deterministic — assert 3 sigma.
    df = spark.range(20_000).select(
        F.concat(F.lit("user-"), F.col("id")).alias("v")
    )
    (got,) = _est(df, "v").values()
    assert abs(got - 20_000) / 20_000 < 0.195


def test_small_range_linear_counting(spark):
    # n << m exercises the linear-counting branch; it is near-exact there
    df = spark.range(40).select(F.col("id").cast("string").alias("v"))
    (got,) = _est(df, "v").values()
    assert abs(got - 40) < 4


def test_duplicates_are_free(spark):
    df = spark.range(5_000).select(F.col("id").cast("string").alias("v"))
    assert _est(df, "v") == _est(df.union(df).union(df), "v")


def test_nulls_ignored_like_count_distinct(spark):
    df = spark.range(100).select(
        F.when(F.col("id") < 50, F.col("id").cast("string")).alias("v")
    )
    clean = spark.range(50).select(F.col("id").cast("string").alias("v"))
    assert _est(df, "v") == _est(clean, "v")


def test_all_null_group_absent(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("b", None)], "g string, v string"
    )
    got = _est(df, "v", groups=("g",))
    assert set(got) == {("a",)}


def test_groups_independent(spark):
    # group "big" must not perturb group "small"'s estimate
    big = spark.range(10_000).select(
        F.lit("big").alias("g"), F.col("id").cast("string").alias("v")
    )
    small = spark.range(10).select(
        F.lit("small").alias("g"), F.col("id").cast("string").alias("v")
    )
    merged = _est(big.union(small), "v", groups=("g",))
    alone = _est(small, "v", groups=("g",))
    assert merged[("small",)] == alone[("small",)]


def test_merge_equals_whole(spark):
    # registers(A ∪ B) == max-merge(registers(A), registers(B)) — the
    # incremental-load contract: sketch halves separately, merge, and
    # the estimate is bit-identical to sketching the union.
    a = spark.range(0, 6_000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(4_000, 9_000).select(F.col("id").cast("string").alias("v"))
    whole = hll_registers(a.union(b), "v")
    merged = hll_merge(hll_registers(a, "v").union(hll_registers(b, "v")))
    as_rows = lambda df: sorted(map(tuple, df.collect()))
    assert as_rows(whole) == as_rows(merged)
    (ew,) = (r["approx_distinct"] for r in hll_estimate(whole).collect())
    (em,) = (r["approx_distinct"] for r in hll_estimate(merged).collect())
    assert ew == em


def test_register_state_is_bounded(spark):
    # the whole point: ≤ m rows of state regardless of input size
    df = spark.range(50_000).select(F.col("id").cast("string").alias("v"))
    assert hll_registers(df, "v", b=8).count() <= 256


@pytest.mark.parametrize("b,tol", [(4, 0.8), (12, 0.10)])
def test_precision_knob(spark, b, tol):
    # wider b → tighter estimate; 3-sigma bounds per m (deterministic input)
    df = spark.range(20_000).select(F.col("id").cast("string").alias("v"))
    (got,) = _est(df, "v", b=b).values()
    assert abs(got - 20_000) / 20_000 < tol
    assert math.isfinite(got)


def test_b_validation(spark):
    df = spark.range(1).select(F.col("id").cast("string").alias("v"))
    for bad in (0, 3, 6, 20):
        with pytest.raises(ValueError):
            hll_registers(df, "v", b=bad)


def test_streaming_registers_match_batch(spark, tmp_path):
    """hll_registers is a plain stateful agg, so it runs unchanged over
    a stream (complete mode): after all micro-batches the register table
    must equal the batch sketch — the bounded-state (≤ m rows per group)
    streaming distinct-count story."""
    import os

    rows = [(f"u{i % 700}",) for i in range(2_000)]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, cut in enumerate([(0, 300), (300, 1100), (1100, 2000)]):
        spark.createDataFrame(rows[cut[0]:cut[1]], "v string").coalesce(
            1
        ).write.parquet(os.path.join(in_dir, f"c{i}"))

    stream = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    q = (
        hll_registers(stream, "v")
        .writeStream.format("memory").queryName("hll_sink")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("complete").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.sql("select * from hll_sink").collect()))
    want = sorted(
        map(tuple, hll_registers(spark.createDataFrame(rows, "v string"), "v").collect())
    )
    assert got == want and len(got) <= 256
