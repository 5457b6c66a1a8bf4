"""Deterministic Bloom filter (pipeline.membership): no false negatives
ever, false positives at the designed rate and REPRODUCIBLE (the whole
point of the engine-portable construction), mergeability, and the
63-bit word layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from akumuli_spark.pipeline import membership as M


def _keys(spark, names):
    return spark.createDataFrame([(n,) for n in names], "fingerprint string")


def test_no_false_negatives(spark):
    seen = [f"key-{i}" for i in range(200)]
    bloom = M.build_bloom_filter(_keys(spark, seen))
    out = M.bloom_probe(_keys(spark, seen), bloom).collect()
    assert len(out) == 200
    assert all(r["maybe_seen"] == 1 for r in out)


def test_false_positive_rate_small_at_design_point(spark):
    seen = [f"seen-{i}" for i in range(500)]
    other = [f"other-{i}" for i in range(500)]
    bloom = M.build_bloom_filter(_keys(spark, seen))
    out = M.bloom_probe(_keys(spark, other), bloom).collect()
    fp = sum(r["maybe_seen"] for r in out)
    # m=2^20, k=7, n=500 ⇒ theoretical FP ~ (1-e^{-7·500/2^20})^7 ≈ 1e-18
    assert fp == 0


def test_false_positives_appear_when_undersized_and_deterministic(spark):
    seen = [f"seen-{i}" for i in range(300)]
    other = [f"other-{i}" for i in range(300)]
    bloom = M.build_bloom_filter(_keys(spark, seen), mbits=512, k=3)
    a = {r["fingerprint"]: r["maybe_seen"]
         for r in M.bloom_probe(_keys(spark, other), bloom,
                                mbits=512, k=3).collect()}
    fp = sum(a.values())
    assert fp > 0  # 300 keys × 3 bits into 512 bits ⇒ filter saturates
    # exact same FP SET on a rebuild — determinism, not luck
    bloom2 = M.build_bloom_filter(_keys(spark, seen), mbits=512, k=3)
    b = {r["fingerprint"]: r["maybe_seen"]
         for r in M.bloom_probe(_keys(spark, other), bloom2,
                                mbits=512, k=3).collect()}
    assert a == b


def test_merge_is_bitwise_or(spark):
    a = _keys(spark, [f"a-{i}" for i in range(50)])
    b = _keys(spark, [f"b-{i}" for i in range(50)])
    merged = (
        M.build_bloom_filter(a).unionByName(M.build_bloom_filter(b))
        .groupBy("word_idx").agg(F.expr("bit_or(bits)").alias("bits"))
    )
    direct = M.build_bloom_filter(a.unionByName(b))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_sign_bit_never_set(spark):
    bloom = M.build_bloom_filter(
        _keys(spark, [f"k-{i}" for i in range(2000)]), mbits=1024, k=8)
    rows = bloom.collect()
    assert rows and all(r["bits"] > 0 for r in rows)  # 63-bit words


def test_null_keys_ignored_and_k_validated(spark):
    import pytest
    df = spark.createDataFrame([("x",), (None,)], "fingerprint string")
    assert M.build_bloom_filter(df).count() > 0
    with pytest.raises(ValueError):
        M.build_bloom_filter(df, k=9)
