"""Randomized properties for the z-order kernel and store: the
interleave expression against a pure-Python reference over bulk random
inputs, and store reads against direct filters for random predicate
rectangles — one store build, many probes (seeded, reproducible)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from akumuli_spark.sources.zorder import (
    interleave_bits,
    zorder_metrics_table,
    zorder_select,
)

DAY = 86_400 * 10**9


def _py_interleave(a: int, b: int, bits: int) -> int:
    z = 0
    for k in range(bits):
        z |= ((a >> k) & 1) << (2 * k + 1)
        z |= ((b >> k) & 1) << (2 * k)
    return z


def test_interleave_matches_python_reference_bulk(spark):
    """200 random (a, b) pairs per bit width, evaluated in ONE Spark
    job each, against the bit-twiddling reference."""
    rng = random.Random(0xA5)
    for bits in (4, 8, 16):
        cap = 1 << bits
        pairs = [(rng.randrange(cap), rng.randrange(cap))
                 for _ in range(200)]
        df = spark.createDataFrame(pairs, "a long, b long")
        got = {
            (r.a, r.b): r.z
            for r in df.select(
                "a", "b", interleave_bits("a", "b", bits).alias("z")
            ).collect()
        }
        for a, b in pairs:
            assert got[(a, b)] == _py_interleave(a, b, bits)


def test_interleave_is_injective_and_bounded(spark):
    """Distinct inputs map to distinct z-values inside [0, 4^bits)."""
    bits = 8
    cap = 1 << bits
    rng = random.Random(7)
    pairs = list({(rng.randrange(cap), rng.randrange(cap))
                  for _ in range(300)})
    df = spark.createDataFrame(pairs, "a long, b long")
    zs = [r.z for r in df.select(
        interleave_bits("a", "b", bits).alias("z")).collect()]
    assert len(set(zs)) == len(pairs)
    assert all(0 <= z < (1 << (2 * bits)) for z in zs)


@pytest.fixture(scope="module")
def prop_store(spark, tmp_path_factory):
    rng = random.Random(0xC3)
    rows = []
    for sid in range(24):
        series = f"m.load host={sid:02d}"
        for _ in range(120):
            t = rng.randrange(0, 3 * DAY)
            rows.append((series, "m.load", t, float(rng.randrange(10_000))))
    df = spark.createDataFrame(
        rows, "series string, metric string, ts_ns long, value double")
    path = str(tmp_path_factory.mktemp("zprop") / "m")
    zorder_metrics_table(spark, df, path, bucket_ns=DAY,
                         files_per_partition=6)
    return path, rows


def test_random_rectangles_match_direct_filter(spark, prop_store):
    """15 random (series-subset × time-window) predicates: the
    manifest-pruned read returns exactly the direct filter's rows."""
    path, rows = prop_store
    rng = random.Random(0x5EED)
    all_series = sorted({s for (s, m, t, v) in rows})
    for trial in range(15):
        kind = trial % 3
        series = None
        lo = hi = None
        if kind in (0, 2):
            series = rng.sample(all_series, rng.randrange(1, 4))
        if kind in (1, 2):
            lo = rng.randrange(0, 2 * DAY)
            hi = lo + rng.randrange(1, DAY)
        out = zorder_select(spark, path, metric="m.load", series=series,
                            ts_from=lo, ts_to=hi)
        got = sorted((r.series, r.ts_ns, r.value) for r in out.collect())
        exp = sorted(
            (s, t, v) for (s, m, t, v) in rows
            if (series is None or s in series)
            and (lo is None or t >= lo) and (hi is None or t < hi)
        )
        assert got == exp, f"trial {trial}: {len(got)} vs {len(exp)}"
