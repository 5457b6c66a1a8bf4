"""As-of join (operators/asof.py): crafted semantics + chunk invariance."""

from __future__ import annotations

import random

import pytest

from akumuli_spark.operators.asof import asof_join
from akumuli_spark.query.errors import QueryValidationError

SCHEMA = "series string, metric string, ts_ns long, value double"


def _frame(spark, rows):
    # (metric, tag, ts, value) → engine-schema frame (tags map unused here)
    data = [
        (f"{m} u={t}" if t else m, m, ts, v)
        for m, t, ts, v in rows
    ]
    return spark.createDataFrame(data, SCHEMA)


def _collect(df):
    return {
        (r["series"], r["ts_ns"]): (r["A"], r["B"])
        for r in df.collect()
    }


def test_asof_crafted(spark):
    rows = [
        # tag x: B at 5 and 20; A at 10 (→B@5), 20 (→B@20, equal ts), 30 (→B@20)
        ("B", "x", 5, 100.0), ("B", "x", 20, 200.0),
        ("A", "x", 10, 1.0), ("A", "x", 20, 2.0), ("A", "x", 30, 3.0),
        # tag y: A before any B → NULL
        ("A", "y", 10, 9.0), ("B", "y", 50, 7.0),
        # dup combine: two B samples at one ts sum before alignment
        ("B", "z", 10, 1.5), ("B", "z", 10, 2.5), ("A", "z", 11, 4.0),
    ]
    out = _collect(asof_join(_frame(spark, rows), "A", "B", 0, 1000))
    assert out[("A|B u=x", 10)] == (1.0, 100.0)
    assert out[("A|B u=x", 20)] == (2.0, 200.0)   # same-ts right matches
    assert out[("A|B u=x", 30)] == (3.0, 200.0)
    assert out[("A|B u=y", 10)] == (9.0, None)    # nothing precedes
    assert out[("A|B u=z", 11)] == (4.0, 4.0)     # dup SUM before align
    assert len(out) == 5                          # left rows only


def test_asof_tolerance_and_range(spark):
    rows = [
        ("B", "x", 10, 5.0),
        ("A", "x", 15, 1.0),   # Δ=5 within tol
        ("A", "x", 100, 2.0),  # Δ=90 outside tol → NULL
        ("A", "x", 2000, 3.0), # outside range → excluded entirely
    ]
    out = _collect(
        asof_join(_frame(spark, rows), "A", "B", 0, 1000, tolerance_ns=20)
    )
    assert out[("A|B u=x", 15)] == (1.0, 5.0)
    assert out[("A|B u=x", 100)] == (2.0, None)
    assert len(out) == 2


def test_asof_chunk_invariance(spark):
    # Random two-metric stream: the chunked two-phase carry must be
    # bit-identical for any chunk width, including widths that force
    # many empty chunks and multi-chunk gaps between right samples.
    rng = random.Random(42)
    rows = []
    for tag in ("a", "b"):
        for _ in range(60):
            rows.append(("A", tag, rng.randrange(0, 10_000), rng.random()))
        for _ in range(25):
            rows.append(("B", tag, rng.randrange(0, 10_000), rng.random()))
    frame = _frame(spark, rows)
    baseline = _collect(asof_join(frame, "A", "B", 0, 10_000, chunk_ns=10_000))
    for chunk in (1, 7, 100, 3_333):
        assert _collect(
            asof_join(frame, "A", "B", 0, 10_000, chunk_ns=chunk)
        ) == baseline


def test_asof_no_tags_series_name(spark):
    rows = [("B", "", 5, 1.0), ("A", "", 10, 2.0)]
    out = _collect(asof_join(_frame(spark, rows), "A", "B", 0, 100))
    assert out == {("A|B", 10): (2.0, 1.0)}


def test_asof_validation(spark):
    frame = _frame(spark, [("A", "x", 1, 1.0)])
    with pytest.raises(QueryValidationError):
        asof_join(frame, "A", "B", 10, 10)
    with pytest.raises(QueryValidationError):
        asof_join(frame, "A", "B", 0, 10, chunk_ns=0)
    with pytest.raises(QueryValidationError):
        asof_join(frame, "A", "B", 0, 10, tolerance_ns=0)
