"""Value histogram + cross-metric correlation (operators/histogram.py)."""

from __future__ import annotations

import math

import pytest

from akumuli_spark.operators.histogram import metrics_correlation, value_histogram
from akumuli_spark.query.errors import QueryValidationError

SCHEMA = "series string, metric string, ts_ns long, value double"


def _frame(spark, rows):
    data = [(f"{m} u={t}" if t else m, m, ts, v) for m, t, ts, v in rows]
    return spark.createDataFrame(data, SCHEMA)


def test_histogram_crafted(spark):
    rows = [
        ("m", "a", 1, 0.0),    # bin 0 (left edge inclusive)
        ("m", "a", 2, 9.99),   # bin 0
        ("m", "a", 3, 10.0),   # bin 1 (edge goes right)
        ("m", "a", 4, 95.0),   # bin 9
        ("m", "a", 5, 100.0),  # == hi → dropped
        ("m", "a", 6, -0.1),   # < lo → dropped
        ("m", "b", 7, 55.0),   # bin 5, other series
        ("x", "a", 8, 5.0),    # other metric → dropped
    ]
    out = {
        (r["series"], r["bin"]): (r["bin_lo"], r["count"])
        for r in value_histogram(
            _frame(spark, rows), "m", 0, 100, lo=0.0, hi=100.0, n_bins=10
        ).collect()
    }
    assert out == {
        ("m u=a", 0): (0.0, 2),
        ("m u=a", 1): (10.0, 1),
        ("m u=a", 9): (90.0, 1),
        ("m u=b", 5): (50.0, 1),
    }
    with pytest.raises(QueryValidationError):
        value_histogram(_frame(spark, rows), "m", 0, 100, 5.0, 5.0, 10)


def test_correlation_crafted(spark):
    # tag a: y = 2x exactly at aligned ts → corr 1; the x sample at ts 4
    # has no y partner and must be excluded (exact-alignment rule).
    # tag b: constant y → zero variance → NULL.
    # tag c: single pair → below min_samples → NULL.
    rows = [
        ("X", "a", 1, 1.0), ("Y", "a", 1, 2.0),
        ("X", "a", 2, 2.0), ("Y", "a", 2, 4.0),
        ("X", "a", 3, 5.0), ("Y", "a", 3, 10.0),
        ("X", "a", 4, 99.0),
        ("X", "b", 1, 1.0), ("Y", "b", 1, 7.0),
        ("X", "b", 2, 3.0), ("Y", "b", 2, 7.0),
        ("X", "c", 1, 1.0), ("Y", "c", 1, 5.0),
    ]
    out = {
        r["tagstr"]: (r["n_aligned"], r["corr"])
        for r in metrics_correlation(
            _frame(spark, rows), "X", "Y", 0, 100
        ).collect()
    }
    n, c = out["u=a"]
    assert n == 3 and c == pytest.approx(1.0, abs=1e-12)
    assert out["u=b"] == (2, None)
    assert out["u=c"] == (1, None)


def test_correlation_anticorrelated(spark):
    # y = -3x + 10 → corr exactly -1
    rows = []
    for i, x in enumerate((1.0, 4.0, 6.0, 9.0)):
        rows.append(("X", "a", i, x))
        rows.append(("Y", "a", i, 10.0 - 3.0 * x))
    out = metrics_correlation(_frame(spark, rows), "X", "Y", 0, 100).collect()
    assert len(out) == 1
    assert out[0]["corr"] == pytest.approx(-1.0, abs=1e-12)
    assert math.isfinite(out[0]["corr"])


def test_lagged_correlation_finds_the_shift(spark):
    """b is a copy of a delayed by exactly 2 steps: corr must be 1.0 at
    lag +2 (a leads) and below it elsewhere."""
    from akumuli_spark.operators.histogram import metrics_correlation_lagged

    rows = []
    vals = [1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 7.0, 6.0, 2.5]
    for i, v in enumerate(vals):
        rows.append((f"m.a host=h", "m.a", i * 10, v))
    for i, v in enumerate(vals):
        rows.append((f"m.b host=h", "m.b", (i + 2) * 10, v))
    df = spark.createDataFrame(
        rows, "series string, metric string, ts_ns long, value double"
    )
    got = {
        r["lag"]: r["corr"]
        for r in metrics_correlation_lagged(
            df, "m.a", "m.b", 0, 200, 10, lags=(-1, 0, 1, 2, 3)
        ).collect()
    }
    assert abs(got[2] - 1.0) < 1e-9
    for lag, c in got.items():
        if lag != 2 and c is not None:
            assert c < 0.999


def test_lagged_correlation_validation(spark):
    import pytest

    from akumuli_spark.operators.histogram import metrics_correlation_lagged
    from akumuli_spark.query.errors import QueryValidationError

    df = spark.createDataFrame(
        [("m.a", "m.a", 0, 1.0)],
        "series string, metric string, ts_ns long, value double",
    )
    with pytest.raises(QueryValidationError):
        metrics_correlation_lagged(df, "m.a", "m.b", 10, 0, 10)
    with pytest.raises(QueryValidationError):
        metrics_correlation_lagged(df, "m.a", "m.b", 0, 10, 0)
    with pytest.raises(QueryValidationError):
        metrics_correlation_lagged(df, "m.a", "m.b", 0, 10, 10, lags=())


def test_tag_rollup_levels(spark):
    """ROLLUP: finest rows (level 0) sum to each metric subtotal
    (level 1), which sum to the grand total (level 3); CUBE adds the
    tag-only slice (level 2)."""
    from akumuli_spark.operators.groupsets import tag_rollup_aggregate
    from akumuli_spark.sources.testdata import app_metrics_view
    from tests.conftest import SF_DIR

    am = app_metrics_view(spark, SF_DIR)
    roll = tag_rollup_aggregate(am, tag="user").collect()
    by_level = {}
    for r in roll:
        by_level.setdefault(r["level"], []).append(r)
    assert set(by_level) == {0, 1, 3}
    total = [r for r in by_level[3]]
    assert len(total) == 1
    assert total[0]["count"] == sum(r["count"] for r in by_level[0])
    assert total[0]["count"] == sum(r["count"] for r in by_level[1])
    # per-metric subtotals equal the sum of their finest rows
    for m in by_level[1]:
        fine = [r for r in by_level[0] if r["metric"] == m["metric"]]
        assert m["count"] == sum(r["count"] for r in fine)
        assert m["sum"] == pytest.approx(sum(r["sum"] for r in fine))
    cube = tag_rollup_aggregate(am, tag="user", cube=True).collect()
    cube_levels = {r["level"] for r in cube}
    assert cube_levels == {0, 1, 2, 3}
    tag_slice = [r for r in cube if r["level"] == 2]
    assert sum(r["count"] for r in tag_slice) == total[0]["count"]
