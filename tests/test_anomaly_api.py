"""Anomaly-detector node tests (synthetic spike injection) + Database API
facade tests."""

from __future__ import annotations

import pytest

from akumuli_spark.api import Database
from akumuli_spark.query.engine import execute_query
from akumuli_spark.query.errors import QueryValidationError
from akumuli_spark.query.plan import parse_timestamp_ns
from akumuli_spark.sources.testdata import app_metrics_view, events_view
from tests.conftest import SF_DIR

NS = 10**9
E0 = parse_timestamp_ns("20240101T000000")
E1 = parse_timestamp_ns("20240201T000000")


@pytest.fixture(scope="module")
def spiky(spark):
    """3 flat series with one injected spike: value 10 everywhere except
    series s1 at t=50 where value=1000."""
    rows = []
    for s in ("m host=1", "m host=2", "m host=3"):
        for i in range(100):
            val = 1000.0 if (s == "m host=1" and i == 50) else 10.0
            rows.append((s, "m", {"host": s[-1]}, (i + 1) * NS, val))
    return spark.createDataFrame(
        rows, "series string, metric string, tags map<string,string>, ts_ns long, value double"
    )


def _detect(spark, spiky, method, **params):
    return execute_query(
        spark,
        {
            "select": "m",
            "range": {"from": 0, "to": 200 * NS},
            "apply": [{"name": "anomaly-detector", "method": method,
                       "threshold": 0.5, **params}],
        },
        spiky,
    ).collect()


@pytest.mark.parametrize(
    "method,params",
    [
        ("ewma", {"alpha": 0.3}),
        ("sma", {"period": 5}),
        ("double-exp-smoothing", {"alpha": 0.3, "gamma": 0.1}),
    ],
)
def test_anomaly_detects_spike(spark, spiky, method, params):
    rows = _detect(spark, spiky, method, **params)
    flagged = {(r["series"], r["ts_ns"] // NS) for r in rows}
    # the spike itself must be flagged
    assert ("m host=1", 51) in flagged
    # flat periods far from the spike are quiet: these methods' reference
    # warm-up (no forecast until primed, then seeds drawn from the flat
    # data itself) predicts the flat level exactly, so err = 0 before the
    # spike
    assert not any(t < 45 for _, t in flagged)


def test_anomaly_holt_winters_detects_spike(spark, spiky):
    """Holt-Winters, reference semantics (HoltWintersSlidingWindow,
    anomalydetector.cpp:475-533): the seasonal deque seeds with the RAW
    first `period` frames while level also holds the data, so on flat
    data the first forecasts are ~2x the level — a decaying warm-up
    transient whose (identical) per-series errors the relative flag
    criterion (|err| > θ·sqrt(ΣF2), :576-588) keeps flagging on every
    series symmetrically.  The discriminating assertions are therefore
    about the spike step, not absolute quiet."""
    rows = _detect(spark, spiky, "holt-winters",
                   alpha=0.3, beta=0.1, gamma=0.1, period=4)
    flagged = {(r["series"], r["ts_ns"] // NS) for r in rows}
    # the spike dominates the frame's F2 at t=51: only the spiking
    # series is flagged there
    assert ("m host=1", 51) in flagged
    assert ("m host=2", 51) not in flagged
    assert ("m host=3", 51) not in flagged
    # warm-up transient flags are symmetric — a step before the spike
    # flags either all three series or none
    for t in range(1, 51):
        n = sum(1 for s, tt in flagged if tt == t)
        assert n in (0, 3), f"asymmetric warm-up flags at t={t}"


@pytest.mark.parametrize(
    "method,params",
    [
        ("ewma", {"alpha": 0.3}),
        ("sma", {"period": 5}),
    ],
)
def test_anomaly_sketch_detects_spike(spark, spiky, method, params):
    # K=256 buckets, 3 series: collisions are unlikely, so the sketch
    # estimate tracks the per-series error and the spike must surface
    rows = _detect(spark, spiky, method, approx=True, bits=8, hashes=3,
                   **params)
    flagged = {(r["series"], r["ts_ns"] // NS) for r in rows}
    assert ("m host=1", 51) in flagged
    assert not any(t < 45 for _, t in flagged)


def test_anomaly_sketch_param_validation(spark, spiky):
    with pytest.raises(QueryValidationError, match="bits"):
        _detect(spark, spiky, "ewma", alpha=0.3, approx=True, bits=7)
    with pytest.raises(QueryValidationError, match="odd"):
        _detect(spark, spiky, "ewma", alpha=0.3, approx=True, hashes=2)
    with pytest.raises(QueryValidationError, match="hashes"):
        _detect(spark, spiky, "ewma", alpha=0.3, approx=True, hashes=11)


def test_anomaly_param_validation(spark, spiky):
    with pytest.raises(QueryValidationError, match="alpha"):
        _detect(spark, spiky, "ewma")
    with pytest.raises(QueryValidationError, match="period"):
        _detect(spark, spiky, "sma")
    with pytest.raises(QueryValidationError):
        _detect(spark, spiky, "ewma", alpha=1.5)


def test_database_facade(spark):
    db = Database(
        spark,
        app_metrics_view(spark, SF_DIR),
        events_view(spark, SF_DIR),
    )
    out = db.query(
        {"aggregate": {"app.click": "count"}, "range": {"from": E0, "to": E1}}
    )
    assert out.count() > 0
    names = [r["name"] for r in db.search({"select": "app.view"}).collect()]
    assert all(n.startswith("app.view ") for n in names) and names
    sugg = [r["name"] for r in db.suggest({"select": "metric-names"}).collect()]
    assert "app.click" in sugg and "!click" in sugg
    st = db.stats()
    assert st["n_series"] == 80 and st["n_metrics"] == 10  # 5 app + 5 event metrics
    assert "ewma" in db.function_names() and "min_timestamp" in db.function_names()
    ev = db.query(
        {"select-events": "!error", "range": {"from": E0, "to": E1}}
    )
    assert ev.columns == ["series", "ts_ns", "body"]


def test_anomaly_sketch_backward_range(spark, spiky):
    # backward query: recursion seeds from the latest frame; the spike
    # still surfaces (its error is just as large against the reversed
    # forecast) and early flat samples stay quiet in reversed time
    rows = execute_query(
        spark,
        {
            "select": "m",
            "range": {"from": 200 * NS, "to": 0},
            "apply": [{"name": "anomaly-detector", "method": "ewma",
                       "alpha": 0.3, "threshold": 0.5, "approx": True,
                       "bits": 8, "hashes": 3}],
        },
        spiky,
    ).collect()
    flagged = {(r["series"], r["ts_ns"] // NS) for r in rows}
    assert ("m host=1", 51) in flagged
    assert not any(t > 55 for _, t in flagged)
