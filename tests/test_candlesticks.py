"""Candlesticks + sparse-join (tuple presence) tests."""

from __future__ import annotations

import pytest

from akumuli_spark.datamodel import canonical_series_name
from akumuli_spark.operators.candlesticks import candlesticks
from akumuli_spark.query.engine import execute_query
from akumuli_spark.query.plan import parse_timestamp_ns
from akumuli_spark.sources.testdata import APP_METRICS_SQL, app_metrics_view
from tests.conftest import SF_DIR, assert_matches_oracle

NS = 10**9
E0 = parse_timestamp_ns("20240101T000000")
E1 = parse_timestamp_ns("20240201T000000")


def test_candlesticks_vs_oracle(spark, duck):
    am = app_metrics_view(spark, SF_DIR)
    n_pixels = 100
    step = (E1 - E0) // n_pixels
    out = candlesticks(spark, am, "app.view", E0, E1, n_pixels)
    head = "|".join(f"app.view:{f}" for f in ("first", "max", "min", "last", "count"))
    assert_matches_oracle(
        out,
        duck,
        f"""WITH {APP_METRICS_SQL},
        base AS (SELECT series, ts_ns, value FROM app_metrics
                 WHERE metric = 'app.view' AND ts_ns >= {E0} AND ts_ns < {E1})
        SELECT '{head} user=' || split_part(series, '=', 2) AS series,
               min(ts_ns) AS ts_ns,
               (min(struct_pack(t := ts_ns, v := value))).v AS open,
               max(value) AS high, min(value) AS low,
               (max(struct_pack(t := ts_ns, v := value))).v AS close,
               CAST(count(*) AS DOUBLE) AS count
        FROM base GROUP BY 1, (ts_ns - {E0}) // {step}""",
    )
    row = out.first()
    assert row["low"] <= row["high"]
    assert row["low"] <= row["open"] <= row["high"]


@pytest.fixture()
def sparse(spark):
    """FIXTURES M2 sparse variant: cpu.syst only at even i — exercises
    null components in join tuples (the reference's presence bitmap,
    join.h:40-47)."""
    rows = []
    t0 = 1_700_000_000 * NS
    for i in range(100):
        tags = {"host": "a"}
        rows.append((canonical_series_name("cpu.user", tags), "cpu.user",
                     tags, t0 + i * NS, float(i)))
        if i % 2 == 0:
            rows.append((canonical_series_name("cpu.syst", tags), "cpu.syst",
                         tags, t0 + i * NS, float(i)))
    return spark.createDataFrame(
        rows,
        "series string, metric string, tags map<string,string>, ts_ns long, value double",
    )


def test_join_sparse_null_components(spark, sparse):
    t0 = 1_700_000_000 * NS
    rows = execute_query(
        spark,
        {"join": ["cpu.user", "cpu.syst"], "range": {"from": t0, "to": t0 + 100 * NS}},
        sparse,
    ).collect()
    assert len(rows) == 100
    for r in rows:
        i = (r["ts_ns"] - t0) // NS
        assert r["cpu.user"] == float(i)
        if i % 2 == 0:
            assert r["cpu.syst"] == float(i)
        else:
            assert r["cpu.syst"] is None  # absent component = null (bitmap)


def test_join_sparse_horizontal_sum_nan_rule(spark, sparse):
    # horizontal sum without ignore_missing: missing component ⇒ NaN
    t0 = 1_700_000_000 * NS
    rows = execute_query(
        spark,
        {"join": ["cpu.user", "cpu.syst"], "range": {"from": t0, "to": t0 + 10 * NS},
         "apply": [{"name": "sum"}]},
        sparse,
    ).collect()
    import math
    by_i = {(r["ts_ns"] - t0) // NS: r["value"] for r in rows}
    assert by_i[0] == 0.0 and by_i[2] == 4.0
    assert math.isnan(by_i[1]) and math.isnan(by_i[3])
    # with ignore_missing: null treated as unit (0 for sum)
    rows2 = execute_query(
        spark,
        {"join": ["cpu.user", "cpu.syst"], "range": {"from": t0, "to": t0 + 10 * NS},
         "apply": [{"name": "sum", "ignore_missing": True}]},
        sparse,
    ).collect()
    by_i2 = {(r["ts_ns"] - t0) // NS: r["value"] for r in rows2}
    assert by_i2[1] == 1.0 and by_i2[3] == 3.0


# ---------------------------------------------------------------------------
# gap filling (operators/fill.py) — extension operator tests
# ---------------------------------------------------------------------------


def test_fill_gaps_crafted(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from akumuli_spark.operators.fill import fill_gaps

    # series A: buckets 0, 3 present (gap 1, 2); series B: bucket 5 only
    step = 100
    rows = [
        ("A", 7, 10.0, 1.0),      # bucket 0, first-sample ts 7
        ("A", 315, 40.0, 2.0),    # bucket 3
        ("B", 505, 9.0, 3.0),     # bucket 5
    ]
    agg = spark.createDataFrame(
        rows, "series string, ts_ns long, sum double, count double"
    )
    out = {(r["series"], r["ts_ns"]): (r["sum"], r["count"])
           for r in fill_gaps(agg, anchor_ns=0, step_ns=step).collect()}
    # non-empty buckets keep their first-sample ts and values
    assert out[("A", 7)] == (10.0, 1.0)
    assert out[("A", 315)] == (40.0, 2.0)
    assert out[("B", 505)] == (9.0, 3.0)
    # interior gaps carry the previous bucket forward, ts = bucket begin
    assert out[("A", 100)] == (10.0, 1.0)
    assert out[("A", 200)] == (10.0, 1.0)
    # nothing invented outside each series' support
    assert len(out) == 5
    # fill=null keeps the holes explicit
    from akumuli_spark.operators.fill import fill_gaps as fg

    nulls = {(r["series"], r["ts_ns"]): (r["sum"], r["count"])
             for r in fg(agg, 0, step, mode="null").collect()}
    assert nulls[("A", 100)] == (None, None)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="fill mode"):
        fg(agg, 0, step, mode="linear")


def test_top_series_per_bucket_crafted(spark):
    from akumuli_spark.operators.fill import top_series_per_bucket

    step = 100
    rows = [
        # bucket 0: A=5, B=9, C=9 (tie: B before C); bucket 1: A only
        ("A", 10, 5.0), ("B", 20, 9.0), ("C", 30, 9.0),
        ("A", 110, 7.0),
    ]
    agg = spark.createDataFrame(rows, "series string, ts_ns long, sum double")
    out = [(r["ts_ns"], r["series"], r["rank"]) for r in
           top_series_per_bucket(agg, 0, step, k=2, value_col="sum")
           .orderBy("ts_ns", "rank").collect()]
    assert out == [(0, "B", 1), (0, "C", 2), (100, "A", 1)]


# ---------------------------------------------------------------------------
# LTTB downsampling (operators/lttb.py)
# ---------------------------------------------------------------------------


def test_lttb_preserves_endpoints_and_peaks(spark):
    from akumuli_spark.operators.lttb import lttb

    # flat series with one huge spike: the spike's bucket must pick it
    rows = [("s", i * 100, 1.0 if i != 37 else 500.0) for i in range(60)]
    df = spark.createDataFrame(rows, "series string, ts_ns long, value double")
    out = sorted((r["ts_ns"], r["value"]) for r in lttb(df, n_out=10).collect())
    assert len(out) == 10
    assert out[0] == (0, 1.0) and out[-1] == (5900, 1.0)   # endpoints
    assert (3700, 500.0) in out                             # the spike


def test_lttb_small_series_pass_through(spark):
    from akumuli_spark.operators.lttb import lttb

    rows = [("s", 1, 1.0), ("s", 2, 2.0), ("s", 3, 3.0)]
    df = spark.createDataFrame(rows, "series string, ts_ns long, value double")
    assert lttb(df, n_out=10).count() == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_out"):
        lttb(df, n_out=2)


def test_lttb_spark_matches_python_model(spark):
    import random

    from akumuli_spark.operators.lttb import _lttb_series, lttb

    rng = random.Random(42)
    per_series = {
        s: [(i * 7 + rng.randint(0, 3), round(rng.uniform(-5, 5), 3))
            for i in range(120)]
        for s in ("m a", "m b", "m c")
    }
    rows = [(s, t, v) for s, pts in per_series.items() for t, v in pts]
    df = spark.createDataFrame(rows, "series string, ts_ns long, value double")
    got = {}
    for r in lttb(df, n_out=25).collect():
        got.setdefault(r["series"], []).append((r["ts_ns"], r["value"]))
    for s, pts in per_series.items():
        pts = sorted(pts)
        ts = [p[0] for p in pts]; ys = [p[1] for p in pts]
        want = [(ts[i], ys[i]) for i in _lttb_series(ts, ys, 25)]
        assert sorted(got[s]) == sorted(want), s
