"""apply-pipeline tests — window nodes vs DuckDB window functions, EWMA vs
an independently-computed pandas expectation (its warm-up recursion has no
SQL form), terminal ranking nodes vs SQL aggregation."""

from __future__ import annotations

import math

import numpy as np
import pytest

from akumuli_spark.query.engine import execute_query
from akumuli_spark.query.plan import parse_timestamp_ns
from akumuli_spark.sources.testdata import APP_METRICS_SQL, METRICS_SQL, app_metrics_view, metrics_view
from tests.conftest import SF_DIR, assert_matches_oracle

NS = 10**9
E0 = parse_timestamp_ns("20240101T000000")
E1 = parse_timestamp_ns("20240201T000000")
T96 = parse_timestamp_ns("19960101T000000")
T97 = parse_timestamp_ns("19970101T000000")

W = "OVER (PARTITION BY series ORDER BY ts_ns)"


@pytest.fixture(scope="module")
def app_metrics(spark):
    return app_metrics_view(spark, SF_DIR)


@pytest.fixture(scope="module")
def metrics(spark):
    return metrics_view(spark, SF_DIR)


def _app_base_sql(metric="app.click"):
    return f"""SELECT series, ts_ns, value FROM app_metrics
        WHERE metric = '{metric}' AND ts_ns >= {E0} AND ts_ns < {E1}"""


def test_rate(spark, duck, app_metrics):
    df = execute_query(
        spark,
        {
            "select": "app.click",
            "range": {"from": E0, "to": E1},
            "apply": [{"name": "rate"}],
        },
        app_metrics,
    )
    # rate with implicit (0, 0) seed (rate.cpp:31-40)
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {APP_METRICS_SQL}, base AS ({_app_base_sql()})
        SELECT series, ts_ns,
               (value - lag(value, 1, 0.0) {W})
               / (ts_ns - lag(ts_ns, 1, 0) {W}) * 1e9 AS value
        FROM base""",
    )


def test_cusum(spark, duck, app_metrics):
    df = execute_query(
        spark,
        {
            "select": "app.view",
            "range": {"from": E0, "to": E1},
            "apply": [{"name": "cusum"}],
        },
        app_metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {APP_METRICS_SQL}, base AS ({_app_base_sql('app.view')})
        SELECT series, ts_ns,
               sum(value) {W[:-1]} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
        FROM base""",
    )


def test_sma_predict_then_add(spark, duck, app_metrics):
    # prediction = sum of previous n values / n, zero-prefilled buffer
    # (sliding_window.cpp:140-160)
    n = 4
    df = execute_query(
        spark,
        {
            "select": "app.click",
            "range": {"from": E0, "to": E1},
            "apply": [{"name": "sma", "window-width": n}],
        },
        app_metrics,
        allow_irregular=True,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {APP_METRICS_SQL}, base AS ({_app_base_sql()})
        SELECT series, ts_ns,
               coalesce(sum(value) {W[:-1]} ROWS BETWEEN {n} PRECEDING AND 1 PRECEDING), 0.0)
               / {n} AS value
        FROM base""",
    )


def test_cma(spark, duck, app_metrics):
    df = execute_query(
        spark,
        {
            "select": "app.click",
            "range": {"from": E0, "to": E1},
            "apply": [{"name": "cma"}],
        },
        app_metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {APP_METRICS_SQL}, base AS ({_app_base_sql()})
        SELECT series, ts_ns,
               sum(value) {W[:-1]} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / count(value) {W[:-1]} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
        FROM base""",
    )


def test_ewma_exact_warmup(spark, duck, app_metrics):
    """EWMA vs an independent Python implementation of the reference's
    state machine (sliding_window.cpp:15-51)."""
    decay = 0.3
    df = execute_query(
        spark,
        {
            "select": "app.error",
            "range": {"from": E0, "to": E1},
            "apply": [{"name": "ewma", "decay": decay}],
        },
        app_metrics,
        allow_irregular=True,
    )
    got = {(r["series"], r["ts_ns"]): r["value"] for r in df.collect()}

    base = duck.sql(
        f"WITH {APP_METRICS_SQL} SELECT series, ts_ns, value FROM app_metrics "
        f"WHERE metric = 'app.error' AND ts_ns >= {E0} AND ts_ns < {E1} "
        "ORDER BY series, ts_ns"
    ).fetchall()
    bys = {}
    for series, ts, val in base:
        bys.setdefault(series, []).append((ts, val))
    expected = {}
    for series, rows in bys.items():
        v, warm = 0.0, 0
        for ts, x in rows:
            expected[(series, ts)] = x if warm <= 10 else v
            if warm < 10:
                v += x
            elif warm == 10:
                v = (v + x) / 11.0
                v = x * decay + v * (1 - decay)
            else:
                v = x * decay + v * (1 - decay)
            warm += 1
    assert set(got) == set(expected)
    for k in expected:
        assert math.isclose(got[k], expected[k], rel_tol=1e-9), (k, got[k], expected[k])


def test_top_time_weighted(spark, duck, app_metrics):
    df = execute_query(
        spark,
        {
            "select": "app.purchase",
            "range": {"from": E0, "to": E1},
            "apply": [{"name": "top", "N": 3}],
        },
        app_metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {APP_METRICS_SQL}, base AS ({_app_base_sql('app.purchase')}),
        c AS (
          SELECT series, ts_ns, (lead(ts_ns) {W} - ts_ns) / 1e9 * value AS contrib
          FROM base
        )
        SELECT series, max(ts_ns) AS ts_ns, sum(contrib) AS value
        FROM c GROUP BY series
        ORDER BY value DESC, series LIMIT 3""",
    )


def test_heavy_hitters(spark, duck, app_metrics):
    df = execute_query(
        spark,
        {
            "select": "app.purchase",
            "range": {"from": E0, "to": E1},
            "apply": [{"name": "heavy-hitters", "error": 0.01, "portion": 0.12}],
        },
        app_metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {APP_METRICS_SQL}, base AS ({_app_base_sql('app.purchase')}),
        g AS (SELECT series, max(ts_ns) AS ts_ns, sum(value) AS value
              FROM base GROUP BY series)
        SELECT series, ts_ns, value FROM g
        WHERE value > 0.12 * (SELECT sum(value) FROM g)""",
    )


def test_frequent_items(spark, duck, app_metrics):
    df = execute_query(
        spark,
        {
            "select": "app.signup",
            "range": {"from": E0, "to": E1},
            "apply": [{"name": "frequent-items", "error": 0.01, "portion": 0.13}],
        },
        app_metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {APP_METRICS_SQL}, base AS ({_app_base_sql('app.signup')}),
        g AS (SELECT series, max(ts_ns) AS ts_ns, CAST(count(*) AS DOUBLE) AS value
              FROM base GROUP BY series)
        SELECT series, ts_ns, value FROM g
        WHERE value > 0.13 * (SELECT sum(value) FROM g)""",
    )


def test_eval_expression_over_join(spark, duck, metrics):
    # eval "price * (1 - disc)" over the joined metric columns
    df = execute_query(
        spark,
        {
            "join": ["lineitem.price", "lineitem.disc"],
            "range": {"from": T96, "to": T97},
            "apply": [
                {"name": "eval", "expr": "lineitem.price * (1 - lineitem.disc)"}
            ],
        },
        metrics,
    )
    tagstr = "'linestatus=' || tag_linestatus || ' returnflag=' || tag_returnflag"
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL},
        p AS (
          SELECT {tagstr} AS tagstr, ts_ns,
            sum(CASE WHEN metric = 'lineitem.price' THEN value END) AS price,
            sum(CASE WHEN metric = 'lineitem.disc' THEN value END) AS disc
          FROM metrics WHERE ts_ns >= {T96} AND ts_ns < {T97}
            AND metric IN ('lineitem.price', 'lineitem.disc')
          GROUP BY 1, 2
        )
        SELECT 'lineitem.price|lineitem.disc ' || tagstr AS series, ts_ns,
               price * (1 - disc) AS value
        FROM p""",
    )


def test_horizontal_sum_and_abs_scale(spark, duck, metrics):
    df = execute_query(
        spark,
        {
            "join": ["lineitem.qty", "lineitem.disc"],
            "range": {"from": T96, "to": T97},
            "apply": [
                {"name": "scale", "weights": [2.0, 100.0]},
                {"name": "sum"},
                {"name": "abs"},
            ],
        },
        metrics,
    )
    tagstr = "'linestatus=' || tag_linestatus || ' returnflag=' || tag_returnflag"
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL},
        p AS (
          SELECT {tagstr} AS tagstr, ts_ns,
            sum(CASE WHEN metric = 'lineitem.qty' THEN value END) AS qty,
            sum(CASE WHEN metric = 'lineitem.disc' THEN value END) AS disc
          FROM metrics WHERE ts_ns >= {T96} AND ts_ns < {T97}
            AND metric IN ('lineitem.qty', 'lineitem.disc')
          GROUP BY 1, 2
        )
        SELECT 'lineitem.qty|lineitem.disc ' || tagstr AS series, ts_ns,
               abs(qty * 2.0 + disc * 100.0) AS value
        FROM p""",
    )


def test_rate_backward_direction(spark, duck, app_metrics):
    # backward query: the stream (and therefore lag) runs in descending ts
    df = execute_query(
        spark,
        {
            "select": "app.click",
            "range": {"from": E1, "to": E0},
            "apply": [{"name": "rate"}],
        },
        app_metrics,
    )
    wd = "OVER (PARTITION BY series ORDER BY ts_ns DESC)"
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {APP_METRICS_SQL},
        base AS (
          SELECT series, ts_ns, value FROM app_metrics
          WHERE metric = 'app.click' AND ts_ns <= {E1} AND ts_ns > {E0}
        )
        SELECT series, ts_ns,
               (value - lag(value, 1, 0.0) {wd})
               / (ts_ns - lag(ts_ns, 1, 0) {wd}) * 1e9 AS value
        FROM base""",
    )


def test_ewma_error_is_value_minus_prediction(spark, duck, app_metrics):
    decay = 0.3
    pred = execute_query(
        spark,
        {"select": "app.error", "range": {"from": E0, "to": E1},
         "apply": [{"name": "ewma", "decay": decay}]},
        app_metrics,
        allow_irregular=True,
    ).collect()
    err = execute_query(
        spark,
        {"select": "app.error", "range": {"from": E0, "to": E1},
         "apply": [{"name": "ewma-error", "decay": decay}]},
        app_metrics,
        allow_irregular=True,
    ).collect()
    raw = duck.sql(
        f"WITH {APP_METRICS_SQL} SELECT series, ts_ns, value FROM app_metrics "
        f"WHERE metric = 'app.error' AND ts_ns >= {E0} AND ts_ns < {E1}"
    ).fetchall()
    raw_by_key = {(s, t): v for s, t, v in raw}
    pred_by_key = {(r["series"], r["ts_ns"]): r["value"] for r in pred}
    for r in err:
        k = (r["series"], r["ts_ns"])
        assert r["value"] == pytest.approx(raw_by_key[k] - pred_by_key[k], abs=1e-9)


def test_apply_chain_order_matters(spark, app_metrics):
    # scale-then-cusum ≠ cusum-then-scale only in intermediate shape;
    # for linear ops they commute — use abs (nonlinear) to pin ordering
    q_base = {"select": "app.error", "range": {"from": E0, "to": E1}}
    a = execute_query(
        spark,
        {**q_base, "apply": [{"name": "scale", "weights": [-1.0]},
                             {"name": "abs"}]},
        app_metrics,
    ).agg({"value": "sum"}).collect()[0][0]
    b = execute_query(
        spark,
        {**q_base, "apply": [{"name": "abs"},
                             {"name": "scale", "weights": [-1.0]}]},
        app_metrics,
    ).agg({"value": "sum"}).collect()[0][0]
    assert a > 0 > b  # |−x| vs −|x|: listed order is applied order


# ---------------------------------------------------------------------------
# AKU_EREGULLAR_EXPECTED parity: ewma/sma/sax (and -error variants) require
# group-aggregate (REGULLAR) input — sliding_window.cpp:76,170, sax.cpp:53,
# REGULLAR flag set by aggregate output only (aggregate.cpp:412).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("node", [
    {"name": "ewma", "decay": 0.5},
    {"name": "ewma-error", "decay": 0.5},
    {"name": "sma", "window-width": 3},
    {"name": "sma-error", "window-width": 3},
    {"name": "sax", "alphabet_size": 4, "window_width": 5},
])
def test_regular_required_rejected_over_raw_series(spark, app_metrics, node):
    from akumuli_spark.query.errors import QueryValidationError

    with pytest.raises(QueryValidationError, match="AKU_EREGULLAR_EXPECTED"):
        execute_query(
            spark,
            {"select": "app.click", "range": {"from": E0, "to": E1},
             "apply": [node]},
            app_metrics,
        ).collect()


def test_regular_required_accepted_after_group_aggregate(spark, app_metrics):
    df = execute_query(
        spark,
        {"group-aggregate": {"metric": "app.click", "step": "1d", "func": "mean"},
         "range": {"from": E0, "to": E1},
         "apply": [{"name": "ewma", "decay": 0.5}]},
        app_metrics,
    )
    assert df.columns == ["series", "ts_ns", "mean"] and df.count() > 0


def test_regular_required_rejected_after_join(spark, metrics):
    from akumuli_spark.query.errors import QueryValidationError

    with pytest.raises(QueryValidationError, match="AKU_EREGULLAR_EXPECTED"):
        execute_query(
            spark,
            {"join": ["lineitem.price", "lineitem.qty"],
             "range": {"from": T96, "to": T97},
             "apply": [{"name": "sma", "window-width": 3}]},
            metrics,
        ).collect()


# ---------------------------------------------------------------------------
# SpaceSaving sketch mode (approx: true) — hand-traceable eviction streams
# ---------------------------------------------------------------------------


def _tiny_stream(spark, rows):
    return spark.createDataFrame(
        [("m " + s, "m", {}, t, 1.0) for s, t in rows],
        schema="series string, metric string, tags map<string,string>, "
               "ts_ns long, value double",
    )


_SS_ROWS = [("a", 10), ("b", 20), ("a", 30), ("c", 40), ("a", 50), ("c", 60)]


def _ss_query(portion, begin=0, end=120, chunks=1):
    return {
        "select": "m",
        "range": {"from": begin, "to": end},
        "apply": [{"name": "frequent-items", "error": 0.5, "portion": portion,
                   "approx": True, "merge-chunks": chunks}],
    }


def test_spacesaver_sketch_eviction_trace(spark):
    """M=2 over 3 series: c's arrival at ts=40 evicts b (count 1) and
    inherits count 2 / error 1 (spacesaver.h:120-137).  With portion 0.4
    (support 2.4) only a's guaranteed count 3-0 clears it — c's 3-1 does
    not, even though both estimates are 3."""
    frame = _tiny_stream(spark, _SS_ROWS)
    out = execute_query(spark, _ss_query(0.4), frame).collect()
    assert [(r["series"], r["ts_ns"], r["value"]) for r in out] == [("m a", 10, 3.0)]


def test_spacesaver_sketch_overestimate_and_tiebreak(spark):
    """portion 0.1 admits both survivors; equal estimates (3.0) order by
    series; ts is the counter-creation sample's timestamp, NOT last-seen —
    a's counter was created at ts=10, c's eviction-rebirth at ts=40."""
    frame = _tiny_stream(spark, _SS_ROWS)
    out = execute_query(spark, _ss_query(0.1), frame).collect()
    assert [(r["series"], r["ts_ns"], r["value"]) for r in out] == [
        ("m a", 10, 3.0), ("m c", 40, 3.0)]


def test_spacesaver_sketch_backward(spark):
    """Backward query folds the stream in descending time: b@20 then a@10
    arrive last against a full table and both inherit error 2 from the
    evicted min counter."""
    frame = _tiny_stream(spark, _SS_ROWS)
    out = execute_query(spark, _ss_query(0.1, begin=120, end=0), frame).collect()
    assert [(r["series"], r["ts_ns"], r["value"]) for r in out] == [
        ("m a", 10, 3.0), ("m b", 20, 3.0)]


def test_spacesaver_sketch_chunk_merge(spark):
    """merge-chunks=2 splits [0,120) at ts=60 (c@60 lands in chunk 1).
    Chunk 0 folds a,b,a,c,a → {a:(3,0), c:(2,1)}, cmin 2; chunk 1 folds
    c,b,b,d,b → {b:(3,0), d:(2,1)}, cmin 2.  Merged: an item absent from
    a full chunk adds that chunk's min counter to BOTH its estimate and
    its error — a and b get estimate 3+2=5 with lower bound 3; c and d
    (lb 1) miss the support 0.25·10=2.5.  Equal estimates order by
    series."""
    rows = _SS_ROWS + [("b", 70), ("b", 80), ("d", 90), ("b", 100)]
    frame = _tiny_stream(spark, rows)
    out = execute_query(spark, _ss_query(0.25, chunks=2), frame).collect()
    assert [(r["series"], r["ts_ns"], r["value"]) for r in out] == [
        ("m a", 10, 5.0), ("m b", 70, 5.0)]


def test_spacesaver_error_gt_one_clamps_to_single_counter(spark):
    """Parser parity: the reference accepts any nonzero error
    (spacesaver.h:49-53 rejects only 0), so error=1.5 is legal and M
    clamps to ceil(1/1.5)=1 — a single counter that each new series
    steals, inheriting the evicted count.  Hand trace over a,b,a,c,a,c:
    the final survivor is c with estimate 6 (count) / error 5, and
    portion 0 reports it since the guaranteed count 6−5=1 > 0."""
    frame = _tiny_stream(spark, _SS_ROWS)
    q = {"select": "m", "range": {"from": 0, "to": 120},
         "apply": [{"name": "frequent-items", "error": 1.5, "portion": 0.0,
                    "approx": True, "merge-chunks": 1}]}
    out = execute_query(spark, q, frame).collect()
    assert [(r["series"], r["ts_ns"], r["value"]) for r in out] == [
        ("m c", 60, 6.0)]


def test_spacesaver_sketch_single_chunk_matches_exact_when_unsaturated(spark, app_metrics):
    """M >= distinct series ⇒ no evictions ⇒ the sketch IS exact: counts
    match the exact mode's group-by (ts differs by design: creation vs
    last-seen)."""
    q_exact = {"select": "app.signup", "range": {"from": E0, "to": E1},
               "apply": [{"name": "frequent-items", "portion": 0.05}]}
    q_sketch = {"select": "app.signup", "range": {"from": E0, "to": E1},
                "apply": [{"name": "frequent-items", "error": 0.01,
                           "portion": 0.05, "approx": True}]}
    exact = {(r["series"], r["value"])
             for r in execute_query(spark, q_exact, app_metrics).collect()}
    sketch = {(r["series"], r["value"])
              for r in execute_query(spark, q_sketch, app_metrics).collect()}
    assert exact == sketch and len(exact) > 0


def test_spacesaver_sketch_error_zero_rejected(spark, app_metrics):
    from akumuli_spark.query.errors import QueryValidationError

    with pytest.raises(QueryValidationError, match="error"):
        execute_query(
            spark,
            {"select": "app.click", "range": {"from": E0, "to": E1},
             "apply": [{"name": "frequent-items", "portion": 0.1,
                        "approx": True, "error": 0}]},
            app_metrics,
        )


def test_counter_rate_crafted(spark):
    # Monotone counter with one reset: 10 → 30 → 5 (restart) → 25.
    # Deltas: 10 (vs the (0,0) seed), 20, 5 (reset: post-reset value), 20;
    # dt = ts gap in seconds.
    rows = [
        ("cnt host=a", "cnt", {"host": "a"}, i * NS, v)
        for i, v in ((1, 10.0), (2, 30.0), (3, 5.0), (4, 25.0))
    ]
    frame = spark.createDataFrame(
        rows,
        "series string, metric string, tags map<string,string>, "
        "ts_ns long, value double",
    )
    out = {
        r["ts_ns"] // NS: r["value"]
        for r in execute_query(
            spark,
            {"select": "cnt", "range": {"from": 0, "to": 10 * NS},
             "apply": [{"name": "counter-rate"}]},
            frame,
        ).collect()
    }
    assert out == {1: 10.0, 2: 20.0, 3: 5.0, 4: 20.0}


def test_counter_rate_equals_rate_on_monotone(spark, duck, app_metrics):
    # On a stream with no decreases the reset branch never fires —
    # counter-rate must equal plain rate.  cusum makes app.view monotone.
    q = {"select": "app.view", "range": {"from": E0, "to": E1}}
    chain = lambda *names: {**q, "apply": [{"name": n} for n in names]}
    a = execute_query(spark, chain("cusum", "counter-rate"), app_metrics)
    b = execute_query(spark, chain("cusum", "rate"), app_metrics)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
