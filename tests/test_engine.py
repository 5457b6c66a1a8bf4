"""End-to-end query-engine tests vs the DuckDB oracle — the model is the
reference's functests (test_query_language.py, test_filter_query.py,
test_join_query.py, test_group_aggregate.py) but asserted against an
independent SQL engine instead of computed expectations."""

from __future__ import annotations

import pytest

from akumuli_spark.query.engine import execute_query
from akumuli_spark.query.plan import parse_timestamp_ns
from akumuli_spark.sources.testdata import (
    APP_METRICS_SQL,
    EVENTS_SQL,
    METRICS_SQL,
    app_metrics_view,
    events_view,
    metrics_view,
)
from tests.conftest import SF_DIR, assert_matches_oracle

NS = 10**9
T96 = parse_timestamp_ns("19960101T000000")
T97 = parse_timestamp_ns("19970101T000000")
E0 = parse_timestamp_ns("20240101T000000")
E1 = parse_timestamp_ns("20240201T000000")
WEEK_NS = 7 * 86400 * NS

TAGSTR = "'linestatus=' || tag_linestatus || ' returnflag=' || tag_returnflag"


@pytest.fixture(scope="module")
def metrics(spark):
    return metrics_view(spark, SF_DIR)


@pytest.fixture(scope="module")
def app_metrics(spark):
    return app_metrics_view(spark, SF_DIR)


@pytest.fixture(scope="module")
def events(spark):
    return events_view(spark, SF_DIR)


def test_select_forward(spark, duck, metrics):
    df = execute_query(
        spark,
        {
            "select": "lineitem.price",
            "range": {"from": T96, "to": T97},
            "where": {"returnflag": ["A", "R"]},
        },
        metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL}
        SELECT series, ts_ns, value FROM metrics
        WHERE metric = 'lineitem.price' AND ts_ns >= {T96} AND ts_ns < {T97}
          AND tag_returnflag IN ('A', 'R')""",
    )


def test_select_backward_is_reversed_interval(spark, duck, metrics):
    # from > to ⇒ backward: from-side inclusive, to-side exclusive
    df = execute_query(
        spark,
        {"select": "lineitem.qty", "range": {"from": T97, "to": T96}},
        metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL}
        SELECT series, ts_ns, value FROM metrics
        WHERE metric = 'lineitem.qty' AND ts_ns <= {T97} AND ts_ns > {T96}""",
    )


def test_select_value_filter(spark, duck, metrics):
    df = execute_query(
        spark,
        {
            "select": "lineitem.qty",
            "range": {"from": T96, "to": T97},
            "filter": {"gt": 10, "le": 40},
        },
        metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL}
        SELECT series, ts_ns, value FROM metrics
        WHERE metric = 'lineitem.qty' AND ts_ns >= {T96} AND ts_ns < {T97}
          AND value > 10 AND value <= 40""",
    )


def test_select_limit_after_sort(spark, duck, app_metrics):
    # app_metrics has globally unique ns timestamps ⇒ deterministic limit
    df = execute_query(
        spark,
        {
            "select": "app.click",
            "range": {"from": E0, "to": E1},
            "order-by": "time",
            "limit": 25,
            "offset": 5,
        },
        app_metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {APP_METRICS_SQL}
        SELECT series, ts_ns, value FROM app_metrics
        WHERE metric = 'app.click' AND ts_ns >= {E0} AND ts_ns < {E1}
        ORDER BY ts_ns, series LIMIT 25 OFFSET 5""",
    )


def test_select_group_by_tag(spark, duck, metrics):
    # group-by-tag removes the listed tag from the series key
    df = execute_query(
        spark,
        {
            "select": "lineitem.price",
            "range": {"from": T96, "to": T97},
            "group-by-tag": ["linestatus"],
        },
        metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL}
        SELECT 'lineitem.price returnflag=' || tag_returnflag AS series,
               ts_ns, value FROM metrics
        WHERE metric = 'lineitem.price' AND ts_ns >= {T96} AND ts_ns < {T97}""",
    )


def test_select_pivot_by_tag(spark, duck, metrics):
    # pivot-by-tag keeps only the listed tags
    df = execute_query(
        spark,
        {
            "select": "lineitem.price",
            "range": {"from": T96, "to": T97},
            "pivot-by-tag": ["linestatus"],
        },
        metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL}
        SELECT 'lineitem.price linestatus=' || tag_linestatus AS series,
               ts_ns, value FROM metrics
        WHERE metric = 'lineitem.price' AND ts_ns >= {T96} AND ts_ns < {T97}""",
    )


AGG_ORACLE = {
    "count": "CAST(count(value) AS DOUBLE)",
    "sum": "sum(value)",
    "min": "min(value)",
    "max": "max(value)",
    "mean": "sum(value) / count(value)",
    "min_timestamp": "CAST((min(struct_pack(v := value, t := ts_ns))).t AS DOUBLE)",
    "max_timestamp": "CAST((max(struct_pack(v := value, t := ts_ns))).t AS DOUBLE)",
    "first": "(min(struct_pack(t := ts_ns, v := value))).v",
    "last": "(max(struct_pack(t := ts_ns, v := value))).v",
    "first_timestamp": "CAST(min(ts_ns) AS DOUBLE)",
    "last_timestamp": "CAST(max(ts_ns) AS DOUBLE)",
}


def test_aggregate_all_11_functions(spark, duck, metrics):
    funcs = list(AGG_ORACLE)
    df = execute_query(
        spark,
        {
            "aggregate": {"lineitem.qty": funcs},
            "range": {"from": T96, "to": T97},
        },
        metrics,
    )
    branches = "\nUNION ALL\n".join(
        f"""SELECT 'lineitem.qty:{fn} ' || tagstr AS series, first_ts AS ts_ns,
                   {expr_out} AS value FROM g"""
        for fn, expr_out in (
            (fn, f"f_{i}") for i, fn in enumerate(funcs)
        )
    )
    agg_exprs = ", ".join(f"{AGG_ORACLE[fn]} AS f_{i}" for i, fn in enumerate(funcs))
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL},
        g AS (
          SELECT {TAGSTR} AS tagstr, min(ts_ns) AS first_ts, {agg_exprs}
          FROM metrics
          WHERE metric = 'lineitem.qty' AND ts_ns >= {T96} AND ts_ns < {T97}
          GROUP BY 1
        )
        {branches}""",
    )


def test_group_aggregate_begin_anchored(spark, duck, metrics):
    # buckets anchored at `from`, not at epoch (nbtree.cpp:1228-1247);
    # from is deliberately NOT step-aligned
    t_from = T96 + 3 * 86400 * NS
    df = execute_query(
        spark,
        {
            "group-aggregate": {
                "metric": "lineitem.price",
                "step": "7d",
                "func": ["sum", "count", "mean"],
            },
            "range": {"from": t_from, "to": T97},
        },
        metrics,
    )
    head = "lineitem.price:sum|lineitem.price:count|lineitem.price:mean"
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL}
        SELECT '{head} ' || {TAGSTR} AS series,
               min(ts_ns) AS ts_ns,
               sum(value) AS sum, CAST(count(value) AS DOUBLE) AS count,
               sum(value) / count(value) AS mean
        FROM metrics
        WHERE metric = 'lineitem.price' AND ts_ns >= {t_from} AND ts_ns < {T97}
        GROUP BY 1, (ts_ns - {t_from}) // {WEEK_NS}""",
    )


def test_group_aggregate_backward(spark, duck, metrics):
    t_from = T97  # backward: from > to
    df = execute_query(
        spark,
        {
            "group-aggregate": {"metric": "lineitem.qty", "step": "30d", "func": "max"},
            "range": {"from": t_from, "to": T96},
        },
        metrics,
    )
    step = 30 * 86400 * NS
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL}
        SELECT 'lineitem.qty:max ' || {TAGSTR} AS series,
               min(ts_ns) AS ts_ns,
               max(value) AS max
        FROM metrics
        WHERE metric = 'lineitem.qty' AND ts_ns <= {t_from} AND ts_ns > {T96}
        GROUP BY 1, ({t_from} - ts_ns) // {step}""",
    )


def test_group_aggregate_having_filter(spark, duck, metrics):
    # group-aggregate filter keys are function names = HAVING
    df = execute_query(
        spark,
        {
            "group-aggregate": {
                "metric": "lineitem.qty",
                "step": "7d",
                "func": ["min", "max"],
            },
            "range": {"from": T96, "to": T97},
            "filter": {"max": {"gt": 45}},
        },
        metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL}
        SELECT 'lineitem.qty:min|lineitem.qty:max ' || {TAGSTR} AS series,
               min(ts_ns) AS ts_ns,
               min(value) AS min, max(value) AS max
        FROM metrics
        WHERE metric = 'lineitem.qty' AND ts_ns >= {T96} AND ts_ns < {T97}
        GROUP BY 1, (ts_ns - {T96}) // {WEEK_NS}
        HAVING max(value) > 45""",
    )


JOIN_HEAD = "lineitem.price|lineitem.qty|lineitem.disc"
JOIN_PIVOT = """
  sum(CASE WHEN metric = 'lineitem.price' THEN value END) AS "lineitem.price",
  sum(CASE WHEN metric = 'lineitem.qty'  THEN value END) AS "lineitem.qty",
  sum(CASE WHEN metric = 'lineitem.disc' THEN value END) AS "lineitem.disc"
"""


def test_join_aligns_on_timestamp(spark, duck, metrics):
    df = execute_query(
        spark,
        {
            "join": ["lineitem.price", "lineitem.qty", "lineitem.disc"],
            "range": {"from": T96, "to": T97},
        },
        metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL}
        SELECT '{JOIN_HEAD} ' || {TAGSTR} AS series, ts_ns, {JOIN_PIVOT}
        FROM metrics
        WHERE ts_ns >= {T96} AND ts_ns < {T97}
        GROUP BY 1, 2""",
    )


def test_join_filter_require_any(spark, duck, metrics):
    # per-metric sample filters applied during the scan; ANY ⇒ keep rows
    # where at least one filtered component survived
    df = execute_query(
        spark,
        {
            "join": ["lineitem.price", "lineitem.qty"],
            "range": {"from": T96, "to": T97},
            "filter": {
                "lineitem.price": {"gt": 30000},
                "lineitem.qty": {"lt": 5},
                "=": {"require": "any"},
            },
        },
        metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL},
        filtered AS (
          SELECT * FROM metrics
          WHERE ts_ns >= {T96} AND ts_ns < {T97}
            AND ((metric = 'lineitem.price' AND value > 30000)
              OR (metric = 'lineitem.qty' AND value < 5))
        ),
        p AS (
          SELECT {TAGSTR} AS tagstr, ts_ns,
            sum(CASE WHEN metric = 'lineitem.price' THEN value END) AS "lineitem.price",
            sum(CASE WHEN metric = 'lineitem.qty' THEN value END) AS "lineitem.qty"
          FROM filtered GROUP BY 1, 2
        )
        SELECT 'lineitem.price|lineitem.qty ' || tagstr AS series, ts_ns,
               "lineitem.price", "lineitem.qty"
        FROM p
        WHERE "lineitem.price" IS NOT NULL OR "lineitem.qty" IS NOT NULL""",
    )


def test_group_aggregate_join(spark, duck, metrics):
    df = execute_query(
        spark,
        {
            "group-aggregate-join": {
                "metric": ["lineitem.price", "lineitem.qty"],
                "step": "30d",
                "func": "mean",
            },
            "range": {"from": T96, "to": T97},
        },
        metrics,
    )
    step = 30 * 86400 * NS
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL},
        b AS (
          SELECT metric, {TAGSTR} AS tagstr,
                 min(ts_ns) AS ts_ns,
                 avg(value) AS v
          FROM metrics
          WHERE metric IN ('lineitem.price', 'lineitem.qty')
            AND ts_ns >= {T96} AND ts_ns < {T97}
          GROUP BY 1, 2, (ts_ns - {T96}) // {step}
        )
        SELECT 'lineitem.price|lineitem.qty ' || tagstr AS series, ts_ns,
          sum(CASE WHEN metric = 'lineitem.price' THEN v END) AS "lineitem.price",
          sum(CASE WHEN metric = 'lineitem.qty'  THEN v END) AS "lineitem.qty"
        FROM b GROUP BY 1, 2""",
    )


def test_select_events_with_regex(spark, duck, events):
    df = execute_query(
        spark,
        {
            "select-events": "!error",
            "range": {"from": E0, "to": E1},
            "filter": '"k": 8[0-9]',
        },
        metrics=None,
        events=events,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {EVENTS_SQL}
        SELECT series, ts_ns, body FROM evt
        WHERE metric = '!error' AND ts_ns >= {E0} AND ts_ns < {E1}
          AND regexp_matches(body, '"k": 8[0-9]')""",
    )


def test_select_events_invalid_regex_rejected_at_parse_time(spark, events):
    """Parity with the reference, which compiles the body filter during
    query parsing and rejects bad patterns with AKU_EQUERY_PARSING_ERROR
    (queryparser.cpp:343-349) — an invalid pattern must raise a clean
    validation error at plan build, not a stage failure mid-scan.  The
    lone '{' is the documented Java-rejects/Python-accepts divergence
    found by the dialect property test."""
    import pytest as _pytest

    from akumuli_spark.query.errors import QueryValidationError

    for bad in ("aaa{", "[", "(?<broken"):
        with _pytest.raises(QueryValidationError, match="invalid event"):
            execute_query(
                spark,
                {"select-events": "!error",
                 "range": {"from": E0, "to": E1}, "filter": bad},
                metrics=None,
                events=events,
            )


def test_select_events_where_tag(spark, duck, events):
    df = execute_query(
        spark,
        {
            "select-events": "!click",
            "range": {"from": E0, "to": E1},
            "where": {"user": ["0", "1", "2"]},
        },
        metrics=None,
        events=events,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {EVENTS_SQL}
        SELECT series, ts_ns, body FROM evt
        WHERE metric = '!click' AND ts_ns >= {E0} AND ts_ns < {E1}
          AND tag_user IN ('0', '1', '2')""",
    )


def test_aggregate_multiple_metrics_different_funcs(spark, duck, metrics):
    df = execute_query(
        spark,
        {
            "aggregate": {"lineitem.qty": "sum", "lineitem.disc": ["mean", "max"]},
            "range": {"from": T96, "to": T97},
        },
        metrics,
    )
    assert_matches_oracle(
        df,
        duck,
        f"""WITH {METRICS_SQL},
        g AS (
          SELECT metric, {TAGSTR} AS tagstr, min(ts_ns) AS first_ts,
                 sum(value) AS s, sum(value) / count(value) AS m, max(value) AS mx
          FROM metrics
          WHERE metric IN ('lineitem.qty', 'lineitem.disc')
            AND ts_ns >= {T96} AND ts_ns < {T97}
          GROUP BY 1, 2
        )
        SELECT 'lineitem.qty:sum ' || tagstr AS series, first_ts AS ts_ns, s AS value
        FROM g WHERE metric = 'lineitem.qty'
        UNION ALL
        SELECT 'lineitem.disc:mean ' || tagstr, first_ts, m FROM g WHERE metric = 'lineitem.disc'
        UNION ALL
        SELECT 'lineitem.disc:max ' || tagstr, first_ts, mx FROM g WHERE metric = 'lineitem.disc'""",
    )


def test_group_aggregate_percentile_crafted(spark):
    # p50/p100 over a 4-sample bucket: exact linear interpolation at rank
    # (n-1)*p — p50 of {1,2,3,10} = 2.5, p90 = 3 + 0.7*(10-3) = 7.9.
    NS = 10**9
    rows = [
        ("m t=a", "m", {"t": "a"}, i * NS, v)
        for i, v in ((0, 1.0), (1, 3.0), (2, 10.0), (3, 2.0))
    ]
    frame = spark.createDataFrame(
        rows,
        "series string, metric string, tags map<string,string>, "
        "ts_ns long, value double",
    )
    out = execute_query(
        spark,
        {"group-aggregate": {"metric": "m", "step": 100 * NS,
                             "func": ["p50", "p90", "p100"]},
         "range": {"from": 0, "to": 100 * NS}},
        frame,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["series"].startswith("m:p50|m:p90|m:p100 ")
    assert r["p50"] == 2.5
    assert abs(r["p90"] - 7.9) < 1e-9
    assert r["p100"] == 10.0


def test_percentile_token_validation():
    from akumuli_spark.query.errors import QueryParseError
    from akumuli_spark.query.plan import percentile_fraction, validate_agg_func

    assert percentile_fraction("p99.9") == pytest.approx(0.999)
    assert percentile_fraction("p0") == 0.0
    assert percentile_fraction("mean") is None
    assert validate_agg_func("p75") == "p75"
    with pytest.raises(QueryParseError):
        validate_agg_func("p101")
    with pytest.raises(QueryParseError):
        validate_agg_func("pfoo")


def test_percentile_composes_with_ga_join_and_having(spark):
    NS = 10**9
    rows = []
    for m, vals in (("a", [1.0, 2.0, 3.0]), ("b", [10.0, 20.0, 30.0])):
        rows += [(f"{m} t=x", m, {"t": "x"}, i * NS, v)
                 for i, v in enumerate(vals)]
    frame = spark.createDataFrame(
        rows,
        "series string, metric string, tags map<string,string>, "
        "ts_ns long, value double",
    )
    out = execute_query(
        spark,
        {"group-aggregate-join": {"metric": ["a", "b"], "step": 100 * NS,
                                  "func": "p50"},
         "range": {"from": 0, "to": 100 * NS}},
        frame,
    ).collect()
    assert len(out) == 1
    assert out[0]["a"] == 2.0 and out[0]["b"] == 20.0
    had = execute_query(
        spark,
        {"group-aggregate": {"metric": "b", "step": 100 * NS, "func": "p90"},
         "range": {"from": 0, "to": 100 * NS},
         "filter": {"p90": {"gt": 50}}},
        frame,
    ).collect()
    assert had == []  # p90 of {10,20,30} = 28 < 50 → bucket filtered
