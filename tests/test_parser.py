"""Parser unit tests — mirror the reference's test_parser.cpp coverage:
JSON → plan, validation errors, timestamps/durations."""

import pytest

from akumuli_spark.query.errors import QueryParseError
from akumuli_spark.query.parser import get_query_kind, parse_query
from akumuli_spark.query.plan import (
    GroupByOp,
    OrderBy,
    QueryKind,
    parse_duration_ns,
    parse_timestamp_ns,
)

RANGE = {"from": "20240101T000000", "to": "20240201T000000"}
T0 = parse_timestamp_ns("20240101T000000")
T1 = parse_timestamp_ns("20240201T000000")


def test_kind_dispatch():
    assert get_query_kind({"select": "m", "range": RANGE}) is QueryKind.SELECT
    assert get_query_kind({"select-events": "!e"}) is QueryKind.SELECT_EVENTS
    assert get_query_kind({"aggregate": {"m": "sum"}}) is QueryKind.AGGREGATE
    assert get_query_kind({"group-aggregate": {}}) is QueryKind.GROUP_AGGREGATE
    assert get_query_kind({"join": ["a", "b"]}) is QueryKind.JOIN
    assert (
        get_query_kind({"group-aggregate-join": {}}) is QueryKind.GROUP_AGGREGATE_JOIN
    )
    with pytest.raises(QueryParseError):
        get_query_kind({"range": RANGE})


def test_unknown_field_rejected():
    # whitelist per queryparser.cpp:934-985
    with pytest.raises(QueryParseError, match="unexpected field"):
        parse_query({"select": "m", "range": RANGE, "bogus": 1})


def test_select_roundtrip():
    q = parse_query(
        {
            "select": "test",
            "range": RANGE,
            "where": {"tag2": ["B", "C"], "tag1": "A"},
            "order-by": "series",
            "limit": 10,
            "offset": 5,
        }
    )
    assert q.kind is QueryKind.SELECT
    assert q.metrics == ("test",)
    assert q.range.begin_ns == T0 and q.range.end_ns == T1
    assert q.range.forward
    assert q.order_by is OrderBy.SERIES
    assert q.limit == 10 and q.offset == 5
    combos = q.where.combinations
    assert len(combos) == 1
    assert dict(combos[0].tags) == {"tag2": ("B", "C"), "tag1": ("A",)}


def test_aggregate_forces_series_order():
    # parse_aggregate_query hard-sets OrderBy::SERIES and never reads the
    # order-by field (queryparser.cpp:1569).
    q = parse_query({"aggregate": {"m": "sum"}, "range": RANGE})
    assert q.order_by is OrderBy.SERIES
    q = parse_query(
        {"aggregate": {"m": "sum"}, "range": RANGE, "order-by": "time"}
    )
    assert q.order_by is OrderBy.SERIES


def test_backward_range():
    q = parse_query({"select": "m", "range": {"from": T1, "to": T0}})
    assert not q.range.forward
    assert q.range.lo_ns == T0 + 1
    assert q.range.hi_ns == T1 + 1


def test_where_list_form():
    q = parse_query(
        {
            "select": "m",
            "range": RANGE,
            "where": [{"a": "1", "b": "2"}, {"a": "3"}],
        }
    )
    assert len(q.where.combinations) == 2


def test_aggregate_parse():
    q = parse_query({"aggregate": {"cpu": "sum", "mem": ["min", "max"]}})
    assert q.agg_funcs == (("cpu", ("sum",)), ("mem", ("min", "max")))
    # range optional only for aggregate (queryparser.cpp:637-690)
    with pytest.raises(QueryParseError):
        parse_query({"select": "m"})


def test_unknown_agg_func():
    with pytest.raises(QueryParseError, match="unknown aggregate function"):
        parse_query({"aggregate": {"cpu": "median"}})


def test_group_aggregate_parse():
    q = parse_query(
        {
            "group-aggregate": {"metric": "m", "step": "30s", "func": ["sum", "count"]},
            "range": RANGE,
        }
    )
    assert q.step_ns == 30 * 10**9
    assert q.agg_funcs == (("*", ("sum", "count")),)


def test_group_aggregate_filter_keys_are_funcs():
    q = parse_query(
        {
            "group-aggregate": {"metric": "m", "step": "1m", "func": ["max"]},
            "range": RANGE,
            "filter": {"max": {"gt": 5}},
        }
    )
    assert q.filter.by_key[0][0] == "max"
    with pytest.raises(QueryParseError):
        parse_query(
            {
                "group-aggregate": {"metric": "m", "step": "1m", "func": ["max"]},
                "range": RANGE,
                "filter": {"m": {"gt": 5}},  # metric name not valid here
            }
        )


def test_join_parse():
    q = parse_query(
        {
            "join": ["a", "b"],
            "range": RANGE,
            "filter": {"a": {"gt": 1}, "=": {"require": "any"}},
        }
    )
    assert q.metrics == ("a", "b")
    assert not q.filter.require_all
    with pytest.raises(QueryParseError):
        parse_query({"join": ["solo"], "range": RANGE})


def test_select_events_parse():
    q = parse_query({"select-events": "!err", "range": RANGE, "filter": "disk=.*"})
    assert q.kind is QueryKind.SELECT_EVENTS
    assert q.event_regex == "disk=.*"
    with pytest.raises(QueryParseError):
        parse_query({"select-events": "noBang", "range": RANGE})


def test_group_by_tag_forms():
    q = parse_query(
        {"select": "m", "range": RANGE, "group-by-tag": ["host"]}
    )
    assert q.group_by.op is GroupByOp.GROUP and q.group_by.tags == ("host",)
    q = parse_query({"select": "m", "range": RANGE, "pivot-by-tag": "dc"})
    assert q.group_by.op is GroupByOp.PIVOT and q.group_by.tags == ("dc",)
    q = parse_query({"select": "m", "range": RANGE, "group-by": {"tag": ["host"]}})
    assert q.group_by.op is GroupByOp.PIVOT  # legacy keeps listed tags


def test_apply_parse():
    q = parse_query(
        {
            "select": "m",
            "range": RANGE,
            "apply": [{"name": "rate"}, {"name": "ewma", "decay": 0.5}],
        }
    )
    assert [n.name for n in q.apply] == ["rate", "ewma"]
    assert q.apply[1].param("decay") == 0.5


def test_timestamps():
    assert parse_timestamp_ns("20240101T000000") == 1704067200 * 10**9
    assert parse_timestamp_ns("20240101T000000.5") == 1704067200 * 10**9 + 5 * 10**8
    assert parse_timestamp_ns("2024-01-01T00:00:00") == 1704067200 * 10**9
    assert parse_timestamp_ns(12345) == 12345
    assert parse_timestamp_ns("12345") == 12345
    with pytest.raises(QueryParseError):
        parse_timestamp_ns("not-a-time")
    # Unicode digits must be rejected like the reference's -PARSER error,
    # not silently accepted by a Unicode-aware \d + int() (ADVICE r5)
    with pytest.raises(QueryParseError):
        parse_timestamp_ns("١٢٣")
    with pytest.raises(QueryParseError):
        parse_timestamp_ns("１２３４５")


def test_durations():
    assert parse_duration_ns("10s") == 10 * 10**9
    assert parse_duration_ns("5m") == 300 * 10**9
    assert parse_duration_ns("5min") == 300 * 10**9
    assert parse_duration_ns("100ms") == 10**8
    assert parse_duration_ns("2h") == 7200 * 10**9
    assert parse_duration_ns("1d") == 86400 * 10**9
    with pytest.raises(QueryParseError):
        parse_duration_ns("10parsecs")
