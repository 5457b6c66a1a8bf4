"""Edge cases: empty ranges, whole-retention aggregate, skewed joins,
tag-limit validation."""

from __future__ import annotations

import pytest

from akumuli_spark.datamodel import parse_series_name
from akumuli_spark.query.engine import execute_query
from tests.test_reference_fixtures import DELTA, N, SCHEMA, T0, _m1_rows

NS = 10**9


@pytest.fixture(scope="module")
def m1(spark):
    return spark.createDataFrame(list(_m1_rows()), SCHEMA).cache()


def test_empty_range_returns_nothing(spark, m1):
    df = execute_query(
        spark, {"select": "test", "range": {"from": T0, "to": T0}}, m1
    )
    assert df.count() == 0


def test_unknown_metric_returns_nothing(spark, m1):
    df = execute_query(
        spark, {"select": "nope", "range": {"from": T0, "to": T0 + N * DELTA}}, m1
    )
    assert df.count() == 0


def test_aggregate_without_range_is_whole_retention(spark, m1):
    rows = execute_query(
        spark,
        {"aggregate": {"test": "count"}, "group-by-tag": ["tag1", "tag2", "tag3"]},
        m1,
    ).collect()
    assert len(rows) == 1 and rows[0]["value"] == float(N)


def test_skewed_join_completes_correctly(spark):
    # one hot tagset carries 90% of rows — AQE skew handling must not
    # change results
    rows = []
    for i in range(20_000):
        host = "hot" if i % 10 != 0 else f"cold{i % 100}"
        tags = {"host": host}
        for metric in ("a", "b"):
            rows.append(
                (f"{metric} host={host}", metric, tags, T0 + i * NS, float(i))
            )
    df = spark.createDataFrame(rows, SCHEMA)
    out = execute_query(
        spark,
        {"join": ["a", "b"], "range": {"from": T0, "to": T0 + 20_000 * NS}},
        df,
    )
    collected = out.collect()
    assert len(collected) == 20_000
    assert all(r["a"] == r["b"] for r in collected)


def test_tag_limit_enforced():
    name = "m " + " ".join(f"t{i}=v" for i in range(33))
    with pytest.raises(ValueError, match="too many tags"):
        parse_series_name(name)


def test_series_name_length_limit_enforced():
    # AKU_LIMITS_MAX_SNAME = 4096 (akumuli_def.h:118, storage2.cpp:211)
    name = "m tag=" + "v" * 4096
    with pytest.raises(ValueError, match="series name too long"):
        parse_series_name(name)
    # exactly at the limit parses fine
    ok = "m tag=" + "v" * (4096 - len("m tag="))
    parse_series_name(ok)


def test_event_body_length_limit_enforced():
    # AKU_LIMITS_MAX_EVENT_LEN = 4096 (akumuli_def.h:120)
    from akumuli_spark.sources.resp import RespError, parse_resp

    body_ok = "x" * 4096
    pdu = f"+!evt host=a\n:1000000000\n+{body_ok}\n"
    assert parse_resp(pdu)[0].body == body_ok
    body_long = "x" * 4097
    with pytest.raises(RespError, match="event body too long"):
        parse_resp(f"+!evt host=a\n:1000000000\n+{body_long}\n")
