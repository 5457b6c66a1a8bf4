"""Rollup fast path: combining base-step partials must equal the direct
group-aggregate over raw points (the reference's inner-node-aggregate
consistency property)."""

from __future__ import annotations

import pytest

from akumuli_spark.query.engine import execute_query
from akumuli_spark.query.errors import QueryValidationError
from akumuli_spark.query.rollup import group_aggregate_from_rollup
from akumuli_spark.sources.resp import parse_resp_stage
from akumuli_spark.sources.testdata import app_metrics_view
from akumuli_spark.streaming.ingest import windowed_rollup_stream
from akumuli_spark.query.plan import parse_timestamp_ns
from tests.conftest import SF_DIR

NS = 10**9
MIN_NS = 60 * NS
E0 = parse_timestamp_ns("20240101T000000")
E1 = parse_timestamp_ns("20240201T000000")


@pytest.fixture(scope="module")
def raw(spark):
    return app_metrics_view(spark, SF_DIR)


@pytest.fixture(scope="module")
def rollup(spark, raw):
    # base-step rollup as the streaming ingest would maintain it
    # (batch-mode execution of the same plan)
    parsed_like = raw.select("series", "ts_ns", "value")
    return windowed_rollup_stream(parsed_like, step="1 minute").cache()


def test_rollup_matches_direct_group_aggregate(spark, raw, rollup):
    step = 60 * MIN_NS  # 1h, multiple of the 1-minute base step
    direct = execute_query(
        spark,
        {
            "group-aggregate": {
                "metric": "app.click",
                "step": step,
                "func": ["count", "sum", "min", "max", "mean"],
            },
            "range": {"from": E0, "to": E1},
        },
        raw,
    )
    fast = group_aggregate_from_rollup(
        rollup.filter("series like 'app.click %'"),
        E0, E1, step, ["count", "sum", "min", "max", "mean"], MIN_NS,
    )
    d = {(r["series"], r["ts_ns"]): (r["count"], r["sum"], r["min"], r["max"], r["mean"])
         for r in direct.collect()}
    f = {(r["series"], r["ts_ns"]): (r["count"], r["sum"], r["min"], r["max"], r["mean"])
         for r in fast.collect()}
    assert set(d) == set(f) and d
    for k in d:
        for a, b in zip(d[k], f[k]):
            assert a == pytest.approx(b, rel=1e-12), (k, d[k], f[k])


def test_rollup_refuses_unaligned(rollup):
    with pytest.raises(QueryValidationError):
        group_aggregate_from_rollup(rollup, E0 + 1, E1, 60 * MIN_NS, ["sum"], MIN_NS)
    with pytest.raises(QueryValidationError):
        group_aggregate_from_rollup(rollup, E0, E1, 90 * NS, ["sum"], MIN_NS)
    with pytest.raises(QueryValidationError):
        group_aggregate_from_rollup(rollup, E0, E1, 60 * MIN_NS, ["first"], MIN_NS)
