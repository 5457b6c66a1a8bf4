"""Reference-parity tests using the reference's own deterministic
generator style (functests/akumulid_test_tools.py:58-125): value = row
index, tag rotation tag1=[A], tag2=[B,C], tag3=[D..H], fixed start time
and delta — so expected outputs are closed-form, exactly like
test_query_language.py / test_eval.py / test_group_aggregate.py assert
them (FIXTURES.md M1/M2)."""

from __future__ import annotations

import pytest

from akumuli_spark.datamodel import canonical_series_name
from akumuli_spark.query.engine import execute_query

NS = 10**9
T0 = 1_700_000_000 * NS  # fixed start
DELTA = 10_000_000  # 10 ms in ns
N = 5_000

TAG2 = ["B", "C"]
TAG3 = ["D", "E", "F", "G", "H"]


def _m1_rows():
    """Fixture M1: metric `test`, value=i, rotated tags ⇒ 10 series."""
    for i in range(N):
        tags = {"tag1": "A", "tag2": TAG2[i % 2], "tag3": TAG3[i % 5]}
        yield (
            canonical_series_name("test", tags), "test", tags,
            T0 + i * DELTA, float(i),
        )


def _m2_rows():
    """Fixture M2: cpu.user=i, cpu.syst=i, cpu.real=2i at equal ts."""
    for i in range(N):
        tags = {"tag1": "A", "tag2": TAG2[i % 2]}
        for metric, val in (("cpu.user", i), ("cpu.syst", i), ("cpu.real", 2 * i)):
            yield (
                canonical_series_name(metric, tags), metric, tags,
                T0 + i * DELTA, float(val),
            )


SCHEMA = "series string, metric string, tags map<string,string>, ts_ns long, value double"


@pytest.fixture(scope="module")
def m1(spark):
    return spark.createDataFrame(list(_m1_rows()), SCHEMA).cache()


@pytest.fixture(scope="module")
def m2(spark):
    return spark.createDataFrame(list(_m2_rows()), SCHEMA).cache()


def test_select_forward_values_are_indices(spark, m1):
    # rows [100, 200): values are exactly the indices, ascending ts
    rows = execute_query(
        spark,
        {"select": "test",
         "range": {"from": T0 + 100 * DELTA, "to": T0 + 200 * DELTA}},
        m1,
    ).collect()
    assert [r["value"] for r in rows] == [float(i) for i in range(100, 200)]


def test_select_backward_reverses(spark, m1):
    rows = execute_query(
        spark,
        {"select": "test",
         "range": {"from": T0 + 199 * DELTA, "to": T0 + 99 * DELTA}},
        m1,
    ).collect()
    assert [r["value"] for r in rows] == [float(i) for i in range(199, 99, -1)]


def test_where_selects_series_subset(spark, m1):
    # tag3=D hits rows with i % 5 == 0
    rows = execute_query(
        spark,
        {"select": "test", "range": {"from": T0, "to": T0 + N * DELTA},
         "where": {"tag3": "D"}},
        m1,
    ).collect()
    assert len(rows) == N // 5
    assert all(int(r["value"]) % 5 == 0 for r in rows)


def test_aggregate_closed_form_sum(spark, m1):
    # whole-range sum over all series regrouped to one: Σ i = N(N-1)/2
    rows = execute_query(
        spark,
        {"aggregate": {"test": "sum"},
         "group-by-tag": ["tag1", "tag2", "tag3"]},
        m1,
    ).collect()
    assert len(rows) == 1
    assert rows[0]["series"] == "test:sum"
    assert rows[0]["value"] == N * (N - 1) / 2


def test_group_aggregate_bucket_anchoring(spark, m1):
    # step = 1s = 100 samples; from offset by 3 samples ⇒ buckets hold
    # indices [3+100k, 3+100(k+1)) — begin-anchored, NOT epoch-aligned
    t_from = T0 + 3 * DELTA
    step_ns = 100 * DELTA
    rows = execute_query(
        spark,
        {"group-aggregate": {"metric": "test", "step": step_ns, "func": "count"},
         "range": {"from": t_from, "to": T0 + N * DELTA},
         "group-by-tag": ["tag1", "tag2", "tag3"]},
        m1,
    ).collect()
    by_bucket = {r["ts_ns"]: r["count"] for r in rows}
    assert by_bucket[t_from] == 100.0
    assert by_bucket[t_from + step_ns] == 100.0
    # bucket labels are from + k*step
    assert all((ts - t_from) % step_ns == 0 for ts in by_bucket)
    # last partial bucket: (N-3) % 100 = 97 samples
    assert by_bucket[max(by_bucket)] == (N - 3) % 100


def test_join_aligns_rows(spark, m2):
    rows = execute_query(
        spark,
        {"join": ["cpu.user", "cpu.real"],
         "range": {"from": T0, "to": T0 + N * DELTA}},
        m2,
    ).collect()
    assert len(rows) == N
    for r in rows:
        assert r["cpu.real"] == 2 * r["cpu.user"]


def test_eval_user_minus_syst_is_zero(spark, m2):
    # test_eval.py:34-60: expr "cpu.user - cpu.syst" ⇒ all-zero output
    rows = execute_query(
        spark,
        {"join": ["cpu.user", "cpu.syst"],
         "range": {"from": T0, "to": T0 + N * DELTA},
         "apply": [{"name": "eval", "expr": "cpu.user - cpu.syst"}]},
        m2,
    ).collect()
    assert len(rows) == N
    assert all(r["value"] == 0.0 for r in rows)


def test_limit_offset_documented_intent(spark, m1):
    rows = execute_query(
        spark,
        {"select": "test", "range": {"from": T0, "to": T0 + N * DELTA},
         "limit": 10, "offset": 5},
        m1,
    ).collect()
    # offset skips 5, limit keeps 10 (the reference's parser stores offset
    # into limit and never counts skips — we implement the intent)
    assert [r["value"] for r in rows] == [float(i) for i in range(5, 15)]


def test_order_by_series_groups_series(spark, m1):
    rows = execute_query(
        spark,
        {"select": "test", "range": {"from": T0, "to": T0 + 100 * DELTA},
         "order-by": "series"},
        m1,
    ).collect()
    series_seq = [r["series"] for r in rows]
    assert series_seq == sorted(series_seq)
    # within one series ts ascends
    prev = {}
    for r in rows:
        if r["series"] in prev:
            assert r["ts_ns"] > prev[r["series"]]
        prev[r["series"]] = r["ts_ns"]


# ---------------------------------------------------------------------------
# filter-query matrix (mirrors functests/test_filter_query.py scenarios)
# ---------------------------------------------------------------------------

FILTER_CASES = [
    ({"gt": 2500}, lambda i: i > 2500),
    ({"ge": 2500}, lambda i: i >= 2500),
    ({"lt": 2500}, lambda i: i < 2500),
    ({"le": 2500}, lambda i: i <= 2500),
    ({"gt": 1000, "lt": 2000}, lambda i: 1000 < i < 2000),
    ({"ge": 1000, "le": 1000}, lambda i: i == 1000),
    ({"gt": 4998}, lambda i: i > 4998),
    ({"lt": 0}, lambda i: False),
]


@pytest.mark.parametrize("spec,pred", FILTER_CASES)
def test_filter_matrix(spark, m1, spec, pred):
    rows = execute_query(
        spark,
        {"select": "test", "range": {"from": T0, "to": T0 + N * DELTA},
         "filter": spec},
        m1,
    ).collect()
    expected = [float(i) for i in range(N) if pred(i)]
    assert sorted(r["value"] for r in rows) == expected


def test_filter_with_where_combination(spark, m1):
    # filter AND where combine: tag3=E (i%5==1) values above threshold
    rows = execute_query(
        spark,
        {"select": "test", "range": {"from": T0, "to": T0 + N * DELTA},
         "where": {"tag3": "E"}, "filter": {"ge": 4000}},
        m1,
    ).collect()
    expected = [float(i) for i in range(N) if i % 5 == 1 and i >= 4000]
    assert sorted(r["value"] for r in rows) == expected
