"""eval expression translation tests — muParser grammar → Spark SQL."""

from __future__ import annotations

import pytest

from akumuli_spark.query.errors import QueryValidationError
from akumuli_spark.query.evalexpr import translate
from akumuli_spark.query.engine import execute_query
from akumuli_spark.query.plan import parse_timestamp_ns
from akumuli_spark.sources.testdata import metrics_view
from tests.conftest import SF_DIR

T96 = parse_timestamp_ns("19960101T000000")
T97 = parse_timestamp_ns("19970101T000000")


def test_power_is_right_associative():
    assert translate("a ^ b ^ c") == "power(`a`, power(`b`, `c`))"


def test_power_not_xor():
    assert "power" in translate("_var_0 ^ 2")


def test_precedence():
    assert translate("a + b * c") == "(`a` + (`b` * `c`))"
    assert translate("(a + b) * c") == "((`a` + `b`) * `c`)"
    assert translate("-a ^ 2") == "power((- `a`), 2)"


def test_functions_pass_through():
    assert translate("sqrt(a) + log(b)") == "(sqrt(`a`) + log(`b`))"
    assert translate("min(a, b, 2)") == "least(`a`, `b`, 2)"
    assert translate("max(a, b)") == "greatest(`a`, `b`)"


def test_column_substitution_is_token_level():
    # metric 'x' is a substring of function 'max' — must not corrupt the call
    assert (
        translate("max(x, 2)", columns={"x": "_var_0"})
        == "greatest(`_var_0`, 2)"
    )
    # dotted metric names substitute as whole identifiers
    assert (
        translate("a.b + a.b.c", columns={"a.b": "_var_0", "a.b.c": "_var_1"})
        == "(`_var_0` + `_var_1`)"
    )
    # a metric literally named '_var_1' doesn't cascade into another's slot
    assert (
        translate("_var_1 + q", columns={"_var_1": "_var_0", "q": "_var_1"})
        == "(`_var_0` + `_var_1`)"
    )
    # function-position identifiers are never substituted
    assert (
        translate("min(min, 2)", columns={"min": "_var_0"})
        == "least(`_var_0`, 2)"
    )


def test_rejects_garbage():
    with pytest.raises(QueryValidationError):
        translate("a + ")
    with pytest.raises(QueryValidationError):
        translate("system('rm')")
    with pytest.raises(QueryValidationError):
        translate("a ; b")


def test_eval_power_end_to_end(spark):
    m = metrics_view(spark, SF_DIR)
    rows = execute_query(
        spark,
        {
            "join": ["lineitem.qty", "lineitem.disc"],
            "range": {"from": T96, "to": T96 + 30 * 86400 * 10**9},
            "apply": [{"name": "eval", "expr": "lineitem.disc ^ 2 + lineitem.qty"}],
        },
        m,
    ).limit(500).collect()
    assert rows
    # spot-check: value must equal disc² + qty, never disc XOR 2
    base = execute_query(
        spark,
        {
            "join": ["lineitem.qty", "lineitem.disc"],
            "range": {"from": T96, "to": T96 + 30 * 86400 * 10**9},
        },
        m,
    ).collect()
    expected = {
        (r["series"].replace("lineitem.qty|lineitem.disc", "x"), r["ts_ns"]):
            r["lineitem.disc"] ** 2 + r["lineitem.qty"]
        for r in base
    }
    for r in rows:
        key = (r["series"].replace("lineitem.qty|lineitem.disc", "x"), r["ts_ns"])
        assert r["value"] == pytest.approx(expected[key], rel=1e-12)
