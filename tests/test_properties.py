"""Property-based parser tests — the pytest analogue of the reference's
AFL fuzz harnesses (fuzzers/afl_*.cpp: series-name, timestamp, RESP)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from akumuli_spark.datamodel import canonical_series_name, parse_series_name
from akumuli_spark.query.errors import QueryParseError
from akumuli_spark.query.plan import parse_duration_ns, parse_timestamp_ns
from akumuli_spark.sources.resp import RespError, parse_resp

ident = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="._-"),
    min_size=1, max_size=12,
).filter(lambda s: "=" not in s and " " not in s)


@given(metric=ident, tags=st.dictionaries(ident, ident, min_size=0, max_size=6))
def test_series_name_roundtrip(metric, tags):
    name = canonical_series_name(metric, tags)
    m, t = parse_series_name(name)
    assert m == metric and t == tags
    # canonical form is a fixed point
    assert canonical_series_name(m, t) == name


@given(st.text(max_size=50))
def test_series_parser_never_crashes(text):
    try:
        parse_series_name(text)
    except ValueError:
        pass  # rejection is fine; crashes are not


@given(st.integers(min_value=0, max_value=2**62))
def test_timestamp_int_passthrough(ns):
    assert parse_timestamp_ns(ns) == ns
    assert parse_timestamp_ns(str(ns)) == ns


@given(st.text(max_size=30))
def test_timestamp_parser_never_crashes(text):
    try:
        parse_timestamp_ns(text)
    except QueryParseError:
        pass


@given(st.integers(min_value=1, max_value=10**6),
       st.sampled_from(["n", "us", "ms", "s", "m", "min", "h", "d", "w"]))
def test_duration_units_scale(num, unit):
    ns = parse_duration_ns(f"{num}{unit}")
    assert ns % num == 0 and ns // num == parse_duration_ns(f"1{unit}")


@given(st.text(max_size=60))
@settings(max_examples=200)
def test_resp_parser_never_crashes(text):
    try:
        parse_resp(text)
    except (RespError, ValueError):
        pass


@given(metric=ident, tags=st.dictionaries(ident, ident, min_size=1, max_size=4),
       ts=st.integers(min_value=1, max_value=2**60),
       value=st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_resp_roundtrip(metric, tags, ts, value):
    name = " ".join([metric] + [f"{k}={v}" for k, v in tags.items()])
    [s] = parse_resp(f"+{name}\n:{ts}\n+{value!r}\n")
    assert s.metric == metric
    assert s.tags == tags
    assert s.ts_ns == ts
    assert s.value == float(repr(value))
