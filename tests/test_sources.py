"""RESP / OpenTSDB parser tests (model: the reference's fuzzers +
test_data_ingestion.py) and output-formatter tests."""

from __future__ import annotations

import pytest

from akumuli_spark.output.format import iso_ts, to_csv, to_resp
from akumuli_spark.sources.opentsdb import parse_opentsdb
from akumuli_spark.sources.resp import RespError, parse_resp, parse_resp_stage

NS = 10**9


def test_parse_simple_sample():
    pdus = "+cpu.user host=h1 region=NW\r\n+20240101T000000\r\n+31.5\r\n"
    [s] = parse_resp(pdus)
    assert s.series == "cpu.user host=h1 region=NW"
    assert s.metric == "cpu.user"
    assert s.tags == {"host": "h1", "region": "NW"}
    assert s.ts_ns == 1704067200 * NS
    assert s.value == 31.5


def test_parse_int_forms():
    pdus = "+m t=1\n:1418224423000000000\n:31\n"
    [s] = parse_resp(pdus)
    assert s.ts_ns == 1418224423000000000
    assert s.value == 31.0


def test_canonicalizes_tag_order():
    [s] = parse_resp("+m z=1 a=2\n:10\n:1\n")
    assert s.series == "m a=2 z=1"  # canonical = tags sorted by key


def test_row_protocol():
    pdus = "+cpu.real|cpu.user|cpu.sys host=m1\n+20141210T074343\n*3\n+3.12\n+8.11\n+12.6\n"
    samples = parse_resp(pdus)
    assert [s.metric for s in samples] == ["cpu.real", "cpu.user", "cpu.sys"]
    assert all(s.ts_ns == samples[0].ts_ns for s in samples)
    assert [s.value for s in samples] == [3.12, 8.11, 12.6]
    assert samples[0].series == "cpu.real host=m1"


def test_event_sample():
    [s] = parse_resp("+!error host=h1\n:10\n+disk=/dev/sda failed\n")
    assert s.metric == "!error"
    assert s.body == "disk=/dev/sda failed"
    assert s.value is None


def test_multiple_pdus():
    pdus = "+m a=1\n:1\n:10\n+m a=2\n:2\n:20\n"
    assert len(parse_resp(pdus)) == 2


@pytest.mark.parametrize(
    "bad",
    [
        "+m a=1\n:1\n",  # truncated
        "+m|n a=1\n:1\n:10\n",  # compound series without array
        "+m|n a=1\n:1\n*3\n:1\n:2\n:3\n",  # arity mismatch
        "+m a=1\n:1\n+notanumber\n",  # bad value
        "+m badtag\n:1\n:10\n",  # malformed tag
        "-ERR\n:1\n:2\n",  # error frame where value expected
    ],
)
def test_malformed_pdus_rejected(bad):
    with pytest.raises((RespError, ValueError)):
        parse_resp(bad)


def test_parse_resp_stage(spark):
    pdus = [
        ("+cpu host=a\n:1000000000\n:1\n",),
        ("+cpu host=b\n:2000000000\n:2\n+!e host=a\n:3000000000\n+boom\n",),
    ]
    df = spark.createDataFrame(pdus, ["value"])
    rows = parse_resp_stage(df).collect()
    assert len(rows) == 3
    byseries = {r["series"]: r for r in rows}
    assert byseries["cpu host=a"]["value"] == 1.0
    assert byseries["!e host=a"]["body"] == "boom"
    assert byseries["cpu host=b"]["tags_str"] == "host=b"


def test_opentsdb():
    samples = parse_opentsdb(
        "put sys.cpu.user 1356998400 42.5 host=web01 cpu=0\n"
        "put sys.cpu.user 1356998400500 40 host=web02\n"
    )
    assert samples[0].ts_ns == 1356998400 * NS
    assert samples[0].tags == {"host": "web01", "cpu": "0"}
    assert samples[1].ts_ns == 1356998400500 * 10**6
    with pytest.raises(RespError):
        parse_opentsdb("get sys.cpu.user 1 2\n")


def test_iso_ts_nanos():
    assert iso_ts(1704067200 * NS + 123456789) == "20240101T000000.123456789"


def test_csv_and_resp_formatting(spark):
    df = spark.createDataFrame(
        [("m a=1", 1704067200 * NS, 1.5, None)],
        "series string, ts_ns long, x double, y double",
    )
    [line] = list(to_csv(df))
    assert line == "m a=1, 20240101T000000.000000000, 1.5, "
    frames = list(to_resp(df))
    assert frames == [
        "+m a=1",
        "+20240101T000000.000000000",
        "*2",
        "+1.5",
        "+",
    ]


def test_resp_session_dictionary():
    from akumuli_spark.sources.resp import parse_resp, RespError
    import pytest as _pytest
    d = {}
    # register two series, then write via ids and by name interchangeably
    pdus = (
        "*2\n+cpu.user host=a\n:1\n"
        "*2\n+cpu.syst host=a\n:2\n"
        ":1\n:1000\n:10\n"
        ":2\n:1000\n:20\n"
        "+cpu.user host=b\n:1000\n:30\n"
    )
    samples = parse_resp(pdus, dictionary=d)
    assert [(s.series, s.value) for s in samples] == [
        ("cpu.user host=a", 10.0),
        ("cpu.syst host=a", 20.0),
        ("cpu.user host=b", 30.0),
    ]
    # dictionary persists across chunks (same session)
    [s] = parse_resp(":1\n:2000\n:40\n", dictionary=d)
    assert s.series == "cpu.user host=a" and s.ts_ns == 2000
    with _pytest.raises(RespError):
        parse_resp(":99\n:1\n:2\n", dictionary=d)
