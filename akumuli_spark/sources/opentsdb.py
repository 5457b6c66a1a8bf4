"""OpenTSDB telnet-protocol parser: ``put metric ts value tag=v ...``
(/root/reference/akumulid/protocolparser.h:296-321, ``opentsdb_util`` in
protocolparser.cpp).  Timestamps are seconds or milliseconds since epoch
(the reference multiplies seconds out to nanoseconds)."""

from __future__ import annotations

from akumuli_spark.datamodel import canonical_series_name
from akumuli_spark.sources.resp import RespError, Sample


def parse_opentsdb_line(line: str) -> Sample:
    parts = line.split()
    if len(parts) < 4 or parts[0] != "put":
        raise RespError(f"malformed OpenTSDB line {line!r}")
    metric, ts_raw, value_raw = parts[1], parts[2], parts[3]
    tags: dict[str, str] = {}
    for p in parts[4:]:
        k, sep, v = p.partition("=")
        if not sep or not k or not v:
            raise RespError(f"malformed tag {p!r} in {line!r}")
        tags[k] = v
    try:
        ts = int(ts_raw)
    except ValueError:
        raise RespError(f"bad timestamp {ts_raw!r}") from None
    # seconds (10 digits) vs milliseconds (13 digits), as in OpenTSDB
    ts_ns = ts * (1_000_000 if len(ts_raw) >= 13 else 1_000_000_000)
    try:
        value = float(value_raw)
    except ValueError:
        raise RespError(f"bad value {value_raw!r}") from None
    return Sample(
        canonical_series_name(metric, tags), metric, tags, ts_ns, value, None
    )


def parse_opentsdb(text: str) -> list[Sample]:
    return [
        parse_opentsdb_line(ln) for ln in text.splitlines() if ln.strip()
    ]
