"""RESP (Redis-like) ingestion protocol parser.

Re-implements the reference's TCP wire format
(/root/reference/akumulid/protocolparser.h:133-215, protocolparser.cpp):

* simple sample — three values: series name, timestamp, value::

    +balancers.memusage host=machine1 region=NW\r\n
    +20141210T074343.999999999\r\n     (or :1418224423000000000)
    +31.5\r\n                           (or :31)

* row protocol — N metrics at one timestamp: compound series
  ``+m1|m2|m3 tags``, timestamp, then a RESP array of N values::

    +cpu.real|cpu.user|cpu.sys host=machine1\r\n
    +20141210T074343\r\n
    *3\r\n
    +3.12\r\n+8.11\r\n+12.6\r\n

* events — series starting with ``!``, value is the string body.

The parser is a pure-Python core (usable in tests and driver scripts)
plus an Arrow-batched ``mapInPandas`` stage for Structured Streaming,
where each input row carries one or more *complete* PDUs (framing is the
transport's job, as in the reference where a connection parser owns the
byte stream).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass
from functools import lru_cache

import pandas as pd

from pyspark.sql import DataFrame

from akumuli_spark.datamodel import (
    MAX_EVENT_LEN,
    canonical_series_name,
    is_event_metric,
    parse_series_name,
)
from akumuli_spark.query.plan import parse_timestamp_ns


@lru_cache(maxsize=1 << 16)
def _resolve_series(name: str) -> tuple[str, str, tuple[tuple[str, str], ...]]:
    """Parse + canonicalize a series name once per distinct name.

    Ingest streams repeat a small set of series; memoizing the regex
    parse and canonical re-join is the Python analogue of the series-id
    index the reference consults per sample (~2× parser throughput).
    Bounded LRU so a pathological stream of unique names can't grow
    without limit."""
    metric, tags = parse_series_name(name)
    return canonical_series_name(metric, tags), metric, tuple(tags.items())


class RespError(ValueError):
    """Malformed PDU (the reference replies -PARSER error and drops the
    connection)."""


@dataclass(frozen=True)
class Sample:
    series: str
    metric: str
    tags: dict[str, str]
    ts_ns: int
    value: float | None
    body: str | None = None


def _parse_value_token(tok: str) -> str:
    if not tok:
        raise RespError("empty RESP token")
    if tok[0] in "+:":
        return tok[1:]
    if tok[0] in "-$*":
        raise RespError(f"unexpected RESP token {tok!r}")
    return tok


def parse_resp(text: str, dictionary: dict[int, str] | None = None) -> list[Sample]:
    """Parse a chunk of complete PDUs into samples.

    Supports the session dictionary (protocolparser.h:175-215): a PDU of
    the form ``*2 / +series name / :id`` registers ``id → name``; later
    samples may reference the series as ``:id`` instead of the full name.
    Pass a dict to keep the mapping across chunks (one session = one
    dictionary, as in the reference's TCP session).
    """
    dictionary = {} if dictionary is None else dictionary
    lines = [ln for ln in text.replace("\r\n", "\n").split("\n") if ln.strip()]
    out: list[Sample] = []
    i = 0
    while i < len(lines):
        # dictionary-update PDU: *2, +name, :id
        if lines[i].startswith("*2") and i + 2 < len(lines) and lines[i + 1][:1] == "+" \
                and lines[i + 2][:1] == ":":
            name = lines[i + 1][1:]
            try:
                sid = int(lines[i + 2][1:])
            except ValueError:
                raise RespError(f"bad dictionary id {lines[i + 2]!r}") from None
            dictionary[sid] = name
            i += 3
            continue
        series_tok = _parse_value_token(lines[i])
        if lines[i][:1] == ":":
            # series referenced by dictionary id
            try:
                series_tok = dictionary[int(series_tok)]
            except (KeyError, ValueError):
                raise RespError(f"unknown series id {series_tok!r}") from None
        i += 1
        if i >= len(lines):
            raise RespError(f"truncated PDU after series {series_tok!r}")
        ts_tok = _parse_value_token(lines[i])
        # fast path: raw integer nanoseconds (the dominant wire form).
        # Gate on isascii()+isdigit(), not int(): Python's int() also
        # accepts underscore separators, surrounding whitespace, and
        # non-ASCII Unicode digits — wire forms the reference parser
        # rejects as -PARSER errors (and '²'.isdigit() alone would send
        # int() a ValueError that isn't a structured RespError).
        if ts_tok.isascii() and (
            ts_tok.isdigit() or (ts_tok[:1] in "+-" and ts_tok[1:].isdigit())
        ):
            ts_ns = int(ts_tok)
        else:
            ts_ns = parse_timestamp_ns(ts_tok)
        i += 1
        if i >= len(lines):
            raise RespError(f"truncated PDU after timestamp for {series_tok!r}")
        metric_part, _, tag_part = series_tok.partition(" ")
        metrics = metric_part.split("|")
        if lines[i].startswith("*"):
            # row protocol: array of one value per compound metric
            n = int(lines[i][1:])
            i += 1
            if n != len(metrics):
                raise RespError(
                    f"row protocol arity mismatch: {n} values for {len(metrics)} metrics"
                )
            values = []
            for _ in range(n):
                if i >= len(lines):
                    raise RespError("truncated row-protocol array")
                values.append(_parse_value_token(lines[i]))
                i += 1
        else:
            if len(metrics) != 1:
                raise RespError("compound series requires a row-protocol array")
            values = [_parse_value_token(lines[i])]
            i += 1
        for metric, raw in zip(metrics, values):
            name = f"{metric} {tag_part}".strip()
            canonical, m, tag_items = _resolve_series(name)
            tags = dict(tag_items)
            if is_event_metric(m):
                if len(raw) > MAX_EVENT_LEN:
                    # AKU_LIMITS_MAX_EVENT_LEN (akumuli_def.h:120)
                    raise RespError(
                        f"event body too long ({len(raw)} > {MAX_EVENT_LEN})"
                    )
                out.append(Sample(canonical, m, tags, ts_ns, None, raw))
            else:
                try:
                    val = float(raw)
                except ValueError:
                    raise RespError(f"bad value {raw!r} for metric {m!r}") from None
                out.append(Sample(canonical, m, tags, ts_ns, val, None))
    return out


#: output schema of the parser stage (the long metrics table + body for
#: events; tags as a canonical "k=v,k=v" string so the streaming sink can
#: partition on plain columns)
PARSED_SCHEMA = (
    "series string, metric string, tags_str string, ts_ns long, "
    "value double, body string"
)


def parse_resp_stage(pdus: DataFrame, column: str = "value",
                     on_error: str = "fail", dropped_acc=None) -> DataFrame:
    """mapInPandas parse stage: DataFrame[column: string of complete PDUs]
    → parsed samples.  Works identically on batch and streaming frames.

    ``on_error="skip"`` drops malformed PDU chunks instead of failing the
    stream — the reference's UDP path drops bad packets and keeps serving
    (udp_server.cpp), while its TCP path kills the connection (= the
    default ``"fail"``).

    ``dropped_acc`` (an optional Spark accumulator) counts the chunks the
    skip path drops, completing "malformed packets are counted" parity
    with udp_server.cpp: UdpSpool counts decode failures, this counts
    RESP-malformed ones.  It is an operational metric — task retries can
    overcount, like any Spark accumulator.
    """
    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for text in pdf[column]:
                try:
                    samples = parse_resp(text)
                except (RespError, ValueError):
                    if on_error == "fail":
                        raise
                    if dropped_acc is not None:
                        dropped_acc.add(1)
                    continue
                for s in samples:
                    tags_str = ",".join(f"{k}={v}" for k, v in sorted(s.tags.items()))
                    rows.append(
                        (s.series, s.metric, tags_str, s.ts_ns, s.value, s.body)
                    )
            yield pd.DataFrame(
                rows,
                columns=["series", "metric", "tags_str", "ts_ns", "value", "body"],
            )

    return pdus.mapInPandas(parse_batches, schema=PARSED_SCHEMA)
