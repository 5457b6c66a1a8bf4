"""Logical query plan — the Spark-side analogue of the reference's
``ReshapeRequest`` IR (/root/reference/libakumuli/queryprocessor_framework.h:104-167).

The JSON parser produces one :class:`Query`; the engine
(akumuli_spark.query.engine) compiles it into a DataFrame expression and
lets Catalyst choose the physical plan (the reference instead hard-wires
one of five iterator plans in queryplan.cpp:1407-1428).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime, timezone
from enum import Enum

from akumuli_spark.query.errors import QueryParseError


class QueryKind(str, Enum):
    SELECT = "select"
    SELECT_EVENTS = "select-events"
    AGGREGATE = "aggregate"
    GROUP_AGGREGATE = "group-aggregate"
    JOIN = "join"
    GROUP_AGGREGATE_JOIN = "group-aggregate-join"


class OrderBy(str, Enum):
    TIME = "time"
    SERIES = "series"


class GroupByOp(str, Enum):
    #: remove the listed tags from the series key (``group-by-tag``)
    GROUP = "group"
    #: keep only the listed tags (``pivot-by-tag``)
    PIVOT = "pivot"


#: The 11 aggregation functions
#: (/root/reference/libakumuli/queryprocessor_framework.h:48-101).
AGG_FUNCS = (
    "count",
    "sum",
    "min",
    "max",
    "mean",
    "min_timestamp",
    "max_timestamp",
    "first",
    "last",
    "first_timestamp",
    "last_timestamp",
)

_FILTER_OPS = ("gt", "ge", "lt", "le")


@dataclass(frozen=True)
class QueryRange:
    """Semi-open time range in int64 nanoseconds.

    ``from`` is inclusive, ``to`` exclusive; ``from > to`` means a backward
    scan with descending output (reference: operators/operator.h:77-104,
    FIXTURES.md §5.1).  ``begin/end`` keep the user's orientation:
    forward ⇒ begin < end, backward ⇒ begin > end.
    """

    begin_ns: int
    end_ns: int

    @property
    def forward(self) -> bool:
        return self.begin_ns <= self.end_ns

    @property
    def lo_ns(self) -> int:
        """Inclusive lower bound of the scanned interval."""
        return self.begin_ns if self.forward else self.end_ns + 1

    @property
    def hi_ns(self) -> int:
        """Exclusive upper bound... forward; for backward the begin side is
        inclusive, so hi = begin + 1."""
        return self.end_ns if self.forward else self.begin_ns + 1


@dataclass(frozen=True)
class TagCombination:
    """One conjunction: every listed tag must take one of the listed values."""

    tags: tuple[tuple[str, tuple[str, ...]], ...]  # ((tag, (v1, v2, ...)), ...)


@dataclass(frozen=True)
class WherePredicate:
    """OR of tag conjunctions (reference ``where`` clause,
    queryparser.cpp:692-750: map form = one conjunction with value lists;
    list form = OR of exact tag combinations)."""

    combinations: tuple[TagCombination, ...]


@dataclass(frozen=True)
class ValueFilter:
    """gt/ge/lt/le bounds (reference operators/operator.h:138-214)."""

    gt: float | None = None
    ge: float | None = None
    lt: float | None = None
    le: float | None = None


@dataclass(frozen=True)
class FilterClause:
    """Per-metric (or per-component for group-aggregate) value filters plus
    the ALL/ANY combiner (queryparser.cpp:759-870)."""

    by_key: tuple[tuple[str, ValueFilter], ...]
    require_all: bool = True


@dataclass(frozen=True)
class GroupByTag:
    op: GroupByOp
    tags: tuple[str, ...]


@dataclass(frozen=True)
class ApplyNode:
    name: str
    params: tuple[tuple[str, object], ...] = ()

    def param(self, key: str, default=None):
        for k, v in self.params:
            if k == key:
                return v
        return default


@dataclass(frozen=True)
class Query:
    kind: QueryKind
    #: metric names in query order (select: 1; join/group-aggregate: ≥1)
    metrics: tuple[str, ...]
    range: QueryRange
    #: aggregate: metric → tuple of funcs;  group-aggregate[-join]: funcs
    #: shared across metrics, stored under key "*"
    agg_funcs: tuple[tuple[str, tuple[str, ...]], ...] = ()
    step_ns: int | None = None
    where: WherePredicate | None = None
    filter: FilterClause | None = None
    group_by: GroupByTag | None = None
    order_by: OrderBy = OrderBy.TIME
    limit: int | None = None
    offset: int | None = None
    apply: tuple[ApplyNode, ...] = ()
    #: select-events body regex (queryparser.cpp:1357-1445)
    event_regex: str | None = None


# ---------------------------------------------------------------------------
# timestamp / duration parsing
# ---------------------------------------------------------------------------

_DURATION_RE = re.compile(r"^(\d+)\s*(ns|n|us|u|ms|s|min|m|h|d|w)$")
_DURATION_NS = {
    "n": 1,
    "ns": 1,
    "u": 1_000,
    "us": 1_000,
    "ms": 1_000_000,
    "s": 1_000_000_000,
    "m": 60_000_000_000,
    "min": 60_000_000_000,
    "h": 3_600_000_000_000,
    "d": 86_400_000_000_000,
    "w": 7 * 86_400_000_000_000,
}


def parse_duration_ns(text: str | int) -> int:
    """``"30s"/"5min"/"100ms"`` → ns (reference datetime.cpp:173
    ``parse_duration``; same unit grammar, ns default dropped because the
    reference's unitless branch multiplies by 0)."""
    if isinstance(text, int):
        return text
    m = _DURATION_RE.match(text.strip())
    if not m:
        raise QueryParseError(f"bad duration {text!r}")
    return int(m.group(1)) * _DURATION_NS[m.group(2)]


_ISO_BASIC_RE = re.compile(
    r"^(\d{4})(\d{2})(\d{2})T(\d{2})(\d{2})(\d{2})(?:\.(\d{1,9}))?$"
)
_ISO_EXT_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[T ](\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,9}))?Z?$"
)


def parse_timestamp_ns(value: str | int | float) -> int:
    """ISO8601 (basic ``20170101T000000.000000000`` like the reference's
    boost ``from_iso_string``, or extended) or raw integer nanoseconds."""
    if isinstance(value, bool):
        raise QueryParseError(f"bad timestamp {value!r}")
    if isinstance(value, int):
        return value
    if isinstance(value, float):
        if not value.is_integer():
            raise QueryParseError(f"bad timestamp {value!r}")
        return int(value)
    text = value.strip()
    # ASCII-only digits: \d is Unicode-aware and int() accepts Unicode
    # digits, so without re.ASCII a token like '١٢٣' would silently parse
    # as 123 where the reference's parser raises -PARSER (the RESP source
    # gates on isascii() and relies on this rejecting the rest)
    if re.fullmatch(r"[+-]?\d+", text, re.ASCII):
        return int(text)
    m = _ISO_BASIC_RE.match(text) or _ISO_EXT_RE.match(text)
    if not m:
        raise QueryParseError(f"bad timestamp {value!r}")
    y, mo, d, h, mi, s = (int(x) for x in m.groups()[:6])
    frac = (m.group(7) or "").ljust(9, "0")
    dt = datetime(y, mo, d, h, mi, s, tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000 + int(frac)


#: engine EXTENSION beside the reference's 11 funcs (operator.h:20-32):
#: exact percentiles ``p<0-100>``, e.g. p50 / p99 / p99.9 — the dashboard
#: latency-quantile staple the reference lacks.
_PERCENTILE_RE = re.compile(r"^p(\d{1,2}(?:\.\d+)?|100)$")


def percentile_fraction(name: str) -> float | None:
    """``p99.9`` → 0.999; None when ``name`` is not a percentile token."""
    m = _PERCENTILE_RE.match(name)
    return float(m.group(1)) / 100.0 if m else None


def validate_agg_func(name: str) -> str:
    if not isinstance(name, str):
        # null / number inside a function list — reject, don't TypeError
        raise QueryParseError(f"aggregate function must be a name, got {name!r}")
    if name not in AGG_FUNCS and percentile_fraction(name) is None:
        raise QueryParseError(f"unknown aggregate function {name!r}")
    return name


def make_value_filter(spec: dict) -> ValueFilter:
    kwargs = {}
    for op, val in spec.items():
        if op not in _FILTER_OPS:
            raise QueryParseError(f"unknown filter op {op!r}")
        try:
            kwargs[op] = float(val)
        except (TypeError, ValueError):
            raise QueryParseError(f"bad filter bound {val!r}") from None
    if not kwargs:
        raise QueryParseError("empty filter")
    return ValueFilter(**kwargs)
