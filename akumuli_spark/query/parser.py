"""JSON query language → :class:`akumuli_spark.query.plan.Query`.

Faithful re-implementation of the reference's parser surface
(/root/reference/libakumuli/query_processing/queryparser.cpp):

* query-kind dispatch on the first recognized key (queryparser.cpp:901-932)
* top-level field whitelist per kind — unknown fields are errors
  (queryparser.cpp:934-985)
* ``range`` semi-open, backward when from > to (queryparser.cpp:637-690)
* ``where`` map form / list form (queryparser.cpp:692-750)
* ``filter`` per-metric + shorthand + ALL/ANY combiner
  (queryparser.cpp:759-870)
* ``group-by-tag`` / ``pivot-by-tag`` (+ legacy ``group-by``)
  (queryparser.cpp:586-619)
* ``limit``/``offset`` — the documented intent, not the reference's broken
  offset (queryparser.cpp:632 stores offset into limit; Limiter::put never
  counts skipped rows — SURVEY.md §2.2)
* ``apply`` pipeline list (queryparser.cpp:2079-2113)
"""

from __future__ import annotations

from typing import Any

from akumuli_spark.query.errors import QueryParseError
from akumuli_spark.query.plan import (
    AGG_FUNCS,
    ApplyNode,
    FilterClause,
    GroupByOp,
    GroupByTag,
    OrderBy,
    Query,
    QueryKind,
    QueryRange,
    TagCombination,
    ValueFilter,
    WherePredicate,
    make_value_filter,
    parse_duration_ns,
    parse_timestamp_ns,
    validate_agg_func,
)

_KIND_KEYS = {
    "select-events": QueryKind.SELECT_EVENTS,
    "select": QueryKind.SELECT,
    "group-aggregate-join": QueryKind.GROUP_AGGREGATE_JOIN,
    "group-aggregate": QueryKind.GROUP_AGGREGATE,
    "aggregate": QueryKind.AGGREGATE,
    "join": QueryKind.JOIN,
}

_COMMON_FIELDS = {
    "range",
    "where",
    "filter",
    "order-by",
    "limit",
    "offset",
    "output",
    "apply",
    "group-by",
    "group-by-tag",
    "pivot-by-tag",
}

_ALLOWED_FIELDS = {
    QueryKind.SELECT: {"select"} | _COMMON_FIELDS,
    QueryKind.SELECT_EVENTS: {"select-events"} | _COMMON_FIELDS,
    QueryKind.AGGREGATE: {"aggregate"} | _COMMON_FIELDS,
    QueryKind.GROUP_AGGREGATE: {"group-aggregate"} | _COMMON_FIELDS,
    QueryKind.JOIN: {"join"} | _COMMON_FIELDS,
    QueryKind.GROUP_AGGREGATE_JOIN: {"group-aggregate-join"} | _COMMON_FIELDS,
}


def get_query_kind(query: dict) -> QueryKind:
    found = [kind for key, kind in _KIND_KEYS.items() if key in query]
    if not found:
        raise QueryParseError("query kind not found (expected one of "
                              + ", ".join(sorted(_KIND_KEYS)) + ")")
    if len(found) > 1:
        raise QueryParseError("ambiguous query: multiple query-kind fields")
    return found[0]


def _validate_fields(query: dict, kind: QueryKind) -> None:
    allowed = _ALLOWED_FIELDS[kind]
    for key in query:
        if key not in allowed:
            raise QueryParseError(f"unexpected field {key!r} in {kind.value} query")


def _parse_range(query: dict, kind: QueryKind) -> QueryRange:
    rng = query.get("range")
    if rng is None:
        # Only `aggregate` may omit the range (= whole retention,
        # queryparser.cpp:637-690).
        if kind is QueryKind.AGGREGATE:
            return QueryRange(begin_ns=0, end_ns=(1 << 63) - 1)
        raise QueryParseError("range field is required")
    if not isinstance(rng, dict) or "from" not in rng or "to" not in rng:
        raise QueryParseError("range must be {'from': ts, 'to': ts}")
    extra = set(rng) - {"from", "to"}
    if extra:
        raise QueryParseError(f"unexpected range fields {sorted(extra)}")
    return QueryRange(
        begin_ns=parse_timestamp_ns(rng["from"]), end_ns=parse_timestamp_ns(rng["to"])
    )


def _parse_where(query: dict) -> WherePredicate | None:
    where = query.get("where")
    if where is None:
        return None
    if isinstance(where, dict):
        # map form: AND across tags, OR within a tag's value list
        tags = []
        for tag, values in where.items():
            if isinstance(values, (list, tuple)):
                vals = tuple(str(v) for v in values)
            else:
                vals = (str(values),)
            if not vals:
                raise QueryParseError(f"empty value list for where tag {tag!r}")
            tags.append((str(tag), vals))
        return WherePredicate(combinations=(TagCombination(tags=tuple(tags)),))
    if isinstance(where, list):
        # list form: OR of exact tag combinations
        combos = []
        for entry in where:
            if not isinstance(entry, dict) or not entry:
                raise QueryParseError("where list entries must be non-empty objects")
            combos.append(
                TagCombination(
                    tags=tuple((str(t), (str(v),)) for t, v in entry.items())
                )
            )
        return WherePredicate(combinations=tuple(combos))
    raise QueryParseError("where must be an object or a list of objects")


def _parse_filter(query: dict, metrics: tuple[str, ...], kind: QueryKind,
                  funcs: tuple[str, ...] = ()) -> FilterClause | None:
    spec = query.get("filter")
    if spec is None:
        return None
    if not isinstance(spec, dict):
        raise QueryParseError("filter must be an object")
    spec = dict(spec)

    require_all = True
    combiner = spec.pop("=", None)
    if combiner is not None:
        req = combiner.get("require") if isinstance(combiner, dict) else combiner
        if req not in ("all", "any"):
            raise QueryParseError("filter '=' combiner requires 'all' or 'any'")
        require_all = req == "all"

    # For group-aggregate the filter keys are *function names* (HAVING on
    # output components — queryparser.cpp:1726-1738); otherwise metric names.
    valid_keys = set(funcs) if kind in (QueryKind.GROUP_AGGREGATE,
                                        QueryKind.GROUP_AGGREGATE_JOIN) else set(metrics)

    if spec and all(k in ("gt", "ge", "lt", "le") for k in spec):
        # shorthand form 2: one filter applied to the first metric/component
        key = funcs[0] if kind in (QueryKind.GROUP_AGGREGATE,
                                   QueryKind.GROUP_AGGREGATE_JOIN) else metrics[0]
        return FilterClause(by_key=((key, make_value_filter(spec)),),
                            require_all=require_all)

    by_key = []
    for key, sub in spec.items():
        if key not in valid_keys:
            raise QueryParseError(f"filter key {key!r} doesn't match any "
                                  f"{'function' if funcs else 'metric'} in the query")
        if not isinstance(sub, dict):
            raise QueryParseError(f"filter for {key!r} must be an object")
        by_key.append((key, make_value_filter(sub)))
    if not by_key:
        raise QueryParseError("empty filter")
    return FilterClause(by_key=tuple(by_key), require_all=require_all)


def _parse_group_by(query: dict) -> GroupByTag | None:
    present = [k for k in ("group-by-tag", "pivot-by-tag", "group-by") if k in query]
    if not present:
        return None
    if len(present) > 1:
        raise QueryParseError("only one of group-by-tag/pivot-by-tag allowed")
    key = present[0]
    raw = query[key]
    if key == "group-by":
        # legacy form {"group-by": {"tag": [...]}} ⇒ pivot semantics
        # (queryparser.cpp:586-619: legacy group-by keeps only listed tags)
        if isinstance(raw, dict) and "tag" in raw:
            raw = raw["tag"]
        op = GroupByOp.PIVOT
    else:
        op = GroupByOp.GROUP if key == "group-by-tag" else GroupByOp.PIVOT
    if isinstance(raw, str):
        tags = (raw,)
    elif isinstance(raw, (list, tuple)):
        tags = tuple(str(t) for t in raw)
    else:
        # null / number / object — reject, don't TypeError (totality)
        raise QueryParseError(f"{key} must be a tag name or list of tag names")
    if not tags:
        raise QueryParseError(f"{key} requires at least one tag")
    return GroupByTag(op=op, tags=tags)


def _parse_order_by(query: dict) -> OrderBy:
    raw = query.get("order-by", "time")
    try:
        return OrderBy(raw)
    except ValueError:
        raise QueryParseError(f"order-by must be 'time' or 'series', got {raw!r}") from None


def _parse_limit_offset(query: dict) -> tuple[int | None, int | None]:
    out = []
    for key in ("limit", "offset"):
        raw = query.get(key)
        if raw is None:
            out.append(None)
            continue
        try:
            val = int(raw)
        except (TypeError, ValueError):
            raise QueryParseError(f"{key} must be an integer") from None
        if val < 0:
            raise QueryParseError(f"{key} must be non-negative")
        out.append(val)
    return out[0], out[1]


def _parse_apply(query: dict) -> tuple[ApplyNode, ...]:
    raw = query.get("apply", [])
    if isinstance(raw, dict):
        raw = [raw]
    if not isinstance(raw, list):
        raise QueryParseError("apply must be a list of node objects")
    nodes = []
    for entry in raw:
        if not isinstance(entry, dict) or "name" not in entry:
            raise QueryParseError("apply node requires a 'name'")
        params = tuple(
            (k, tuple(v) if isinstance(v, list) else v)
            for k, v in entry.items()
            if k != "name"
        )
        nodes.append(ApplyNode(name=str(entry["name"]), params=params))
    return tuple(nodes)


def _metric_list(raw: Any, field: str) -> tuple[str, ...]:
    if isinstance(raw, str):
        return (raw,)
    if isinstance(raw, list) and raw and all(isinstance(m, str) for m in raw):
        return tuple(raw)
    raise QueryParseError(f"{field} must be a metric name or list of names")


def parse_query(query: dict) -> Query:
    """Parse one JSON query (already decoded) into a :class:`Query`."""
    if not isinstance(query, dict):
        raise QueryParseError("query must be a JSON object")
    kind = get_query_kind(query)
    _validate_fields(query, kind)
    rng = _parse_range(query, kind)
    where = _parse_where(query)
    group_by = _parse_group_by(query)
    order_by = _parse_order_by(query)
    limit, offset = _parse_limit_offset(query)
    apply_nodes = _parse_apply(query)

    metrics: tuple[str, ...]
    agg_funcs: tuple[tuple[str, tuple[str, ...]], ...] = ()
    step_ns = None
    event_regex = None

    if kind is QueryKind.SELECT:
        metrics = _metric_list(query["select"], "select")
        if len(metrics) != 1:
            raise QueryParseError("select takes exactly one metric")
        filt = _parse_filter(query, metrics, kind)

    elif kind is QueryKind.SELECT_EVENTS:
        metrics = _metric_list(query["select-events"], "select-events")
        if len(metrics) != 1 or not metrics[0].startswith("!"):
            raise QueryParseError("select-events takes one event metric ('!name')")
        # the filter field is a body regex here (queryparser.cpp:1357-1445)
        raw_filter = query.get("filter")
        if raw_filter is not None:
            if not isinstance(raw_filter, str):
                raise QueryParseError("select-events filter must be a regex string")
            event_regex = raw_filter
        filt = None

    elif kind is QueryKind.AGGREGATE:
        # parse_aggregate_query never reads order-by and hard-sets
        # OrderBy::SERIES (queryparser.cpp:1569) — a user-supplied value is
        # silently ignored, so limit/offset select the same rows as the
        # reference.
        order_by = OrderBy.SERIES
        spec = query["aggregate"]
        if not isinstance(spec, dict) or not spec:
            raise QueryParseError("aggregate must map metric → function")
        metrics = tuple(spec.keys())
        pairs = []
        for metric, fn in spec.items():
            if isinstance(fn, str):
                fns = (fn,)
            elif isinstance(fn, (list, tuple)):
                fns = tuple(fn)
            else:
                # null / number / object — reject, don't TypeError
                raise QueryParseError(
                    f"aggregate function for {metric!r} must be a name "
                    "or list of names"
                )
            pairs.append((metric, tuple(validate_agg_func(f) for f in fns)))
        agg_funcs = tuple(pairs)
        filt = _parse_filter(query, metrics, kind)

    elif kind in (QueryKind.GROUP_AGGREGATE, QueryKind.GROUP_AGGREGATE_JOIN):
        spec = query[kind.value]
        if not isinstance(spec, dict):
            raise QueryParseError(f"{kind.value} must be an object")
        for req in ("metric", "step", "func"):
            if req not in spec:
                raise QueryParseError(f"{kind.value} requires '{req}'")
        metrics = _metric_list(spec["metric"], f"{kind.value}.metric")
        step_ns = parse_duration_ns(spec["step"])
        if step_ns <= 0:
            raise QueryParseError("step must be positive")
        fns = spec["func"]
        fns = (fns,) if isinstance(fns, str) else tuple(fns)
        funcs = tuple(validate_agg_func(f) for f in fns)
        if kind is QueryKind.GROUP_AGGREGATE_JOIN and len(funcs) != 1:
            raise QueryParseError("group-aggregate-join takes exactly one function")
        agg_funcs = (("*", funcs),)
        filt = _parse_filter(query, metrics, kind, funcs=funcs)

    elif kind is QueryKind.JOIN:
        metrics = _metric_list(query["join"], "join")
        if len(metrics) < 2:
            raise QueryParseError("join requires at least two metrics")
        filt = _parse_filter(query, metrics, kind)

    else:  # pragma: no cover
        raise QueryParseError(f"unhandled kind {kind}")

    return Query(
        kind=kind,
        metrics=metrics,
        range=rng,
        agg_funcs=agg_funcs,
        step_ns=step_ns,
        where=where,
        filter=filt,
        group_by=group_by,
        order_by=order_by,
        limit=limit,
        offset=offset,
        apply=apply_nodes,
        event_regex=event_regex,
    )
