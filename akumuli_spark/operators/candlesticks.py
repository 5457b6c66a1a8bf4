"""Candlesticks — per-pixel OHLC downsampling for plotting.

The reference exposes this as an internal NB+tree operator
(/root/reference/libakumuli/storage_engine/nbtree.h:218-219,423 —
"aggregate per screen pixel", not reachable through the JSON API).  Here
it is a thin composition over the group-aggregate machinery: the step is
``(to - from) / n_pixels`` and the tuple is (open, high, low, close,
count) = (first, max, min, last, count) — one hash aggregation, same
scale shape as any group-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from akumuli_spark.query.engine import execute_query
from akumuli_spark.query.errors import QueryValidationError


def candlesticks(
    spark: SparkSession,
    metrics: DataFrame,
    metric: str,
    begin_ns: int,
    end_ns: int,
    n_pixels: int,
    where: dict | None = None,
) -> DataFrame:
    """OHLC frame: one row per (series, pixel bucket) with columns
    open/high/low/close/count; ts = the first sample's timestamp in the
    pixel (AggregationResult::_begin, like any group-aggregate)."""
    if n_pixels <= 0:
        raise QueryValidationError("n_pixels must be positive")
    span = end_ns - begin_ns if end_ns >= begin_ns else begin_ns - end_ns
    step_ns = max(1, span // n_pixels)
    query = {
        "group-aggregate": {
            "metric": metric,
            "step": step_ns,
            "func": ["first", "max", "min", "last", "count"],
        },
        "range": {"from": begin_ns, "to": end_ns},
    }
    if where:
        query["where"] = where
    out = execute_query(spark, query, metrics)
    return out.select(
        "series",
        "ts_ns",
        out["first"].alias("open"),
        out["max"].alias("high"),
        out["min"].alias("low"),
        out["last"].alias("close"),
        out["count"].alias("count"),
    )
