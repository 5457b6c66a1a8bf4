"""Gap filling and per-bucket ranking over bucketed series frames.

Extension operators beside the reference surface: Akumuli's
`group-aggregate` emits only non-empty buckets (nbtree.cpp:1228-1257
iterates real samples; an empty bucket produces no row), and its `top`
token ranks series over the WHOLE range (time-weighted integral,
apply.py:701).  Every dashboard TSDB grew the two missing shapes:

* :func:`fill_gaps` — complete each series' interior bucket spine and
  carry the previous bucket forward (``mode="previous"``) or insert
  explicit NULL rows (``mode="null"``).  Operates on the
  already-aggregated frame, so its cost is proportional to the bucket
  spine, never to raw samples.
* :func:`top_series_per_bucket` — top-k series per time bucket (the
  per-window ranking the range-global `top` cannot express).

Both take the frame produced by the engine's group-aggregate: columns
``series``, ``ts_ns`` (first-sample timestamp, begin-anchored
bucketing) plus one value column per aggregate.  Buckets are re-derived
via ``(ts_ns - anchor) div step`` — first-sample timestamps differ
across series within one bucket and so cannot key a join or ranking
directly; the div collapses them to the shared bucket ordinal.

Scale shape: both operators are one hash shuffle on their key (series
for the fill window, bucket for the ranking window) over the
*aggregated* frame — upstream bucket aggregation has already collapsed
raw samples, so the windows run over |series|×|buckets| rows at most.
The spine join is a series-keyed equi-join between two frames derived
from the same aggregate; no crossJoin, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_FILL_MODES = ("previous", "null")


def _bucket_expr(anchor_ns: int, step_ns: int):
    # Integer div, never float: ns timestamps (~1.7e18) exceed double's
    # 2^53 integer range, so floor((ts-a)/s) through a double would
    # mis-bucket.  Engine range semantics give ts_ns >= anchor, where
    # truncating div == floor div.
    return F.expr(f"(ts_ns - {anchor_ns}L) div {step_ns}L")


def fill_gaps(agg: DataFrame, anchor_ns: int, step_ns: int,
              mode: str = "previous") -> DataFrame:
    """Complete interior bucket gaps per series.

    For each series, buckets between its first and last non-empty bucket
    that have no row get one synthesized row: timestamp = bucket begin
    (``anchor + b*step`` — real buckets keep their first-sample ts), and
    values carried forward from the nearest earlier non-empty bucket
    (``mode="previous"``) or NULL (``mode="null"``).  Nothing is
    invented outside a series' own support — leading/trailing silence
    stays silent, matching the dashboard fill() contract.

    Value columns are every column except ``series``/``ts_ns``; a
    multi-func group-aggregate frame fills all its aggregates at once.
    """
    if mode not in _FILL_MODES:
        raise ValueError(
            f"unknown fill mode {mode!r}: expected one of {_FILL_MODES}")
    value_cols = [c for c in agg.columns if c not in ("series", "ts_ns")]
    rows = agg.withColumn("__b", _bucket_expr(anchor_ns, step_ns))
    spans = rows.groupBy("series").agg(
        F.min("__b").alias("__b0"), F.max("__b").alias("__b1"))
    spine = spans.select(
        "series", F.explode(F.sequence("__b0", "__b1")).alias("__b"))
    joined = spine.join(rows, ["series", "__b"], "left")
    ts = F.coalesce(
        F.col("ts_ns"),
        (F.lit(anchor_ns) + F.col("__b") * F.lit(step_ns)).cast("long"),
    ).alias("ts_ns")
    if mode == "previous":
        w = (Window.partitionBy("series").orderBy("__b")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        vals = [F.last(F.col(f"`{c}`"), ignorenulls=True).over(w).alias(c)
                for c in value_cols]
    else:
        vals = [F.col(f"`{c}`") for c in value_cols]
    return joined.select("series", ts, *vals)


def fill_gaps_sql(inner_sql: str, anchor_ns: int, step_ns: int,
                  value_cols: list[str]) -> str:
    """DuckDB twin of :func:`fill_gaps` (mode="previous") wrapped around
    ``inner_sql`` (the bucket-aggregate query; a leading WITH clause is
    fine — it nests inside the CTE parentheses)."""
    quoted = [f'"{c}"' for c in value_cols]
    carried = ", ".join(
        f'last_value({q} IGNORE NULLS) OVER w AS {q}' for q in quoted)
    return f"""
WITH __agg AS (
{inner_sql}
),
__rows AS (
  SELECT series, ts_ns, {", ".join(quoted)},
         (ts_ns - {anchor_ns}) // {step_ns} AS b
  FROM __agg
),
__spine AS (
  SELECT series, unnest(generate_series(min(b), max(b))) AS b
  FROM __rows GROUP BY series
),
__joined AS (
  SELECT s.series, s.b,
         coalesce(r.ts_ns, {anchor_ns} + s.b * {step_ns})::BIGINT AS ts_ns,
         {", ".join(f"r.{q} AS {q}" for q in quoted)}
  FROM __spine s LEFT JOIN __rows r ON s.series = r.series AND s.b = r.b
)
SELECT series, ts_ns, {carried}
FROM __joined
WINDOW w AS (PARTITION BY series ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""".strip()


def top_series_per_bucket(agg: DataFrame, anchor_ns: int, step_ns: int,
                          k: int, value_col: str) -> DataFrame:
    """Top-``k`` series per time bucket by ``value_col``, descending;
    ties break on the series string ascending (deterministic, mirrored
    in the oracle).  Output timestamps are the bucket BEGIN — unlike the
    fill operator there is no per-series row to preserve a first-sample
    ts on: the row represents the bucket's ranking slot, not a sample.

    ``rank`` is 1-based and cast long (DuckDB's row_number is BIGINT;
    keeping the schemas identical keeps the driver's hash comparable).
    """
    ranked = agg.withColumn("__b", _bucket_expr(anchor_ns, step_ns))
    w = Window.partitionBy("__b").orderBy(
        F.col(f"`{value_col}`").desc(), F.col("series"))
    return (
        ranked.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            (F.lit(anchor_ns) + F.col("__b") * F.lit(step_ns))
            .cast("long").alias("ts_ns"),
            "series", f"`{value_col}`", "rank",
        )
    )


def top_series_per_bucket_sql(inner_sql: str, anchor_ns: int, step_ns: int,
                              k: int, value_col: str) -> str:
    """DuckDB twin of :func:`top_series_per_bucket`."""
    q = f'"{value_col}"'
    return f"""
WITH __agg AS (
{inner_sql}
),
__ranked AS (
  SELECT series, (ts_ns - {anchor_ns}) // {step_ns} AS b, {q},
         row_number() OVER (
           PARTITION BY (ts_ns - {anchor_ns}) // {step_ns}
           ORDER BY {q} DESC, series
         ) AS "rank"
  FROM __agg
)
SELECT ({anchor_ns} + b * {step_ns})::BIGINT AS ts_ns, series, {q}, "rank"
FROM __ranked
WHERE "rank" <= {k}
""".strip()
