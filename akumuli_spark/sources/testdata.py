"""Loaders + series-model views over the driver's parquet testdata.

The driver generates TPC-H-ish tables (TESTDATA.md).  Per FIXTURES.md §4 we
adapt them to the reference's series model so every Akumuli-class operator
can be exercised — and hash-checked against a DuckDB oracle — at real data
volume:

* ``metrics`` view (from ``lineitem``): three metrics
  ``lineitem.price|qty|disc`` (unpivoted value columns), tags
  ``{linestatus, returnflag}``, ``ts_ns`` from ``l_shipdate``.
* ``app_metrics`` view (from ``events``): metric ``app.<event_type>``,
  tag ``user = user_id % 8``, µs-resolution timestamps on the int64-ns
  axis, irregular spacing (good for rate / time-weighted operators).
* ``evt`` view (from ``events``): Akumuli string events — metric
  ``!<event_type>``, body = ``props`` JSON string.

Each view has a twin ``*_SQL`` constant: the equivalent DuckDB SQL used as
a CTE prefix in ``oracle_sql()`` entries.  Keeping both definitions in one
module is what keeps the Spark plan and the oracle in lockstep.

Scale note: the views are narrow projections + a 3-way unpivot; Catalyst
pushes metric/tag/time filters through them to the parquet scan, so at
100 TB a query touching one metric with a time range reads only the
pruned row groups, never the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_engine_confs(spark: SparkSession) -> None:
    """Make a caller-provided session safe for the engine (the driver runs
    ``entry(spark)`` with its own session):

    * ``nanosAsLong`` — if events.parquet carries TIMESTAMP(NANOS) (one of
      the two schemas the driver has generated) a vanilla Spark 4 session
      refuses to read it (PARQUET_TYPE_ILLEGAL); with the flag it arrives
      as long ns.  Harmless no-op for TIMESTAMP(MICROS) data.
    * UTC session time — TIMESTAMP_NTZ→TIMESTAMP casts (ts_ns derivation)
      are interpreted in session-local time, and the DuckDB oracle is
      UTC-naive.

    Both are runtime-settable SQL confs.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_engine_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ts_ns_from_ntz(col):
    # l_shipdate/o_orderdate are parquet TIMESTAMP(MILLIS/MICROS) → Spark
    # TIMESTAMP_NTZ.  Session TZ is UTC, so casting NTZ→TIMESTAMP then
    # unix_micros is exact.
    return F.unix_micros(col.cast("timestamp")) * F.lit(1000)


_TS_MAX = (1 << 63) - 1


def _src_ts_range_pred(df: DataFrame, colname: str, lo_ns: int, hi_ns: int):
    """Pushdown-friendly time-range predicate on the RAW source timestamp
    column, exactly equivalent to ``lo_ns <= ts_ns < hi_ns`` over the
    µs-truncated int64-ns axis the views derive.

    The views compute ``ts_ns`` with ``unix_micros(cast(..))*1000`` (NTZ
    route) or ``(ts div 1000)*1000`` (raw-ns route) — expressions Catalyst
    cannot push through to the parquet scan, so the engine's range filter
    alone never reaches ``PushedFilters`` and row-group min/max skipping is
    lost.  An attribute-level comparison on the source column IS pushable;
    since the conversions are monotone and µs-exact, the ns bounds map to
    exact source-column bounds:

    * NTZ micros: ``ts_ns >= lo  ⟺  unix_micros >= ceil(lo/1000)``,
      ``ts_ns < hi  ⟺  unix_micros < ceil(hi/1000)``;
    * raw int64 ns (non-negative): the same with a final ``*1000``.

    Unbounded sides (no-range queries) emit no predicate.  The engine's
    exact ``ts_ns`` filter stays in the plan, so even a hypothetical slack
    bound could only re-admit rows the engine filter removes — results are
    unchanged by construction.
    """
    preds = []
    dtype = dict(df.dtypes).get(colname, "")
    if dtype in ("bigint", "long"):
        if lo_ns > 0:
            preds.append(F.col(colname) >= F.lit(((lo_ns + 999) // 1000) * 1000))
        if hi_ns < _TS_MAX:
            preds.append(F.col(colname) < F.lit(((hi_ns + 999) // 1000) * 1000))
    else:
        if lo_ns > 0:
            preds.append(
                F.col(colname)
                >= F.timestamp_micros(F.lit((lo_ns + 999) // 1000)).cast("timestamp_ntz")
            )
        if hi_ns < _TS_MAX:
            preds.append(
                F.col(colname)
                < F.timestamp_micros(F.lit((hi_ns + 999) // 1000)).cast("timestamp_ntz")
            )
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def ts_ns_expr(df: DataFrame, colname: str = "ts"):
    """int64-ns expression for a timestamp column, robust to both schemas
    the driver has generated for ``events.ts``:

    * parquet TIMESTAMP(NANOS) read as **long ns** (``nanosAsLong``) —
      truncated to µs here because DuckDB's TIMESTAMP is µs-resolution;
    * parquet TIMESTAMP(MICROS) read as **TIMESTAMP_NTZ** — converted via
      unix_micros under the UTC session TZ.

    Either way the result is µs-truncated int64 ns, identical to the
    oracle's ``epoch_ns(ts)``."""
    dtype = dict(df.dtypes).get(colname, "")
    if dtype in ("bigint", "long"):
        return F.expr(f"({colname} div 1000) * 1000")
    return _ts_ns_from_ntz(F.col(colname))


# ---------------------------------------------------------------------------
# metrics view: lineitem → 3 metrics keyed by (linestatus, returnflag)
# ---------------------------------------------------------------------------

LINEITEM_METRICS = {
    "lineitem.price": "l_extendedprice",
    "lineitem.qty": "l_quantity",
    "lineitem.disc": "l_discount",
}


def metrics_view(spark: SparkSession, sf_dir: str,
                 ns_range: tuple[int, int] | None = None) -> DataFrame:
    """Unpivot as a UNION ALL of per-metric branches (NOT stack()): each
    branch carries its metric name as a literal, so a query's metric
    predicate constant-folds to false on the other branches and Catalyst
    prunes their scans entirely — with stack() the filter lands above the
    generator and every branch is read.

    ``ns_range`` (semi-open [lo, hi) on the ts_ns axis) pre-filters the
    base table on the RAW timestamp column — the storage analogue of the
    reference opening its scan at [begin, end) — so the range reaches
    ``PushedFilters`` and parquet row groups outside it are skipped (see
    :func:`_src_ts_range_pred`; the engine's exact ts_ns filter remains)."""
    li = load_table(spark, sf_dir, "lineitem")
    if ns_range is not None:
        pred = _src_ts_range_pred(li, "l_shipdate", *ns_range)
        if pred is not None:
            li = li.filter(pred)
    ts_ns = _ts_ns_from_ntz(F.col("l_shipdate"))
    tags = F.create_map(
        F.lit("linestatus"), F.col("l_linestatus"), F.lit("returnflag"), F.col("l_returnflag")
    )
    branches = []
    for metric, valcol in LINEITEM_METRICS.items():
        branches.append(
            li.select(
                F.concat(
                    F.lit(metric),
                    F.lit(" linestatus="),
                    F.col("l_linestatus"),
                    F.lit(" returnflag="),
                    F.col("l_returnflag"),
                ).alias("series"),
                F.lit(metric).alias("metric"),
                tags.alias("tags"),
                ts_ns.alias("ts_ns"),
                F.col(valcol).cast("double").alias("value"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


METRICS_SQL = """
metrics AS (
  SELECT u.metric || ' linestatus=' || l_linestatus || ' returnflag=' || l_returnflag AS series,
         u.metric AS metric,
         l_linestatus AS tag_linestatus,
         l_returnflag AS tag_returnflag,
         epoch_ns(l_shipdate) AS ts_ns,
         u.value AS value
  FROM lineitem,
  LATERAL (VALUES ('lineitem.price', l_extendedprice),
                  ('lineitem.qty',   l_quantity),
                  ('lineitem.disc',  l_discount)) AS u(metric, value)
)
""".strip()


# ---------------------------------------------------------------------------
# app_metrics view: events → numeric series at native ns resolution
# ---------------------------------------------------------------------------


def app_metrics_view(spark: SparkSession, sf_dir: str,
                     ns_range: tuple[int, int] | None = None) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    if ns_range is not None:
        pred = _src_ts_range_pred(ev, "ts", *ns_range)
        if pred is not None:
            ev = ev.filter(pred)
    user = (F.col("user_id") % 8).cast("string")
    metric = F.concat(F.lit("app."), F.col("event_type"))
    ts_ns = ts_ns_expr(ev)
    return ev.select(
        F.concat(metric, F.lit(" user="), user).alias("series"),
        metric.alias("metric"),
        F.create_map(F.lit("user"), user).alias("tags"),
        ts_ns.alias("ts_ns"),
        F.col("value").cast("double").alias("value"),
    )


APP_METRICS_SQL = """
app_metrics AS (
  SELECT 'app.' || event_type || ' user=' || CAST(user_id % 8 AS VARCHAR) AS series,
         'app.' || event_type AS metric,
         CAST(user_id % 8 AS VARCHAR) AS tag_user,
         epoch_ns(ts) AS ts_ns,
         value AS value
  FROM events
)
""".strip()


# ---------------------------------------------------------------------------
# evt view: events → Akumuli string events (metric starts with '!')
# ---------------------------------------------------------------------------


def events_view(spark: SparkSession, sf_dir: str,
                ns_range: tuple[int, int] | None = None) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    if ns_range is not None:
        pred = _src_ts_range_pred(ev, "ts", *ns_range)
        if pred is not None:
            ev = ev.filter(pred)
    user = (F.col("user_id") % 8).cast("string")
    metric = F.concat(F.lit("!"), F.col("event_type"))
    return ev.select(
        F.concat(metric, F.lit(" user="), user).alias("series"),
        metric.alias("metric"),
        F.create_map(F.lit("user"), user).alias("tags"),
        ts_ns_expr(ev).alias("ts_ns"),
        F.col("props").alias("body"),
    )


EVENTS_SQL = """
evt AS (
  SELECT '!' || event_type || ' user=' || CAST(user_id % 8 AS VARCHAR) AS series,
         '!' || event_type AS metric,
         CAST(user_id % 8 AS VARCHAR) AS tag_user,
         epoch_ns(ts) AS ts_ns,
         props AS body
  FROM events
)
""".strip()


def series_dim(metrics: DataFrame) -> DataFrame:
    """Distinct series dimension (for search/suggest), derived from a
    metrics or events frame — the analogue of the reference's series
    index (/root/reference/libakumuli/index/seriesparser.h:74-140).

    dropDuplicates on the series key (not distinct()) because MapType
    columns aren't set-comparable; the canonical name determines the tag
    map anyway."""
    return metrics.select("series", "metric", "tags").dropDuplicates(["series"])
