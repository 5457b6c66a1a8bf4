"""As-of join: align two metrics on *nearest-preceding* timestamp.

Extension beside the reference surface: Akumuli's `join` aligns
components on EXACT timestamps only (operators/join.cpp:1-109 zips
per-series iterators on ts equality), which is the right contract for
co-sampled metrics but yields all-NULL columns for independently sampled
streams.  Every trading/TSDB stack grew the as-of variant: for each left
sample at ``ts``, attach the most recent right sample at ``ts' <= ts``
(optionally within a tolerance window).

Semantics (mirrored exactly by the DuckDB ``ASOF LEFT JOIN`` oracle):

* alignment key is the tag-set (like the engine's join — components of
  one logical series share tags, differ in metric);
* duplicate samples of one (tagset, ts) are combined with SUM *before*
  alignment — the engine join's documented dup rule, and what makes the
  nearest-preceding match deterministic;
* a right sample at exactly ``ts`` matches (``ts' <= ts``);
* left rows with no preceding right sample (or none within
  ``tolerance_ns``) keep a NULL right column — ASOF **LEFT** join.

Scale shape — this is the part that matters at 100 TB.  The textbook
implementation is a union + carry-forward window partitioned by tagset;
with few tagsets that serializes the whole stream through a handful of
tasks.  Instead the scan is split on ``(tagset, time-chunk)``:

1. one window per (tagset, chunk) carries the latest right state
   within the chunk — parallelism = tagsets × chunks, data never leaves
   its chunk;
2. the per-chunk *boundary states* (one row per (tagset, chunk) — the
   chunk's last right sample) form a frame ~|keys| in size; a second
   window over that tiny frame prefix-carries state across chunks;
3. the carry-in joins back on (tagset, chunk) — same key the data is
   already hashed by, and the carry frame is broadcast-sized.

The result is chunk-count invariant (tests vary ``chunk_ns``), so the
chunk width is purely a parallelism knob: size it so one chunk of one
tagset fits a task comfortably (default 1 day of ns, matching the
storage layout's partition bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from akumuli_spark.materialize import corpus_checkpoint

from akumuli_spark.query.errors import QueryValidationError

DAY_NS = 86_400 * 10**9


def _tagstr() -> F.Column:
    # tag part of the series string ("" when the series has no tags)
    return F.when(
        F.instr(F.col("series"), " ") > 0,
        F.expr("substring(series, instr(series, ' ') + 1)"),
    ).otherwise(F.lit(""))


def _series_name(left_metric: str, right_metric: str) -> F.Column:
    head = f"{left_metric}|{right_metric}"
    return F.when(F.col("tagstr") == "", F.lit(head)).otherwise(
        F.concat(F.lit(head + " "), F.col("tagstr"))
    )


def asof_join(
    metrics: DataFrame,
    left_metric: str,
    right_metric: str,
    begin_ns: int,
    end_ns: int,
    tolerance_ns: int | None = None,
    chunk_ns: int = DAY_NS,
) -> DataFrame:
    """Nearest-preceding alignment of ``right_metric`` onto
    ``left_metric`` over ``[begin_ns, end_ns)``.

    Output: ``series`` (``left|right tags``, the join naming rule),
    ``ts_ns`` (the left sample's), one column per metric.  The right
    column is NULL when no right sample precedes the left one (within
    ``tolerance_ns`` when given).
    """
    if end_ns <= begin_ns:
        raise QueryValidationError("as-of join range must be forward")
    if chunk_ns <= 0:
        raise QueryValidationError("chunk_ns must be positive")
    if tolerance_ns is not None and tolerance_ns <= 0:
        raise QueryValidationError("tolerance_ns must be positive")

    base = metrics.filter(
        F.col("metric").isin([left_metric, right_metric])
        & (F.col("ts_ns") >= begin_ns)
        & (F.col("ts_ns") < end_ns)
    ).withColumn("tagstr", _tagstr())
    # SUM-combine duplicates per (tagset, ts) BEFORE alignment (join.cpp
    # dup rule) — also what makes "the" preceding right sample unique.
    def side(metric: str, name: str) -> DataFrame:
        return (
            base.filter(F.col("metric") == metric)
            .groupBy("tagstr", "ts_ns")
            .agg(F.sum("value").alias(name))
        )

    left = side(left_metric, "__lv")
    right = side(right_metric, "__rv")

    chunk = F.expr(f"(ts_ns - {begin_ns}L) div {chunk_ns}L").alias("__chunk")
    # Union with a side marker; right sorts before left at equal ts so a
    # same-ts right sample is visible to the left row (ts' <= ts).
    # Materialized once: unioned feeds the phase-1 window, the chunk
    # spine, AND (via __rstate below) the boundary states — left lazy,
    # each consumer re-executed both sides' scan + SUM-combine (five
    # scans of the metrics frame in the pre-r14 plan).  The frame is the
    # combined per-(tagset, ts) stream — the operator's own working set,
    # already headed into the (tagstr, __chunk) shuffle.
    unioned = left.select(
        "tagstr", "ts_ns", chunk, F.lit(1).alias("__side"), "__lv",
        F.lit(None).cast("struct<rts:bigint,rv:double>").alias("__rstate"),
    ).unionByName(
        right.select(
            "tagstr", "ts_ns", chunk, F.lit(0).alias("__side"),
            F.lit(None).cast("double").alias("__lv"),
            F.struct(
                F.col("ts_ns").alias("rts"), F.col("__rv").alias("rv")
            ).alias("__rstate"),
        )
    )
    unioned = corpus_checkpoint(unioned)

    # Phase 1: carry the latest right state WITHIN each (tagset, chunk).
    w_in = (
        Window.partitionBy("tagstr", "__chunk")
        .orderBy("ts_ns", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__carry", F.last("__rstate", ignorenulls=True).over(w_in)
    )

    # Phase 2: per-chunk boundary states (tiny frame: one row per key),
    # prefix-carried across chunks.  max(struct) picks the chunk's last
    # right sample (ts is unique per (tagset, ts) after the SUM combine).
    # derived from the materialized union's right rows — __rstate IS
    # struct(rts=ts_ns, rv), so max(__rstate) picks the same chunk-last
    # sample the old re-scan of the right side computed
    boundaries = (
        unioned.filter(F.col("__side") == 0)
        .groupBy("tagstr", "__chunk")
        .agg(F.max("__rstate").alias("__bstate"))
    )
    spine = unioned.select("tagstr", "__chunk").distinct()
    w_prev = (
        Window.partitionBy("tagstr")
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = (
        spine.join(boundaries, ["tagstr", "__chunk"], "left")
        .withColumn("__carry_in", F.last("__bstate", ignorenulls=True).over(w_prev))
        .select("tagstr", "__chunk", "__carry_in")
    )

    # Join back on the keys phase 1 already hashed by; the carry frame is
    # ~|tagsets × chunks| rows — AQE broadcasts it.
    joined = carried.join(carry_in, ["tagstr", "__chunk"], "left")
    state = F.coalesce(F.col("__carry"), F.col("__carry_in"))
    rv = state["rv"]
    if tolerance_ns is not None:
        rv = F.when(F.col("ts_ns") - state["rts"] <= tolerance_ns, rv)

    return (
        joined.filter(F.col("__side") == 1)
        .select(
            _series_name(left_metric, right_metric).alias("series"),
            "ts_ns",
            F.col("__lv").alias(left_metric),
            rv.alias(right_metric),
        )
    )


def asof_join_sql(
    view_sql: str,
    view_name: str,
    left_metric: str,
    right_metric: str,
    begin_ns: int,
    end_ns: int,
    tolerance_ns: int | None = None,
) -> str:
    """DuckDB twin: genuine ``ASOF LEFT JOIN`` over the same pre-combined
    sides — an independent engine implementation of the same contract,
    not a re-statement of the Spark plan."""
    head = f"{left_metric}|{right_metric}"
    tol = (
        f"CASE WHEN l.ts_ns - r.ts_ns <= {tolerance_ns} THEN r.__rv END"
        if tolerance_ns is not None else "r.__rv"
    )
    return f"""
WITH {view_sql},
__sides AS (
  SELECT CASE WHEN instr(series, ' ') > 0
              THEN substring(series, instr(series, ' ') + 1)
              ELSE '' END AS tagstr,
         metric, ts_ns, value
  FROM {view_name}
  WHERE metric IN ('{left_metric}', '{right_metric}')
    AND ts_ns >= {begin_ns} AND ts_ns < {end_ns}
),
__l AS (
  SELECT tagstr, ts_ns, sum(value) AS __lv FROM __sides
  WHERE metric = '{left_metric}' GROUP BY 1, 2
),
__r AS (
  SELECT tagstr, ts_ns, sum(value) AS __rv FROM __sides
  WHERE metric = '{right_metric}' GROUP BY 1, 2
)
SELECT CASE WHEN l.tagstr = '' THEN '{head}'
            ELSE '{head} ' || l.tagstr END AS series,
       l.ts_ns,
       l.__lv AS "{left_metric}",
       {tol} AS "{right_metric}"
FROM __l l ASOF LEFT JOIN __r r
  ON l.tagstr = r.tagstr AND r.ts_ns <= l.ts_ns
""".strip()
