"""Value-distribution operators over the series frame.

Extensions beside the reference surface (its aggregates are the 11
scalar funcs of operator.h:20-32; no distribution shapes):

* :func:`value_histogram` — per-series fixed-width bin counts over a
  value range: the dashboard heatmap / latency-distribution primitive.
* :func:`metrics_correlation` — per-tagset Pearson correlation between
  two metrics on exactly-aligned samples (the engine join's alignment
  rule), computed FROM SHARED SUMS — n, Σx, Σy, Σxy, Σx², Σy² — with
  the closed formula applied identically on both engines, so the result
  is reproducible cross-engine where built-in corr() implementations
  (Welford vs naive, different association) are not.

Scale shape: both are single hash aggregations over the scanned range —
histogram on (series, bin), correlation on the tag-set — with partial
(map-side) aggregation; no windows, no joins on the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from akumuli_spark.query.errors import QueryValidationError


def value_histogram(
    metrics: DataFrame,
    metric: str,
    begin_ns: int,
    end_ns: int,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Per-series histogram of ``value`` over ``[lo, hi)`` in ``n_bins``
    equal bins; samples outside the value range are dropped (the
    heatmap contract — out-of-range is the caller's filter decision).
    Output: series, bin (0-based long), bin_lo (the bin's left edge),
    count.  Empty bins are omitted (same economics as group-aggregate's
    empty buckets; compose with operators.fill for dense output)."""
    if end_ns <= begin_ns:
        raise QueryValidationError("value_histogram range must be forward")
    if not (hi > lo) or n_bins <= 0:
        raise QueryValidationError("need hi > lo and n_bins > 0")
    width = (hi - lo) / n_bins
    base = metrics.filter(
        (F.col("metric") == metric)
        & (F.col("ts_ns") >= begin_ns) & (F.col("ts_ns") < end_ns)
        & (F.col("value") >= lo) & (F.col("value") < hi)
    )
    bin_ = F.floor((F.col("value") - F.lit(lo)) / F.lit(width)).cast("long")
    return (
        base.groupBy("series", bin_.alias("bin"))
        .agg(F.count("*").alias("count"))
        .select(
            "series", "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            "count",
        )
    )


def value_histogram_sql(
    view_sql: str, view_name: str, metric: str,
    begin_ns: int, end_ns: int, lo: float, hi: float, n_bins: int,
) -> str:
    """DuckDB twin — the same IEEE floor((v-lo)/width) binning."""
    width = (hi - lo) / n_bins
    return f"""
WITH {view_sql}
SELECT series, bin, {lo} + bin * {width!r} AS bin_lo, count
FROM (
  SELECT series,
         CAST(floor((value - {lo}) / {width!r}) AS BIGINT) AS bin,
         count(*) AS count
  FROM {view_name}
  WHERE metric = '{metric}' AND ts_ns >= {begin_ns} AND ts_ns < {end_ns}
    AND value >= {lo} AND value < {hi}
  GROUP BY 1, 2
)
""".strip()


def metrics_correlation(
    metrics: DataFrame,
    metric_a: str,
    metric_b: str,
    begin_ns: int,
    end_ns: int,
    min_samples: int = 2,
) -> DataFrame:
    """Pearson correlation between two metrics per tag-set, over samples
    aligned on EXACT timestamp (duplicates SUM-combined first — the
    engine join's documented rule).  Rows with either side missing are
    excluded; tag-sets with fewer than ``min_samples`` aligned pairs (or
    zero variance on either side) yield NULL ``corr``.

    corr = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²)) — the
    closed form over six shared sums, evaluated the same way in the
    DuckDB twin (built-in corr() implementations differ across engines).
    """
    if end_ns <= begin_ns:
        raise QueryValidationError("metrics_correlation range must be forward")
    base = metrics.filter(
        F.col("metric").isin([metric_a, metric_b])
        & (F.col("ts_ns") >= begin_ns) & (F.col("ts_ns") < end_ns)
    ).withColumn(
        "tagstr",
        F.when(
            F.instr(F.col("series"), " ") > 0,
            F.expr("substring(series, instr(series, ' ') + 1)"),
        ).otherwise(F.lit("")),
    )
    aligned = (
        base.groupBy("tagstr", "ts_ns")
        .pivot("metric", [metric_a, metric_b])
        .agg(F.sum("value"))
        .filter(
            F.col(f"`{metric_a}`").isNotNull()
            & F.col(f"`{metric_b}`").isNotNull()
        )
    )
    x, y = F.col(f"`{metric_a}`"), F.col(f"`{metric_b}`")
    sums = aligned.groupBy("tagstr").agg(
        F.count("*").cast("double").alias("__n"),
        F.sum(x).alias("__sx"), F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"), F.sum(y * y).alias("__syy"),
    )
    n = F.col("__n")
    varx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    corr = F.when(
        (n >= min_samples) & (varx > 0) & (vary > 0),
        cov / F.sqrt(varx * vary),
    )
    return sums.select(
        "tagstr", F.col("__n").cast("long").alias("n_aligned"),
        corr.alias("corr"),
    )


def metrics_correlation_sql(
    view_sql: str, view_name: str, metric_a: str, metric_b: str,
    begin_ns: int, end_ns: int, min_samples: int = 2,
) -> str:
    """DuckDB twin — identical closed-form over the same six sums."""
    return f"""
WITH {view_sql},
__base AS (
  SELECT CASE WHEN instr(series, ' ') > 0
              THEN substring(series, instr(series, ' ') + 1)
              ELSE '' END AS tagstr,
         metric, ts_ns, value
  FROM {view_name}
  WHERE metric IN ('{metric_a}', '{metric_b}')
    AND ts_ns >= {begin_ns} AND ts_ns < {end_ns}
),
__aligned AS (
  SELECT tagstr, ts_ns,
         sum(CASE WHEN metric = '{metric_a}' THEN value END) AS x,
         sum(CASE WHEN metric = '{metric_b}' THEN value END) AS y
  FROM __base GROUP BY 1, 2
  HAVING x IS NOT NULL AND y IS NOT NULL
),
__sums AS (
  SELECT tagstr, CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM __aligned GROUP BY 1
)
SELECT tagstr, CAST(n AS BIGINT) AS n_aligned,
       CASE WHEN n >= {min_samples}
                 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN (n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
       END AS corr
FROM __sums
""".strip()
