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

from akumuli_spark.smallframe import local_frame
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
    # conditional aggregation, not .pivot(): one exchange instead of
    # pivot's two-phase aggregate (see engine._build_join)
    aligned = (
        base.groupBy("tagstr", "ts_ns")
        .agg(
            F.sum(F.when(F.col("metric") == metric_a, F.col("value"))).alias(metric_a),
            F.sum(F.when(F.col("metric") == metric_b, F.col("value"))).alias(metric_b),
        )
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


def metrics_correlation_lagged(
    metrics: DataFrame,
    metric_a: str,
    metric_b: str,
    begin_ns: int,
    end_ns: int,
    step_ns: int,
    lags: tuple[int, ...] = (-2, -1, 0, 1, 2),
    min_samples: int = 2,
) -> DataFrame:
    """Lead-lag Pearson correlation: resample both metrics to
    ``step_ns`` buckets (per-bucket MEAN per tag-set), then correlate
    ``a(t)`` against ``b(t + lag·step)`` for each lag — "does metric a
    lead metric b, and by how much" (positive best-lag ⇒ a leads).

    Output: (tagstr, lag, n_aligned, corr) — same closed-form /
    NULL-on-degenerate rules as :func:`metrics_correlation`.

    Scale shape: the bucket resample is two filtered two-phase aggs on
    (tagstr, bucket); the lag set rides a broadcast (|lags| rows) so
    the shifted join stays ONE equi-join on (tagstr, bucket+lag) with
    |lags|× fan-out on the left side only; the final agg is per
    (tagstr, lag).  No window, no self-join per lag.
    """
    if end_ns <= begin_ns:
        raise QueryValidationError("lagged correlation range must be forward")
    if step_ns <= 0:
        raise QueryValidationError("step_ns must be positive")
    if not lags:
        raise QueryValidationError("need at least one lag")
    tagstr = F.when(
        F.instr(F.col("series"), " ") > 0,
        F.expr("substring(series, instr(series, ' ') + 1)"),
    ).otherwise(F.lit(""))
    # Exact int64 floor division: the double-division form is only
    # exact while (end_ns - begin_ns) < 2^53 ns (~104 days); a longer
    # range would silently risk off-by-one buckets vs the oracle's `//`.
    # ts_ns - begin_ns is non-negative here (range filter), so `div`
    # truncation equals floor.
    bucket = F.expr(f"(ts_ns - {int(begin_ns)}L) div {int(step_ns)}L")

    def resampled(metric: str, out: str) -> DataFrame:
        return (
            metrics.filter(
                (F.col("metric") == metric)
                & (F.col("ts_ns") >= begin_ns) & (F.col("ts_ns") < end_ns)
            )
            .select(tagstr.alias("tagstr"), bucket.alias("bucket"), "value")
            .groupBy("tagstr", "bucket")
            .agg(F.avg("value").alias(out))
        )

    xs = resampled(metric_a, "x")
    ys = resampled(metric_b, "y").withColumnRenamed("bucket", "__yb")
    spark = metrics.sparkSession
    lag_df = local_frame(spark, [(int(l),) for l in sorted(set(lags))],
                                   "lag long")
    aligned = (
        xs.crossJoin(F.broadcast(lag_df))
        .withColumn("__yb", F.col("bucket") + F.col("lag"))
        .join(ys, ["tagstr", "__yb"])
    )
    x, y = F.col("x"), F.col("y")
    sums = aligned.groupBy("tagstr", "lag").agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
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
        "tagstr", "lag", F.col("__n").cast("long").alias("n_aligned"),
        corr.alias("corr"),
    )


def metrics_correlation_lagged_sql(
    view_sql: str, view_name: str, metric_a: str, metric_b: str,
    begin_ns: int, end_ns: int, step_ns: int,
    lags: tuple[int, ...] = (-2, -1, 0, 1, 2), min_samples: int = 2,
) -> str:
    """DuckDB twin — identical resample, shift, and closed form."""
    lag_list = ", ".join(str(int(l)) for l in sorted(set(lags)))
    return f"""
WITH {view_sql},
__base AS (
  SELECT CASE WHEN instr(series, ' ') > 0
              THEN substring(series, instr(series, ' ') + 1)
              ELSE '' END AS tagstr,
         metric,
         (ts_ns - {begin_ns}) // {step_ns} AS bucket,
         value
  FROM {view_name}
  WHERE ts_ns >= {begin_ns} AND ts_ns < {end_ns}
),
__xs AS (
  SELECT tagstr, bucket, avg(value) AS x FROM __base
  WHERE metric = '{metric_a}' GROUP BY tagstr, bucket
),
__ys AS (
  SELECT tagstr, bucket, avg(value) AS y FROM __base
  WHERE metric = '{metric_b}' GROUP BY tagstr, bucket
),
__aligned AS (
  SELECT xs.tagstr, l.lag, xs.x, ys.y
  FROM __xs xs
  CROSS JOIN (SELECT unnest([{lag_list}]) AS lag) l
  JOIN __ys ys ON ys.tagstr = xs.tagstr AND ys.bucket = xs.bucket + l.lag
),
__sums AS (
  SELECT tagstr, lag,
         count(*)::DOUBLE AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM __aligned GROUP BY tagstr, lag
)
SELECT tagstr, lag, n::BIGINT AS n_aligned,
       CASE WHEN n >= {int(min_samples)}
                 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN (n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
       END AS corr
FROM __sums
""".strip()
