"""The ``apply`` post-processing pipeline — Akumuli's ~18 registered stream
operators (/root/reference/libakumuli/queryprocessor_framework.h:306-338,
pipeline assembly queryparser.cpp:2079-2113) re-expressed as DataFrame
transformations.

Mapping strategy (SURVEY.md §2.6):

* stateless nodes (``abs``, ``scale``, horizontal ``sum/diff/multiply/
  divide``, ``eval``) — pure column expressions, fully codegen'd;
* per-series scan nodes (``rate``, ``accumulate``, ``sma``, ``cma``) —
  window functions partitioned by series, ordered in stream direction;
* order-sensitive recursive nodes (``ewma``, ``ewma-error``) — Arrow-batched
  ``applyInPandas`` per series (the recursion has no closed SQL form due to
  the 10-point warm-up, sliding_window.cpp:15-51);
* terminal ranking nodes (``top``, ``frequent-items``, ``heavy-hitters``) —
  aggregations + sort, exact at Spark scale (the reference uses a
  SpaceSaving sketch because it streams on one core; a distributed exact
  group-by is both cheaper and precise here — the sketch is only an
  approximation of this result).

Reference bugs replicated *by documented intent, not by bug*
(SURVEY.md §2.2/§2.6): CMA's double-add (sliding_window.cpp:245) and the
broken offset counter.  Faithfully replicated oddities: ``rate``'s
implicit (0,0) seed (rate.cpp:31-40), SMA's zero-filled initial window
(sum over the last n slots / n, sliding_window.cpp:140-151), EWMA's
emit-the-raw-value warm-up for the first 11 points.
"""

from __future__ import annotations

import math
import re

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F

from akumuli_spark.grouped import grouped_map_batched
from akumuli_spark.query.errors import QueryValidationError
from akumuli_spark.query.plan import ApplyNode, Query

NANOS_PER_SEC = 1_000_000_000.0

#: nodes that must terminate the chain (queryprocessor.cpp:48-58)
TERMINAL_NODES = {"top", "frequent-items", "heavy-hitters"}

#: nodes whose reference implementation rejects non-REGULLAR input with
#: AKU_EREGULLAR_EXPECTED — only group-aggregate output carries the
#: REGULLAR payload flag (aggregate.cpp:412), so these tokens are valid
#: only on bucketed data (sliding_window.cpp:76,170 for ewma/sma and
#: their -error variants; sax.cpp:53).  cma and rate have no such check.
REGULAR_REQUIRED = {"ewma", "ewma-error", "sma", "sma-error", "sax"}


def _stream_window(q: Query) -> Window:
    ts = F.col("ts_ns").asc() if q.range.forward else F.col("ts_ns").desc()
    return Window.partitionBy("series").orderBy(ts)


# ---------------------------------------------------------------------------
# stateless column nodes
# ---------------------------------------------------------------------------


def _node_abs(res, node: ApplyNode):
    df = res.df
    for c in res.value_cols:
        df = df.withColumn(c, F.abs(F.col(f"`{c}`")))
    res.df = df
    return res


def _node_scale(res, node: ApplyNode):
    weights = node.param("weights") or node.param("weight")
    if weights is None:
        raise QueryValidationError("scale requires 'weights'")
    if not isinstance(weights, (list, tuple)):
        weights = (weights,)
    if len(weights) != len(res.value_cols):
        raise QueryValidationError(
            f"scale: {len(weights)} weights for {len(res.value_cols)} components"
        )
    df = res.df
    for c, w in zip(res.value_cols, weights):
        df = df.withColumn(c, F.col(f"`{c}`") * F.lit(float(w)))
    res.df = df
    return res


# ---------------------------------------------------------------------------
# horizontal (cross-component) folds — math.h:9-80
# ---------------------------------------------------------------------------


def _horizontal(res, node: ApplyNode, op: str):
    cols = [F.col(f"`{c}`") for c in res.value_cols]
    ignore_missing = bool(node.param("ignore_missing", False))
    nan = F.lit(float("nan"))
    unit = {"sum": 0.0, "diff": 0.0, "multiply": 1.0, "divide": 1.0}[op]
    if ignore_missing:
        cols = [F.coalesce(c, F.lit(unit)) for c in cols]
    # MathOperation::put seeds the accumulator with the unit and folds ALL
    # components (math.h:47-68, math.cpp): diff = 0 - x0 - x1 - ...,
    # divide = 1 / x0 / x1 / ... (sum/multiply are unaffected: unit is the
    # identity for them).
    acc = F.lit(unit)
    for c in cols:
        if op == "sum":
            acc = acc + c
        elif op == "diff":
            acc = acc - c
        elif op == "multiply":
            acc = acc * c
        elif op == "divide":
            acc = acc / c
    if not ignore_missing:
        # missing component ⇒ NaN result (math.h unit/NaN rule)
        any_null = F.lit(False)
        for c in res.value_cols:
            any_null = any_null | F.col(f"`{c}`").isNull()
        acc = F.when(any_null, nan).otherwise(acc)
    res.df = res.df.select("series", "ts_ns", acc.alias("value"))
    res.value_cols = ["value"]
    return res


# ---------------------------------------------------------------------------
# per-series windowed nodes
# ---------------------------------------------------------------------------


def _node_rate(res, node: ApplyNode):
    """Δx/Δt per second with implicit previous point (0, 0)
    (rate.cpp:31-40: oldT = 0, oldX = 0 for the first sample)."""
    w = _stream_window(res.query)
    df = res.df
    for c in res.value_cols:
        col = F.col(f"`{c}`")
        prev_v = F.lag(col, 1, 0.0).over(w)
        prev_t = F.lag(F.col("ts_ns"), 1, 0).over(w)
        rate = (col - prev_v) / (F.col("ts_ns") - prev_t) * F.lit(NANOS_PER_SEC)
        df = df.withColumn(c, rate)
    res.df = df
    return res


def _node_counter_rate(res, node: ApplyNode):
    """Reset-aware Δx/Δt per second — engine EXTENSION beside ``rate``.

    Plain ``rate`` over a monotone counter that restarts at zero (process
    restart, host replacement) emits one huge negative spike per reset.
    The standard TSDB remedy (Prometheus ``rate()``'s reset rule) treats
    a decrease as a restart and takes the post-reset value itself as the
    delta: Δ = x − x_prev when x ≥ x_prev, else x.  Same implicit (0, 0)
    previous point as ``rate`` (rate.cpp:31-40), same pure-window shape —
    one lag per value column, JVM-side, no Python."""
    w = _stream_window(res.query)
    df = res.df
    for c in res.value_cols:
        col = F.col(f"`{c}`")
        prev_v = F.lag(col, 1, 0.0).over(w)
        prev_t = F.lag(F.col("ts_ns"), 1, 0).over(w)
        delta = F.when(col >= prev_v, col - prev_v).otherwise(col)
        rate = delta / (F.col("ts_ns") - prev_t) * F.lit(NANOS_PER_SEC)
        df = df.withColumn(c, rate)
    res.df = df
    return res


def _node_accumulate(res, node: ApplyNode):
    # Default RANGE frame (not ROWS): duplicate timestamps are peers and get
    # the same running value — the only deterministic choice for a set-based
    # engine (the reference's per-arrival order is not reproducible anyway).
    w = _stream_window(res.query)
    df = res.df
    for c in res.value_cols:
        df = df.withColumn(c, F.sum(F.col(f"`{c}`")).over(w))
    res.df = df
    return res


def _node_sma(res, node: ApplyNode, delta: bool = False):
    """Predict-then-add with a zero-prefilled ring buffer
    (sliding_window.cpp:140-160): prediction_i = Σ last n values *before*
    i, divided by n (missing slots count as 0)."""
    width = node.param("window-width")
    if width is None:
        raise QueryValidationError("sma requires 'window-width'")
    n = int(float(width))
    if n <= 0:
        raise QueryValidationError("window-width must be positive")
    w = _stream_window(res.query).rowsBetween(-n, -1)
    df = res.df
    for c in res.value_cols:
        col = F.col(f"`{c}`")
        pred = F.coalesce(F.sum(col).over(w), F.lit(0.0)) / F.lit(float(n))
        df = df.withColumn(c, col - pred if delta else pred)
    res.df = df
    return res


def _node_cma(res, node: ApplyNode):
    """Cumulative moving average — documented intent (mean of all points so
    far, inclusive); the reference's version double-adds state
    (sliding_window.cpp:245, SURVEY.md §2.6)."""
    # Default RANGE frame for tie determinism (see _node_accumulate);
    # sum/count instead of avg() because windowed-avg implementations differ
    # in FP association across engines.
    w = _stream_window(res.query)
    df = res.df
    for c in res.value_cols:
        col = F.col(f"`{c}`")
        df = df.withColumn(c, F.sum(col).over(w) / F.count(col).over(w))
    res.df = df
    return res


def _node_ewma(res, node: ApplyNode, delta: bool = False):
    """EWMA with the reference's exact warm-up (sliding_window.cpp:15-51):
    prediction_i = x_i for i ≤ 10 (get() returns the default while
    warmup ≤ 10); at i == 10 the state collapses to
    decay·x₁₀ + (1-decay)·mean(x₀..x₁₀); afterwards
    v = decay·x + (1-decay)·v.  Recursive ⇒ applyInPandas per series."""
    decay = node.param("decay")
    if decay is None:
        raise QueryValidationError("ewma requires 'decay'")
    decay = float(decay)
    value_cols = list(res.value_cols)
    forward = res.query.range.forward
    schema = res.df.schema
    cols = [f.name for f in schema.fields]

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_ns", ascending=forward).reset_index(drop=True)
        for c in value_cols:
            xs = pdf[c].to_numpy(dtype=float, na_value=math.nan)
            out = xs.copy()
            v, warm = 0.0, 0
            for i, x in enumerate(xs):
                if math.isnan(x):
                    continue
                out[i] = x if warm <= 10 else v
                if warm < 10:
                    v += x
                elif warm == 10:
                    v = (v + x) / 11.0
                    v = x * decay + v * (1.0 - decay)
                else:
                    v = x * decay + v * (1.0 - decay)
                warm += 1
            # delta variant = value − prediction (sliding_window.cpp: *value -= exp)
            pdf[c] = xs - out if delta else out
        return pdf

    # ALL series of one hash partition in one Python call (guide §4.5):
    # the groupBy().applyInPandas shape paid an exchange + a per-group
    # local SORT + one JVM↔Python round per series; the exact per-series
    # kernel — and therefore every emitted double — is unchanged.
    res.df = grouped_map_batched(res.df, ["series"], per_series, schema, cols)
    return res


# ---------------------------------------------------------------------------
# sax — SAX symbolization (sax.cpp:1-96 + saxencoder.cpp; the token is
# dormant in the reference, registration commented out at sax.cpp:96)
# ---------------------------------------------------------------------------


def _sax_cutpoints(alphabet: int) -> list[float]:
    """Equiprobable N(0,1) cutpoints.  The reference embeds the jMotif
    NormalAlphabet table (saxencoder.cpp:74-129); these are the same
    quantiles computed from the inverse normal CDF."""
    from statistics import NormalDist

    nd = NormalDist()
    return [nd.inv_cdf(i / alphabet) for i in range(1, alphabet)]


def _node_sax(res, node: ApplyNode):
    """Per-series sliding-window SAX words (saxencoder.cpp:189-203):
    once the window of `window_width` samples fills, z-normalize it
    (plain mean-subtraction when stddev < 1e-10), quantize each value to
    the alphabet, and emit the word at the current sample's timestamp —
    but only when it differs from the previous word (numerosity
    reduction).  Output: (series, ts_ns, sax string)."""
    alphabet = node.param("alphabet_size")
    width = node.param("window_width")
    if alphabet is None or width is None:
        raise QueryValidationError("sax requires 'alphabet_size' and 'window_width'")
    alphabet, width = int(alphabet), int(width)
    if not 1 <= alphabet <= 20:
        raise QueryValidationError("`alphabet_size` should be in [1, 20] range")
    if not 4 <= width <= 100:
        raise QueryValidationError("`window_width` should be in [4, 100] range")
    if len(res.value_cols) != 1:
        raise QueryValidationError("sax works only with scalars (AKU_EHIGH_CARDINALITY)")
    cuts = _sax_cutpoints(alphabet)
    letters = "abcdefghijklmnopqrstu"
    vcol = res.value_cols[0]
    forward = res.query.range.forward

    def to_char(v: float) -> str:
        for i, c in enumerate(cuts):
            if v < c:
                return letters[i]
        return letters[len(cuts)]

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_ns", ascending=forward).reset_index(drop=True)
        out_rows = []
        window: list[float] = []
        last_word = None
        for ts, x in zip(pdf["ts_ns"], pdf[vcol]):
            if x is None or (isinstance(x, float) and math.isnan(x)):
                continue
            window.append(float(x))
            if len(window) > width:
                window.pop(0)
            if len(window) == width:
                n = len(window)
                s = sum(window)
                mean = s / n
                sqr = sum(v * v for v in window)
                var = (n * sqr - s * s) / (n * (n - 1)) if n > 1 else float("nan")
                std = math.sqrt(var) if var > 0 else 0.0
                if std < 1e-10:  # AKU_ZNORM_THRESHOLD
                    word = "".join(to_char(v - mean) for v in window)
                else:
                    word = "".join(to_char((v - mean) / std) for v in window)
                if word != last_word:
                    last_word = word
                    out_rows.append((pdf["series"].iloc[0], ts, word))
        return pd.DataFrame(out_rows, columns=["series", "ts_ns", "sax"])

    # batched grouped map (guide §4.5): same per-series kernel, one
    # Python round per shuffle partition instead of per series, no
    # group-delimiting JVM sort (the kernel orders by ts_ns itself)
    res.df = grouped_map_batched(
        res.df, ["series"], per_series,
        "series string, ts_ns long, sax string",
        ["series", "ts_ns", "sax"],
    )
    res.value_cols = ["sax"]
    return res


# ---------------------------------------------------------------------------
# anomaly-detector — forecast + threshold (anomaly.cpp, anomalydetector.cpp;
# dormant in the reference: not in the v1 token registry, anomaly.h:38)
# ---------------------------------------------------------------------------


#: the reference's EWMASlidingWindow accumulates this many frames before
#: its first forecast (anomalydetector.cpp:345-355: counter_ < 10 → add;
#: at 10, ewma_ *= 0.1 — the seed is the MEAN of the first 10 frames)
ANOMALY_EWMA_WARMUP = 10


def _forecast_preds(xs, method: str, alpha: float, beta: float,
                    gamma: float, period: int) -> list[float]:
    """One-step-ahead forecasts for a value sequence, replicating the
    reference sliding windows' warm-up exactly (forecast() returns an
    EMPTY frame — NaN here — until the window is primed):

    * sma  (SMASlidingWindow, anomalydetector.cpp:284-321): no forecast
      until ``period`` full frames are queued; always divides by
      ``period``.
    * ewma (EWMASlidingWindow, :332-368): the first 10 frames accumulate;
      the first forecast (step 10) is their mean; decay starts after.
    * double-exp-smoothing (DoubleExpSmoothingSlidingWindow, :380-440):
      step 0 seeds level=x0; step 1 seeds slope=x1−x0, level=x1; first
      forecast at step 2.
    * holt-winters (HoltWintersSlidingWindow, :455-541): steps 0..period−1
      seed the seasonal deque with the raw frames (level=x1, slope=x1−x0);
      first forecast at step ``period``, and — as in the reference —
      forecast adds ``seasonal_.back()`` (the seasonal updated at the
      PREVIOUS position, not the upcoming one).

    The detector pipeline forecasts BEFORE adding the step's frame
    (AnomalyDetectorPipeline::move_sliding_window, :584-592), so
    ``preds[i]`` uses state built from ``xs[:i]`` only.

    Documented value-level deviation: sma recomputes each window's sum
    fresh (left fold) and divides by ``period`` where the reference keeps
    a running add/sub sum times a precomputed 1/depth — same reals,
    FP-noise-level differences only; the Spark engine and the DuckDB
    oracle both use the fresh-fold form, so the correctness gate compares
    identical arithmetic.

    Shared by the precise path (sequence = one series) and the sketch
    path (sequence = one (hash row, bucket) cell): every sliding-window
    method applies only linear frame ops (add/sub/mul), so forecasting
    each cell independently with the same scalar recursion reproduces
    the reference's whole-sketch windows.
    """
    n = len(xs)
    preds = [math.nan] * n
    if method in ("ewma", "exp-smoothing"):
        acc, cnt, v = 0.0, 0, math.nan
        for i, x in enumerate(xs):
            if cnt >= ANOMALY_EWMA_WARMUP:
                preds[i] = v
                v = alpha * x + (1 - alpha) * v
            else:
                acc += x
                cnt += 1
                if cnt == ANOMALY_EWMA_WARMUP:
                    v = acc * 0.1
    elif method in ("sma", "simple-moving-average"):
        q: list[float] = []
        for i, x in enumerate(xs):
            if len(q) >= period:
                preds[i] = sum(q) / period
            q.append(x)
            if len(q) > period:
                q.pop(0)
    elif method == "double-exp-smoothing":
        level = trend = math.nan
        for i, x in enumerate(xs):
            if i == 0:
                level = x
            elif i == 1:
                trend = x - level
                level = x
            else:
                preds[i] = level + trend
                new_level = alpha * x + (1 - alpha) * (level + trend)
                trend = gamma * (new_level - level) + (1 - gamma) * trend
                level = new_level
    elif method == "holt-winters":
        level = trend = math.nan
        season: list[float] = []
        for i, x in enumerate(xs):
            if i >= period:
                preds[i] = level + trend + season[-1]
            if i == 0:
                level = x
                season.append(x)
            elif i == 1:
                trend = x - level
                level = x
                season.append(x)
            elif i < period:
                season.append(x)
            else:
                s = season.pop(0)
                new_level = alpha * (x - s) + (1 - alpha) * (level + trend)
                trend = beta * (new_level - level) + (1 - beta) * trend
                season.append(gamma * (x - new_level) + (1 - gamma) * s)
                level = new_level
    else:
        raise ValueError(f"Unknown forecasting method {method!r}")
    return preds


def _anomaly_sketch(res, method: str, threshold: float, alpha: float,
                    beta: float, gamma: float, period: int,
                    bits: int, hashes: int):
    """Counting-sketch anomaly detection (``approx: true``,
    anomalydetector.cpp:15-175 + 540-600): per time step the frame is a
    CountingSketch — ``hashes`` (N) hash rows × ``1 << bits`` (K)
    buckets, cell = Σ value over the series hashing there — instead of
    one counter per series, bounding frame state at N·K cells however
    many series exist (the point of the approximation at scale).

    Per (row, bucket) cell the chosen method forecasts the next frame;
    the error frame is the absolute difference |forecast − actual|
    (CountingSketch::diff).  A sample is anomalous iff

        estimate(id) > sqrt(estimateF2()) · threshold

    with the reference's unbiased estimators (anomalydetector.cpp:85-97):
    estimate(id) = median_i (err[i][h_i(id)] − S/K)/(1 − 1/K) with S the
    row-0 cell sum, and estimateF2 = median_i (K·(Σ_k err²) − S²)/(K−1)
    — the classic AMS second-moment estimator; negative estimates
    (sampling variance) flag nothing that step.  Median = sorted[N/2],
    N odd by validation.

    Two deliberate corrections to the (dormant, never-exercised)
    reference code: (1) it seeds its hash family from
    ``std::random_device`` (hashfnfamily.cpp:28-29), so two of its own
    runs disagree; here h_i(series) = md5(i ‖ series) mod K —
    deterministic, reproducible, DuckDB-replayable.  (2) its
    ``estimateF2`` (anomalydetector.cpp:71-84) wraps the row sum of
    squares in ``sqrt``, but Cauchy-Schwarz gives S² ≥ Σ_k err², so the
    written formula is negative on every non-trivial error frame and the
    detector can never fire (sqrt(negative) → NaN → comparison false);
    dropping that sqrt yields exactly the unbiased estimator the
    surrounding ``(value − S/K)/(1 − 1/K)`` machinery intends, and makes
    the threshold scale like the precise path's ``θ·sqrt(Σ err²)``.

    Scale shape: one shuffle to aggregate cells (grid = steps × N × K,
    independent of series count), Arrow-batched per-cell recursion over
    N·K keys, then broadcast-sized per-step sketch stats joined back to
    the samples.  No driver-side state.
    """
    vcol = res.value_cols[0]
    forward = res.query.range.forward
    K = 1 << bits
    N = hashes
    df = res.df

    def cell_of(i: int):
        h = F.md5(F.concat(F.lit(f"{i}|"), F.col("series")))
        return (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
                % F.lit(K)).cast("bigint")

    scells = (
        df.select("series").distinct()
        .select("series", F.posexplode(F.array(*[cell_of(i) for i in range(N)])))
        .withColumnRenamed("pos", "i").withColumnRenamed("col", "cell")
    )
    sparse = (
        df.join(scells, "series")
        .groupBy("ts_ns", "i", "cell")
        .agg(F.sum(F.col(f"`{vcol}`")).alias("v"))
    )
    # dense steps × N × K grid: absent cells hold 0.0 (the reference's
    # frames allocate every bucket; a bucket no series hashes to still
    # feeds 0 into the forecast recursions)
    grid = (
        df.select("ts_ns").distinct()
        .select("ts_ns", F.explode(F.sequence(F.lit(0), F.lit(N - 1))).alias("i"))
        .select("ts_ns", "i",
                F.explode(F.sequence(F.lit(0), F.lit(K - 1))).alias("cell0"))
        .select("ts_ns", "i", F.col("cell0").cast("bigint").alias("cell"))
    )
    dense = (
        grid.join(sparse, ["ts_ns", "i", "cell"], "left")
        .select("ts_ns", "i", "cell", F.coalesce("v", F.lit(0.0)).alias("v"))
    )

    def cell_errors(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_ns", ascending=forward).reset_index(drop=True)
        xs = pdf["v"].to_numpy(dtype=float)
        preds = _forecast_preds(xs, method, alpha, beta, gamma, period)
        pdf["err"] = [abs(p - x) if not math.isnan(p) else math.nan
                      for p, x in zip(preds, xs)]
        return pdf[["ts_ns", "i", "cell", "err"]]

    # the error frame feeds three consumers (S, row stats, estimates) and
    # Spark re-executes a subplan per consumer — materialize it once; its
    # size is bounded at steps × N × K rows (the sketch bound, not the
    # series count)
    # batched grouped map (guide §4.5): the grid has N·K (thousands of)
    # cells and the old per-GROUP shape paid one JVM↔Python Arrow round
    # trip per cell — the boundary crossings dominated the stage.  Same
    # per-cell recursion, one Python round per shuffle partition.
    errs = (
        grouped_map_batched(
            dense, ["i", "cell"], cell_errors,
            "ts_ns long, i int, cell long, err double",
            ["ts_ns", "i", "cell", "err"],
        )
        .filter(F.col("err").isNotNull() & ~F.isnan("err"))
        .localCheckpoint(eager=True)
    )
    sums = (
        errs.filter(F.col("i") == 0)
        .groupBy("ts_ns").agg(F.sum("err").alias("sum_err"))
    )
    # constants as the exact IEEE ops the DuckDB oracle performs:
    # K/(K-1) as one division, S²/(K-1) as a division (not a *1/(K-1))
    row_stat = (
        errs.groupBy("ts_ns", "i").agg(F.sum(F.col("err") * F.col("err")).alias("ss"))
        .join(sums, "ts_ns")
        .withColumn(
            "stat",
            (F.lit(float(K)) / F.lit(float(K - 1))) * F.col("ss")
            - F.col("sum_err") * F.col("sum_err") / F.lit(float(K - 1)),
        )
    )
    mid = N // 2 + 1  # sorted[N/2], 1-based for element_at
    f2 = row_stat.groupBy("ts_ns").agg(
        F.element_at(F.array_sort(F.collect_list("stat")), mid).alias("f2est")
    )
    est = (
        df.join(scells, "series")
        .join(errs, ["ts_ns", "i", "cell"])
        .join(sums, "ts_ns")
        .groupBy("series", "ts_ns", F.col(f"`{vcol}`"))
        .agg(
            F.element_at(
                F.array_sort(F.collect_list(
                    (F.col("err") - F.col("sum_err") / K) / (1.0 - 1.0 / K)
                )),
                mid,
            ).alias("est")
        )
    )
    res.df = (
        est.join(f2, "ts_ns")
        .filter((F.col("f2est") >= 0)
                & (F.col("est") > F.sqrt("f2est") * F.lit(threshold)))
        .select("series", "ts_ns", f"`{vcol}`")
    )
    return res


def _node_anomaly(res, node: ApplyNode):
    """Frame-based anomaly detection (anomalydetector.cpp:540-600):
    at each time step the detector forecasts the whole frame (one value
    per series) with the chosen method, computes the error frame
    ``forecast - actual``, and flags series where
    ``|error| > threshold · sqrt(F2)`` with F2 = Σ_series error² (the
    squared L2 norm of the error frame).  Output: only the anomalous
    samples.

    Methods (precise variants): ``ewma`` (alpha), ``sma`` (period),
    ``double-exp-smoothing`` (alpha, gamma), ``holt-winters`` (alpha,
    beta, gamma, period).  ``approx: true`` selects the counting-sketch
    pipeline (see :func:`_anomaly_sketch`) with ``bits``/``hashes``
    validated per anomaly.cpp:29-46 (bits in [8, 16], hashes odd in
    [1, 9]).
    """
    method = node.param("method")
    threshold = node.param("threshold")
    if method is None or threshold is None:
        raise QueryValidationError("anomaly-detector requires 'method' and 'threshold'")
    threshold = float(threshold)
    alpha = float(node.param("alpha", 0.0))
    beta = float(node.param("beta", 0.0))
    gamma = float(node.param("gamma", 0.0))
    period = int(node.param("period", 0))
    for name, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not 0.0 <= v <= 1.0:
            raise QueryValidationError(f"`{name}` should be in [0, 1] range")
    if method in ("ewma", "exp-smoothing") and node.param("alpha") is None:
        raise QueryValidationError("Parameter alpha should be set")
    if method in ("sma", "simple-moving-average") and node.param("period") is None:
        raise QueryValidationError("Parameter period should be set")
    if method in ("sma", "simple-moving-average") and period <= 0:
        # checked_inv (anomalydetector.cpp:274-280) rejects depth 0
        raise QueryValidationError("Sliding window depth can't be zero")
    if method == "double-exp-smoothing" and (
        node.param("alpha") is None or node.param("gamma") is None
    ):
        raise QueryValidationError("Parameters alpha and gamma should be set")
    if method == "holt-winters" and any(
        node.param(p) is None for p in ("alpha", "beta", "gamma", "period")
    ):
        # presence check first: a query omitting `period` entirely should
        # get this message, not the range complaint below
        raise QueryValidationError("holt-winters needs alpha, beta, gamma, period")
    if method == "holt-winters" and period < 2:
        # below 2 the reference forecasts before its slope frame exists
        # (nullptr deref) — reject instead of replicating UB
        raise QueryValidationError("`period` should be at least 2")
    if len(res.value_cols) != 1:
        raise QueryValidationError("anomaly-detector works only with scalars")
    if node.param("approx", False):
        bits = int(node.param("bits", 10))
        hashes = int(node.param("hashes", 3))
        if not 8 <= bits <= 16:
            raise QueryValidationError(
                "Anomaly detector parameter `bits` out of range")
        if hashes % 2 == 0:
            raise QueryValidationError(
                "Anomaly detector parameter `hashes` should be odd")
        if not 1 <= hashes <= 9:
            raise QueryValidationError(
                "Anomaly detector parameter `hashes` out of range")
        return _anomaly_sketch(res, method, threshold, alpha, beta, gamma,
                               period, bits, hashes)
    vcol = res.value_cols[0]
    forward = res.query.range.forward

    def forecast_errors(pdf: pd.DataFrame) -> pd.DataFrame:
        """Per-series one-step-ahead forecast errors (pred - actual)."""
        pdf = pdf.sort_values("ts_ns", ascending=forward).reset_index(drop=True)
        xs = pdf[vcol].to_numpy(dtype=float)
        preds = _forecast_preds(xs, method, alpha, beta, gamma, period)
        # seed rows (no forecast yet) carry NaN here; the Arrow return
        # path converts float NaN to SQL NULL, so they are EXCLUDED from
        # the frame's F2 sum and from the output filter — a late-starting
        # series never poisons the other series' frame score
        pdf["__err"] = [p - x if not math.isnan(p) else math.nan
                        for p, x in zip(preds, xs)]
        return pdf

    err_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in res.df.schema.fields
    ) + ", __err double"
    # batched grouped map (guide §4.5): same per-series forecast kernel,
    # one Python round per shuffle partition instead of per series
    with_err = grouped_map_batched(
        res.df, ["series"], forecast_errors, err_schema,
        [f.name for f in res.df.schema.fields] + ["__err"],
    )
    # F2 per time step across series; flagged iff |err| > threshold·sqrt(F2)
    f2 = with_err.groupBy("ts_ns").agg(
        F.sum(F.col("__err") * F.col("__err")).alias("__f2")
    )
    out = (
        with_err.join(f2, "ts_ns")
        .filter(
            F.col("__err").isNotNull()
            & ~F.isnan(F.col("__err"))
            & (F.abs(F.col("__err")) > F.sqrt(F.col("__f2")) * F.lit(threshold))
        )
        .select("series", "ts_ns", *[F.col(f"`{c}`") for c in res.value_cols])
    )
    res.df = out
    return res


# ---------------------------------------------------------------------------
# eval — arithmetic over the joined metrics' components (eval.cpp:36-205)
# ---------------------------------------------------------------------------


def _node_eval(res, node: ApplyNode):
    from akumuli_spark.query import evalexpr

    expr = node.param("expr")
    if not expr:
        raise QueryValidationError("eval requires 'expr'")
    # Rewrite metric names to safe identifiers (the reference's _var_i
    # rewrite, eval.cpp:52-76) at the token level inside translate() —
    # whole-identifier substitution, so a metric named 'x' never corrupts
    # 'max(x, 2)'.  Column-API select only: metric names are user input
    # and must not be interpolated into SQL (backticks included).
    colmap = {name: f"_var_{i}" for i, name in enumerate(res.value_cols)}
    select_cols: list = [F.col("series"), F.col("ts_ns")]
    for name, var in colmap.items():
        select_cols.append(F.col(f"`{name.replace('`', '``')}`").alias(var))
    # translate muParser grammar → Spark SQL ('^' is POWER there, XOR here)
    rewritten = evalexpr.translate(str(expr), columns=colmap)
    tmp = res.df.select(*select_cols)
    out = tmp.select(
        "series", "ts_ns", F.expr(rewritten).cast("double").alias("value")
    )
    # NaN results are dropped (eval.cpp drops non-finite outputs)
    out = out.filter(F.col("value").isNotNull() & ~F.isnan(F.col("value")))
    res.df = out
    res.value_cols = ["value"]
    return res


# ---------------------------------------------------------------------------
# terminal ranking nodes
# ---------------------------------------------------------------------------


def _node_top(res, node: ApplyNode):
    """Top-N series by time-weighted sum Σ value·Δt (documented intent of
    top.cpp:44-74 — a left Riemann integral; the reference's zero-initialised
    context silently drops the first point's contribution, we integrate all
    consecutive pairs).  Output: one row per series, ts = last ts,
    value = the integral, sorted descending."""
    n = node.param("N") or node.param("n")
    if n is None:
        raise QueryValidationError("top requires 'N'")
    n = int(n)
    if len(res.value_cols) != 1:
        raise QueryValidationError("top requires scalar samples (AKU_EHIGH_CARDINALITY)")
    c = res.value_cols[0]
    w = _stream_window(res.query)
    nxt_ts = F.lead(F.col("ts_ns")).over(w)
    contrib = (nxt_ts - F.col("ts_ns")) / F.lit(NANOS_PER_SEC) * F.col(f"`{c}`")
    per_series = (
        res.df.withColumn("__contrib", contrib)
        .groupBy("series")
        .agg(
            F.max("ts_ns").alias("ts_ns") if res.query.range.forward
            else F.min("ts_ns").alias("ts_ns"),
            F.sum("__contrib").alias("value"),
        )
        .orderBy(F.col("value").desc(), F.col("series").asc())
        .limit(n)
    )
    res.df = per_series.select("series", "ts_ns", "value")
    res.value_cols = ["value"]
    res.presorted = True
    return res


def _spacesaver_sketch(res, node: ApplyNode, weighted: bool, portion: float):
    """ε-bounded SpaceSaving sketch mode (``approx: true``) — the actual
    reference algorithm (spacesaver.h:12-190): M = ⌈1/error⌉ counters fed
    by the sample stream in query order; a new item beyond capacity evicts
    the min-count counter and inherits its count as both seed and error
    bound; report items whose guaranteed count ``count − error`` exceeds
    ``portion · N`` (spacesaver.h:69-77), value = the (over)estimate,
    ts = the counter-creation sample's timestamp (spacesaver.h:138 — set
    on insert, never on increment), sorted by count descending.

    Distribution model — chunked mergeable summaries: the stream is cut
    into ``merge-chunks`` (default: the session's ``defaultParallelism``,
    so an unconfigured caller gets a parallel fold, not a single
    sequential Python task over the whole range) equal time slices; each
    slice is SpaceSaving-folded independently (bounded M-counter state,
    one sequential pass), and the per-chunk summaries merge commutatively:

        count̂(x) = Σ_present ĉᵢ(x) + Σ_absent minᵢ
        error(x) = Σ_present eᵢ(x) + Σ_absent minᵢ

    where ``minᵢ`` is chunk i's smallest counter (0 if the chunk never
    filled) — the SpaceSaving bound for an item absent from a full
    summary.  Since Σ counts = Nᵢ within a chunk, minᵢ ≤ Nᵢ/M ≤ ε·Nᵢ, so
    the merged error stays ≤ ε·N: the ε-guarantee survives the merge
    (Agarwal et al., "Mergeable Summaries", PODS'12).  With one chunk
    this is exactly the reference's sequential algorithm.

    Determinism divergences from the reference, all documented intent:
    the reference iterates an unordered_map to find the eviction victim
    (spacesaver.h:124-131 — tie order is memory-layout-dependent), we
    evict the (count, series)-lexicographic minimum; its hash-map stream
    order for equal timestamps is likewise unspecified, we fold ties in
    series order.  Merged ts = the counter ts from the first chunk in
    stream order containing the item.  Missing data: the reference
    raises AKU_EMISSING_DATA_NOT_SUPPORTED on null/NaN samples in
    weighted mode (spacesaver.h weighted add path); this sketch instead
    *drops* null/NaN-weighted samples before the fold (the filter
    below), matching how the exact distributed mode's F.sum ignores
    nulls — streams with missing data succeed here where the reference
    errors.  Validation: ``error`` > 1 is accepted (M clamps to 1,
    matching spacesaver.h:49-53, which only rejects error == 0);
    negative ``error`` is rejected here, stricter than the reference,
    whose ceil(1/error) < 0 path is nonsensical.

    Scale shape: one shuffle (groupBy chunk), per-chunk Arrow-batched
    fold with O(M) state, then a summary-level aggregation over ≤ C·M
    rows.  Size ``merge-chunks`` so one time slice fits an executor's
    Arrow batch (chunks ≈ stream_bytes / executor_batch_bytes); the
    summary merge is independent of sample count.
    """
    error = node.param("error")
    if error is None or float(error) == 0.0:
        # reference: "`error` can't be 0." (spacesaver.h:50-53)
        raise QueryValidationError("'error' can't be 0")
    error = float(error)
    if error < 0.0:
        raise QueryValidationError("'error' must be positive")
    M = max(1, int(math.ceil(1.0 / error)))
    k = node.param("merge-chunks")
    if k is None:
        k = res.df.sparkSession.sparkContext.defaultParallelism
    k = int(k)
    if k < 1:
        raise QueryValidationError("'merge-chunks' must be >= 1")
    c = res.value_cols[0]
    rng = res.query.range
    forward = rng.forward
    lo, hi = rng.lo_ns, rng.hi_ns
    span = max(hi - lo, 1)
    step = -(-span // k)  # ceil
    # chunk index increases along stream order for either direction
    pos = (F.col("ts_ns") - F.lit(lo)) if forward else (F.lit(hi - 1) - F.col("ts_ns"))
    weight = F.col(f"`{c}`").cast("double") if weighted else F.lit(1.0)

    stream = res.df.select(
        (pos / F.lit(step)).cast("long").alias("__chunk"),
        "series",
        "ts_ns",
        weight.alias("__w"),
    ).filter(F.col("__w").isNotNull() & ~F.isnan(F.col("__w")))

    out_schema = (
        "__chunk long, series string, cnt double, err double, "
        "ts_ns long, chunk_n double, chunk_min double"
    )

    def fold_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["ts_ns", "series"], ascending=[forward, True]
        )
        counters: dict[str, list] = {}
        total = 0.0
        for s, t, w in zip(pdf["series"], pdf["ts_ns"], pdf["__w"]):
            ctr = counters.get(s)
            if ctr is not None:
                ctr[0] += w
            elif len(counters) < M:
                counters[s] = [w, 0.0, t]
            else:
                victim = min(
                    counters.items(), key=lambda kv: (kv[1][0], kv[0])
                )
                minc = victim[1][0]
                del counters[victim[0]]
                counters[s] = [w + minc, minc, t]
            total += w
        full = len(counters) >= M
        chunk_min = min(v[0] for v in counters.values()) if full else 0.0
        chunk = int(pdf["__chunk"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                "__chunk": chunk,
                "series": list(counters.keys()),
                "cnt": [v[0] for v in counters.values()],
                "err": [v[1] for v in counters.values()],
                "ts_ns": [v[2] for v in counters.values()],
                "chunk_n": total,
                "chunk_min": chunk_min,
            }
        )

    # batched grouped map (guide §4.5): drops the group-delimiting JVM
    # sort of the whole stream (the fold re-sorts its chunk in pandas
    # anyway) and amortizes the Python boundary across a partition's
    # chunks; the fold itself is unchanged.
    summaries = grouped_map_batched(
        stream, ["__chunk"], fold_chunk, out_schema,
        ["__chunk", "series", "cnt", "err", "ts_ns", "chunk_n", "chunk_min"],
    ).localCheckpoint(eager=True)
    # summaries feeds BOTH the chunk-stats total and the per-series merge;
    # unmaterialized, the whole scan + Python fold would execute twice.
    # Size is bounded by C chunks × M counters — independent of sample
    # count — so the eager checkpoint is small at any scale.
    # chunk-level stats once per chunk; totals are a broadcast-sized frame
    chunk_stats = summaries.groupBy("__chunk").agg(
        F.first("chunk_n").alias("chunk_n"), F.first("chunk_min").alias("chunk_min")
    )
    totals = chunk_stats.select(
        F.sum("chunk_n").alias("__N"), F.sum("chunk_min").alias("__minsum")
    )
    merged = (
        summaries.groupBy("series")
        .agg(
            F.sum("cnt").alias("__cnt_present"),
            F.sum("err").alias("__err_present"),
            F.sum("chunk_min").alias("__min_present"),
            F.min(F.struct("__chunk", "ts_ns")).alias("__first"),
        )
        .crossJoin(F.broadcast(totals))
        .withColumn("__absent", F.col("__minsum") - F.col("__min_present"))
        .filter(
            F.col("__cnt_present") - F.col("__err_present")
            > F.col("__N") * F.lit(portion)
        )
        .select(
            "series",
            F.col("__first.ts_ns").alias("ts_ns"),
            (F.col("__cnt_present") + F.col("__absent")).alias("value"),
        )
        .orderBy(F.col("value").desc(), F.col("series").asc())
    )
    res.df = merged
    res.value_cols = ["value"]
    res.presorted = True
    return res


def _node_spacesaver(res, node: ApplyNode, weighted: bool):
    """frequent-items / heavy-hitters (spacesaver.h:12-190).  Two modes:

    * default — the reference approximates with a SpaceSaving sketch
      sized 1/error because it streams single-core; distributed exact
      group-by returns the exact answer the sketch approximates: items
      whose count (or summed weight) exceeds portion·N, value = the
      count, ts = last seen, sorted descending.
    * ``approx: true`` — the reference's actual ε-bounded SpaceSaving
      semantics via chunked mergeable summaries (:func:`_spacesaver_sketch`),
      mirroring the anomaly-detector's precise/approx split.
    """
    portion = node.param("portion")
    if portion is None:
        raise QueryValidationError("frequent-items requires 'portion'")
    portion = float(portion)
    if not 0.0 <= portion <= 1.0:
        raise QueryValidationError("'portion' must be in [0, 1]")
    if len(res.value_cols) != 1:
        raise QueryValidationError("spacesaver requires scalar samples")
    if node.param("approx"):
        return _spacesaver_sketch(res, node, weighted, portion)
    c = res.value_cols[0]
    weight = F.col(f"`{c}`") if weighted else F.lit(1.0)
    per_series = res.df.groupBy("series").agg(
        (F.max("ts_ns") if res.query.range.forward else F.min("ts_ns")).alias("ts_ns"),
        F.sum(weight).alias("value"),
    ).localCheckpoint(eager=True)
    # per_series feeds BOTH the total (below) and the filtered output;
    # unmaterialized, the scan+aggregate subtree would execute twice (the
    # total's subquery re-ran the whole input scan).  The frame is one row
    # per series — O(cardinality), the operator's own output bound — so
    # the checkpoint is small at any scale; eager localCheckpoint (not
    # persist) for the same GC-release rationale as dedup.minhash_lsh_pairs.
    total = per_series.select(F.sum("value").alias("__total"))
    out = (
        per_series.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("__total") * F.lit(portion))
        .select("series", "ts_ns", "value")
        .orderBy(F.col("value").desc(), F.col("series").asc())
    )
    res.df = out
    res.value_cols = ["value"]
    res.presorted = True
    return res


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_NODES = {
    "abs": _node_abs,
    "scale": _node_scale,
    "rate": _node_rate,
    "counter-rate": _node_counter_rate,
    "accumulate": _node_accumulate,
    "cusum": _node_accumulate,
    "sum": lambda r, n: _horizontal(r, n, "sum"),
    "diff": lambda r, n: _horizontal(r, n, "diff"),
    "multiply": lambda r, n: _horizontal(r, n, "multiply"),
    "divide": lambda r, n: _horizontal(r, n, "divide"),
    "sma": _node_sma,
    "sma-error": lambda r, n: _node_sma(r, n, delta=True),
    "cma": _node_cma,
    "ewma": _node_ewma,
    "ewma-error": lambda r, n: _node_ewma(r, n, delta=True),
    "eval": _node_eval,
    "sax": _node_sax,
    "anomaly-detector": _node_anomaly,
    "top": _node_top,
    "frequent-items": lambda r, n: _node_spacesaver(r, n, weighted=False),
    "heavy-hitters": lambda r, n: _node_spacesaver(r, n, weighted=True),
}


def apply_pipeline(res, q: Query, allow_irregular: bool = False):
    """Apply nodes in listed order (queryparser.cpp:2079-2113); terminal
    nodes only at the tail (queryprocessor.cpp:48-58).

    ``allow_irregular=True`` relaxes the reference's AKU_EREGULLAR_EXPECTED
    gate and lets :data:`REGULAR_REQUIRED` nodes run over raw (select/join)
    series — a documented engine extension: the per-series window semantics
    are well-defined here because every stream node sorts by (series, ts),
    whereas the reference only guarantees them on bucketed data.
    """
    from akumuli_spark.query.plan import QueryKind

    regular = q.kind in (QueryKind.GROUP_AGGREGATE, QueryKind.GROUP_AGGREGATE_JOIN)
    for i, node in enumerate(q.apply):
        if node.name not in _NODES:
            raise QueryValidationError(f"unknown apply node {node.name!r}")
        if node.name in TERMINAL_NODES and i != len(q.apply) - 1:
            raise QueryValidationError(
                f"terminal node {node.name!r} must be last in the apply chain"
            )
        if (
            node.name in REGULAR_REQUIRED
            and not regular
            and not allow_irregular
        ):
            raise QueryValidationError(
                f"{node.name!r} requires regular (group-aggregate) data "
                "(AKU_EREGULLAR_EXPECTED, sliding_window.cpp:76/sax.cpp:53); "
                "pass allow_irregular=True to run it over raw series"
            )
        res = _NODES[node.name](res, node)
    return res
