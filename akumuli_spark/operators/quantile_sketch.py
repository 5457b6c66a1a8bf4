"""Mergeable log-histogram quantile sketch with bounded relative error.

The repo's exact percentile path (``p50``/``p99`` aggregate funcs) sorts
values within each group — exact, but per-group memory grows with the
data.  This sketch is the bounded-state alternative for extreme-volume
groups, the quantile sibling of the SpaceSaving frequent-items mode and
the HLL distinct sketch: values land in sign-aware logarithmic bins
(``floor(ln|v|·k)``), bin counts are the whole state, and the quantile
readout walks the cumulative histogram.  This is the DDSketch/HDR-
histogram idea (Masson et al. 2019, public): relative error is bounded
by the bin width — ``e^(1/(2k)) − 1`` (≈0.78% at k=64) — regardless of
data volume or distribution.

Deterministic and engine-portable by construction (pure arithmetic, no
RNG, no engine-private sketch format): the DuckDB oracle replays the
identical binning and readout, so estimates cross-check exactly.

Two-stage mergeable API mirroring ``operators/distinct.py``:
``log_histogram`` produces the (group, bin, cnt) table — persist it,
union increments, SUM per bin to merge; ``quantiles_from_histogram``
reads any quantile set out of it.  State per group is at most
``k · ln(vmax/vmin)`` bins (~a few hundred for doubles spanning 6
decades at k=64).

Scale shape: one scan → groupBy(group, bin) two-phase agg (map-side
partials collapse each partition to ≤ bins rows); the readout windows
over the tiny bin table only.  Nothing value-keyed ever shuffles.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from akumuli_spark.smallframe import local_frame
#: bin ids for the three sign classes: negatives mirror below _ZERO_BIN
_ZERO_BIN = 0


def _check(k: int) -> None:
    if k <= 0:
        raise ValueError("k (bins per ln-unit) must be positive")


def log_histogram(df: DataFrame, col: str,
                  group_cols: Sequence[str] = (), k: int = 64) -> DataFrame:
    """Sign-aware log-binned counts for ``col``: bin 0 holds exact
    zeros, positive values map to ``2 + floor(ln(v)·k)`` shifted
    positive, negatives mirror to the negative side — so bin order is
    value order and a cumulative walk reads quantiles directly.
    Nulls and NaNs are ignored (matching aggregate-function skip
    semantics).  Output: (*group_cols, bin, cnt) — merge increments by
    SUM per (group, bin)."""
    _check(k)
    v = F.col(col).cast("double")
    # offset keeps positive-value bins strictly above _ZERO_BIN even for
    # ln(v)·k ≈ -1e9 (tiny magnitudes): the raw log bin is bounded by
    # |ln(4.9e-324)|·k < 745k, so ±(745k + 2) clears zero on both sides
    off = 746 * k
    logbin = F.floor(F.log(F.abs(v)) * F.lit(float(k))).cast("long")
    bin_ = (
        F.when(v == 0.0, F.lit(_ZERO_BIN))
        .when(v > 0.0, logbin + F.lit(off + 2))
        .otherwise(-(logbin + F.lit(off + 2)))
    )
    return (
        df.where(v.isNotNull() & ~F.isnan(v))
        .select(*group_cols, bin_.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _bin_value_expr(k: int):
    """Representative value of a bin: geometric midpoint e^{(b+0.5)/k}
    with the sign restored; 0 for the zero bin."""
    off = 746 * k
    b = F.col("bin")
    mag = lambda ab: F.exp((ab - F.lit(off + 2) + F.lit(0.5)) / F.lit(float(k)))
    return (
        F.when(b == _ZERO_BIN, F.lit(0.0))
        .when(b > 0, mag(b.cast("double")))
        .otherwise(-mag((-b).cast("double")))
    )


def quantiles_from_histogram(hist: DataFrame, qs: Sequence[float],
                             group_cols: Sequence[str] = (),
                             k: int = 64) -> DataFrame:
    """Read quantiles out of a :func:`log_histogram` table: for each q,
    the representative value of the first bin (in value order) whose
    cumulative count reaches ``ceil(q·n)`` (nearest-rank, the same
    convention for every engine).  Output: (*group_cols, q, est)."""
    _check(k)
    if not qs:
        raise ValueError("need at least one quantile")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError("quantiles must be in (0, 1]")
    gcols = list(group_cols)
    w = (
        Window.partitionBy(*gcols).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spark = hist.sparkSession
    q_df = local_frame(spark,
        [(float(q),) for q in sorted(set(qs))], "q double"
    )
    cum = hist.withColumn("__cum", F.sum("cnt").over(w)).withColumn(
        "__n", F.sum("cnt").over(Window.partitionBy(*gcols))
    )
    hit = (
        cum.crossJoin(F.broadcast(q_df))
        .where(F.col("__cum") >= F.ceil(F.col("q") * F.col("__n")))
        .groupBy(*gcols, "q")
        .agg(F.min("bin").alias("bin"))
    )
    return hit.select(*gcols, "q", _bin_value_expr(k).alias("est"))


def approx_quantiles(df: DataFrame, col: str, qs: Sequence[float],
                     group_cols: Sequence[str] = (),
                     k: int = 64) -> DataFrame:
    """One-shot compose of the two stages."""
    return quantiles_from_histogram(
        log_histogram(df, col, group_cols, k), qs, group_cols, k
    )


def approx_quantiles_sql(source_sql: str, qs: Sequence[float],
                         group_cols: Sequence[str] = (),
                         k: int = 64) -> str:
    """DuckDB twin: identical binning, cumulative walk, and readout.
    ``source_sql`` must yield the value as DOUBLE ``__v`` plus the
    group columns."""
    _check(k)
    off = 746 * k
    gsel = ", ".join(group_cols)
    gpfx = f"{gsel}, " if group_cols else ""
    gpart = f"PARTITION BY {gsel}" if group_cols else ""
    q_list = ", ".join(repr(float(q)) for q in sorted(set(qs)))
    return f"""
WITH __src AS ({source_sql}),
__hist AS (
  SELECT {gpfx}CASE WHEN __v = 0.0 THEN {_ZERO_BIN}
              WHEN __v > 0.0 THEN floor(ln(abs(__v)) * {float(k)})::BIGINT + {off + 2}
              ELSE -(floor(ln(abs(__v)) * {float(k)})::BIGINT + {off + 2}) END AS bin,
         count(*) AS cnt
  FROM __src WHERE __v IS NOT NULL AND NOT isnan(__v)
  GROUP BY ALL
),
__cum AS (
  SELECT {gpfx}bin, cnt,
         sum(cnt) OVER ({gpart} ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS c,
         sum(cnt) OVER ({gpart}) AS n
  FROM __hist
),
__hit AS (
  SELECT {gpfx}q.q, min(bin) AS bin
  FROM __cum CROSS JOIN
       (SELECT unnest([{q_list}])::DOUBLE AS q) q
  WHERE c >= ceil(q.q * n)
  GROUP BY {gpfx}q.q
)
SELECT {gpfx}q,
       CASE WHEN bin = {_ZERO_BIN} THEN 0.0
            WHEN bin > 0 THEN exp((bin - {off + 2} + 0.5) / {float(k)})
            ELSE -exp((-bin - {off + 2} + 0.5) / {float(k)}) END AS est
FROM __hit
""".strip()
