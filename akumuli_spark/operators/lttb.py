"""Largest-Triangle-Three-Buckets downsampling — the line-chart
companion of the candlesticks operator (nbtree.h:218-219 gives the
reference OHLC-per-pixel; LTTB (Steinarsson 2013, public MSc thesis) is
the standard shape-preserving alternative every modern TSDB ships).

Per series: first and last points are always kept; the interior points
are split into ``n_out − 2`` equal-count index buckets, and each bucket
contributes the point forming the largest triangle with the PREVIOUSLY
CHOSEN point and the NEXT bucket's average — a sequential recursion, so
execution is an Arrow-batched ``applyInPandas`` per series (the same
shape as ewma/sax: no driver state, partitioned by the series key).

Determinism contract (mirrored exactly by the DuckDB oracle in
``lttb_sql``): x-coordinates are ``(ts_ns − first_ts)`` cast to double
(identical IEEE rounding on both engines), bucket of 1-based interior
index i is ``((i−1)·(n_out−2)) div (n−2)``, the next-bucket average
uses a SEQUENTIAL left-fold sum (python ``sum`` ↔ DuckDB list_sum — not
numpy's pairwise sum, which re-associates), the area comparand is
``|(xp−xa)(yc−yp) − (xp−xc)(ya−yp)|`` evaluated in that literal order,
and ties break toward the earliest point.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def _lttb_series(ts: list[int], ys: list[float], n_out: int):
    """Pure-python LTTB over one ordered series; returns kept indices."""
    n = len(ts)
    if n <= n_out:
        return list(range(n))
    t0 = ts[0]
    xs = [float(t - t0) for t in ts]
    n_buckets = n_out - 2
    # interior 1-based index i -> bucket ((i-1)*n_buckets) // (n-2)
    buckets: list[list[int]] = [[] for _ in range(n_buckets)]
    for i in range(1, n - 1):
        buckets[((i - 1) * n_buckets) // (n - 2)].append(i)
    chosen = [0]
    prev = 0
    for k in range(n_buckets):
        nxt = buckets[k + 1] if k + 1 < n_buckets else [n - 1]
        xa = sum(xs[j] for j in nxt) / len(nxt)
        ya = sum(ys[j] for j in nxt) / len(nxt)
        xp, yp = xs[prev], ys[prev]
        best_i, best_area = None, -1.0
        for c in buckets[k]:
            area = abs((xp - xa) * (ys[c] - yp) - (xp - xs[c]) * (ya - yp))
            if area > best_area:  # strict: ties keep the earliest point
                best_i, best_area = c, area
        if best_i is None:  # empty bucket (n-2 < n_buckets cannot happen)
            continue
        chosen.append(best_i)
        prev = best_i
    chosen.append(n - 1)
    return chosen


def lttb(df: DataFrame, n_out: int,
         value_col: str = "value") -> DataFrame:
    """Downsample each series to at most ``n_out`` shape-preserving
    points.  Input: (series, ts_ns, <value_col>); output: the selected
    subset, same schema.  Series with ≤ n_out points pass through."""
    if n_out < 3:
        raise ValueError("n_out must be at least 3")

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        # (ts, value) sort key: duplicate timestamps would otherwise
        # leave the point order engine-dependent
        pdf = pdf.sort_values(["ts_ns", value_col]).reset_index(drop=True)
        keep = _lttb_series(
            [int(t) for t in pdf["ts_ns"]],
            [float(v) for v in pdf[value_col]],
            n_out,
        )
        return pdf.iloc[keep]

    schema = f"series string, ts_ns long, {value_col} double"
    return (
        df.select("series", "ts_ns", value_col)
        .groupBy("series")
        .applyInPandas(per_series, schema)
    )


def lttb_sql(inner_sql: str, n_out: int, value_col: str = "value") -> str:
    """DuckDB twin of :func:`lttb` — a recursive CTE whose per-step work
    is pure list lambdas (the spacesaver-oracle technique: no aggregates
    in the recursive term), walking the same bucket recursion with the
    same float-op order and the same earliest-point tie-break.
    ``inner_sql`` must yield (series, ts_ns, <value_col>)."""
    nb = n_out - 2
    return f"""
WITH RECURSIVE
src AS ({inner_sql}),
ordered AS (
  SELECT series, ts_ns, "{value_col}" AS y,
         count(*) OVER (PARTITION BY series) AS n
  FROM src
),
packed AS (
  SELECT series, any_value(n)::BIGINT AS n,
         list(struct_pack(t := ts_ns, y := y) ORDER BY ts_ns, y) AS pts
  FROM ordered GROUP BY series
),
walk AS (
  SELECT series, n, pts, 0::BIGINT AS k, 1::BIGINT AS prev, [1::BIGINT] AS sel
  FROM packed WHERE n > {n_out}
  UNION ALL
  SELECT series, n, pts, k + 1, best, list_append(sel, best)
  FROM (
    SELECT series, n, pts, k, prev, sel,
      CASE WHEN k + 1 < {nb}
           THEN list_filter(range(2, n), j -> ((j - 2) * {nb}) // (n - 2) = k + 1)
           ELSE [n] END AS nxt,
      list_sum(list_transform(nxt, j -> (pts[j].t - pts[1].t)::DOUBLE)) / len(nxt) AS ax,
      list_sum(list_transform(nxt, j -> pts[j].y)) / len(nxt) AS ay,
      -(list_max(list_transform(
          list_filter(range(2, n), j -> ((j - 2) * {nb}) // (n - 2) = k),
          j -> struct_pack(
            area := abs(
              ((pts[prev].t - pts[1].t)::DOUBLE - ax) * (pts[j].y - pts[prev].y)
              - ((pts[prev].t - pts[1].t)::DOUBLE - (pts[j].t - pts[1].t)::DOUBLE)
                * (ay - pts[prev].y)),
            negj := -j))).negj) AS best
    FROM walk WHERE k < {nb}
  )
),
final AS (
  SELECT series, pts, list_append(sel, n) AS sel FROM walk WHERE k = {nb}
),
big_out AS (
  SELECT series, pts[s].t AS ts_ns, pts[s].y AS "{value_col}"
  FROM final, unnest(sel) AS u(s)
)
SELECT series, ts_ns, "{value_col}" FROM big_out
UNION ALL
SELECT series, ts_ns, y AS "{value_col}" FROM ordered WHERE n <= {n_out}
""".strip()
