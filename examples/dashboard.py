"""Monitoring-dashboard query set composed from the extension operators
— the panels a Grafana-class UI renders against a TSDB, each one an
oracle-gated operator from this repo:

    line chart        → LTTB downsampling           (operators/lttb.py)
    candlesticks      → per-pixel OHLC              (operators/candlesticks.py)
    gap-free table    → group-aggregate + fill      (operators/fill.py)
    leaderboard       → top-k series per bucket     (operators/fill.py)
    latency heatmap   → value histogram             (operators/histogram.py)
    quantile band     → p50/p90/p99 group-aggregate (engine percentile funcs)
    correlated pair   → cross-metric Pearson        (operators/histogram.py)
    counter rate      → reset-aware counter-rate    (query/apply.py)
    enriched stream   → as-of join                  (operators/asof.py)

    python examples/dashboard.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from akumuli_spark import get_spark  # noqa: E402
from akumuli_spark.operators.asof import asof_join  # noqa: E402
from akumuli_spark.operators.fill import fill_gaps, top_series_per_bucket  # noqa: E402
from akumuli_spark.operators.histogram import (  # noqa: E402
    metrics_correlation,
    value_histogram,
)
from akumuli_spark.operators.lttb import lttb  # noqa: E402
from akumuli_spark.query.engine import execute_query  # noqa: E402
from akumuli_spark.query.plan import parse_timestamp_ns  # noqa: E402
from akumuli_spark.sources.testdata import app_metrics_view, metrics_view  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
NS = 10**9
E0 = parse_timestamp_ns("20240101T000000")
E1 = parse_timestamp_ns("20240201T000000")
T96 = parse_timestamp_ns("19960101T000000")
T97 = parse_timestamp_ns("19970101T000000")
STEP_4H = 4 * 3600 * NS


def main() -> None:
    spark = get_spark("dashboard-demo")
    app = app_metrics_view(spark, SF_DIR)
    li = metrics_view(spark, SF_DIR)

    def panel(title, df, n=5):
        print(f"\n== {title} ==")
        for row in df.limit(n).collect():
            print("  ", row.asDict())

    # 1. line chart: each click series down to 40 shape-preserving points
    pts = execute_query(spark, {
        "select": "app.click", "range": {"from": E0, "to": E1},
    }, app)
    panel("LTTB line chart (40 pts/series)", lttb(pts, n_out=40))

    # 2. gap-free 4h table: carry the previous bucket through holes
    agg = execute_query(spark, {
        "group-aggregate": {"metric": "app.click", "step": "4h",
                            "func": ["sum", "count"]},
        "range": {"from": E0, "to": E1},
    }, app)
    panel("gap-filled 4h buckets", fill_gaps(agg, anchor_ns=E0,
                                             step_ns=STEP_4H))

    # 3. leaderboard: top-3 user tagsets by 4h click volume
    agg1 = execute_query(spark, {
        "group-aggregate": {"metric": "app.click", "step": "4h",
                            "func": "sum"},
        "range": {"from": E0, "to": E1},
    }, app)
    panel("top-3 series per bucket", top_series_per_bucket(
        agg1, anchor_ns=E0, step_ns=STEP_4H, k=3, value_col="sum"))

    # 4. heatmap column: qty distribution in 10 bins
    panel("value histogram", value_histogram(
        li, "lineitem.qty", T96, T97, lo=0.0, hi=50.0, n_bins=10))

    # 5. latency-style quantile band per week
    panel("p50/p90/p99 weekly", execute_query(spark, {
        "group-aggregate": {"metric": "lineitem.price", "step": "7d",
                            "func": ["p50", "p90", "p99"]},
        "range": {"from": T96, "to": T97},
    }, li))

    # 6. correlation matrix cell: price vs qty per tagset
    panel("price↔qty correlation", metrics_correlation(
        li, "lineitem.price", "lineitem.qty", T96, T97))

    # 7. counter rate with reset handling
    panel("counter-rate", execute_query(spark, {
        "select": "app.click", "range": {"from": E0, "to": E1},
        "apply": [{"name": "counter-rate"}],
    }, app))

    # 8. enriched stream: every click with the user's latest purchase
    panel("as-of join (click ⟵ last purchase)", asof_join(
        app, "app.click", "app.purchase", E0, E1))

    print("\nall panels rendered.")


if __name__ == "__main__":
    main()
