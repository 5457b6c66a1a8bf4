"""Continuous as-of enrichment: the streaming form of
``operators/asof.py`` — each arriving left-metric sample is enriched
with the most recent right-metric value for its tag-set, maintained
incrementally instead of recomputed per query.

Spark's custom-stateful-operator shape (``applyInPandasWithState``
keyed by tag-set) with the smallest possible state: the last right
sample ``(rts, rv)`` per key — two scalars, store-managed, O(tagsets)
total.  Within a micro-batch rows are processed in ``(ts, side)`` order
with right-before-left at equal ts, the batch operator's ``ts' <= ts``
visibility rule; duplicate samples of one (tagset, ts, metric) are
SUM-combined first (the batch dup rule — assumed to co-arrive in one
micro-batch, which the ingest spool's time-ordered batches provide).

Invariant (pytest-pinned): splitting a time-ordered stream across ANY
micro-batch boundaries yields exactly the batch ``asof_join`` rows —
state resume is exact, so a checkpoint restart continues the same
stream.

Scale shape: one Arrow-batched pass per (tagset, micro-batch); no
stream-stream join buffers (a Spark stream-stream left join would
buffer BOTH sides within a watermark window and still cannot express
unbounded "latest value" carry — the two-scalar state can and does).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

OUTPUT_SCHEMA = (
    "series string, ts_ns long, left_value double, right_value double"
)
STATE_SCHEMA = "rts long, rv double"


def streaming_asof_join(
    parsed: DataFrame,
    left_metric: str,
    right_metric: str,
    tolerance_ns: int | None = None,
) -> DataFrame:
    """Enrich the ``left_metric`` stream with the latest ``right_metric``
    value per tag-set.  Input: a streaming frame with (series, metric,
    ts_ns, value) carrying both metrics; output one row per left sample:
    ``series`` = ``left|right tags`` (the join naming rule), the left
    value, and the carried right value (NULL before the first right
    sample, or when it is older than ``tolerance_ns``)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if tolerance_ns is not None and tolerance_ns <= 0:
        raise ValueError("tolerance_ns must be positive")
    head = f"{left_metric}|{right_metric}"

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (tagstr,) = key
        series = head if tagstr == "" else f"{head} {tagstr}"
        if state.exists:
            rts, rv = state.get
        else:
            rts, rv = None, math.nan
        out = []
        # One key's micro-batch rows arrive as an ITERATOR of Arrow
        # chunks; the (ts, side) walk is order-sensitive and the SUM dup
        # rule spans chunks, so the batch must be concatenated first.
        # Memory = one key's slice of one micro-batch — the quantity the
        # micro-batch interval already bounds.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            # batch dup rule: SUM-combine per (ts, metric) before the walk
            g = pdf.groupby(["ts_ns", "metric"], as_index=False)["value"].sum()
            g["__side"] = (g["metric"] != right_metric).astype("int64")
            g = g.sort_values(["ts_ns", "__side"])
            for ts, metric, v, side in zip(
                g["ts_ns"], g["metric"], g["value"], g["__side"]
            ):
                if side == 0:
                    rts, rv = int(ts), float(v)
                elif metric == left_metric:
                    carried = rv if rts is not None else None
                    if (
                        carried is not None
                        and tolerance_ns is not None
                        and int(ts) - rts > tolerance_ns
                    ):
                        carried = None
                    out.append((series, int(ts), float(v), carried))
        if rts is not None:
            state.update((rts, rv))
        yield pd.DataFrame(
            out, columns=["series", "ts_ns", "left_value", "right_value"]
        )

    both = parsed.filter(
        F.col("metric").isin([left_metric, right_metric])
    ).withColumn(
        "tagstr",
        F.when(
            F.instr(F.col("series"), " ") > 0,
            F.expr("substring(series, instr(series, ' ') + 1)"),
        ).otherwise(F.lit("")),
    )
    return both.groupBy("tagstr").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
