"""Stateful streaming anomaly detection: the continuous form of the
``anomaly-detector`` apply token (precise EWMA mode — see
``query/apply.py::_node_anomaly`` and the reference's
anomalydetector.cpp:332-368 EWMASlidingWindow).

The batch detector replays a whole range per query; a TSDB wants the
same forecast maintained *incrementally* as samples arrive.  This is
Spark's custom-stateful-operator shape: ``applyInPandasWithState``
keyed by series, with the EWMA recursion's state — (frames seen,
warm-up accumulator, current smoothed value) — carried across
micro-batches by the state store, exactly the warm-up state machine of
``_forecast_preds``:

* frames 0..9 accumulate; no forecast is emitted (forecast NULL);
* frame 10's forecast is the warm-up mean (``acc * 0.1``);
* thereafter forecast = previous EWMA, then
  ``ewma ← α·x + (1−α)·ewma``.

Invariant (pinned by test): processing a series split across ANY
micro-batch boundaries yields bit-identical forecasts to the batch
recursion over the concatenated input — state resume is exact, so a
restart from the checkpoint continues the same numbers.

Ordering contract: rows are forecast in ``ts_ns`` order *within* each
micro-batch, and batches are assumed time-ordered per series (true of
the ingest spool, which gates late writes upstream —
``ingest.py::gate_and_commit_batch``).  A production deployment layers
a watermark upstream for reordering buffers; the state machine itself
is order-faithful to whatever sequence it is fed, like the reference's
sliding window.

Scale shape: state is three scalars per series (O(series) total,
store-managed, no driver state); compute is one Arrow-batched Python
pass per (series, micro-batch).  The cross-series F2 gate of the batch
detector is a per-timestep frame norm — at streaming time that is a
downstream windowed aggregation over this operator's error column
(``F.sum(err*err)`` per time bucket), deliberately not fused here so
the forecast state stays per-series partitioned.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from akumuli_spark.query.apply import ANOMALY_EWMA_WARMUP

#: (series, ts_ns, value, forecast, err) — forecast/err NULL during
#: warm-up, mirroring the batch path's excluded seed rows
OUTPUT_SCHEMA = (
    "series string, ts_ns long, value double, forecast double, err double"
)
STATE_SCHEMA = "cnt int, acc double, ewma double"


def streaming_ewma_forecast(parsed: DataFrame, alpha: float) -> DataFrame:
    """Continuous per-series one-step-ahead EWMA forecast stream.

    Input: a streaming frame with (series, ts_ns, value); output one row
    per input sample with ``forecast`` (NULL for the first
    ``ANOMALY_EWMA_WARMUP`` frames of each series) and
    ``err = forecast − value`` (the batch path's error convention).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    a = float(alpha)
    if not 0.0 <= a <= 1.0:
        raise ValueError("`alpha` should be in [0, 1] range")

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (series,) = key
        if state.exists:
            cnt, acc, ewma = state.get
        else:
            cnt, acc, ewma = 0, 0.0, math.nan
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_ns")
            for ts, x in zip(pdf["ts_ns"], pdf["value"]):
                x = float(x)
                if cnt >= ANOMALY_EWMA_WARMUP:
                    f = ewma
                    ewma = a * x + (1 - a) * ewma
                    out.append((series, int(ts), x, f, f - x))
                else:
                    acc += x
                    cnt += 1
                    if cnt == ANOMALY_EWMA_WARMUP:
                        ewma = acc * 0.1
                    out.append((series, int(ts), x, None, None))
        state.update((cnt, acc, ewma))
        yield pd.DataFrame(
            out, columns=["series", "ts_ns", "value", "forecast", "err"]
        )

    return parsed.groupBy("series").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
