"""Result formatters: CSV and RESP, matching the reference's output layer
(/root/reference/akumulid/query_results_pooler.cpp:229-300 RESP,
358-380 CSV, 434-477 format selection via ``output: {format, timestamp}``).

The reference emits ``series, timestamp, value[, value…]`` per row; tuples
(join / multi-func group-aggregate) render one value per component with
empty cells for absent components.  Timestamps render as ISO8601 basic
with 9-digit nanoseconds, or raw integers when ``timestamp: "raw"``.

These format a *collected iterator* — the driver-side edge of the system.
For bulk export, write parquet/CSV with the DataFrame writer instead; this
layer exists for protocol parity.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame


def iso_ts(ts_ns: int) -> str:
    dt = datetime.fromtimestamp(ts_ns // 10**9, tz=timezone.utc)
    frac = ts_ns % 10**9
    return dt.strftime("%Y%m%dT%H%M%S") + f".{frac:09d}"


def _fmt_value(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return ""
    if isinstance(v, float):
        return repr(v)
    return str(v)


def to_csv(df: DataFrame, value_cols: list[str] | None = None,
           raw_timestamps: bool = False) -> Iterator[str]:
    """Yield CSV lines ``series, ts, v1[, v2…]``."""
    cols = value_cols or [c for c in df.columns if c not in ("series", "ts_ns")]
    for row in df.toLocalIterator():
        ts = str(row["ts_ns"]) if raw_timestamps else iso_ts(row["ts_ns"])
        vals = ", ".join(_fmt_value(row[c]) for c in cols)
        yield f"{row['series']}, {ts}, {vals}"


def to_resp(df: DataFrame, value_cols: list[str] | None = None,
            raw_timestamps: bool = False) -> Iterator[str]:
    """Yield RESP frames: ``+series``, ``+ts``, then the value (scalar) or
    a ``*N`` array (tuple rows), as the reference's RESPOutputFormatter."""
    cols = value_cols or [c for c in df.columns if c not in ("series", "ts_ns")]
    for row in df.toLocalIterator():
        yield f"+{row['series']}"
        ts = str(row["ts_ns"]) if raw_timestamps else iso_ts(row["ts_ns"])
        yield f"+{ts}"
        if len(cols) == 1:
            yield f"+{_fmt_value(row[cols[0]])}"
        else:
            yield f"*{len(cols)}"
            for c in cols:
                yield f"+{_fmt_value(row[c])}"
