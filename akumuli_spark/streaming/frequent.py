"""Continuous frequent-items / heavy-hitters: the streaming form of the
``approx: true`` SpaceSaving sketch (``query/apply.py::_spacesaver_sketch``,
reference spacesaver.h:12-190) — the reference's own continuous-query
demo workload, maintained incrementally instead of replayed per query.

Sharding model: the stream is hash-partitioned by series —
shard = top-32-bits-of-md5(series) mod ``n_shards`` (the engine's
portable hash family) — and each shard keeps an independent M-counter
SpaceSaving summary in the state store, folded forward every
micro-batch.  This is the batch sketch's "chunk" with the stream cut by
KEY instead of time, which makes the merge *tighter* than the batch
path's time-slices: a series lives in exactly one shard, so its global
estimate is its own shard's counter verbatim (no absent-chunk
``min_i`` penalty), and its error bound e(x) ≤ min_shard ≤ ε·N_shard ≤
ε·N.  State per shard is O(M) scalars regardless of stream length;
total state O(M · n_shards).

Invariant (pinned by test): SpaceSaving is a left fold, so feeding a
shard's sub-stream through ANY micro-batch boundaries yields the same
summary as one sequential fold — the state resume is exact, matching a
reference model counter for counter.

Ordering contract: rows fold in (ts_ns, series) order within each
micro-batch and batches are assumed time-ordered (the ingest spool's
guarantee, as with ``detect.streaming_ewma_forecast``).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: per-batch emission: the shard's full current summary (arrays) plus a
#: sequence number so consumers can select each shard's latest row
OUTPUT_SCHEMA = (
    "shard int, seq long, series array<string>, cnt array<double>, "
    "err array<double>, ts_ns array<long>, total double, shard_min double"
)
STATE_SCHEMA = (
    "series array<string>, cnt array<double>, err array<double>, "
    "ts array<long>, total double, seq long"
)


def shard_expr(n_shards: int, col: str = "series"):
    """Engine-portable series shard (same md5 family as the pipeline
    ops — reproducible in any engine, unlike murmur3 ``F.hash``)."""
    return (
        F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10)
        .cast("bigint") % F.lit(int(n_shards))
    ).cast("int")


def streaming_spacesaver(parsed: DataFrame, error: float = 0.05,
                         n_shards: int = 8) -> DataFrame:
    """Continuous per-shard SpaceSaving summaries.

    Input: streaming (series, ts_ns, value) — value weights the count
    like the batch sketch's weighted mode; null/NaN rows are dropped
    (the batch mode's documented divergence).  Output: one summary row
    per (shard, micro-batch), see ``OUTPUT_SCHEMA``.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    error = float(error)
    if error == 0.0:
        raise ValueError("'error' can't be 0")
    if error < 0.0:
        raise ValueError("'error' must be positive")
    M = max(1, int(math.ceil(1.0 / error)))

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            names, cnts, errs, tss, total, seq = state.get
            counters = {
                s: [c, e, t]
                for s, c, e, t in zip(names, cnts, errs, tss)
            }
            total = float(total)
        else:
            counters, total, seq = {}, 0.0, 0
        for pdf in pdfs:
            pdf = pdf.dropna(subset=["value"])
            pdf = pdf.sort_values(["ts_ns", "series"])
            for s, t, w in zip(pdf["series"], pdf["ts_ns"], pdf["value"]):
                w = float(w)
                if math.isnan(w):
                    continue
                ctr = counters.get(s)
                if ctr is not None:
                    ctr[0] += w
                elif len(counters) < M:
                    counters[s] = [w, 0.0, int(t)]
                else:
                    # evict the (count, series)-lexicographic minimum —
                    # the batch sketch's deterministic tie-break
                    victim = min(
                        counters.items(), key=lambda kv: (kv[1][0], kv[0])
                    )
                    minc = victim[1][0]
                    del counters[victim[0]]
                    counters[s] = [w + minc, minc, int(t)]
                total += w
        seq += 1
        names = list(counters.keys())
        state.update((
            names,
            [counters[s][0] for s in names],
            [counters[s][1] for s in names],
            [counters[s][2] for s in names],
            total,
            seq,
        ))
        full = len(counters) >= M
        shard_min = min(v[0] for v in counters.values()) if full else 0.0
        yield pd.DataFrame({
            "shard": [shard],
            "seq": [seq],
            "series": [names],
            "cnt": [[counters[s][0] for s in names]],
            "err": [[counters[s][1] for s in names]],
            "ts_ns": [[counters[s][2] for s in names]],
            "total": [total],
            "shard_min": [shard_min],
        })

    keyed = parsed.select(
        shard_expr(n_shards).alias("shard"), "series", "ts_ns", "value"
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_report(summaries: DataFrame,
                         portion: float) -> DataFrame:
    """Batch-side report over the LATEST summary per shard: series whose
    guaranteed count ``cnt − err`` exceeds ``portion · N`` (N = total
    weight across shards) — the same report rule as the batch sketch,
    with the key-sharded simplification that a series' global counter IS
    its shard counter (see module docstring).

    Output: (series, ts_ns, value) sorted by value descending — the
    batch token's output shape.
    """
    from pyspark.sql import Window

    # latest summary per shard via a shard-partitioned window (the
    # summaries frame is shards × batches rows — index-sized; a
    # self-join on the sink view would also be resolution-ambiguous)
    w = Window.partitionBy("shard").orderBy(F.col("seq").desc())
    latest = (
        summaries.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__r")
    )
    totals = latest.agg(F.sum("total").alias("__N"))
    rows = latest.select(
        "shard",
        F.arrays_zip("series", "cnt", "err", "ts_ns").alias("z"),
    ).select("shard", F.explode("z").alias("e")).select(
        F.col("e.series").alias("series"),
        F.col("e.cnt").alias("cnt"),
        F.col("e.err").alias("err"),
        F.col("e.ts_ns").alias("ts_ns"),
    )
    return (
        rows.crossJoin(F.broadcast(totals))
        .filter(F.col("cnt") - F.col("err") > F.col("__N") * F.lit(float(portion)))
        .select("series", "ts_ns", F.col("cnt").alias("value"))
        .orderBy(F.col("value").desc(), F.col("series").asc())
    )
