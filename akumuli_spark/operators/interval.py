"""Bucketized interval (range) join: samples × time windows.

The reference has no interval join (single-node, it would nested-loop;
its closest surface is the per-query ``range`` clause), but "which
samples fall inside which windows" is a constant analytics shape —
maintenance windows, incident spans, session bounds, A/B exposure
intervals.  Naively it is an inequality join, which Spark plans as a
broadcast-nested-loop (driver-sized small side) or, worse, a cartesian.

The scale-first plan is the standard bucketization: map each interval
onto every fixed-width time bucket it overlaps (``sequence`` +
``explode``), map each sample onto its single bucket, equi-join on the
bucket key, and keep pairs passing the exact containment predicate.
Because a sample has exactly ONE bucket, each qualifying (sample,
interval) pair meets in exactly one bucket — no post-join dedup.

Sizing: an interval fans out into ceil(span / bucket_ns) + 1 rows, so
pick ``bucket_ns`` near the typical interval span — the interval table
(usually the small side) carries the fan-out, the sample table never
replicates.  Bucket skew = genuinely overlapping windows at one time;
AQE's skew-join split applies to the equi-join as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F


def _bucket(col: str, bucket_ns: int) -> Column:
    """Exact integer floor-division bucket key.

    ``F.floor(col / lit)`` goes through IEEE double, which has only 53
    mantissa bits; int64 epoch-ns timestamps (~1.7e18) lose the low
    ~8 bits, so a value within ~256 ns of a bucket-width multiple can
    be floored into the WRONG bucket — and since the containment
    predicate only filters pairs that already met in a bucket, a
    qualifying pair could silently never meet.  ``(x - pmod(x, b)) div
    b`` stays in exact int64 arithmetic and is true floor division
    (correct for negative values too, unlike bare ``div`` truncation).
    """
    b = int(bucket_ns)
    x = f"`{col}`" if col.isidentifier() else f"({col})"
    return F.expr(f"({x} - pmod({x}, {b})) div {b}")


def interval_join(samples: DataFrame, intervals: DataFrame,
                  bucket_ns: int, ts_col: str = "ts_ns",
                  start_col: str = "start_ns",
                  end_col: str = "end_ns") -> DataFrame:
    """Inner-join each sample to every interval with
    ``start <= ts < end`` (semi-open, matching the engine's range
    semantics).  Output carries all sample columns plus all interval
    columns; column names must not collide (rename before calling).

    Intervals with ``end <= start`` are empty ranges and dropped, the
    same contract as an empty query range.
    """
    if bucket_ns <= 0:
        raise ValueError("bucket_ns must be positive")
    iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "__b",
        F.explode(
            F.sequence(
                _bucket(start_col, bucket_ns),
                # end is exclusive: the last covered ns is end-1
                _bucket(f"`{end_col}` - 1", bucket_ns),
            )
        ),
    )
    sm = samples.withColumn("__b", _bucket(ts_col, bucket_ns))
    return (
        sm.join(iv, "__b")
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__b")
    )


def interval_join_sql(samples_cte: str, intervals_cte: str,
                      samples_name: str, intervals_name: str,
                      ts_col: str = "ts_ns", start_col: str = "start_ns",
                      end_col: str = "end_ns",
                      select: str = "*") -> str:
    """DuckDB twin: the plain inequality join (DuckDB's IEJoin handles
    it natively) — same pairs, no bucketization artifacts to replay
    because bucketization is pair-exact by construction."""
    return f"""
WITH {samples_cte},
{intervals_cte}
SELECT {select}
FROM {samples_name} s JOIN {intervals_name} i
  ON s.{ts_col} >= i.{start_col} AND s.{ts_col} < i.{end_col}
""".strip()


def interval_anti_join(samples: DataFrame, intervals: DataFrame,
                       bucket_ns: int, ts_col: str = "ts_ns",
                       start_col: str = "start_ns",
                       end_col: str = "end_ns") -> DataFrame:
    """Samples covered by NO interval — the exclusion form (drop
    maintenance windows / incident spans before aggregating).

    Coverage depends only on the timestamp, so the cover set is
    computed over DISTINCT timestamps (bounded by time range ÷
    resolution, typically far smaller than the sample count) and
    anti-joined back — the sample table itself is never fanned out.
    """
    covered = (
        interval_join(
            samples.select(ts_col).distinct(), intervals, bucket_ns,
            ts_col=ts_col, start_col=start_col, end_col=end_col,
        )
        .select(ts_col)
        .distinct()
    )
    return samples.join(covered, ts_col, "left_anti")
