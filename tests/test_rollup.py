"""Rollup fast path: combining base-step partials must equal the direct
group-aggregate over raw points (the reference's inner-node-aggregate
consistency property)."""

from __future__ import annotations

import pytest

from akumuli_spark.query.engine import execute_query
from akumuli_spark.query.errors import QueryValidationError
from akumuli_spark.query.rollup import group_aggregate_from_rollup
from akumuli_spark.sources.resp import parse_resp_stage
from akumuli_spark.sources.testdata import app_metrics_view
from akumuli_spark.streaming.ingest import windowed_rollup_stream
from akumuli_spark.query.plan import parse_timestamp_ns
from tests.conftest import SF_DIR

NS = 10**9
MIN_NS = 60 * NS
E0 = parse_timestamp_ns("20240101T000000")
E1 = parse_timestamp_ns("20240201T000000")


@pytest.fixture(scope="module")
def raw(spark):
    return app_metrics_view(spark, SF_DIR)


@pytest.fixture(scope="module")
def rollup(spark, raw):
    # base-step rollup as the streaming ingest would maintain it
    # (batch-mode execution of the same plan)
    parsed_like = raw.select("series", "ts_ns", "value")
    return windowed_rollup_stream(parsed_like, step="1 minute").cache()


def test_rollup_matches_direct_group_aggregate(spark, raw, rollup):
    step = 60 * MIN_NS  # 1h, multiple of the 1-minute base step
    direct = execute_query(
        spark,
        {
            "group-aggregate": {
                "metric": "app.click",
                "step": step,
                "func": ["count", "sum", "min", "max", "mean"],
            },
            "range": {"from": E0, "to": E1},
        },
        raw,
    )
    fast = group_aggregate_from_rollup(
        rollup.filter("series like 'app.click %'"),
        E0, E1, step, ["count", "sum", "min", "max", "mean"], MIN_NS,
    )
    d = {(r["series"], r["ts_ns"]): (r["count"], r["sum"], r["min"], r["max"], r["mean"])
         for r in direct.collect()}
    f = {(r["series"], r["ts_ns"]): (r["count"], r["sum"], r["min"], r["max"], r["mean"])
         for r in fast.collect()}
    assert set(d) == set(f) and d
    for k in d:
        for a, b in zip(d[k], f[k]):
            assert a == pytest.approx(b, rel=1e-12), (k, d[k], f[k])


def test_rollup_refuses_unaligned(rollup):
    with pytest.raises(QueryValidationError):
        group_aggregate_from_rollup(rollup, E0 + 1, E1, 60 * MIN_NS, ["sum"], MIN_NS)
    with pytest.raises(QueryValidationError):
        group_aggregate_from_rollup(rollup, E0, E1, 90 * NS, ["sum"], MIN_NS)
    with pytest.raises(QueryValidationError):
        group_aggregate_from_rollup(rollup, E0, E1, 60 * MIN_NS, ["first"], MIN_NS)


def test_database_rollup_fast_path_matches_direct(spark, raw, rollup):
    """Database.query auto-routes servable group-aggregates through the
    attached rollup; results must equal the direct raw-scan path."""
    from akumuli_spark.api import open_database

    step = 60 * MIN_NS
    qjson = {
        "group-aggregate": {"metric": "app.click", "step": step,
                            "func": ["count", "sum", "min", "max", "mean"]},
        "range": {"from": E0, "to": E1},
    }
    db = open_database(spark, raw)
    direct = {tuple(r) for r in db.query(qjson).collect()}
    # materialize the rollup like the streaming sink would, so the fast
    # path reads the compact table, not the raw frame's lineage
    import tempfile

    rdir = tempfile.mkdtemp(prefix="rollup_sink_")
    rollup.write.mode("overwrite").parquet(rdir)
    db.attach_rollup(spark.read.parquet(rdir), MIN_NS)
    fast_df = db.query(qjson)
    fast = {tuple(r) for r in fast_df.collect()}
    assert fast == direct and fast
    # the fast-path plan must not read the raw metrics frame
    plan = fast_df._jdf.queryExecution().toString()
    assert "events.parquet" not in plan

    # non-servable queries (unaligned step) fall back to the direct path
    q2 = dict(qjson)
    q2["group-aggregate"] = {"metric": "app.click", "step": step + 1,
                             "func": "sum"}
    assert db.query(q2).count() > 0


def test_rollup_freshness_guard_falls_through(spark, raw, rollup):
    """A lagging streaming rollup (declared via complete_through_ns) must
    NOT serve a range extending past its coverage — same query JSON, same
    answer as the direct path, even though the rollup is missing the tail."""
    import tempfile

    from akumuli_spark.api import open_database

    step = 60 * MIN_NS
    mid = E0 + (E1 - E0) // 2  # bucket-aligned (E1-E0 is a whole number of days)
    qjson = {
        "group-aggregate": {"metric": "app.click", "step": step,
                            "func": ["count", "sum"]},
        "range": {"from": E0, "to": E1},
    }
    db = open_database(spark, raw)
    direct = {tuple(r) for r in db.query(qjson).collect()}

    # a rollup that only holds watermark-closed windows up to `mid`
    lagging = rollup.filter(f"bucket_us * 1000 < {mid}")
    rdir = tempfile.mkdtemp(prefix="rollup_lag_")
    lagging.write.mode("overwrite").parquet(rdir)
    db.attach_rollup(spark.read.parquet(rdir), MIN_NS, complete_through_ns=mid)

    # range past coverage → freshness guard falls through to raw scan
    full = db.query(qjson)
    assert {tuple(r) for r in full.collect()} == direct
    plan = full._jdf.queryExecution().toString()
    assert "events.parquet" in plan  # proves the direct path ran

    # range within coverage → still served from the rollup
    q_in = {
        "group-aggregate": {"metric": "app.click", "step": step,
                            "func": ["count", "sum"]},
        "range": {"from": E0, "to": mid},
    }
    fast_df = db.query(q_in)
    in_direct = {tuple(r) for r in
                 execute_query(spark, q_in, raw).collect()}
    assert {tuple(r) for r in fast_df.collect()} == in_direct and in_direct
    plan = fast_df._jdf.queryExecution().toString()
    assert "events.parquet" not in plan


def test_rollup_cascade_routes_to_coarsest(spark, tmp_path):
    """Multi-resolution routing: attach a 1-minute and a 1-hour rollup;
    an hour-aligned query must serve from the COARSE one (proven by
    poisoning the fine rollup's values — a fine-rollup answer would leak
    the poison), while a sub-hour query falls back to the fine rollup
    and a rollup-unservable query falls through to the raw path."""
    from pyspark.sql import functions as F

    from akumuli_spark.api import open_database
    from akumuli_spark.sources.testdata import app_metrics_view
    from akumuli_spark.streaming.ingest import windowed_rollup_stream
    from tests.conftest import SF_DIR

    am = app_metrics_view(spark, SF_DIR)
    base = am.select("series", "ts_ns", "value")
    fine = windowed_rollup_stream(base, step="1 minute")
    coarse = windowed_rollup_stream(base, step="1 hour")
    q_hour = {
        "group-aggregate": {"metric": "app.click", "step": "2h",
                            "func": ["sum", "count"]},
        "range": {"from": E0, "to": E1},
    }
    q_min = {
        "group-aggregate": {"metric": "app.click", "step": "5m",
                            "func": ["sum", "count"]},
        "range": {"from": E0, "to": E1},
    }
    db = open_database(spark, am)
    direct_hour = db.query(q_hour).collect()
    direct_min = db.query(q_min).collect()

    poisoned_fine = fine.withColumn("sum", F.col("sum") + 1e9)
    db.attach_rollup(poisoned_fine, 60 * NS)
    db.attach_rollup(coarse, 3600 * NS)
    served_hour = db.query(q_hour).collect()
    assert sorted(map(tuple, served_hour)) == sorted(map(tuple, direct_hour))
    # the 5m query can only use the fine rollup: the poison must show,
    # proving the cascade really routed the hour query elsewhere
    served_min = db.query(q_min).collect()
    assert any(r["sum"] > 1e8 for r in served_min)
    # unservable (tag predicate) falls through to raw regardless
    q_where = dict(q_hour, where={"page": ["p1"]})
    raw = db.query(q_where).collect()
    assert all(r["sum"] < 1e8 for r in raw)


def test_attach_rollup_replaces_stale_same_resolution(spark, raw, rollup):
    """Re-attaching a refreshed rollup of the SAME base step must replace
    the stale entry, not append next to it: a stale entry attached with
    complete_through_ns=None asserts completeness forever and would
    otherwise keep serving outdated buckets (ADVICE r8)."""
    from pyspark.sql import functions as F

    from akumuli_spark.api import open_database

    step = 60 * MIN_NS
    qjson = {
        "group-aggregate": {"metric": "app.click", "step": step,
                            "func": ["sum", "count"]},
        "range": {"from": E0, "to": E1},
    }
    db = open_database(spark, raw)
    direct = sorted(map(tuple, db.query(qjson).collect()))

    # stale materialization: poisoned sums, attached WITHOUT a
    # completeness bound (the batch-materialized contract)
    stale = rollup.withColumn("sum", F.col("sum") + 1e9)
    db.attach_rollup(stale, MIN_NS)
    assert any(r["sum"] > 1e8 for r in db.query(qjson).collect())

    # the refresh replaces it — queries must now serve the fresh buckets
    db.attach_rollup(rollup, MIN_NS)
    assert len(db._rollups) == 1  # one attachment per resolution
    served = sorted(map(tuple, db.query(qjson).collect()))
    assert served == direct


# ---------------------------------------------------------------------------
# Tiered serving: cold span from rollup partials, hot span from raw
# ---------------------------------------------------------------------------


def test_tiered_equals_direct_with_evicted_raw(spark):
    """The load-bearing claim: with raw rows RETENTION-EVICTED before
    the boundary and the rollup built ONLY from pre-boundary data, the
    stitched answer equals the direct full-range engine answer."""
    import math

    from pyspark.sql import functions as F

    from akumuli_spark.query.rollup import (
        group_aggregate_tiered,
        rollup_from_frame,
    )

    frame = app_metrics_view(spark, SF_DIR)
    e0 = parse_timestamp_ns("20240101T000000")
    day = 86_400 * 10**9
    begin, boundary, end = e0, e0 + 14 * day, e0 + 29 * day
    funcs = ["sum", "count", "mean", "min", "max"]

    rollup = rollup_from_frame(
        frame.filter(F.col("ts_ns") < boundary), day)
    raw_hot = frame.filter(F.col("ts_ns") >= boundary)
    tiered = group_aggregate_tiered(
        spark, raw_hot, rollup, "app.click",
        begin, boundary, end, "7d", funcs, day)
    direct = execute_query(spark, {
        "group-aggregate": {"metric": "app.click", "step": "7d",
                            "func": funcs},
        "range": {"from": begin, "to": end},
    }, frame)
    a = sorted(map(tuple, tiered.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert len(a) == len(b) and a
    for ra, rb in zip(a, b):
        assert ra[:2] == rb[:2]
        assert all(math.isclose(x, y, rel_tol=1e-9)
                   for x, y in zip(ra[2:], rb[2:]))


def test_tiered_rejects_straddling_boundary(spark):
    from pyspark.sql import functions as F

    from akumuli_spark.query.rollup import (
        group_aggregate_tiered,
        rollup_from_frame,
    )

    frame = app_metrics_view(spark, SF_DIR)
    e0 = parse_timestamp_ns("20240101T000000")
    day = 86_400 * 10**9
    rollup = rollup_from_frame(frame, day)
    with pytest.raises(QueryValidationError, match="whole number of steps"):
        group_aggregate_tiered(spark, frame, rollup, "app.click",
                               e0, e0 + 10 * day, e0 + 29 * day,
                               "7d", ["sum"], day)
    with pytest.raises(QueryValidationError, match="begin < boundary"):
        group_aggregate_tiered(spark, frame, rollup, "app.click",
                               e0, e0, e0 + 29 * day, "7d", ["sum"], day)
    # non-servable funcs bounce on the cold tier (can_serve)
    with pytest.raises(QueryValidationError, match="rollup cannot serve"):
        group_aggregate_tiered(spark, frame, rollup, "app.click",
                               e0, e0 + 14 * day, e0 + 29 * day,
                               "7d", ["first"], day)


def test_rollup_from_frame_matches_stream_rollup(spark):
    """The batch materializer must produce the SAME rollup table the
    streaming sink maintains — they are interchangeable tiers."""
    from akumuli_spark.query.rollup import rollup_from_frame

    frame = app_metrics_view(spark, SF_DIR).filter(
        "metric = 'app.click'").limit(5000)
    minute = 60 * 10**9
    batch = rollup_from_frame(frame, minute)
    # replay through the streaming aggregation in one complete batch
    streamed = None
    rows = sorted(map(tuple, batch.collect()))
    # windowed_rollup_stream needs a streaming frame; equivalence of the
    # aggregation itself: re-derive via its window expression batch-side
    from pyspark.sql import functions as F

    with_ts = frame.withColumn(
        "ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long")))
    streamed = (
        with_ts.groupBy("series", F.window("ts", "1 minute").alias("w"))
        .agg(F.count("value").alias("count"), F.sum("value").alias("sum"),
             F.min("value").alias("min"), F.max("value").alias("max"),
             F.min("ts_ns").alias("min_ts"))
        .select("series", F.unix_micros(F.col("w.start")).alias("bucket_us"),
                "count", "sum", "min", "max", "min_ts")
    )
    assert rows == sorted(map(tuple, streamed.collect())) and rows


def test_router_tiers_past_completeness_bound(spark):
    """A streaming-lagged rollup (complete_through mid-range) used to
    knock the whole query off the fast path; the router now serves the
    cold prefix from it and only the hot suffix from raw.  Proof of
    stitching: the database is opened over raw TRUNCATED to the hot
    span, the rollup built only from pre-boundary rows — the full-range
    answer still equals the direct answer over the full frame."""
    import math

    from pyspark.sql import functions as F

    from akumuli_spark.api import open_database
    from akumuli_spark.query.rollup import rollup_from_frame

    frame = app_metrics_view(spark, SF_DIR)
    e0 = parse_timestamp_ns("20240101T000000")
    day = 86_400 * 10**9
    begin, boundary, end = e0, e0 + 14 * day, e0 + 29 * day
    qjson = {
        "group-aggregate": {"metric": "app.click", "step": "7d",
                            "func": ["sum", "count"]},
        "range": {"from": begin, "to": end},
    }
    direct = sorted(map(tuple, execute_query(spark, qjson, frame).collect()))

    db = open_database(spark, frame.filter(F.col("ts_ns") >= boundary))
    db.attach_rollup(
        rollup_from_frame(frame.filter(F.col("ts_ns") < boundary), day),
        day, complete_through_ns=boundary,
    )
    served = sorted(map(tuple, db.query(qjson).collect()))
    assert len(served) == len(direct) and served
    for ra, rb in zip(served, direct):
        assert ra[:2] == rb[:2]
        assert all(math.isclose(x, y, rel_tol=1e-9)
                   for x, y in zip(ra[2:], rb[2:]))

    # a range fully past the bound keeps falling through to raw — the
    # truncated frame answers it alone
    hot_only = {
        "group-aggregate": {"metric": "app.click", "step": "7d",
                            "func": ["sum", "count"]},
        "range": {"from": boundary, "to": end},
    }
    a = sorted(map(tuple, db.query(hot_only).collect()))
    b = sorted(map(tuple, execute_query(spark, hot_only, frame).collect()))
    assert a == b

    # limit queries need a global order across tiers: direct path only
    limited = dict(qjson, limit=3)
    got = db.query(limited).collect()
    assert len(got) == 3  # served (from truncated raw = hot span only)
