"""Mergeable sketch rollup store: serve-equals-direct over ranges,
incremental append ≡ fresh build, alignment/layout contracts, partition
pruning at serve, and zero-scan retention."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from akumuli_spark.operators.distinct import approx_distinct
from akumuli_spark.operators.quantile_sketch import approx_quantiles
from akumuli_spark.sources.sketch_store import (
    append_sketch_store,
    build_sketch_store,
    distinct_over_range,
    drop_expired_buckets,
    quantiles_over_range,
)

DAY = 86_400 * 10**9
QS = [0.5, 0.9, 0.99]


def _events(spark, days, seed_shift=0):
    rows = []
    for d in days:
        for i in range(300):
            uid = (i * 7 + d + seed_shift) % 97
            rows.append((
                ["click", "view", "error"][i % 3],
                uid,
                float((i * 13 + d) % 500) / 7.0,
                d * DAY + i * (DAY // 300),
            ))
    return spark.createDataFrame(
        rows, "event_type string, user_id int, value double, ts_ns long"
    )


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sketch") / "store")
    build_sketch_store(_events(spark, range(10)), path,
                       group_col="event_type", distinct_col="user_id",
                       value_col="value")
    return path


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_distinct_range_equals_direct_sketch(spark, store):
    """Merging stored per-day registers over [2d, 7d) must equal the
    one-shot sketch over exactly those raw rows — register max is
    lossless under partitioning."""
    raw = _events(spark, range(10)).filter(
        (F.col("ts_ns") >= 2 * DAY) & (F.col("ts_ns") < 7 * DAY)
    )
    direct = approx_distinct(raw, "user_id", ("event_type",)).withColumnRenamed(
        "event_type", "group"
    )
    served = distinct_over_range(spark, store, 2 * DAY, 7 * DAY)
    assert _rows(served) == _rows(direct) and served.count() == 3


def test_quantiles_range_equals_direct_sketch(spark, store):
    raw = _events(spark, range(10)).filter(
        (F.col("ts_ns") >= 3 * DAY) & (F.col("ts_ns") < 6 * DAY)
    )
    direct = approx_quantiles(raw, "value", QS, ("event_type",)).withColumnRenamed(
        "event_type", "group"
    )
    served = quantiles_over_range(spark, store, 3 * DAY, 6 * DAY, QS)
    assert _rows(served) == _rows(direct) and served.count() == 9


def test_append_equals_fresh_build(spark, tmp_path):
    """build(batch1) + epoch appends ≡ build(batch1 ∪ batches), with
    appends overlapping existing buckets (serve-time fold) AND adding
    new ones."""
    p_inc = str(tmp_path / "inc")
    p_full = str(tmp_path / "full")
    b1 = _events(spark, range(7))
    b2 = _events(spark, range(5, 12), seed_shift=31)
    build_sketch_store(b1, p_inc, "event_type", "user_id", "value")
    append_sketch_store(b2, p_inc, epoch=1)
    build_sketch_store(b1.unionByName(b2), p_full,
                       "event_type", "user_id", "value")
    for lo, hi in ((0, 12), (5, 7), (8, 12)):
        a = distinct_over_range(spark, p_inc, lo * DAY, hi * DAY)
        b = distinct_over_range(spark, p_full, lo * DAY, hi * DAY)
        assert _rows(a) == _rows(b)
        qa = quantiles_over_range(spark, p_inc, lo * DAY, hi * DAY, QS)
        qb = quantiles_over_range(spark, p_full, lo * DAY, hi * DAY, QS)
        assert _rows(qa) == _rows(qb)


def test_retried_epoch_is_idempotent(spark, tmp_path):
    """The exactly-once claim: replaying an epoch (crash before the
    checkpoint commit) must not change anything served — histogram
    sums would double under a blind re-append."""
    path = str(tmp_path / "retry")
    build_sketch_store(_events(spark, range(4)), path,
                       "event_type", "user_id", "value")
    batch = _events(spark, [4, 5], seed_shift=9)
    append_sketch_store(batch, path, epoch=1)
    once_d = _rows(distinct_over_range(spark, path, 0, 6 * DAY))
    once_q = _rows(quantiles_over_range(spark, path, 0, 6 * DAY, QS))
    append_sketch_store(batch, path, epoch=1)  # the replay
    assert _rows(distinct_over_range(spark, path, 0, 6 * DAY)) == once_d
    assert _rows(quantiles_over_range(spark, path, 0, 6 * DAY, QS)) == once_q


def test_append_leaves_other_epochs_alone(spark, tmp_path):
    path = str(tmp_path / "s")
    build_sketch_store(_events(spark, range(4)), path,
                       "event_type", "user_id", "value")
    before = {
        t: sorted(os.listdir(os.path.join(path, t, "epoch=0", "ts_bucket=0")))
        for t in ("hll", "hist")
    }
    append_sketch_store(_events(spark, [3, 4], seed_shift=5), path, epoch=1)
    for t in ("hll", "hist"):
        after = sorted(
            os.listdir(os.path.join(path, t, "epoch=0", "ts_bucket=0")))
        assert after == before[t]  # the build epoch is never rewritten
        assert os.path.isdir(
            os.path.join(path, t, "epoch=1", "ts_bucket=4"))  # grown


def test_epoch_zero_append_refused(spark, tmp_path):
    path = str(tmp_path / "e0")
    build_sketch_store(_events(spark, [0]), path,
                       "event_type", "user_id", "value")
    with pytest.raises(ValueError, match="reserved"):
        append_sketch_store(_events(spark, [1]), path, epoch=0)


def test_compaction_folds_epochs_and_changes_nothing(spark, tmp_path):
    path = str(tmp_path / "cmp")
    build_sketch_store(_events(spark, range(3)), path,
                       "event_type", "user_id", "value")
    append_sketch_store(_events(spark, [2, 3], seed_shift=7), path, epoch=1)
    append_sketch_store(_events(spark, [4], seed_shift=11), path, epoch=2)
    want_d = _rows(distinct_over_range(spark, path, 0, 5 * DAY))
    want_q = _rows(quantiles_over_range(spark, path, 0, 5 * DAY, QS))

    from akumuli_spark.sources.sketch_store import compact_sketch_store

    compact_sketch_store(spark, path)
    epochs = {
        os.path.basename(d)
        for d in os.listdir(os.path.join(path, "hll"))
        if d.startswith("epoch=")
    }
    assert epochs == {"epoch=0"}
    assert _rows(distinct_over_range(spark, path, 0, 5 * DAY)) == want_d
    assert _rows(quantiles_over_range(spark, path, 0, 5 * DAY, QS)) == want_q


def test_misaligned_range_raises(spark, store):
    with pytest.raises(ValueError, match="aligned"):
        distinct_over_range(spark, store, DAY // 2, 3 * DAY)
    with pytest.raises(ValueError, match="aligned"):
        quantiles_over_range(spark, store, DAY, 3 * DAY + 1, QS)
    with pytest.raises(ValueError, match="empty or inverted"):
        distinct_over_range(spark, store, 3 * DAY, 3 * DAY)


def test_unbuilt_store_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="build first"):
        distinct_over_range(spark, str(tmp_path / "nope"), 0, DAY)
    with pytest.raises(ValueError, match="build first"):
        append_sketch_store(_events(spark, [0]), str(tmp_path / "nope"),
                            epoch=1)


def test_serve_prunes_partitions(spark, store):
    df = distinct_over_range(spark, store, 2 * DAY, 4 * DAY)
    plan = df._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("PartitionFilters")[1][:300]
    assert "ts_bucket" in seg


def test_retention_drops_whole_buckets(spark, tmp_path):
    path = str(tmp_path / "ret")
    build_sketch_store(_events(spark, range(10)), path,
                       "event_type", "user_id", "value")
    dropped = drop_expired_buckets(path, keep_ns=4 * DAY, now_ns=10 * DAY)
    assert dropped == 12  # 6 buckets × 2 tables
    served = distinct_over_range(spark, path, 6 * DAY, 10 * DAY)
    direct = approx_distinct(
        _events(spark, range(10)).filter(
            (F.col("ts_ns") >= 6 * DAY) & (F.col("ts_ns") < 10 * DAY)),
        "user_id", ("event_type",),
    ).withColumnRenamed("event_type", "group")
    assert _rows(served) == _rows(direct)


def test_mid_append_serve_is_per_table_snapshot(spark, tmp_path, monkeypatch):
    """The append writes hll then hist; a crash between them must leave
    each serve path an individually valid snapshot — distincts already
    post-batch (hll landed), quantiles still pre-batch (hist did not) —
    and the RETRIED epoch converges both (its hll partition overwrite
    is bit-identical, its hist write completes)."""
    import akumuli_spark.sources.sketch_store as S

    path = str(tmp_path / "mid")
    base = _events(spark, range(3))
    batch = _events(spark, [3, 4], seed_shift=13)
    build_sketch_store(base, path, "event_type", "user_id", "value")

    pre_q = _rows(quantiles_over_range(spark, path, 0, 5 * DAY, QS))

    real = S.log_histogram

    def poisoned(df, col, groups, k):
        # evaluation (at hist write time) raises on the first row — the
        # crash window AFTER the hll table committed.  The raise is
        # data-dependent (cnt < 0 is never true but not statically
        # known), so Catalyst cannot constant-fold it away.
        hist = real(df, col, groups, k)
        return hist.withColumn(
            "cnt",
            F.when(F.col("cnt") < 0, F.col("cnt")).otherwise(
                F.expr("cast(raise_error('mid-append crash') as bigint)")
            ),
        )

    monkeypatch.setattr(S, "log_histogram", poisoned)
    with pytest.raises(Exception):
        append_sketch_store(batch, path, epoch=1)
    monkeypatch.undo()

    union = base.unionByName(batch)
    want_d = _rows(
        approx_distinct(union, "user_id", ("event_type",))
        .withColumnRenamed("event_type", "group"))
    # distincts: post-batch (hll landed before the crash)
    assert _rows(distinct_over_range(spark, path, 0, 5 * DAY)) == want_d
    # quantiles: pre-batch (hist never landed) — a valid snapshot,
    # never a torn mix
    assert _rows(quantiles_over_range(spark, path, 0, 5 * DAY, QS)) == pre_q

    append_sketch_store(batch, path, epoch=1)  # the retry converges
    want_q = _rows(
        approx_quantiles(union, "value", QS, ("event_type",))
        .withColumnRenamed("event_type", "group"))
    assert _rows(distinct_over_range(spark, path, 0, 5 * DAY)) == want_d
    assert _rows(quantiles_over_range(spark, path, 0, 5 * DAY, QS)) == want_q


def test_reserved_column_names_refused(spark, tmp_path):
    """A fact column named like a sketch-internal column would silently
    shadow it inside the grouped partial computation — refuse at build."""
    df = _events(spark, [0]).withColumnRenamed("user_id", "bucket")
    with pytest.raises(ValueError, match="collide"):
        build_sketch_store(df, str(tmp_path / "x"),
                           "event_type", "bucket", "value")


def test_tiered_distinct_misaligned_equals_direct(spark, store):
    """The honest dashboard range ('last N days ending NOW' is never
    day-aligned): head/tail spans sketched from raw rows fold into the
    stored partials with the same register-max merge — equal to the
    one-shot sketch over exactly the raw rows of the range."""
    raw = _events(spark, range(10))
    lo, hi = 2 * DAY + DAY // 3, 7 * DAY + DAY // 2
    direct = approx_distinct(
        raw.filter((F.col("ts_ns") >= lo) & (F.col("ts_ns") < hi)),
        "user_id", ("event_type",),
    ).withColumnRenamed("event_type", "group")
    served = distinct_over_range(spark, store, lo, hi, raw_tail=raw)
    assert _rows(served) == _rows(direct) and served.count() == 3


def test_tiered_quantiles_misaligned_equals_direct(spark, store):
    raw = _events(spark, range(10))
    lo, hi = 3 * DAY + DAY // 4, 6 * DAY + 3 * DAY // 4
    direct = approx_quantiles(
        raw.filter((F.col("ts_ns") >= lo) & (F.col("ts_ns") < hi)),
        "value", QS, ("event_type",),
    ).withColumnRenamed("event_type", "group")
    served = quantiles_over_range(spark, store, lo, hi, QS, raw_tail=raw)
    assert _rows(served) == _rows(direct) and served.count() == 9


def test_tiered_range_inside_one_bucket_is_all_raw(spark, store):
    """No whole bucket fits inside the range: the core is empty and the
    answer comes purely from the raw spans — still through the same
    fold."""
    raw = _events(spark, range(10))
    lo, hi = 4 * DAY + DAY // 5, 4 * DAY + 4 * DAY // 5
    direct = approx_distinct(
        raw.filter((F.col("ts_ns") >= lo) & (F.col("ts_ns") < hi)),
        "user_id", ("event_type",),
    ).withColumnRenamed("event_type", "group")
    served = distinct_over_range(spark, store, lo, hi, raw_tail=raw)
    assert _rows(served) == _rows(direct) and served.count() == 3


def test_tiered_aligned_range_ignores_raw_frame_content(spark, store):
    """An already-aligned range with a raw_tail passed serves purely
    from partials (spans are empty): a raw frame with extra off-range
    rows changes nothing."""
    decoy = _events(spark, range(10), seed_shift=31)
    a = distinct_over_range(spark, store, 2 * DAY, 7 * DAY)
    b = distinct_over_range(spark, store, 2 * DAY, 7 * DAY, raw_tail=decoy)
    assert _rows(a) == _rows(b)


def test_misaligned_without_raw_still_raises(spark, store):
    with pytest.raises(ValueError, match="raw_tail"):
        distinct_over_range(spark, store, 2 * DAY + 5, 7 * DAY)
    with pytest.raises(ValueError, match="raw_tail"):
        quantiles_over_range(spark, store, 2 * DAY, 7 * DAY - 5, QS)
