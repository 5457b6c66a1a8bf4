"""Production storage layout for the long metrics table — the Parquet
analogue of the reference's per-series NB+tree forest
(/root/reference/libakumuli/storage_engine/nbtree.h, column_store.h:58-63).

Layout contract:

* partitioned by ``metric`` and a time bucket (default: 1 day of ns) —
  metric + time-range predicates become *partition pruning*, the
  two-level descent the NB+tree does natively;
* sorted by ``(series, ts_ns)`` within files — Parquet row-group min/max
  stats then prune on series and time inside a partition, and per-series
  window operators read clustered data;
* ``ts_ns`` is a physical int64 column, so range predicates push all the
  way into the Parquet reader (unlike the test-harness views where it is
  computed from TPC-H columns);
* the ``tags`` map is NOT stored — it is fully derived from the series
  string (``metric k1=v1 k2=v2 ...``, the reference's series grammar:
  values contain neither spaces nor '='), and a per-row map column
  triples the write cost (shuffle bytes + parquet nested-group encoding:
  measured 1.99 → 5.9 M samples/s at 20 M rows by dropping it).
  ``read_metrics_table`` reconstructs it with ``str_to_map``; queries
  that never touch tags don't pay for it (Catalyst prunes the derived
  column), and tag predicates were never parquet-pushable anyway.

``read_metrics_table`` returns the frame in engine schema; queries run on
it unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DAY_NS = 86_400 * 10**9


def write_metrics_table(metrics: DataFrame, path: str,
                        bucket_ns: int = DAY_NS,
                        mode: str = "overwrite") -> None:
    """Write the long metrics frame in the production layout.

    Size ``bucket_ns`` to the data density: the target is ~100 MB-1 GB
    per (metric, bucket) partition, mirroring the reference's volume
    sizing.  Day buckets fit dense production traffic; sparse or
    small-SF data should use wider buckets — thousands of KB-sized
    partitions make listing/footer overhead dominate the scan they were
    meant to prune."""
    cols = [c for c in metrics.columns if c != "tags"]
    # exact int64 bucket assignment: epoch-ns exceeds double's 2^53
    # range, so `/ then cast` could mis-bucket a row within ~256ns of a
    # boundary — and enforce_retention computes its cutoff with exact
    # integer `div`, so a down-rounded row would sit in the previous
    # partition and be evicted one bucket early (in-window data loss)
    with_bucket = metrics.select(*cols).withColumn(
        "ts_bucket", F.expr(f"ts_ns div {int(bucket_ns)}L")
    )
    if mode == "append":
        # CONCURRENT-WRITER-SAFE append (the reference's multi-writer
        # ingest contract, functests/test_concurrency.py): a direct
        # `.mode("append")` stages under the shared `{path}/_temporary/0`
        # (Hadoop committer, one attempt id per local job), so two
        # concurrent appends GC each other's staging mid-commit.  Stage
        # into a private sibling dir instead, then move the finished
        # part files in — os.rename is atomic and filenames carry a
        # job UUID, so readers see each file whole and never a
        # collision; writers never touch each other's state.
        _staged_append(with_bucket, path)
        return
    (
        with_bucket.repartition("metric", "ts_bucket")
        .sortWithinPartitions("series", "ts_ns")
        .write.mode(mode)
        .partitionBy("metric", "ts_bucket")
        .parquet(path)
    )


def _staged_append(with_bucket: DataFrame, path: str) -> None:
    import posixpath
    import uuid

    from akumuli_spark.sources.fs import get_fs

    fs = get_fs(path)
    tmp = f"{path}.append-tmp-{uuid.uuid4().hex}"
    (
        with_bucket.repartition("metric", "ts_bucket")
        .sortWithinPartitions("series", "ts_ns")
        .write.mode("overwrite")
        .partitionBy("metric", "ts_bucket")
        .parquet(tmp)
    )
    try:
        for rel in fs.walk_files(tmp):
            if not rel.endswith(".parquet"):
                continue  # _SUCCESS etc. stay behind
            dst = posixpath.join(path, rel)
            fs.makedirs(posixpath.dirname(dst))
            fs.rename(posixpath.join(tmp, rel), dst)
    finally:
        fs.rmtree(tmp)


#: structured error conditions meaning "the table isn't there (yet)":
#: a partitioned write of zero rows leaves a directory with no data
#: files (schema inference fails), and a never-built store has no
#: directory at all.  Everything else is a real failure.
_ABSENT_TABLE_CONDITIONS = frozenset(
    {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}
)


def read_table_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """``spark.read.parquet`` returning ``None`` when the table is
    ABSENT or EMPTY — the shared empty-store tolerance every index
    reader needs (an index over nothing answers nothing, a probe before
    the first append lands serves zero results, never a crash).

    The two benign cases are classified by the STRUCTURED error
    condition (``AnalysisException.getCondition()``, with the
    pre-4.0 ``getErrorClass()`` as fallback) — never by substring-
    matching the rendered message, whose wording is Spark-version-bound
    (ADVICE r10).  Any other analysis failure re-raises.

    This is also the store-visible existence probe for optional layout
    tables: a driver-local ``os.path.exists`` is always False on
    S3/HDFS, so "does this index have a positions table?" must be asked
    through the same reader that will consume it (ADVICE r9/r10)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        cond = None
        for attr in ("getCondition", "getErrorClass"):
            fn = getattr(exc, attr, None)
            if fn is None:
                continue
            try:
                cond = fn()
            except Exception:
                cond = None
            if cond:
                break
        if cond not in _ABSENT_TABLE_CONDITIONS:
            raise
        return None


def recover_compaction(path: str, gc: bool = False) -> None:
    """Self-heal a compaction swap that crashed between its two renames.

    The swap is: write ``{path}.compact-tmp`` → rename path → old →
    rename tmp → path → delete old.  A crash in the one-syscall window
    between the renames leaves no table at ``path``; since the tmp dir
    only enters the swap after its Spark write completed (it carries the
    ``_SUCCESS`` marker), recovery is unambiguous: finish the swap if
    tmp is complete, else restore the original.  Crash after the second
    rename just leaves a stale ``old``/``tmp`` to garbage-collect.
    Called by both the reader and the compactor, so the table heals on
    next touch — the same self-healing contract as the ingest marks
    table.

    ``gc`` gates steady-state garbage collection of leftover tmp/old
    dirs and must only be passed by the compactor: a *reader* that
    rmtree's ``tmp`` while the table is healthy would delete a live
    compactor's in-progress write.  Readers still clean up ``old``
    when they themselves performed a heal — at that point the swap is
    known-crashed (or the reader just won the roll-forward race, which
    the compactor's swap tolerates).  Concurrency contract: any number
    of readers vs at most one compactor.

    Filesystem access goes through the portable seam
    (:func:`akumuli_spark.sources.fs.get_fs`), so the heal works on any
    Hadoop-reachable store, not just local POSIX paths."""
    import posixpath

    from akumuli_spark.sources.fs import get_fs

    fs = get_fs(path)
    tmp = f"{path}.compact-tmp"
    old = f"{path}.compact-old"
    if not fs.exists(path) and fs.exists(old):
        try:
            if fs.exists(posixpath.join(tmp, "_SUCCESS")):
                fs.rename(tmp, path)  # roll forward: compacted table is whole
            else:
                fs.rename(old, path)  # roll back: restore the original
        except OSError:
            # a concurrent recover/compactor won the rename race; fall
            # through — the post-condition check below is what matters
            pass
        if fs.exists(path):
            fs.rmtree(old)
    if gc and fs.exists(path):
        for stale in (tmp, old):
            fs.rmtree(stale)


def compact_metrics_table(spark: SparkSession, path: str) -> None:
    """Rewrite the table so each (metric, ts_bucket) partition holds one
    (series, ts)-sorted file set.

    Streaming ingest appends one file set per micro-batch; thousands of
    KB-sized files per partition make listing + footer reads dominate
    scans (the same economics as the bucket-width note above).  Periodic
    compaction is the parquet analogue of the reference's volume
    management.  The rewrite lands in a sibling directory and is swapped
    in with two renames — the local-FS analogue of a transactional
    REPLACE; on a lake you'd run the same plan through Delta OPTIMIZE.
    A crash mid-swap self-heals via :func:`recover_compaction` on the
    next read or compaction.

    Rows keep the engine schema stored on disk (no tags map — see module
    docstring); the sort restores tight row-group min/max stats that
    per-batch appends fragment.
    """
    from akumuli_spark.sources.fs import get_fs, swap_compact

    fs = get_fs(path)
    recover_compaction(path, gc=True)
    df = spark.read.parquet(path)
    cols = [c for c in df.columns if c not in ("metric", "ts_bucket")]
    tmp = f"{path}.compact-tmp"
    fs.rmtree(tmp)
    (
        df.select("metric", "ts_bucket", *cols)
        # hash-repartition on the partition keys: every (metric, bucket)
        # lands whole in one task → one file each, tasks still parallel
        # across partitions
        .repartition("metric", "ts_bucket")
        .sortWithinPartitions("metric", "ts_bucket", "series", "ts_ns")
        .write.mode("overwrite")
        .partitionBy("metric", "ts_bucket")
        .parquet(tmp)
    )
    # two-rename publish; a concurrent reader's recover_compaction
    # rolling the swap forward between the renames is tolerated
    swap_compact(fs, path)


def enforce_retention(path: str, keep_ns: int, now_ns: int,
                      bucket_ns: int = DAY_NS) -> int:
    """Volume-recycling analogue: drop whole ``ts_bucket`` partitions
    older than the retention window — the reference's fixed-size volume
    ring evicts its oldest volume when full (volume.cpp,
    functests/test_database_overflow.py); here the unit of eviction is
    the (metric, time-bucket) partition directory, so retention costs a
    directory rename per expired bucket and ZERO data scan.

    Buckets with index < (now_ns − keep_ns) div bucket_ns are expired
    (the cutoff bucket itself survives: it may still hold in-window
    rows).  Each expired partition is atomically renamed into a
    ``{path}.trash`` sibling first, then deleted — a reader that listed
    files just before the rename may see missing files for one query;
    run readers with ``spark.sql.files.ignoreMissingFiles`` (or retry)
    when retention runs concurrently, the same contract Spark documents
    for any external partition drop.  Returns the number of dropped
    partitions.

    Ordering contract with compaction: run retention and
    :func:`compact_metrics_table` from the same maintenance job,
    retention LAST — a compactor that scanned the table before a
    concurrent retention pass would faithfully rewrite (resurrect) the
    dropped buckets when its swap lands.
    """
    import posixpath
    import uuid

    from akumuli_spark.sources.fs import get_fs

    fs = get_fs(path)
    cutoff = (now_ns - keep_ns) // bucket_ns
    trash = f"{path}.trash"
    fs.makedirs(trash)
    dropped = 0
    for rel in fs.glob(path, "metric=*/ts_bucket=*"):
        try:
            bucket = int(posixpath.basename(rel).split("=", 1)[1])
        except ValueError:  # pragma: no cover - foreign dirs left alone
            continue
        if bucket < cutoff:
            fs.rename(posixpath.join(path, rel),
                      posixpath.join(trash, uuid.uuid4().hex))
            dropped += 1
    fs.rmtree(trash)
    return dropped


def read_metrics_table(spark: SparkSession, path: str) -> DataFrame:
    """Load back in engine schema (partition columns folded away); the
    tags map is reconstructed from the series string per the series
    grammar — pruned away by Catalyst unless the query references it."""
    recover_compaction(path)
    df = spark.read.parquet(path)
    tags = F.when(
        F.instr(F.col("series"), " ") > 0,
        F.expr("str_to_map(substring(series, instr(series, ' ') + 1), ' ', '=')"),
    ).otherwise(F.expr("map()"))
    return df.select(
        "series", "metric", tags.alias("tags"), "ts_ns", "value"
    )
