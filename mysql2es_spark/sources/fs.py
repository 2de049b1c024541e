"""Index-root filesystem abstraction: local paths AND object stores.

The reference's state surface is location-transparent — it talks to
Elasticsearch over REST (README-EN.org:183-297) and keeps its checkpoint
in a temp file or a MySQL table (README-EN.org:48-49, 65-66).  Our
equivalent bookkeeping (manifest JSON, CURRENT pointer, _SUCCESS
markers, tombstone-dir listing, bucket-size accounting, snapshot log)
was ``os.path``-based through round 2, which pinned index roots to a
shared POSIX mount.  This module routes those small-file/metadata
operations through a two-backend interface:

- ``LocalFS``    — ``os``/``shutil`` primitives for plain paths and
  ``file://`` URIs (the fast path; no JVM round-trips).
- ``HadoopFS``   — the Hadoop FileSystem API via the Spark JVM gateway
  (``spark._jvm.org.apache.hadoop.fs``), for ``hdfs://`` / ``s3a://`` /
  any scheme the cluster's Hadoop conf knows.  Atomic pointer swap uses
  ``FileContext.rename(..., Options.Rename.OVERWRITE)`` — the same
  rename-with-overwrite HDFS guarantees atomically.  Object stores
  implement rename as delete-then-copy (NOT atomic): a concurrent
  reader can transiently observe CURRENT missing, so
  ``manifest.load_current`` retries and falls back to the highest
  ``manifest-*.json`` version before concluding "no index".

Bulk data (docstore/postings/tombstone parquet) always goes through
Spark readers/writers, which are already location-transparent — this
interface only covers what Spark does NOT do for us.  Driver-side only:
executor code paths (e.g. compact's tombstone load) take explicit
fallbacks, never a ``get_fs`` handle.
"""

from __future__ import annotations

import os
import shutil

#: test hook: force every get_fs() resolution through the Hadoop API
#: (exercises HadoopFS against file:/ URIs without a cluster)
FORCE_HADOOP = False


def _strip_file_scheme(path: str) -> str:
    if path.startswith("file://"):
        return path[7:] or "/"
    return path


class LocalFS:
    """os/shutil-backed operations for plain paths and file:// URIs."""

    local = True

    def _p(self, path: str) -> str:
        return _strip_file_scheme(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(self._p(path))

    def makedirs(self, path: str) -> None:
        os.makedirs(self._p(path), exist_ok=True)

    def read_text(self, path: str) -> str:
        with open(self._p(path)) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        p = self._p(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, p)  # atomic on POSIX

    def listdir(self, path: str) -> list[str]:
        p = self._p(path)
        return os.listdir(p) if os.path.isdir(p) else []

    def file_sizes(self, path: str) -> dict[str, int]:
        """name -> bytes for regular files directly under ``path``."""
        p = self._p(path)
        if not os.path.isdir(p):
            return {}
        out = {}
        for n in os.listdir(p):
            full = os.path.join(p, n)
            if os.path.isfile(full):
                out[n] = os.path.getsize(full)
        return out

    def delete(self, path: str) -> None:
        p = self._p(path)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)


class HadoopFS:
    """Hadoop FileSystem API via the Spark JVM gateway (driver-side).

    One handle per (scheme, authority); resolved from the active
    session's Hadoop configuration, so credentials/endpoints follow the
    cluster deployment, exactly as Spark's own parquet IO does."""

    local = False

    def __init__(self, root: str, spark=None):
        # lazy: resolving the JVM FileSystem contacts the store (e.g. an
        # HDFS namenode), so defer it to the first operation — get_fs()
        # itself must stay cheap and offline
        self._root = root
        self._spark = spark
        self._resolved = False

    def _resolve(self) -> None:
        if self._resolved:
            return
        spark = self._spark
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError(
                    "HadoopFS needs an active SparkSession (JVM gateway)"
                )
        self._gateway = spark.sparkContext._gateway
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._uri = self._jvm.java.net.URI(self._root)
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(
            self._uri, self._conf
        )
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._resolved = True

    def exists(self, path: str) -> bool:
        self._resolve()
        return bool(self._fs.exists(self._Path(path)))

    def is_dir(self, path: str) -> bool:
        self._resolve()
        p = self._Path(path)
        return bool(self._fs.exists(p)) and bool(
            self._fs.getFileStatus(p).isDirectory()
        )

    def makedirs(self, path: str) -> None:
        self._resolve()
        self._fs.mkdirs(self._Path(path))

    def read_text(self, path: str) -> str:
        self._resolve()
        stream = self._fs.open(self._Path(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        self._resolve()
        tmp = path + ".tmp"
        out = self._fs.create(self._Path(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        # FileContext.rename with OVERWRITE: atomic on HDFS.  Object
        # stores (s3a) implement it as delete-then-copy, which is NOT
        # atomic — a concurrent reader can observe the target missing;
        # ``manifest.load_current`` compensates with a retry + a
        # manifest-*.json max-version fallback.  The vararg needs a real
        # Java array — py4j's auto-converted ArrayList does not match
        # Options.Rename...
        Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
        opts = self._gateway.new_array(Rename, 1)
        opts[0] = Rename.OVERWRITE
        fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self._uri, self._conf
        )
        try:
            fc.rename(self._Path(tmp), self._Path(path), opts)
        except Exception:
            # don't leave a stale .tmp behind: a later writer's create(
            # overwrite) would succeed but listings/compaction tooling
            # would see ghost files accumulate
            try:
                self._fs.delete(self._Path(tmp), False)
            except Exception:
                # swallow the cleanup failure so the ORIGINAL rename
                # exception propagates (try/finally would let a delete
                # error replace it)
                pass
            raise

    def listdir(self, path: str) -> list[str]:
        self._resolve()
        p = self._Path(path)
        if not self._fs.exists(p):
            return []
        return [
            st.getPath().getName() for st in self._fs.listStatus(p)
        ]

    def file_sizes(self, path: str) -> dict[str, int]:
        self._resolve()
        p = self._Path(path)
        if not self._fs.exists(p):
            return {}
        return {
            st.getPath().getName(): int(st.getLen())
            for st in self._fs.listStatus(p)
            if st.isFile()
        }

    def delete(self, path: str) -> None:
        self._resolve()
        self._fs.delete(self._Path(path), True)


def get_fs(root: str, spark=None):
    """Resolve the right backend for ``root`` (driver-side).

    Plain paths and ``file://`` stay on the os-backed fast path; any
    other scheme (hdfs://, s3a://, ...) goes through the Hadoop API.
    ``FORCE_HADOOP`` pushes even local roots through HadoopFS so tests
    can exercise the API path against the local filesystem."""
    if FORCE_HADOOP:
        return HadoopFS(root, spark)
    if "://" in root and not root.startswith("file://"):
        return HadoopFS(root, spark)
    return LocalFS()
