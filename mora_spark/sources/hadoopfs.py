"""Driver-side Hadoop FileSystem access for SMALL metadata I/O.

Spark's own readers/writers already speak every configured filesystem;
what they cannot do is the driver-side odds and ends around them —
stamping a tiny JSON next to a table (the LSH family metadata), or
reading parquet FOOTERS without launching a job (Bloom benchmark
sizing). Plain POSIX I/O for those silently lands files on the
DRIVER's disk when the table lives on ``hdfs://``/``s3a://`` — the
exact wrong-filesystem failure the metadata exists to prevent — so
these helpers resolve the path's filesystem through the active
session's Hadoop configuration and do the I/O there.

Scope is deliberately narrow: one file's bytes, one directory
listing, one seekable read adapter. Bulk data always goes through
Spark. Everything here is driver-side (py4j) — never call from an
executor.
"""

from __future__ import annotations


def hadoop_fs(path: str):
    """(jvm, fs, root Path) for a ``scheme://`` path, resolved through
    the active session's Hadoop configuration. Requires an active
    SparkSession: metadata I/O without one means no Spark reader or
    writer exists either, so the refusal is loud and early."""
    from pyspark.sql import SparkSession

    # getActiveSession is THREAD-local: a concurrent writer thread
    # (store CAS contention tests; any user thread pool) sees None
    # even while the process has a live session — fall back to the
    # process-wide instantiated session before refusing.
    spark = SparkSession.getActiveSession() or getattr(
        SparkSession, "_instantiatedSession", None
    )
    if spark is None:
        raise RuntimeError(
            f"Hadoop filesystem I/O on '{path}' needs an active "
            "SparkSession to resolve the scheme's filesystem; create "
            "the session first (local paths without a scheme never "
            "take this route)"
        )
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, root


def list_files(path: str, suffix: str) -> list[tuple[str, int]]:
    """Recursive ``(path, length)`` listing of files under a
    ``scheme://`` root ending in ``suffix``, sorted by path. A file
    root lists itself. Raises FileNotFoundError when the root does
    not exist (matching the local-glob behavior of the callers)."""
    jvm, fs, root = hadoop_fs(path)
    if not fs.exists(root):
        raise FileNotFoundError(path)
    if fs.getFileStatus(root).isFile():
        return [(path, fs.getFileStatus(root).getLen())]
    out = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if p.endswith(suffix):
            out.append((p, st.getLen()))
    return sorted(out)


class HadoopInputFile:
    """Seekable read-only file over a Hadoop FSDataInputStream, just
    enough surface (read/seek/tell/close) for pyarrow's footer reader.
    Bulk transfers go through one ``IOUtils.toByteArray`` JVM call per
    ``read`` (commons-io ships with Spark), so a footer read is a
    handful of py4j round-trips, never per-byte traffic."""

    def __init__(self, path: str):
        jvm, fs, p = hadoop_fs(path)
        self._jvm = jvm
        self._in = fs.open(p)
        self._len = fs.getFileStatus(p).getLen()
        self._pos = 0
        self.closed = False

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 1:
            offset += self._pos
        elif whence == 2:
            offset += self._len
        self._pos = max(0, min(int(offset), self._len))
        self._in.seek(self._pos)
        return self._pos

    def tell(self) -> int:
        return self._pos

    def size(self) -> int:
        return self._len

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._len - self._pos
        n = min(int(n), self._len - self._pos)
        if n <= 0:
            return b""
        data = bytes(
            self._jvm.org.apache.commons.io.IOUtils.toByteArray(
                self._in, n
            )
        )
        self._pos += len(data)
        return data

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def close(self) -> None:
        if not self.closed:
            self._in.close()
            self.closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
