"""Hadoop FileSystem helpers shared by every loader.

One storage protocol for vault + star loaders: all existence checks,
deletes, renames and small text sidecars go through the session's
Hadoop FileSystem API, so the same code works on file://, hdfs://,
s3a:// etc. — `os.path`/`shutil` would silently only work locally
(the reference's loaders use Hadoop FS throughout, e.g.
ParquetDataLoader.scala:337, HiveDataLoader.scala:334).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class HadoopFS:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    def _fs_path(self, path: str):
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, jpath

    def exists(self, path: str) -> bool:
        fs, jpath = self._fs_path(path)
        return fs.exists(jpath)

    def delete(self, path: str) -> None:
        fs, jpath = self._fs_path(path)
        fs.delete(jpath, True)

    def rename(self, src: str, dst: str) -> None:
        fs, jsrc = self._fs_path(src)
        _, jdst = self._fs_path(dst)
        fs.rename(jsrc, jdst)

    def write_text(self, path: str, text: str) -> None:
        """Create/overwrite a small text file (meta.json / proc.csv
        sidecars)."""
        fs, jpath = self._fs_path(path)
        out = fs.create(jpath, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def list_names(self, path: str) -> list[str]:
        """Child entry names directly under `path` (empty when the
        path is absent) — partition-directory discovery for the
        maintenance utilities."""
        fs, jpath = self._fs_path(path)
        if not fs.exists(jpath):
            return []
        return [st.getPath().getName() for st in fs.listStatus(jpath)]

    def file_count(self, path: str) -> int:
        fs, jpath = self._fs_path(path)
        if not fs.exists(jpath):
            return 0
        return fs.getContentSummary(jpath).getFileCount()

    def size_bytes(self, path: str) -> int:
        fs, jpath = self._fs_path(path)
        if not fs.exists(jpath):
            return 0
        return fs.getContentSummary(jpath).getLength()

    def fingerprint(self, path: str) -> str | None:
        """Cheap snapshot identity for a data directory:
        ``"<dir-mtime>:<total-bytes>:<file-count>:<max-file-mtime>"``
        (None when absent). The directory's own mtime catches local /
        HDFS rewrites (rename-into-place keeps the staging write's
        stamp), but on object stores (s3a://) directories are
        synthetic and their mtime is typically 0 (ADVICE r13) — so
        the identity also folds in the recursive file count and the
        MAX file modification time from one ``listFiles`` sweep: an
        external rewrite changes file mtimes even when it reproduces
        the exact byte count. Used to verify a bucketed mirror still
        matches the path source of truth before serving it (ADVICE
        r12: a writer without the mirror knob, or an external rewrite
        of the path, must not let a stale mirror win)."""
        fs, jpath = self._fs_path(path)
        if not fs.exists(jpath):
            return None
        st = fs.getFileStatus(jpath)
        n_files, total, max_mtime = 0, 0, 0
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            f = it.next()
            n_files += 1
            total += f.getLen()
            max_mtime = max(max_mtime, f.getModificationTime())
        return (
            f"{st.getModificationTime()}:{total}:{n_files}:{max_mtime}"
        )

    def read_text(self, path: str) -> str | None:
        # NB: reading into a Python bytearray buffer does NOT work —
        # py4j passes byte[] by value, so Java's writes into the buffer
        # never reach Python (the r1 code silently returned NULs).
        # Decode fully on the JVM side instead.
        fs, jpath = self._fs_path(path)
        if not fs.exists(jpath):
            return None
        stream = fs.open(jpath)
        try:
            return self.spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
