"""Thin filesystem layer for collection metadata I/O.

Spark itself handles bulk data I/O through Hadoop FileSystems (so ``s3a://``,
``gs://``, ``abfs://`` work wherever the cluster is configured for them); this
module only covers the *small-file* metadata operations the engine needs
driver-side: ``_zcollection.json``, ``_catalog/state.json``, ``_immutable``
markers and partition-directory walks.  It plays the role of the reference's
``Store`` ABC (``/root/reference/zcollection/store/base.py:42-94``) with two
implementations:

- :class:`LocalFS` — plain ``pathlib`` for ``file://`` / bare paths, with the
  reference's atomic tmp+rename write (``store/local.py:66-74``).
- :class:`HadoopFS` — py4j bridge to ``org.apache.hadoop.fs.FileSystem`` for
  any scheme the Spark runtime supports (object stores); the path-walk and
  read/write primitives go through the JVM so no extra Python deps are needed.

Atomicity note: on object stores a single PUT is atomic, which is all the
catalog swap protocol requires (see ``catalog.py``).
"""

from __future__ import annotations

import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import SparkSession


class LocalFS:
    """Metadata I/O on the local filesystem."""

    def exists(self, path: str) -> bool:
        return Path(path).exists()

    def read_text(self, path: str) -> str:
        return Path(path).read_text()

    def write_text(self, path: str, data: str) -> None:
        target = Path(path)
        target.parent.mkdir(parents=True, exist_ok=True)
        tmp = target.parent / f".{target.name}.{uuid.uuid4().hex}.tmp"
        tmp.write_text(data)
        os.replace(tmp, target)  # atomic on POSIX

    def delete(self, path: str) -> None:
        target = Path(path)
        if target.is_dir():
            shutil.rmtree(target, ignore_errors=True)
        elif target.exists():
            target.unlink()

    def mkdirs(self, path: str) -> None:
        Path(path).mkdir(parents=True, exist_ok=True)

    def rename(self, src: str, dst: str) -> bool:
        """Atomic move; False if the destination already exists."""
        try:
            os.rename(src, dst)
            return True
        except OSError:
            return False

    def list_files(self, path: str) -> list[str]:
        """Names of the plain files directly under ``path`` (sorted)."""
        target = Path(path)
        if not target.is_dir():
            return []
        return sorted(p.name for p in target.iterdir() if p.is_file())

    def list_dirs(self, path: str) -> list[str]:
        """Names of the directories directly under ``path`` (sorted)."""
        target = Path(path)
        if not target.is_dir():
            return []
        return sorted(p.name for p in target.iterdir() if p.is_dir())

    def list_partition_dirs(self, root: str, depth: int) -> list[str]:
        """Relative ``key=value/.../key=value`` dirs exactly ``depth`` deep.

        Mirrors the reference's depth-limited sorted store walk
        (``/root/reference/zcollection/collection/base.py:340-386``); hidden
        (``_``/``.``-prefixed) entries are skipped, matching Spark's own
        partition-discovery convention.
        """
        results: list[str] = []

        def walk(cur: Path, level: int, rel: str) -> None:
            if level == depth:
                results.append(rel)
                return
            if not cur.is_dir():
                return
            for child in sorted(cur.iterdir()):
                name = child.name
                if not child.is_dir() or name.startswith(("_", ".")):
                    continue
                if "=" not in name:
                    continue
                walk(child, level + 1, f"{rel}/{name}" if rel else name)

        walk(Path(root), 0, "")
        return results


class HadoopFS:
    """Metadata I/O through the JVM Hadoop FileSystem (any scheme)."""

    def __init__(self, spark: SparkSession):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _fs_path(self, path: str):
        jpath = self._jvm.org.apache.hadoop.fs.Path(path)
        return jpath.getFileSystem(self._conf), jpath

    def exists(self, path: str) -> bool:
        fs, jpath = self._fs_path(path)
        return fs.exists(jpath)

    def read_text(self, path: str) -> str:
        fs, jpath = self._fs_path(path)
        stream = fs.open(jpath)
        try:
            # py4j converts byte arrays BY VALUE, so the in-out
            # ``stream.read(buf)`` idiom never fills the Python-side buffer.
            # Drain the stream JVM-side and take the returned byte[] (py4j
            # maps Java byte[] return values to Python bytes).
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            return bytes(data).decode("utf-8")
        finally:
            stream.close()

    def write_text(self, path: str, data: str) -> None:
        fs, jpath = self._fs_path(path)
        stream = fs.create(jpath, True)
        try:
            stream.write(bytearray(data.encode("utf-8")))
        finally:
            stream.close()

    def delete(self, path: str) -> None:
        fs, jpath = self._fs_path(path)
        fs.delete(jpath, True)

    def mkdirs(self, path: str) -> None:
        fs, jpath = self._fs_path(path)
        fs.mkdirs(jpath)

    def rename(self, src: str, dst: str) -> bool:
        fs, jsrc = self._fs_path(src)
        _, jdst = self._fs_path(dst)
        return bool(fs.rename(jsrc, jdst))

    def _list_names(self, path: str, want_dirs: bool) -> list[str]:
        fs, jpath = self._fs_path(path)
        if not fs.exists(jpath):
            return []
        return sorted(s.getPath().getName() for s in fs.listStatus(jpath)
                      if s.isDirectory() == want_dirs)

    def list_files(self, path: str) -> list[str]:
        return self._list_names(path, want_dirs=False)

    def list_dirs(self, path: str) -> list[str]:
        return self._list_names(path, want_dirs=True)

    def list_partition_dirs(self, root: str, depth: int) -> list[str]:
        fs, jroot = self._fs_path(root)
        results: list[str] = []

        def walk(jpath, level: int, rel: str) -> None:
            if level == depth:
                results.append(rel)
                return
            for status in fs.listStatus(jpath):
                if not status.isDirectory():
                    continue
                name = status.getPath().getName()
                if name.startswith(("_", ".")) or "=" not in name:
                    continue
                walk(status.getPath(), level + 1,
                     f"{rel}/{name}" if rel else name)

        walk(jroot, 0, "")
        return sorted(results)


def fs_for(path: str, spark: SparkSession | None = None):
    """Pick the metadata FS for ``path`` by scheme."""
    if "://" in path and not path.startswith("file://"):
        if spark is None:
            raise ValueError(f"non-local path {path!r} needs a SparkSession")
        return HadoopFS(spark)
    return LocalFS()


def strip_scheme(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path
