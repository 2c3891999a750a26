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
import threading
import uuid
from pathlib import Path

from pyspark.sql import SparkSession

#: Schemes where a Hadoop FileSystem ``rename`` is a non-atomic
#: copy+delete per object.  The staging protocol's swap publish assumes
#: atomic rename; on these stores the commit primitive must be the
#: catalog/manifest PUT instead (see staging.py design note).
_NON_ATOMIC_RENAME_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "oss", "cos", "wasb", "abfs", "abfss"})


def scheme_of(path: str) -> str:
    return path.split("://", 1)[0] if "://" in path else "file"


class LocalFS:
    """Metadata I/O on the local filesystem."""

    def supports_atomic_rename(self, path: str) -> bool:
        return True

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


class MemoryFS:
    """In-memory metadata store (reference ``store/memory.py:16``).

    A process-local namespace for tests and ephemeral catalogs: files
    are dict entries, renames are dict moves (atomic under the lock).
    It carries METADATA ONLY — Spark executors run in separate
    processes, so bulk partition data (parquet/zarr written by jobs)
    cannot land here; collection fixtures use it for the config/
    catalog/staging protocol surface, mirroring the reference's
    memory × local fixture matrix at the layer where it is honest.
    """

    def __init__(self):
        self._files: dict[str, str] = {}
        self._dirs: set[str] = set()
        self._lock = threading.RLock()

    @staticmethod
    def _norm(path: str) -> str:
        if path.startswith("memory://"):
            path = path[len("memory://"):]
        return path.rstrip("/")

    def supports_atomic_rename(self, path: str) -> bool:
        return True

    def exists(self, path: str) -> bool:
        p = self._norm(path)
        with self._lock:
            if p in self._files or p in self._dirs:
                return True
            prefix = p + "/"
            return any(k.startswith(prefix)
                       for k in (*self._files, *self._dirs))

    def read_text(self, path: str) -> str:
        p = self._norm(path)
        with self._lock:
            if p not in self._files:
                raise FileNotFoundError(path)
            return self._files[p]

    def write_text(self, path: str, data: str) -> None:
        p = self._norm(path)
        with self._lock:
            parent = p.rsplit("/", 1)[0] if "/" in p else ""
            if parent:
                self._dirs.add(parent)
            self._files[p] = data  # dict assignment: atomic PUT

    def delete(self, path: str) -> None:
        p = self._norm(path)
        prefix = p + "/"
        with self._lock:
            self._files.pop(p, None)
            self._dirs.discard(p)
            for k in [k for k in self._files if k.startswith(prefix)]:
                del self._files[k]
            self._dirs -= {d for d in self._dirs if d.startswith(prefix)}

    def mkdirs(self, path: str) -> None:
        with self._lock:
            self._dirs.add(self._norm(path))

    def rename(self, src: str, dst: str) -> bool:
        s, d = self._norm(src), self._norm(dst)
        with self._lock:
            if self.exists(dst):
                return False
            if not self.exists(src):
                return False
            sp = s + "/"
            moves_f = {k: d + k[len(s):] for k in self._files
                       if k == s or k.startswith(sp)}
            moves_d = {k: d + k[len(s):] for k in self._dirs
                       if k == s or k.startswith(sp)}
            for old, new in moves_f.items():
                self._files[new] = self._files.pop(old)
            for old, new in moves_d.items():
                self._dirs.discard(old)
                self._dirs.add(new)
            parent = d.rsplit("/", 1)[0] if "/" in d else ""
            if parent:
                self._dirs.add(parent)
            return True

    def _children(self, path: str) -> tuple[set[str], set[str]]:
        p = self._norm(path)
        prefix = p + "/" if p else ""
        files, dirs = set(), set()
        with self._lock:
            for k in self._files:
                if k.startswith(prefix):
                    rest = k[len(prefix):]
                    (files if "/" not in rest
                     else dirs).add(rest.split("/", 1)[0])
            for k in self._dirs:
                if k.startswith(prefix) and k != p:
                    dirs.add(k[len(prefix):].split("/", 1)[0])
        return files, dirs

    def list_files(self, path: str) -> list[str]:
        files, _ = self._children(path)
        return sorted(files)

    def list_dirs(self, path: str) -> list[str]:
        _, dirs = self._children(path)
        return sorted(dirs)

    def list_partition_dirs(self, root: str, depth: int) -> list[str]:
        results: list[str] = []

        def walk(cur: str, level: int, rel: str) -> None:
            if level == depth:
                results.append(rel)
                return
            for name in self.list_dirs(cur):
                if name.startswith(("_", ".")) or "=" not in name:
                    continue
                walk(f"{cur}/{name}", level + 1,
                     f"{rel}/{name}" if rel else name)

        walk(self._norm(root), 0, "")
        return sorted(results)


#: process-global memory:// namespace (the reference's memory store is
#: likewise shared per process, tests/conftest.py:66-113)
_MEMORY_FS = MemoryFS()


class HadoopFS:
    """Metadata I/O through the JVM Hadoop FileSystem (any scheme)."""

    def __init__(self, spark: SparkSession):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def supports_atomic_rename(self, path: str) -> bool:
        return scheme_of(path) not in _NON_ATOMIC_RENAME_SCHEMES

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


class CountingFS:
    """Op-counting decorator over any metadata FS — the analog of the
    reference's ``CountingProbe`` (``benches/probe.py:19-85``).

    Tallies the object-store op classes that dominate metadata cost at
    scale: ``get`` (read), ``put`` (write), ``list`` (directory/walk),
    ``head`` (exists), ``rename``, ``delete``.  Benches and tests use
    it to assert op BUDGETS — e.g. a catalog-backed cold open is O(1)
    GETs with zero LISTs, not a recursive store walk.
    """

    def __init__(self, inner):
        self.inner = inner
        from collections import Counter
        self.counts = Counter()

    def reset(self) -> None:
        self.counts.clear()

    def exists(self, path: str) -> bool:
        self.counts["head"] += 1
        return self.inner.exists(path)

    def read_text(self, path: str) -> str:
        self.counts["get"] += 1
        return self.inner.read_text(path)

    def write_text(self, path: str, data: str) -> None:
        self.counts["put"] += 1
        self.inner.write_text(path, data)

    def delete(self, path: str) -> None:
        self.counts["delete"] += 1
        self.inner.delete(path)

    def mkdirs(self, path: str) -> None:
        self.counts["mkdirs"] += 1
        self.inner.mkdirs(path)

    def rename(self, src: str, dst: str) -> bool:
        self.counts["rename"] += 1
        return self.inner.rename(src, dst)

    def list_files(self, path: str) -> list[str]:
        self.counts["list"] += 1
        return self.inner.list_files(path)

    def list_dirs(self, path: str) -> list[str]:
        self.counts["list"] += 1
        return self.inner.list_dirs(path)

    def list_partition_dirs(self, root: str, depth: int) -> list[str]:
        self.counts["list"] += 1
        return self.inner.list_partition_dirs(root, depth)

    def supports_atomic_rename(self, path: str) -> bool:
        return getattr(self.inner, "supports_atomic_rename",
                       lambda p: True)(path)

    def __getattr__(self, name):
        return getattr(self.inner, name)


def fs_for(path: str, spark: SparkSession | None = None):
    """Pick the metadata FS for ``path`` by scheme."""
    if path.startswith("memory://"):
        return _MEMORY_FS
    if "://" in path and not path.startswith("file://"):
        if spark is None:
            raise ValueError(f"non-local path {path!r} needs a SparkSession")
        return HadoopFS(spark)
    return LocalFS()


def strip_scheme(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path
