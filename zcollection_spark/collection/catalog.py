"""O(1) partition catalog: ``_catalog/state.json``.

Re-expresses ``/root/reference/zcollection/partitioning/catalog.py:72-167``:
a JSON document holding the complete sorted partition relpath list plus a
sha256 checksum.  A corrupted or checksum-mismatched document is treated as
missing (the reference's intent behind its broken ``except A, B:`` at
``catalog.py:98`` — SURVEY quirk Q1), falling back to a store walk.

At 100 TB scale this is the difference between one small GET and a recursive
object-store LIST over thousands of prefixes on every read.  The write is a
single atomic PUT (tmp+rename locally), so readers see either the old or the
new complete list — the commit point of the insert protocol.
"""

from __future__ import annotations

import hashlib
import json
import threading
from collections import defaultdict

CATALOG_RELPATH = "_catalog/state.json"

#: per-path locks serializing read-modify-write catalog updates within a
#: process (concurrent driver threads).  Cross-process writers still race
#: last-wins — as in the reference — and ``repair_catalog`` reconciles.
_LOCKS: defaultdict[str, threading.Lock] = defaultdict(threading.Lock)


def _checksum(partitions: list[str]) -> str:
    return hashlib.sha256("\n".join(partitions).encode()).hexdigest()


class Catalog:
    def __init__(self, fs, root: str, *, walk_depth: int | None = None):
        self._fs = fs
        self._root = root.rstrip("/")
        self._path = f"{self._root}/{CATALOG_RELPATH}"
        self._walk_depth = walk_depth

    def _baseline(self) -> list[str]:
        """Current catalog, or — if it's absent/corrupt — a store walk.

        Without the walk, an ``add()`` on a corrupt catalog would write a
        valid-but-incomplete document containing only the delta, silently
        hiding every pre-existing partition from catalog readers until a
        manual ``repair_catalog``.
        """
        current = self.read()
        if current is not None:
            return current
        if self._walk_depth is not None:
            return self._fs.list_partition_dirs(self._root, self._walk_depth)
        return []

    def _read_doc(self) -> dict | None:
        """Validated catalog document, or None if absent/corrupt."""
        if not self._fs.exists(self._path):
            return None
        try:
            doc = json.loads(self._fs.read_text(self._path))
            partitions = list(doc["partitions"])
            if doc.get("checksum") != _checksum(partitions):
                return None  # corrupt → treated missing (quirk Q1 intent)
            return doc
        except (ValueError, KeyError, OSError):
            return None

    def read(self) -> list[str] | None:
        """Sorted partition relpaths, or None if absent/corrupt."""
        doc = self._read_doc()
        return list(doc["partitions"]) if doc is not None else None

    def read_txn(self, app_id: str) -> int:
        """Highest committed transaction version for ``app_id`` (-1 if
        none).  The txn map commits in the SAME atomic catalog PUT as
        the partition list — the Delta-style streaming-sink idempotence
        ledger: a replayed micro-batch whose version is already recorded
        was fully committed and must be skipped."""
        doc = self._read_doc()
        if doc is None:
            return -1
        return int(doc.get("txn", {}).get(app_id, -1))

    def write(self, partitions: list[str],
              txn_map: dict | None = None) -> None:
        """Write the full document.  ``txn_map=None`` PRESERVES the
        existing txn ledger (a catalog rebuild from a store walk must
        not forget committed stream batches); pass ``{}`` to reset."""
        if txn_map is None:
            doc0 = self._read_doc()
            txn_map = dict((doc0 or {}).get("txn", {}))
        partitions = sorted(set(partitions))
        doc = {"format_version": 1, "partitions": partitions,
               "checksum": _checksum(partitions)}
        if txn_map:
            doc["txn"] = {k: int(v) for k, v in sorted(txn_map.items())}
        self._fs.write_text(self._path, json.dumps(doc, indent=1))

    def add(self, new: list[str],
            txn: "tuple[str, int] | None" = None) -> list[str]:
        with _LOCKS[self._path]:
            # one GET serves both the baseline and the txn ledger (the
            # commit path's metadata-op budget is benched — don't read
            # the document twice)
            doc0 = self._read_doc()
            txn_map = dict((doc0 or {}).get("txn", {}))
            if txn is not None:
                app, version = txn
                txn_map[app] = max(int(version),
                                   int(txn_map.get(app, -1)))
            if doc0 is not None:
                base = list(doc0["partitions"])
            elif self._walk_depth is not None:
                base = self._fs.list_partition_dirs(self._root,
                                                    self._walk_depth)
            else:
                base = []
            merged = sorted(set(base) | set(new))
            self.write(merged, txn_map=txn_map)
            return merged

    def remove(self, gone: list[str]) -> list[str]:
        with _LOCKS[self._path]:
            merged = sorted(set(self._baseline()) - set(gone))
            self.write(merged)
            return merged

    def drop(self) -> None:
        self._fs.delete(self._path)
