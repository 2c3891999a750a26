"""Read-only bridge to reference-written icechunk repositories.

The reference can host a collection inside an icechunk repository
(``/root/reference/zcollection/store/icechunk_store.py:98-282``): a
transactional log over object storage where every partition is a Zarr
v3 group, the JSON sidecars (``_zcollection.json``) are routed into the
attributes of tiny zarr groups under ``_zc_meta/``, and each snapshot
is an atomic commit.  This repo reproduces the *semantics* natively
(staging + catalog generations + time travel) — this module is the
*format* bridge for users with existing reference-written icechunk
repos: ``open_icechunk_collection(spark, path)`` reads one as Spark
DataFrames, with snapshots mapped onto the same history/time-travel
vocabulary as :meth:`Collection.history` / ``at_generation``.

Read-only by design: writes belong to the native Spark collection (a
migration is ``open_icechunk_collection(...).query()`` →
``Collection.insert``).  The bridge needs the OPTIONAL ``icechunk`` and
``zarr`` packages (icechunk's store API itself trades in zarr buffer
prototypes, so both are required together); without them every entry
point raises a clear :class:`~zcollection_spark.errors.StoreError` at
call time — the same honesty contract as the multimodal decoders.
Correctness is pinned by ``tests/test_icechunk_compat.py``, which
writes a repo through icechunk+zarr and round-trips it (skipped where
the optional libs are absent).

Scale shape: the partition list and config are driver-side metadata
reads (one zarr-group walk); partition DATA is read on EXECUTORS — the
scan is a ``mapInPandas`` over the partition list where each task opens
its own read-only session pinned to the resolved snapshot id (a plain
string, so the closure ships nothing unpicklable, and a concurrent
branch commit can never tear a scan).
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Mapping

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .errors import CollectionNotFoundError, StoreError
from .partitioning import Date, GroupedSequence, Sequence, compile_filter

#: Reserved top-level group holding the reference's non-zarr config
#: blobs (icechunk only accepts zarr-formatted keys, so JSON sidecars
#: ride group attributes; ``icechunk_store.py:36-72``).
META_DIR = "_zc_meta"
_PAYLOAD_ATTR = "_payload"
CONFIG_FILE = "_zcollection.json"
IMMUTABLE_DIR = "_immutable"


def _require_libs():
    try:
        import icechunk  # noqa: F401
        import zarr  # noqa: F401
    except ImportError as exc:
        raise StoreError(
            "reading icechunk repositories needs the optional "
            "'icechunk' and 'zarr' packages (pip install icechunk "
            "zarr); the native Spark collection format has no such "
            f"dependency.  Import failed: {exc}") from None
    return icechunk, zarr


def _strip_scheme(path: str) -> str:
    return path[len("icechunk://"):] if path.startswith("icechunk://") \
        else path


def _open_readonly(path: str, *, branch: str | None,
                   snapshot_id: str | None):
    """(repo, session) for a local-filesystem icechunk repo, read-only.

    Object-store-backed repos work by passing an ``icechunk.Storage``
    through the same keyword icechunk itself uses — out of scope here
    (the bridge targets the reference's local test/fixture shape;
    ``icechunk.local_filesystem_storage``, ``icechunk_store.py:120-133``).
    """
    icechunk, _ = _require_libs()
    storage = icechunk.local_filesystem_storage(_strip_scheme(path))
    try:
        repo = icechunk.Repository.open(storage)
    except Exception as exc:
        raise CollectionNotFoundError(
            f"no icechunk repository at {path!r}: {exc}") from None
    if snapshot_id is not None:
        session = repo.readonly_session(snapshot_id=snapshot_id)
    else:
        session = repo.readonly_session(branch=branch or "main")
    return repo, session


def _meta_payload(zarr_mod, store, key: str) -> str | None:
    """A JSON sidecar the reference routed into ``_zc_meta`` group
    attrs (``icechunk_store.py:55-72``: slug = key with ``/``→``__``,
    payload in the ``_payload`` attribute)."""
    slug = key.replace("/", "__")
    try:
        grp = zarr_mod.open_group(store=store, path=f"{META_DIR}/{slug}",
                                  mode="r")
    except Exception:
        return None
    payload = dict(grp.attrs).get(_PAYLOAD_ATTR)
    return payload if isinstance(payload, str) else None


def _translate_partitioning(doc: Mapping[str, Any]):
    """Reference partitioning payload → this repo's classes.

    Reference serde (``partitioning/date.py:196-204``,
    ``sequence.py:124-131``) keys on ``name`` and stores the column(s)
    under ``variable``/``variables``; ours keys on ``kind``.
    """
    name = (doc.get("name") or "").lower()
    variables = doc.get("variables")
    if variables is None:
        one = doc.get("variable")
        variables = [one] if one is not None else []
    variables = tuple(variables)
    if name == "date":
        return Date(variables, resolution=doc.get("resolution", "D"))
    if name == "sequence":
        return Sequence(variables)
    if name == "grouped-sequence":
        return GroupedSequence(variables, size=int(doc["size"]),
                               start=int(doc.get("start", 0)))
    raise StoreError(f"unknown reference partitioning {name!r} in "
                     f"icechunk root config")


def _walk_partitions(zarr_mod, store, depth: int) -> list[str]:
    """Partition relpaths = group paths of ``key=value`` components at
    the partitioning depth (the reference's walk,
    ``collection/base.py:370-385``), skipping the reserved dirs."""
    reserved = {META_DIR, IMMUTABLE_DIR, "_catalog"}
    out: list[str] = []

    def walk(prefix: str, level: int) -> None:
        grp = zarr_mod.open_group(store=store, path=prefix or None,
                                  mode="r")
        for child, node in grp.groups():
            if not prefix and (child in reserved
                               or child.startswith(("_", "."))):
                continue
            if "=" not in child:
                continue
            rel = f"{prefix}/{child}" if prefix else child
            if level + 1 == depth:
                out.append(rel)
            else:
                walk(rel, level + 1)

    walk("", 0)
    return out


def _flat_arrays(zarr_mod, store, path: str,
                 wanted: "set[str] | None" = None,
                 meta_only: bool = False) -> dict:
    """Arrays under a group, nested groups flattened to the same
    path-mangled names the native schema uses (``a/b/c``).

    Projection pushes down to the chunk reads: ``wanted`` (full or
    short names) restricts which arrays are MATERIALIZED — unselected
    arrays are never read, matching the native collection's
    column-pruning contract.  ``meta_only=True`` returns zero-row
    arrays of the right dtype/dimensionality from the zarr metadata
    alone — the schema probe reads no chunk data at all.
    """
    out: dict = {}

    def keep(name: str) -> bool:
        return (wanted is None or name in wanted
                or name.rsplit("/", 1)[-1] in wanted)

    def walk(prefix: str, grp) -> None:
        for name, arr in grp.arrays():
            full = f"{prefix}{name}"
            if not keep(full):
                continue
            if meta_only:
                out[full] = np.empty((0,) * max(arr.ndim, 1),
                                     dtype=arr.dtype)
            else:
                out[full] = np.asarray(arr[...])
        for name, sub in grp.groups():
            walk(f"{prefix}{name}/", sub)

    walk("", zarr_mod.open_group(store=store, path=path, mode="r"))
    return out


def _spark_field(name: str, arr: np.ndarray) -> T.StructField:
    kind = arr.dtype.kind
    if kind == "M":
        elem: T.DataType = T.TimestampType()
    elif kind == "f":
        elem = T.FloatType() if arr.dtype.itemsize == 4 \
            else T.DoubleType()
    elif kind in "iu":
        elem = T.LongType() if arr.dtype.itemsize > 4 or kind == "u" \
            else T.IntegerType()
    elif kind == "b":
        elem = T.BooleanType()
    else:
        elem = T.StringType()
    for _ in range(arr.ndim - 1):
        elem = T.ArrayType(elem)
    return T.StructField(name, elem)


def _to_pandas_col(arr: np.ndarray):
    if arr.dtype.kind == "M":
        arr = arr.astype("datetime64[us]")
    if arr.ndim == 1:
        return arr
    return [row.tolist() for row in arr]


class IcechunkCollection:
    """Read-only handle on a reference-written icechunk collection.

    ``query()`` / ``partitions()`` / ``history()`` /
    ``at_snapshot()`` mirror the native :class:`Collection` read
    vocabulary; every mutating verb is absent by construction.
    """

    def __init__(self, spark: SparkSession, path: str, *,
                 branch: str | None = "main",
                 snapshot_id: str | None = None) -> None:
        icechunk, zarr_mod = _require_libs()
        self.spark = spark
        self.path = _strip_scheme(path)
        self.branch = branch
        self._zarr = zarr_mod
        self._repo, self._session = _open_readonly(
            path, branch=branch, snapshot_id=snapshot_id)
        #: Every read in this handle is pinned here — executors reopen
        #: by id, so a concurrent branch commit cannot tear a scan.
        self.snapshot_id = str(self._session.snapshot_id)
        raw = _meta_payload(zarr_mod, self._session.store, CONFIG_FILE)
        if raw is None:
            raise CollectionNotFoundError(
                f"icechunk repo at {path!r} holds no {CONFIG_FILE} "
                f"meta payload — not a reference-written collection")
        doc = json.loads(raw)
        self.axis: str = doc["axis"]
        self.partitioning = _translate_partitioning(doc["partitioning"])
        self.config: dict = doc

    # -- metadata ------------------------------------------------------
    def partitions(self, *, filters: str | None = None) -> list[str]:
        """Partition relpaths (numeric key order), optionally filtered
        with the same key-predicate grammar as the native collection."""
        rels = _walk_partitions(self._zarr, self._session.store,
                                self.partitioning.depth)
        predicate = compile_filter(filters)
        decoded = [(rel, self.partitioning.decode(rel)) for rel in rels]
        matched = [(rel, key) for rel, key in decoded
                   if predicate.evaluate(key)]
        matched.sort(key=lambda item: tuple(
            item[1][k] for k in self.partitioning.keys))
        return [rel for rel, _ in matched]

    def history(self) -> list[dict]:
        """Snapshots on the branch, newest first — icechunk's commit
        log surfaced in the ``Collection.history()`` shape (id,
        message, written_at)."""
        out = []
        for snap in self._repo.ancestry(branch=self.branch or "main"):
            out.append({"snapshot_id": str(snap.id),
                        "message": snap.message,
                        "written_at": snap.written_at})
        return out

    def at_snapshot(self, snapshot_id: str) -> "IcechunkCollection":
        """This collection AS OF an earlier snapshot (time travel —
        the format-level twin of ``query(at_generation=...)``)."""
        return IcechunkCollection(self.spark, self.path,
                                  branch=self.branch,
                                  snapshot_id=snapshot_id)

    # -- read ----------------------------------------------------------
    def _immutable_columns(self) -> "dict[str, np.ndarray]":
        try:
            return _flat_arrays(self._zarr, self._session.store,
                                IMMUTABLE_DIR)
        except Exception:
            return {}

    def query(self, *, filters: str | None = None,
              variables: "list[str] | None" = None,
              ordered: bool = True) -> DataFrame | None:
        """filter → project → concat → attach immutables, as a Spark
        DataFrame.  ``None`` when no partition matches (quirk Q6
        parity with the native collection)."""
        rels = self.partitions(filters=filters)
        if not rels:
            return None
        # schema from the first partition's zarr METADATA (dtype/ndim
        # only — no chunk data is read to plan the scan)
        first = _flat_arrays(self._zarr, self._session.store, rels[0],
                             meta_only=True)
        names = [n for n in first
                 if variables is None or n in set(variables)
                 or n.rsplit("/", 1)[-1] in set(variables or ())]
        if not names:
            raise StoreError(f"no requested variable exists; partition "
                             f"holds {sorted(first)}")
        schema = T.StructType([_spark_field(n, first[n])
                               for n in sorted(names)])
        path, snap, ordered_names = self.path, self.snapshot_id, \
            sorted(names)
        wanted_set = set(ordered_names)

        def read(batches: Iterator[pd.DataFrame]) \
                -> Iterator[pd.DataFrame]:
            import icechunk
            import zarr as zarr_mod
            storage = icechunk.local_filesystem_storage(path)
            repo = icechunk.Repository.open(storage)
            store = repo.readonly_session(snapshot_id=snap).store
            for pdf in batches:
                for rel in pdf["rel"]:
                    # projection pushdown: only the selected arrays
                    # are materialized from the store
                    arrays = _flat_arrays(zarr_mod, store, rel,
                                          wanted=wanted_set)
                    yield pd.DataFrame({
                        n: _to_pandas_col(arrays[n])
                        for n in ordered_names})

        parts_df = self.spark.createDataFrame(
            [(r,) for r in rels], "rel string")
        df = parts_df.mapInPandas(read, schema=schema)
        imm = {n: v for n, v in self._immutable_columns().items()
               if variables is None or n in set(variables)
               or n.rsplit("/", 1)[-1] in set(variables or ())}
        for name, arr in sorted(imm.items()):
            # immutable variables have no partition axis: constant
            # per row, attached as a literal (broadcast by construction)
            val = arr.tolist() if arr.ndim else arr.item()
            df = df.withColumn(name, F.lit(val))
        if ordered and self.axis in df.columns:
            df = df.orderBy(self.axis)
        return df


def open_icechunk_collection(spark: SparkSession, path: str, *,
                             branch: str | None = "main",
                             snapshot_id: str | None = None
                             ) -> IcechunkCollection:
    """Open a reference-written icechunk repository read-only.

    Accepts a bare path or an ``icechunk://`` URL.  Requires the
    optional ``icechunk`` + ``zarr`` packages (clear error without
    them).
    """
    return IcechunkCollection(spark, path, branch=branch,
                              snapshot_id=snapshot_id)
