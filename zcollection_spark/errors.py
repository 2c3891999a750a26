"""Error taxonomy.

Mirrors the reference's exception design (``/root/reference/zcollection/errors.py:8-45``)
so user code can catch the same class of failures, re-expressed for the Spark
engine (no async/store-session errors; Spark surfaces those as AnalysisException).
"""

from __future__ import annotations


class ZCollectionError(Exception):
    """Base class for all engine errors."""


class SchemaError(ZCollectionError):
    """Invalid schema construction or bind-time violation."""


class PartitioningError(ZCollectionError):
    """Invalid partitioning definition or key decode failure."""


class ExpressionError(ZCollectionError):
    """Invalid partition-filter expression (syntax or unknown key)."""


class StoreError(ZCollectionError):
    """Storage-layer failure (unreadable config, bad layout)."""


class CommitConflictError(StoreError):
    """Conditional metadata write lost a compare-and-swap race.

    Raised by ``fs.write_if`` when the target changed between the
    versioned read and the conditional PUT (another writer committed
    first).  Callers (``Catalog.add``) re-read, re-merge and retry —
    the optimistic-concurrency loop that makes concurrent catalog
    commits converge to the union instead of last-writer-wins."""


class CollectionExistsError(StoreError):
    """``create_collection`` target already exists and overwrite=False."""


class CollectionNotFoundError(StoreError):
    """``open_collection`` target has no ``_zcollection.json``."""


class ReadOnlyError(ZCollectionError):
    """Write attempted on a collection opened with mode='r'."""


class DriverBoundExceededError(ZCollectionError):
    """A documented driver-side bound was exceeded.

    The engine keeps a handful of DELIBERATE driver-side collects —
    ``brute_force_topk``'s query set, ``embedding_dup_pairs``'s
    ``method="broadcast"`` comparison set, ``insert``'s partition-key
    enumeration.  Each is bounded by cardinality (queries / comparison
    rows / distinct keys), not data volume, and each has a distributed
    alternative for the 100-TB regime.  This error makes the misuse
    mode LOUD: instead of silently OOMing the driver, the offending
    call fails fast, names the bound and the config key that moves it,
    and points at the scale path to use instead."""


class LeaseHeldError(StoreError):
    """An exclusive-writer lease is held by another live writer.

    Raised by ``Collection.exclusive_writer`` when the lease file
    exists, is unexpired, and belongs to someone else.  The protocol
    itself tolerates concurrent writers (union convergence); the lease
    is the opt-in mutual exclusion for pipelines that want exactly one
    producer."""


class FormatVersionError(SchemaError):
    """On-disk format_version is newer than this library supports."""


class ViewError(ZCollectionError):
    """Invalid view definition (name collision, unknown dimension)."""


class IndexerError(ZCollectionError):
    """Secondary-index build/lookup failure (e.g. unknown column)."""
