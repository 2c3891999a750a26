"""Partitioning protocol.

The reference's protocol (``/root/reference/zcollection/partitioning/base.py:20-53``)
is ``split(dataset) -> (key, slice)*`` — a driver-side grouping.  In Spark the
grouping is the shuffle: ``derive`` appends the key columns and
``df.write.partitionBy(keys)`` does the rest.  ``encode``/``decode`` keep the
``key=value/`` path round-trip for the catalog and driver-side pruning.

Deliberate deviation from the reference (documented, SURVEY Q2): partition
path values are NOT zero-padded; ordering is enforced numerically with an
explicit ``orderBy`` at query time instead of lexicographic path order.
"""

from __future__ import annotations

import abc
from typing import Any, Mapping

from pyspark.sql import Column, DataFrame

from ..errors import PartitioningError


class Partitioning(abc.ABC):
    """A scheme deriving partition-key columns from data columns."""

    #: data columns the scheme reads
    variables: tuple[str, ...]
    #: partition-key component names, in path order
    keys: tuple[str, ...]

    @abc.abstractmethod
    def derive_pandas(self, pdf):
        """Executor-side twin of :meth:`derive` for pandas frames (used by
        the zarr3 DataSource writer, where key derivation happens inside
        the write task)."""
        raise NotImplementedError

    def derive(self, df: DataFrame) -> DataFrame:
        """Append the key columns (pure column expressions, JVM-side)."""

    @abc.abstractmethod
    def key_columns(self) -> dict[str, Column]:
        """Key name → defining Column expression (for docs/explain)."""

    @property
    def depth(self) -> int:
        return len(self.keys)

    # -- path round-trip --------------------------------------------------
    def encode(self, key: Mapping[str, Any]) -> str:
        """Key dict → relative path ``k1=v1/k2=v2``."""
        try:
            return "/".join(f"{k}={int(key[k])}" for k in self.keys)
        except KeyError as exc:
            raise PartitioningError(f"key missing component {exc}") from None

    def decode(self, relpath: str) -> dict[str, int]:
        """Relative path → key dict; integer values only (the reference's
        rule, ``partitioning/sequence.py:114-122,150-156``)."""
        parts = relpath.strip("/").split("/")
        if len(parts) != len(self.keys):
            raise PartitioningError(
                f"path {relpath!r} has {len(parts)} components, "
                f"expected {len(self.keys)}")
        out: dict[str, int] = {}
        for part, expected in zip(parts, self.keys):
            name, _, raw = part.partition("=")
            if name != expected:
                raise PartitioningError(
                    f"path component {part!r}: expected key {expected!r}")
            try:
                out[name] = int(raw)
            except ValueError:
                raise PartitioningError(
                    f"non-integer partition value {raw!r} in {relpath!r}"
                    ) from None
        return out

    def enumerate_keys(self, derived: DataFrame) -> list[dict[str, int]]:
        """Distinct incoming partition keys of ``derived`` (a frame that
        already carries the key columns), collected to the driver.

        This is the ONE deliberate driver-side collect on the write
        path — the standard dynamic-overwrite pattern, bounded by
        partition-KEY cardinality, never by rows.  At pathological
        cardinality (per-second keys over years of data) that bound is
        a driver-memory cliff, so it is hard-capped (r12 verdict):
        ``limit(cap + 1)`` keeps even the check itself bounded, and
        exceeding the ``insert.partition_key_cap`` config raises a loud
        :class:`~zcollection_spark.errors.DriverBoundExceededError`
        instead of OOMing.  A cap-sized key set signals a partitioning
        resolution mismatched to the data — coarsen the scheme (e.g.
        ``Date`` resolution ``'D'`` instead of ``'s'``) rather than
        raising the cap."""
        from .. import config
        from ..errors import DriverBoundExceededError
        cap = config.get("insert.partition_key_cap")
        keys = list(self.keys)
        rows = derived.select(*keys).distinct().limit(cap + 1).collect()
        if len(rows) > cap:
            raise DriverBoundExceededError(
                f"insert would enumerate more than {cap} distinct "
                f"partition keys on the driver (config "
                f"'insert.partition_key_cap').  The partitioning "
                f"resolution is too fine for this batch — coarsen "
                f"{type(self).__name__}'s resolution or split the "
                f"insert.")
        return [{k: int(row[k]) for k in keys} for row in rows]

    # -- serde ------------------------------------------------------------
    @abc.abstractmethod
    def to_json(self) -> dict[str, Any]: ...

    @classmethod
    @abc.abstractmethod
    def from_json(cls, doc: Mapping[str, Any]) -> "Partitioning": ...

    def __eq__(self, other: object) -> bool:
        return (type(self) is type(other)
                and self.to_json() == other.to_json())  # type: ignore[attr-defined]

    def __repr__(self) -> str:
        fields = ", ".join(f"{k}={v!r}" for k, v in self.to_json().items()
                           if k != "kind")
        return f"{type(self).__name__}({fields})"
