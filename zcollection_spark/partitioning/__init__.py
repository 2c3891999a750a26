"""Partitioning schemes: how data columns derive partition-key columns.

Re-expresses ``/root/reference/zcollection/partitioning/`` as *column
expression factories*: each scheme appends derived partition-key columns to a
DataFrame (``derive``), and Spark's shuffle-on-partitionBy groups all rows of
a key before write — which fixes the reference's fragmented-key insert hazard
(SURVEY Q3) by construction.
"""

from __future__ import annotations

from typing import Any, Mapping

from .base import Partitioning
from .date import Date
from .expression import Predicate, compile_filter
from .grouped import GroupedSequence
from .sequence import Sequence

_REGISTRY = {"Date": Date, "Sequence": Sequence,
             "GroupedSequence": GroupedSequence}


def from_json(doc: Mapping[str, Any]) -> Partitioning:
    """Reconstruct a partitioning from its JSON document
    (``/root/reference/zcollection/partitioning/__init__.py:32-52``)."""
    kind = doc["kind"]
    try:
        cls = _REGISTRY[kind]
    except KeyError:
        raise ValueError(f"unknown partitioning kind {kind!r}") from None
    return cls.from_json(doc)


__all__ = ["Partitioning", "Date", "Sequence", "GroupedSequence",
           "Predicate", "compile_filter", "from_json"]
