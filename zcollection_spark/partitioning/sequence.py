"""Sequence partitioning: one partition per unique integer value-tuple.

Re-expresses ``/root/reference/zcollection/partitioning/sequence.py:20-156``.
The key columns ARE the data columns; Spark's ``partitionBy`` removes them
from data files and restores them from paths on read (the Collection casts
them back to their declared dtype, since partition-value inference may
narrow e.g. int64 → int32).  Non-integral columns are rejected, matching the
reference (``sequence.py:150-156``).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import PartitioningError
from .base import Partitioning

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


class Sequence(Partitioning):
    def __init__(self, variables: tuple[str, ...] | list[str], *,
                 dimension: str | None = None):
        variables = tuple(variables)
        if not variables:
            raise PartitioningError("Sequence needs at least one variable")
        self.variables = variables
        self.keys = variables
        self.dimension = dimension or variables[0]

    def key_columns(self) -> dict[str, Column]:
        return {name: F.col(name) for name in self.keys}

    def _check_integral(self, df: DataFrame) -> None:
        for col in self.variables:
            if col not in df.columns:
                raise PartitioningError(f"column {col!r} not in DataFrame")
            if not isinstance(df.schema[col].dataType, _INTEGRAL):
                raise PartitioningError(
                    f"Sequence partitioning requires integer columns; "
                    f"{col!r} is {df.schema[col].dataType.simpleString()}")

    def derive_pandas(self, pdf):
        for col in self.variables:
            if col not in pdf.columns:
                raise PartitioningError(f"column {col!r} not in frame")
        return pdf

    def derive(self, df: DataFrame) -> DataFrame:
        # keys are the data columns themselves — nothing to append
        self._check_integral(df)
        return df

    def to_json(self) -> dict[str, Any]:
        return {"kind": "Sequence", "variables": list(self.variables),
                "dimension": self.dimension}

    @classmethod
    def from_json(cls, doc: Mapping[str, Any]) -> "Sequence":
        return cls(tuple(doc["variables"]), dimension=doc.get("dimension"))
