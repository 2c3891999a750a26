"""GroupedSequence partitioning: Sequence with the last variable bucketed.

Re-expresses ``/root/reference/zcollection/partitioning/grouped.py:27-149``:
bucket value = ``(v - start) // size * size + start`` (floor division,
``grouped.py:112-114``), ``size >= 2``.

Documented deviation: the reference uses the raw variable name as the path
component for the bucketed key while also storing the raw values in the data.
Spark forbids a column appearing in both the partition schema and the data
schema, so the bucketed key component is named ``<variable>_bucket`` here;
filter expressions use that name (e.g. ``"pass_no_bucket == 51"``).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import PartitioningError
from .base import Partitioning
from .sequence import Sequence


class GroupedSequence(Sequence):
    def __init__(self, variables: tuple[str, ...] | list[str], *,
                 dimension: str | None = None, size: int, start: int = 0):
        super().__init__(variables, dimension=dimension)
        if size < 2:
            raise PartitioningError("bucket size must be >= 2")
        self.size = int(size)
        self.start = int(start)
        *exact, last = self.variables
        self.bucket_variable = last
        self.bucket_key = f"{last}_bucket"
        self.keys = tuple(exact) + (self.bucket_key,)

    def key_columns(self) -> dict[str, Column]:
        cols: dict[str, Column] = {name: F.col(name)
                                   for name in self.variables[:-1]}
        v = F.col(self.bucket_variable)
        # floor division like numpy's //: F.floor handles negative values too
        bucket = (F.floor((v - F.lit(self.start)) / F.lit(self.size))
                  .cast("long") * self.size + self.start)
        cols[self.bucket_key] = bucket.alias(self.bucket_key)
        return cols

    def derive_pandas(self, pdf):
        out = pdf.copy()
        v = out[self.bucket_variable].astype("int64")
        out[self.bucket_key] = ((v - self.start) // self.size
                                * self.size + self.start)
        return out

    def derive(self, df: DataFrame) -> DataFrame:
        self._check_integral(df)
        return df.withColumn(self.bucket_key,
                             self.key_columns()[self.bucket_key])

    def to_json(self) -> dict[str, Any]:
        return {"kind": "GroupedSequence", "variables": list(self.variables),
                "dimension": self.dimension, "size": self.size,
                "start": self.start}

    @classmethod
    def from_json(cls, doc: Mapping[str, Any]) -> "GroupedSequence":
        return cls(tuple(doc["variables"]), dimension=doc.get("dimension"),
                   size=doc["size"], start=doc.get("start", 0))
