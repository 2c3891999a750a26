"""Date partitioning: truncate a timestamp column to a resolution.

Re-expresses ``/root/reference/zcollection/partitioning/date.py:48-220``:
key components ``year[,month,day,hour,minute,second]`` derived with the
built-in JVM functions ``F.year/F.month/...`` (whole-stage codegen — no
Python in the hot path).  The reference requires a datetime64 variable
(``date.py:122-126``); here the column must be TimestampType/DateType.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import PartitioningError
from .base import Partitioning

#: resolution char → (key name, deriving function), in truncation order
_LEVELS: tuple[tuple[str, str], ...] = (
    ("Y", "year"), ("M", "month"), ("D", "day"),
    ("h", "hour"), ("m", "minute"), ("s", "second"),
)
_FUNCS = {"year": F.year, "month": F.month, "day": F.dayofmonth,
          "hour": F.hour, "minute": F.minute, "second": F.second}


class Date(Partitioning):
    def __init__(self, variables: tuple[str, ...] | list[str], *,
                 resolution: str, dimension: str | None = None):
        variables = tuple(variables)
        if len(variables) != 1:
            raise PartitioningError("Date partitioning takes exactly one "
                                    "timestamp variable")
        chars = [c for c, _ in _LEVELS]
        if resolution not in chars:
            raise PartitioningError(
                f"resolution must be one of {chars}, got {resolution!r}")
        self.variables = variables
        self.resolution = resolution
        self.dimension = dimension or variables[0]
        upto = chars.index(resolution) + 1
        self.keys = tuple(name for _, name in _LEVELS[:upto])

    def key_columns(self) -> dict[str, Column]:
        src = F.col(self.variables[0])
        return {name: _FUNCS[name](src).alias(name) for name in self.keys}

    def derive_pandas(self, pdf):
        import pandas as pd
        src = pd.to_datetime(pdf[self.variables[0]])
        parts = {"year": src.dt.year, "month": src.dt.month,
                 "day": src.dt.day, "hour": src.dt.hour,
                 "minute": src.dt.minute, "second": src.dt.second}
        out = pdf.copy()
        for name in self.keys:
            out[name] = parts[name].astype("int64")
        return out

    def derive(self, df: DataFrame) -> DataFrame:
        col = self.variables[0]
        if col not in df.columns:
            raise PartitioningError(f"column {col!r} not in DataFrame")
        ctype = df.schema[col].dataType
        if not isinstance(ctype, (T.TimestampType, T.TimestampNTZType,
                                  T.DateType)):
            raise PartitioningError(
                f"Date partitioning requires a timestamp column; "
                f"{col!r} is {ctype.simpleString()}")
        return df.withColumns(self.key_columns())

    def to_json(self) -> dict[str, Any]:
        return {"kind": "Date", "variables": list(self.variables),
                "resolution": self.resolution, "dimension": self.dimension}

    @classmethod
    def from_json(cls, doc: Mapping[str, Any]) -> "Date":
        return cls(tuple(doc["variables"]), resolution=doc["resolution"],
                   dimension=doc.get("dimension"))
