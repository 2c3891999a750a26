"""Schema system: dimensions, variables, dataset schema, fluent builder.

Re-expresses the reference's schema tree
(``/root/reference/zcollection/schema/dataset.py:18``,
``schema/group.py:32``, ``schema/variable.py:26-46``,
``schema/dimension.py:11-28``, ``schema/builder.py:70-226``) for a columnar
engine:

- every variable becomes one Spark column.  A 1-D variable along the
  partition axis is a scalar column; an nD variable ``(axis, d2, ...)`` is an
  ``ArrayType`` column (nested arrays for 3-D+) with the fixed trailing sizes
  recorded in the schema;
- nested groups (``data_01/ku/power``) are path-mangled column names — the
  group tree is kept as metadata (per-group attrs), not as struct nesting, so
  Catalyst column pruning stays trivially effective;
- the bind-time invariant is preserved verbatim: after
  :meth:`DatasetSchema.with_partition_axis` every variable is either
  *partitioned* (its dims include the axis) or *immutable* (all dims have a
  fixed size); a second unbounded dimension is rejected
  (``schema/dataset.py:91-149,238-280``);
- serde to the ``_zcollection.json`` document with ``format_version`` and an
  upgrader chain (``schema/serde.py:22-55``, ``schema/versioning.py:19-66``).
"""

from __future__ import annotations

import dataclasses
import json
import math
from collections.abc import Callable, Iterable, Mapping
from typing import Any

from pyspark.sql import types as T

from .errors import FormatVersionError, SchemaError

FORMAT_VERSION = 1

#: numpy-dtype-string → Spark element type.  uint64 intentionally maps to
#: Decimal(20,0) (no unsigned 64-bit integral in Spark SQL).
_DTYPE_TO_SPARK: dict[str, T.DataType] = {
    "int8": T.ByteType(), "int16": T.ShortType(), "int32": T.IntegerType(),
    "int64": T.LongType(),
    "uint8": T.ShortType(), "uint16": T.IntegerType(),
    "uint32": T.LongType(), "uint64": T.DecimalType(20, 0),
    "float16": T.FloatType(), "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "bool": T.BooleanType(),
    "str": T.StringType(), "vlen-utf8": T.StringType(),
    "bytes": T.BinaryType(), "vlen-bytes": T.BinaryType(),
}

_SPARK_TO_DTYPE: dict[str, str] = {
    "tinyint": "int8", "smallint": "int16", "int": "int32", "bigint": "int64",
    "float": "float32", "double": "float64", "boolean": "bool",
    "string": "str", "binary": "bytes", "timestamp": "datetime64[us]",
    "timestamp_ntz": "datetime64[us]", "date": "datetime64[D]",
}


def dtype_to_spark(dtype: str) -> T.DataType:
    if dtype.startswith("datetime64"):
        return T.TimestampType()
    if dtype.startswith(("U", "<U")):
        return T.StringType()
    try:
        return _DTYPE_TO_SPARK[dtype]
    except KeyError:
        raise SchemaError(f"unsupported dtype {dtype!r}") from None


@dataclasses.dataclass(frozen=True)
class Dimension:
    """A named axis. ``size=None`` means unbounded (the partition axis).

    ``chunks`` informs output file sizing on write (the reference's chunk
    geometry, ``schema/dimension.py:11-28``, becomes ``maxRecordsPerFile``).
    """
    name: str
    size: int | None = None
    chunks: int | None = None

    @property
    def is_unbounded(self) -> bool:
        return self.size is None


@dataclasses.dataclass(frozen=True)
class VariableSchema:
    """One variable = one column.

    ``dimensions`` is the reference's dim tuple (``schema/variable.py:26-46``);
    ``immutable`` is stamped by :meth:`DatasetSchema.with_partition_axis`.
    ``fill_value`` round-trips NaN/±Inf through JSON like the reference
    (``schema/variable.py:105-133``).
    """
    name: str
    dtype: str
    dimensions: tuple[str, ...]
    fill_value: Any = None
    attrs: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    immutable: bool = False

    def spark_type(self, dims: Mapping[str, Dimension],
                   axis: str | None) -> T.DataType:
        """Column type: element type wrapped in ArrayType per non-axis dim."""
        base = dtype_to_spark(self.dtype)
        wrap = [d for d in self.dimensions if d != axis]
        for _ in wrap:
            base = T.ArrayType(base)
        return base

    def to_field(self, dims: Mapping[str, Dimension],
                 axis: str | None) -> T.StructField:
        meta = {"dims": list(self.dimensions), "dtype": self.dtype,
                "immutable": self.immutable}
        if self.attrs:
            meta["attrs"] = dict(self.attrs)
        return T.StructField(self.name, self.spark_type(dims, axis),
                             nullable=True, metadata=meta)


def _encode_fill(value: Any) -> Any:
    if isinstance(value, float):
        if math.isnan(value):
            return {"__special__": "nan"}
        if math.isinf(value):
            return {"__special__": "inf" if value > 0 else "-inf"}
    return value


def _decode_fill(value: Any) -> Any:
    if isinstance(value, dict) and "__special__" in value:
        return {"nan": math.nan, "inf": math.inf,
                "-inf": -math.inf}[value["__special__"]]
    return value


@dataclasses.dataclass(frozen=True)
class DatasetSchema:
    """Immutable schema document bound (or not yet) to a partition axis."""
    dimensions: tuple[Dimension, ...]
    variables: tuple[VariableSchema, ...]
    attrs: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    group_attrs: Mapping[str, Mapping[str, Any]] = dataclasses.field(
        default_factory=dict)
    axis: str | None = None

    # -- lookups ----------------------------------------------------------
    @property
    def dim_map(self) -> dict[str, Dimension]:
        return {d.name: d for d in self.dimensions}

    @property
    def variable_map(self) -> dict[str, VariableSchema]:
        return {v.name: v for v in self.variables}

    def find_variable(self, short_name: str) -> VariableSchema | None:
        """Depth-first short-name search (``data/group.py:282-324``):
        matches either the full path or the last path component."""
        for var in self.variables:
            if var.name == short_name or var.name.rsplit("/", 1)[-1] == short_name:
                return var
        return None

    @property
    def partitioned_variables(self) -> tuple[VariableSchema, ...]:
        return tuple(v for v in self.variables if not v.immutable)

    @property
    def immutable_variables(self) -> tuple[VariableSchema, ...]:
        return tuple(v for v in self.variables if v.immutable)

    # -- binding ----------------------------------------------------------
    def with_partition_axis(self, axis: str) -> "DatasetSchema":
        """Bind to an axis; THE core invariant (``schema/dataset.py:238-280``).

        Every variable must either span the axis (partitioned) or have only
        fixed-size dims (immutable).  Any unbounded non-axis dim is rejected.
        """
        dim_map = self.dim_map
        if axis not in dim_map:
            raise SchemaError(f"unknown axis dimension {axis!r}")
        if not dim_map[axis].is_unbounded:
            raise SchemaError(f"axis {axis!r} must be unbounded (size=None)")
        for dim in self.dimensions:
            if dim.name != axis and dim.is_unbounded:
                raise SchemaError(
                    f"dimension {dim.name!r} is unbounded but is not the "
                    f"partition axis {axis!r}")
        rebound = []
        for var in self.variables:
            for dname in var.dimensions:
                if dname not in dim_map:
                    raise SchemaError(
                        f"variable {var.name!r} references unknown dimension "
                        f"{dname!r}")
            immutable = axis not in var.dimensions
            rebound.append(dataclasses.replace(var, immutable=immutable))
        return dataclasses.replace(self, axis=axis,
                                   variables=tuple(rebound))

    def select(self, names: Iterable[str]) -> "DatasetSchema":
        """Schema projection (``schema/dataset.py:151-203``): short names
        match any depth (quirk Q8)."""
        wanted = set(names)
        keep = tuple(
            v for v in self.variables
            if v.name in wanted or v.name.rsplit("/", 1)[-1] in wanted)
        return dataclasses.replace(self, variables=keep)

    # -- Spark ------------------------------------------------------------
    def to_struct_type(self, variables: Iterable[str] | None = None
                       ) -> T.StructType:
        dims = self.dim_map
        schema = self if variables is None else self.select(variables)
        return T.StructType(
            [v.to_field(dims, self.axis) for v in schema.variables])

    # -- serde ------------------------------------------------------------
    def to_json(self) -> dict[str, Any]:
        return {
            "format_version": FORMAT_VERSION,
            "dimensions": [dataclasses.asdict(d) for d in self.dimensions],
            "variables": [
                {"name": v.name, "dtype": v.dtype,
                 "dimensions": list(v.dimensions),
                 "fill_value": _encode_fill(v.fill_value),
                 "attrs": dict(v.attrs), "immutable": v.immutable}
                for v in self.variables],
            "attrs": dict(self.attrs),
            "group_attrs": {k: dict(v) for k, v in self.group_attrs.items()},
            "axis": self.axis,
        }

    @classmethod
    def from_json(cls, doc: Mapping[str, Any]) -> "DatasetSchema":
        doc = upgrade(dict(doc))
        return cls(
            dimensions=tuple(Dimension(**d) for d in doc["dimensions"]),
            variables=tuple(
                VariableSchema(
                    name=v["name"], dtype=v["dtype"],
                    dimensions=tuple(v["dimensions"]),
                    fill_value=_decode_fill(v.get("fill_value")),
                    attrs=v.get("attrs", {}),
                    immutable=v.get("immutable", False))
                for v in doc["variables"]),
            attrs=doc.get("attrs", {}),
            group_attrs=doc.get("group_attrs", {}),
            axis=doc.get("axis"),
        )

    def dumps(self) -> str:
        return json.dumps(self.to_json(), indent=1, sort_keys=True)


# -- format-version upgraders (schema/versioning.py:19-66) ----------------
_UPGRADERS: dict[int, Callable[[dict], dict]] = {}


def register_upgrader(from_version: int):
    def deco(fn: Callable[[dict], dict]):
        _UPGRADERS[from_version] = fn
        return fn
    return deco


def upgrade(doc: dict) -> dict:
    version = doc.get("format_version", FORMAT_VERSION)
    if version > FORMAT_VERSION:
        raise FormatVersionError(
            f"on-disk format_version {version} is newer than supported "
            f"{FORMAT_VERSION}")
    while version < FORMAT_VERSION:
        if version not in _UPGRADERS:
            raise FormatVersionError(
                f"no upgrader registered for format_version {version}")
        doc = _UPGRADERS[version](doc)
        new_version = doc.get("format_version", version)
        if new_version <= version:
            raise FormatVersionError(
                f"upgrader for {version} did not advance format_version")
        version = new_version
    return doc


class SchemaBuilder:
    """Fluent schema construction (``schema/builder.py:70-226``).

    >>> schema = (SchemaBuilder()
    ...           .add_dimension("num")                  # unbounded
    ...           .add_dimension("x", size=3)
    ...           .add_variable("num", "int64", ("num",))
    ...           .add_variable("value", "float32", ("num", "x"))
    ...           .add_variable("static", "float32", ("x",))
    ...           .build())
    """

    def __init__(self) -> None:
        self._dims: list[Dimension] = []
        self._vars: list[VariableSchema] = []
        self._attrs: dict[str, Any] = {}
        self._group_attrs: dict[str, dict[str, Any]] = {}

    def add_dimension(self, name: str, size: int | None = None,
                      chunks: int | None = None) -> "SchemaBuilder":
        if any(d.name == name for d in self._dims):
            raise SchemaError(f"duplicate dimension {name!r}")
        self._dims.append(Dimension(name, size, chunks))
        return self

    def add_variable(self, name: str, dtype: str,
                     dimensions: tuple[str, ...] | list[str],
                     *, fill_value: Any = None,
                     attrs: Mapping[str, Any] | None = None
                     ) -> "SchemaBuilder":
        if any(v.name == name for v in self._vars):
            raise SchemaError(f"duplicate variable {name!r}")
        dtype_to_spark(dtype)  # validate eagerly
        self._vars.append(VariableSchema(
            name=name, dtype=dtype, dimensions=tuple(dimensions),
            fill_value=fill_value, attrs=dict(attrs or {})))
        return self

    def add_group(self, path: str,
                  attrs: Mapping[str, Any] | None = None) -> "SchemaBuilder":
        """Declare a nested group (metadata only; variables under it use
        path-mangled names like ``data_01/ku/power``)."""
        self._group_attrs[path] = dict(attrs or {})
        return self

    def set_attrs(self, **attrs: Any) -> "SchemaBuilder":
        self._attrs.update(attrs)
        return self

    def build(self, axis: str | None = None) -> DatasetSchema:
        schema = DatasetSchema(
            dimensions=tuple(self._dims), variables=tuple(self._vars),
            attrs=dict(self._attrs), group_attrs=dict(self._group_attrs))
        return schema.with_partition_axis(axis) if axis else schema


def infer_schema(struct: T.StructType, axis: str,
                 extra_dims: Mapping[str, int] | None = None) -> DatasetSchema:
    """Infer a DatasetSchema from a Spark StructType (the analog of
    ``Dataset.from_xarray``, ``data/dataset.py:247-300``).

    Scalar columns get dims ``(axis,)``; ArrayType columns get
    ``(axis, <name>_dim)`` with the fixed size taken from ``extra_dims`` if
    given (else unknown sizes are recorded as sized 0 = "fixed, unchecked").
    """
    builder = SchemaBuilder().add_dimension(axis)
    extra_dims = dict(extra_dims or {})
    for field in struct.fields:
        ftype = field.dataType
        if isinstance(ftype, T.ArrayType):
            dim_name = f"{field.name}_dim"
            size = extra_dims.get(dim_name, 0)
            builder.add_dimension(dim_name, size=size)
            elem = ftype.elementType.simpleString()
            builder.add_variable(field.name, _SPARK_TO_DTYPE.get(elem, elem),
                                 (axis, dim_name))
        else:
            simple = ftype.simpleString()
            builder.add_variable(field.name,
                                 _SPARK_TO_DTYPE.get(simple, simple), (axis,))
    return builder.build(axis)


def nest_struct_columns(df):
    """Regroup path-mangled group columns into real ``StructType``
    nesting (the struct view of the reference's group tree,
    ``data/group.py:218-280``): a frame with columns ``time``,
    ``data_01/ku/power``, ``data_01/ku/swh`` becomes ``time``,
    ``data_01: struct<ku: struct<power, swh>>`` — so
    ``df.select("data_01.ku.power")`` works as the reference's
    attribute-path access does, and Catalyst's nested-schema pruning
    (``spark.sql.optimizer.nestedSchemaPruning.enabled``, on by
    default) keeps column pruning effective through the structs.

    Pure projection: one ``select``, no shuffle, order-preserving.
    Top-level column order is preserved (a group appears at the
    position of its first member).  A name that is both a leaf and a
    group prefix (``a`` and ``a/b``) cannot nest — loud
    :class:`SchemaError`.
    """
    from pyspark.sql import functions as F

    tree: dict = {}
    order: list[str] = []
    for name in df.columns:
        parts = name.split("/")
        node = tree
        for depth, part in enumerate(parts):
            leaf = depth == len(parts) - 1
            if depth == 0 and part not in node:
                order.append(part)
            if leaf:
                if part in node:
                    raise SchemaError(
                        f"cannot nest {name!r}: {'/'.join(parts[:depth + 1])!r}"
                        f" is both a variable and a group")
                node[part] = name
            else:
                nxt = node.setdefault(part, {})
                if not isinstance(nxt, dict):
                    raise SchemaError(
                        f"cannot nest {name!r}: "
                        f"{'/'.join(parts[:depth + 1])!r}"
                        f" is both a variable and a group")
                node = nxt

    def build(node: dict):
        return F.struct(*(
            (build(sub) if isinstance(sub, dict) else F.col(f"`{sub}`"))
            .alias(key) for key, sub in node.items()))

    return df.select(*(
        (build(tree[top]) if isinstance(tree[top], dict)
         else F.col(f"`{tree[top]}`")).alias(top) for top in order))
