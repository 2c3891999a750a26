"""Introspection + xarray bridge parity for the Dataset surface.

Covers the reference's in-memory Dataset niceties on Spark terms:

- ``dataset_nbytes`` — the reference walks materialized arrays
  (``data/group.py:157-194``); the Spark-native analog is Catalyst's
  size estimate for the plan's output, which is what an engine that
  never materializes eagerly can honestly report.
- ``is_lazy`` — the reference flags dask/zarr-backed variables
  (``data/variable.py:117-126``); here a DataFrame is lazy while it is
  a pure plan and "eager" once pinned to a storage level.
- ``tree_repr`` — the xarray-style human repr
  (``data/dataset.py:205-300``'s display role).
- ``to_xarray`` / ``from_xarray`` — the actual bridge, gated behind an
  import-try (xarray is optional; a clear ImportError otherwise).
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession

from .schema import DatasetSchema


def dataset_nbytes(df: DataFrame) -> int:
    """Catalyst's byte estimate of the plan output (post-pruning, so a
    projected query reports the projected size, not the table's)."""
    return int(df._jdf.queryExecution().optimizedPlan()
               .stats().sizeInBytes())


def is_lazy(df: DataFrame) -> bool:
    """True while ``df`` is a pure plan; False once the user pinned it
    to a cache/persist storage level (the eager-materialization analog
    of the reference's numpy-backed variables)."""
    level = df.storageLevel
    return not (level.useMemory or level.useDisk)


def tree_repr(schema: DatasetSchema, *, name: str = "Dataset",
              n_partitions: int | None = None) -> str:
    """xarray-style tree repr of a dataset schema."""
    dims = ", ".join(
        f"{d.name}: {'unbounded' if d.size is None else d.size}"
        for d in schema.dimensions)
    lines = [f"<zcollection_spark.{name}>", f"  Dimensions: ({dims})"]
    if n_partitions is not None:
        lines.append(f"  Partitions: {n_partitions}")
    lines.append("  Variables:")
    width = max((len(v.name) for v in schema.variables), default=0)
    for v in schema.variables:
        tags = "  [immutable]" if v.immutable else ""
        lines.append(f"    {v.name:<{width}}  {v.dtype:<12} "
                     f"({', '.join(v.dimensions)}){tags}")
    if schema.attrs:
        lines.append(f"  Attributes: {dict(schema.attrs)}")
    return "\n".join(lines)


def arrays_to_xarray(arrays: dict[str, Any], schema: DatasetSchema):
    """``{variable: numpy array}`` (the ``query_arrays`` result shape)
    → ``xarray.Dataset`` with the schema's dimension names."""
    try:
        import xarray as xr
    except ImportError:  # pragma: no cover - xarray not in this env
        raise ImportError(
            "to_xarray requires the optional xarray dependency "
            "(pip install xarray)") from None
    var_map = schema.variable_map
    data_vars = {}
    for name, arr in arrays.items():
        var = var_map.get(name)
        dims = tuple(var.dimensions) if var is not None \
            else tuple(f"dim_{i}" for i in range(getattr(arr, "ndim", 1)))
        data_vars[name] = (dims[:getattr(arr, "ndim", 1)], arr,
                           dict(var.attrs) if var is not None else {})
    return xr.Dataset(data_vars, attrs=dict(schema.attrs))


def from_xarray(spark: SparkSession, ds: Any, *, axis: str
                ) -> tuple[DataFrame, DatasetSchema]:
    """``xarray.Dataset`` → (DataFrame, axis-bound schema): 1-D
    variables along the axis become scalar columns, fixed trailing dims
    become array columns — the inverse of :func:`arrays_to_xarray`."""
    import pandas as pd

    from .schema import SchemaBuilder
    builder = SchemaBuilder()
    for dim, size in ds.sizes.items():
        builder.add_dimension(str(dim),
                              size=None if dim == axis else int(size))
    cols: dict[str, Any] = {}
    for name, var in ds.data_vars.items():
        dims = tuple(str(d) for d in var.dims)
        if not dims:
            # a 0-d variable has no columnar shape; carry it as a
            # dataset attribute instead of a schema variable (a schema
            # variable without a column would break to_struct_type)
            builder.set_attrs(**{str(name): var.values.item()})
            continue
        builder.add_variable(str(name), str(var.dtype), dims,
                             attrs=dict(var.attrs))
        values = var.values
        if dims[0] != axis:
            cols[str(name)] = [values.tolist()] * int(ds.sizes[axis])
        elif values.ndim == 1:
            cols[str(name)] = values
        else:
            cols[str(name)] = [row.tolist() for row in values]
    schema = builder.build(axis)
    pdf = pd.DataFrame(cols)
    return (spark.createDataFrame(pdf, schema=schema.to_struct_type()),
            schema)
