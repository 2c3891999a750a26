"""Minimal pure-Python Zarr v3 storage core + Spark datasource.

The reference stores each partition as a Zarr v3 group
(``/root/reference/README.rst:21-54``, ``io/partition.py:145-169``).  The
container has no ``zarr-python``, so this package implements the subset of
the Zarr v3 spec the engine needs from scratch (public spec:
https://zarr-specs.readthedocs.io/en/latest/v3/core/index.html):

- array/group ``zarr.json`` metadata documents,
- the regular chunk grid with default (``c/…``) chunk-key encoding,
- the ``bytes`` (endian) codec followed by ``zstd`` (via pyarrow) or
  ``gzip`` (stdlib) compression,
- edge-chunk padding with the fill value.

Numeric, boolean and datetime64 (as int64 + attribute) dtypes are
supported; variable-length strings are out of scope for this layer (the
parquet layout remains the engine's default for string-heavy tables).
"""

from .core import (ZarrArrayMeta, read_array, read_group_meta, write_array,
                   write_group)
from .datasource import ZarrDataSource, register

__all__ = ["ZarrArrayMeta", "read_array", "write_array", "write_group",
           "read_group_meta", "ZarrDataSource", "register"]
