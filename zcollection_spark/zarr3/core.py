"""Zarr v3 array/group read-write against a directory store.

Chunk layout and metadata follow the v3 core spec; compression parity with
the reference's codec profiles (zstd level 3/9 — ``codecs/defaults.py``).
Edge chunks are stored padded to the full chunk shape and sliced on read,
as the spec requires.
"""

from __future__ import annotations

import dataclasses
import gzip
import json
import math
from pathlib import Path
from typing import Any, Mapping

import numpy as np

ZARR_FORMAT = 3

_CORE_DTYPES = {
    "bool": "bool",
    "int8": "int8", "int16": "int16", "int32": "int32", "int64": "int64",
    "uint8": "uint8", "uint16": "uint16", "uint32": "uint32",
    "uint64": "uint64",
    "float16": "float16", "float32": "float32", "float64": "float64",
}


def _zstd():
    import pyarrow as pa
    return pa.Codec("zstd")


def _compress(payload: bytes, codec: str, level: int) -> bytes:
    if codec == "zstd":
        import pyarrow as pa
        return pa.Codec("zstd", compression_level=level)\
            .compress(payload, asbytes=True)
    if codec == "gzip":
        return gzip.compress(payload, compresslevel=level)
    raise ValueError(f"unsupported codec {codec!r}")


def _decompress(payload: bytes, codec: str, nbytes: int) -> bytes:
    if codec == "zstd":
        return _zstd().decompress(payload, decompressed_size=nbytes,
                                  asbytes=True)
    if codec == "gzip":
        return gzip.decompress(payload)
    raise ValueError(f"unsupported codec {codec!r}")


def _encode_fill(value: Any, dtype: np.dtype) -> Any:
    if value is None:
        return 0 if dtype.kind in "iub" else "NaN" \
            if dtype.kind == "f" else 0
    if isinstance(value, float) and math.isnan(value):
        return "NaN"
    return value


def _decode_fill(value: Any, dtype: np.dtype) -> Any:
    if value == "NaN":
        return math.nan
    if value in ("Infinity", "+Infinity"):
        return math.inf
    if value == "-Infinity":
        return -math.inf
    return value


@dataclasses.dataclass(frozen=True)
class ZarrArrayMeta:
    shape: tuple[int, ...]
    dtype: str                       # numpy dtype string (may be datetime64)
    chunk_shape: tuple[int, ...]
    fill_value: Any
    codec: str                       # zstd | gzip
    level: int
    attributes: Mapping[str, Any]

    @property
    def storage_dtype(self) -> np.dtype:
        """datetime64 is stored as int64 (v3 core has no datetime type)."""
        base = np.dtype(self.dtype)
        return np.dtype("int64") if base.kind == "M" else base

    def to_document(self) -> dict:
        attrs = dict(self.attributes)
        if np.dtype(self.dtype).kind == "M":
            attrs["__zcs_dtype__"] = self.dtype
        return {
            "zarr_format": ZARR_FORMAT,
            "node_type": "array",
            "shape": list(self.shape),
            "data_type": _CORE_DTYPES[self.storage_dtype.name],
            "chunk_grid": {"name": "regular",
                           "configuration":
                               {"chunk_shape": list(self.chunk_shape)}},
            "chunk_key_encoding": {"name": "default",
                                   "configuration": {"separator": "/"}},
            "fill_value": _encode_fill(self.fill_value, self.storage_dtype),
            "codecs": [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": self.codec,
                 "configuration": ({"level": self.level, "checksum": False}
                                   if self.codec == "zstd"
                                   else {"level": self.level})},
            ],
            "attributes": attrs,
        }

    @classmethod
    def from_document(cls, doc: Mapping[str, Any]) -> "ZarrArrayMeta":
        if doc.get("zarr_format") != ZARR_FORMAT \
                or doc.get("node_type") != "array":
            raise ValueError("not a Zarr v3 array document")
        attrs = dict(doc.get("attributes", {}))
        dtype = attrs.pop("__zcs_dtype__", doc["data_type"])
        codecs = doc.get("codecs", [])
        codec, level = "zstd", 3
        for entry in codecs:
            if entry.get("name") in ("zstd", "gzip"):
                codec = entry["name"]
                level = entry.get("configuration", {}).get("level", 3)
        chunk_shape = tuple(
            doc["chunk_grid"]["configuration"]["chunk_shape"])
        return cls(shape=tuple(doc["shape"]), dtype=dtype,
                   chunk_shape=chunk_shape,
                   fill_value=_decode_fill(doc.get("fill_value"),
                                           np.dtype(doc["data_type"])),
                   codec=codec, level=level, attributes=attrs)


def _chunk_count(shape: tuple[int, ...],
                 chunk_shape: tuple[int, ...]) -> tuple[int, ...]:
    return tuple(max(-(-s // c), 1) for s, c in zip(shape, chunk_shape))


def write_array(path: str | Path, data: np.ndarray, *,
                chunk_shape: tuple[int, ...] | None = None,
                fill_value: Any = None, codec: str = "zstd",
                level: int = 3,
                attributes: Mapping[str, Any] | None = None) -> None:
    """Write one Zarr v3 array directory (zarr.json + c/... chunks)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    src_dtype = data.dtype
    if src_dtype.kind == "M":
        # normalize to microseconds, store as int64
        data = data.astype("datetime64[us]").astype("int64")
        dtype_name = "datetime64[us]"
    else:
        dtype_name = src_dtype.name
    if data.dtype.name not in _CORE_DTYPES:
        raise ValueError(f"unsupported zarr dtype {data.dtype}")
    if chunk_shape is None:
        first = min(data.shape[0], 1 << 16) if data.ndim else 1
        chunk_shape = (first, *data.shape[1:]) if data.ndim else ()
    meta = ZarrArrayMeta(shape=tuple(data.shape), dtype=dtype_name,
                         chunk_shape=tuple(chunk_shape),
                         fill_value=fill_value, codec=codec, level=level,
                         attributes=dict(attributes or {}))
    (path / "zarr.json").write_text(
        json.dumps(meta.to_document(), indent=1))
    fill = meta.fill_value if meta.fill_value is not None else 0
    counts = _chunk_count(meta.shape, meta.chunk_shape)
    for idx in np.ndindex(*counts):
        slices = tuple(slice(i * c, min((i + 1) * c, s))
                       for i, c, s in zip(idx, meta.chunk_shape,
                                          meta.shape))
        block = data[slices]
        if block.shape != meta.chunk_shape:  # edge chunk → pad with fill
            padded = np.full(meta.chunk_shape, fill,
                             dtype=meta.storage_dtype)
            padded[tuple(slice(0, s) for s in block.shape)] = block
            block = padded
        payload = np.ascontiguousarray(block).astype(
            meta.storage_dtype.newbyteorder("<"), copy=False).tobytes()
        chunk_path = path / "c" / "/".join(map(str, idx))
        chunk_path.parent.mkdir(parents=True, exist_ok=True)
        chunk_path.write_bytes(_compress(payload, codec, level))


def read_array(path: str | Path) -> np.ndarray:
    """Read one Zarr v3 array directory into a numpy array."""
    path = Path(path)
    meta = ZarrArrayMeta.from_document(
        json.loads((path / "zarr.json").read_text()))
    storage = meta.storage_dtype
    fill = meta.fill_value if meta.fill_value is not None else 0
    out = np.full(meta.shape, fill, dtype=storage)
    counts = _chunk_count(meta.shape, meta.chunk_shape)
    chunk_nbytes = int(np.prod(meta.chunk_shape)) * storage.itemsize
    for idx in np.ndindex(*counts):
        chunk_path = path / "c" / "/".join(map(str, idx))
        if not chunk_path.exists():
            continue  # missing chunk = fill value (spec)
        raw = _decompress(chunk_path.read_bytes(), meta.codec, chunk_nbytes)
        block = np.frombuffer(raw, dtype=storage.newbyteorder("<")) \
            .reshape(meta.chunk_shape).astype(storage, copy=False)
        slices = tuple(slice(i * c, min((i + 1) * c, s))
                       for i, c, s in zip(idx, meta.chunk_shape,
                                          meta.shape))
        trimmed = block[tuple(slice(0, sl.stop - sl.start)
                              for sl in slices)]
        out[slices] = trimmed
    if np.dtype(meta.dtype).kind == "M":
        return out.view(meta.dtype)
    return out


def write_group(path: str | Path,
                attributes: Mapping[str, Any] | None = None) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "zarr.json").write_text(json.dumps({
        "zarr_format": ZARR_FORMAT, "node_type": "group",
        "attributes": dict(attributes or {})}, indent=1))


def read_group_meta(path: str | Path) -> dict:
    doc = json.loads((Path(path) / "zarr.json").read_text())
    if doc.get("node_type") != "group":
        raise ValueError(f"{path} is not a Zarr v3 group")
    return doc
