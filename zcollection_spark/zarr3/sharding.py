"""Auto-shard policy for Zarr v3 sharded arrays.

Parity with the reference's shard-size targeting
(``/root/reference/zcollection/codecs/sharding.py:32-159``): a shard is
the store-write unit holding many inner chunks; its shape is, per
dimension, the inner-chunk extent times a power of two, grown by
repeatedly doubling the dimension with the largest current extent until
the next doubling would blow the byte budget.  Sharding is skipped
(``None``) when disabled or when the geometry cannot grow past the
inner chunk (no PUT-count win).
"""

from __future__ import annotations

import math

import numpy as np


def _clip(extent: int, dim: int | None) -> int:
    return extent if dim is None else min(extent, dim)


def _cap(chunk: int, dim: int | None) -> int:
    """Largest power-of-two multiplier before the shard dim would cover
    the whole (finite) array dimension."""
    if dim is None:
        return 1 << 62
    mult = 1
    while chunk * mult * 2 <= max(dim, chunk):
        mult *= 2
    return mult


def compute_shard_shape(inner_chunks: tuple[int, ...],
                        shape: tuple[int | None, ...],
                        dtype: np.dtype,
                        target_shard_bytes: int) -> tuple[int, ...]:
    """Power-of-two-multiple shard shape with raw size <= target
    (``codecs/sharding.py:32-110``)."""
    if len(inner_chunks) != len(shape):
        raise ValueError(f"rank mismatch: chunks {inner_chunks!r} vs "
                         f"shape {shape!r}")
    if not inner_chunks:
        return ()
    itemsize = max(int(np.dtype(dtype).itemsize), 1)
    inner_bytes = itemsize * math.prod(max(c, 1) for c in inner_chunks)
    clipped_chunk = tuple(_clip(c, s) for c, s in zip(inner_chunks, shape))
    if inner_bytes >= target_shard_bytes:
        return clipped_chunk
    caps = [_cap(c, s) for c, s in zip(inner_chunks, shape)]
    mult = [1] * len(inner_chunks)
    total = inner_bytes
    while total * 2 <= target_shard_bytes:
        grow = max((i for i in range(len(mult)) if mult[i] * 2 <= caps[i]),
                   key=lambda i: inner_chunks[i] * mult[i], default=None)
        if grow is None:
            break
        mult[grow] *= 2
        total *= 2
    return tuple(_clip(c * m, s)
                 for c, m, s in zip(inner_chunks, mult, shape))


def shard_decision(inner_chunks: tuple[int, ...],
                   shape: tuple[int | None, ...],
                   dtype: np.dtype,
                   target_shard_bytes: int | None) -> tuple[int, ...] | None:
    """Shard shape, or ``None`` when sharding should be skipped
    (``codecs/sharding.py:113-159``)."""
    if target_shard_bytes is None:
        return None
    proposal = compute_shard_shape(inner_chunks, shape, dtype,
                                   target_shard_bytes)
    clipped = tuple(_clip(c, s) for c, s in zip(inner_chunks, shape))
    return None if proposal == clipped else proposal
