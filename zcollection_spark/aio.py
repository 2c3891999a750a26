"""Async facade — API parity with ``/root/reference/zcollection/aio.py:23-58``.

The reference is async-first with a sync facade; Spark drivers are
synchronous, so the relationship inverts: these coroutines run the sync API
on a worker thread (``asyncio.to_thread``), letting async applications
(services, notebooks with running loops) await collection operations
without blocking their event loop.  Spark job execution itself is already
fully parallel — this only unblocks the *driver* thread.
"""

from __future__ import annotations

import asyncio
from typing import Any

from pyspark.sql import SparkSession

from .collection import Collection, create_collection as _create, \
    open_collection as _open


async def create_collection(spark: SparkSession, path: str,
                            **kwargs: Any) -> Collection:
    return await asyncio.to_thread(_create, spark, path, **kwargs)


async def open_collection(spark: SparkSession, path: str,
                          **kwargs: Any) -> Collection:
    return await asyncio.to_thread(_open, spark, path, **kwargs)


async def insert(collection: Collection, df, **kwargs: Any) -> list[str]:
    return await asyncio.to_thread(collection.insert, df, **kwargs)


async def query(collection: Collection, **kwargs: Any):
    return await asyncio.to_thread(lambda: collection.query(**kwargs))


async def drop_partitions(collection: Collection,
                          **kwargs: Any) -> list[str]:
    return await asyncio.to_thread(
        lambda: collection.drop_partitions(**kwargs))


async def map(collection: Collection, fn, schema, **kwargs: Any):
    return await asyncio.to_thread(
        lambda: collection.map(fn, schema, **kwargs))


async def update(collection: Collection, fn, **kwargs: Any) -> list[str]:
    return await asyncio.to_thread(lambda: collection.update(fn, **kwargs))


async def compact(collection: Collection, **kwargs: Any) -> dict:
    return await asyncio.to_thread(lambda: collection.compact(**kwargs))
