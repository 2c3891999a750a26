"""Atomic multi-partition write protocol: stage → intent → publish.

Re-expresses the observable behavior of the reference's transactional
store session (``/root/reference/zcollection/store/icechunk_store.py:158-168``,
test ``tests/test_icechunk.py:64``: a failed insert rolls back completely)
on plain filesystems / object stores, where the only primitives are
atomic single-file PUT and directory rename:

1. **Stage** — the Spark job writes its whole output under
   ``{root}/_staging/{id}/`` (hidden prefix: invisible to partition
   walks, catalog readers, and Spark partition discovery).  A job that
   dies here leaves nothing outside staging.
2. **Intent** — after the job succeeds, one small
   ``_staging/{id}/_publish.json`` records mode + relpaths.  This is the
   redo log: staged data is complete from this point on.
3. **Publish** — per-partition renames move staged dirs/files into final
   paths; ``swap`` replaces whole partition dirs (old content parked
   inside the staging dir until cleanup), ``append`` moves files under
   ``{id}-``-prefixed names.  Every step is idempotent, so a crash
   anywhere in publish is ROLLED FORWARD by :func:`recover`.
4. **Commit** — catalog add, then the staging dir is deleted (which also
   garbage-collects swapped-out old partition content).

:func:`recover` (called by ``repair_catalog`` / ``verify --repair``)
rolls staged-with-intent inserts forward and QUARANTINES intent-less
ones under ``{root}/_quarantine/{id}`` — uncommitted partial output is
never resurrected into query results by a store walk.  Like the
reference's repair, recovery must not run concurrently with writers.

Reader-visible windows (inherent to rename-based emulation; the
reference's transactional store has neither — gate concurrent readers
on the catalog generation if they matter):

1. In ``swap`` mode there is a moment per partition, between
   ``rename(dst, old)`` and ``rename(src, dst)``, where a concurrent
   reader sees that partition ABSENT.  A crash inside the window leaves
   it absent until :func:`recover` rolls it forward (exercised by
   tests/test_staging_recovery.py).
2. A multi-partition publish is per-partition renames, not one atomic
   swap: a concurrent reader can observe a torn old/new MIX of
   partitions mid-publish.  Single-snapshot readers should resolve the
   partition list once (the catalog read) and pin it.

Object stores: "rename" is copy+delete per object, so per-partition
renames are neither atomic nor cheap there.  The renames are issued
from a driver-side thread pool (bounded metadata ops — fine up to
thousands of partitions on rename-cheap filesystems), but the right
commit primitive on S3-class stores is a MANIFEST SWAP: publish by
atomically PUTting a new catalog/manifest generation that points at the
staged object keys, never moving data.  ``fs.supports_atomic_rename``
is the capability switch (see fs.py); the manifest-swap path is the
documented design for such stores, with the catalog PUT (already a
single atomic object) as the commit point.
"""

from __future__ import annotations

import json
import uuid
from concurrent.futures import ThreadPoolExecutor

#: Driver-side parallelism for publish/metadata renames.  Renames are
#: tiny metadata ops; the pool bounds round-trip latency, not CPU.
PUBLISH_POOL = 16

STAGING_RELPATH = "_staging"
QUARANTINE_RELPATH = "_quarantine"
INTENT_NAME = "_publish.json"
OLD_RELPATH = "_old"


def new_staging_dir(fs, root: str) -> tuple[str, str]:
    """Allocate a unique staging directory; returns (id, absolute dir)."""
    staging_id = uuid.uuid4().hex
    staging = f"{root}/{STAGING_RELPATH}/{staging_id}"
    fs.mkdirs(staging)
    return staging_id, staging


def write_intent(fs, staging: str, *, mode: str,
                 relpaths: list[str]) -> dict:
    """Persist the publish intent (the commit point of the write)."""
    assert mode in ("swap", "append"), mode
    intent = {"format_version": 1, "mode": mode,
              "relpaths": sorted(relpaths)}
    fs.write_text(f"{staging}/{INTENT_NAME}", json.dumps(intent, indent=1))
    return intent


def _parent(path: str) -> str:
    return path.rsplit("/", 1)[0]


def _publish_one(fs, root: str, staging_id: str, staging: str,
                 mode: str, rel: str) -> None:
    """Publish a single partition (idempotent; safe to re-run)."""
    src = f"{staging}/{rel}"
    dst = f"{root}/{rel}"
    if mode == "swap":
        if not fs.exists(src):
            return  # already published by an earlier attempt
        if fs.exists(dst):
            old = f"{staging}/{OLD_RELPATH}/{rel}"
            fs.mkdirs(_parent(old))
            fs.rename(dst, old)
        fs.mkdirs(_parent(dst))
        fs.rename(src, dst)
    else:  # append: file-level moves under collision-free names
        if not fs.exists(src):
            return
        fs.mkdirs(dst)
        for fname in fs.list_files(src):
            if fname.startswith(("_", ".")):
                continue
            target = f"{dst}/{staging_id}-{fname}"
            if not fs.exists(target):
                fs.rename(f"{src}/{fname}", target)


def apply_publish(fs, root: str, staging_id: str, staging: str,
                  intent: dict, catalog=None) -> list[str]:
    """Move staged partitions into final paths; idempotent (roll-forward
    safe), then commit to the catalog and drop the staging dir.

    Partitions are independent, so the per-partition renames run on a
    driver-side thread pool — publish wall-time is ~ceil(n/POOL) FS
    round-trips rather than n (the sequential loop was the commit-path
    bottleneck at large partition counts).  A failure in any partition
    aborts the publish mid-flight; the survivors stay idempotent and
    :func:`recover` rolls the remainder forward.
    """
    mode = intent["mode"]
    relpaths = list(intent["relpaths"])
    if len(relpaths) <= 1:
        for rel in relpaths:
            _publish_one(fs, root, staging_id, staging, mode, rel)
    else:
        with ThreadPoolExecutor(
                max_workers=min(PUBLISH_POOL, len(relpaths))) as pool:
            # list() forces iteration: the first failure raises here
            list(pool.map(
                lambda rel: _publish_one(fs, root, staging_id, staging,
                                         mode, rel),
                relpaths))
    if catalog is not None:
        catalog.add(relpaths)
    fs.delete(staging)
    return relpaths


def staged_publish(fs, root: str, *, write_fn, depth: int,
                   mode: str, catalog=None) -> list[str]:
    """Run ``write_fn(staging_dir)`` (the Spark job), then publish its
    output atomically.  Returns the published partition relpaths."""
    staging_id, staging = new_staging_dir(fs, root)
    try:
        write_fn(staging)
        relpaths = fs.list_partition_dirs(staging, depth)
    except BaseException:
        # job failed before intent: nothing is visible; leave the debris
        # in staging for recover() to quarantine, but try an eager delete
        try:
            fs.delete(staging)
        except Exception:
            pass
        raise
    intent = write_intent(fs, staging, mode=mode, relpaths=relpaths)
    apply_publish(fs, root, staging_id, staging, intent, catalog)
    return sorted(relpaths)


def recover(fs, root: str, catalog=None) -> dict:
    """Roll forward published-but-uncommitted writes; quarantine
    uncommitted staging debris.  Returns ``{"published": [...],
    "quarantined": [...]}`` staging ids."""
    out: dict = {"published": [], "quarantined": []}
    staging_root = f"{root}/{STAGING_RELPATH}"
    if not fs.exists(staging_root):
        return out
    for staging_id in fs.list_dirs(staging_root):
        staging = f"{staging_root}/{staging_id}"
        intent_path = f"{staging}/{INTENT_NAME}"
        intent = None
        if fs.exists(intent_path):
            try:
                intent = json.loads(fs.read_text(intent_path))
            except ValueError:
                intent = None
        if intent is not None:
            apply_publish(fs, root, staging_id, staging, intent, catalog)
            out["published"].append(staging_id)
        else:
            quarantine = f"{root}/{QUARANTINE_RELPATH}"
            fs.mkdirs(quarantine)
            fs.rename(staging, f"{quarantine}/{staging_id}")
            out["quarantined"].append(staging_id)
    return out
