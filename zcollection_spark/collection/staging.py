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
"""

from __future__ import annotations

import json
import uuid

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


def apply_publish(fs, root: str, staging_id: str, staging: str,
                  intent: dict, catalog=None) -> list[str]:
    """Move staged partitions into final paths; idempotent (roll-forward
    safe), then commit to the catalog and drop the staging dir."""
    mode = intent["mode"]
    relpaths = list(intent["relpaths"])
    for rel in relpaths:
        src = f"{staging}/{rel}"
        dst = f"{root}/{rel}"
        if mode == "swap":
            if not fs.exists(src):
                continue  # already published by an earlier attempt
            if fs.exists(dst):
                old = f"{staging}/{OLD_RELPATH}/{rel}"
                fs.mkdirs(_parent(old))
                fs.rename(dst, old)
            fs.mkdirs(_parent(dst))
            fs.rename(src, dst)
        else:  # append: file-level moves under collision-free names
            if not fs.exists(src):
                continue
            fs.mkdirs(dst)
            for fname in fs.list_files(src):
                if fname.startswith(("_", ".")):
                    continue
                target = f"{dst}/{staging_id}-{fname}"
                if not fs.exists(target):
                    fs.rename(f"{src}/{fname}", target)
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
