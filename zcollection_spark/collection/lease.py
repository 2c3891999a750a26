"""Advisory exclusive-writer lease over the conditional-write primitive.

The staging protocol already tolerates concurrent writers (per-partition
atomicity, CAS catalog union — tests/test_concurrency.py); this module
is the OPT-IN mutual exclusion for pipelines that want exactly one
producer per collection: a TTL'd lease document at
``{root}/_catalog/writer.lease`` acquired with a create-only conditional
write, taken over with a token-conditional replace when expired, and
renewed by heartbeat.  Every transition is a single ``write_if`` — the
same compare-and-swap that makes catalog commits safe (native
``If-Match`` PUT on S3, lock-file CAS elsewhere), so two writers racing
an expired lease cannot both win.

Advisory means: only writers that USE the lease are excluded.  The
engine does not check it on ``insert`` — cooperating pipelines wrap
their write sections in ``Collection.exclusive_writer()``.

No reference counterpart (the reference is a single-process library; its
store sessions assume one writer by construction).
"""

from __future__ import annotations

import json
import os
import socket
import time
import uuid

from ..errors import CommitConflictError, LeaseHeldError

LEASE_RELPATH = "_catalog/writer.lease"


class WriterLease:
    """Handle for one acquired lease; use via
    ``Collection.exclusive_writer`` (context manager) or manually:
    ``acquire() → renew()* → release()``."""

    def __init__(self, fs, root: str, *, ttl: float = 60.0,
                 owner: str | None = None):
        self._fs = fs
        self._path = f"{root.rstrip('/')}/{LEASE_RELPATH}"
        self.ttl = float(ttl)
        self.owner = owner or f"{socket.gethostname()}:{os.getpid()}:" \
                              f"{uuid.uuid4().hex[:8]}"
        self._token = None  # version token of OUR lease document

    def _doc(self) -> str:
        return json.dumps({"owner": self.owner,
                           "expires": time.time() + self.ttl,
                           "ttl": self.ttl}, indent=1)

    def acquire(self) -> "WriterLease":
        """Create-only acquire; expired leases are taken over with a
        token-conditional replace (exactly one of N racers wins).  The
        held token comes from ``write_if``'s return value — atomic with
        the write, so a racing takeover can never hand us the usurper's
        token."""
        try:
            self._token = self._fs.write_if(self._path, self._doc(),
                                            None)
            return self
        except CommitConflictError:
            pass
        text, token = self._fs.read_versioned(self._path)
        if text is None:
            # deleted between our attempts: retry the create
            return self.acquire()
        try:
            held = json.loads(text)
        except ValueError:
            held = {"owner": "<corrupt>", "expires": 0.0}
        if float(held.get("expires", 0.0)) > time.time():
            raise LeaseHeldError(
                f"writer lease on {self._path} held by "
                f"{held.get('owner')!r} for another "
                f"{float(held['expires']) - time.time():.0f}s") \
                from None
        try:
            self._token = self._fs.write_if(self._path, self._doc(),
                                            token)
        except CommitConflictError:
            raise LeaseHeldError(
                f"lost the takeover race for {self._path}") from None
        return self

    def renew(self) -> None:
        """Heartbeat: push the expiry forward.  Raises
        :class:`LeaseHeldError` if the lease was taken over (our token
        is stale) — the holder must stop writing."""
        if self._token is None:
            raise LeaseHeldError("renew() without an acquired lease")
        try:
            self._token = self._fs.write_if(self._path, self._doc(),
                                            self._token)
        except CommitConflictError:
            self._token = None
            raise LeaseHeldError(
                f"lease on {self._path} was taken over — writer must "
                f"stop") from None

    def release(self) -> None:
        """Release by CAS-EXPIRING our lease document (a tombstone with
        ``expires=0``), never by delete: a read-then-delete could
        remove a usurper's live lease when our own expired mid-release
        (TOCTOU).  The conditional write on OUR token either expires
        our generation atomically or fails silently because someone
        already took over — exactly the wanted semantics.  The next
        acquirer takes the tombstone over through the normal expired
        path."""
        if self._token is None:
            return
        tomb = json.dumps({"owner": self.owner, "expires": 0.0,
                           "released": True}, indent=1)
        try:
            self._fs.write_if(self._path, tomb, self._token)
        except CommitConflictError:
            pass  # taken over already: nothing of ours left to release
        self._token = None

    def __enter__(self) -> "WriterLease":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()
