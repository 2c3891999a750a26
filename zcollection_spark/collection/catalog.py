"""O(1) partition catalog: ``_catalog/state.json``.

Re-expresses ``/root/reference/zcollection/partitioning/catalog.py:72-167``:
a JSON document holding the complete sorted partition relpath list plus a
sha256 checksum.  A corrupted or checksum-mismatched document is treated as
missing (the reference's intent behind its broken ``except A, B:`` at
``catalog.py:98`` — SURVEY quirk Q1), falling back to a store walk.

At 100 TB scale this is the difference between one small GET and a recursive
object-store LIST over thousands of prefixes on every read.  The write is a
single atomic PUT (tmp+rename locally), so readers see either the old or the
new complete list — the commit point of the insert protocol.
"""

from __future__ import annotations

import hashlib
import json
import threading
import warnings
from collections import defaultdict

from ..errors import CommitConflictError, StoreError

CATALOG_RELPATH = "_catalog/state.json"

#: content-addressed sidecar bloom payloads (see
#: ``stats.BLOOM_INLINE_MAX_BITS`` for the inline/sidecar cut-over and
#: its 100-TB cost model)
BLOOMS_RELDIR = "_catalog/blooms"

#: pinned-generation ledger (``{"pins": [gen, ...]}``) — generations a
#: user wants readable FOREVER, surviving republish (copy-on-republish
#: retention) and ``prune_history``
PINS_RELPATH = "_catalog/pins.json"

#: copy-on-republish retained partition content, laid out as
#: ``_catalog/retained/gen-<touched-stamp>/<relpath>/...`` — keyed by
#: the generation that PRODUCED the content, so one copy serves every
#: pin in ``[stamp, next-touch)``
RETAINED_RELDIR = "_catalog/retained"

#: completion marker inside a retained partition dir (hidden name:
#: partition scans skip ``_``-prefixed files, and its presence is the
#: validity bit — a crash mid-copy leaves no marker, so the partial
#: copy is retried, never trusted)
RETAINED_MARKER = "_retained.json"

#: retention-copy fan-out: a republish over K pinned partitions × F
#: files issues K·F INDEPENDENT server-side copy calls (CopyObject /
#: rewrite / Copy Blob — tiny requests, bytes never move through the
#: driver), so the cost is round-trip latency, not bandwidth.  A
#: bounded pool turns the pre-intent stall from K·F serialized RTTs
#: into ~K·F/16 — at 1000 files × 50 ms that is 3 s instead of 50 s.
#: Bounded (not unbounded) so a huge pin set cannot open thousands of
#: concurrent store connections from one driver.
_RETAIN_COPY_WORKERS = 16

#: CAS commit attempts before giving up.  Each retry re-reads the
#: winner's document, so N contending writers need at most N rounds;
#: 16 covers far beyond any sane concurrent-ingest fan-in.
_CAS_RETRIES = 16

#: per-path locks serializing read-modify-write catalog updates within a
#: process (concurrent driver threads) — they keep same-process writers
#: from ever paying a CAS retry.  CROSS-process writers are handled by
#: the conditional-write commit loop in ``_commit_rmw``: concurrent
#: catalog commits converge to the union of published partitions (the
#: reference races last-wins here and needs a rebuild to reconcile).
_LOCKS: defaultdict[str, threading.Lock] = defaultdict(threading.Lock)


def _checksum(partitions: list[str]) -> str:
    return hashlib.sha256("\n".join(partitions).encode()).hexdigest()


def diff_documents(base_doc: dict, cur_doc: dict,
                   since: int) -> list[tuple]:
    """Partition-level change rows ``(stamp, relpath, change)`` between
    two catalog documents — THE diff semantics, shared by the batch API
    (``Collection.changes``) and the CDC stream (changes_stream.py) so
    the two can never drift apart.  A partition's ``touched`` stamp
    decides 'changed since'; a missing stamp (legacy document) counts
    as touched-now so consumers reprocess rather than skip."""
    to_gen = int(cur_doc.get("generation", 0))
    old = set(base_doc.get("partitions", []))
    new = set(cur_doc.get("partitions", []))
    stamps = cur_doc.get("touched", {})
    rows = []
    for rel in sorted(new):
        stamp = int(stamps.get(rel, to_gen))
        if stamp > since:
            rows.append((stamp, rel, "added"))
    for rel in sorted(old - new):
        rows.append((to_gen, rel, "removed"))
    return rows


def _snapshot_sources(catalog: "Catalog",
                      generation: int) -> tuple[dict, dict, list]:
    """Shared resolution core: ``(snap, sources, stale)``.

    ``sources[rel]`` is ``None`` for a live-directory read, or the
    retained base dir (copy-on-republish — see
    :meth:`Catalog.retain_for_pins`) when the live dir moved on.
    ``stale`` lists partitions reconstructable from NEITHER.  Raises
    only for availability (pruned snapshot / unreadable catalog).
    """
    generation = int(generation)
    snap = catalog.read_at(generation)
    if snap is None:
        raise ValueError(
            f"generation {generation} is not available "
            f"(snapshot pruned or never committed); "
            f"history() lists what is retained")
    current = catalog.read_doc()
    if current is None:
        raise ValueError(
            "cannot verify a time-travel read: the current catalog "
            "is absent or corrupt (run repair_catalog first)")
    cur_gen = int(current.get("generation", 0))
    touched = current.get("touched", {})
    live = set(current.get("partitions", []))
    snap_touched = snap.get("touched", {})
    # candidates first, then BATCH the retained checks per stamp: ONE
    # existence probe of the stamp dir answers the common case (no
    # retained copies at all — unpinned collections, or stamps never
    # diverged) for every candidate at once, where the naive shape
    # paid a marker HEAD per republished partition (thousands of
    # round-trips per time-travel query on an object store).  When the
    # stamp dir DOES exist, per-rel marker HEADs stay — they are exact
    # (no false-stale from hidden-name-skipping partition listings),
    # and their count is bounded by the retained set, not the corpus.
    sources: dict = {}
    stale: list = []
    pending: dict = {}          # stamp -> [rel, ...]
    for rel in snap.get("partitions", []):
        if rel in live and int(touched.get(rel, cur_gen)) <= generation:
            sources[rel] = None                      # live dir is exact
            continue
        stamp = snap_touched.get(rel)
        if stamp is not None:
            pending.setdefault(int(stamp), []).append(rel)
        else:
            stale.append(rel)
    for stamp, rels in sorted(pending.items()):
        root = catalog.retained_root(stamp)
        if not catalog._fs.exists(root):
            stale.extend(rels)
            continue
        for rel in rels:
            if catalog.has_retained(stamp, rel):
                sources[rel] = root
            else:
                stale.append(rel)
    # the batched pass appends in stamp order — sort so stale listings
    # and error messages are deterministic regardless of grouping
    return snap, sources, sorted(stale)


def resolve_snapshot_readable(catalog: "Catalog",
                              generation: int) -> tuple[dict, dict]:
    """The gen-``generation`` document plus per-partition read SOURCES,
    verified exact against the current store state — the soundness gate
    behind time-travel (``at_generation``) reads, shared by the parquet
    and zarr layouts.

    Partition directories are MUTABLE (unlike the immutable data files
    of Delta/Iceberg/icechunk), so an old partition LIST reconstructs
    an old view only while every listed partition is physically
    untouched since that generation — OR a pinned-generation retained
    copy of its gen-``stamp`` content exists (``Catalog.pin`` +
    copy-on-republish, the icechunk-parity contract: a retained
    snapshot stays readable,
    ``/root/reference/zcollection/store/icechunk_store.py:98-282``).
    The per-partition ``touched`` stamps (the same index
    ``diff_documents`` uses) prove exactly that; a missing stamp
    (legacy document) counts as touched-now — conservative refusal,
    never a lie.  Raises ``ValueError`` for a pruned/unknown
    generation, an unverifiable current catalog, or any
    republished/dropped partition with no retained copy
    (``stale_partitions`` lists that subset without raising, for
    consumers that want a partial historical read).
    """
    snap, sources, stale = _snapshot_sources(catalog, generation)
    raise_for_stale(generation, stale)
    return snap, sources


def resolve_matched(catalog: "Catalog", generation: int,
                    matcher) -> tuple[dict, dict, list]:
    """``(snap, sources, matched)`` — the shared resolve-match-raise
    both layouts' ``query()`` and ``partitions()`` use: fetch + verify
    the snapshot once, let ``matcher`` (the layout's filter +
    numeric-sort) pick relpaths from its partition list, and raise only
    when a MATCHED relpath is stale (the filter-lenient partial-read
    contract, in exactly one place)."""
    snap, sources, stale = _snapshot_sources(catalog, generation)
    matched = matcher(list(snap.get("partitions", [])))
    if stale:
        raise_for_stale(generation, sorted(set(matched) & set(stale)))
    return snap, sources, matched


def raise_for_stale(generation: int, stale: list) -> None:
    """Shared staleness raiser — query paths call it on the FILTERED
    partition subset (a key predicate that excludes every stale
    partition makes the partial read the docstrings advertise), the
    strict resolution on the whole snapshot."""
    if stale:
        raise ValueError(
            f"generation {generation} is no longer reconstructable: "
            f"{len(stale)} partition(s) were republished or dropped "
            f"since with no retained copy (e.g. {stale[:3]}); "
            f"partition directories are mutable, so time-travel is "
            f"exact only while every generation-{generation} "
            f"partition is untouched or pin-retained "
            f"(pin_generation before mutating, or see "
            f"stale_partitions for partial reads)")


def stale_partitions(catalog: "Catalog", generation: int) -> list[str]:
    """The subset of gen-``generation`` partitions reconstructable from
    NEITHER the live store nor a retained copy — empty means a
    time-travel read of that generation succeeds in full; non-empty
    lets a consumer plan a partial historical read instead of catching
    the ``resolve_snapshot_readable`` ValueError."""
    return _snapshot_sources(catalog, generation)[2]


def _widen_stats(old: dict, new: dict, bloom_load=None) -> dict:
    """Union two ``{col: [min, max, nulls]}`` maps (append publish).
    A column present on only one side keeps NO entry — its interval is
    unknown for the other side's rows, and a partial interval could
    wrongly prune.

    ``[None, None, 0]`` is the TOP form (stats.py writes it for
    NaN-bearing float columns: no orderable bounds exist) and is
    DISTINCT from ``[None, None, n>0]`` (all-null: provably matches
    nothing).  A TOP side poisons the union to TOP — merging a clean
    interval over it would claim bounds for rows that have none."""
    out = {}
    for col in set(old) & set(new):
        if isinstance(old[col], dict) or isinstance(new[col], dict):
            # bloom entries ("col#bloom"): union = bitwise OR; any
            # geometry mismatch drops the entry (scan, never mis-prune)
            from .stats import merge_bloom_entries
            merged = merge_bloom_entries(old[col], new[col],
                                         load=bloom_load)
            if merged is not None:
                out[col] = merged
            continue
        (alo, ahi, an), (blo, bhi, bn) = old[col][:3], new[col][:3]
        a_top = alo is None and ahi is None and not an
        b_top = blo is None and bhi is None and not bn
        if a_top or b_top:
            out[col] = [None, None, 0]
            continue
        if alo is None or blo is None:
            lo = alo if blo is None else blo if alo is None else None
            hi = ahi if bhi is None else bhi if ahi is None else None
        else:
            try:
                lo, hi = min(alo, blo), max(ahi, bhi)
            except TypeError:
                continue  # incomparable types: drop rather than guess
        out[col] = [lo, hi, int(an or 0) + int(bn or 0)]
    return out


class Catalog:
    def __init__(self, fs, root: str, *, walk_depth: int | None = None):
        self._fs = fs
        self._root = root.rstrip("/")
        self._path = f"{self._root}/{CATALOG_RELPATH}"
        self._walk_depth = walk_depth
        #: refs removed by the most recent sweep_blooms (direct or via
        #: prune_history) — observability for CLI/maintenance callers
        self.last_swept: list[str] = []

    def _baseline(self) -> list[str]:
        """Current catalog, or — if it's absent/corrupt — a store walk.

        Without the walk, an ``add()`` on a corrupt catalog would write a
        valid-but-incomplete document containing only the delta, silently
        hiding every pre-existing partition from catalog readers until a
        manual ``repair_catalog``.
        """
        current = self.read()
        if current is not None:
            return current
        if self._walk_depth is not None:
            return self._fs.list_partition_dirs(self._root, self._walk_depth)
        return []

    def _read_doc(self) -> dict | None:
        """Validated catalog document, or None if absent/corrupt."""
        if not self._fs.exists(self._path):
            return None
        try:
            doc = json.loads(self._fs.read_text(self._path))
            partitions = list(doc["partitions"])
            if doc.get("checksum") != _checksum(partitions):
                return None  # corrupt → treated missing (quirk Q1 intent)
            return doc
        except (ValueError, KeyError, OSError):
            return None

    def _read_doc_versioned(self) -> tuple[dict | None, object | None]:
        """``(doc, version_token)`` in ONE read.  The token names the
        bytes read (S3 ETag / content hash) regardless of whether they
        parse — a corrupt document is replaced conditionally too, so a
        concurrent repair can't be clobbered blind.  ``(None, None)``
        means the file is absent (create-only commit)."""
        try:
            text, token = self._fs.read_versioned(self._path)
        except OSError:
            return None, None
        if text is None:
            return None, None
        try:
            doc = json.loads(text)
            partitions = list(doc["partitions"])
            if doc.get("checksum") != _checksum(partitions):
                doc = None
        except (ValueError, KeyError):
            doc = None
        return doc, token

    def read(self) -> list[str] | None:
        """Sorted partition relpaths, or None if absent/corrupt."""
        doc = self._read_doc()
        return list(doc["partitions"]) if doc is not None else None

    def read_doc(self) -> dict | None:
        """The validated CURRENT document (partitions + generation +
        touched + stats), or None if absent/corrupt — the public read
        for consumers that need more than the partition list
        (time-travel staleness verification)."""
        return self._read_doc()

    def read_stats(self) -> dict:
        """Per-partition zone-map statistics:
        ``{relpath: {col: [min, max, null_count]}}`` — empty when the
        collection records none.  One GET with the partition list."""
        doc = self._read_doc()
        return dict((doc or {}).get("stats", {}))

    def read_txn(self, app_id: str) -> int:
        """Highest committed transaction version for ``app_id`` (-1 if
        none).  The txn map commits in the SAME atomic catalog PUT as
        the partition list — the Delta-style streaming-sink idempotence
        ledger: a replayed micro-batch whose version is already recorded
        was fully committed and must be skipped."""
        doc = self._read_doc()
        if doc is None:
            return -1
        return int(doc.get("txn", {}).get(app_id, -1))

    def write(self, partitions: list[str],
              txn_map: dict | None = None,
              stats_map: dict | None = None) -> None:
        """Write the full document (rebuild/repair: REPLACES the
        partition list).  ``txn_map=None`` PRESERVES the existing txn
        ledger (a catalog rebuild from a store walk must not forget
        committed stream batches); pass ``{}`` to reset.
        ``stats_map=None`` likewise keeps the zone-map statistics of
        every surviving partition.

        Routed through the same CAS loop as ``add``/``remove``
        (ADVICE r5): an unconditional read-then-PUT racing a concurrent
        CAS commit could mint a DUPLICATE generation number — both
        writers read gen N and write N+1 — overwriting the gen-(N+1)
        snapshot with a different document, so ``changes()`` replay
        could diff against the wrong base without any error.  Inside
        ``_commit_rmw`` the rebuild serializes with every other commit
        and generation numbers stay unique (the replacement semantics
        are unchanged: a rebuild's list wins by design)."""

        def mutate(base: list[str], txn_map0: dict, stats_map0: dict,
                   touched: dict, gen: int):
            new_txn = txn_map0 if txn_map is None else dict(txn_map)
            new_stats = (stats_map0 if stats_map is None
                         else dict(stats_map))
            # a full rewrite cannot know which partitions changed:
            # stamp everything with the new generation so incremental
            # consumers conservatively reprocess, never skip
            touched.clear()
            touched.update({rel: gen for rel in partitions})
            return list(partitions), new_txn, new_stats

        # need_base=False: a rebuild REPLACES the list, so the
        # no-catalog-yet baseline walk is wasted round-trips (and a
        # fresh store has nothing to walk)
        self._commit_rmw(mutate, need_base=False)

    @staticmethod
    def _build_doc(partitions: list[str], txn_map: dict,
                   stats_map: dict, generation: int,
                   touched: dict | None = None) -> dict:
        partitions = sorted(set(partitions))
        doc = {"format_version": 1, "generation": int(generation),
               "partitions": partitions,
               "checksum": _checksum(partitions)}
        if txn_map:
            doc["txn"] = {k: int(v) for k, v in sorted(txn_map.items())}
        live = set(partitions)
        stats_map = {rel: st for rel, st in stats_map.items()
                     if rel in live}
        if stats_map:
            doc["stats"] = {rel: stats_map[rel]
                            for rel in sorted(stats_map)}
        # per-partition last-touched generation: the incremental-diff
        # index (Collection.changes) — one int per partition, the same
        # asymptotics as the partition list itself
        touched = {rel: int(g) for rel, g in (touched or {}).items()
                   if rel in live}
        if touched:
            doc["touched"] = {rel: touched[rel]
                              for rel in sorted(touched)}
        return doc

    # -- commit history ------------------------------------------------
    # -- sidecar blooms (content-addressed payloads) -------------------

    def bloom_path(self, ref: str) -> str:
        return f"{self._root}/{BLOOMS_RELDIR}/{ref}"

    def load_bloom(self, ref) -> "str | None":
        """Sidecar b64 payload, or None (degrade to scan) on any
        failure — a missing/corrupt sidecar must never fail a query."""
        try:
            return self._fs.read_text(self.bloom_path(str(ref)))
        except Exception:
            return None

    def store_bloom(self, b64: str) -> str:
        """Write a sidecar payload; returns its content address.
        Idempotent (content-addressed), and ALWAYS re-PUT even when an
        object with the same hash exists: the rewrite refreshes the
        payload's mtime, which is what keeps sweep_blooms' grace
        window honest — a reused-but-not-yet-referenced payload must
        look young to a concurrent sweep, or it would be collected
        before this writer's catalog PUT lands (the PUT is atomic
        tmp+rename / unconditional object write, so concurrent
        identical writes converge)."""
        from .stats import bloom_payload_ref
        ref = bloom_payload_ref(b64)
        self._fs.write_text(self.bloom_path(ref), b64)
        return ref

    def _externalize_blooms(self, stats_map: dict) -> dict:
        """Move every inline bloom bitset past BLOOM_INLINE_MAX_BITS
        into a sidecar object, leaving ``{"m","k","t","ref"}`` in the
        document.  Runs INSIDE the commit loop, before the catalog PUT:
        sidecars are durable first, so a reader never sees a dangling
        ref from this writer; a crash between sidecar write and PUT
        leaves only harmless orphans (``sweep_blooms``)."""
        from .stats import BLOOM_INLINE_MAX_BITS
        out = {}
        for rel, entry in stats_map.items():
            if not isinstance(entry, dict):
                out[rel] = entry
                continue
            new_entry = entry
            for col, val in entry.items():
                if not (isinstance(val, dict) and "b64" in val
                        and int(val.get("m", 0)) > BLOOM_INLINE_MAX_BITS):
                    continue
                if new_entry is entry:
                    new_entry = dict(entry)
                slim = {k: v for k, v in val.items() if k != "b64"}
                slim["ref"] = self.store_bloom(val["b64"])
                new_entry[col] = slim
            out[rel] = new_entry
        return out

    def sweep_blooms(self, grace_seconds: float = 900.0) -> list[str]:
        """Delete sidecar payloads unreachable from the live document
        and every retained snapshot; returns the removed refs and
        records them on ``self.last_swept`` (so callers that sweep
        indirectly — ``prune_history`` — can still report the count).

        RACE SAFETY: ``_externalize_blooms`` writes payloads BEFORE
        the catalog PUT, so a concurrent writer's fresh payload is
        momentarily unreferenced — deleting it would leave the
        writer's committed document with a dangling ref (degraded
        pruning forever).  The sweep therefore skips any candidate
        younger than ``grace_seconds`` (store ``mtime``; an UNKNOWN
        age also skips — conservative), which out-waits any real
        commit window including CAS retries.  ``grace_seconds=0``
        forces immediate collection for offline maintenance when no
        writer can be live."""
        import time
        bloom_dir = f"{self._root}/{BLOOMS_RELDIR}"
        try:
            present = {p.rsplit("/", 1)[-1]
                       for p in self._fs.list_files(bloom_dir)}
        except Exception:
            self.last_swept = []
            return []
        if not present:
            self.last_swept = []
            return []
        docs = [self._read_doc()]
        docs += [self.read_at(g) for g in self.history()]
        live = set()
        for doc in docs:
            for entry in (doc or {}).get("stats", {}).values():
                for val in entry.values() if isinstance(entry, dict) \
                        else ():
                    if isinstance(val, dict) and "ref" in val:
                        live.add(str(val["ref"]))
        probe = getattr(self._fs, "mtime", None)
        cutoff = time.time() - grace_seconds
        removed = []
        for ref in sorted(present - live):
            if grace_seconds > 0:
                try:
                    age = probe(self.bloom_path(ref)) if probe else None
                except Exception:
                    age = None  # probe failure = unknown age
                if age is None or age > cutoff:
                    continue  # possibly in-flight: out-wait it
            try:
                self._fs.delete(self.bloom_path(ref))
                removed.append(ref)
            except Exception:
                pass  # an orphan that survives is still just garbage
        self.last_swept = removed
        return removed

    def _gen_path(self, generation: int) -> str:
        return f"{self._root}/_catalog/gen-{int(generation):012d}.json"

    def _snapshot(self, doc: dict) -> None:
        """Immutable per-generation snapshot, written AFTER the state
        commit (best-effort: a crash in between only costs the newest
        snapshot file, which ``read_at`` serves from state instead).
        One extra small PUT per commit buys an audit trail and
        incremental-consumer diffs (``Collection.changes``)."""
        try:
            self._fs.write_text(self._gen_path(doc["generation"]),
                                json.dumps(doc, indent=1))
        except OSError:
            pass  # the commit itself (state PUT) already succeeded

    def generation(self) -> int:
        """Generation of the current catalog state (0 = no catalog)."""
        doc = self._read_doc()
        return int((doc or {}).get("generation", 0))

    def read_at(self, generation: int) -> dict | None:
        """The committed document of ``generation`` — from its snapshot
        file, or from state when state IS that generation (covers the
        crash window before the snapshot PUT).  None when the snapshot
        has been pruned or never existed."""
        doc = self._read_doc()
        if doc is not None and int(doc.get("generation", 0)) \
                == int(generation):
            return doc
        try:
            snap = json.loads(self._fs.read_text(
                self._gen_path(generation)))
        except (OSError, ValueError, FileNotFoundError):
            return None
        if snap.get("checksum") != _checksum(list(snap["partitions"])):
            return None
        return snap

    def history(self) -> list[int]:
        """Available snapshot generations, ascending (one LIST)."""
        out = []
        for name in self._fs.list_files(f"{self._root}/_catalog"):
            if name.startswith("gen-") and name.endswith(".json"):
                try:
                    out.append(int(name[len("gen-"):-len(".json")]))
                except ValueError:
                    continue
        return sorted(out)

    def prune_history(self, keep_last: int = 16, *,
                      bloom_grace_seconds: float = 900.0) -> list[int]:
        """Delete snapshot files beyond the newest ``keep_last`` (the
        state document is never touched).  Returns pruned generations.
        PINNED generations are exempt — a pin is a promise the
        generation stays readable, so its snapshot (the read's
        partition list) must outlive any retention window.  Superseded
        sidecar blooms and unreferenced retained partition copies are
        swept in the same maintenance op (``bloom_grace_seconds``
        guards in-flight writers; see :meth:`sweep_blooms` — the count
        lands in ``last_swept``)."""
        gens = self.history()
        pinned = set(self.pins())
        doomed = [g for g in (gens[:-keep_last] if keep_last > 0
                              else gens) if g not in pinned]
        for gen in doomed:
            self._fs.delete(self._gen_path(gen))
        if doomed:
            # snapshots were the only thing keeping superseded sidecar
            # blooms reachable — sweep them in the same maintenance op
            self.sweep_blooms(grace_seconds=bloom_grace_seconds)
            self.sweep_retained()
        return doomed

    # -- pinned generations + copy-on-republish retention --------------

    def _pins_path(self) -> str:
        return f"{self._root}/{PINS_RELPATH}"

    def pins(self) -> list[int]:
        """Pinned generations, ascending (one small GET; absent file =
        no pins, the zero-cost default).  ``read_versioned`` rather
        than ``read_text``: its absent-file contract is ``(None,
        None)`` on EVERY backend — JVM-side stores (HadoopFS) surface
        a raw Py4J error from a bare read of a missing path."""
        raw, _ = self._fs.read_versioned(self._pins_path())
        if not raw:
            return []
        try:
            doc = json.loads(raw)
            return sorted(int(g) for g in doc.get("pins", []))
        except (ValueError, TypeError) as exc:
            # the pin ledger is a DURABILITY promise: corrupt must be
            # loud, never "no pins" — a silent [] here would skip
            # copy-on-republish at the only moment the pinned bytes
            # still exist (contrast the catalog state document, whose
            # corrupt-means-missing only degrades to a store walk)
            raise StoreError(
                f"{self._pins_path()}: pin ledger is corrupt "
                f"({exc}); refusing to treat it as empty — restore or "
                f"delete the file explicitly") from exc

    def _mutate_pins(self, fn) -> list[int]:
        """Read-modify-write of the pin ledger — conditional-write loop
        on stores that have one (same discipline as ``_commit_rmw``:
        unpin must never be resurrected by a racing pin's last-wins
        PUT)."""
        path = self._pins_path()
        cas = hasattr(self._fs, "write_if")
        with _LOCKS[path]:
            for attempt in range(_CAS_RETRIES):
                token = None
                if cas:
                    raw, token = self._fs.read_versioned(path)
                else:
                    try:
                        raw = self._fs.read_text(path)
                    except (OSError, FileNotFoundError):
                        raw = None
                try:
                    cur = ([int(g) for g in
                            json.loads(raw).get("pins", [])]
                           if raw else [])
                except (ValueError, AttributeError, TypeError) as exc:
                    # corrupt-means-empty would make this very write
                    # WIPE every existing pin (last-wins PUT of []) —
                    # the one mutation a durability ledger must never
                    # perform silently
                    raise StoreError(
                        f"{path}: pin ledger is corrupt ({exc}); "
                        f"refusing a read-modify-write that would "
                        f"drop existing pins") from exc
                new = sorted({int(g) for g in fn(list(cur))})
                data = json.dumps({"format_version": 1, "pins": new})
                if not cas:
                    self._fs.write_text(path, data)
                    return new
                try:
                    self._fs.write_if(path, data, token)
                    return new
                except CommitConflictError:
                    continue
        raise CommitConflictError(
            f"{path}: pin ledger update lost {_CAS_RETRIES} races")

    def pin(self, generation: int) -> list[int]:
        """Add ``generation`` to the pin ledger; future republishes /
        drops of its partitions copy the old content aside first
        (:meth:`retain_for_pins`), so the generation stays readable.
        Returns the full pin list."""
        return self._mutate_pins(lambda p: p + [int(generation)])

    def unpin(self, generation: int) -> list[int]:
        """Remove a pin.  The caller decides when to reclaim the
        retained copies (:meth:`sweep_retained`)."""
        gen = int(generation)
        return self._mutate_pins(lambda p: [g for g in p if g != gen])

    def retained_root(self, stamp: int) -> str:
        """Base dir of retained gen-``stamp`` partition copies (the
        stamp is the generation that PRODUCED the content — one copy
        serves every pin in ``[stamp, next-touch)``)."""
        return f"{self._root}/{RETAINED_RELDIR}/gen-{int(stamp):012d}"

    def _retained_marker(self, stamp: int, rel: str) -> str:
        return f"{self.retained_root(stamp)}/{rel}/{RETAINED_MARKER}"

    def has_retained(self, stamp: int, rel: str) -> bool:
        """True when a COMPLETE retained copy exists (marker written
        after the last file — a crash mid-copy is retried, not
        trusted)."""
        return self._fs.exists_file(self._retained_marker(stamp, rel))

    def retain_for_pins(self, relpaths: "list[str]") -> list[str]:
        """Copy-on-republish: called BEFORE ``relpaths`` are
        overwritten, appended to, or dropped; copies the CURRENT
        content of each one whose content generation a pin still covers
        into the retained area.  Zero store round-trips beyond one pins
        GET when nothing is pinned (the default).  Idempotent — a
        completed copy (marker present) is never re-copied, so crash
        retry and the publish/recover replay are both safe.  Runs
        before the publish INTENT is written, so a crash either
        published nothing (retention copies are harmless extra) or
        rolls forward with retention already complete.

        Concurrency contract with pin/unpin: the pin set is read ONCE
        at the start of this call.  A ``pin`` that lands after that
        read is honored from the NEXT publish on (the racing publish
        may overwrite content the new pin wanted — the pin call's
        snapshot-readability check catches this, same as pinning any
        already-stale generation); an ``unpin`` racing this call only
        means one extra harmless copy that the next
        :meth:`sweep_retained` reclaims.  The ledger itself is
        conditional-write-safe (:meth:`_mutate_pins`; pinned by
        test_retention.py::test_pin_rmw_survives_cas_conflict)."""
        pins = self.pins()
        if not pins:
            return []
        doc = self.read_doc()
        if doc is None:
            # pins exist but the current catalog is unreadable: the
            # content stamps retention keys on cannot be determined, so
            # proceeding would silently break the pins' promise at the
            # only moment the old bytes still exist.  Loud stop — the
            # caller repairs the catalog (or unpins) and retries.
            raise StoreError(
                f"{self._root}: catalog state unreadable while "
                f"generations {pins} are pinned — refusing to publish "
                f"over possibly-pinned content (repair_catalog, or "
                f"unpin, then retry)")
        touched = doc.get("touched", {})
        live = set(doc.get("partitions", []))
        gmax = max(pins)
        from .staging import _walk_files
        candidates: list[tuple[str, int]] = []
        for rel in relpaths:
            if rel not in live:
                continue                  # brand-new partition: nothing old
            stamp = touched.get(rel)
            if stamp is None:
                # legacy stamp-less entry: a time-travel read treats it
                # as touched-now (stale), so a retained copy could never
                # be resolved — skip rather than copy dead weight
                continue
            stamp = int(stamp)
            if stamp > gmax:
                continue                  # content newer than any pin
            candidates.append((rel, stamp))
        if not candidates:
            return []
        # server-side copy when the store has one (S3 CopyObject,
        # GCS rewrite, Azure Copy Blob, Hadoop FileUtil) — a
        # pinned 100-GB partition must never round-trip through
        # the driver; the byte path is the small-store fallback
        copier = getattr(self._fs, "copy_file", None)

        def _prep(cand: "tuple[str, int]"):
            """Per-partition store probes (marker HEAD, partial-dir
            clear, source walk) — independent across partitions, so
            they share the copy pool; a republish over K pinned
            partitions pays ~K/W prep round-trips, not K."""
            rel, stamp = cand
            if self.has_retained(stamp, rel):
                return None               # completed copy: idempotent skip
            src = f"{self._root}/{rel}"
            dst = f"{self.retained_root(stamp)}/{rel}"
            # no marker but files present = crash mid-copy: clear the
            # partial dir first — stray partial files must never leak
            # into a retained scan
            if self._fs.exists(dst):
                self._fs.delete(dst)
            return rel, stamp, src, dst, _walk_files(self._fs, src)

        def _copy_one(rel: str, src_f: str, dst_f: str) -> None:
            if copier is not None:
                if not copier(src_f, dst_f):
                    # a file listed a moment ago is gone: someone
                    # is mutating the partition under us — writing
                    # the marker would certify a PARTIAL copy as
                    # complete forever.  Loud stop; the publish
                    # retries retention from the marker check.
                    raise StoreError(
                        f"{src_f} vanished during retention "
                        f"copy (concurrent mutation?) — retained "
                        f"copy of {rel} is incomplete, not "
                        f"marked")
            else:
                self._fs.write_bytes(dst_f, self._fs.read_bytes(src_f))

        # the per-file copies are independent idempotent server-side
        # calls — run them on a bounded pool so a republish touching
        # K pinned partitions × F files costs ~K·F/W round-trips of
        # publish latency, not K·F serialized from the driver.  The
        # markers preserve the completion contract: each rel's marker
        # is written only after ALL of that rel's copies returned, in
        # the submission thread, so a crash or a vanished-file error
        # leaves the rel unmarked (= retried), never certified.
        out: list[str] = []
        # full width even for one candidate partition: its file count
        # is unknown until _prep lists it, and idle threads are free
        workers = _RETAIN_COPY_WORKERS
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(
                max_workers=workers,
                thread_name_prefix="zcs-retain") as pool:
            jobs = [j for j in pool.map(_prep, candidates)
                    if j is not None]
            total_files = sum(len(files) for *_, files in jobs)
            # resolve the session ONCE and thread it through (r12
            # advice: a second lookup inside _retain_distributed could
            # disagree with this one if the config override or active
            # session changes in between)
            spark = self._retention_spark_session(total_files)
            if spark is not None and jobs:
                # huge pin set: escalate past the driver pool — copies
                # fan out over the executors (see _retain_distributed).
                # A failure of the Spark JOB itself (workers missing
                # the store SDK, serialization, cluster trouble) is an
                # availability problem, not a data problem: degrade to
                # the bounded driver pool below, which needs only the
                # driver's own client.  The deliberate vanished-file
                # StoreError stays loud — that one means the copy set
                # is wrong, and no pool retry can make it right.
                try:
                    return self._retain_distributed(jobs, spark)
                except StoreError:
                    raise
                except Exception as exc:  # noqa: BLE001 — degrade wide
                    warnings.warn(
                        f"distributed retention copy failed "
                        f"({type(exc).__name__}: {exc}); falling back "
                        f"to the driver copy pool for "
                        f"{total_files} file(s)", RuntimeWarning,
                        stacklevel=2)
            futures = [
                (rel, stamp, len(files),
                 [pool.submit(_copy_one, rel, f"{src}/{f}",
                              f"{dst}/{f}") for f in files])
                for rel, stamp, src, dst, files in jobs]
            try:
                for rel, stamp, count, futs in futures:
                    for fut in futs:
                        fut.result()      # re-raises the loud stop
                    self._fs.write_text(
                        self._retained_marker(stamp, rel),
                        json.dumps({"format_version": 1,
                                    "stamp": stamp,
                                    "n_files": count}))
                    out.append(rel)
            except BaseException:
                # don't start copies we no longer need; in-flight ones
                # finish harmlessly (idempotent, unmarked)
                for _, _, _, futs in futures:
                    for fut in futs:
                        fut.cancel()
                raise
        return out

    def _retention_spark_session(self, total_files: int):
        """The active SparkSession IFF this retention pass should run
        its copies as a Spark job: the file count reaches the
        ``retention.distribute_min_files`` config (0 = disabled) and
        the store is executor-visible (the same precondition the data
        plane already relies on — executors write partition files to
        this store; ``memory://`` is process-local and always stays on
        the driver pool)."""
        from .. import config
        floor = config.get("retention.distribute_min_files")
        if not floor or total_files < floor:
            return None
        # executor-reconstructible clients only: object-store backends
        # rebuild from env/creds; bare/file paths assume the shared
        # filesystem the data plane already writes through.  memory://
        # is process-local; hdfs:// etc. ride the DRIVER's py4j
        # gateway, which a Python worker does not have.
        scheme = self._root.split("://", 1)[0] if "://" in self._root \
            else "file"
        if scheme not in ("s3", "gs", "az", "file"):
            return None
        # the scheme alone is not enough (r12 advice): the DRIVER may
        # itself have fallen back to the py4j HadoopFS client (boto3
        # missing, az/gs creds outside the env) — a worker-side
        # fs_for() would then raise instead of rebuilding a client,
        # and the whole publish would fail on an availability detail.
        # Require the driver's own metadata client to be one of the
        # env-reconstructible classes before fanning out.
        from .. import fs as fsmod
        inner = getattr(self._fs, "inner", self._fs)  # unwrap CountingFS
        if not isinstance(inner, (fsmod.LocalFS, fsmod.S3FS,
                                  fsmod.AzureBlobFS, fsmod.GcsFS)):
            return None
        from pyspark.sql import SparkSession
        return SparkSession.getActiveSession()

    def _retain_distributed(self, jobs, spark) -> list[str]:
        """Retention copies as a Spark job — the 100-TB escalation.

        A republish touching 10 k pinned partitions × 50 files is
        500 k independent server-side copy calls; the driver pool's
        16 threads serialize that into tens of minutes, while the
        cluster disposes of it at executor-count parallelism.  Workers
        rebuild the store client by scheme/env (``fs_for`` — exactly
        how partition writes already reach the store) and issue the
        same idempotent copy calls; failures come back as (rel, path)
        pairs and raise the same loud vanished-file stop, with every
        touched partition left UNMARKED (= retried), never certified.
        Markers are written on the driver only after the whole job
        succeeds — same completion contract as the pool path.

        Observability note: copies issued by executors do NOT tick the
        driver-side CountingFS/api_counts probes (each worker has its
        own client) — op-budget assertions and the bench retention
        counter run below the distribute threshold by construction, so
        they keep exact counts on the pool path.

        ``spark`` is resolved ONCE by the caller (retain_for_pins) —
        re-resolving here could race a config override or session swap
        between the two lookups (r12 advice)."""
        pairs = [(rel, f"{src}/{f}", f"{dst}/{f}")
                 for rel, stamp, src, dst, files in jobs
                 for f in files]
        # ~512 copies per task: enough to amortize task launch, small
        # enough that stragglers re-run cheaply
        n_slices = max(1, min(len(pairs) // 512 + 1,
                              spark.sparkContext.defaultParallelism * 4))

        def _copy_chunk(it):
            from zcollection_spark import fs as fsmod
            fs = None
            for rel, src_f, dst_f in it:
                if fs is None:
                    fs = fsmod.fs_for(src_f)
                copier = getattr(fs, "copy_file", None)
                if copier is not None:
                    if not copier(src_f, dst_f):
                        yield (rel, src_f)
                else:
                    fs.write_bytes(dst_f, fs.read_bytes(src_f))

        failures = (spark.sparkContext
                    .parallelize(pairs, numSlices=n_slices)
                    .mapPartitions(_copy_chunk).collect())
        if failures:
            raise StoreError(
                f"{len(failures)} file(s) vanished during distributed "
                f"retention copy (concurrent mutation?) — e.g. "
                f"{failures[0][1]} of partition {failures[0][0]}; no "
                f"retained copy was marked complete")
        out: list[str] = []
        for rel, stamp, _src, _dst, files in jobs:
            self._fs.write_text(
                self._retained_marker(stamp, rel),
                json.dumps({"format_version": 1, "stamp": stamp,
                            "n_files": len(files)}))
            out.append(rel)
        return out

    def sweep_retained(self) -> list[str]:
        """Delete retained copies no PINNED generation references
        (after unpin / prune).  Reachability: pin g keeps ``(stamp,
        rel)`` for every partition of snapshot g at its recorded
        stamp.  Returns removed ``gen-<stamp>/<rel>`` identifiers."""
        base = f"{self._root}/{RETAINED_RELDIR}"
        stamp_dirs = [d for d in self._fs.list_dirs(base)
                      if d.startswith("gen-")]
        if not stamp_dirs or self._walk_depth is None:
            return []
        reachable: set = set()
        for g in self.pins():
            snap = self.read_at(g)
            if snap is None:
                # a LIVE pin whose snapshot is unreadable (pruned by
                # hand, corrupt, transient store fault): its reference
                # set is UNKNOWN — deleting "unreferenced" copies now
                # would turn a repairable one-file metadata problem
                # into unrecoverable data loss.  Skip the sweep; it
                # reruns on the next unpin/prune once the snapshot is
                # readable again.
                return []
            snap_touched = snap.get("touched", {})
            for rel in snap.get("partitions", []):
                stamp = snap_touched.get(rel)
                if stamp is not None:
                    reachable.add((int(stamp), rel))
        doomed: list[tuple[str, str]] = []
        # stamp dirs already empty when first listed: orphans from a
        # prior sweep that crashed between its copy deletes and the
        # dir delete — no later doomed-set would ever revisit them
        # (r12 advice).  Recorded during THIS pass's listing, so the
        # reclaim costs zero extra LIST round-trips.
        empty_dirs: list[str] = []
        for d in stamp_dirs:
            try:
                stamp = int(d[len("gen-"):])
            except ValueError:
                continue
            droot = f"{base}/{d}"
            rels = self._fs.list_partition_dirs(droot, self._walk_depth)
            if not rels:
                empty_dirs.append(d)
                continue
            for rel in rels:
                if (stamp, rel) not in reachable:
                    doomed.append((d, rel))
        # the per-copy deletes are independent idempotent prefix
        # removals — same bounded fan-out as retain_for_pins' copies
        # (each one is a LIST + batch-delete round-trip on object
        # stores; serializing K of them from the driver is the same
        # publish-latency tax the copy pool removed)
        removed: list[str] = []
        if doomed:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(
                    max_workers=min(_RETAIN_COPY_WORKERS, len(doomed)),
                    thread_name_prefix="zcs-sweep") as pool:
                list(pool.map(
                    lambda dr: self._fs.delete(f"{base}/{dr[0]}/{dr[1]}"),
                    doomed))
            removed = [f"{d}/{rel}" for d, rel in doomed]
            # a stamp dir whose last copy just left goes too — only
            # dirs that lost copies THIS sweep need a fresh listing
            for d in sorted({d for d, _rel in doomed}):
                droot = f"{base}/{d}"
                if not self._fs.list_partition_dirs(droot,
                                                    self._walk_depth):
                    empty_dirs.append(d)
        for d in sorted(set(empty_dirs)):
            self._fs.delete(f"{base}/{d}")
        return removed

    def _commit_rmw(self, mutate, need_base: bool = True) -> list[str]:
        """Read-merge-write commit.  On stores with conditional writes
        (``fs.write_if``) this is an optimistic-concurrency loop: read
        the document and its version token in ONE GET, apply ``mutate``,
        conditionally PUT; a lost race re-reads the winner's document
        and re-merges, so concurrent committers CONVERGE TO THE UNION
        instead of last-writer-wins (S3: native ``If-Match`` ETag PUT —
        lock-free, any number of writers; local/HDFS: lock-file CAS).
        On a store without ``write_if`` the single-shot last-wins write
        is kept, reconciled by ``repair_catalog`` — the pre-CAS
        semantics, still pinned for that configuration."""
        import random
        import time
        cas = hasattr(self._fs, "write_if")
        with _LOCKS[self._path]:
            for attempt in range(_CAS_RETRIES):
                if cas:
                    doc0, token = self._read_doc_versioned()
                else:
                    doc0, token = self._read_doc(), None
                if doc0 is not None:
                    base = list(doc0["partitions"])
                elif need_base and self._walk_depth is not None:
                    base = self._fs.list_partition_dirs(self._root,
                                                        self._walk_depth)
                else:
                    base = []
                txn_map = dict((doc0 or {}).get("txn", {}))
                stats_map = dict((doc0 or {}).get("stats", {}))
                touched = dict((doc0 or {}).get("touched", {}))
                # the CAS serializes generation numbers: a lost race
                # re-reads the winner's generation and re-increments
                gen = int((doc0 or {}).get("generation", 0)) + 1
                partitions, txn_map, stats_map = \
                    mutate(base, txn_map, stats_map, touched, gen)
                stats_map = self._externalize_blooms(stats_map)
                doc = self._build_doc(partitions, txn_map, stats_map,
                                      gen, touched)
                partitions = doc["partitions"]
                payload = json.dumps(doc, indent=1)
                if not cas:
                    self._fs.write_text(self._path, payload)
                    self._snapshot(doc)
                    return partitions
                try:
                    self._fs.write_if(self._path, payload, token)
                    self._snapshot(doc)
                    return partitions
                except CommitConflictError:
                    if attempt == _CAS_RETRIES - 1:
                        raise
                    # jittered backoff: contending drivers desynchronize
                    time.sleep(random.uniform(0.0, 0.02 * (attempt + 1)))
        raise AssertionError("unreachable")

    def add(self, new: list[str],
            txn: "tuple[str, int] | None" = None,
            stats: dict | None = None,
            widen: bool = False) -> list[str]:
        """Add partitions (idempotent union).

        ``stats`` carries zone-map statistics for (a subset of) the new
        partitions.  STALE-STATS SAFETY INVARIANT: a partition
        re-published WITHOUT statistics has its old entry dropped —
        statistics only ever describe the current generation, so any
        writer path that cannot produce them degrades that partition to
        conservative full scans, never to wrong pruning.  ``widen=True``
        (append publishes) unions the new interval into the existing one
        — and drops the entry when there is no existing one, because
        appended-rows statistics alone do not describe rows already in
        the partition."""

        def mutate(base: list[str], txn_map: dict, stats_map: dict,
                   touched: dict, gen: int):
            if txn is not None:
                app, version = txn
                txn_map[app] = max(int(version),
                                   int(txn_map.get(app, -1)))
            provided = stats or {}
            existing = set(base)
            for rel in new:
                touched[rel] = gen
                fresh = provided.get(rel)
                if fresh is None:
                    stats_map.pop(rel, None)
                elif not widen:
                    stats_map[rel] = fresh
                elif rel in stats_map:
                    stats_map[rel] = _widen_stats(stats_map[rel], fresh,
                                                  self.load_bloom)
                elif rel not in existing:
                    # append created a BRAND-NEW partition: the appended
                    # rows are its entire content, so the fresh interval
                    # is exact — only an existing partition without
                    # stats must stay stats-less (its old rows are an
                    # unknown interval)
                    stats_map[rel] = fresh
                else:
                    stats_map.pop(rel, None)
            return sorted(set(base) | set(new)), txn_map, stats_map

        return self._commit_rmw(mutate)

    def remove(self, gone: list[str]) -> list[str]:
        def mutate(base: list[str], txn_map: dict, stats_map: dict,
                   touched: dict, gen: int):
            for rel in gone:
                stats_map.pop(rel, None)
            return sorted(set(base) - set(gone)), txn_map, stats_map

        return self._commit_rmw(mutate)

    def drop(self) -> None:
        self._fs.delete(self._path)
