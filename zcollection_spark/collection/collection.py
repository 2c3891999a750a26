"""Partitioned collection over a Hive-style parquet layout.

The Spark-native re-expression of
``/root/reference/zcollection/collection/base.py:81`` (``Collection``).  The
reference's Zarr-v3-group-per-partition layout maps 1:1 onto Spark's
partitioned-table model (SURVEY §1.4): data lives under ``key=value/``
directories, read natively (with partition pruning and column pruning from
Catalyst), written with shuffle-by-partition-key + dynamic partition
overwrite.

Layout::

    collection/
    ├── _zcollection.json        # schema + axis + partitioning (serde below)
    ├── _catalog/state.json      # sorted partition list + sha256 (catalog.py)
    ├── _immutable/data.parquet  # one-row table of non-axis variables
    └── year=2024/month=3/…      # parquet files per partition

``_``-prefixed entries are invisible to Spark's partition discovery, so the
metadata never pollutes reads.

Scale design notes (the parts that matter at 100 TB / 1000 executors):

- **reads are declarative**: ``query`` builds ``read.parquet → filter →
  select`` so Catalyst does partition pruning + column pruning + parquet
  predicate pushdown; the driver-side catalog only *shortcuts the listing*
  (one small GET instead of a recursive object-store LIST).
- **writes shuffle once**: rows are hash-repartitioned by the partition-key
  columns, sorted within partitions by the axis, and written with
  ``partitionBy``; all rows of one partition meet in one task (fixing the
  reference's fragmented-key race, SURVEY Q3) and produce axis-ordered files.
- **merges never loop over partitions**: each strategy is one DataFrame
  program joining existing colliding partitions (pruned scan) against the
  (broadcast) incoming batch — see ``merge.py``.
- **immutables are a broadcast**: the one-row ``_immutable`` table is
  crossJoin(broadcast(...))-attached, i.e. a map-side literal, not a shuffle.

Deliberate deviations (SURVEY §2.8): Q2 fixed — partition order is numeric
(explicit ``orderBy``), not lexicographic.  Q3 fixed by the shuffle.  Q4
tightened — ``update`` must return all partitioned variables unless
``allow_variable_drop=True``.  Q5/Q6/Q7/Q8 preserved.
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import config as engine_config
from .. import fs as fsmod
from ..errors import (CollectionExistsError, CollectionNotFoundError,
                      ReadOnlyError, SchemaError, StoreError)
from ..partitioning import Partitioning, compile_filter
from ..partitioning import from_json as partitioning_from_json
from ..partitioning.zonemap import compile_zone_filter
from ..schema import DatasetSchema, FORMAT_VERSION, upgrade
from . import staging as staging_proto
from .catalog import Catalog, diff_documents as catalog_diff
from .stats import collect_zone_stats
from .merge import (MergeCallable, concat as merge_concat,
                    replace as merge_replace, resolve_merge)

CONFIG_NAME = "_zcollection.json"


def _is_temporal_dtype(dtype: str) -> bool:
    """Datetime-ish schema dtypes — excluded from zone-map stats (their
    string bounds would not order like Spark's timestamp casts)."""
    d = dtype.lower()
    return d.startswith(("datetime", "timedelta")) or "date" in d \
        or "timestamp" in d


IMMUTABLE_RELPATH = "_immutable/data.parquet"
ROW_IDX = "_row_idx"


def create_collection(spark: SparkSession, path: str, *,
                      schema: DatasetSchema, axis: str,
                      partitioning: Partitioning,
                      catalog_enabled: bool = True,
                      stats_columns: "Iterable[str] | None" = None,
                      bloom_columns: "Iterable[str] | None" = None,
                      bloom_bits: int = 1024,
                      cluster_by: "Iterable[str] | None" = None,
                      cluster_mode: str = "range",
                      overwrite: bool = False) -> "Collection":
    """DDL: bind the schema to the axis and write the root config
    (``/root/reference/zcollection/api.py:19-62`` →
    ``collection/base.py:161-234``).

    ``stats_columns`` opts the collection into zone-map statistics:
    per-partition min/max/null-count of the named data columns,
    committed with every publish and used by ``query(where=...)`` to
    skip partitions a data-column predicate provably cannot match
    (partitioning/zonemap.py) — requires ``catalog_enabled``.

    ``bloom_columns`` adds per-partition bloom filters (``bloom_bits``
    bits each, int/string columns only) for EQUALITY skipping on
    high-cardinality columns where min/max intervals cannot prune —
    ``query(where="doc_id == K")`` skips every partition whose filter
    proves K absent (Delta/Iceberg-style point-lookup skipping; see
    collection/stats.py).  Like zone maps, pruning is an optimization
    only: the exact predicate always also runs over scanned rows.

    ``cluster_by`` opts into a RANGE-CLUSTERED file layout: every
    partition write task-locally sorts its rows by the named columns
    before writing (``sortWithinPartitions`` — no extra shuffle; the
    partitioned write needs a sort on the partition keys anyway, this
    widens it).  Within each partition the parquet row groups — and,
    with file splitting via chunked axis dims, the files — then cover
    near-disjoint ranges of the clustered columns, so Spark's native
    parquet row-group pruning skips most of a partition under a range
    predicate the zone map alone can only accept or reject WHOLE
    (zone maps prune across partitions, clustering prunes within —
    the Delta/Iceberg ``clusterBy``/sort-order layer).  Trade-off:
    physical order within a file tracks the cluster columns instead of
    the axis, so row-range reads (index lookups) touch more row groups
    on clustered collections — opt in per collection accordingly.

    ``cluster_mode`` picks the curve: ``"range"`` (default) sorts
    lexicographically — tight on the LEADING column only; ``"zorder"``
    (two or more numeric/temporal cluster columns) interleaves
    batch-normalized bucket bits into a Z-curve, bounding every row
    group's extent in EVERY clustered column, so predicates on any of
    them prune (collection/cluster.py; costs one extra min/max
    aggregate job per write)."""
    path = fsmod.strip_scheme(path).rstrip("/")
    fs = fsmod.fs_for(path, spark)
    config_path = f"{path}/{CONFIG_NAME}"
    if fs.exists(config_path):
        if not overwrite:
            raise CollectionExistsError(f"collection exists at {path!r}")
        fs.delete(path)
    bound = schema.with_partition_axis(axis)
    var_map = bound.variable_map
    for var in partitioning.variables:
        if var not in var_map:
            raise SchemaError(
                f"partitioning variable {var!r} is not in the schema")
        if var_map[var].immutable:
            raise SchemaError(
                f"partitioning variable {var!r} does not span the axis")
    stats_columns = sorted(stats_columns) if stats_columns else None
    if stats_columns:
        if not catalog_enabled:
            raise SchemaError(
                "stats_columns requires catalog_enabled=True — the "
                "catalog document is where the statistics live")
        for col in stats_columns:
            if col not in var_map or var_map[col].immutable:
                raise SchemaError(
                    f"stats column {col!r} is not a partitioned "
                    f"variable of the schema")
            if _is_temporal_dtype(var_map[col].dtype):
                # bounds are stored as ISO strings but where-literals
                # are strings Spark CASTS to timestamps — '2024-01-04'
                # vs '2024-01-04T00:00:00' order differently as text
                # than as time, so pruning could silently drop rows.
                # Time ranges are the partitioning axis's job anyway.
                raise SchemaError(
                    f"stats column {col!r} is temporal "
                    f"({var_map[col].dtype}): timestamp pruning is the "
                    f"partitioning's job — use Date partitioning keys "
                    f"in filters= instead of where= zone maps")
    bloom_columns = sorted(bloom_columns) if bloom_columns else None
    if bloom_columns:
        from .stats import bloom_kind_of
        if not catalog_enabled:
            raise SchemaError(
                "bloom_columns requires catalog_enabled=True — the "
                "catalog document is where the filters live")
        if bloom_bits % 64 or bloom_bits <= 0:
            raise SchemaError("bloom_bits must be a positive multiple "
                              "of 64")
        for col in bloom_columns:
            if col not in var_map or var_map[col].immutable:
                raise SchemaError(
                    f"bloom column {col!r} is not a partitioned "
                    f"variable of the schema")
            np_kind = var_map[col].dtype
            if not (np_kind.startswith(("int", "uint", "<U"))
                    or np_kind in ("str", "vlen-utf8")):
                raise SchemaError(
                    f"bloom column {col!r} must be integer or string "
                    f"typed (got {np_kind}): the cross-side hash canon "
                    f"is only exact for those")
    cluster_by = list(cluster_by) if cluster_by else None
    if cluster_mode not in ("range", "zorder"):
        raise SchemaError(
            f"cluster_mode must be 'range' or 'zorder', got "
            f"{cluster_mode!r}")
    if cluster_by:
        for col in cluster_by:
            if col not in var_map or var_map[col].immutable:
                raise SchemaError(
                    f"cluster column {col!r} is not a partitioned "
                    f"variable of the schema")
            if col in partitioning.variables:
                raise SchemaError(
                    f"cluster column {col!r} is already a partitioning "
                    f"variable — clustering inside a partition by its "
                    f"own key is a no-op")
        if cluster_mode == "zorder":
            if len(cluster_by) < 2:
                raise SchemaError(
                    "cluster_mode='zorder' needs at least two cluster "
                    "columns — with one, plain range clustering is "
                    "strictly better")
            for col in cluster_by:
                kind = var_map[col].dtype
                if not (kind.startswith(("int", "uint", "float"))
                        or _is_temporal_dtype(kind)):
                    raise SchemaError(
                        f"zorder cluster column {col!r} must be "
                        f"numeric or temporal (got {kind}): bucket "
                        f"interleaving needs an ordered numeric domain")
    elif cluster_mode != "range":
        raise SchemaError("cluster_mode without cluster_by has no "
                          "effect — pass the columns to cluster")
    doc = {"format_version": FORMAT_VERSION, "schema": bound.to_json(),
           "partitioning": partitioning.to_json(),
           "catalog_enabled": catalog_enabled}
    if stats_columns:
        doc["stats_columns"] = stats_columns
    if bloom_columns:
        doc["bloom_columns"] = bloom_columns
        doc["bloom_bits"] = int(bloom_bits)
    if cluster_by:
        doc["cluster_by"] = cluster_by
        if cluster_mode != "range":
            doc["cluster_mode"] = cluster_mode
    fs.write_text(config_path, json.dumps(doc, indent=1, sort_keys=True))
    coll = Collection(spark, path, bound, partitioning, mode="rw",
                      catalog_enabled=catalog_enabled,
                      stats_columns=stats_columns,
                      bloom_columns=bloom_columns,
                      bloom_bits=bloom_bits,
                      cluster_by=cluster_by,
                      cluster_mode=cluster_mode)
    if catalog_enabled:
        coll._catalog.write([])
    return coll


def open_collection(spark: SparkSession, path: str, *,
                    mode: str = "r") -> "Collection":
    """Open an existing collection root (``api.py:65-95``).

    An ``icechunk://`` URL dispatches to the read-only format bridge
    for reference-written icechunk repositories
    (:mod:`zcollection_spark.icechunk_compat`, optional deps) —
    returned handles carry the read vocabulary only (query /
    partitions / history / at_snapshot)."""
    if path.startswith("icechunk://"):
        if mode != "r":
            raise ReadOnlyError("icechunk repositories open read-only "
                                "(the bridge has no write path)")
        from ..icechunk_compat import open_icechunk_collection
        return open_icechunk_collection(spark, path)
    path = fsmod.strip_scheme(path).rstrip("/")
    fs = fsmod.fs_for(path, spark)
    config_path = f"{path}/{CONFIG_NAME}"
    if not fs.exists(config_path):
        raise CollectionNotFoundError(f"no collection at {path!r}")
    try:
        doc = upgrade(json.loads(fs.read_text(config_path)))
    except ValueError as exc:
        raise StoreError(f"unreadable collection config: {exc}") from None
    schema = DatasetSchema.from_json(doc["schema"])
    partitioning = partitioning_from_json(doc["partitioning"])
    bloom_columns = doc.get("bloom_columns")
    bloom_bits = int(doc.get("bloom_bits", 1024))
    stats_columns = doc.get("stats_columns")
    if stats_columns:
        # collections written before the temporal-stats rejection may
        # carry timestamp columns whose ISO-string bounds do not order
        # like Spark's casts — disable THEIR pruning, keep the rest
        var_map = schema.variable_map
        bad = [c for c in stats_columns if c in var_map
               and _is_temporal_dtype(var_map[c].dtype)]
        if bad:
            import warnings
            warnings.warn(f"ignoring temporal stats columns {bad} "
                          f"(unsafe string-vs-timestamp ordering)")
            stats_columns = [c for c in stats_columns if c not in bad]
    return Collection(spark, path, schema, partitioning, mode=mode,
                      catalog_enabled=doc.get("catalog_enabled", True),
                      stats_columns=stats_columns,
                      bloom_columns=bloom_columns,
                      bloom_bits=bloom_bits,
                      cluster_by=doc.get("cluster_by"),
                      cluster_mode=doc.get("cluster_mode", "range"))


class Collection:
    """All public reads/writes on one partitioned collection."""

    def __init__(self, spark: SparkSession, path: str,
                 schema: DatasetSchema, partitioning: Partitioning, *,
                 mode: str = "r", catalog_enabled: bool = True,
                 stats_columns: "list[str] | None" = None,
                 bloom_columns: "list[str] | None" = None,
                 bloom_bits: int = 1024,
                 cluster_by: "list[str] | None" = None,
                 cluster_mode: str = "range"):
        if schema.axis is None:
            raise SchemaError("collection schema must be axis-bound")
        self.spark = spark
        self.path = path.rstrip("/")
        self.schema = schema
        self.partitioning = partitioning
        self.axis = schema.axis
        self.mode = mode
        self.catalog_enabled = catalog_enabled
        self.stats_columns = list(stats_columns) if stats_columns else []
        self.bloom_columns = list(bloom_columns) if bloom_columns else []
        self.cluster_by = list(cluster_by) if cluster_by else []
        self.cluster_mode = cluster_mode
        self.bloom_bits = int(bloom_bits)
        self._fs = fsmod.fs_for(self.path, spark)
        self._catalog = Catalog(self._fs, self.path,
                                walk_depth=partitioning.depth)
        # content-addressed sidecar bloom payloads are immutable:
        # cache them for the collection's lifetime (ref -> b64 | None)
        self._bloom_payloads: dict = {}

    # ------------------------------------------------------------------
    # partition enumeration + pruning (collection/base.py:302-386)
    # ------------------------------------------------------------------
    def _resolve_for_read(self, generation: int) -> "tuple[dict, dict]":
        """The gen-``generation`` catalog document plus per-partition
        read sources (None = live dir; else the pinned-generation
        retained base), verified SAFE against the current store state —
        the strict soundness gate behind ``pin_generation`` (the query
        paths use the filter-lenient ``catalog.resolve_matched``).
        Partition directories are MUTABLE, so an old partition list
        reconstructs an old view only while every listed partition is
        untouched since that generation or pin-retained; see
        ``catalog.resolve_snapshot_readable``."""
        if not self.catalog_enabled:
            raise ValueError("at_generation requires the catalog "
                             "(this collection runs catalog-less)")
        from .catalog import resolve_snapshot_readable
        return resolve_snapshot_readable(self._catalog, generation)

    def partitions(self, *, filters: str | None = None,
                   at_generation: int | None = None) -> list[str]:
        """Matching partition relpaths in numeric key order (Q2 fixed).

        Catalog hit = one GET; miss = depth-limited store walk
        (``base.py:340-386``) — on object stores the walk is the expensive
        path, which is why inserts keep the catalog current.

        ``at_generation`` lists the partition set AS OF that committed
        generation (verified reconstructable — and, matching
        :meth:`query`, staleness is fatal only for partitions the
        filter MATCHES, so a key predicate that excludes every stale
        partition supports the documented partial-read workflow).
        """
        if at_generation is not None:
            if not self.catalog_enabled:
                raise ValueError("at_generation requires the catalog "
                                 "(this collection runs catalog-less)")
            from .catalog import resolve_matched
            return resolve_matched(
                self._catalog, at_generation,
                lambda rels: self._match_relpaths(rels, filters))[2]
        else:
            relpaths = (self._catalog.read() if self.catalog_enabled
                        else None)
        if relpaths is None:
            relpaths = self._fs.list_partition_dirs(
                self.path, self.partitioning.depth)
        return self._match_relpaths(relpaths, filters)

    def _match_relpaths(self, relpaths: "list[str]",
                        filters: str | None) -> list[str]:
        """Key-predicate filter + numeric key sort over a relpath list
        (the pure tail of :meth:`partitions`, factored out so callers
        holding an already-fetched snapshot skip the second catalog
        round-trip)."""
        predicate = compile_filter(filters)
        decoded = [(rel, self.partitioning.decode(rel)) for rel in relpaths]
        matched = [(rel, key) for rel, key in decoded if predicate.evaluate(key)]
        matched.sort(key=lambda item: tuple(item[1][k]
                                            for k in self.partitioning.keys))
        return [rel for rel, _ in matched]

    def repair_catalog(self) -> list[str]:
        """Recover interrupted inserts, then re-walk the store and rewrite
        the catalog (``base.py:352-375``; ≈ MSCK REPAIR TABLE).

        Recovery first rolls staged-with-intent writes forward and
        quarantines intent-less staging debris (staging.py), so the walk
        below never resurrects a half-written insert into the catalog —
        the reference's failed-insert-rolls-back contract
        (``/root/reference/zcollection/store/icechunk_store.py:158-168``).
        """
        self._require_writable()
        # pass the catalog so a rolled-forward insert commits its txn
        # version atomically (exactly-once across crash + replay)
        staging_proto.recover(
            self._fs, self.path,
            self._catalog if self.catalog_enabled else None)
        relpaths = self._fs.list_partition_dirs(self.path,
                                                self.partitioning.depth)
        self._catalog.write(relpaths)  # preserves the txn ledger
        return sorted(relpaths)

    # ------------------------------------------------------------------
    # read path (collection/base.py:524-595)
    # ------------------------------------------------------------------
    def _spark_read_base(self, relpaths: list[str],
                         root: "str | None" = None) -> str:
        """Physical base dir for Spark scans of ``root`` (default: the
        collection path; time-travel passes a retained base).  Identity
        for stores the JVM reads natively; stores flagged
        ``requires_localization`` (S3 without a connector) mirror the
        requested relpaths locally first (ETag-cached — see
        ``S3FS.localize``)."""
        root = self.path if root is None else root
        if getattr(self._fs, "requires_localization", False):
            return self._fs.localize(root, relpaths)
        return root

    def _spark_parquet_write(self, target: str,
                             run_write: Callable[[str], None]) -> dict | None:
        """Run a Spark parquet-write job "into" ``target``.

        Native stores: the job writes directly, returns None (the staged
        publish walks for manifests if it needs them).  Localized
        stores: the job writes to scratch and the upload returns the
        exact file list — which becomes the writer-provided manifest, so
        the commit path never lists the store (staging.py).
        """
        if not getattr(self._fs, "requires_localization", False):
            run_write(target)
            return None
        scratch = self._fs.new_scratch_dir()
        run_write(scratch)
        files = self._fs.upload_tree(scratch, target)
        depth = self.partitioning.depth
        manifest: dict[str, list[str]] = {}
        for rel in files:
            comps = rel.split("/")
            if len(comps) > depth:
                manifest.setdefault("/".join(comps[:depth]),
                                    []).append("/".join(comps[depth:]))
        return manifest

    def _read_partitions(self, relpaths: list[str],
                         sources: "dict | None" = None) -> DataFrame:
        # explicit schema: no footer sampling (one less cold GET per read
        # at scale), and partitions written BEFORE a schema-evolution
        # add_variable read the new column as nulls instead of the scan
        # schema depending on which file got sampled
        struct = T.StructType()
        dims = self.schema.dim_map
        for v in self.schema.partitioned_variables:
            struct = struct.add(v.name, v.spark_type(dims, self.axis))
        struct = struct.add(ROW_IDX, T.IntegerType())

        def scan(root: str, rels: list[str]) -> DataFrame:
            base = self._spark_read_base(rels, root=root)
            reader = (self.spark.read.schema(struct)
                      .option("basePath", base))
            return reader.parquet(*(f"{base}/{rel}" for rel in rels))

        if not sources or all(v is None for v in sources.values()):
            return scan(self.path, relpaths)
        # time-travel with retained copies: group relpaths by physical
        # root (live collection + one retained base per content stamp)
        # and union the scans — each retained base uses ITS OWN
        # basePath so Hive partition-key inference stays correct; the
        # query-level final sort restores global order
        groups: dict[str, list[str]] = {}
        for rel in relpaths:
            groups.setdefault(sources.get(rel) or self.path,
                              []).append(rel)
        parts = [scan(root, rels) for root, rels in sorted(groups.items())]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _immutable_df(self) -> DataFrame | None:
        imm_path = f"{self.path}/{IMMUTABLE_RELPATH}"
        if not self.schema.immutable_variables or not self._fs.exists(imm_path):
            return None
        base = self._spark_read_base([IMMUTABLE_RELPATH])
        return self.spark.read.parquet(f"{base}/{IMMUTABLE_RELPATH}")

    def _attach_immutable(self, df: DataFrame,
                          wanted: set[str] | None) -> DataFrame:
        """Broadcast-attach ``_immutable`` variables; partition data wins on
        name conflict (quirk Q5, ``base.py:819-836``)."""
        imm = self._immutable_df()
        if imm is None:
            return df
        cols = [c for c in imm.columns if c not in df.columns]
        if wanted is not None:
            # short-name match at any depth — quirk Q8 (io/immutable.py:135-137)
            cols = [c for c in cols
                    if c in wanted or c.rsplit("/", 1)[-1] in wanted]
        if not cols:
            return df
        return df.crossJoin(F.broadcast(imm.select(*cols)))

    def _cast_restored_keys(self, df: DataFrame) -> DataFrame:
        """Partition-value inference may narrow types (int64 → int32); cast
        key columns that are ALSO data variables back to their declared
        dtype."""
        var_map = self.schema.variable_map
        dims = self.schema.dim_map
        casts = {}
        for key in self.partitioning.keys:
            if key in var_map and key in df.columns:
                target = var_map[key].spark_type(dims, self.axis)
                if df.schema[key].dataType != target:
                    casts[key] = F.col(key).cast(target)
        return df.withColumns(casts) if casts else df

    def _zone_prune(self, relpaths: list[str], where: str,
                    stats_map: dict | None = None) -> list[str]:
        """Drop partitions whose zone-map statistics PROVE the ``where``
        predicate cannot match (partitioning/zonemap.py).  Partitions
        without statistics are always kept — pruning is an optimization
        layered under the exact Catalyst filter, never a correctness
        boundary.  ``stats_map`` overrides the catalog read (time-travel
        passes the SNAPSHOT's statistics: they describe the data as of
        that generation, which the staleness gate proved unchanged)."""
        if not (self.catalog_enabled
                and (self.stats_columns or self.bloom_columns)):
            return relpaths
        if stats_map is None:
            stats_map = self._catalog.read_stats()
        if not stats_map:
            return relpaths
        may_match = compile_zone_filter(where)
        allowed = set(self.stats_columns) \
            | {f"{c}#bloom" for c in self.bloom_columns}

        def masked(rel):
            entry = stats_map.get(rel)
            if entry is None:
                return None
            # only columns the open-time validation accepted may prune
            # (masks legacy temporal entries in the catalog)
            return {c: v for c, v in entry.items() if c in allowed}

        # pass 1: intervals + inline blooms (a sidecar ref carries no
        # bitset, so the probe conservatively keeps the partition)
        survivors = [rel for rel in relpaths if may_match(masked(rel))]
        resolved = self._resolve_sidecar_blooms(
            {rel: masked(rel) for rel in survivors})
        if resolved is None:
            return survivors
        # pass 2: sidecar filters, fetched ONLY for interval-surviving
        # partitions — the 100-TB cost model of the sidecar layout
        return [rel for rel in survivors if may_match(resolved[rel])]

    def _resolve_sidecar_blooms(self, entries: dict) -> "dict | None":
        """Substitute sidecar bloom refs with their payloads
        (collection/stats.py:resolve_sidecar_blooms; content-addressed
        so cached per collection forever)."""
        from .stats import resolve_sidecar_blooms
        return resolve_sidecar_blooms(entries, self._catalog.load_bloom,
                                      self._bloom_payloads)

    def _load(self, *, filters: str | None = None,
              where: str | None = None,
              keep_internal: bool = False,
              at_generation: int | None = None) -> DataFrame | None:
        """Pruned scan with partition-key columns attached.

        Uses the catalog for listing-time pruning when available, and ALWAYS
        also applies the predicate as a Catalyst filter so the plan is
        correct (and prunes) even on a bare directory tree.  ``where``
        (data-column dialect, float literals allowed) additionally
        zone-map-prunes partitions and filters the scanned rows.
        """
        predicate = compile_filter(filters)
        sources = None
        if at_generation is not None:
            # fetch + staleness-verify the snapshot ONCE and thread it
            # to both the partition list and the zone-stats map — a
            # where-clause time-travel read used to verify twice (two
            # extra GETs per query on object stores, r10 advice).
            # ``sources`` routes republished partitions to their
            # pinned-generation retained copies (copy-on-republish);
            # staleness is fatal only for MATCHED partitions
            # (catalog.resolve_matched — the partial-read contract).
            if not self.catalog_enabled:
                raise ValueError("at_generation requires the catalog "
                                 "(this collection runs catalog-less)")
            from .catalog import resolve_matched
            snap, sources, relpaths = resolve_matched(
                self._catalog, at_generation,
                lambda rels: self._match_relpaths(rels, filters))
        else:
            snap = None
            relpaths = self.partitions(filters=filters)
        if where is not None:
            snap_stats = (dict(snap.get("stats", {}))
                          if snap is not None else None)
            relpaths = self._zone_prune(relpaths, where, snap_stats)
        if not relpaths:
            return None
        df = self._read_partitions(relpaths, sources=sources)
        if predicate.expr is not None:
            df = df.where(predicate.to_column())
        if where is not None:
            # the exact predicate: pushed into the parquet scan by
            # Catalyst; zone maps only decided which partitions to list
            df = df.where(compile_filter(where,
                                         allow_float=True).to_column())
        df = self._cast_restored_keys(df)
        if not keep_internal and ROW_IDX in df.columns:
            df = df.drop(ROW_IDX)
        return df

    def query(self, *, filters: str | None = None,
              variables: Iterable[str] | None = None,
              where: str | None = None,
              ordered: bool = True,
              at_generation: int | None = None,
              nested: bool = False) -> DataFrame | None:
        """``filter → project → concat → attach immutables``
        (``base.py:524-595``).

        Returns ``None`` when no partition matches (quirk Q6).  The result
        is the DataFrame concatenation of matching partitions — ordered
        numerically by partition key then axis when ``ordered=True`` (a fix
        of quirk Q2; the hash-order of the reference's path sort is not
        reproduced).

        ``where`` filters on DATA columns (same grammar as ``filters``
        plus float literals): zone-map statistics skip partitions the
        predicate provably cannot match before any file is listed, and
        the exact predicate is applied to the scanned rows.  Beyond the
        reference's surface (key-only pruning) — Delta/Iceberg-style
        data skipping for the 100 TB case.

        ``at_generation`` reads the collection AS OF a committed
        generation (``VERSION AS OF``, the batch complement of
        ``changes()``/``history()``): the partition list and zone
        statistics come from that generation's catalog snapshot, after
        a staleness gate proves every listed partition is physically
        untouched since — exact for append-only/append-mostly
        histories (the training-corpus shape), and a loud ``ValueError``
        when a wanted partition was republished or dropped (mutable
        partition directories cannot reconstruct it) or the snapshot
        was pruned.  Immutable variables attach at their CURRENT value
        (write-once by contract).

        ``nested=True`` returns the group tree as real ``StructType``
        columns (``data_01/ku/power`` → ``data_01.ku.power``), the
        struct view of the reference's attribute-path access
        (``data/group.py:218-280``).  A pure final projection — no
        shuffle, order-preserving, and Catalyst's nested-schema
        pruning keeps a ``select("g.sub.leaf")`` on the result as
        cheap as the flat column."""
        df = self._load(filters=filters, where=where,
                        at_generation=at_generation)
        if df is None:
            return None
        wanted = None
        if variables is not None:
            wanted = set(variables)
            projected = self.schema.select(wanted)
            keep = [v.name for v in projected.variables
                    if not v.immutable and v.name in df.columns]
            df = df.select(*keep)
        else:
            keep = [v.name for v in self.schema.partitioned_variables
                    if v.name in df.columns]
            df = df.select(*keep)
        # fill-value semantics: a declared fill stands in for nulls —
        # including partitions written before the variable existed
        # (schema evolution), matching zarr's missing-chunk-equals-fill
        fills = {v.name: F.coalesce(
                    F.col(v.name),
                    F.lit(v.fill_value).cast(
                        v.spark_type(self.schema.dim_map, self.axis)))
                 for v in self.schema.partitioned_variables
                 if v.fill_value is not None and v.name in df.columns
                 and len(v.dimensions) == 1}
        if fills:
            df = df.withColumns(fills)
        df = self._attach_immutable(df, wanted)
        if ordered:
            # the sort must be the LAST operator — Catalyst's EliminateSorts
            # drops sorts buried under joins/projections
            sort_cols = [c for c in (*self.partitioning.keys, self.axis)
                         if c in df.columns]
            if sort_cols:
                df = df.orderBy(*sort_cols)
        if nested:
            from ..schema import nest_struct_columns
            df = nest_struct_columns(df)
        return df

    # ------------------------------------------------------------------
    # write path (collection/base.py:390-522)
    # ------------------------------------------------------------------
    def _require_writable(self) -> None:
        if self.mode != "rw":
            raise ReadOnlyError(f"collection at {self.path!r} opened "
                                f"read-only")

    def _conform(self, df: DataFrame) -> DataFrame:
        """Rebind incoming columns to the collection schema
        (``base.py:805-816``): project to declared variables, cast dtypes."""
        var_map = self.schema.variable_map
        dims = self.schema.dim_map
        missing = [v.name for v in self.schema.partitioned_variables
                   if v.name not in df.columns]
        if missing:
            raise SchemaError(f"insert is missing partitioned variables "
                              f"{missing}")
        cols = []
        for var in self.schema.variables:
            if var.name not in df.columns:
                continue
            target = var.spark_type(dims, self.axis)
            src = F.col(var.name)
            cols.append(src.cast(target).alias(var.name)
                        if df.schema[var.name].dataType != target else src)
        return df.select(*cols)

    def _write_immutable(self, df: DataFrame) -> None:
        """Lift non-axis variables into the write-once ``_immutable`` table
        (``io/immutable.py:48-98``): first row's values, written once."""
        imm_names = [v.name for v in self.schema.immutable_variables
                     if v.name in df.columns]
        if not imm_names:
            return
        imm_path = f"{self.path}/{IMMUTABLE_RELPATH}"
        if self._fs.exists(imm_path):
            return  # write-once
        # concurrent inserts race to create this; write to a unique temp
        # dir and publish with an atomic rename — the loser just discards
        # (contents are identical by the write-once contract)
        import uuid as _uuid
        staging = f"{self.path}/_immutable/.tmp_{_uuid.uuid4().hex}"
        self._spark_parquet_write(
            staging,
            lambda t: (df.select(*imm_names).limit(1)
                       .coalesce(1).write.mode("overwrite").parquet(t)))
        if not (not self._fs.exists(imm_path)
                and self._fs.rename(staging, imm_path)):
            self._fs.delete(staging)

    def _axis_order(self, df: DataFrame):
        """Ordering expression along the axis.  The axis is a *dimension*;
        when a coordinate variable of the same name exists (the common
        case) rows order by it.  Without one the reference orders by array
        position, which Spark does not preserve — fall back to an arrival
        order (stable within a task, arbitrary across runs; documented)."""
        if self.axis in df.columns:
            return F.col(self.axis).asc_nulls_last()
        return F.monotonically_increasing_id().asc()

    def _with_row_idx(self, df: DataFrame) -> DataFrame:
        """Persist positional identity: ``_row_idx`` = 0-based rank within
        the partition ordered by axis.  Spark is unordered; this column is
        the engine's durable replacement for the reference's implicit array
        position (SURVEY §7 'row position semantics')."""
        win = (Window.partitionBy(*self.partitioning.keys)
               .orderBy(self._axis_order(df)))
        return df.withColumn(ROW_IDX, F.row_number().over(win) - F.lit(1))

    def _apply_cluster_sort(self, df: DataFrame,
                            keys: list[str]) -> DataFrame:
        """Task-local cluster sort for every partition-writing path
        (insert/merge/update via ``_write_tree`` AND ``compact`` — a
        maintenance rewrite must not silently destroy the layout).
        No-op for unclustered collections."""
        if not self.cluster_by:
            return df
        present = [c for c in self.cluster_by if c in df.columns]
        if len(present) >= 2 and self.cluster_mode == "zorder":
            # Z-curve layout: bucket each cluster column against the
            # batch's min/max (one extra aggregate job) and interleave
            # the bits — every row group gets a bounded extent in
            # EVERY clustered column, so predicates on any of them
            # prune (collection/cluster.py)
            from .cluster import batch_bounds, zorder_column
            z = zorder_column(present, batch_bounds(df, present))
            # derive a non-colliding temp name: a schema variable
            # literally named '__zorder' must not be overwritten by
            # the Z-value and silently dropped from every written
            # partition (r12 advice; same reserved-name discipline as
            # layout.py's '__salt' guard)
            zcol = "__zorder"
            while zcol in df.columns:
                zcol += "_"
            return (df.withColumn(zcol, z)
                    .sortWithinPartitions(*keys, zcol)
                    .drop(zcol))
        if present:
            # range-clustered layout: task-local sort (no exchange —
            # the partitioned write sorts on the keys regardless;
            # this widens that sort) so row groups and split files
            # cover near-disjoint ranges of the cluster columns and
            # parquet row-group pruning skips inside partitions
            return df.sortWithinPartitions(*keys, *present)
        return df

    def _write_tree(self, df: DataFrame, target: str) -> dict | None:
        """Write ``df``'s partition tree under ``target`` (a staging dir).

        Staging is always a fresh empty directory, so the Spark job runs
        with plain ``overwrite``; visibility is controlled by the publish
        renames, not by the write mode.  Returns the writer-side file
        manifest on localized stores (consumed by ``staged_publish``).
        """
        keys = list(self.partitioning.keys)
        chunks = None
        axis_dim = self.schema.dim_map.get(self.axis)
        if axis_dim is not None and axis_dim.chunks:
            chunks = axis_dim.chunks

        out = self._apply_cluster_sort(df, keys)

        def run_write(path: str) -> None:
            writer = (out.write.mode("overwrite").partitionBy(*keys)
                      .options(**engine_config.profile().writer_options()))
            if chunks:
                # chunk geometry → row-group/file sizing (the reference's
                # shard-size targeting, codecs/sharding.py:32-159)
                writer = writer.option("maxRecordsPerFile", chunks)
            writer.parquet(path)

        return self._spark_parquet_write(target, run_write)

    def _collect_stats(self, df: DataFrame,
                       relpaths: list[str]) -> dict | None:
        """Per-partition zone-map stats + bloom filters (see
        collection/stats.py for the cost model: one map-side-combined
        aggregation each, driver result bounded by partition count)."""
        zone = collect_zone_stats(df, self.partitioning,
                                  self.stats_columns, relpaths)
        if not self.bloom_columns:
            return zone
        from .stats import collect_bloom_stats
        bloom = collect_bloom_stats(df, self.partitioning,
                                    self.bloom_columns, relpaths,
                                    m_bits=self.bloom_bits)
        if bloom is None:
            return zone
        merged = {rel: dict(entry) for rel, entry in (zone or {}).items()}
        for rel, entry in bloom.items():
            merged.setdefault(rel, {}).update(entry)
        return merged or None

    def _staged_write(self, write_fn: Callable[[str], None], *,
                      mode: str,
                      txn: "tuple[str, int] | None" = None,
                      stats_df: DataFrame | None = None) -> list[str]:
        """Run ``write_fn(staging_dir)`` and publish atomically
        (stage → intent → rename, staging.py); the catalog add is part of
        the publish so readers never see uncommitted partitions.  ``txn``
        (app_id, version) commits in the same catalog PUT — streaming
        sinks use it for exactly-once replay skip.  ``stats_df`` is the
        exact DataFrame being written; when given (and the collection
        has ``stats_columns``) zone-map stats ride the same intent +
        catalog PUT.  Any caller that rewrites partitions WITHOUT
        providing it drops those partitions' stats (conservative scans
        instead of stale pruning); every in-repo rewrite path — insert,
        merges, ``update``, ``compact`` — provides it and refreshes."""
        stats_fn = None
        if stats_df is not None and self.catalog_enabled \
                and (self.stats_columns or self.bloom_columns):
            stats_fn = lambda rels: self._collect_stats(stats_df, rels)  # noqa: E731
        return staging_proto.staged_publish(
            self._fs, self.path, write_fn=write_fn,
            depth=self.partitioning.depth, mode=mode,
            catalog=self._catalog if self.catalog_enabled else None,
            txn=txn, stats_fn=stats_fn)

    def _write(self, derived: DataFrame, *, mode: str,
               txn: "tuple[str, int] | None" = None) -> list[str]:
        # ONE shuffle: the _row_idx window exchanges on hash(keys) and
        # sorts by (keys, axis) within tasks — exactly the distribution
        # partitionBy needs, so no extra repartition/sortWithinPartitions.
        # "overwrite" swaps whole partition dirs; "append" moves staged
        # files into existing partition dirs under collision-free names.
        publish = "swap" if mode == "overwrite" else "append"
        return self._staged_write(
            lambda staging: self._write_tree(self._with_row_idx(derived),
                                             staging),
            mode=publish, txn=txn, stats_df=derived)

    def insert(self, df: DataFrame, *,
               merge: str | MergeCallable | None = None,
               txn: "tuple[str, int] | None" = None) -> list[str]:
        """Partitioned write with optional merge
        (``base.py:390-522``; strategies in ``merge.py``).

        One shuffle on the partition-key columns groups every row of a key
        into one task (fixes quirk Q3); only touched partitions are
        rewritten.  The write is ATOMIC: the job lands in a hidden
        ``_staging/{id}`` dir, a ``_publish.json`` intent marks the commit
        point, and per-partition renames + the catalog PUT publish it
        (staging.py; reference failed-insert-rolls-back contract,
        ``/root/reference/zcollection/store/icechunk_store.py:158-168``).
        A crash before the intent leaves nothing visible; after it,
        ``repair_catalog`` rolls the insert forward.  Returns the written
        partition relpaths.
        """
        self._require_writable()
        df = self._conform(df)
        self._write_immutable(df)
        part_names = [v.name for v in self.schema.partitioned_variables
                      if v.name in df.columns]
        derived = self.partitioning.derive(df.select(*part_names))
        keys = list(self.partitioning.keys)
        incoming_keys = self.partitioning.enumerate_keys(derived)
        if not incoming_keys:
            return []
        incoming_rel = [self.partitioning.encode(key)
                        for key in incoming_keys]
        existing_rel = set(self.partitions())
        colliding = sorted(set(incoming_rel) & existing_rel)
        strategy = resolve_merge(merge)

        if not colliding or strategy is merge_replace:
            self._write(derived, mode="overwrite", txn=txn)
        elif strategy is merge_concat:
            # true append: never rewrites existing data; only the _row_idx
            # offsets of colliding partitions are read (a count per key)
            offsets = (self._read_partitions(colliding)
                       .groupBy(*keys)
                       .agg((F.max(ROW_IDX) + 1).alias("__offset")))
            win = (Window.partitionBy(*keys)
                   .orderBy(self._axis_order(derived)))
            appended = (derived
                        .join(F.broadcast(offsets), on=keys, how="left")
                        .withColumn("__offset",
                                    F.coalesce(F.col("__offset"), F.lit(0)))
                        .withColumn(ROW_IDX,
                                    F.row_number().over(win) - 1
                                    + F.col("__offset"))
                        .drop("__offset"))
            # the row_number window above already shuffled+sorted by keys;
            # append-publish moves the staged files into the existing
            # partition dirs (existing data is never rewritten)
            self._staged_write(
                lambda staging: self._write_tree(appended, staging),
                mode="append", txn=txn, stats_df=derived)
        else:
            existing = (self._read_partitions(colliding).drop(ROW_IDX))
            existing = self._cast_restored_keys(existing)
            merged = strategy(existing, derived, axis=self.axis,
                              keys=tuple(keys))
            self._write(merged, mode="overwrite", txn=txn)
        return sorted(incoming_rel)

    def txn_version(self, app_id: str) -> int:
        """Highest committed streaming-sink transaction version for
        ``app_id`` (-1 if none) — see ``Catalog.read_txn``."""
        return self._catalog.read_txn(app_id) \
            if self.catalog_enabled else -1

    def exclusive_writer(self, *, ttl: float = 60.0,
                         owner: str | None = None):
        """Advisory single-producer lease (context manager).

        ``with coll.exclusive_writer(): coll.insert(...)`` — a second
        cooperating writer gets :class:`LeaseHeldError` until release or
        TTL expiry; takeover of an expired lease is CAS-serialized so
        exactly one of N racers wins (collection/lease.py).  Opt-in: the
        protocol itself converges under concurrent writers, this is for
        pipelines that want exactly one producer."""
        from .lease import WriterLease
        self._require_writable()
        return WriterLease(self._fs, self.path, ttl=ttl, owner=owner)

    def generation(self) -> int:
        """Monotonic catalog commit counter (CAS-serialized).  Readers
        that must not observe a torn multi-writer state compare the
        generation before and after resolving their partition list;
        incremental consumers feed it to :meth:`changes`."""
        return self._catalog.generation() if self.catalog_enabled else 0

    def pin_generation(self, generation: int) -> list[int]:
        """Promise generation ``generation`` stays readable FOREVER:
        its catalog snapshot survives ``prune_history`` and every later
        republish/append/drop of one of its partitions copies the old
        content aside first (copy-on-republish into
        ``_catalog/retained/`` — the observable contract of the
        reference's icechunk transactional store, where a retained
        snapshot stays readable,
        ``/root/reference/zcollection/store/icechunk_store.py:98-282``).
        Storage cost is pay-per-divergence: nothing is copied until a
        pinned partition actually changes.  Raises if the generation is
        ALREADY unreconstructable (a pin cannot resurrect content that
        was overwritten before it existed).  Returns the pin list."""
        if not self.catalog_enabled:
            raise ValueError("pin_generation requires the catalog")
        # a pin of a stale generation would promise what we cannot
        # serve — verify reconstructability first (retained-aware)
        self._resolve_for_read(generation)
        return self._catalog.pin(generation)

    def unpin_generation(self, generation: int) -> list[int]:
        """Drop a pin and reclaim retained copies nothing else
        references.  Returns the remaining pin list."""
        if not self.catalog_enabled:
            raise ValueError("unpin_generation requires the catalog")
        pins = self._catalog.unpin(generation)
        self._catalog.sweep_retained()
        return pins

    def pinned_generations(self) -> list[int]:
        """Currently pinned generations, ascending."""
        return self._catalog.pins() if self.catalog_enabled else []

    def stale_partitions(self, generation: int) -> list[str]:
        """The gen-``generation`` partitions reconstructable from
        NEITHER the live store nor a retained copy — empty means
        ``query(at_generation=generation)`` succeeds in full; non-empty
        names exactly what a partial historical read would miss
        (filter them out with a key predicate instead of catching the
        ValueError)."""
        if not self.catalog_enabled:
            raise ValueError("stale_partitions requires the catalog")
        from .catalog import stale_partitions
        return stale_partitions(self._catalog, generation)

    def changes(self, since_generation: int,
                to_generation: int | None = None) -> dict:
        """Partition-level diff since a previous commit: ``{"added":
        [...], "removed": [...], "from": g0, "to": g1}``.

        The incremental-consumption primitive for downstream pipelines
        at scale: a consumer remembers the generation it last processed
        and asks only for partitions that changed — no full-collection
        rescan, no file-mtime heuristics.  ``added`` includes REPLACED
        partitions (any partition republished since ``since_generation``
        counts as new content); a diff against a pruned snapshot raises
        so consumers never silently treat everything as unchanged.

        ``to_generation`` (r10) bounds the diff at a RETAINED snapshot
        instead of the live document — the historical-window complement
        of ``at_generation`` reads: "what changed between the g0 and g1
        checkpoints" replays exactly, whatever has been committed
        since.  Both endpoints must still be retained (same pruned-
        snapshot contract)."""
        if not self.catalog_enabled:
            raise StoreError("changes() requires the catalog")
        if to_generation is None:
            current = self._catalog._read_doc() or {}
        else:
            current = self._catalog.read_at(int(to_generation))
            if current is None:
                raise StoreError(
                    f"generation {to_generation} is not available "
                    f"(pruned history?) — resync with a full scan")
        to_gen = int(current.get("generation", 0))
        since_generation = int(since_generation)
        if since_generation == to_gen:
            return {"added": [], "removed": [],
                    "from": since_generation, "to": to_gen}
        if to_generation is not None and since_generation > to_gen:
            # only for an EXPLICIT window: reversed endpoints are a
            # caller bug.  The open-ended form keeps its documented
            # contract — an unknown/future since_generation falls
            # through to the pruned-snapshot StoreError below ("resync
            # with a full scan"), which incremental consumers handle
            raise ValueError(
                f"since_generation {since_generation} is newer than "
                f"the diff target {to_gen}")
        base_doc = self._catalog.read_at(since_generation)
        if base_doc is None:
            raise StoreError(
                f"generation {since_generation} is not available "
                f"(pruned history?) — resync with a full scan")
        rows = catalog_diff(base_doc, current, since_generation)
        return {"added": [rel for _, rel, ch in rows if ch == "added"],
                "removed": [rel for _, rel, ch in rows
                            if ch == "removed"],
                "from": since_generation, "to": to_gen}

    def history(self, *, limit: int = 10) -> list[dict]:
        """The commit ledger, newest first: one row per catalog
        generation with what that commit did — ``{"generation", "n_partitions",
        "added" (incl. replaced), "removed", "txn"}``.

        Lakehouse-table ``DESCRIBE HISTORY`` semantics on the snapshot
        trail the catalog already writes: ``added`` comes from each
        document's per-partition ``touched`` stamps (exact, no
        neighbor snapshot needed), ``removed`` from the diff against
        the previous available snapshot (``None`` when that snapshot
        was pruned — unknown, never silently empty).  Driver-side
        metadata only: ``limit`` small documents, no Spark job."""
        if not self.catalog_enabled:
            raise StoreError("history() requires the catalog")
        if limit <= 0:  # [-0:] would return the WHOLE ledger
            raise ValueError("history(limit=...) must be >= 1")
        gens = set(self._catalog.history())
        current = self._catalog.generation()
        if current:  # newest snapshot PUT is best-effort; read_at
            gens.add(current)  # serves the live state regardless
        gens = sorted(gens)[-int(limit):]
        docs = {g: self._catalog.read_at(g) for g in gens}
        out = []
        for g in reversed(gens):
            doc = docs.get(g)
            if doc is None:
                continue
            stamps = doc.get("touched", {})
            parts = doc.get("partitions", [])
            added = sorted(rel for rel in parts
                           if int(stamps.get(rel, g)) == g)
            prev = docs.get(g - 1) if g - 1 in docs \
                else self._catalog.read_at(g - 1)
            removed = (sorted(set(prev.get("partitions", []))
                              - set(parts))
                       if prev is not None
                       else (None if g > 1 else []))
            out.append({"generation": g, "n_partitions": len(parts),
                        "added": added, "removed": removed,
                        "txn": dict(doc.get("txn", {}))})
        return out

    def nbytes(self, *, filters: str | None = None) -> int:
        """Catalyst's byte estimate of the (pruned, projected) query
        output — the lazy engine's honest analog of the reference's
        materialized ``Dataset.nbytes`` (``data/group.py:157-194``)."""
        from .. import xbridge
        df = self.query(filters=filters)
        return 0 if df is None else xbridge.dataset_nbytes(df)

    def to_xarray(self, *, filters: str | None = None,
                  variables: Iterable[str] | None = None):
        """Query → ``xarray.Dataset`` with the schema's dimensions
        (``data/dataset.py:205-300``); None when no partition matches
        (quirk Q6 parity).  Collects to the driver — bounded use only;
        requires the optional xarray dependency."""
        from .. import xbridge
        arrays = self.query_arrays(filters=filters, variables=variables)
        if arrays is None:
            return None
        return xbridge.arrays_to_xarray(arrays, self.schema)

    def query_arrays(self, *, filters: str | None = None,
                     variables: Iterable[str] | None = None
                     ) -> dict[str, Any] | None:
        """Reference-shaped result: ``{variable: numpy array}`` ordered
        along the axis — the ``Dataset``-like view reference users
        expect from ``query`` (``collection/base.py:524-595`` returns an
        array Dataset, not rows).  Collects to the driver; use the
        DataFrame-returning :meth:`query` for anything at scale."""
        df = self.query(filters=filters, variables=variables)
        if df is None:
            return None  # quirk Q6 parity
        pdf = df.toPandas()
        import numpy as np
        out: dict[str, Any] = {}
        for col in pdf.columns:
            series = pdf[col]
            if series.dtype == object and len(series) \
                    and isinstance(series.iloc[0], (list, tuple, np.ndarray)):
                out[col] = np.asarray([np.asarray(v) for v in series])
            else:
                out[col] = series.to_numpy()
        return out

    def add_variable(self, name: str, dtype: str, *,
                     dimensions=None, fill_value: Any = None,
                     attrs: Mapping[str, Any] | None = None) -> None:
        """Schema evolution: declare a new partitioned variable.

        Existing partitions are NOT rewritten — reads surface the
        declared ``fill_value`` for them (zarr missing-chunk semantics);
        subsequent inserts must supply the column.  The in-memory analog
        is the reference's ``Dataset.add_variable``
        (``data/group.py:334-381``); collection-level evolution is the
        100 TB version, where rewriting history is not an option.
        """
        from ..schema import VariableSchema as _VS
        self._require_writable()
        if name in self.schema.variable_map:
            raise SchemaError(f"variable {name!r} already exists")
        dimensions = tuple(dimensions) if dimensions else (self.axis,)
        new_var = _VS(name=name, dtype=dtype, dimensions=dimensions,
                      fill_value=fill_value, attrs=dict(attrs or {}))
        rebuilt = DatasetSchema(
            dimensions=self.schema.dimensions,
            variables=(*self.schema.variables, new_var),
            attrs=self.schema.attrs,
            group_attrs=self.schema.group_attrs,
        ).with_partition_axis(self.axis)
        doc = {"format_version": FORMAT_VERSION,
               "schema": rebuilt.to_json(),
               "partitioning": self.partitioning.to_json(),
               "catalog_enabled": self.catalog_enabled}
        # the rewrite must carry EVERY optional root-config field —
        # dropping one here silently disables its feature on the next
        # open (this bit zone maps/blooms before r12 caught it while
        # adding cluster_by)
        if self.stats_columns:
            doc["stats_columns"] = sorted(self.stats_columns)
        if self.bloom_columns:
            doc["bloom_columns"] = sorted(self.bloom_columns)
            doc["bloom_bits"] = int(self.bloom_bits)
        if self.cluster_by:
            doc["cluster_by"] = list(self.cluster_by)
            if self.cluster_mode != "range":
                doc["cluster_mode"] = self.cluster_mode
        self._fs.write_text(f"{self.path}/{CONFIG_NAME}",
                            json.dumps(doc, indent=1, sort_keys=True))
        self.schema = rebuilt

    def to_view(self, name: str, *,
                filters: str | None = None) -> DataFrame:
        """Register the collection (optionally pre-filtered) as a temp
        view so plain ``spark.sql`` works against it — partition pruning
        and column pruning still apply because the view is the same
        declarative plan ``query`` builds."""
        df = self.query(filters=filters)
        if df is None:
            df = self.spark.createDataFrame(
                [], self.schema.to_struct_type())
        df.createOrReplaceTempView(name)
        return df

    def compact(self, *, filters: str | None = None,
                min_files: int = 2) -> dict[str, int]:
        """Rewrite matching partitions into one file each (small-file
        compaction).

        Repeated ``concat``/streaming inserts leave a file per batch; at
        object-store scale the file count — not the byte count — starts
        to dominate open/list cost.  One hash shuffle on the partition
        keys lands every partition's rows in a single task, so dynamic
        partition overwrite rewrites each touched partition as ONE file.
        ``_row_idx`` is preserved verbatim (recomputing it could reorder
        concat-merged partitions and break views/index row ranges).

        ``min_files`` makes repeated maintenance runs cheap: partitions
        already at fewer files are skipped ENTIRELY — no read, no
        rewrite, no publish — so the cost of a scheduled compaction is
        proportional to the fragmentation, not the collection
        (``min_files=1`` forces a full rewrite).

        Returns ``{partition_relpath: files_before}`` for the rewritten
        partitions.  No vanilla-Spark analog in the reference; the
        closest intent is its shard-size targeting
        (``codecs/sharding.py:32-159``).
        """
        self._require_writable()
        matching = self.partitions(filters=filters)
        if not matching:
            return {}

        def count_files(rel: str) -> tuple[str, int]:
            return rel, sum(
                1 for f in self._fs.list_files(f"{self.path}/{rel}")
                if f.endswith(".parquet"))

        # one LIST per partition — pooled like the publish path
        counts = dict(self._pooled_map(count_files, matching))
        before = {rel: n for rel, n in counts.items()
                  if n >= max(min_files, 1)}
        matching = sorted(before)
        if not matching:
            return {}
        keys = list(self.partitioning.keys)
        df = self._cast_restored_keys(self._read_partitions(matching))
        # staged swap: the rewrite job reads the live partition files while
        # writing into _staging, then renames — readers never observe a
        # partition mid-rewrite
        compacted = self._apply_cluster_sort(
            df.repartition(*[F.col(k) for k in keys]), keys)
        self._staged_write(
            lambda staging: self._spark_parquet_write(
                staging,
                lambda t: (compacted
                           .write.mode("overwrite").partitionBy(*keys)
                           .options(**engine_config.profile()
                                    .writer_options())
                           .parquet(t))),
            mode="swap", stats_df=df)  # content unchanged: re-derive
        return before

    def _pooled_map(self, fn, items: list):
        """Map ``fn`` over ``items`` on the maintenance thread pool
        (staging_proto.PUBLISH_POOL parity): object-store metadata
        round-trips are independent, so sequential loops would cost
        O(items) latency.  Returns results in item order."""
        if len(items) <= 1:
            return [fn(it) for it in items]
        with ThreadPoolExecutor(
                max_workers=min(staging_proto.PUBLISH_POOL,
                                len(items))) as pool:
            return list(pool.map(fn, items))

    def write_manifest(self) -> dict[str, list[str]]:
        """Publish the file manifest (``_catalog/files.json``): every
        partition's data files plus ``_immutable``, one small PUT.

        This is what makes a collection servable from a LIST-less
        read-only store (plain HTTP/CDN — ``fs.HttpFS``): the consumer
        GETs the manifest instead of listing, then mirrors exactly the
        named files.  Run it as the last step of publishing a dataset
        (file walks are pooled like the publish path).  Returns the
        manifest mapping."""
        self._require_writable()
        for attempt in range(3):
            manifest, stable = self._write_manifest_once()
            if stable:
                return manifest
        raise StoreError(
            "collection kept changing while write_manifest was "
            "publishing — retry after concurrent writers settle")

    def _write_manifest_once(self) -> tuple[dict[str, list[str]], bool]:
        # generation read BEFORE the listing: a concurrent insert
        # between listing and stamping would otherwise publish a
        # manifest carrying the NEW generation over a STALE file list —
        # passing the HttpFS staleness guard while naming deleted
        # files (the silent-empty-partition case the guard exists for)
        gen = self._catalog.generation() if self.catalog_enabled else 0
        rels = self.partitions()

        def files_of(rel: str) -> tuple[str, list[str]]:
            return rel, sorted(
                f for f in self._fs.list_files(f"{self.path}/{rel}")
                if not f.startswith((".", "_")))

        manifest = dict(self._pooled_map(files_of, rels))
        if self._fs.exists(f"{self.path}/{IMMUTABLE_RELPATH}"):
            # _immutable/data.parquet is a Spark-written parquet
            # DIRECTORY: the manifest key must be the relpath the read
            # path localizes (IMMUTABLE_RELPATH) and list the part
            # files INSIDE it — publishing it as a single file would
            # silently drop immutable variables over HTTP.  Same
            # dotfile/underscore filter as partitions (_SUCCESS et al.
            # are markers, not data).
            manifest[IMMUTABLE_RELPATH] = sorted(
                f for f in self._fs.list_files(
                    f"{self.path}/{IMMUTABLE_RELPATH}")
                if not f.startswith((".", "_")))
        # format_version 2: immutable entries key the full relpath and
        # list the parquet part files (v1 published the directory as a
        # single file; HttpFS refuses v1 manifests with an _immutable
        # entry rather than silently dropping those variables)
        self._fs.write_text(
            f"{self.path}/{fsmod.HTTP_MANIFEST_RELPATH}",
            json.dumps({"format_version": 2, "generation": gen,
                        "files": manifest}, indent=1, sort_keys=True))
        # generation re-checked AFTER the PUT: a commit landing between
        # the pre-listing read and the PUT would otherwise leave a
        # published manifest whose file list/generation are stale (the
        # HttpFS.localize guard turns that into a consumer-side hard
        # error; rewriting here keeps that guard defense-in-depth, not
        # the primary mechanism).  Caller retries the whole
        # list-stamp-put cycle when unstable.
        if self.catalog_enabled and self._catalog.generation() != gen:
            return manifest, False
        return manifest, True

    def drop_partitions(self, *, filters: str | None = None) -> list[str]:
        """Delete matching partitions — ALL when ``filters=None``
        (``base.py:599-634``; ≈ ALTER TABLE DROP PARTITION)."""
        self._require_writable()
        doomed = self.partitions(filters=filters)
        if self.catalog_enabled:
            # pinned generations keep their content past the drop
            self._catalog.retain_for_pins(doomed)
        self._pooled_map(
            lambda rel: self._fs.delete(f"{self.path}/{rel}"), doomed)
        if self.catalog_enabled:
            self._catalog.remove(doomed)
        return doomed

    # ------------------------------------------------------------------
    # per-partition UDF surface (collection/base.py:638-794)
    # ------------------------------------------------------------------
    def map(self, fn: Callable, schema: T.StructType | str, *,
            filters: str | None = None,
            variables: Iterable[str] | None = None,
            keep_internal: bool = False) -> DataFrame | None:
        """Apply ``fn(pandas.DataFrame) -> pandas.DataFrame`` to each
        partition (``base.py:638-696``).

        The reference collects ``{path: result}`` on the driver; here the
        result STAYS distributed (one ``applyInPandas`` over the partition
        grouping — the shuffle IS the partition grouping).  Use
        :meth:`map_collect` for the reference's driver-side dict shape.
        Immutable variables are attached before ``fn`` runs (quirk-parity
        with ``_attach_immutable``).
        """
        df = self._load(filters=filters, keep_internal=keep_internal)
        if df is None:
            return None
        wanted = set(variables) if variables is not None else None
        if wanted is not None:
            keep = [c for c in df.columns
                    if c in wanted or c in self.partitioning.keys
                    or (keep_internal and c == ROW_IDX)]
            df = df.select(*keep)
        df = self._attach_immutable(df, wanted)
        return df.groupBy(*self.partitioning.keys).applyInPandas(fn, schema)

    def map_collect(self, fn: Callable, schema: T.StructType | str, *,
                    filters: str | None = None,
                    variables: Iterable[str] | None = None
                    ) -> dict[str, Any]:
        """Driver-side ``{partition_relpath: pandas.DataFrame}`` — the
        reference's ``map`` return shape (``base.py:638-665``)."""
        result = self.map(fn, schema, filters=filters, variables=variables)
        if result is None:
            return {}
        keys = list(self.partitioning.keys)
        out: dict[str, Any] = {}
        pdf = result.toPandas()
        missing = [k for k in keys if k not in pdf.columns]
        if missing:
            raise SchemaError(
                f"map fn output must retain partition keys {missing} for "
                f"map_collect")
        for key_vals, group in pdf.groupby(keys, sort=True):
            if not isinstance(key_vals, tuple):
                key_vals = (key_vals,)
            rel = self.partitioning.encode(
                dict(zip(keys, (int(v) for v in key_vals))))
            out[rel] = group.reset_index(drop=True)
        return out

    def update(self, fn: Callable, *, filters: str | None = None,
               variables: Iterable[str] | None = None,
               allow_variable_drop: bool = False) -> list[str]:
        """Read → ``fn`` → rewrite matching partitions wholesale
        (``base.py:698-794``).

        ``fn(pandas.DataFrame) -> pandas.DataFrame`` must return the
        partitioning source columns plus (by default) every partitioned
        variable.  Quirk Q4 (silently dropping unreturned variables) is
        tightened into an error unless ``allow_variable_drop=True``.
        Executed as one ``applyInPandas`` + dynamic partition overwrite —
        only matching partitions are rewritten.
        """
        self._require_writable()
        df = self._load(filters=filters)
        if df is None:
            return []
        relpaths = self.partitions(filters=filters)
        wanted = set(variables) if variables is not None else None
        if wanted is not None:
            keep = [c for c in df.columns
                    if c in wanted or c in self.partitioning.keys
                    or c in self.partitioning.variables]
            df = df.select(*keep)
        df = self._attach_immutable(df, wanted)

        sample = fn(df.limit(0).toPandas())
        out_cols = list(sample.columns)
        var_map = self.schema.variable_map
        dims = self.schema.dim_map
        missing = [v.name for v in self.schema.partitioned_variables
                   if v.name not in out_cols]
        if missing and not allow_variable_drop:
            raise SchemaError(
                f"update fn dropped partitioned variables {missing}; the "
                f"reference rewrites partitions wholesale (quirk Q4) — pass "
                f"allow_variable_drop=True to accept that")
        for src in self.partitioning.variables:
            if src not in out_cols:
                raise SchemaError(
                    f"update fn must retain partitioning column {src!r}")
        out_fields = []
        for name in out_cols:
            if name in var_map:
                out_fields.append(T.StructField(
                    name, var_map[name].spark_type(dims, self.axis)))
            else:
                raise SchemaError(
                    f"update fn produced unknown variable {name!r}")
        out_schema = T.StructType(out_fields)
        updated = (df.groupBy(*self.partitioning.keys)
                   .applyInPandas(lambda pdf: fn(pdf), out_schema))
        derived = self.partitioning.derive(updated)
        self._write(derived, mode="overwrite")
        return relpaths

    # ------------------------------------------------------------------
    def __repr__(self) -> str:
        """xarray-style tree repr (the reference Dataset display role,
        ``data/dataset.py:205-300``) headed by the store coordinates."""
        from .. import xbridge
        # one catalog GET at most — never the recursive walk fallback
        # (repr runs in logs/debuggers; a store walk there is a trap)
        n_parts = None
        if self.catalog_enabled:
            try:
                relpaths = self._catalog.read()
                n_parts = None if relpaths is None else len(relpaths)
            except Exception:
                n_parts = None
        tree = xbridge.tree_repr(self.schema, name="Collection",
                                 n_partitions=n_parts)
        head, _, rest = tree.partition("\n")
        return (f"{head}\n  Path: {self.path}  (axis={self.axis!r}, "
                f"mode={self.mode!r})\n{rest}")
