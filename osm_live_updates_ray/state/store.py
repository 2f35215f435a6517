"""Parquet state store — the engine's analog of the reference's SPARQL
endpoint (reference ST1: all state lookups in olu are batched VALUES
semi-join queries against QLever, src/osm/OsmDataFetcherQLever.cpp).

Layout (one directory per table, hash-partitioned):

    root/
      manifest.json                  # generation, partition file map, counters
      nodes/part-XXXX-gN.parquet     # by hash(id)
      ways/...                       # by hash(id)  (node_ids list = forward edges)
      relations/...                  # by hash(id)
      way_members_by_node/...        # by hash(node_id)   (reverse edges, J2)
      rel_members_by_member/...      # by hash(member_id) (reverse edges, J3)
      pages/part-XXXX-gN.parquet     # by hash(cell_id)
      assignments/...                # by hash(cell_id)

Design for scale:
  * every lookup is "broadcast the SMALL delta-side id set, scan only
    the partitions that can contain those ids" — partition pruning via
    the id hash, then row-group pruning via min/max stats (tables are
    sorted by key within partitions).
  * updates are COPY-ON-WRITE: only partitions containing affected
    keys are rewritten (new generation suffix), then the manifest is
    swapped atomically (tmp + rename).  A killed run never corrupts
    state; resume re-reads the last committed manifest.
  * lineage: every commit appends a JSONL record (per-partition input
    fingerprint, row counts, wall time) to ``lineage.log``.

In local/sandbox mode lookups use threaded pyarrow.dataset scans (the
result of every lookup is delta-sized); at cluster scale the same
filter expressions run as ``ray.data.read_parquet(filter=...)`` scans
— ``use_ray_reads`` toggles, semantics identical.

Every byte of state moves through the :mod:`.fsio` filesystem seam
(``StateStore(root, filesystem=...)``): local disk by default,
shared storage (S3/GCS/HDFS/subtree) for multi-node deployments —
actors receive the (picklable) filesystem with their file lists.
Commit protocol per filesystem class is documented in ``fsio``.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.hashing import hash_int64
from .fsio import LOCK_TTL_SEC, StoreFS
from ..schemas import (
    OSM_NODES,
    OSM_RELATIONS,
    OSM_WAYS,
    PAGE_TILE_ASSIGNMENTS,
    PAGES_GEO,
    REL_MEMBERS,
    WAY_MEMBERS,
)

#: packed geometry-table key: (type_code << 58) | id
GEOM_TYPE_CODE = {"node": 0, "way": 1, "relation": 2}


def pack_gid(otype, ids: np.ndarray) -> np.ndarray:
    codes = (
        np.asarray([GEOM_TYPE_CODE[t] for t in otype], dtype=np.int64)
        if not isinstance(otype, str)
        else np.full(len(ids), GEOM_TYPE_CODE[otype], dtype=np.int64)
    )
    return (codes << np.int64(58)) | np.asarray(ids, dtype=np.int64)


def _geoms_stored_schema():
    from ..schemas import GEOMS

    return GEOMS.append(pa.field("gid", pa.int64()))


def _polygon_rings_schema():
    from ..stages.geometry import POLYGON_RINGS

    return POLYGON_RINGS


def _schema_of(name: str) -> pa.Schema:
    if name == "assignments":
        from ..schemas import ASSIGNMENTS_STATE

        return ASSIGNMENTS_STATE
    if name == "geoms":
        return _geoms_stored_schema()
    if name == "polygon_rings":
        return _polygon_rings_schema()
    if name == "rollups":
        from ..stages.tiles import TILE_ROLLUP

        return TILE_ROLLUP
    if name == "cell_summaries":
        from ..stages.tiles import CELL_SUMMARY

        return CELL_SUMMARY
    return _TABLE_SCHEMAS[name]


# Tables where the key is a PRIMARY key (exactly one live row per id).
# A lookup returning duplicate keys from one of these means the store is
# corrupt — the engine analog of the reference erroring when the
# endpoint returns more rows than requested ids
# (src/osm/OsmDataFetcherQLever.cpp:126-129, 161-166).
_UNIQUE_KEYED = {"nodes", "ways", "relations", "geoms"}

_TABLE_KEYS = {
    "nodes": "id",
    "ways": "id",
    "relations": "id",
    "way_members_by_node": "node_id",
    "rel_members_by_member": "member_id",
    "pages": "cell_id",
    "assignments": "cell_id",
    "geoms": "gid",
    "polygon_rings": "polygon_id",
    "cell_summaries": "cell_id",
}

_TABLE_SCHEMAS = {
    "nodes": OSM_NODES,
    "ways": OSM_WAYS,
    "relations": OSM_RELATIONS,
    "way_members_by_node": WAY_MEMBERS,
    "rel_members_by_member": REL_MEMBERS,
    "pages": PAGES_GEO,
    "assignments": PAGE_TILE_ASSIGNMENTS,
}


def _part_of(keys: np.ndarray, n_parts: int) -> np.ndarray:
    return (hash_int64(keys).view(np.uint64) % np.uint64(n_parts)).astype(np.int64)


def _hostname() -> str:
    import socket

    return socket.gethostname()


def explode_way_members(ways: pa.Table) -> pa.Table:
    """ways(node_ids list) -> (way_id, node_id, pos) edge rows."""
    node_ids = ways.column("node_ids").combine_chunks()
    flat_parent = pc.list_parent_indices(node_ids)
    flat = pc.list_flatten(node_ids)
    way_id = pc.take(ways.column("id"), flat_parent)
    # position within the list
    offsets_len = pc.list_value_length(node_ids).to_numpy(zero_copy_only=False)
    pos = np.concatenate(
        [np.arange(n, dtype=np.int32) for n in offsets_len] or
        [np.empty(0, dtype=np.int32)]
    )
    return pa.Table.from_arrays(
        [way_id.combine_chunks(), flat, pa.array(pos, type=pa.int32())],
        schema=WAY_MEMBERS,
    )


def explode_rel_members(rels: pa.Table) -> pa.Table:
    """relations(members list<struct>) -> REL_MEMBERS edge rows."""
    members = rels.column("members").combine_chunks()
    flat_parent = pc.list_parent_indices(members)
    flat = pc.list_flatten(members)
    rel_id = pc.take(rels.column("id"), flat_parent)
    lens = pc.list_value_length(members).to_numpy(zero_copy_only=False)
    pos = np.concatenate(
        [np.arange(n, dtype=np.int32) for n in lens] or [np.empty(0, dtype=np.int32)]
    )
    return pa.Table.from_arrays(
        [
            rel_id.combine_chunks(),
            flat.field("type"),
            flat.field("ref"),
            flat.field("role"),
            pa.array(pos, type=pa.int32()),
        ],
        schema=REL_MEMBERS,
    )


# bump when the on-disk layout changes incompatibly; opening a store
# written by a NEWER engine aborts (the reference's store/tool version
# check, src/osm/OsmUpdater.cpp:93, 336-353)
SCHEMA_VERSION = 3  # 3: geoms gained the option-gated obb_wkt column

# option set persisted at bootstrap and re-discovered on open — which
# derived columns exist is a property of the STORE, not of the run's
# config (reference ST2: fetchOsm2RdfOptions,
# src/osm/OsmDataFetcherQLever.cpp:395-411; consulted at every delete
# decision, src/osm/Osm2ttl.cpp:115-121)
_PERSISTED_OPTIONS = (
    "with_centroid", "with_envelope", "with_convex_hull", "with_obb",
    "with_length", "with_area", "wkt_precision", "cell_res_deg",
    "tile_res_deg", "id_partitions", "cell_partitions",
)


class StateStore:
    """Hash-partitioned Parquet state with COW commits + lineage.

    ``filesystem`` is the multi-node seam (see :mod:`.fsio`): pass a
    ``pyarrow.fs.FileSystem`` to put the whole state tree on shared
    storage; the default ``LocalFileSystem`` preserves the single-node
    behavior byte-for-byte.  ``root`` is a path within that
    filesystem."""

    def __init__(self, root: str, config: EngineConfig | None = None,
                 filesystem=None):
        self.root = root
        self.config = config or DEFAULT_CONFIG
        self.io = StoreFS(filesystem)
        self._manifest = self._read_manifest()
        sv = self._manifest.get("schema_version")
        if sv is not None and sv > SCHEMA_VERSION:
            raise RuntimeError(
                f"state store at {root} was written by a newer engine "
                f"(schema_version {sv} > {SCHEMA_VERSION}); refusing to open"
            )
        self._gc()

    @property
    def options(self) -> dict | None:
        """The option set the store was BUILT with (None on legacy
        stores that predate option persistence)."""
        return self._manifest.get("options")

    def discovered_config(self, cfg: EngineConfig) -> EngineConfig:
        """Config with the store's persisted options overriding the
        run's — deletes/recomputes must match exactly what was
        materialized, regardless of what the caller passed (a store
        built without centroids must never write or delete centroid
        columns on delta)."""
        opts = self.options
        if not opts:
            return cfg
        import dataclasses

        known = {k: v for k, v in opts.items() if k in _PERSISTED_OPTIONS}
        return dataclasses.replace(cfg, **known)

    # -- writer lock -------------------------------------------------------
    # The store is SINGLE-WRITER: begin() takes a lock, commit()
    # releases it, and _gc() skips while a LIVE foreign writer holds it
    # — otherwise an opener would delete the writer's uncommitted
    # new-generation files mid-flight.  The lock records {host, pid,
    # ts}: a SAME-HOST foreign pid is probed exactly (kill -0, as
    # before); a lock from ANOTHER host cannot be probed and is honored
    # until fsio.LOCK_TTL_SEC passes — a crashed remote writer expires
    # instead of wedging the store, a live one is never raced within
    # the TTL.  Legacy bare-pid lock files still parse.
    def _lock_path(self) -> str:
        return self.io.join(self.root, ".writer.lock")

    def _read_lock(self) -> dict | None:
        try:
            raw = self.io.read_text(self._lock_path()).strip()
        except (FileNotFoundError, OSError):
            return None
        if not raw:
            return None
        try:
            rec = json.loads(raw)
            if isinstance(rec, dict):
                return rec
        except json.JSONDecodeError:
            pass
        try:  # legacy format: bare pid, implicitly this host
            return {"pid": int(raw), "host": _hostname(), "ts": time.time()}
        except ValueError:
            return None

    def _live_foreign_writer(self) -> bool:
        rec = self._read_lock()
        if rec is None:
            return False
        pid = int(rec.get("pid", 0))
        host = rec.get("host", "")
        if host == _hostname():
            if pid == os.getpid():
                return False
            try:
                os.kill(pid, 0)
                return True
            except ProcessLookupError:
                return False
            except PermissionError:
                return True  # exists under another uid
        # cross-host: honor until the TTL expires
        return (time.time() - float(rec.get("ts", 0))) < LOCK_TTL_SEC

    def _gc(self) -> None:
        """Remove tile-table files superseded by the manifest (COW
        leftovers from completed or CRASHED replacements).  Runs at
        open so directory scans equal the committed manifest — this is
        what makes a killed run resumable without corruption.  Skipped
        while another live process holds the writer lock."""
        if self._live_foreign_writer():
            return
        io = self.io
        # crashed streaming-COW runs leave unreferenced staging dirs
        stag = io.join(self.root, "_staging")
        if io.isdir(stag):
            for d in io.listdir(stag):
                if d.startswith("rejoin-"):
                    io.rmtree(io.join(stag, d))
        for key, entry in self._manifest.get("tables", {}).items():
            if not key.startswith("tile:"):
                # hash-partitioned table: drop generation leftovers
                base = io.join(self.root, key)
                if io.isdir(base):
                    keep = set(entry.values())
                    for f in io.listdir(base):
                        if f.startswith("part-") and f not in keep:
                            io.remove(io.join(base, f))
                continue
            name = key.split(":", 1)[1]
            base = io.join(self.root, name)
            if not io.isdir(base):
                continue
            for d in io.listdir(base):
                if not d.startswith("tile_id="):
                    continue
                tid = d.split("=", 1)[1]
                keep = set(entry.get(tid, []))
                dpath = io.join(base, d)
                for f in io.listdir(dpath):
                    if f not in keep:
                        io.remove(io.join(dpath, f))

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return self.io.join(self.root, "manifest.json")

    def _read_manifest(self) -> dict:
        p = self._manifest_path()
        if self.io.exists(p):
            return self.io.read_json(p)
        return {"generation": 0, "tables": {}, "watermark": None}

    def _commit_manifest(self, lineage: list[dict]) -> None:
        self._manifest["generation"] += 1
        # tmp + replace = atomic rename on local/HDFS; on object stores
        # the single-writer contract covers the copy+delete window (see
        # fsio module docstring, commit-protocol note)
        self.io.write_json_atomic(self._manifest_path(), self._manifest,
                                  indent=1)
        lines = []
        for rec in lineage:
            rec["generation"] = self._manifest["generation"]
            rec["committed_at"] = time.time()
            lines.append(json.dumps(rec))
        if lines:
            self.io.append_lines(self.io.join(self.root, "lineage.log"),
                                 lines)

    @property
    def watermark(self):
        """(seq, ts) analog of OsmDatabaseState / updatesCompleteUntil
        (reference: src/osm/OsmUpdater.cpp:356-399)."""
        return self._manifest.get("watermark")

    def set_watermark(self, seq: int, ts: str, source: str | None = None) -> None:
        """Advance-only, like the reference's updatesCompleteUntil —
        replaying an older window must never move the watermark back
        (ordered by timestamp, OsmDatabaseState.h:40-45).  ``source``
        records the replication source URI (the reference's
        replicationServer metadata triple): resume only trusts the
        sequence number when the source matches."""
        cur = self._manifest.get("watermark")
        if cur is not None and (cur["ts"], cur["seq"]) >= (ts, seq):
            return
        wm = {"seq": seq, "ts": ts}
        if source is not None:
            wm["source"] = source
        elif cur is not None and "source" in cur:
            wm["source"] = cur["source"]
        self._manifest["watermark"] = wm

    def latest_object_timestamp(self) -> str | None:
        """MAX object timestamp across nodes/ways/relations (A1, the
        reference's fetchLatestTimestamp fallback) — from parquet
        row-group statistics, no data read."""
        best = None
        for name in ("nodes", "ways", "relations"):
            for f in self._files(name):
                md = self.io.read_metadata(f)
                try:
                    ti = md.schema.names.index("ts")
                except ValueError:
                    continue
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(ti)
                    stats = col.statistics
                    if stats is not None and stats.has_min_max:
                        mx = stats.max
                        if best is None or mx > best:
                            best = mx
        if best is None:
            return None
        return best.strftime("%Y-%m-%dT%H:%M:%S")

    # -- build -------------------------------------------------------------
    @classmethod
    def build(
        cls,
        root: str,
        *,
        nodes: pa.Table | None = None,
        ways: pa.Table | None = None,
        relations: pa.Table | None = None,
        pages: pa.Table | None = None,
        assignments: pa.Table | None = None,
        config: EngineConfig | None = None,
        filesystem=None,
    ) -> "StateStore":
        """Bootstrap a store from in-memory tables (test scale) — edge
        tables derived from the ways/relations lists.  At data scale the
        same layout is produced by ``pipelines.static_join`` writing
        with Ray Data."""
        store = cls(root, config, filesystem=filesystem)
        store.io.makedirs(root)
        lineage: list[dict] = []
        ways = ways if ways is not None else OSM_WAYS.empty_table()
        relations = relations if relations is not None else OSM_RELATIONS.empty_table()
        tables = {
            "nodes": nodes if nodes is not None else OSM_NODES.empty_table(),
            "ways": ways,
            "relations": relations,
            "way_members_by_node": explode_way_members(ways),
            "rel_members_by_member": explode_rel_members(relations),
        }
        if pages is not None:
            tables["pages"] = pages
        if assignments is not None:
            tables["assignments"] = assignments
        for name, table in tables.items():
            store._write_table_partitions(name, table, lineage)
        store._manifest["schema_version"] = SCHEMA_VERSION
        store._manifest["options"] = {
            k: getattr(store.config, k) for k in _PERSISTED_OPTIONS
        }
        store._commit_manifest(lineage)
        return store

    def _n_parts(self, name: str) -> int:
        if name in ("pages", "assignments"):
            return self.config.cell_partitions
        if name == "cell_summaries":
            # per-cell prune index: one row per cell — tiny next to the
            # page tables; few partitions keep whole-table reads cheap
            return 4
        return self.config.id_partitions

    def _write_table_partitions(
        self, name: str, table: pa.Table, lineage: list[dict]
    ) -> None:
        """Full (re)write of a table, hash-partitioned by its key."""
        key = _TABLE_KEYS[name]
        n_parts = self._n_parts(name)
        self.io.makedirs(self.io.join(self.root, name))
        keys = table.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        parts = _part_of(keys, n_parts)
        gen = self._manifest["generation"] + 1
        entry: dict[str, str] = {}
        for p in range(n_parts):
            sub = table.filter(pa.array(parts == p))
            sub = sub.sort_by(key)  # row-group stats pruning on lookups
            fname = f"part-{p:04d}-g{gen}.parquet"
            self.io.write_table(sub, self.io.join(self.root, name, fname))
            entry[str(p)] = fname
            lineage.append(
                {"table": name, "partition": p, "file": fname, "rows": sub.num_rows,
                 "op": "build"}
            )
        self._manifest["tables"][name] = entry
        if name in self._HOT_TABLES and self._hot_tables:
            # a full rewrite bypasses the COW hot-cache maintenance —
            # drop the entry so a pre-commit read can't see stale rows
            self._hot_tables.pop(name, None)

    # -- reads -------------------------------------------------------------
    def _files(self, name: str) -> list[str]:
        entry = self._manifest["tables"].get(name, {})
        return [self.io.join(self.root, name, f) for f in entry.values()]

    def _files_for_keys(self, name: str, keys: np.ndarray) -> list[str]:
        entry = self._manifest["tables"].get(name, {})
        wanted = np.unique(_part_of(keys, self._n_parts(name)))
        return [
            self.io.join(self.root, name, entry[str(p)])
            for p in wanted.tolist()
            if str(p) in entry
        ]

    def dataset(self, name: str, columns: list[str] | None = None):
        """Full table as a Ray Dataset (streaming; for wide scans)."""
        import ray.data as rd

        files = self._files(name)
        if not files:
            return rd.from_arrow(_schema_of(name).empty_table())
        return rd.read_parquet(files, columns=columns,
                               filesystem=self.io.fs)

    def lookup(
        self,
        name: str,
        ids: np.ndarray,
        columns: list[str] | None = None,
        key: str | None = None,
        use_ray_reads: bool = False,
    ) -> pa.Table:
        """Semi-join: rows of ``name`` whose key is in ``ids``.

        The engine analog of the reference's chunked VALUES queries
        (BatchHelper::doInBatches, include/util/BatchHelper.h:33-46).
        Partition pruning by key hash + row-group pruning by stats;
        result is delta-sized.  Missing ids simply yield no rows
        (regional-extract tolerance, reference
        src/osm/OsmChangeHandler.cpp:340-343).

        ``use_ray_reads=True`` runs the SAME filter expression as a
        distributed ``ray.data.read_parquet(filter=...)`` scan instead
        of the local threaded pyarrow.dataset scan — the cluster-scale
        shape when the pruned partition set is itself large (many
        nodes each scan their share); semantics identical
        (equality-pinned by pytest).
        """
        key = key or _TABLE_KEYS[name]
        ids = np.asarray(ids, dtype=np.int64)
        schema = _schema_of(name)
        if len(ids) == 0:
            t = schema.empty_table()
            return t.select(columns) if columns else t
        files = self._files_for_keys(name, ids)
        if not files:
            t = schema.empty_table()
            return t.select(columns) if columns else t
        # For primary-keyed tables, scan the key even when the caller
        # didn't ask for it so duplicate rows can be detected (see
        # _UNIQUE_KEYED); delta-sized results make the extra column cheap.
        guard = name in _UNIQUE_KEYED and key == _TABLE_KEYS[name]
        scan_columns = columns
        if guard and columns is not None and key not in columns:
            scan_columns = list(columns) + [key]
        out = []
        bs = self.config.batch_size
        if use_ray_reads:
            import ray.data as rd

            for s in range(0, len(ids), bs):
                chunk = ids[s : s + bs]
                ds = rd.read_parquet(
                    files,
                    columns=scan_columns,
                    filter=pads.field(key).isin(pa.array(chunk)),
                    filesystem=self.io.fs,
                )
                out.extend(
                    b for b in ds.iter_batches(batch_format="pyarrow")
                    if b.num_rows
                )
            want = _schema_of(name).empty_table()
            if scan_columns:
                want = want.select(scan_columns)
            result = (pa.concat_tables(out).select(want.column_names)
                      .cast(want.schema) if out else want)
        else:
            dset = self.io.parquet_dataset(files)
            for s in range(0, len(ids), bs):
                chunk = ids[s : s + bs]
                out.append(
                    dset.to_table(
                        columns=scan_columns,
                        filter=pads.field(key).isin(pa.array(chunk)),
                    )
                )
            result = pa.concat_tables(out)
        if guard and result.num_rows:
            keys = result.column(key).to_numpy(zero_copy_only=False)
            n_unique = len(np.unique(keys))
            if n_unique != result.num_rows:
                raise RuntimeError(
                    f"state table '{name}' returned {result.num_rows} rows "
                    f"for {n_unique} distinct {key}s — duplicate live rows "
                    "mean a corrupt store (reference hard-errors when the "
                    "endpoint returns more rows than requested, "
                    "src/osm/OsmDataFetcherQLever.cpp:126-129)"
                )
        if scan_columns is not columns and columns is not None:
            result = result.select(columns)
        return result

    def count(self, name: str) -> int:
        return sum(self.io.read_metadata(f).num_rows for f in self._files(name))

    def read_all(self, name: str, columns: list[str] | None = None) -> pa.Table:
        """Whole table in memory — ONLY for broadcast-sized layers
        (polygon rings, kNN node arrays) and tests."""
        files = self._files(name)
        schema = _schema_of(name)
        if not files:
            t = schema.empty_table()
            return t.select(columns) if columns else t
        return pa.concat_tables(
            [self.io.read_table(f, columns=columns) for f in files]
        ).cast(schema.empty_table().select(columns).schema if columns else schema)

    # -- hot-table cache -----------------------------------------------------
    # Small driver-consulted tables that every window re-reads (the
    # per-cell kNN-bound prune index) are cached across windows and
    # COW-updated in memory alongside the on-disk partition rewrite —
    # same generation-keyed validity discipline as the layer indexes.
    _HOT_TABLES = ("cell_summaries",)
    _hot_tables: dict | None = None

    def read_all_hot(self, name: str) -> pa.Table:
        """read_all with a generation-keyed in-memory cache (whitelisted
        tables only); falls through to read_all otherwise."""
        if name not in self._HOT_TABLES:
            return self.read_all(name)
        gen = self._manifest["generation"]
        c = (self._hot_tables or {}).get(name)
        if c is not None and c["gen"] == gen:
            return c["table"]
        t = self.read_all(name)
        if self._hot_tables is None:
            self._hot_tables = {}
        self._hot_tables[name] = {"gen": gen, "table": t}
        return t

    def _update_hot_table(self, name: str, key: str, upserts: pa.Table,
                          drop_set: pa.Array) -> None:
        """COW-maintain the in-memory hot copy alongside a partition
        rewrite.  Invariant (ADVICE r3): the gen+1 stamp assumes ONE
        apply per _HOT_TABLES member per commit — a second apply within
        the same pending generation hits the gen-mismatch guard below
        and conservatively DROPS the cache (correct, never stale), and
        full rewrites (_write_table_partitions) drop it explicitly."""
        c = (self._hot_tables or {}).get(name)
        if c is None:
            return
        if c["gen"] != self._manifest["generation"]:
            self._hot_tables.pop(name, None)  # stale — drop
            return
        schema = _schema_of(name)
        keep = pc.invert(pc.is_in(c["table"].column(key), value_set=drop_set))
        c["table"] = pa.concat_tables(
            [c["table"].filter(keep).cast(schema), upserts.cast(schema)]
        ).combine_chunks()
        c["gen"] = self._manifest["generation"] + 1

    # -- cross-window live join-layer indexes -------------------------------
    # The reference never re-derives its state per change file — its
    # "index" is the endpoint, mutated in place.  Per-window
    # PolygonIndex/GridNodeIndex rebuilds are O(layer); these cached
    # live indexes make the per-window cost O(delta) (stages/liveindex).
    # Validity is keyed on the manifest GENERATION: the cache is only
    # trusted when its generation matches exactly, so any commit that
    # bypassed update_layer_indexes (bootstrap, direct table writes,
    # a crashed window) naturally invalidates it, and a fresh process
    # (kill-and-resume) rebuilds from the store.
    _layer_cache: dict | None = None

    def layer_indexes(self, cfg, pending: bool = False):
        """(LivePolygonIndex, LiveNodeIndex, built_fresh).  ``pending``
        = the caller sits between this window's state mutation and its
        commit, so the valid generation is generation+1 (what
        update_layer_indexes stamped)."""
        from ..stages.liveindex import build_live_indexes

        gen = self._manifest["generation"] + (1 if pending else 0)
        c = self._layer_cache
        if (
            c is not None
            and c["gen"] == gen
            and c["res"] == cfg.cell_res_deg
        ):
            return c["poly"], c["node"], False
        rings = self.read_all("polygon_rings")
        nodes = self.read_all("nodes", columns=["id", "lon", "lat"])
        poly, node = build_live_indexes(rings, nodes, cfg)
        self._layer_cache = {
            "gen": gen, "res": cfg.cell_res_deg, "poly": poly, "node": node,
        }
        return poly, node, True

    def layer_index_refs(self, cfg, pending: bool = False):
        """(poly ObjectRef, node ObjectRef, built_fresh) — the
        :meth:`layer_indexes` pair pre-``ray.put`` with the refs cached
        alongside the index cache, so steady-state windows ship ZERO
        layer bytes to the object store (the put is O(layer); re-putting
        per window was exactly the cost the live indexes removed —
        ADVICE r3).  The refs are dropped whenever the indexes mutate
        (update_layer_indexes) or the cache rebuilds."""
        import ray

        poly, node, built = self.layer_indexes(cfg, pending=pending)
        c = self._layer_cache
        if "poly_ref" not in c:
            c["poly_ref"] = ray.put(poly)
            c["node_ref"] = ray.put(node)
        return c["poly_ref"], c["node_ref"], built

    def update_layer_indexes(
        self,
        ring_delete_pids: np.ndarray,
        ring_upserts: pa.Table,
        node_delete_ids: np.ndarray,
        node_upserts: pa.Table,
    ) -> None:
        """O(delta) maintenance of the cached live indexes; call right
        after the window's layer-table mutations (pre-commit).  Stamps
        the cache for generation+1; a compaction signal just drops the
        cache (the next layer_indexes rebuilds from the mutated
        tables)."""
        c = self._layer_cache
        if c is None:
            return
        if c["gen"] != self._manifest["generation"]:
            self._layer_cache = None  # stale (crashed window) — drop
            return
        if (
            len(ring_delete_pids) or ring_upserts.num_rows
            or len(node_delete_ids) or node_upserts.num_rows
        ):
            # in-place mutation below invalidates any ray.put snapshot
            c.pop("poly_ref", None)
            c.pop("node_ref", None)
        need1 = c["poly"].apply_delta(ring_delete_pids, ring_upserts)
        need2 = c["node"].apply_delta(
            node_delete_ids,
            node_upserts.column("id").to_numpy(zero_copy_only=False).astype(
                np.int64
            ),
            node_upserts.column("lon").to_numpy(zero_copy_only=False),
            node_upserts.column("lat").to_numpy(zero_copy_only=False),
        )
        if need1 or need2:
            self._layer_cache = None
        else:
            c["gen"] = self._manifest["generation"] + 1

    # -- typed lookup helpers (the reference's fetcher interface,
    #    include/osm/OsmDataFetcher.h:49-174, re-expressed) -----------------
    def node_locations(self, ids: np.ndarray) -> pa.Table:
        """J1 (writeQueryForNodeLocations, QueryWriter.cpp:256-266)."""
        return self.lookup("nodes", ids, columns=["id", "lon", "lat"])

    def ways_referencing_nodes(self, node_ids: np.ndarray) -> np.ndarray:
        """J2 (writeQueryForWaysReferencingNodes, QueryWriter.cpp:342-353):
        distinct way ids with >=1 member in node_ids."""
        t = self.lookup("way_members_by_node", node_ids, columns=["way_id"])
        return np.unique(t.column("way_id").to_numpy(zero_copy_only=False))

    def relations_referencing(
        self, node_ids: np.ndarray, way_ids: np.ndarray
    ) -> np.ndarray:
        """J3 (QueryWriter.cpp:356-381): distinct relation ids having a
        node member in node_ids or a way member in way_ids.  The
        relation->relation hop is intentionally NOT followed (reference
        cutoff src/osm/OsmChangeHandler.cpp:270-285)."""
        out = []
        for mtype, mids in (("node", node_ids), ("way", way_ids)):
            if len(mids) == 0:
                continue
            t = self.lookup(
                "rel_members_by_member", mids, columns=["rel_id", "member_type"]
            )
            t = t.filter(pc.equal(t.column("member_type"), mtype))
            out.append(t.column("rel_id").to_numpy(zero_copy_only=False))
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(out))

    def relations_referencing_relations(
        self, rel_ids: np.ndarray
    ) -> np.ndarray:
        """J7 (reference OsmChangeHandler.cpp:289-304 — dead code there,
        option-gated here via EngineConfig.rel_of_rel_hop): distinct
        relation ids having a RELATION member in rel_ids.  Same
        partition-pruned reverse-member lookup as
        :meth:`relations_referencing`, filtered to member_type
        'relation'; one hop, no transitive closure (the dead code's
        shape)."""
        if len(rel_ids) == 0:
            return np.empty(0, dtype=np.int64)
        t = self.lookup(
            "rel_members_by_member", rel_ids,
            columns=["rel_id", "member_type"],
        )
        t = t.filter(pc.equal(t.column("member_type"), "relation"))
        return np.unique(t.column("rel_id").to_numpy(zero_copy_only=False))

    def way_member_nodes(self, way_ids: np.ndarray) -> np.ndarray:
        """J4 (writeQueryForReferencedNodes, QueryWriter.cpp:316-326):
        distinct member node ids of the given ways."""
        t = self.lookup("ways", way_ids, columns=["node_ids"])
        flat = pc.list_flatten(t.column("node_ids").combine_chunks())
        return np.unique(flat.to_numpy(zero_copy_only=False))

    def relation_member_ids(
        self, rel_ids: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """J5 (writeQueryForRelationMemberIds, QueryWriter.cpp:329-339):
        member ids of the given relations split by member type
        (fetcher split: src/osm/OsmDataFetcherQLever.cpp:280-302)."""
        t = self.lookup("relations", rel_ids, columns=["members"])
        flat = pc.list_flatten(t.column("members").combine_chunks())
        refs = flat.field("ref").to_numpy(zero_copy_only=False)
        types = np.asarray(flat.field("type").to_pylist(), dtype=object)
        return (
            np.unique(refs[types == "node"]).astype(np.int64),
            np.unique(refs[types == "way"]).astype(np.int64),
            np.unique(refs[types == "relation"]).astype(np.int64),
        )

    # -- copy-on-write updates --------------------------------------------
    def apply_upserts_deletes(
        self,
        name: str,
        upserts: pa.Table | None,
        delete_keys: np.ndarray,
        op: str = "delta",
    ) -> None:
        """Rewrite only the partitions touched by the changed keys:
        old rows with those keys dropped, upsert rows appended — the
        engine analog of the reference's idempotent batched
        DELETE-then-INSERT per object id
        (src/osm/OsmChangeHandler.cpp:388-430, 645-733).

        Call :meth:`commit` afterwards to swap the manifest.
        """
        key = _TABLE_KEYS[name]
        n_parts = self._n_parts(name)
        schema = _schema_of(name)
        self.io.makedirs(self.io.join(self.root, name))
        if upserts is None:
            upserts = schema.empty_table()
        up_keys = upserts.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        delete_keys = np.asarray(delete_keys, dtype=np.int64)
        all_keys = np.unique(np.concatenate([up_keys, delete_keys]))
        if len(all_keys) == 0:
            return
        touched = np.unique(_part_of(all_keys, n_parts))
        up_parts = _part_of(up_keys, n_parts)
        drop_set = pa.array(np.unique(np.concatenate([up_keys, delete_keys])))
        gen = self._manifest["generation"] + 1
        entry = dict(self._manifest["tables"].get(name, {}))

        def rewrite(p: int) -> tuple[int, str, int]:
            # independent per-partition read->filter->write; parquet IO
            # releases the GIL, so a thread pool overlaps the rewrites
            old_file = entry.get(str(p))
            if old_file:
                old = self.io.read_table(
                    self.io.join(self.root, name, old_file))
                keep = pc.invert(pc.is_in(old.column(key), value_set=drop_set))
                old = old.filter(keep).cast(schema)  # parquet round-trips
                # timestamp[s] as [ms]; normalize to the canonical schema
            else:
                old = schema.empty_table()
            add = upserts.filter(pa.array(up_parts == p)).cast(schema)
            merged = pa.concat_tables([old, add]).sort_by(key)
            fname = f"part-{p:04d}-g{gen}.parquet"
            self.io.write_table(merged, self.io.join(self.root, name, fname))
            return p, fname, merged.num_rows

        from concurrent.futures import ThreadPoolExecutor

        plist = touched.tolist()
        if len(plist) > 1:
            with ThreadPoolExecutor(min(8, len(plist))) as ex:
                results = list(ex.map(rewrite, plist))
        else:
            results = [rewrite(p) for p in plist]
        for p, fname, nrows in results:  # deterministic lineage order
            entry[str(p)] = fname
            self._pending_lineage.append(
                {"table": name, "partition": p, "file": fname,
                 "rows": nrows, "op": op}
            )
        self._manifest["tables"][name] = entry
        self._update_hot_table(name, key, upserts, drop_set)

    def apply_owned_edges(
        self,
        name: str,
        upserts: pa.Table,
        owner_col: str,
        owner_ids: np.ndarray,
        touch_keys: np.ndarray,
    ) -> None:
        """Update an exploded edge table that is PARTITIONED by member
        key but OWNED by way/relation id: within the partitions reachable
        from ``touch_keys`` (old ∪ new member ids of every affected
        owner), drop rows whose owner is in ``owner_ids`` and append the
        new edge rows.  Every old edge of an affected owner lives in a
        partition keyed by one of its old member ids, so passing those
        as touch_keys guarantees complete deletion without a full scan.
        """
        key = _TABLE_KEYS[name]
        n_parts = self._n_parts(name)
        schema = _schema_of(name)
        self.io.makedirs(self.io.join(self.root, name))
        up_keys = upserts.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        touch = np.unique(
            np.concatenate([np.asarray(touch_keys, dtype=np.int64), up_keys])
        )
        if len(touch) == 0:
            return
        touched = np.unique(_part_of(touch, n_parts))
        up_parts = _part_of(up_keys, n_parts)
        owner_set = pa.array(np.unique(np.asarray(owner_ids, dtype=np.int64)))
        gen = self._manifest["generation"] + 1
        entry = dict(self._manifest["tables"].get(name, {}))
        def rewrite(p: int) -> tuple[int, str, int]:
            old_file = entry.get(str(p))
            if old_file:
                old = self.io.read_table(
                    self.io.join(self.root, name, old_file))
                keep = pc.invert(pc.is_in(old.column(owner_col), value_set=owner_set))
                old = old.filter(keep).cast(schema)
            else:
                old = schema.empty_table()
            add = upserts.filter(pa.array(up_parts == p)).cast(schema)
            merged = pa.concat_tables([old, add]).sort_by(key)
            fname = f"part-{p:04d}-g{gen}.parquet"
            self.io.write_table(merged, self.io.join(self.root, name, fname))
            return p, fname, merged.num_rows

        from concurrent.futures import ThreadPoolExecutor

        plist = touched.tolist()
        if len(plist) > 1:
            with ThreadPoolExecutor(min(8, len(plist))) as ex:
                results = list(ex.map(rewrite, plist))
        else:
            results = [rewrite(p) for p in plist]
        for p, fname, nrows in results:
            entry[str(p)] = fname
            self._pending_lineage.append(
                {"table": name, "partition": p, "file": fname,
                 "rows": nrows, "op": "edge-delta"}
            )
        self._manifest["tables"][name] = entry

    _pending_lineage: list[dict]

    def begin(self) -> None:
        if self._live_foreign_writer():
            raise RuntimeError(
                f"another live process holds the writer lock on {self.root} "
                "(single-writer store; see StateStore._gc)"
            )
        self.io.makedirs(self.root)
        self.io.write_text_atomic(self._lock_path(), json.dumps({
            "host": _hostname(), "pid": os.getpid(), "ts": time.time(),
        }))
        self._pending_lineage = []

    def commit(self) -> None:
        self._commit_manifest(self._pending_lineage)
        self._pending_lineage = []
        # drop superseded files immediately so directory scans
        # (read_tiles_dataset) match the new manifest without reopening
        self._gc()
        try:
            self.io.remove(self._lock_path())
        except (FileNotFoundError, OSError):
            pass

    # -- tile tables (pages / assignments partitioned by tile_id) ----------
    # The delta path replaces whole TILES copy-on-write — the engine
    # analog of the reference's delete+insert against the endpoint
    # (S7): affected tiles are rewritten, the manifest swap commits.
    def init_tile_table(self, name: str, ds) -> None:
        """Bulk-build a tile table from a Ray Dataset (hive-partitioned
        ``tile_id=N/`` directories), then record per-tile files in the
        manifest.  Resumable: if the manifest already lists the table,
        the build is skipped (idempotent bootstrap)."""
        if self._manifest["tables"].get(f"tile:{name}"):
            return
        io = self.io
        path = io.join(self.root, name)
        if io.exists(path):
            # a previous attempt crashed MID-PHASE (dir exists, manifest
            # entry absent): startup GC only sweeps manifest-listed
            # tables, so stale shards / truncated .tmp files would be
            # merged into the rebuild — start the phase clean instead
            io.rmtree(path, ignore_errors=False)
        ds.write_parquet(path, partition_cols=["tile_id"],
                         filesystem=io.fs)
        # COMPACT: the partitioned write produces one file per (write
        # task x tile); merge each tile dir to a single file in parallel
        # so reads see one well-sized file per tile, not thousands of
        # shards (small-files problem).
        tile_dirs = [d for d in io.listdir(path) if d.startswith("tile_id=")]
        import ray.data as rd

        # the compact tasks run on WORKERS: capture the (picklable)
        # StoreFS, never `self` (that would ship the whole store)
        def compact(batch: pa.Table, io=io, path=path) -> pa.Table:
            for d in batch.column("dir").to_pylist():
                dpath = io.join(path, d)
                files = sorted(io.listdir(dpath))
                if len(files) <= 1 and files and files[0] == "data.parquet":
                    continue
                merged = pa.concat_tables(
                    [io.read_table(io.join(dpath, f)) for f in files]
                )
                tmp = io.join(dpath, ".data.parquet.tmp")
                io.write_table(merged, tmp)
                for f in files:
                    io.remove(io.join(dpath, f))
                io.replace(tmp, io.join(dpath, "data.parquet"))
            return pa.Table.from_pydict({"n": [batch.num_rows]})

        if tile_dirs:
            (
                rd.from_arrow(pa.Table.from_pydict({"dir": tile_dirs}))
                .map_batches(compact, batch_format="pyarrow", batch_size=4)
                .count()
            )
        entry: dict[str, list[str]] = {}
        for d in tile_dirs:
            tid = d.split("=", 1)[1]
            entry[tid] = sorted(io.listdir(io.join(path, d)))
        self._manifest["tables"][f"tile:{name}"] = entry
        self.begin()
        self._pending_lineage = [
            {"table": name, "tile": t, "files": len(fs), "op": "bootstrap"}
            for t, fs in entry.items()
        ]
        self.commit()

    def init_tile_table_sharded(
        self, name: str, shards: list, transform
    ) -> None:
        """MID-SHUFFLE-resumable bulk tile build (north-star: a killed
        driver resumes mid-shuffle, not just at phase boundaries).

        ``transform(shard) -> Dataset`` turns one shard spec (a file
        group, a tile-id range — anything deterministic) into its slice
        of the table.  Each shard is written independently under
        ``<name>.stage/shard=K/tile_id=N/`` and sealed with an atomic
        ``_DONE`` marker; a killed run re-executes ONLY unsealed
        shards — sealed shard output is never touched.  When every
        shard is sealed, a compaction pass merges the shard outputs per
        tile (deterministic shard order) into the final
        ``<name>/tile_id=N/data.parquet`` layout and the manifest commit
        publishes the table atomically.  The stage dir lives outside the
        manifest, so startup GC never sweeps it (see ``_gc``).

        Correctness requires ``transform`` to be per-row deterministic
        and shard-independent (true for geocode and the broadcast
        spatial join: no cross-shard state).
        """
        if self._manifest["tables"].get(f"tile:{name}"):
            return
        import ray.data as rd

        io = self.io
        stage = io.join(self.root, f"{name}.stage")
        final = io.join(self.root, name)
        for k, shard in enumerate(shards):
            sdir = io.join(stage, f"shard={k}")
            done = io.join(sdir, "_DONE")
            if io.exists(done):
                continue
            if io.exists(sdir):
                io.rmtree(sdir, ignore_errors=False)  # unsealed partial attempt
            transform(shard).write_parquet(sdir, partition_cols=["tile_id"],
                                           filesystem=io.fs)
            io.write_text_atomic(done, "1")
        # compaction is itself idempotent: a crash here leaves the
        # sealed stage intact and an unlisted final dir, which the next
        # attempt rebuilds from scratch
        if io.exists(final):
            io.rmtree(final, ignore_errors=False)
        shard_dirs = sorted(
            (d for d in io.listdir(stage) if d.startswith("shard=")),
            key=lambda d: int(d.split("=", 1)[1]),
        )
        per_tile: dict[str, list[str]] = {}
        for sd in shard_dirs:
            sp = io.join(stage, sd)
            for td in io.listdir(sp):
                if td.startswith("tile_id="):
                    tp = io.join(sp, td)
                    per_tile.setdefault(td, []).extend(
                        io.join(tp, f) for f in sorted(io.listdir(tp))
                    )

        def compact(batch: pa.Table, io=io) -> pa.Table:
            for td in batch.column("dir").to_pylist():
                merged = pa.concat_tables(
                    [io.read_table(f) for f in per_tile[td]]
                )
                dpath = io.join(final, td)
                io.makedirs(dpath)
                tmp = io.join(dpath, ".data.parquet.tmp")
                io.write_table(merged, tmp)
                io.replace(tmp, io.join(dpath, "data.parquet"))
            return pa.Table.from_pydict({"n": [batch.num_rows]})

        if per_tile:
            (
                rd.from_arrow(pa.Table.from_pydict({"dir": sorted(per_tile)}))
                .map_batches(compact, batch_format="pyarrow", batch_size=4)
                .count()
            )
        entry = {td.split("=", 1)[1]: ["data.parquet"] for td in per_tile}
        self._manifest["tables"][f"tile:{name}"] = entry
        self.begin()
        self._pending_lineage = [
            {"table": name, "tile": t, "files": 1, "op": "bootstrap-sharded"}
            for t in entry
        ]
        self.commit()
        io.rmtree(stage)

    def tile_ids(self, name: str) -> list[int]:
        return [int(t) for t in self._manifest["tables"].get(f"tile:{name}", {})]

    def _tile_files(self, name: str, tile_ids) -> list[str]:
        entry = self._manifest["tables"].get(f"tile:{name}", {})
        files = []
        for t in tile_ids:
            for f in entry.get(str(t), []):
                files.append(self.io.join(self.root, name, f"tile_id={t}", f))
        return files

    def read_tiles(self, name: str, tile_ids=None, columns=None) -> pa.Table:
        """Rows of the listed tiles (driver-sized: delta paths touch few
        tiles).  The ``tile_id`` column is restored from the partition
        directory."""
        from concurrent.futures import ThreadPoolExecutor

        entry = self._manifest["tables"].get(f"tile:{name}", {})
        if tile_ids is None:
            tile_ids = [int(t) for t in entry]
        per_tile_files = {t: self._tile_files(name, [t]) for t in tile_ids}
        with ThreadPoolExecutor(max_workers=16) as ex:
            all_files = [f for fs in per_tile_files.values() for f in fs]
            tables = dict(zip(all_files,
                              ex.map(self.io.read_table, all_files)))
        out = []
        for t in tile_ids:
            files = per_tile_files[t]
            if not files:
                continue
            tbl = pa.concat_tables([tables[f] for f in files])
            if "tile_id" not in tbl.column_names:
                tbl = tbl.append_column(
                    "tile_id", pa.array(np.full(tbl.num_rows, int(t), dtype=np.int64))
                )
            if columns:
                tbl = tbl.select(columns)
            else:
                # canonical column order (hive write drops tile_id from
                # files; restore the schema's order)
                want = [f.name for f in _schema_of(name)]
                if set(want) == set(tbl.column_names):
                    tbl = tbl.select(want)
            out.append(tbl)
        if not out:
            empty = _schema_of(name).empty_table()
            return empty.select(columns) if columns else empty
        return pa.concat_tables(out)

    def read_tiles_dataset(self, name: str, tile_ids=None, columns=None):
        """Same, as a streaming Ray Dataset (for wide recomputes).

        Reads the hive-partitioned directory (partition inference
        restores ``tile_id``); correctness of dir scans is guaranteed
        by the startup GC, which removes files superseded by the
        manifest (see :meth:`_gc`)."""
        import ray.data as rd

        entry = self._manifest["tables"].get(f"tile:{name}", {})
        if not entry:
            return rd.from_arrow(_schema_of(name).empty_table())
        path = self.io.join(self.root, name)
        kwargs = {}
        if columns is not None:
            kwargs["columns"] = columns
        if tile_ids is not None:
            # partition prune at the READ: pass only the wanted tiles'
            # manifest-listed files (a `filter` on the hive partition
            # column fails at Ray's fragment-sampling step, and
            # multi-directory lists are not accepted).  tile_id is
            # restored from the file path as int64.
            want = {str(int(t)) for t in tile_ids}
            files = [
                self.io.join(path, f"tile_id={t}", f)
                for t, fs in entry.items()
                if str(t) in want
                for f in fs
            ]
            if not files:
                return rd.from_arrow(_schema_of(name).empty_table())
            phys_cols = None
            if columns is not None:
                phys_cols = [c for c in columns if c != "tile_id"]
            ds = rd.read_parquet(
                files, include_paths=True, filesystem=self.io.fs,
                **({"columns": phys_cols} if phys_cols is not None else {}),
            )

            def _restore_tile(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc2

                ex = pc2.extract_regex(
                    t.column("path"), pattern=r"tile_id=(?P<tid>-?\d+)"
                )
                tid = pc2.cast(pc2.struct_field(ex, "tid"), pa.int64())
                # hive inference may or may not have added tile_id
                # (depends on the common base dir of the file list) —
                # drop it and always use the path-derived int64 column
                drop = [c for c in ("path", "tile_id") if c in t.column_names]
                return t.drop_columns(drop).append_column("tile_id", tid)

            return ds.map_batches(_restore_tile, batch_format="pyarrow")
        ds = rd.read_parquet(path, filesystem=self.io.fs, **kwargs)
        return ds

    def replace_tiles(self, name: str, tile_ids, new_rows: pa.Table) -> None:
        """COW replacement of whole tiles: new per-tile files written,
        manifest entries repointed (commit() swaps atomically).

        One sort + per-tile zero-copy slices (not N full-table
        filters); parquet encoding parallelized across threads (the
        encoder releases the GIL)."""
        from concurrent.futures import ThreadPoolExecutor

        entry = dict(self._manifest["tables"].get(f"tile:{name}", {}))
        gen = self._manifest["generation"] + 1
        srt = new_rows.sort_by("tile_id")
        tids = srt.column("tile_id").to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.diff(tids)) + 1
        starts = np.concatenate([[0], bounds, [len(tids)]])
        slice_of = {
            int(tids[s]): (int(s), int(e))
            for s, e in zip(starts[:-1], starts[1:])
            if e > s
        }
        fname = f"delta-g{gen}.parquet"

        def write_one(t: int):
            d = self.io.join(self.root, name, f"tile_id={t}")
            self.io.makedirs(d)
            se = slice_of.get(int(t))
            sub = (
                srt.slice(se[0], se[1] - se[0])
                if se is not None
                else srt.schema.empty_table()
            )
            self.io.write_table(sub.drop_columns(["tile_id"]),
                                self.io.join(d, fname))
            return int(t), sub.num_rows

        with ThreadPoolExecutor(max_workers=16) as ex:
            for t, nrows in ex.map(write_one, [int(t) for t in tile_ids]):
                entry[str(t)] = [fname]
                self._pending_lineage.append(
                    {"table": name, "tile": t, "file": fname,
                     "rows": nrows, "op": "cow-replace"}
                )
        self._manifest["tables"][f"tile:{name}"] = entry

    def cow_merge_tiles_distributed(
        self,
        tile_ids,
        new_rows: pa.Table,
        drop_urls,
        rollup_fn,
        summary_fn,
    ) -> tuple[pa.Table, np.ndarray]:
        """Distributed COW tile replacement (the reference's batched
        endpoint delete+insert, S7, as RAY TASKS): one task per tile
        chunk reads its old tile files, drops the invalidated urls,
        appends the recomputed rows, and writes the new assignments AND
        rollup files — no whole-tile merge ever touches the driver.

        The manifest is still updated (and atomically swapped) only on
        the driver, so the single-writer commit protocol and crash
        semantics are unchanged: a mid-run kill leaves unreferenced
        new-generation files that the next open GCs.  Requires storage
        shared across nodes (the standard parquet-state assumption).

        Returns (cell-summary rows of the merged tiles, old cell ids of
        the touched tiles) for the caller's prune-index upsert.
        """
        import ray

        a_entry = dict(self._manifest["tables"].get("tile:assignments", {}))
        r_entry = dict(self._manifest["tables"].get("tile:rollups", {}))
        gen = self._manifest["generation"] + 1
        fname = f"delta-g{gen}.parquet"
        srt = new_rows.sort_by("tile_id")
        tids = srt.column("tile_id").to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.diff(tids)) + 1
        starts = np.concatenate([[0], bounds, [len(tids)]])
        slice_of = {
            int(tids[s]): (int(s), int(e))
            for s, e in zip(starts[:-1], starts[1:])
            if e > s
        }
        new_ref = ray.put(srt)
        drop_ref = ray.put(drop_urls)
        root = self.root
        io = self.io  # picklable; never capture `self` in the task
        schema = _schema_of("assignments")

        @ray.remote
        def rewrite(items):
            import pyarrow as pa2
            import pyarrow.compute as pc2

            srt_ = ray.get(new_ref)
            drop_ = ray.get(drop_ref)
            out = []
            for t, files, se in items:
                olds = [io.read_table(f) for f in files]
                old = (
                    pa2.concat_tables(olds)
                    if olds
                    else schema.empty_table().drop_columns(["tile_id"])
                )
                if "tile_id" not in old.column_names:
                    old = old.append_column(
                        "tile_id", pa2.array([t] * old.num_rows, type=pa2.int64())
                    )
                keep = pc2.invert(pc2.is_in(old.column("url"), value_set=drop_))
                sub_new = (
                    srt_.slice(se[0], se[1] - se[0])
                    if se is not None
                    else srt_.schema.empty_table()
                )
                merged = pa2.concat_tables(
                    [old.filter(keep).select(srt_.column_names).cast(srt_.schema),
                     sub_new]
                )
                d = io.join(root, "assignments", f"tile_id={t}")
                io.makedirs(d)
                io.write_table(
                    merged.drop_columns(["tile_id"]), io.join(d, fname)
                )
                rollup = rollup_fn(merged)
                d = io.join(root, "rollups", f"tile_id={t}")
                io.makedirs(d)
                io.write_table(
                    rollup.drop_columns(["tile_id"]), io.join(d, fname)
                )
                old_cells = np.unique(
                    old.column("cell_id").to_numpy(zero_copy_only=False)
                )
                out.append((t, merged.num_rows, summary_fn(merged), old_cells))
            return out

        items = [
            (int(t), self._tile_files("assignments", [int(t)]),
             slice_of.get(int(t)))
            for t in tile_ids
        ]
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n_chunks = max(1, min(len(items), ncpu * 2))
        chunk_size = (len(items) + n_chunks - 1) // n_chunks
        futures = [
            rewrite.remote(items[i : i + chunk_size])
            for i in range(0, len(items), chunk_size)
        ]
        summaries: list[pa.Table] = []
        old_cells_all: list[np.ndarray] = []
        for res in ray.get(futures):
            for t, nrows, summary, old_cells in res:
                a_entry[str(t)] = [fname]
                r_entry[str(t)] = [fname]
                summaries.append(summary)
                old_cells_all.append(old_cells)
                self._pending_lineage.append(
                    {"table": "assignments", "tile": t, "file": fname,
                     "rows": nrows, "op": "cow-replace-distributed"}
                )
        self._manifest["tables"]["tile:assignments"] = a_entry
        self._manifest["tables"]["tile:rollups"] = r_entry
        from ..stages.tiles import CELL_SUMMARY

        summary_rows = (
            pa.concat_tables([s for s in summaries if s.num_rows]).cast(CELL_SUMMARY)
            if any(s.num_rows for s in summaries)
            else CELL_SUMMARY.empty_table()
        )
        old_cells = (
            np.unique(np.concatenate(old_cells_all))
            if old_cells_all
            else np.empty(0, dtype=np.int64)
        )
        return summary_rows, old_cells

    def cow_merge_tiles_streaming(
        self,
        recomputed_ds,
        rollup_fn,
        summary_fn,
    ) -> tuple[pa.Table, np.ndarray, dict]:
        """Fully-streaming COW tile replacement: the re-joined rows stay
        a Ray Dataset end-to-end — ``write_parquet(partition_cols=
        ["tile_id"])`` stages them hash-partitioned by tile with
        streaming-executor backpressure, then one Ray task per tile
        chunk reads ONLY its tile's staged partition + old tile files,
        drops the staged urls (the invalidated set restricted to this
        tile: a page's tile is derived from its fixed location, so its
        re-joined row lands in the same tile its old row lives in),
        merges, and writes the new assignments + rollup files.  NO
        process — driver included — ever holds the re-joined table or a
        global drop set (the at-scale fix for the driver collect the
        distributed path above still pays via ``ray.put``).

        Commit protocol unchanged: manifest entries repoint on the
        driver, ``commit()`` swaps atomically; a mid-run kill leaves an
        unreferenced ``_staging/rejoin-*`` dir and new-generation files
        that the next open GCs.

        Returns (cell-summary rows of the merged tiles, old cell ids of
        the touched tiles, stats: staged_rows / staged_cells / tiles).
        """
        import ray

        io = self.io  # picklable; never capture `self` in the task
        a_entry = dict(self._manifest["tables"].get("tile:assignments", {}))
        r_entry = dict(self._manifest["tables"].get("tile:rollups", {}))
        gen = self._manifest["generation"] + 1
        fname = f"delta-g{gen}.parquet"
        staging = io.join(self.root, "_staging", f"rejoin-g{gen}")
        io.rmtree(staging)  # crashed prior attempt
        _t0 = time.time()
        recomputed_ds.write_parquet(staging, partition_cols=["tile_id"],
                                    filesystem=io.fs)
        staging_sec = time.time() - _t0
        staged_tiles = sorted(
            int(d.split("=", 1)[1])
            for d in io.listdir(staging)
            if d.startswith("tile_id=")
        )
        root = self.root
        schema = _schema_of("assignments")

        @ray.remote
        def rewrite(items):
            import pyarrow as pa2
            import pyarrow.compute as pc2

            def read_with_tile(files, t):
                tabs = [io.read_table(f) for f in files]
                tab = (
                    pa2.concat_tables(tabs)
                    if tabs
                    else schema.empty_table().drop_columns(["tile_id"])
                )
                if "tile_id" not in tab.column_names:
                    tab = tab.append_column(
                        "tile_id", pa2.array([t] * tab.num_rows, type=pa2.int64())
                    )
                return tab.select(schema.names).cast(schema)

            out = []
            for t, old_files, staged_files in items:
                new = read_with_tile(staged_files, t)
                old = read_with_tile(old_files, t)
                keep = pc2.invert(
                    pc2.is_in(
                        old.column("url"),
                        value_set=new.column("url").combine_chunks(),
                    )
                )
                merged = pa2.concat_tables([old.filter(keep), new])
                d = io.join(root, "assignments", f"tile_id={t}")
                io.makedirs(d)
                io.write_table(
                    merged.drop_columns(["tile_id"]), io.join(d, fname)
                )
                rollup = rollup_fn(merged)
                d = io.join(root, "rollups", f"tile_id={t}")
                io.makedirs(d)
                io.write_table(
                    rollup.drop_columns(["tile_id"]), io.join(d, fname)
                )
                old_cells = np.unique(
                    old.column("cell_id").to_numpy(zero_copy_only=False)
                )
                staged_cells = len(
                    np.unique(new.column("cell_id").to_numpy(zero_copy_only=False))
                )
                out.append(
                    (t, merged.num_rows, summary_fn(merged), old_cells,
                     new.num_rows, staged_cells)
                )
            return out

        existing = {int(t) for t in a_entry}
        items = [
            (
                t,
                self._tile_files("assignments", [t]),
                [
                    io.join(staging, f"tile_id={t}", f)
                    for f in io.listdir(io.join(staging, f"tile_id={t}"))
                    if f.endswith(".parquet")
                ],
            )
            for t in staged_tiles
            if t in existing
        ]
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n_chunks = max(1, min(len(items), ncpu * 2))
        chunk_size = (len(items) + n_chunks - 1) // n_chunks
        futures = [
            rewrite.remote(items[i : i + chunk_size])
            for i in range(0, len(items), chunk_size)
        ]
        summaries: list[pa.Table] = []
        old_cells_all: list[np.ndarray] = []
        staged_rows = staged_cells = 0
        for res in ray.get(futures):
            for t, nrows, summary, old_cells, n_new, n_cells in res:
                a_entry[str(t)] = [fname]
                r_entry[str(t)] = [fname]
                summaries.append(summary)
                old_cells_all.append(old_cells)
                staged_rows += n_new
                staged_cells += n_cells  # a cell nests in exactly one tile
                self._pending_lineage.append(
                    {"table": "assignments", "tile": t, "file": fname,
                     "rows": nrows, "op": "cow-replace-streaming"}
                )
        self._manifest["tables"]["tile:assignments"] = a_entry
        self._manifest["tables"]["tile:rollups"] = r_entry
        io.rmtree(staging)
        from ..stages.tiles import CELL_SUMMARY

        summary_rows = (
            pa.concat_tables([s for s in summaries if s.num_rows]).cast(CELL_SUMMARY)
            if any(s.num_rows for s in summaries)
            else CELL_SUMMARY.empty_table()
        )
        old_cells = (
            np.unique(np.concatenate(old_cells_all))
            if old_cells_all
            else np.empty(0, dtype=np.int64)
        )
        stats = {
            "tiles": len(items),
            "staged_rows": staged_rows,
            "staged_cells": staged_cells,
            "staging_sec": round(staging_sec, 3),
        }
        return summary_rows, old_cells, stats
