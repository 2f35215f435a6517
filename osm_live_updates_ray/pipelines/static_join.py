"""Bootstrap pipeline: full spatial join + state build.

pages (Ray Dataset, PAGES schema)
  -> geocode (actor pool, vectorized regex + cell encoding)
  -> write tile-partitioned ``pages`` table            [resumable]
  -> spatial join vs broadcast polygon/node layers (actor pool)
  -> write tile-partitioned ``assignments`` table      [resumable]
plus the id-keyed OSM layer tables, exploded reverse-edge tables,
derived geometry facts, and the polygon-ring layer.

This is the full recompute the delta pipeline (pipelines/update.py)
avoids; fixture conformance asserts delta replay == this bootstrap
re-run on merged state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages import geometry, spatial
from ..state.store import StateStore, pack_gid


# above this many OSM objects the bootstrap geometry build fans out as
# Ray map_batches stages (below it, driver-side is faster than the
# pipeline ramp; the per-object outputs are identical either way)
GEOM_DISTRIBUTE_THRESHOLD = 50_000


def _append_gid(out: pa.Table) -> pa.Table:
    if out.num_rows == 0:
        from ..state.store import _geoms_stored_schema

        return _geoms_stored_schema().empty_table()
    gid = pack_gid(
        out.column("type").to_pylist(),
        out.column("id").to_numpy(zero_copy_only=False),
    )
    return out.append_column("gid", pa.array(gid))


def build_geoms_table(
    nodes: pa.Table,
    ways: pa.Table,
    relations: pa.Table,
    lookup: geometry.NodeCoordLookup,
    cfg: EngineConfig,
) -> pa.Table:
    """Derived facts for every object, with the packed ``gid`` key."""
    parts = [
        geometry.node_geoms(nodes, cfg),
        geometry.way_geoms(ways, lookup, cfg),
        geometry.relation_geoms(relations, ways, lookup, cfg),
    ]
    out = pa.concat_tables([p for p in parts if p.num_rows])
    return _append_gid(out)


def build_state(
    root: str,
    pages_ds,
    nodes: pa.Table,
    ways: pa.Table,
    relations: pa.Table,
    cfg: EngineConfig = DEFAULT_CONFIG,
    resume: bool = False,
    pages_shards: list[list[str]] | None = None,
    filesystem=None,
) -> StateStore:
    """Bootstrap the full state store; returns the committed store.

    ``pages_ds`` streams (never materialized on the driver); the OSM
    layers are broadcast-sized Arrow tables (at planet scale these
    arrive as Datasets and the layer build itself distributes — the
    layout written here is identical).

    ``resume=True`` re-opens an existing root and SKIPS every phase
    whose tables are already committed (each phase ends in an atomic
    manifest commit, so a crash leaves a clean prefix); only the
    phases after the crash point are recomputed.  The caller must pass
    the same inputs as the interrupted run — resuming never validates
    input equality beyond the store's persisted option set.

    ``pages_shards`` (list of parquet file groups) switches the two
    BIG phases — the pages write and the spatial-join assignments
    write — to the MID-PHASE-resumable sharded path
    (``StateStore.init_tile_table_sharded``): a killed run re-executes
    only the unsealed shards of the phase it died in, not the whole
    phase.  Use it when one phase is hours long (planet bootstrap).
    """
    from ..state.fsio import StoreFS

    _io = StoreFS(filesystem)
    if resume and _io.exists(_io.join(root, "manifest.json")):
        store = StateStore(root, cfg, filesystem=filesystem)
        cfg = store.discovered_config(cfg)
    else:
        store = StateStore.build(
            root, nodes=nodes, ways=ways, relations=relations, config=cfg,
            filesystem=filesystem,
        )
    have = store._manifest["tables"]
    n_obj = nodes.num_rows + ways.num_rows + relations.num_rows
    if "polygon_rings" not in have or "geoms" not in have:
        lookup = geometry.NodeCoordLookup.from_table(nodes)
        store.begin()
        if n_obj >= GEOM_DISTRIBUTE_THRESHOLD:
            rings = geometry.build_rings_distributed(ways, relations, lookup)
            geoms = _append_gid(
                geometry.build_geoms_distributed(nodes, ways, relations, lookup, cfg)
            )
        else:
            rings = geometry.polygon_rings_from_osm(ways, relations, lookup)
            geoms = build_geoms_table(nodes, ways, relations, lookup, cfg)
        store.apply_upserts_deletes(
            "polygon_rings", rings, np.empty(0, dtype=np.int64), op="bootstrap"
        )
        store.apply_upserts_deletes(
            "geoms", geoms, np.empty(0, dtype=np.int64), op="bootstrap"
        )
        store.commit()
    elif "tile:assignments" not in store._manifest["tables"]:
        # rings are only needed to (re)build assignments; a resume on a
        # store past that phase must not pay a full-table read
        rings = store.read_all("polygon_rings")
    else:
        rings = None

    # pages: geocode + cell encode, tile-partitioned write (streaming)
    if "tile:pages" not in store._manifest["tables"]:
        if pages_shards:
            import ray.data as rd

            store.init_tile_table_sharded(
                "pages", pages_shards,
                lambda files: spatial.geocode(rd.read_parquet(files), cfg),
            )
        else:
            store.init_tile_table("pages", spatial.geocode(pages_ds, cfg))

    # assignments: spatial join over the freshly written pages table
    # (read back => the join input is the committed state, and a retry
    # of this phase is idempotent)
    if "tile:assignments" not in store._manifest["tables"]:
        node_tbl = pa.Table.from_pydict(
            {
                "id": nodes.column("id"),
                "lon": nodes.column("lon"),
                "lat": nodes.column("lat"),
            }
        )
        join_cols = ["url", "lon", "lat", "cell_id", "tile_id"]
        if pages_shards:
            # shard by tile-id ranges of the COMMITTED pages table: each
            # shard re-reads only its tiles, so a resumed run skips the
            # sealed ranges of this (typically dominant) phase too
            tids = sorted(store.tile_ids("pages"))
            k = max(1, min(len(tids), len(pages_shards)))
            groups = [list(map(int, g)) for g in np.array_split(tids, k)]
            store.init_tile_table_sharded(
                "assignments", groups,
                lambda tile_ids: spatial.spatial_join(
                    store.read_tiles_dataset(
                        "pages", tile_ids=tile_ids, columns=join_cols
                    ),
                    rings, node_tbl, cfg, keep_lonlat=True,
                ),
            )
        else:
            pages_back = store.read_tiles_dataset("pages", columns=join_cols)
            store.init_tile_table(
                "assignments",
                spatial.spatial_join(pages_back, rings, node_tbl, cfg,
                                     keep_lonlat=True),
            )

    # tile rollups (A6) over the committed assignments
    from ..stages import tiles as tilestage

    if "tile:rollups" not in store._manifest["tables"]:
        store.init_tile_table(
            "rollups", tilestage.tile_rollup(store.read_tiles_dataset("assignments"))
        )
    if "cell_summaries" in store._manifest["tables"]:
        return store
    # per-cell kNN-bound summary: the delta path's invalidation prune
    # index (candidate cells only, never a full assignments scan).
    # Cell-count-sized — stored as a compact hash-partitioned state
    # table, distilled from the streaming assignments aggregate.
    parts = [
        b
        for b in tilestage.cell_summary(
            store.read_tiles_dataset("assignments")
        ).iter_batches(batch_size=65536, batch_format="pyarrow")
        if b.num_rows
    ]
    summary = (
        pa.concat_tables(parts).cast(tilestage.CELL_SUMMARY)
        if parts
        else tilestage.CELL_SUMMARY.empty_table()
    )
    store.begin()
    store.apply_upserts_deletes(
        "cell_summaries", summary, np.empty(0, dtype=np.int64), op="bootstrap"
    )
    store.commit()
    return store
