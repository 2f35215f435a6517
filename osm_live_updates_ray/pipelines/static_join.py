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
    if out.num_rows == 0:
        from ..state.store import _geoms_stored_schema

        return _geoms_stored_schema().empty_table()
    gid = pack_gid(
        out.column("type").to_pylist(),
        out.column("id").to_numpy(zero_copy_only=False),
    )
    return out.append_column("gid", pa.array(gid))


def build_state(
    root: str,
    pages_ds,
    nodes: pa.Table,
    ways: pa.Table,
    relations: pa.Table,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> StateStore:
    """Bootstrap the full state store; returns the committed store.

    ``pages_ds`` streams (never materialized on the driver); the OSM
    layers are broadcast-sized Arrow tables (at planet scale these
    arrive as Datasets and the layer build itself distributes — the
    layout written here is identical).
    """
    store = StateStore.build(
        root, nodes=nodes, ways=ways, relations=relations, config=cfg
    )
    lookup = geometry.NodeCoordLookup.from_table(nodes)

    store.begin()
    rings = geometry.polygon_rings_from_osm(ways, relations, lookup)
    store.apply_upserts_deletes(
        "polygon_rings", rings, np.empty(0, dtype=np.int64), op="bootstrap"
    )
    geoms = build_geoms_table(nodes, ways, relations, lookup, cfg)
    store.apply_upserts_deletes(
        "geoms", geoms, np.empty(0, dtype=np.int64), op="bootstrap"
    )
    store.commit()

    # pages: geocode + cell encode, tile-partitioned write (streaming)
    pages_geo = spatial.geocode(pages_ds, cfg)
    store.init_tile_table("pages", pages_geo)

    # assignments: spatial join over the freshly written pages table
    # (read back => the join input is the committed state, and a retry
    # of this phase is idempotent)
    node_tbl = pa.Table.from_pydict(
        {
            "id": nodes.column("id"),
            "lon": nodes.column("lon"),
            "lat": nodes.column("lat"),
        }
    )
    pages_back = store.read_tiles_dataset(
        "pages", columns=["url", "lon", "lat", "cell_id", "tile_id"]
    )
    assignments = spatial.spatial_join(
        pages_back, rings, node_tbl, cfg, keep_lonlat=True
    )
    store.init_tile_table("assignments", assignments)

    # tile rollups (A6) over the committed assignments
    from ..stages import tiles as tilestage

    store.init_tile_table(
        "rollups", tilestage.tile_rollup(store.read_tiles_dataset("assignments"))
    )
    return store
