"""Derived-geometry computation (the reference's osm2rdf stage, ST3).

The reference shells into osm2rdf in-process over the merged
change+dummy file to compute WKT geometry, centroid, envelope, convex
hull, length and area for EVERY object in the merged input
(reference: src/osm/Osm2ttl.cpp:39-112).  Here the same derivation is
an actor-pool ``map_batches`` stage: workers hold the node-coordinate
lookup (broadcast once via ``ray.put``) and assemble way/relation
geometry per batch.

Geometry model (documented simplifications vs GEOS):
  * way: closed ring (first==last member, >=4 pts) -> POLYGON, else
    LINESTRING; length = planar polyline length; area = shoelace for
    closed rings.
  * relation: area relations (type in {multipolygon, boundary}) ->
    MULTIPOLYGON of the closed member-way rings (role 'inner' rings
    are holes); others -> MULTILINESTRING.  Full OSM ring-merging of
    open member ways is not implemented (deterministic subset).
  * centroid = vertex mean; convex hull = monotone chain.
  * missing member nodes/ways are DROPPED, not errors — regional
    extract tolerance (reference: src/osm/OsmChangeHandler.cpp:340-343).

Option-gated columns (reference ST2: which derived columns exist is
configuration discovered from the store) — EngineConfig.with_* flags
null out the corresponding columns so delete/recompute matches exactly
what was materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions import geo, wkt
from ..schemas import GEOMS

POLYGON_RINGS = pa.schema(
    [
        ("polygon_id", pa.int64()),
        ("ring_idx", pa.int32()),
        ("role", pa.string()),  # "outer" | "inner"
        ("lons", pa.list_(pa.float64())),
        ("lats", pa.list_(pa.float64())),
        ("min_lon", pa.float64()),
        ("min_lat", pa.float64()),
        ("max_lon", pa.float64()),
        ("max_lat", pa.float64()),
        ("area", pa.float64()),
    ]
)


class NodeCoordLookup:
    """Sorted-array id->(lon,lat) lookup; vectorized via searchsorted."""

    def __init__(self, ids: np.ndarray, lons: np.ndarray, lats: np.ndarray):
        order = np.argsort(ids)
        self.ids = ids[order]
        self.lons = lons[order]
        self.lats = lats[order]

    @classmethod
    def from_table(cls, t: pa.Table) -> "NodeCoordLookup":
        return cls(
            t.column("id").to_numpy(zero_copy_only=False).astype(np.int64),
            t.column("lon").to_numpy(zero_copy_only=False),
            t.column("lat").to_numpy(zero_copy_only=False),
        )

    def resolve(self, refs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(lons, lats, found_mask) for an array of node ids."""
        if len(self.ids) == 0:
            n = len(refs)
            return np.zeros(n), np.zeros(n), np.zeros(n, dtype=bool)
        pos = np.searchsorted(self.ids, refs)
        pos = np.clip(pos, 0, len(self.ids) - 1)
        found = self.ids[pos] == refs
        return self.lons[pos], self.lats[pos], found


def _empty_geom_row(otype: str, oid: int) -> dict:
    return {
        "type": otype, "id": oid, "wkt": None,
        "centroid_lon": None, "centroid_lat": None,
        "env_min_lon": None, "env_min_lat": None,
        "env_max_lon": None, "env_max_lat": None,
        "convex_hull_wkt": None, "obb_wkt": None, "length": None, "area": None,
    }


def _facts(
    otype: str, oid: int, x: np.ndarray, y: np.ndarray,
    wkt_str: str | None, length: float, area: float, cfg: EngineConfig,
) -> dict:
    row = _empty_geom_row(otype, oid)
    if len(x) == 0:
        return row
    row["wkt"] = wkt_str
    if cfg.with_centroid:
        row["centroid_lon"], row["centroid_lat"] = geo.centroid(x, y)
    if cfg.with_envelope:
        (row["env_min_lon"], row["env_min_lat"],
         row["env_max_lon"], row["env_max_lat"]) = geo.envelope(x, y)
    if cfg.with_convex_hull:
        hx, hy = geo.convex_hull(x, y)
        row["convex_hull_wkt"] = wkt.polygon_wkt(hx, hy, cfg.wkt_precision)
    if cfg.with_obb:
        ox, oy = geo.oriented_bbox(x, y)
        row["obb_wkt"] = wkt.polygon_wkt(ox, oy, cfg.wkt_precision)
    if cfg.with_length:
        row["length"] = length
    if cfg.with_area:
        row["area"] = area
    return row


def node_geoms(nodes: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Per-node derived facts (geometry = POINT, 7-decimal canonical).

    Vectorized column build (no per-row dicts): a point's centroid /
    envelope / hull degenerate to the point itself, so every derived
    value is the coordinate pair — formatting is the only per-row work.
    """
    n = nodes.num_rows
    ids = nodes.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    lon = nodes.column("lon").to_numpy(zero_copy_only=False)
    lat = nodes.column("lat").to_numpy(zero_copy_only=False)
    p = cfg.wkt_precision
    pts = [
        f"{a:.{p}f} {b:.{p}f}" for a, b in zip(lon.tolist(), lat.tolist())
    ]
    none_col = pa.nulls(n, pa.float64())
    return pa.Table.from_arrays(
        [
            pa.array(["node"] * n, type=pa.string()),
            pa.array(ids, type=pa.int64()),
            pa.array([f"POINT({s})" for s in pts], type=pa.string()),
            pa.array(lon) if cfg.with_centroid else none_col,
            pa.array(lat) if cfg.with_centroid else none_col,
            pa.array(lon) if cfg.with_envelope else none_col,
            pa.array(lat) if cfg.with_envelope else none_col,
            pa.array(lon) if cfg.with_envelope else none_col,
            pa.array(lat) if cfg.with_envelope else none_col,
            (
                pa.array([f"POLYGON(({s}))" for s in pts], type=pa.string())
                if cfg.with_convex_hull
                else pa.nulls(n, pa.string())
            ),
            (
                # a point's OBB degenerates to the point (4 identical
                # corners, same separator style as wkt.polygon_wkt)
                pa.array(
                    [f"POLYGON(({s},{s},{s},{s}))" for s in pts],
                    type=pa.string(),
                )
                if cfg.with_obb
                else pa.nulls(n, pa.string())
            ),
            (
                pa.array(np.zeros(n)) if cfg.with_length else none_col
            ),
            (
                pa.array(np.zeros(n)) if cfg.with_area else none_col
            ),
        ],
        schema=GEOMS,
    )


def _resolved_way_coords(
    ways: pa.Table, lookup: NodeCoordLookup
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ONE searchsorted over all member refs (instead of one per way):
    returns (x, y, offsets) where way i's found coordinates are
    ``x[offsets[i]:offsets[i+1]]`` — identical values to per-way
    resolve+mask, so downstream reductions are byte-equal."""
    nl = ways.column("node_ids").combine_chunks()
    lens = (
        pc.fill_null(pc.list_value_length(nl), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(nl).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    fx, fy, found = lookup.resolve(flat)
    # compact to found-only, per-way offsets via cumsum-diff (robust to
    # empty groups, unlike reduceat)
    cs = np.concatenate([[0], np.cumsum(found)])
    new_offs = cs[offs]
    return fx[found], fy[found], new_offs


def way_geoms(
    ways: pa.Table, lookup: NodeCoordLookup, cfg: EngineConfig = DEFAULT_CONFIG
) -> pa.Table:
    """Assemble way geometries from member node coordinates."""
    rows = []
    ids = ways.column("id").to_pylist()
    gx, gy, goffs = _resolved_way_coords(ways, lookup)
    for i, oid in enumerate(ids):
        x = gx[goffs[i] : goffs[i + 1]]
        y = gy[goffs[i] : goffs[i + 1]]
        if len(x) == 0:
            rows.append(_empty_geom_row("way", oid))
            continue
        closed = len(x) >= 4 and x[0] == x[-1] and y[0] == y[-1]
        if closed:
            w = wkt.polygon_wkt(x, y, cfg.wkt_precision)
            area = geo.ring_area(x, y)
        else:
            w = wkt.linestring_wkt(x, y, cfg.wkt_precision)
            area = 0.0
        rows.append(_facts("way", oid, x, y, w, geo.line_length(x, y), area, cfg))
    return pa.Table.from_pylist(rows, schema=GEOMS)


def way_nodes_map(way_table: pa.Table) -> dict:
    """way id -> member node list (the relation-assembly lookup);
    build once per actor, not once per batch."""
    return {
        i: refs
        for i, refs in zip(
            way_table.column("id").to_pylist(),
            way_table.column("node_ids").to_pylist(),
        )
    }


def relation_geoms(
    rels: pa.Table,
    way_table: pa.Table,
    lookup: NodeCoordLookup,
    cfg: EngineConfig = DEFAULT_CONFIG,
    way_nodes: dict | None = None,
) -> pa.Table:
    """Assemble relation geometries from member ways (+ point members)."""
    if way_nodes is None:
        # build the way->nodes map only for ways actually referenced by
        # these relations (way_table is often the whole window universe)
        refs = [
            m["ref"]
            for members in rels.column("members").to_pylist()
            for m in members or []
            if m["type"] == "way"
        ]
        if len(refs) < way_table.num_rows:
            way_table = way_table.filter(
                pc.is_in(
                    way_table.column("id"),
                    value_set=pa.array(sorted(set(refs)), type=pa.int64()),
                )
            )
        way_nodes = way_nodes_map(way_table)
    rows = []
    for oid, members, tags in zip(
        rels.column("id").to_pylist(),
        rels.column("members").to_pylist(),
        rels.column("tags").to_pylist(),
    ):
        tagmap = dict(tags or [])
        is_area = tagmap.get("type") in ("multipolygon", "boundary")
        xs, ys, rings = [], [], []
        for m in members or []:
            if m["type"] == "way":
                refs = np.asarray(way_nodes.get(m["ref"]) or [], dtype=np.int64)
                x, y, found = lookup.resolve(refs)
                x, y = x[found], y[found]
                if len(x) == 0:
                    continue
                xs.append(x)
                ys.append(y)
                closed = len(x) >= 4 and x[0] == x[-1] and y[0] == y[-1]
                if closed:
                    rings.append((x, y, m.get("role") or "outer"))
            elif m["type"] == "node":
                x, y, found = lookup.resolve(np.asarray([m["ref"]], dtype=np.int64))
                if found[0]:
                    xs.append(x)
                    ys.append(y)
            # relation members contribute nothing (rel-of-rel geometries
            # are not computed — parity with osm2rdf / the reference's
            # cascade cutoff, src/osm/OsmChangeHandler.cpp:270-285)
        if not xs:
            rows.append(_empty_geom_row("relation", oid))
            continue
        ax = np.concatenate(xs)
        ay = np.concatenate(ys)
        length = sum(geo.line_length(x, y) for x, y in zip(xs, ys))
        if is_area and rings:
            polys = ",".join(
                "(("
                + ",".join(
                    f"{wkt.fmt_coord(a, cfg.wkt_precision)} "
                    f"{wkt.fmt_coord(b, cfg.wkt_precision)}"
                    for a, b in zip(x, y)
                )
                + "))"
                for x, y, _role in rings
            )
            w = f"MULTIPOLYGON({polys})"
            area = sum(
                geo.ring_area(x, y) * (-1.0 if role == "inner" else 1.0)
                for x, y, role in rings
            )
            area = max(area, 0.0)
        else:
            lines = ",".join(
                "("
                + ",".join(
                    f"{wkt.fmt_coord(a, cfg.wkt_precision)} "
                    f"{wkt.fmt_coord(b, cfg.wkt_precision)}"
                    for a, b in zip(x, y)
                )
                + ")"
                for x, y in zip(xs, ys)
            )
            w = f"MULTILINESTRING({lines})"
            area = 0.0
        rows.append(_facts("relation", oid, ax, ay, w, length, area, cfg))
    return pa.Table.from_pylist(rows, schema=GEOMS)


def polygon_rings_from_osm(
    ways: pa.Table,
    rels: pa.Table,
    lookup: NodeCoordLookup,
    way_nodes_source: pa.Table | None = None,
    way_nodes: dict | None = None,
) -> pa.Table:
    """Build the spatial-join polygon layer from OSM objects:
    closed tagged ways and area relations -> POLYGON_RINGS rows.

    polygon_id namespacing: way polygons keep their way id; relation
    polygons use ``rel_id + REL_POLY_OFFSET`` to stay disjoint.

    ``way_nodes_source``: table to resolve RELATION member-way node
    lists from (defaults to ``ways``).  On the delta path this must be
    the full way universe (reconstructed + upserted), not just the
    recomputed ways — a relation modified without its member ways in
    the change window still needs those ways' node lists to rebuild
    its rings (same universe relation_geoms uses).
    """
    rows = []

    def add_ring(pid: int, ridx: int, role: str, x: np.ndarray, y: np.ndarray):
        if len(x) < 4:
            return
        rows.append(
            {
                "polygon_id": pid,
                "ring_idx": ridx,
                "role": role,
                "lons": x.tolist(),
                "lats": y.tolist(),
                "min_lon": float(x.min()),
                "min_lat": float(y.min()),
                "max_lon": float(x.max()),
                "max_lat": float(y.max()),
                "area": geo.ring_area(x, y),
            }
        )

    gx, gy, goffs = _resolved_way_coords(ways, lookup)
    for i, (oid, tags) in enumerate(
        zip(ways.column("id").to_pylist(), ways.column("tags").to_pylist())
    ):
        if not tags:
            continue
        x = gx[goffs[i] : goffs[i + 1]]
        y = gy[goffs[i] : goffs[i + 1]]
        if len(x) >= 4 and x[0] == x[-1] and y[0] == y[-1]:
            add_ring(int(oid), 0, "outer", x, y)

    if way_nodes is None:
        src = way_nodes_source if way_nodes_source is not None else ways
        way_nodes = way_nodes_map(src)
    for oid, members, tags in zip(
        rels.column("id").to_pylist(),
        rels.column("members").to_pylist(),
        rels.column("tags").to_pylist(),
    ):
        tagmap = dict(tags or [])
        if tagmap.get("type") not in ("multipolygon", "boundary"):
            continue
        ridx = 0
        for m in members or []:
            if m["type"] != "way":
                continue
            refs = np.asarray(way_nodes.get(m["ref"]) or [], dtype=np.int64)
            x, y, found = lookup.resolve(refs)
            x, y = x[found], y[found]
            if len(x) >= 4 and x[0] == x[-1] and y[0] == y[-1]:
                role = "inner" if (m.get("role") == "inner") else "outer"
                add_ring(int(oid) + REL_POLY_OFFSET, ridx, role, x, y)
                ridx += 1
    if not rows:
        return POLYGON_RINGS.empty_table()
    return pa.Table.from_pylist(rows, schema=POLYGON_RINGS)


REL_POLY_OFFSET = 1 << 40


# ---------------------------------------------------------------------------
# distributed bootstrap builders (planet-scale path): the SAME per-batch
# functions above, fanned out with map_batches over each layer, with the
# node-coordinate lookup (and the way table for relation assembly)
# broadcast ONCE via ray.put — per-way/per-relation outputs don't depend
# on batching, so results are byte-identical to the driver-side path
# (the delta pipeline keeps calling the plain functions on its
# delta-sized inputs).
# ---------------------------------------------------------------------------
class _WayGeomBatcher:
    def __init__(self, lookup_ref, cfg: EngineConfig):
        import ray

        self.lookup = ray.get(lookup_ref)
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return way_geoms(batch, self.lookup, self.cfg)


class _RelGeomBatcher:
    def __init__(self, lookup_ref, ways_ref, cfg: EngineConfig):
        import ray

        self.lookup = ray.get(lookup_ref)
        self.ways = ray.get(ways_ref)
        self.way_nodes = way_nodes_map(self.ways)
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return relation_geoms(
            batch, self.ways, self.lookup, self.cfg, way_nodes=self.way_nodes
        )


class _WayRingBatcher:
    def __init__(self, lookup_ref, rels_schema: pa.Schema):
        import ray

        self.lookup = ray.get(lookup_ref)
        self.empty_rels = rels_schema.empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return polygon_rings_from_osm(batch, self.empty_rels, self.lookup)


class _RelRingBatcher:
    def __init__(self, lookup_ref, ways_ref, ways_schema: pa.Schema):
        import ray

        self.lookup = ray.get(lookup_ref)
        self.way_nodes = way_nodes_map(ray.get(ways_ref))
        self.empty_ways = ways_schema.empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return polygon_rings_from_osm(
            self.empty_ways, batch, self.lookup, way_nodes=self.way_nodes
        )


def _collect(ds, schema: pa.Schema) -> pa.Table:
    parts = [
        b
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")
        if b.num_rows
    ]
    return pa.concat_tables(parts).cast(schema) if parts else schema.empty_table()


def build_geoms_distributed(
    nodes: pa.Table,
    ways: pa.Table,
    relations: pa.Table,
    lookup: NodeCoordLookup,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> pa.Table:
    """Bootstrap derived-facts build as Ray map_batches stages (one
    task pool per layer, lookup/way-table broadcast once)."""
    import ray
    import ray.data as rd

    lookup_ref = ray.put(lookup)
    ways_ref = ray.put(ways)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(8, ncpu * 2)

    def _layer(table: pa.Table, cls, *args):
        if table.num_rows == 0:
            return None
        ds = (
            rd.from_arrow(table)
            .repartition(min(nparts, max(1, table.num_rows // 512)))
            .map_batches(
                cls,
                fn_constructor_args=args,
                batch_format="pyarrow",
                concurrency=(1, max(2, ncpu - 1)),
            )
        )
        return _collect(ds, GEOMS)

    parts = [
        _layer(nodes, _NodeGeomBatcher, cfg),
        _layer(ways, _WayGeomBatcher, lookup_ref, cfg),
        _layer(relations, _RelGeomBatcher, lookup_ref, ways_ref, cfg),
    ]
    parts = [p for p in parts if p is not None and p.num_rows]
    return pa.concat_tables(parts) if parts else GEOMS.empty_table()


class _NodeGeomBatcher:
    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return node_geoms(batch, self.cfg)


def build_rings_distributed(
    ways: pa.Table,
    relations: pa.Table,
    lookup: NodeCoordLookup,
) -> pa.Table:
    """Bootstrap polygon-ring layer as Ray map_batches stages; ring
    output order is normalized by the caller's keyed upsert (rows keyed
    by (polygon_id, ring_idx), both independent of batching)."""
    import ray
    import ray.data as rd

    lookup_ref = ray.put(lookup)
    ways_ref = ray.put(ways)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(8, ncpu * 2)
    parts = []
    if ways.num_rows:
        ds = (
            rd.from_arrow(ways)
            .repartition(min(nparts, max(1, ways.num_rows // 512)))
            .map_batches(
                _WayRingBatcher,
                fn_constructor_args=(lookup_ref, relations.schema),
                batch_format="pyarrow",
                concurrency=(1, max(2, ncpu - 1)),
            )
        )
        parts.append(_collect(ds, POLYGON_RINGS))
    if relations.num_rows:
        ds = (
            rd.from_arrow(relations)
            .repartition(min(nparts, max(1, relations.num_rows // 512)))
            .map_batches(
                _RelRingBatcher,
                fn_constructor_args=(lookup_ref, ways_ref, ways.schema),
                batch_format="pyarrow",
                concurrency=(1, max(2, ncpu - 1)),
            )
        )
        parts.append(_collect(ds, POLYGON_RINGS))
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts) if parts else POLYGON_RINGS.empty_table()
