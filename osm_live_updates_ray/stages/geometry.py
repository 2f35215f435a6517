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
        "convex_hull_wkt": None, "length": None, "area": None,
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
    if cfg.with_length:
        row["length"] = length
    if cfg.with_area:
        row["area"] = area
    return row


def node_geoms(nodes: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Per-node derived facts (geometry = POINT, 7-decimal canonical)."""
    ids = nodes.column("id").to_numpy(zero_copy_only=False)
    lon = nodes.column("lon").to_numpy(zero_copy_only=False)
    lat = nodes.column("lat").to_numpy(zero_copy_only=False)
    rows = [
        _facts("node", int(i), np.array([a]), np.array([b]),
               wkt.point_wkt(a, b, cfg.wkt_precision), 0.0, 0.0, cfg)
        for i, a, b in zip(ids.tolist(), lon.tolist(), lat.tolist())
    ]
    return pa.Table.from_pylist(rows, schema=GEOMS)


def way_geoms(
    ways: pa.Table, lookup: NodeCoordLookup, cfg: EngineConfig = DEFAULT_CONFIG
) -> pa.Table:
    """Assemble way geometries from member node coordinates."""
    rows = []
    ids = ways.column("id").to_pylist()
    node_lists = ways.column("node_ids").to_pylist()
    for oid, refs in zip(ids, node_lists):
        refs = np.asarray(refs or [], dtype=np.int64)
        x, y, found = lookup.resolve(refs)
        x, y = x[found], y[found]
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


def relation_geoms(
    rels: pa.Table,
    way_table: pa.Table,
    lookup: NodeCoordLookup,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> pa.Table:
    """Assemble relation geometries from member ways (+ point members)."""
    way_nodes = {
        i: refs
        for i, refs in zip(
            way_table.column("id").to_pylist(), way_table.column("node_ids").to_pylist()
        )
    }
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

    for oid, refs, tags in zip(
        ways.column("id").to_pylist(),
        ways.column("node_ids").to_pylist(),
        ways.column("tags").to_pylist(),
    ):
        if not tags:
            continue
        refs = np.asarray(refs or [], dtype=np.int64)
        x, y, found = lookup.resolve(refs)
        x, y = x[found], y[found]
        if len(x) >= 4 and x[0] == x[-1] and y[0] == y[-1]:
            add_ring(int(oid), 0, "outer", x, y)

    src = way_nodes_source if way_nodes_source is not None else ways
    way_nodes = {
        i: refs
        for i, refs in zip(
            src.column("id").to_pylist(), src.column("node_ids").to_pylist()
        )
    }
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
