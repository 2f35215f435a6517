"""Regional clipping of a change window — the engine analog of the
reference's ``osmium extract --bbox/--polygon -s <strategy>`` subprocess
(reference: src/osm/OsmUpdater.cpp:281-304 applyBoundaries; option
validation src/config/Config.cpp:267-339: --bbox XOR --polygon,
strategy in {simple, complete_ways, smart}, default smart).

Strategies over the CHANGE WINDOW (the file being clipped is the change
batch, so membership tests use what the window itself contains — the
same information osmium has when clipping a change file):

  simple        — nodes kept iff inside the region; a way/relation is
                  kept iff at least one of its member nodes present in
                  the window is kept (objects whose members don't
                  appear in the window are kept — undecidable, and the
                  reconstruction path tolerates missing members).
  complete_ways — simple, plus the member nodes of every kept way are
                  kept even when they fall outside the region.
  smart         — complete_ways, plus kept multipolygon/boundary
                  relations keep ALL their member ways (and those
                  ways' nodes) present in the window.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import geo

STRATEGIES = ("simple", "complete_ways", "smart")


def parse_poly_file(path: str) -> list[tuple[np.ndarray, np.ndarray]]:
    """Osmium/Osmosis ``.poly`` format: name line, per-ring section
    (optional name, ``lon lat`` per line, ``END``), final ``END``.
    Rings prefixed with ``!`` are holes — returned with reversed role
    by the caller's even-odd test (even-odd handles holes natively)."""
    rings: list[tuple[np.ndarray, np.ndarray]] = []
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    i = 1  # skip the polygon name line
    while i < len(lines):
        ln = lines[i]
        if ln == "END":
            break
        # section header (ring name, possibly "!hole")
        i += 1
        xs: list[float] = []
        ys: list[float] = []
        while i < len(lines) and lines[i] != "END":
            parts = lines[i].split()
            xs.append(float(parts[0]))
            ys.append(float(parts[1]))
            i += 1
        i += 1  # consume ring END
        if len(xs) >= 3:
            rings.append((np.asarray(xs), np.asarray(ys)))
    if not rings:
        raise ValueError(f"no rings in polygon file {path}")
    return rings


def region_mask_bbox(
    lon: np.ndarray, lat: np.ndarray, bbox: tuple[float, float, float, float]
) -> np.ndarray:
    min_lon, min_lat, max_lon, max_lat = bbox
    return (
        (lon >= min_lon) & (lon <= max_lon) & (lat >= min_lat) & (lat <= max_lat)
    )


def region_mask_polygon(
    lon: np.ndarray, lat: np.ndarray, rings: list[tuple[np.ndarray, np.ndarray]]
) -> np.ndarray:
    """Even-odd composition over all rings (holes flip membership)."""
    inside = np.zeros(len(lon), dtype=bool)
    for rx, ry in rings:
        inside ^= geo.points_in_ring(lon, lat, rx, ry)
    return inside


def clip_changes(
    changes: pa.Table,
    inside_fn,
    strategy: str = "smart",
) -> pa.Table:
    """Clip a change window to a region.  ``inside_fn(lon, lat) ->
    bool mask`` tests node positions; nulls (non-node rows) are never
    passed to it."""
    if strategy not in STRATEGIES:
        raise ValueError(
            f"unknown extract strategy {strategy!r}; expected one of "
            f"{STRATEGIES} (reference Config.cpp:267-339)"
        )
    types = np.asarray(changes.column("type").to_pylist(), dtype=object)
    ids = changes.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    lon = changes.column("lon").to_numpy(zero_copy_only=False)
    lat = changes.column("lat").to_numpy(zero_copy_only=False)
    is_node = types == "node"
    node_in = np.zeros(len(types), dtype=bool)
    has_pos = is_node & ~np.isnan(lon) & ~np.isnan(lat)
    if has_pos.any():
        node_in[has_pos] = inside_fn(lon[has_pos], lat[has_pos])
    # deleted nodes carry no position: keep them (their effect is a
    # removal; the delta path no-ops if the id is absent from the store)
    node_in |= is_node & ~has_pos

    kept_node_ids = set(ids[is_node & node_in].tolist())
    windowed_node_ids = set(ids[is_node].tolist())

    node_lists = changes.column("node_ids").to_pylist()
    member_lists = changes.column("members").to_pylist()

    def way_kept(refs) -> bool:
        refs = refs or []
        in_window = [r for r in refs if r in windowed_node_ids]
        if not in_window:
            return True  # undecidable from the window — keep
        return any(r in kept_node_ids for r in in_window)

    keep = np.zeros(len(types), dtype=bool)
    keep[is_node] = node_in[is_node]
    way_rows = np.flatnonzero(types == "way")
    for i in way_rows:
        keep[i] = way_kept(node_lists[i])
    kept_way_ids = set(ids[way_rows[keep[way_rows]]].tolist())
    windowed_way_ids = set(ids[types == "way"].tolist())

    rel_rows = np.flatnonzero(types == "relation")
    tags_list = changes.column("tags").to_pylist()
    for i in rel_rows:
        members = member_lists[i] or []
        in_window = [
            m for m in members
            if (m["type"] == "node" and m["ref"] in windowed_node_ids)
            or (m["type"] == "way" and m["ref"] in windowed_way_ids)
        ]
        if not in_window:
            keep[i] = True
        else:
            keep[i] = any(
                (m["type"] == "node" and m["ref"] in kept_node_ids)
                or (m["type"] == "way" and m["ref"] in kept_way_ids)
                for m in in_window
            )

    if strategy in ("complete_ways", "smart"):
        # member nodes of kept ways are kept even outside the region
        needed: set[int] = set()
        for i in way_rows:
            if keep[i]:
                needed.update(node_lists[i] or [])
        if strategy == "smart":
            # kept AREA relations additionally keep all their member
            # ways (and those ways' nodes) present in the window
            for i in rel_rows:
                if not keep[i]:
                    continue
                tagmap = dict(tags_list[i] or [])
                if tagmap.get("type") not in ("multipolygon", "boundary"):
                    continue
                for m in member_lists[i] or []:
                    if m["type"] == "way":
                        needed_way = m["ref"]
                        for j in way_rows:
                            if ids[j] == needed_way:
                                keep[j] = True
                                needed.update(node_lists[j] or [])
                    elif m["type"] == "node":
                        needed.add(m["ref"])
        for i in np.flatnonzero(is_node):
            if ids[i] in needed:
                keep[i] = True

    return changes.filter(pa.array(keep))
