"""Spatial join: geocode -> cell encode -> point-in-polygon + kNN ->
tile assignment.

Ray Data realization of the target's core join (north_rule): pages
stream through ``map_batches`` stages; the polygon layer and the node
layer are the SMALL sides, broadcast once via ``ray.put`` and indexed
per actor (``__init__``), so the join is shuffle-free.  For a polygon
layer too big to broadcast there is a hash-partitioned variant keyed
on ``cell_id`` with salting for skewed mega-cells
(:func:`spatial_join_partitioned`).

Semantics (mirrored exactly by the SQL oracles):
  * ``polygon_id``: containing polygon minimizing (area, polygon_id);
    -1 when none contains the page.  Containment = inside any outer
    ring and not inside any inner ring.
  * ``knn_node_id``/``knn_dist``: node minimizing
    ``(dx*dx + dy*dy, node_id)`` (squared planar degree distance,
    exact grid ring search); -1/NULL when the node layer is empty.
  * ``cell_id``/``tile_id``: functions/cells.py grid encoding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions import cells as cellfn
from ..functions import geo
from ..schemas import PAGE_TILE_ASSIGNMENTS

_GEO_PATTERN = r'geo\.position" content="(?P<glat>-?[0-9.]+);(?P<glon>-?[0-9.]+)"'


class Geocoder:
    """Geocoding stage (stateful actor: compiled pattern + counters).

    Extracts (lat;lon) from the page's geo.position meta tag with a
    vectorized RE2 kernel and appends lon/lat/cell_id/tile_id.  Pages
    without coordinates keep null lon/lat and cell_id = -1 (dropped
    from the join downstream, counted).
    """

    def __init__(self, config: EngineConfig = DEFAULT_CONFIG):
        self.config = config
        self.n_pages = 0
        self.n_nogeo = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column("html")
        ex = pc.extract_regex(pc.cast(html, pa.string()), pattern=_GEO_PATTERN)
        lat = pc.cast(pc.struct_field(ex, "glat"), pa.float64())
        lon = pc.cast(pc.struct_field(ex, "glon"), pa.float64())
        lon_np = lon.to_numpy(zero_copy_only=False)
        lat_np = lat.to_numpy(zero_copy_only=False)
        ok = ~(np.isnan(lon_np) | np.isnan(lat_np))
        cell = np.full(len(lon_np), -1, dtype=np.int64)
        tile = np.full(len(lon_np), -1, dtype=np.int64)
        if ok.any():
            cell[ok] = cellfn.cell_id(lon_np[ok], lat_np[ok], self.config.cell_res_deg)
            tile[ok] = cellfn.tile_id(lon_np[ok], lat_np[ok], self.config.tile_res_deg)
        self.n_pages += len(lon_np)
        self.n_nogeo += int((~ok).sum())
        out = batch.append_column("lon", lon)
        out = out.append_column("lat", lat)
        out = out.append_column("cell_id", pa.array(cell))
        out = out.append_column("tile_id", pa.array(tile))
        return out


class PolygonIndex:
    """Cell-bucketed polygon index (the per-cell packed STR-tree analog;
    bboxes + rings in flat numpy, candidates by covering cell)."""

    def __init__(self, rings: pa.Table, cell_res: float = 1.0):
        self.cell_res = cell_res
        pids = rings.column("polygon_id").to_numpy(zero_copy_only=False)
        roles = np.asarray(rings.column("role").to_pylist(), dtype=object)
        lons = rings.column("lons").to_pylist()
        lats = rings.column("lats").to_pylist()
        areas = rings.column("area").to_numpy(zero_copy_only=False)
        # per-polygon structures; each ring keeps its own bbox
        self.rings_by_poly: dict[int, dict] = {}
        for pid, role, lx, ly, ar in zip(pids, roles, lons, lats, areas):
            e = self.rings_by_poly.setdefault(
                int(pid), {"outer": [], "inner": [], "area": 0.0}
            )
            x = np.asarray(lx)
            y = np.asarray(ly)
            bbox = (x.min(), y.min(), x.max(), y.max())
            e[role if role in ("outer", "inner") else "outer"].append((x, y, bbox))
            e["area"] += float(ar) if role != "inner" else -float(ar)
        # cell -> candidate polygon ids, registered PER OUTER RING bbox
        # (a multipolygon's union bbox can span the world; a point can
        # only be inside it within some outer ring's own bbox)
        self.by_cell: dict[int, list[int]] = {}
        for pid, e in self.rings_by_poly.items():
            seen: set[int] = set()
            for _x, _y, b in e["outer"]:
                for c in cellfn.cells_covering_bbox(b[0], b[1], b[2], b[3], cell_res):
                    if int(c) not in seen:
                        seen.add(int(c))
                        self.by_cell.setdefault(int(c), []).append(pid)

    def assign(self, cell: int, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Winning polygon_id per point (smallest area, then id); -1 none."""
        n = len(px)
        best_pid = np.full(n, -1, dtype=np.int64)
        best_area = np.full(n, np.inf)
        for pid in self.by_cell.get(int(cell), ()):
            e = self.rings_by_poly[pid]
            inside = np.zeros(n, dtype=bool)
            for x, y, b in e["outer"]:
                inbox = (px >= b[0]) & (px <= b[2]) & (py >= b[1]) & (py <= b[3])
                if inbox.any():
                    ib = np.where(inbox)[0]
                    inside[ib] |= geo.points_in_ring(px[ib], py[ib], x, y)
            if not inside.any():
                continue
            for x, y, b in e["inner"]:
                cur = np.where(inside)[0]
                if not len(cur):
                    break
                inside[cur] &= ~geo.points_in_ring(px[cur], py[cur], x, y)
            if not inside.any():
                continue
            hit = np.where(inside)[0]
            a = e["area"]
            better = (a < best_area[hit]) | (
                (a == best_area[hit]) & (pid < best_pid[hit])
            ) | (best_pid[hit] == -1)
            upd = hit[better]
            best_pid[upd] = pid
            best_area[upd] = a
        return best_pid


class GridNodeIndex:
    """Cell-bucketed node layer with exact kNN (the per-cell KD-tree
    analog of north_rule, in pure numpy).

    Layout: nodes sorted by (cell, id); occupied cells as a sorted
    int64 array with CSR offsets.  A query for cell ``c`` gathers the
    candidate set C(c) = all nodes within Chebyshev cell-ring R, where
    R is chosen so no node outside C(c) can beat a node inside it:
    after finding a node within ring r, the nearest node to any point
    of ``c`` is at distance <= (r+1)*sqrt(2)*res, while any node
    outside ring R is at distance >= (R-1)*res — so R = ceil(sqrt(2) *
    (r+1)) + 2 suffices.  C(c) is query-independent => memoized per
    cell, amortized across the whole run.
    """

    def __init__(self, ids: np.ndarray, lons: np.ndarray, lats: np.ndarray,
                 cell_res: float = 1.0):
        self.cell_res = cell_res
        cells = cellfn.cell_id(lons, lats, cell_res)
        order = np.lexsort((ids, cells))
        self.ids = ids[order].astype(np.int64)
        self.lons = lons[order]
        self.lats = lats[order]
        cs = cells[order]
        self.ucells, starts = np.unique(cs, return_index=True)
        self.offsets = np.append(starts, len(cs))
        self.nx = int(np.floor(360.0 / cell_res))
        self.ny = int(np.floor(180.0 / cell_res))
        self.max_r = max(self.nx, self.ny)
        self._memo: dict[int, np.ndarray] = {}

    def _occupied_in_square(self, ix: int, iy: int, r: int) -> np.ndarray:
        """Positions (into ucells) of occupied cells within Chebyshev
        distance r of (ix, iy) — vectorized key probe."""
        x0, x1 = max(ix - r, 0), min(ix + r, self.nx - 1)
        y0, y1 = max(iy - r, 0), min(iy + r, self.ny - 1)
        xs = np.arange(x0, x1 + 1, dtype=np.int64)
        ys = np.arange(y0, y1 + 1, dtype=np.int64)
        keys = ((xs[:, None] << np.int64(32)) | ys[None, :]).ravel()
        pos = np.searchsorted(self.ucells, keys)
        pos = pos[pos < len(self.ucells)]
        return pos[np.isin(self.ucells[pos], keys)]

    def candidates(self, cell: int) -> np.ndarray:
        """Memoized candidate node positions for queries inside ``cell``."""
        got = self._memo.get(cell)
        if got is not None:
            return got
        ix, iy = int(cell >> 32), int(cell & 0xFFFFFFFF)
        r = 0
        hits = np.empty(0, dtype=np.int64)
        # doubling probe for the first non-empty square...
        while r <= self.max_r:
            hits = self._occupied_in_square(ix, iy, r)
            if len(hits):
                break
            r = 1 if r == 0 else r * 2
        if not len(hits):
            out = np.empty(0, dtype=np.int64)
        else:
            # ...then binary-search the exact first-hit radius so the
            # final candidate square stays tight
            lo, hi = (r // 2 + 1, r) if r > 1 else (0, r)
            while lo < hi:
                mid = (lo + hi) // 2
                if len(self._occupied_in_square(ix, iy, mid)):
                    hi = mid
                else:
                    lo = mid + 1
            R = int(np.ceil(np.sqrt(2.0) * (hi + 1))) + 2
            hits = self._occupied_in_square(ix, iy, R)
            out = np.concatenate(
                [
                    np.arange(self.offsets[p], self.offsets[p + 1])
                    for p in hits.tolist()
                ]
            )
            # pre-sort by node id so knn1 can skip its per-call sort
            out = out[np.argsort(self.ids[out], kind="stable")]
        if len(self._memo) > 100_000:  # bound actor memory
            self._memo.clear()
        self._memo[cell] = out
        return out

    def knn1(self, cell: int, px: np.ndarray, py: np.ndarray
             ) -> tuple[np.ndarray, np.ndarray]:
        """Exact nearest node (smallest (dist², id)) for points in ``cell``."""
        n = len(px)
        if len(self.ids) == 0:
            return np.full(n, -1, dtype=np.int64), np.full(n, np.nan)
        cand = self.candidates(cell)
        if not len(cand):
            return np.full(n, -1, dtype=np.int64), np.full(n, np.nan)
        return geo.sq_dist_argmin(
            px, py, self.lons[cand], self.lats[cand], self.ids[cand],
            ids_sorted=True,
        )


class SpatialJoiner:
    """Actor-pool stage: pages_geo batches -> PAGE_TILE_ASSIGNMENTS.

    ``poly_ref``/``node_ref`` are ``ray.ObjectRef``s (broadcast once on
    the driver) or plain objects (tests).  Index construction happens
    ONCE per actor in ``__init__``.
    """

    def __init__(self, poly_ref, node_ref, config: EngineConfig = DEFAULT_CONFIG):
        import ray

        polys = ray.get(poly_ref) if hasattr(poly_ref, "hex") else poly_ref
        nodes = ray.get(node_ref) if hasattr(node_ref, "hex") else node_ref
        self.config = config
        self.pindex = PolygonIndex(polys, config.cell_res_deg)
        self.nindex = GridNodeIndex(
            nodes["id"], nodes["lon"], nodes["lat"], config.cell_res_deg
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell = batch.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = cell >= 0
        urls = batch.column("url")
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        tile = batch.column("tile_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(cell)
        pid = np.full(n, -1, dtype=np.int64)
        kid = np.full(n, -1, dtype=np.int64)
        kd = np.full(n, np.nan)
        # sort-based grouping: one contiguous run per cell (O(n log n),
        # not O(n * n_cells))
        order = np.argsort(cell, kind="stable")
        cs = cell[order]
        run_starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(cs)) + 1, [n]]
        )
        for s, e in zip(run_starts[:-1], run_starts[1:]):
            c = int(cs[s])
            if c < 0:
                continue
            g = order[s:e]
            pid[g] = self.pindex.assign(c, lon[g], lat[g])
            bid, bd = self.nindex.knn1(c, lon[g], lat[g])
            kid[g] = bid
            kd[g] = bd
        out = pa.Table.from_arrays(
            [
                urls.combine_chunks(),
                pa.array(cell),
                pa.array(pid),
                pa.array(kid),
                pa.array(kd),
                pa.array(tile),
            ],
            schema=PAGE_TILE_ASSIGNMENTS,
        )
        return out.filter(pa.array(keep))


def broadcast_layers(polygons: pa.Table, nodes: pa.Table):
    """``ray.put`` the small sides once; returns (poly_ref, node_ref)."""
    import ray

    node_arrays = {
        "id": nodes.column("id").to_numpy(zero_copy_only=False).astype(np.int64),
        "lon": nodes.column("lon").to_numpy(zero_copy_only=False),
        "lat": nodes.column("lat").to_numpy(zero_copy_only=False),
    }
    return ray.put(polygons), ray.put(node_arrays)


def spatial_join(
    pages_geo_ds,
    polygons: pa.Table,
    nodes: pa.Table,
    config: EngineConfig = DEFAULT_CONFIG,
    concurrency=None,
):
    """pages_geo Dataset -> assignments Dataset (broadcast join path)."""
    poly_ref, node_ref = broadcast_layers(polygons, nodes)
    kwargs = dict(
        fn_constructor_args=(poly_ref, node_ref, config),
        batch_format="pyarrow",
        batch_size=config.map_batch_size,
    )
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    elif config.spatial_concurrency:
        kwargs["concurrency"] = config.spatial_concurrency
    else:
        kwargs["concurrency"] = (1, 8)
    return pages_geo_ds.map_batches(SpatialJoiner, **kwargs)


def geocode(pages_ds, config: EngineConfig = DEFAULT_CONFIG):
    """pages Dataset -> pages_geo Dataset."""
    return pages_ds.map_batches(
        Geocoder,
        fn_constructor_args=(config,),
        batch_format="pyarrow",
        batch_size=config.map_batch_size,
        concurrency=(1, 8),
    )
