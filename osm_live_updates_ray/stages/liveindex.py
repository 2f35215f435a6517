"""Incrementally-maintained join-layer indexes (O(delta) per window).

The reference re-derives nothing per change file — its "index" is the
SPARQL endpoint, updated in place by delete+insert.  Our per-window
analog used to rebuild :class:`~.spatial.PolygonIndex` /
:class:`~.spatial.GridNodeIndex` from ``read_all`` every window: O(layer)
per window, which busts a minute cadence at planet scale.  This module
keeps both indexes LIVE across windows:

* **base** — the full index built once (per process / per compaction),
* **tombstones** — deleted base entries are masked out (polygon-id set
  for PIP; coordinate sentinels for kNN, with per-cell live counts so
  the certified-search premise "every occupied cell holds a live node"
  is preserved — a cell whose last live node dies triggers compaction),
* **overlay** — a small index over every row upserted since the base
  was built; queries answer ``merge(base minus tombstones, overlay)``
  with the exact same (area, pid) / (dist², id) orderings as a fresh
  build, so results are bit-identical to rebuilding from scratch,
* **compaction** — when the overlay or tombstone set outgrows a fixed
  fraction of the base, the holder rebuilds from the store (amortized
  O(layer / window-count) per window).

Exactness argument: the live node/polygon set is partitioned into
(base − tombstoned) ⊎ overlay; each side's query is exact over its
partition, and min over a partition of minima is the global min under
the same total order.  The kNN certificate inside the base is sound
under coordinate-sentinel tombstones because sentinels can only
INFLATE a phase-1 best distance (forcing the conservative fallback,
never a wrong accept), and the fallback's candidate-square premise —
a live node exists within the occupancy-derived radius — is maintained
by compacting the moment any occupied cell loses its last live node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig
from ..functions import cells as cellfn
from ..functions import geo
from .spatial import GridNodeIndex, PolygonIndex, _DenseCellSub

_MAXI = np.iinfo(np.int64).max
#: far-sentinel for tombstoned node coordinates: any live node beats it
_SENT = 1.0e30


def _merge_knn(id_a, d_a, id_b, d_b):
    """min by (dist², id) across two exact partial answers; keeps side
    A's nan/inf conventions when neither side has a node."""
    ka = np.where(id_a < 0, _MAXI, id_a)
    kb = np.where(id_b < 0, _MAXI, id_b)
    da = np.where((id_a < 0) | np.isnan(d_a), np.inf, d_a)
    db = np.where((id_b < 0) | np.isnan(d_b), np.inf, d_b)
    take_b = (db < da) | ((db == da) & (kb < ka))
    return np.where(take_b, id_b, id_a), np.where(take_b, d_b, d_a)


class SmallNodeIndex:
    """Exact per-cell nearest-node over a SMALL node set (the overlay).

    No O(grid) radius table: with few occupied cells, the certified
    search radius for a query cell is derived per cell by a direct
    Chebyshev scan over the occupied-cell list (O(#occupied)), then the
    candidate set is every node whose cell lies within that radius —
    the same guarantee as GridNodeIndex (a node within Chebyshev ring r
    is at most (r+1)·√2·res away; anything beyond ring R =
    ceil(√2·(r+1))+1 is at least (R−1)·res ≥ that away).
    """

    def __init__(self, ids: np.ndarray, lons: np.ndarray, lats: np.ndarray,
                 cell_res: float):
        self.cell_res = cell_res
        cells = cellfn.cell_id(lons, lats, cell_res)
        order = np.lexsort((ids, cells))
        self.ids = ids[order].astype(np.int64)
        self.lons = lons[order].astype(np.float64)
        self.lats = lats[order].astype(np.float64)
        cs = cells[order]
        self.ucells, starts = np.unique(cs, return_index=True)
        self.offsets = np.append(starts, len(cs))
        self._oix = (self.ucells >> np.int64(32)).astype(np.int64)
        self._oiy = (self.ucells & np.int64(0xFFFFFFFF)).astype(np.int64)
        #: thread-safety contract (ADVICE r3): instances are queried
        #: from the driver thread-pool's racing threads — memo reads are
        #: lock-free (dict.get is atomic under the GIL; values are
        #: immutable-once-published arrays that outlive a clear), and
        #: the compound clear-then-insert on the write side is guarded
        #: by ``_memo_lock`` so a cap-triggered clear can never
        #: interleave with a concurrent insert.
        self._memo: dict[int, np.ndarray] = {}
        import threading

        self._memo_lock = threading.Lock()

    # Lock objects are not cloudpickle-able; live indexes travel via
    # ray.put.  Ship WITHOUT the memo (receivers rebuild their own).
    def __getstate__(self):
        d = self.__dict__.copy()
        d["_memo"] = {}
        d["_memo_lock"] = None
        return d

    def __setstate__(self, d):
        import threading

        self.__dict__.update(d)
        self._memo_lock = threading.Lock()

    def _candidates(self, cell: int) -> np.ndarray:
        got = self._memo.get(cell)
        if got is not None:
            return got
        ix, iy = int(cell >> 32), int(cell & 0xFFFFFFFF)
        cheb = np.maximum(np.abs(self._oix - ix), np.abs(self._oiy - iy))
        r = int(cheb.min())
        R = int(np.ceil(np.sqrt(2.0) * (r + 1))) + 1
        hits = np.flatnonzero(cheb <= R)
        starts = self.offsets[hits]
        lens = self.offsets[hits + 1] - starts
        out = np.ones(int(lens.sum()), dtype=np.int64)
        out[0] = starts[0]
        jumps = np.cumsum(lens)[:-1]
        out[jumps] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
        np.cumsum(out, out=out)
        with self._memo_lock:
            if len(self._memo) > 100_000:
                self._memo.clear()
            self._memo[cell] = out
        return out

    def knn1(self, cell: int, px: np.ndarray, py: np.ndarray
             ) -> tuple[np.ndarray, np.ndarray]:
        n = len(px)
        if len(self.ids) == 0 or cell < 0:
            return np.full(n, -1, dtype=np.int64), np.full(n, np.inf)
        cand = self._candidates(int(cell))
        return geo.sq_dist_argmin(
            px, py, self.lons[cand], self.lats[cand], self.ids[cand]
        )

    def knn_by_cell(self, cells: np.ndarray, px: np.ndarray, py: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact nearest overlay node for every point (cells < 0 → −1),
        grouped per unique cell so the candidate scan amortizes."""
        n = len(px)
        out_id = np.full(n, -1, dtype=np.int64)
        out_d = np.full(n, np.inf)
        if len(self.ids) == 0 or n == 0:
            return out_id, out_d
        idxs = np.flatnonzero(cells >= 0)
        order = idxs[np.argsort(cells[idxs], kind="stable")]
        cs = cells[order]
        runs = (
            np.concatenate([[0], np.flatnonzero(np.diff(cs)) + 1, [len(cs)]])
            if len(cs) else np.array([0, 0])
        )
        for s, e in zip(runs[:-1], runs[1:]):
            if s == e:
                continue
            g = order[s:e]
            bid, bd = self.knn1(int(cs[s]), px[g], py[g])
            out_id[g] = bid
            out_d[g] = bd
        return out_id, out_d


class LiveNodeIndex:
    """GridNodeIndex with O(delta) cross-window maintenance.

    Same query interface as GridNodeIndex (knn_batch / knn1), results
    bit-identical to an index freshly built over the post-delta layer.
    ``apply_delta`` returns True when the holder must compact (rebuild
    from the store): an occupied base cell lost its last live node, or
    the overlay/tombstones outgrew the base.
    """

    def __init__(self, ids: np.ndarray, lons: np.ndarray, lats: np.ndarray,
                 cell_res: float):
        self.cell_res = cell_res
        self.base = GridNodeIndex(
            np.asarray(ids, dtype=np.int64),
            np.asarray(lons, dtype=np.float64),
            np.asarray(lats, dtype=np.float64),
            cell_res,
        )
        self._perm = np.argsort(self.base.ids, kind="stable")
        self._ids_sorted = self.base.ids[self._perm]
        self._live = np.diff(self.base.offsets).astype(np.int64)
        self._n_dead = 0
        self.o_ids = np.empty(0, dtype=np.int64)
        self.o_lons = np.empty(0, dtype=np.float64)
        self.o_lats = np.empty(0, dtype=np.float64)
        self.overlay: SmallNodeIndex | None = None

    # -- maintenance --------------------------------------------------
    def apply_delta(self, deleted_ids: np.ndarray, ups_ids: np.ndarray,
                    ups_lon: np.ndarray, ups_lat: np.ndarray) -> bool:
        gone = np.unique(np.concatenate([
            np.asarray(deleted_ids, dtype=np.int64),
            np.asarray(ups_ids, dtype=np.int64),
        ])) if (len(deleted_ids) or len(ups_ids)) else np.empty(0, np.int64)
        base = self.base
        if len(gone) and len(self._ids_sorted):
            pos = np.searchsorted(self._ids_sorted, gone)
            pos = np.clip(pos, 0, len(self._ids_sorted) - 1)
            hit = self._ids_sorted[pos] == gone
            p = self._perm[pos[hit]]
            p = p[base.lons[p] < _SENT / 10]  # skip already-tombstoned
            if len(p):
                cidx = np.searchsorted(base.offsets, p, side="right") - 1
                base.lons[p] = _SENT
                base.lats[p] = _SENT
                np.subtract.at(self._live, cidx, 1)
                if (self._live[np.unique(cidx)] == 0).any():
                    return True  # occupied cell died → certificate premise gone
                self._n_dead += len(p)
                # dense sub-grids hold COPIES of the cell slices: rebuild
                # the touched ones from the cell's live nodes
                if base._dense:
                    for k in np.unique(cidx):
                        cell = int(base.ucells[k])
                        if cell not in base._dense:
                            continue
                        s, e = int(base.offsets[k]), int(base.offsets[k + 1])
                        livem = base.lons[s:e] < _SENT / 10
                        ix, iy = cell >> 32, cell & 0xFFFFFFFF
                        base._dense[cell] = _DenseCellSub(
                            base.ids[s:e][livem], base.lons[s:e][livem],
                            base.lats[s:e][livem],
                            ix * self.cell_res - 180.0,
                            iy * self.cell_res - 90.0, self.cell_res,
                        )
        # overlay: drop rows superseded by this window, append upserts
        if len(self.o_ids) and len(gone):
            keep = ~np.isin(self.o_ids, gone)
            self.o_ids = self.o_ids[keep]
            self.o_lons = self.o_lons[keep]
            self.o_lats = self.o_lats[keep]
        if len(ups_ids):
            self.o_ids = np.concatenate(
                [self.o_ids, np.asarray(ups_ids, dtype=np.int64)]
            )
            self.o_lons = np.concatenate(
                [self.o_lons, np.asarray(ups_lon, dtype=np.float64)]
            )
            self.o_lats = np.concatenate(
                [self.o_lats, np.asarray(ups_lat, dtype=np.float64)]
            )
        self.overlay = (
            SmallNodeIndex(self.o_ids, self.o_lons, self.o_lats, self.cell_res)
            if len(self.o_ids) else None
        )
        limit = max(32_768, len(base.ids) // 4)
        return (self._n_dead + len(self.o_ids)) > limit

    # -- queries (GridNodeIndex interface) ----------------------------
    def knn_batch(self, cells: np.ndarray, px: np.ndarray, py: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        bid, bd, handled = self.base.knn_batch(cells, px, py)
        if self.overlay is not None and handled.any():
            oid, od = self.overlay.knn_by_cell(cells, px, py)
            mid, md = _merge_knn(
                bid[handled], bd[handled], oid[handled], od[handled]
            )
            bid = bid.copy()
            bd = bd.copy()
            bid[handled] = mid
            bd[handled] = md
        return bid, bd, handled

    def knn1(self, cell: int, px: np.ndarray, py: np.ndarray
             ) -> tuple[np.ndarray, np.ndarray]:
        bid, bd = self.base.knn1(int(cell), px, py)
        if self.overlay is None:
            return bid, bd
        oid, od = self.overlay.knn1(int(cell), px, py)
        return _merge_knn(bid, bd, oid, od)


def _area_arrays(pindex: PolygonIndex) -> tuple[np.ndarray, np.ndarray]:
    if not pindex.rings_by_poly:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    pids = np.fromiter(pindex.rings_by_poly.keys(), dtype=np.int64)
    areas = np.fromiter(
        (pindex.rings_by_poly[int(p)]["area"] for p in pids), dtype=np.float64
    )
    order = np.argsort(pids)
    return pids[order], areas[order]


def _lookup_area(pids_sorted: np.ndarray, areas: np.ndarray,
                 q: np.ndarray) -> np.ndarray:
    out = np.full(len(q), np.inf)
    if len(pids_sorted) == 0:
        return out
    ok = q >= 0
    pos = np.searchsorted(pids_sorted, np.where(ok, q, pids_sorted[0]))
    pos = np.clip(pos, 0, len(pids_sorted) - 1)
    hit = ok & (pids_sorted[pos] == q)
    out[hit] = areas[pos[hit]]
    return out


class LivePolygonIndex:
    """PolygonIndex with O(delta) cross-window maintenance: base with a
    deleted-pid mask + overlay index over upserted rings; assign_batch
    merges the two winners under the same (area, pid) order as a fresh
    build.  ``apply_delta`` returns True when compaction is due."""

    def __init__(self, rings: pa.Table, cell_res: float):
        self.cell_res = cell_res
        self.base = PolygonIndex(rings, cell_res)
        self._bpids, self._bareas = _area_arrays(self.base)
        self._deleted_cum = np.empty(0, dtype=np.int64)
        self._overlay_rings = rings.schema.empty_table()
        self.overlay: PolygonIndex | None = None
        self._opids = np.empty(0, np.int64)
        self._oareas = np.empty(0, np.float64)

    def apply_delta(self, deleted_pids: np.ndarray,
                    new_rings: pa.Table) -> bool:
        gone = np.unique(np.asarray(deleted_pids, dtype=np.int64))
        if len(gone):
            in_base = gone[np.isin(gone, self._bpids)]
            self._deleted_cum = np.union1d(self._deleted_cum, in_base)
            self.base.set_deleted(self._deleted_cum)
        if self._overlay_rings.num_rows and len(gone):
            keep = pc.invert(pc.is_in(
                self._overlay_rings.column("polygon_id"),
                value_set=pa.array(gone, type=pa.int64()),
            ))
            self._overlay_rings = self._overlay_rings.filter(keep)
        if new_rings.num_rows:
            self._overlay_rings = pa.concat_tables(
                [self._overlay_rings, new_rings.cast(self._overlay_rings.schema)]
            ).combine_chunks()
        if self._overlay_rings.num_rows:
            self.overlay = PolygonIndex(self._overlay_rings, self.cell_res)
            self._opids, self._oareas = _area_arrays(self.overlay)
        else:
            self.overlay = None
            self._opids = np.empty(0, np.int64)
            self._oareas = np.empty(0, np.float64)
        limit = max(1024, len(self._bpids) // 4)
        return (len(self._deleted_cum) + len(self._opids)) > limit

    def assign_batch(self, cells: np.ndarray, px: np.ndarray,
                     py: np.ndarray) -> np.ndarray:
        pb = self.base.assign_batch(cells, px, py)
        if self.overlay is None:
            return pb
        po = self.overlay.assign_batch(cells, px, py)
        if not (po >= 0).any():
            return pb
        ab = _lookup_area(self._bpids, self._bareas, pb)
        ao = _lookup_area(self._opids, self._oareas, po)
        kb = np.where(pb < 0, _MAXI, pb)
        ko = np.where(po < 0, _MAXI, po)
        take = (ao < ab) | ((ao == ab) & (ko < kb))
        return np.where(take, po, pb)


def build_live_indexes(rings: pa.Table, nodes: pa.Table, cfg: EngineConfig
                       ) -> tuple[LivePolygonIndex, LiveNodeIndex]:
    # the two builds share nothing — overlap them on threads (numpy
    # lexsort/cumsum release the GIL), same as the old per-window path
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        pf = ex.submit(LivePolygonIndex, rings, cfg.cell_res_deg)
        nf = ex.submit(
            LiveNodeIndex,
            nodes.column("id").to_numpy(zero_copy_only=False).astype(np.int64),
            nodes.column("lon").to_numpy(zero_copy_only=False),
            nodes.column("lat").to_numpy(zero_copy_only=False),
            cfg.cell_res_deg,
        )
        return pf.result(), nf.result()
