"""Live (incrementally-maintained) join-layer indexes: results must be
bit-identical to indexes freshly built over the post-delta layer, across
sequences of node/polygon deletes, moves and inserts — including dense
kNN cells, dense-polygon cells, global (world-spanning) polygons and
inner rings.  Plus the store-level invariant: a warm cross-window cache
produces byte-identical state to reopening the store cold per window
(the kill-and-resume shape)."""

import numpy as np
import pyarrow as pa
import pytest

from osm_live_updates_ray.config import DEFAULT_CONFIG
from osm_live_updates_ray.functions import cells as cellfn
from osm_live_updates_ray.stages import spatial
from osm_live_updates_ray.stages.geometry import POLYGON_RINGS
from osm_live_updates_ray.stages.liveindex import (
    LiveNodeIndex,
    LivePolygonIndex,
    SmallNodeIndex,
)

RES = DEFAULT_CONFIG.cell_res_deg


def _square(pid, ridx, role, cx, cy, side):
    h = side / 2.0
    lons = [cx - h, cx + h, cx + h, cx - h, cx - h]
    lats = [cy - h, cy - h, cy + h, cy + h, cy - h]
    return {
        "polygon_id": pid, "ring_idx": ridx, "role": role,
        "lons": lons, "lats": lats,
        "min_lon": cx - h, "min_lat": cy - h,
        "max_lon": cx + h, "max_lat": cy + h,
        "area": side * side,
    }


def _rings_table(rows):
    if not rows:
        return POLYGON_RINGS.empty_table()
    return pa.Table.from_pylist(rows, schema=POLYGON_RINGS)


class World:
    """Mutable ground truth for the equality checks."""

    def __init__(self, rng):
        self.rng = rng
        self.nodes: dict[int, tuple[float, float]] = {}
        self.polys: dict[int, list[dict]] = {}
        nid = 0
        # spread nodes over [0, 10)^2
        for _ in range(2500):
            self.nodes[nid] = (rng.uniform(0, 10), rng.uniform(0, 10))
            nid += 1
        # dense kNN cell: 2600 nodes inside cell (0..RES, 0..RES)
        for _ in range(2600):
            self.nodes[nid] = (rng.uniform(0, RES), rng.uniform(0, RES))
            nid += 1
        self.next_node = nid
        pid = 1
        # dense polygon cell: 80 small squares inside one cell
        for _ in range(80):
            self.polys[pid] = [_square(
                pid, 0, "outer",
                2.0 + rng.uniform(0.05, 0.95) * RES,
                2.0 + rng.uniform(0.05, 0.95) * RES,
                rng.uniform(0.01, 0.08),
            )]
            pid += 1
        # spread squares
        for _ in range(30):
            self.polys[pid] = [_square(
                pid, 0, "outer", rng.uniform(0, 10), rng.uniform(0, 10),
                rng.uniform(0.2, 1.5),
            )]
            pid += 1
        # polygon with an inner hole
        self.polys[pid] = [
            _square(pid, 0, "outer", 5.0, 5.0, 2.0),
            _square(pid, 1, "inner", 5.0, 5.0, 0.8),
        ]
        pid += 1
        # world-spanning polygon (forces the global_pids path)
        self.polys[pid] = [_square(pid, 0, "outer", 0.0, 0.0, 150.0)]
        self.global_pid = pid
        self.next_poly = pid + 1

    def node_arrays(self):
        ids = np.fromiter(self.nodes.keys(), dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        lons = np.array([self.nodes[i][0] for i in ids])
        lats = np.array([self.nodes[i][1] for i in ids])
        return ids, lons, lats

    def rings(self) -> pa.Table:
        rows = [r for pid in sorted(self.polys) for r in self.polys[pid]]
        return _rings_table(rows)

    def random_delta(self, k=40):
        rng = self.rng
        ids = list(self.nodes.keys())
        rng.shuffle(ids)
        deleted, moved = ids[:k], ids[k:2 * k]
        for i in deleted:
            del self.nodes[i]
        ups_ids, ups_lon, ups_lat = [], [], []
        for i in moved:
            p = (rng.uniform(0, 10), rng.uniform(0, 10))
            self.nodes[i] = p
            ups_ids.append(i)
            ups_lon.append(p[0])
            ups_lat.append(p[1])
        for _ in range(k):
            i = self.next_node
            self.next_node += 1
            p = (rng.uniform(0, 10), rng.uniform(0, 10))
            self.nodes[i] = p
            ups_ids.append(i)
            ups_lon.append(p[0])
            ups_lat.append(p[1])
        # polygons: delete 3, modify 3, add 3
        pids = list(self.polys.keys())
        rng.shuffle(pids)
        gone_p = pids[:3]
        for p in gone_p:
            del self.polys[p]
        mod_p = [p for p in pids[3:6] if p in self.polys]
        new_rows = []
        for p in mod_p:
            self.polys[p] = [_square(
                p, 0, "outer", rng.uniform(0, 10), rng.uniform(0, 10),
                rng.uniform(0.05, 1.0),
            )]
            new_rows.extend(self.polys[p])
        for _ in range(3):
            p = self.next_poly
            self.next_poly += 1
            self.polys[p] = [_square(
                p, 0, "outer", rng.uniform(0, 10), rng.uniform(0, 10),
                rng.uniform(0.05, 1.0),
            )]
            new_rows.extend(self.polys[p])
        return (
            np.array(deleted, dtype=np.int64),
            np.array(ups_ids, dtype=np.int64),
            np.array(ups_lon), np.array(ups_lat),
            np.array(sorted(gone_p + mod_p), dtype=np.int64),
            _rings_table(new_rows),
        )


def _query_batch(rng, n=4000):
    # points across the world, biased into the dense cells and borders,
    # plus some far outside every layer
    lon = np.concatenate([
        rng.uniform(0, 10, n // 2),
        rng.uniform(0, RES, n // 4),          # dense kNN cell
        rng.uniform(2.0, 2.0 + RES, n // 8),  # dense polygon cell
        rng.uniform(-170, 170, n - n // 2 - n // 4 - n // 8),
    ])
    lat = np.concatenate([
        rng.uniform(0, 10, n // 2),
        rng.uniform(0, RES, n // 4),
        rng.uniform(2.0, 2.0 + RES, n // 8),
        rng.uniform(-80, 80, n - n // 2 - n // 4 - n // 8),
    ])
    cell = cellfn.cell_id(lon, lat, RES)
    tile = cellfn.tile_id(lon, lat)
    return pa.table({
        "url": [f"u{i}" for i in range(len(lon))],
        "cell_id": cell, "lon": lon, "lat": lat, "tile_id": tile,
    })


def _join_out(pindex, nindex, batch):
    j = spatial.SpatialJoiner(pindex, nindex, DEFAULT_CONFIG, keep_lonlat=True)
    return j(batch)


class TestLiveEqualsFresh:
    def test_delta_sequence_bit_identical(self):
        rng = np.random.RandomState(4242)
        w = World(rng)
        ids, lons, lats = w.node_arrays()
        live_p = LivePolygonIndex(w.rings(), RES)
        live_n = LiveNodeIndex(ids, lons, lats, RES)
        for step in range(4):
            dn, ui, ul, ua, gone_p, new_r = w.random_delta()
            if step == 2:
                # also kill the global polygon once
                del w.polys[w.global_pid]
                gone_p = np.union1d(gone_p, [w.global_pid])
            c1 = live_p.apply_delta(gone_p, new_r)
            c2 = live_n.apply_delta(dn, ui, ul, ua)
            assert not c1 and not c2, "unexpected compaction at this scale"
            batch = _query_batch(np.random.RandomState(100 + step))
            got = _join_out(live_p, live_n, batch)
            fi, fl, fa = w.node_arrays()
            fresh_p = spatial.PolygonIndex(w.rings(), RES)
            fresh_n = spatial.GridNodeIndex(fi, fl, fa, RES)
            want = _join_out(fresh_p, fresh_n, batch)
            assert got.schema == want.schema
            for col in got.schema.names:
                a = got.column(col).to_numpy(zero_copy_only=False)
                b = want.column(col).to_numpy(zero_copy_only=False)
                np.testing.assert_array_equal(a, b, err_msg=f"{col} step {step}")

    def test_small_node_index_exact(self):
        rng = np.random.RandomState(7)
        ids = np.arange(50, dtype=np.int64)
        lons = rng.uniform(-20, 20, 50)
        lats = rng.uniform(-20, 20, 50)
        idx = SmallNodeIndex(ids, lons, lats, RES)
        px = rng.uniform(-30, 30, 300)
        py = rng.uniform(-30, 30, 300)
        cells = cellfn.cell_id(px, py, RES)
        gid, gd = idx.knn_by_cell(cells, px, py)
        # brute force
        d2 = (px[:, None] - lons[None, :]) ** 2 + (py[:, None] - lats[None, :]) ** 2
        bid = np.argmin(d2, axis=1)
        np.testing.assert_array_equal(gid, ids[bid])
        np.testing.assert_allclose(gd, d2[np.arange(300), bid], rtol=0, atol=0)


class TestCompactionSignals:
    def test_cell_death_triggers_compaction(self):
        ids = np.array([1, 2, 3, 100], dtype=np.int64)
        lons = np.array([0.1, 0.2, 0.3, 5.5])
        lats = np.array([0.1, 0.2, 0.3, 5.5])
        live = LiveNodeIndex(ids, lons, lats, RES)
        # killing every node of cell (0,0) breaks the certified-search
        # premise -> must signal compaction
        assert live.apply_delta(
            np.array([1, 2, 3], dtype=np.int64),
            np.empty(0, np.int64), np.empty(0), np.empty(0),
        )

    def test_overlay_growth_triggers_compaction(self):
        ids = np.arange(10, dtype=np.int64)
        lons = np.linspace(0, 9, 10)
        lats = np.linspace(0, 9, 10)
        live = LiveNodeIndex(ids, lons, lats, RES)
        big = np.arange(100, 100 + 40_000, dtype=np.int64)
        assert live.apply_delta(
            np.empty(0, np.int64), big,
            np.random.RandomState(0).uniform(0, 10, len(big)),
            np.random.RandomState(1).uniform(0, 10, len(big)),
        )

    def test_polygon_overlay_growth(self):
        rows = [_square(i, 0, "outer", float(i % 10), float(i // 10), 0.5)
                for i in range(20)]
        live = LivePolygonIndex(_rings_table(rows), RES)
        new = [_square(1000 + i, 0, "outer", float(i % 10), float(i // 10), 0.3)
               for i in range(2000)]
        assert live.apply_delta(np.empty(0, np.int64), _rings_table(new))


class TestWarmCacheEqualsCold(object):
    """Three sequential windows applied on ONE store object (live-index
    cache warm across windows) must produce byte-identical state to the
    same windows applied with the store REOPENED before each window
    (cache cold — the kill-and-resume shape)."""

    def test_three_windows(self, ray_session, tmp_path_factory):
        import ray.data as rd

        from osm_live_updates_ray.pipelines import static_join, update
        from osm_live_updates_ray.sources import synthetic
        from osm_live_updates_ray.state.store import StateStore
        from test_pipeline import assert_tables_equal

        n_nodes, n_ways, n_rels, n_pages = 400, 80, 16, 600
        pages = synthetic.gen_pages(0, n_pages)
        nodes = synthetic.gen_osm_nodes(n_nodes)
        ways = synthetic.gen_osm_ways(n_ways, n_nodes)
        rels = synthetic.gen_osm_relations(n_rels, n_ways, n_nodes)
        windows = [
            synthetic.gen_changes(30, n_nodes, n_ways, n_rels, seed_offset=o)
            for o in (11, 222, 3333)
        ]

        rootW = str(tmp_path_factory.mktemp("warm"))
        W = static_join.build_state(
            rootW, rd.from_arrow(pages), nodes, ways, rels
        )
        for ch in windows:
            update.apply_changes(W, ch)
        assert W._layer_cache is not None  # the cache actually persisted
        # hot-table cache: the in-memory COW copy of cell_summaries must
        # stay row-set-identical to the on-disk table it shadows
        hot = W.read_all_hot("cell_summaries").sort_by("cell_id")
        disk = W.read_all("cell_summaries").sort_by("cell_id")
        assert hot.equals(disk.cast(hot.schema))

        rootC = str(tmp_path_factory.mktemp("cold"))
        static_join.build_state(rootC, rd.from_arrow(pages), nodes, ways, rels)
        for ch in windows:
            C = StateStore(rootC)  # fresh open per window = cold cache
            update.apply_changes(C, ch)

        C = StateStore(rootC)
        for table, keys in [
            ("nodes", ["id"]), ("ways", ["id"]), ("relations", ["id"]),
            ("geoms", ["gid"]),
            ("polygon_rings", ["polygon_id", "ring_idx"]),
            ("cell_summaries", ["cell_id"]),
        ]:
            assert_tables_equal(W.read_all(table), C.read_all(table), keys)
        assert_tables_equal(
            W.read_tiles("assignments"), C.read_tiles("assignments"), ["url"]
        )
