"""Spatial join vs single-process brute-force oracles (FIXTURES.md §5
layer 3) — kNN and PIP must be EXACT."""

import numpy as np
import pytest

from osm_live_updates_ray.sources import synthetic
from osm_live_updates_ray.stages import geometry, spatial


@pytest.fixture(scope="module")
def joined(t1_world):
    w = t1_world
    lookup = geometry.NodeCoordLookup.from_table(w["osm_nodes"])
    rings = geometry.polygon_rings_from_osm(w["osm_ways"], w["osm_relations"], lookup)
    pg = spatial.Geocoder()(w["pages"])
    na = {
        "id": w["osm_nodes"].column("id").to_numpy(zero_copy_only=False).astype(np.int64),
        "lon": w["osm_nodes"].column("lon").to_numpy(zero_copy_only=False),
        "lat": w["osm_nodes"].column("lat").to_numpy(zero_copy_only=False),
    }
    out = spatial.SpatialJoiner(rings, na)(pg)
    return w, rings, pg, na, out


class TestGeocoder:
    def test_roundtrip_exact(self, t1_world):
        pg = spatial.Geocoder()(t1_world["pages"])
        lon = pg.column("lon").to_numpy(zero_copy_only=False)
        lat = pg.column("lat").to_numpy(zero_copy_only=False)
        elon, elat = synthetic.page_coords(np.arange(pg.num_rows, dtype=np.int64))
        assert (lon == elon).all() and (lat == elat).all()

    def test_no_geo_page_dropped(self):
        import pyarrow as pa

        from osm_live_updates_ray.schemas import PAGES

        t = pa.Table.from_pydict(
            {
                "url": ["u1"],
                "warc_ts": pa.array([np.datetime64("2024-01-01", "s")]),
                "html": pa.array([b"<html><body>no geo</body></html>"], pa.binary()),
                "text": ["x"],
                "lang": ["en"],
            },
            schema=PAGES,
        )
        g = spatial.Geocoder()
        out = g(t)
        assert out.column("cell_id")[0].as_py() == -1
        assert g.n_nogeo == 1


class TestKnnExact:
    def test_vs_bruteforce(self, joined):
        w, rings, pg, na, out = joined
        d = out.to_pydict()
        lon = pg.column("lon").to_numpy(zero_copy_only=False)
        lat = pg.column("lat").to_numpy(zero_copy_only=False)
        ids, nl, nt = na["id"], na["lon"], na["lat"]
        for i in range(0, len(lon), 17):
            dd = (lon[i] - nl) ** 2 + (lat[i] - nt) ** 2
            o = np.lexsort((ids, dd))
            assert ids[o[0]] == d["knn_node_id"][i]
            assert dd[o[0]] == d["knn_dist"][i]

    def test_empty_node_layer(self, t1_world):
        from osm_live_updates_ray.stages.geometry import POLYGON_RINGS

        na = {"id": np.empty(0, dtype=np.int64), "lon": np.empty(0), "lat": np.empty(0)}
        j = spatial.SpatialJoiner(POLYGON_RINGS.empty_table(), na)
        pg = spatial.Geocoder()(t1_world["pages"])
        out = j(pg)
        assert set(out.column("knn_node_id").to_pylist()) == {-1}


class TestPipExact:
    def test_vs_bruteforce(self, joined):
        import collections

        from osm_live_updates_ray.functions import geo as geofn

        w, rings, pg, na, out = joined
        d = out.to_pydict()
        lon = pg.column("lon").to_numpy(zero_copy_only=False)
        lat = pg.column("lat").to_numpy(zero_copy_only=False)
        outer = collections.defaultdict(list)
        inner = collections.defaultdict(list)
        areas: dict = {}
        for p, role, lx, ly, a in zip(
            rings.column("polygon_id").to_pylist(),
            rings.column("role").to_pylist(),
            rings.column("lons").to_pylist(),
            rings.column("lats").to_pylist(),
            rings.column("area").to_pylist(),
        ):
            (outer if role == "outer" else inner)[p].append((np.array(lx), np.array(ly)))
            areas[p] = areas.get(p, 0.0) + (a if role == "outer" else -a)
        for i in range(0, len(lon), 13):
            best = (np.inf, -1)
            for p in outer:
                px, py = np.array([lon[i]]), np.array([lat[i]])
                ins = any(geofn.points_in_ring(px, py, x, y)[0] for x, y in outer[p])
                if ins and not any(
                    geofn.points_in_ring(px, py, x, y)[0] for x, y in inner.get(p, [])
                ):
                    if (areas[p], p) < best:
                        best = (areas[p], p)
            assert best[1] == d["polygon_id"][i], f"page {i}"


class TestPartitionedVariantAgreesWithBroadcast:
    def test_tiles_rollup_table(self, joined):
        from osm_live_updates_ray.stages import tiles

        _, _, _, _, out = joined
        r = tiles.tile_rollup_table(out)
        assert r.num_rows == len(set(out.column("tile_id").to_pylist()))
        assert sum(r.column("n_pages").to_pylist()) == out.num_rows


class TestPartitionedJoinEqualsBroadcast:
    def test_pip_identical(self, ray_session, t1_world):
        import pyarrow as pa
        import ray.data as rd

        from osm_live_updates_ray.config import EngineConfig

        w = t1_world
        lookup = geometry.NodeCoordLookup.from_table(w["osm_nodes"])
        rings = geometry.polygon_rings_from_osm(
            w["osm_ways"], w["osm_relations"], lookup
        )
        pg = spatial.Geocoder()(w["pages"]).select(
            ["url", "lon", "lat", "cell_id", "tile_id"]
        )
        # broadcast reference result
        na = {"id": np.empty(0, dtype=np.int64), "lon": np.empty(0),
              "lat": np.empty(0)}
        ref = spatial.SpatialJoiner(rings, na)(pg)
        ref_map = dict(zip(ref.column("url").to_pylist(),
                           ref.column("polygon_id").to_pylist()))
        # partitioned + salted result (tiny threshold forces salting)
        cfg = EngineConfig(mega_cell_threshold=50, salt_factor=4)
        out = spatial.spatial_join_partitioned(
            rd.from_arrow(pg), rings, cfg
        ).to_pandas()
        assert len(out) == len(ref_map)
        got = dict(zip(out["url"], out["polygon_id"]))
        diff = {u for u in got if got[u] != ref_map[u]}
        assert not diff, f"{len(diff)} mismatches, e.g. {list(diff)[:3]}"


class TestNearestWay:
    def test_vs_bruteforce(self, t1_world):
        import pandas as pd

        from osm_live_updates_ray.functions import cells as cellfn
        from osm_live_updates_ray.functions.geo import seg_dist_argmin

        w = t1_world
        nodes = w["osm_nodes"].to_pandas()[["id", "lon", "lat"]]
        rows = []
        for r in w["osm_ways"].to_pylist():
            for p, (a, b) in enumerate(zip(r["node_ids"][:-1], r["node_ids"][1:])):
                rows.append((r["id"], p, a, b))
        e = pd.DataFrame(rows, columns=["way_id", "pos", "a", "b"])
        e = e.merge(nodes.rename(columns={"id": "a", "lon": "x1", "lat": "y1"}), on="a")
        e = e.merge(nodes.rename(columns={"id": "b", "lon": "x2", "lat": "y2"}), on="b")
        sidx = spatial.GridSegmentIndex(
            e["way_id"].to_numpy(), e["pos"].to_numpy(),
            e["x1"].to_numpy(), e["y1"].to_numpy(),
            e["x2"].to_numpy(), e["y2"].to_numpy(),
        )
        pg = spatial.Geocoder()(w["pages"])
        lon = pg.column("lon").to_numpy(zero_copy_only=False)[:250]
        lat = pg.column("lat").to_numpy(zero_copy_only=False)[:250]
        cells = cellfn.cell_id(lon, lat)
        got_w, got_d = sidx.nearest_way(cells, lon, lat)
        # brute force over ALL segments
        bw, bd = seg_dist_argmin(
            lon, lat,
            e["x1"].to_numpy(), e["y1"].to_numpy(),
            e["x2"].to_numpy(), e["y2"].to_numpy(),
            e["way_id"].to_numpy(), e["pos"].to_numpy(),
        )
        assert (got_w == bw).all()
        assert (got_d == bd).all()

    def test_empty_layer(self):
        import numpy as np

        sidx = spatial.GridSegmentIndex(
            np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
            np.empty(0), np.empty(0), np.empty(0), np.empty(0),
        )
        w, d = sidx.nearest_way(
            np.array([816043786380], dtype=np.int64), np.array([10.0]), np.array([50.0])
        )
        assert w[0] == -1


class TestThreadedDriverJoin:
    def test_threaded_chunks_equal_single_call(self, joined):
        """The delta re-join's driver thread-pool path (chunked slices
        through one shared SpatialJoiner) must equal the single-call
        result exactly, including under memo races — run it twice."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow as pa

        w, rings, pg, na, out = joined
        for _ in range(2):
            joiner = spatial.SpatialJoiner(
                spatial.PolygonIndex(rings), spatial.GridNodeIndex(
                    na["id"], na["lon"], na["lat"]
                )
            )
            step = max(1, -(-pg.num_rows // 4))
            chunks = [pg.slice(i, step) for i in range(0, pg.num_rows, step)]
            with ThreadPoolExecutor(4) as ex:
                got = pa.concat_tables(list(ex.map(joiner, chunks)))
            assert got.equals(out)


class TestShardedJoin:
    def test_sharded_equals_broadcast(self, ray_session, joined):
        """spatial_join_sharded (cell-range node shards, no broadcast)
        must equal the broadcast SpatialJoiner output exactly."""
        import pyarrow as pa
        import ray.data as rd

        w, rings, pg, na, out = joined
        nodes_tbl = pa.Table.from_pydict(
            {"id": na["id"], "lon": na["lon"], "lat": na["lat"]}
        )
        ds = spatial.spatial_join_sharded(
            rd.from_arrow(pg).repartition(4), rings, nodes_tbl, n_shards=3
        )
        got = pa.concat_tables(
            list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
        ).sort_by("url")
        want = out.sort_by("url")
        assert got.cast(want.schema).equals(want)

    def test_sharded_file_groups(self, ray_session, joined, tmp_path):
        """File-path shards: each actor reads its own parquet — output
        identical to the broadcast path."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        w, rings, pg, na, out = joined
        files = []
        k = 3
        for i in range(k):
            sub = pa.Table.from_pydict(
                {
                    "id": na["id"][i::k],
                    "lon": na["lon"][i::k],
                    "lat": na["lat"][i::k],
                }
            )
            f = str(tmp_path / f"nodes_{i}.parquet")
            pq.write_table(sub, f)
            files.append([f])
        ds = spatial.spatial_join_sharded(
            rd.from_arrow(pg).repartition(4), rings, files
        )
        got = pa.concat_tables(
            list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
        ).sort_by("url")
        want = out.sort_by("url")
        assert got.cast(want.schema).equals(want)

    def test_ring_sharded_equals_broadcast(self, ray_session, joined):
        """Ring-sharded PIP (polygons split into whole-polygon shards,
        each held by its own actor — no broadcast ring layer) must equal
        the broadcast SpatialJoiner output exactly."""
        import pyarrow as pa
        import ray.data as rd

        w, rings, pg, na, out = joined
        nodes_tbl = pa.Table.from_pydict(
            {"id": na["id"], "lon": na["lon"], "lat": na["lat"]}
        )
        ring_shards = spatial._shard_rings_by_pid(rings, 3)
        assert len(ring_shards) > 1  # the split actually sharded
        ds = spatial.spatial_join_sharded(
            rd.from_arrow(pg).repartition(4), ring_shards, nodes_tbl, n_shards=3
        )
        got = pa.concat_tables(
            list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
        ).sort_by("url")
        want = out.sort_by("url")
        assert got.cast(want.schema).equals(want)

    def test_ring_sharded_file_groups(self, ray_session, joined, tmp_path):
        """File-group ring shards (the store's polygon_id-partitioned
        layout): each PIP actor reads its own parquet; output identical
        to the broadcast path."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        w, rings, pg, na, out = joined
        nodes_tbl = pa.Table.from_pydict(
            {"id": na["id"], "lon": na["lon"], "lat": na["lat"]}
        )
        files = []
        for i, shard in enumerate(spatial._shard_rings_by_pid(rings, 3)):
            f = str(tmp_path / f"rings_{i}.parquet")
            pq.write_table(shard, f)
            files.append([f])
        ds = spatial.spatial_join_sharded(
            rd.from_arrow(pg).repartition(4), files, nodes_tbl, n_shards=2
        )
        got = pa.concat_tables(
            list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
        ).sort_by("url")
        want = out.sort_by("url")
        assert got.cast(want.schema).equals(want)


class TestShardedDeltaRejoin:
    def test_delta_with_broadcast_disabled(
        self, ray_session, t1_world, tmp_path_factory
    ):
        """apply_changes with broadcast_node_rows=0 (sharded re-join
        forced) must produce the same state as the default path."""
        import dataclasses

        import ray.data as rd

        from osm_live_updates_ray.config import DEFAULT_CONFIG
        from osm_live_updates_ray.pipelines import static_join, update
        from osm_live_updates_ray.state.store import StateStore

        w = t1_world
        outs = []
        for cfg in (
            DEFAULT_CONFIG,
            dataclasses.replace(
                DEFAULT_CONFIG, broadcast_node_rows=0, driver_scan_rows=0,
                rejoin_driver_rows=0,
            ),
            # broadcast-distributed re-join branch (Ray pipeline with
            # the node layer broadcast; driver path disabled)
            dataclasses.replace(DEFAULT_CONFIG, rejoin_driver_rows=0),
            # distributed NON-streaming sharded branch: dirty rows are a
            # Table (driver_scan_rows default keeps the scan on the
            # driver) but the layer is "too big" to broadcast
            dataclasses.replace(
                DEFAULT_CONFIG, broadcast_node_rows=0, rejoin_driver_rows=0,
            ),
        ):
            root = str(tmp_path_factory.mktemp("shardrejoin"))
            st = static_join.build_state(
                root, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
                w["osm_relations"], cfg=cfg,
            )
            if cfg.broadcast_node_rows == 0:
                # the layer-too-big escape hatch must NEVER materialize
                # the full ring layer on the driver (VERDICT r3 item 1)
                orig_read_all = st.read_all

                def guarded(name, columns=None):
                    assert name != "polygon_rings", (
                        "sharded re-join read the full ring layer on the driver"
                    )
                    return orig_read_all(name, columns)

                st.read_all = guarded
            update.apply_changes(st, w["changes"], cfg=cfg)
            if cfg.broadcast_node_rows == 0:
                st.read_all = orig_read_all
            outs.append(st.read_tiles("assignments").sort_by("url"))
        a = outs[0]
        for b in outs[1:]:
            assert a.equals(b.cast(a.schema))


class TestFusedGeocodeJoin:
    def test_fused_equals_staged(self, ray_session, joined):
        import pyarrow as pa
        import ray.data as rd

        w, rings, pg, na, out = joined
        nodes_tbl = pa.Table.from_pydict(
            {"id": na["id"], "lon": na["lon"], "lat": na["lat"]}
        )
        ds = spatial.fused_geocode_join(
            rd.from_arrow(w["pages"]).repartition(4),
            polygons=rings, nodes=nodes_tbl, concurrency=(1, 2),
        )
        got = pa.concat_tables(
            list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
        ).sort_by("url")
        want = out.sort_by("url")
        assert got.cast(want.schema).equals(want)
