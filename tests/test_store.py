"""StateStore: partitioned lookups, COW commits, GC, crash resume."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from osm_live_updates_ray.state.store import StateStore, explode_way_members


@pytest.fixture()
def store(tmp_path, t1_world):
    return StateStore.build(
        str(tmp_path / "st"),
        nodes=t1_world["osm_nodes"],
        ways=t1_world["osm_ways"],
        relations=t1_world["osm_relations"],
    )


class TestLookups:
    def test_semi_join_missing_tolerated(self, store):
        t = store.node_locations(np.array([1, 2, 10**9]))
        assert set(t.column("id").to_pylist()) == {1, 2}

    def test_empty_ids(self, store):
        assert store.node_locations(np.empty(0, dtype=np.int64)).num_rows == 0

    def test_reverse_edges_match_forward(self, store, t1_world):
        # J2 via the exploded table == scanning way lists directly
        target = np.array([17], dtype=np.int64)
        expect = {
            w["id"]
            for w in t1_world["osm_ways"].to_pylist()
            if 17 in w["node_ids"]
        }
        got = set(store.ways_referencing_nodes(target).tolist())
        assert got == expect

    def test_relation_member_split(self, store, t1_world):
        rel = t1_world["osm_relations"].to_pylist()[0]
        n, w, r = store.relation_member_ids(np.array([rel["id"]]))
        expect_w = {m["ref"] for m in rel["members"] if m["type"] == "way"}
        assert set(w.tolist()) == expect_w

    def test_duplicate_live_rows_hard_error(self, store, t1_world):
        # reference parity: the fetcher hard-errors when the endpoint
        # returns more rows than requested ids
        # (src/osm/OsmDataFetcherQLever.cpp:126-129).  Inject a
        # duplicate node row into a committed partition file and the
        # next lookup touching it must refuse.
        import pyarrow.parquet as pq

        dup = t1_world["osm_nodes"].slice(0, 1)
        dup_id = dup.column("id")[0].as_py()
        part = store._files_for_keys("nodes", np.array([dup_id]))[0]
        import pyarrow.compute as pc

        pa_tbl = pq.read_table(part)
        dup_row = pa_tbl.filter(pc.equal(pa_tbl.column("id"), dup_id))
        pq.write_table(pa.concat_tables([pa_tbl, dup_row]), part)
        with pytest.raises(RuntimeError, match="duplicate live rows"):
            store.lookup("nodes", np.array([dup_id]))
        # even when the caller projects away the key column
        with pytest.raises(RuntimeError, match="duplicate live rows"):
            store.lookup("nodes", np.array([dup_id]), columns=["lon", "lat"])


class TestCow:
    def test_upsert_delete_and_reopen(self, store, t1_world):
        up = t1_world["osm_nodes"].slice(0, 1)
        store.begin()
        store.apply_upserts_deletes("nodes", up, np.array([5, 6]))
        store.commit()
        re = StateStore(store.root)
        assert re.node_locations(np.array([5, 6])).num_rows == 0
        assert re.node_locations(np.array([0])).num_rows == 1
        assert re._manifest["generation"] == store._manifest["generation"]

    def test_owned_edge_update_preserves_other_ways(self, store, t1_world):
        ways = t1_world["osm_ways"].to_pylist()
        w0 = ways[0]
        shared = w0["node_ids"][0]
        others_before = set(store.ways_referencing_nodes(np.array([shared])).tolist())
        # delete way 0's edges; other ways touching the same node survive
        store.begin()
        store.apply_owned_edges(
            "way_members_by_node",
            explode_way_members(t1_world["osm_ways"].slice(0, 0)),
            owner_col="way_id",
            owner_ids=np.array([w0["id"]], dtype=np.int64),
            touch_keys=np.asarray(w0["node_ids"], dtype=np.int64),
        )
        store.commit()
        after = set(store.ways_referencing_nodes(np.array([shared])).tolist())
        assert after == others_before - {w0["id"]}

    def test_gc_removes_stale_partitions(self, store, t1_world):
        # commit GCs superseded generation files immediately, so the
        # directory always equals the manifest (dir scans stay correct)
        store.begin()
        store.apply_upserts_deletes("nodes", t1_world["osm_nodes"].slice(0, 1),
                                    np.empty(0, dtype=np.int64))
        store.commit()
        ndir = os.path.join(store.root, "nodes")
        assert len(os.listdir(ndir)) == store.config.id_partitions
        manifest_files = set(store._manifest["tables"]["nodes"].values())
        assert set(os.listdir(ndir)) == manifest_files

    def test_crash_before_commit_invisible(self, store, t1_world):
        # mutate partitions but DON'T commit; a reopened store sees the
        # old generation and GC removes the orphans
        store.begin()
        store.apply_upserts_deletes("nodes", t1_world["osm_nodes"].slice(0, 2),
                                    np.array([7], dtype=np.int64))
        # no commit -> manifest on disk still points at old files
        re = StateStore(store.root)
        assert re.node_locations(np.array([7])).num_rows == 1  # not deleted

    def test_lineage_log_written(self, store):
        log = os.path.join(store.root, "lineage.log")
        assert os.path.exists(log)
        recs = [json.loads(line) for line in open(log)]
        assert all("table" in r and "rows" in r and "generation" in r for r in recs)
        assert {r["table"] for r in recs} >= {"nodes", "ways", "relations"}


class TestWatermark:
    def test_watermark_roundtrip(self, store):
        assert store.watermark is None
        store.begin()
        store.set_watermark(42, "2024-01-01T00:00:00Z")
        store.commit()
        re = StateStore(store.root)
        assert re.watermark == {"seq": 42, "ts": "2024-01-01T00:00:00Z"}

    def test_watermark_monotonic(self, store):
        store.begin()
        store.set_watermark(5, "2024-02-01T00:00:00Z")
        store.commit()
        store.begin()
        store.set_watermark(1, "2024-01-01T00:00:00Z")  # older window replay
        store.commit()
        assert store.watermark["seq"] == 5  # never moves backward


class TestWriterLock:
    def test_gc_skips_while_foreign_writer_alive(self, store, tmp_path):
        # simulate a live writer in another process: our own pid won't
        # do (it's ignored), so use pid 1 (always alive)
        lock = store._lock_path()
        with open(lock, "w") as f:
            f.write("1")
        try:
            # open must not raise and must NOT gc (skip) — and begin()
            # must refuse to double-write
            re = StateStore(store.root)
            import pytest as _pytest

            with _pytest.raises(RuntimeError):
                re.begin()
        finally:
            os.remove(lock)

    def test_stale_lock_ignored(self, store):
        lock = store._lock_path()
        with open(lock, "w") as f:
            f.write("999999999")  # dead pid
        re = StateStore(store.root)
        re.begin()  # stale lock replaced, no error
        re.set_watermark(7, "2024-03-01T00:00:00Z")
        re.commit()
        assert not os.path.exists(lock)


class TestOptionDiscovery:
    def test_store_options_override_run_config(
        self, ray_session, t1_world, tmp_path_factory
    ):
        """ST2: a store built WITHOUT centroids never writes centroid
        columns on delta, even when the run passes a centroid-enabled
        config (reference fetchOsm2RdfOptions semantics)."""
        import dataclasses

        import pyarrow.compute as pc
        import ray.data as rd

        from osm_live_updates_ray.config import DEFAULT_CONFIG
        from osm_live_updates_ray.pipelines import static_join, update

        w = t1_world
        no_centroid = dataclasses.replace(DEFAULT_CONFIG, with_centroid=False)
        root = str(tmp_path_factory.mktemp("optdisc"))
        st = static_join.build_state(
            root, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"], cfg=no_centroid,
        )
        assert st.options["with_centroid"] is False
        # reopen with the DEFAULT (centroid-enabled) config and apply
        re = StateStore(root)  # default config
        update.apply_changes(re, w["changes"])
        g = re.read_all("geoms")
        assert g.column("centroid_lon").null_count == g.num_rows

    def test_newer_schema_version_refused(self, store):
        import json as _json

        p = os.path.join(store.root, "manifest.json")
        m = _json.load(open(p))
        m["schema_version"] = 999
        _json.dump(m, open(p, "w"))
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="newer engine"):
            StateStore(store.root)


class TestUseRayReads:
    def test_ray_scan_equals_local_scan(self, ray_session, tmp_path):
        """lookup(use_ray_reads=True): the distributed
        ray.data.read_parquet(filter=...) scan must return exactly the
        local threaded pyarrow.dataset result (the cluster-scale shape
        the module docstring promises)."""
        import numpy as np

        from osm_live_updates_ray.sources import synthetic
        from osm_live_updates_ray.state.store import StateStore

        w = synthetic.gen_world("t1")
        store = StateStore.build(
            str(tmp_path / "s"), nodes=w["osm_nodes"], ways=w["osm_ways"],
            relations=w["osm_relations"],
        )
        ids = w["osm_nodes"].column("id").to_numpy(
            zero_copy_only=False)[::7].astype(np.int64)
        a = store.lookup("nodes", ids).sort_by("id")
        b = store.lookup("nodes", ids, use_ray_reads=True).sort_by("id")
        assert a.equals(b.cast(a.schema))
        # column projection + the duplicate-row guard column path
        a2 = store.lookup("nodes", ids, columns=["lon", "lat"])
        b2 = store.lookup("nodes", ids, columns=["lon", "lat"],
                          use_ray_reads=True)
        assert a2.sort_by("lon").equals(
            b2.sort_by("lon").cast(a2.schema))
        # empty result shape
        none_ids = np.array([10**15], dtype=np.int64)
        e = store.lookup("nodes", none_ids, use_ray_reads=True)
        assert e.num_rows == 0 and e.schema.names == a.schema.names
