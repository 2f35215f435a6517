"""End-to-end conformance: delta replay == full recompute on the merged
world (FIXTURES scenarios incl. last-version-wins, geometry-only
refresh, tile COW), plus resume semantics."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from osm_live_updates_ray.pipelines import static_join, update
from osm_live_updates_ray.schemas import OSM_NODES, OSM_RELATIONS, OSM_WAYS
from osm_live_updates_ray.sources import synthetic
from osm_live_updates_ray.stages.dedup import dedup_table
from osm_live_updates_ray.state.store import StateStore


def merge_layer(ch: pa.Table, state: pa.Table, otype: str, schema) -> pa.Table:
    rows = ch.filter(pc.equal(ch.column("type"), otype))
    del_ids = rows.filter(pc.equal(rows.column("action"), "delete")).column("id")
    up = rows.filter(pc.not_equal(rows.column("action"), "delete"))
    up = up.select([f.name for f in schema]).cast(schema)
    drop = pa.concat_arrays([del_ids.combine_chunks(), up.column("id").combine_chunks()])
    keep = pc.invert(pc.is_in(state.column("id"), value_set=drop))
    return pa.concat_tables([state.filter(keep), up])


@pytest.fixture(scope="module")
def replayed(ray_session, t1_world, tmp_path_factory):
    import ray.data as rd

    w = t1_world
    rootA = str(tmp_path_factory.mktemp("confA"))
    A = static_join.build_state(
        rootA, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"], w["osm_relations"]
    )
    summary = update.apply_changes(A, w["changes"])

    ch = dedup_table(w["changes"])
    m_nodes = merge_layer(ch, w["osm_nodes"], "node", OSM_NODES)
    m_ways = merge_layer(ch, w["osm_ways"], "way", OSM_WAYS)
    m_rels = merge_layer(ch, w["osm_relations"], "relation", OSM_RELATIONS)
    rootB = str(tmp_path_factory.mktemp("confB"))
    B = static_join.build_state(
        rootB, rd.from_arrow(w["pages"]), m_nodes, m_ways, m_rels
    )
    return A, B, summary


def assert_tables_equal(ta: pa.Table, tb: pa.Table, keys):
    ta = ta.sort_by([(k, "ascending") for k in keys])
    tb = tb.cast(ta.schema).sort_by([(k, "ascending") for k in keys])
    assert ta.num_rows == tb.num_rows
    for col in ta.column_names:
        a, b = ta.column(col).to_pandas(), tb.column(col).to_pandas()
        import pandas as pd

        pd.testing.assert_series_equal(a, b, check_names=False)


class TestConformance:
    @pytest.mark.parametrize(
        "table,keys",
        [
            ("nodes", ["id"]), ("ways", ["id"]), ("relations", ["id"]),
            ("way_members_by_node", ["way_id", "pos"]),
            ("rel_members_by_member", ["rel_id", "pos"]),
            ("geoms", ["gid"]), ("polygon_rings", ["polygon_id", "ring_idx"]),
        ],
    )
    def test_partitioned_tables(self, replayed, table, keys):
        A, B, _ = replayed
        assert_tables_equal(A.read_all(table), B.read_all(table), keys)

    def test_assignments_exact(self, replayed):
        A, B, _ = replayed
        assert_tables_equal(
            A.read_tiles("assignments"), B.read_tiles("assignments"), ["url"]
        )

    def test_rollups_exact(self, replayed):
        A, B, _ = replayed
        assert_tables_equal(A.read_tiles("rollups"), B.read_tiles("rollups"), ["tile_id"])

    def test_cell_summaries_exact(self, replayed):
        # the delta-maintained kNN-bound prune index must equal the
        # bootstrap-built one (else future invalidation prunes drift)
        A, B, _ = replayed
        assert_tables_equal(
            A.read_all("cell_summaries"),
            B.read_all("cell_summaries"),
            ["cell_id"],
        )

    def test_summary_counters(self, replayed):
        _, _, s = replayed
        assert s["deduped_rows"] <= s["input_rows"]
        assert s["tiles_rewritten"] > 0 and s["dirty_cells"] > 0
        assert not s["empty"]


class TestIncrementalSemantics:
    def test_empty_window_early_exit(self, replayed):
        A, _, _ = replayed
        from osm_live_updates_ray.schemas import OSM_CHANGES

        gen_before = A._manifest["generation"]
        s = update.apply_changes(A, OSM_CHANGES.empty_table())
        assert s["empty"] and s["tiles_rewritten"] == 0
        assert A._manifest["generation"] == gen_before  # nothing committed

    def test_watermark_enforcement(self, replayed, t1_world):
        A, _, _ = replayed
        # replaying the same window with enforcement keeps ONLY the
        # watermark-boundary second (the reference's overlap-by-one,
        # re-applied idempotently) — the state must not change
        assert A.watermark is not None
        ch = t1_world["changes"]
        before = A.read_tiles("assignments").sort_by("url")
        s = update.apply_changes(A, ch, enforce_watermark=True)
        import pyarrow.compute as pc2

        n_boundary = pc2.sum(
            pc2.equal(
                ch.column("ts"),
                pc2.max(ch.column("ts")),
            )
        ).as_py()
        assert s["input_rows"] <= n_boundary  # everything older dropped
        after = A.read_tiles("assignments").sort_by("url")
        assert after.equals(before.cast(after.schema))  # idempotent

    def test_watermark_cross_source_replay(self, replayed, t1_world):
        """A seq-less window from another source (reference .osc
        fixture, real-world 2024 timestamp) advances the watermark ts
        but resets the stored seq to 0.  Replaying the ORIGINAL window
        with enforcement must still be a no-op: without a matching
        replication source the seq is not comparable and the filter
        falls back to the timestamp (decideStartSequenceNumber tree)."""
        from osm_live_updates_ray import cli

        A, _, _ = replayed
        osc = cli._load_changes(
            ["/root/reference/tests/data/insert_node.osc"], max_seq=None
        )
        update.apply_changes(A, osc)
        assert A.watermark["seq"] == 0  # regressed by the foreign window
        s = update.apply_changes(A, t1_world["changes"], enforce_watermark=True)
        assert s["empty"]

    def test_idempotent_replay_without_enforcement(
        self, ray_session, t1_world, tmp_path_factory
    ):
        # applying the same window twice = applying it once (the
        # reference's delete-then-insert idempotence, S7)
        import ray.data as rd

        w = t1_world
        root = str(tmp_path_factory.mktemp("idem"))
        st = static_join.build_state(
            root, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"]
        )
        update.apply_changes(st, w["changes"])
        snap_nodes = st.read_all("nodes").sort_by("id")
        snap_assign = st.read_tiles("assignments").sort_by("url")
        update.apply_changes(st, w["changes"])
        assert st.read_all("nodes").sort_by("id").equals(snap_nodes)
        assert_tables_equal(
            st.read_tiles("assignments"), snap_assign, ["url"]
        )


class TestCli:
    def test_dry_run_and_apply(self, ray_session, t1_world, tmp_path_factory):
        import json

        import ray.data as rd

        from osm_live_updates_ray import cli

        w = t1_world
        root = str(tmp_path_factory.mktemp("cli_state"))
        static_join.build_state(
            root, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"]
        )
        import pyarrow.parquet as pq

        chpath = str(tmp_path_factory.mktemp("cli_in") / "changes.parquet")
        pq.write_table(w["changes"], chpath)
        # dry run must not mutate
        gen_before = json.load(open(f"{root}/manifest.json"))["generation"]
        rc = cli.main(["apply", "--state", root, "--input", chpath, "--dry-run"])
        assert rc == 0
        assert json.load(open(f"{root}/manifest.json"))["generation"] == gen_before
        # real apply with stats
        rc = cli.main(["apply", "--state", root, "--input", chpath, "--statistics"])
        assert rc == 0
        assert json.load(open(f"{root}/manifest.json"))["generation"] > gen_before

    def test_bbox_clip(self, t1_world):
        from osm_live_updates_ray import cli

        ch = t1_world["changes"]
        clipped = cli._clip_bbox(ch, "-10,-10,10,10")
        import numpy as np

        lon = clipped.column("lon").to_numpy(zero_copy_only=False)
        types = np.asarray(clipped.column("type").to_pylist(), dtype=object)
        node_lon = lon[types == "node"]
        assert ((node_lon >= -10) & (node_lon <= 10)).all()
        # ways/relations kept
        assert (types != "node").sum() == sum(
            1 for t in ch.column("type").to_pylist() if t != "node"
        )

    def test_osc_input(self, ray_session, t1_world, tmp_path_factory):
        from osm_live_updates_ray import cli

        t = cli._load_changes(
            ["/root/reference/tests/data/insert_node.osc"], max_seq=None
        )
        assert t.num_rows == 1


class TestOpStreamEmit:
    """§3.3 file-sink parity: ``--output DIR`` writes the delete/insert
    op stream and commits NOTHING; applying the emitted ops by hand must
    reproduce the real apply's partitioned state exactly."""

    def test_emit_then_manual_apply_equals_real_apply(
        self, ray_session, t1_world, tmp_path_factory
    ):
        import json

        import pyarrow.parquet as pq
        import ray.data as rd

        from osm_live_updates_ray.state.store import (
            explode_rel_members,
            explode_way_members,
        )

        w = t1_world
        # hermetic real-apply reference (the shared `replayed` store is
        # mutated by other tests when the whole suite runs)
        rootA = str(tmp_path_factory.mktemp("emit_ref"))
        A = static_join.build_state(
            rootA, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"]
        )
        update.apply_changes(A, w["changes"])
        root = str(tmp_path_factory.mktemp("emit_state"))
        st = static_join.build_state(
            root, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"]
        )
        gen_before = st._manifest["generation"]
        ops_dir = str(tmp_path_factory.mktemp("ops"))
        s = update.apply_changes(st, w["changes"], emit_ops_dir=ops_dir)
        assert s["emitted_ops"] > 0 and s["tiles_rewritten"] == 0
        # nothing committed
        assert st._manifest["generation"] == gen_before
        assert json.load(open(f"{root}/manifest.json"))["generation"] == gen_before

        manifest = [json.loads(l) for l in open(f"{ops_dir}/ops.jsonl")]
        by_op = {(m["table"], m["op"]): m for m in manifest}
        load = lambda tb, op: pq.read_table(f"{ops_dir}/{by_op[(tb, op)]['file']}")

        # old edge touch-keys must come from the PRE-mutation state
        old_way_edges = explode_way_members(
            st.lookup("ways", load("way_members_by_node",
                                   "delete_owners").column("way_id").to_numpy())
        )
        old_rel_edges = explode_rel_members(
            st.lookup("relations", load("rel_members_by_member",
                                        "delete_owners").column("rel_id").to_numpy())
        )
        st.begin()
        for tb in ("nodes", "ways", "relations"):
            st.apply_upserts_deletes(
                tb, load(tb, "upsert"),
                load(tb, "delete").column("id").to_numpy(),
            )
        st.apply_upserts_deletes(
            "geoms", load("geoms", "upsert"),
            load("geoms", "delete").column("gid").to_numpy(),
        )
        st.apply_upserts_deletes(
            "polygon_rings", load("polygon_rings", "upsert"),
            load("polygon_rings", "delete").column("polygon_id").to_numpy(),
        )
        st.apply_owned_edges(
            "way_members_by_node", load("way_members_by_node", "upsert"),
            owner_col="way_id",
            owner_ids=load("way_members_by_node",
                           "delete_owners").column("way_id").to_numpy(),
            touch_keys=old_way_edges.column("node_id").to_numpy(),
        )
        st.apply_owned_edges(
            "rel_members_by_member", load("rel_members_by_member", "upsert"),
            owner_col="rel_id",
            owner_ids=load("rel_members_by_member",
                           "delete_owners").column("rel_id").to_numpy(),
            touch_keys=old_rel_edges.column("member_id").to_numpy(),
        )
        st.commit()

        for table, keys in [
            ("nodes", ["id"]), ("ways", ["id"]), ("relations", ["id"]),
            ("geoms", ["gid"]), ("polygon_rings", ["polygon_id", "ring_idx"]),
            ("way_members_by_node", ["way_id", "pos"]),
            ("rel_members_by_member", ["rel_id", "pos"]),
        ]:
            assert_tables_equal(st.read_all(table), A.read_all(table), keys)


class TestRelationOnlyModify:
    def test_relation_modify_without_member_ways(
        self, ray_session, t1_world, tmp_path_factory
    ):
        """A tag-only modify of a multipolygon relation whose member
        ways are NOT in the change window must keep its rings: the old
        rings are deleted via affected_poly_ids, so the recompute must
        resolve member-way node lists from the full way universe
        (reconstructed ways), not just the dirty/upserted ways."""
        import ray.data as rd

        from osm_live_updates_ray.stages.geometry import REL_POLY_OFFSET

        w = t1_world
        root = str(tmp_path_factory.mktemp("relmod"))
        A = static_join.build_state(
            root, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"]
        )
        rings_before = A.read_all("polygon_rings").sort_by(
            [("polygon_id", "ascending"), ("ring_idx", "ascending")]
        )
        assign_before = A.read_tiles("assignments").sort_by("url")
        pids = rings_before.column("polygon_id").to_numpy(zero_copy_only=False)
        rel_pids = pids[pids >= REL_POLY_OFFSET]
        assert len(rel_pids), "fixture must contain an area relation with rings"
        rid = int(rel_pids[0] - REL_POLY_OFFSET)
        rel_row = w["osm_relations"].filter(
            pc.equal(w["osm_relations"].column("id"), rid)
        )
        t = pa.Table.from_pylist(
            [{
                "seq": 1, "action": "modify", "type": "relation", "id": rid,
                "version": 9, "ts": np.datetime64("2026-01-01", "s").item(),
                "lon": None, "lat": None, "node_ids": None,
                "members": rel_row.column("members").to_pylist()[0],
                "tags": rel_row.column("tags").to_pylist()[0]
                + [("note", "touched")],
            }],
            schema=w["changes"].schema,
        )
        s = update.apply_changes(A, t)
        assert not s["empty"]
        rings_after = A.read_all("polygon_rings").sort_by(
            [("polygon_id", "ascending"), ("ring_idx", "ascending")]
        )
        # geometry untouched by a tag-only modify: rings + assignments
        # must be byte-identical to the pre-change state
        assert_tables_equal(rings_after, rings_before, ["polygon_id", "ring_idx"])
        assert_tables_equal(
            A.read_tiles("assignments"), assign_before, ["url"]
        )


class TestDeleteOnlyWindow:
    def test_delete_only_window_applies(self, replayed):
        # a window containing ONLY deletes must not crash (no upserts,
        # no geometry recompute) and must remove the rows
        from osm_live_updates_ray.schemas import OSM_CHANGES

        A, _, _ = replayed
        existing = A.read_all("nodes").column("id").to_pylist()
        target = existing[0]
        t = pa.Table.from_pylist(
            [{
                "seq": 99, "action": "delete", "type": "node", "id": target,
                "version": 99, "ts": np.datetime64("2026-01-01", "s").item(),
                "lon": None, "lat": None, "node_ids": None, "members": None,
                "tags": [],
            }],
            schema=OSM_CHANGES,
        )
        s = update.apply_changes(A, t)
        assert not s["empty"]
        assert target not in A.read_all("nodes").column("id").to_pylist()


class TestDistributedCow:
    def test_cow_tasks_equal_driver_path(
        self, ray_session, t1_world, tmp_path_factory
    ):
        """COW tile replacement as Ray tasks (cow_task_tiles=0 forces
        it) must leave the store byte-equivalent to the driver
        threadpool path: assignments, rollups, cell summaries, and a
        second delta window on top."""
        import dataclasses

        import ray.data as rd

        from osm_live_updates_ray.config import DEFAULT_CONFIG
        from osm_live_updates_ray.sources import synthetic

        w = t1_world
        second = synthetic.gen_changes(20, 500, 100, 20, seed_offset=5_000)
        stores = []
        for cfg in (
            DEFAULT_CONFIG,
            dataclasses.replace(DEFAULT_CONFIG, cow_task_tiles=0),
            # fully-streaming path (driver_scan_rows=0 forces the dirty
            # Dataset; rejoin_driver_rows=0 keeps the count-based shape
            # switch from routing a small dirty set back to the driver
            # — no driver-side table of re-joined rows ever exists)
            dataclasses.replace(
                DEFAULT_CONFIG, driver_scan_rows=0, rejoin_driver_rows=0
            ),
        ):
            root = str(tmp_path_factory.mktemp("cowpath"))
            st = static_join.build_state(
                root, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
                w["osm_relations"], cfg=cfg,
            )
            update.apply_changes(st, w["changes"], cfg=cfg)
            update.apply_changes(st, second, cfg=cfg)
            stores.append(st)
        A = stores[0]
        for B in stores[1:]:
            assert_tables_equal(
                A.read_tiles("assignments"), B.read_tiles("assignments"), ["url"]
            )
            assert_tables_equal(
                A.read_tiles("rollups"), B.read_tiles("rollups"), ["tile_id"]
            )
            assert_tables_equal(
                A.read_all("cell_summaries"), B.read_all("cell_summaries"),
                ["cell_id"],
            )
