"""Delta semantics: dedup ordering, classification buckets, cascade and
closure — including replays of the reference's own .osc fixtures
(/root/reference/tests/data/, the conformance corpus of SURVEY.md §5).
"""

import numpy as np
import pyarrow as pa
import pytest

from osm_live_updates_ray.schemas import OSM_CHANGES
from osm_live_updates_ray.sources import osc, synthetic
from osm_live_updates_ray.stages import delta
from osm_live_updates_ray.stages.dedup import dedup_table
from osm_live_updates_ray.state.store import StateStore

REF = "/root/reference/tests/data"


def mk_changes(rows: list[dict]) -> pa.Table:
    base = {
        "seq": 0, "action": "create", "type": "node", "id": 1, "version": 1,
        "ts": np.datetime64("2024-01-01", "s").item(), "lon": None, "lat": None,
        "node_ids": None, "members": None, "tags": [],
    }
    return pa.Table.from_pylist([{**base, **r} for r in rows], schema=OSM_CHANGES)


@pytest.fixture(scope="module")
def store(tmp_path_factory, t1_world):
    root = tmp_path_factory.mktemp("delta_store")
    return StateStore.build(
        str(root),
        nodes=t1_world["osm_nodes"],
        ways=t1_world["osm_ways"],
        relations=t1_world["osm_relations"],
    )


class TestDedup:
    def test_last_version_wins(self):
        # reference ordering: version DESC, deleted DESC, ts DESC, first
        # kept per (type,id) — include/osm/OsmFileHelper.h:42-55
        t = mk_changes(
            [
                {"id": 1, "version": 1, "action": "create"},
                {"id": 1, "version": 2, "action": "modify"},
                {"id": 2, "version": 3, "action": "modify"},
                {"id": 2, "version": 3, "action": "delete"},
            ]
        )
        out = dedup_table(t)
        d = {r["id"]: r for r in out.to_pylist()}
        assert len(out) == 2
        assert d[1]["version"] == 2 and d[1]["action"] == "modify"
        assert d[2]["action"] == "delete"  # delete beats modify at equal version

    def test_dataset_dedup_equals_table(self, ray_session, t1_world):
        import ray.data as rd

        from osm_live_updates_ray.stages.dedup import dedup_dataset

        ch = t1_world["changes"]
        a = dedup_table(ch).sort_by([("type", "ascending"), ("id", "ascending")])
        b = (
            dedup_dataset(rd.from_arrow(ch))
            .to_pandas()
        )
        b = pa.Table.from_pandas(b, schema=a.schema, preserve_index=False).sort_by(
            [("type", "ascending"), ("id", "ascending")]
        )
        assert a.equals(b)


class TestClassification:
    def test_modify_absent_becomes_create(self, store):
        # reference: src/osm/NodeHandler.cpp:70-76
        t = mk_changes([{"id": 999999, "action": "modify", "version": 5,
                         "lon": 1.0, "lat": 2.0}])
        plan = delta.classify(t, store)
        assert 999999 in plan.created_nodes
        assert len(plan.modified_nodes) == 0

    def test_modify_same_location_no_cascade(self, store, t1_world):
        # reference: src/osm/NodeHandler.cpp:63-66 — location unchanged
        # => bucket modified, NO geometry cascade
        n = t1_world["osm_nodes"].to_pylist()[0]
        t = mk_changes([{"id": n["id"], "action": "modify", "version": 9,
                         "lon": n["lon"], "lat": n["lat"]}])
        plan = delta.classify(t, store)
        assert n["id"] in plan.modified_nodes
        assert len(plan.modified_nodes_loc_changed) == 0
        assert len(plan.ways_to_update_geometry) == 0

    def test_moved_node_cascades_to_ways_and_relations(self, store, t1_world):
        # pick a node referenced by some way
        way = t1_world["osm_ways"].to_pylist()[0]
        nid = way["node_ids"][0]
        t = mk_changes([{"id": nid, "action": "modify", "version": 9,
                         "lon": 0.123, "lat": 0.456}])
        plan = delta.classify(t, store)
        assert nid in plan.modified_nodes_loc_changed
        assert way["id"] in plan.ways_to_update_geometry
        # the dirty way's member nodes (minus the changed node) are
        # referenced for reconstruction (J4)
        expect_refs = set(way["node_ids"]) - {nid}
        assert expect_refs.issubset(set(plan.referenced_nodes.tolist()))

    def test_way_in_changefile_not_dirty(self, store, t1_world):
        # a way present in the change file is excluded from the dirty
        # set (reference: OsmChangeHandler.cpp:222-227 anti-join)
        way = t1_world["osm_ways"].to_pylist()[0]
        nid = way["node_ids"][0]
        t = mk_changes(
            [
                {"id": nid, "action": "modify", "version": 9, "lon": 0.1, "lat": 0.2},
                {"id": way["id"], "type": "way", "action": "modify", "version": 9,
                 "node_ids": way["node_ids"]},
            ]
        )
        plan = delta.classify(t, store)
        assert way["id"] not in plan.ways_to_update_geometry
        assert way["id"] in plan.modified_ways

    def test_relation_of_relation_not_cascaded(self, store, t1_world):
        # every 7th synthetic relation references relation id-1; touching
        # a relation must NOT dirty its parent relation (reference
        # cutoff src/osm/OsmChangeHandler.cpp:270-285)
        rels = t1_world["osm_relations"].to_pylist()
        child = next(r for r in rels if any(m["type"] == "relation" for m in r["members"]))
        child_of = next(m["ref"] for m in child["members"] if m["type"] == "relation")
        t = mk_changes(
            [{"id": child_of, "type": "relation", "action": "modify", "version": 9,
              "members": rels[child_of]["members"],
              "tags": [("type", "multipolygon")]}]
        )
        plan = delta.classify(t, store)
        assert child["id"] not in plan.relations_to_update_geometry

    def test_relation_of_relation_hop_option(self, store, t1_world):
        # J7 behind EngineConfig.rel_of_rel_hop (the reference's own
        # rel-of-rel query is dead code — OsmChangeHandler.cpp:289-304
        # has no caller): ONE reverse hop, no transitive closure
        from osm_live_updates_ray.config import EngineConfig
        from osm_live_updates_ray.state.store import StateStore

        rels = t1_world["osm_relations"].to_pylist()
        child = next(
            r for r in rels
            if any(m["type"] == "relation" for m in r["members"])
        )
        child_of = next(
            m["ref"] for m in child["members"] if m["type"] == "relation"
        )
        t = mk_changes(
            [{"id": child_of, "type": "relation", "action": "modify",
              "version": 9, "members": rels[child_of]["members"],
              "tags": [("type", "multipolygon")]}]
        )
        hop_store = StateStore(
            store.root, config=EngineConfig(rel_of_rel_hop=True)
        )
        plan = delta.classify(t, hop_store)
        assert child["id"] in plan.relations_to_update_geometry
        # one hop only: a relation referencing `child` stays clean
        grandparent = next(
            (r for r in rels if any(
                m["type"] == "relation" and m["ref"] == child["id"]
                for m in r["members"]
            )),
            None,
        )
        if grandparent is not None:
            assert grandparent["id"] not in plan.relations_to_update_geometry

    def test_create_way_external_refs(self, store):
        # FIXTURES scenario 6: created way whose member nodes are not in
        # the delta => referenced closure; missing members tolerated
        t = mk_changes(
            [{"id": 5000, "type": "way", "action": "create", "version": 1,
              "node_ids": [1, 2, 999999]}]
        )
        plan = delta.classify(t, store)
        assert {1, 2, 999999}.issubset(set(plan.referenced_nodes.tolist()))
        rec = delta.reconstruct(plan, store)
        got = set(rec["nodes"].column("id").to_pylist())
        assert {1, 2}.issubset(got) and 999999 not in got  # missing tolerated


class TestOscFixtures:
    """Replays of the reference's own change-file corpus."""

    def test_insert_node(self, store):
        t = osc.read_osc_file(f"{REF}/insert_node.osc")
        assert t.num_rows == 1
        plan = delta.classify(t, store)
        # version=37 => MODIFY by the version heuristic, but id 1 is not
        # a node in the store => reclassified CREATE
        assert 1 in plan.created_nodes

    def test_modify_node_against_seeded_state(self, tmp_path):
        t = osc.read_osc_file(f"{REF}/modify_node.osc")
        row = t.to_pylist()[0]
        # seed a store that CONTAINS node 1 at the same location
        from osm_live_updates_ray.schemas import OSM_NODES

        nodes = pa.Table.from_pylist(
            [{"id": 1, "lon": row["lon"], "lat": row["lat"], "tags": [],
              "version": 36, "ts": row["ts"]}],
            schema=OSM_NODES,
        )
        st = StateStore.build(str(tmp_path / "s1"), nodes=nodes)
        plan = delta.classify(t, st)
        assert 1 in plan.modified_nodes  # same location => no cascade
        # and a MOVED version of the same fixture:
        t2 = t.set_column(
            t.schema.get_field_index("lon"), "lon", pa.array([99.0])
        )
        plan2 = delta.classify(t2, st)
        assert 1 in plan2.modified_nodes_loc_changed

    def test_delete_node(self, store):
        t = osc.read_osc_file(f"{REF}/delete_node.osc")
        plan = delta.classify(t, store)
        assert 1 in plan.deleted_nodes

    def test_way_fixture_references(self, store):
        # test.osc: a created way with 180+ external node refs
        t = osc.read_osc_file(f"{REF}/test.osc")
        plan = delta.classify(t, store)
        assert 6281774 in plan.created_ways or 6281774 in plan.modified_ways
        assert len(plan.referenced_nodes) > 100

    def test_replay_427_parses_and_classifies(self, store):
        # the ~1MB real-world replication diff
        t = osc.read_osc_file(f"{REF}/427.osc")
        assert t.num_rows == 4613
        deduped = dedup_table(t)
        assert deduped.num_rows <= t.num_rows
        plan = delta.classify(deduped, store)
        assert not plan.is_empty()
        total = (
            len(plan.created_nodes) + len(plan.modified_nodes)
            + len(plan.modified_nodes_loc_changed) + len(plan.deleted_nodes)
        )
        nodes_in_file = deduped.filter(
            pa.compute.equal(deduped.column("type"), "node")
        ).num_rows
        assert total == nodes_in_file


class TestMultiFileMerge:
    def test_reference_trio_last_version_wins(self, ray_session, store):
        """FIXTURES scenario 8 with the reference's REAL fixture files:
        insert/modify/delete of node 1 across three change files merge
        to ONE surviving row (delete wins at equal version via the
        deleted-flag tie-break, OsmFileHelper.h:42-55)."""
        ds = osc.read_osc_dataset(
            [
                f"{REF}/insert_node.osc",
                f"{REF}/modify_node.osc",
                f"{REF}/delete_node.osc",
            ]
        )
        from osm_live_updates_ray.stages.dedup import dedup_dataset

        out = dedup_dataset(ds).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["id"] == 1
        assert out.iloc[0]["action"] == "delete"

    def test_427_dataset_roundtrip(self, ray_session):
        ds = osc.read_osc_dataset([f"{REF}/427.osc"])
        assert ds.count() == 4613

    def test_427_gz_identical_to_plain(self):
        # the replication server serves gzipped diffs; decompression
        # must be transparent (reference fetches .osc.gz)
        plain = osc.read_osc_file(f"{REF}/427.osc")
        gz = osc.read_osc_file(f"{REF}/427.osc.gz")
        assert gz.equals(plain)
