"""Randomized conformance: delta replay == full recompute across
GENERATED worlds and change windows of varying shape — the fixed-t1
conformance suite (test_pipeline.py) swept over world sizes, window
sizes and change-mix seeds.  Each case builds two stores: A replays
the window incrementally, B bootstraps from the merged layers; every
partitioned table and the tile assignments must agree exactly."""

import pyarrow as pa
import pytest
from test_pipeline import assert_tables_equal, merge_layer

from osm_live_updates_ray.pipelines import static_join, update
from osm_live_updates_ray.schemas import OSM_NODES, OSM_RELATIONS, OSM_WAYS
from osm_live_updates_ray.sources import synthetic
from osm_live_updates_ray.stages.dedup import dedup_table

# (nodes, ways, rels, pages, delta_rows, seed_offset) — offsets shift
# gen_changes' whole id/action/payload mix, so each case exercises a
# different blend of creates/moves/deletes/absent-modifies/collisions
CASES = [
    (300, 60, 12, 400, 40, 1_000),
    (500, 100, 20, 1_000, 120, 31_415),
    (250, 50, 10, 300, 25, 271_828),
    (640, 128, 24, 800, 80, 999_983),
]


@pytest.mark.parametrize("n_nodes,n_ways,n_rels,n_pages,delta,off", CASES)
def test_delta_replay_equals_full_recompute(
    ray_session, tmp_path_factory, n_nodes, n_ways, n_rels, n_pages, delta, off
):
    import ray.data as rd

    pages = synthetic.gen_pages(0, n_pages)
    nodes = synthetic.gen_osm_nodes(n_nodes)
    ways = synthetic.gen_osm_ways(n_ways, n_nodes)
    rels = synthetic.gen_osm_relations(n_rels, n_ways, n_nodes)
    changes = synthetic.gen_changes(
        delta, n_nodes, n_ways, n_rels, seed_offset=off
    )

    rootA = str(tmp_path_factory.mktemp(f"rcA{off}"))
    A = static_join.build_state(rootA, rd.from_arrow(pages), nodes, ways, rels)
    s = update.apply_changes(A, changes)
    assert not s["empty"]

    ch = dedup_table(changes)
    rootB = str(tmp_path_factory.mktemp(f"rcB{off}"))
    B = static_join.build_state(
        rootB,
        rd.from_arrow(pages),
        merge_layer(ch, nodes, "node", OSM_NODES),
        merge_layer(ch, ways, "way", OSM_WAYS),
        merge_layer(ch, rels, "relation", OSM_RELATIONS),
    )

    for table, keys in [
        ("nodes", ["id"]), ("ways", ["id"]), ("relations", ["id"]),
        ("way_members_by_node", ["way_id", "pos"]),
        ("rel_members_by_member", ["rel_id", "pos"]),
        ("geoms", ["gid"]), ("polygon_rings", ["polygon_id", "ring_idx"]),
        ("cell_summaries", ["cell_id"]),
    ]:
        assert_tables_equal(A.read_all(table), B.read_all(table), keys)
    assert_tables_equal(
        A.read_tiles("assignments"), B.read_tiles("assignments"), ["url"]
    )
    assert_tables_equal(
        A.read_tiles("rollups"), B.read_tiles("rollups"), ["tile_id"]
    )
