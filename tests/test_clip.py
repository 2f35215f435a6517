"""--polygon clip + extract strategies (reference applyBoundaries,
src/osm/OsmUpdater.cpp:281-304; strategy semantics of osmium extract
simple/complete_ways/smart applied to a change window)."""

import numpy as np
import pyarrow as pa
import pytest

from osm_live_updates_ray.functions import clip
from osm_live_updates_ray.schemas import OSM_CHANGES


def _row(action, otype, oid, lon=None, lat=None, node_ids=None, members=None,
         tags=None, version=2):
    return {
        "seq": 1, "action": action, "type": otype, "id": oid,
        "version": version, "ts": np.datetime64("2026-01-01", "s").item(),
        "lon": lon, "lat": lat, "node_ids": node_ids, "members": members,
        "tags": tags or [],
    }


def triangle_changes():
    """Triangle (0,0)-(10,0)-(0,10).  Nodes: 1 inside, 2 inside,
    3 outside, 4 outside; way 10 = [1,2] (both kept), way 11 = [3,4]
    (all windowed members outside), way 12 = [2,3] (mixed), way 13 =
    [99] (member not in window); relation 20 = multipolygon over way 11
    + node 1; relation 21 = route over way 11 only."""
    rows = [
        _row("create", "node", 1, lon=2.0, lat=2.0, version=1),
        _row("create", "node", 2, lon=3.0, lat=3.0, version=1),
        _row("create", "node", 3, lon=50.0, lat=50.0, version=1),
        _row("create", "node", 4, lon=60.0, lat=20.0, version=1),
        _row("create", "way", 10, node_ids=[1, 2], version=1),
        _row("create", "way", 11, node_ids=[3, 4], version=1),
        _row("create", "way", 12, node_ids=[2, 3], version=1),
        _row("create", "way", 13, node_ids=[99], version=1),
        _row("create", "relation", 20,
             members=[{"ref": 11, "type": "way", "role": "outer"},
                      {"ref": 1, "type": "node", "role": "admin_centre"}],
             tags=[("type", "multipolygon")], version=1),
        _row("create", "relation", 21,
             members=[{"ref": 11, "type": "way", "role": ""}],
             tags=[("type", "route")], version=1),
    ]
    return pa.Table.from_pylist(rows, schema=OSM_CHANGES)


TRI = [(np.array([0.0, 10.0, 0.0]), np.array([0.0, 0.0, 10.0]))]


def ids_of(t, otype):
    import pyarrow.compute as pc

    return sorted(
        t.filter(pc.equal(t.column("type"), otype)).column("id").to_pylist()
    )


def _clip(strategy):
    return clip.clip_changes(
        triangle_changes(),
        lambda lo, la: clip.region_mask_polygon(lo, la, TRI),
        strategy,
    )


class TestStrategies:
    def test_simple(self):
        out = _clip("simple")
        assert ids_of(out, "node") == [1, 2]
        # way 10: members kept; way 11: all windowed members outside ->
        # dropped; way 12: one kept member; way 13: undecidable -> kept
        assert ids_of(out, "way") == [10, 12, 13]
        # rel 20 references kept node 1 -> kept; rel 21 only references
        # dropped way 11 -> dropped
        assert ids_of(out, "relation") == [20]

    def test_complete_ways_pulls_outside_members(self):
        out = _clip("complete_ways")
        # way 12 is kept, so its outside member node 3 is pulled in
        assert ids_of(out, "node") == [1, 2, 3]
        assert ids_of(out, "way") == [10, 12, 13]

    def test_smart_completes_multipolygons(self):
        out = _clip("smart")
        # rel 20 is a kept multipolygon -> its member way 11 and way
        # 11's nodes (3, 4) come back in
        assert ids_of(out, "way") == [10, 11, 12, 13]
        assert ids_of(out, "node") == [1, 2, 3, 4]
        assert ids_of(out, "relation") == [20]

    def test_unknown_strategy_raises(self):
        with pytest.raises(ValueError, match="extract strategy"):
            _clip("bogus")


class TestPolyFile:
    def test_parse_and_cli(self, tmp_path):
        poly = tmp_path / "tri.poly"
        poly.write_text(
            "triangle\nring1\n  0.0 0.0\n  10.0 0.0\n  0.0 10.0\nEND\nEND\n"
        )
        rings = clip.parse_poly_file(str(poly))
        assert len(rings) == 1 and len(rings[0][0]) == 3
        inside = clip.region_mask_polygon(
            np.array([2.0, 50.0]), np.array([2.0, 50.0]), rings
        )
        assert inside.tolist() == [True, False]

    def test_bbox_polygon_exclusive(self, tmp_path):
        import pyarrow.parquet as pq

        from osm_live_updates_ray import cli

        chpath = str(tmp_path / "ch.parquet")
        pq.write_table(triangle_changes(), chpath)
        rc = cli.main([
            "apply", "--state", str(tmp_path / "nostate"), "--input", chpath,
            "--bbox", "0,0,1,1", "--polygon", "x.poly",
        ])
        assert rc == 2
