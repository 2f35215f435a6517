"""OBB (oriented bounding box) derived column — rotating calipers over
the convex hull, gated by ``with_obb`` exactly like the reference's
option-gated obb triples (src/osm/OsmChangeHandler.cpp:541, osm2rdf
option discovery ST2)."""

import numpy as np
import pyarrow as pa

from osm_live_updates_ray.config import DEFAULT_CONFIG
from osm_live_updates_ray.functions import geo


def _contains_all(rx, ry, px, py, tol=1e-9):
    # rectangle corners (open ring); test via the two edge frames
    ux, uy = rx[1] - rx[0], ry[1] - ry[0]
    vx, vy = rx[3] - rx[0], ry[3] - ry[0]
    du = ux * ux + uy * uy
    dv = vx * vx + vy * vy
    su = (px - rx[0]) * ux + (py - ry[0]) * uy
    sv = (px - rx[0]) * vx + (py - ry[0]) * vy
    return (
        (su >= -tol * max(du, 1)).all() and (su <= du + tol * max(du, 1)).all()
        and (sv >= -tol * max(dv, 1)).all() and (sv <= dv + tol * max(dv, 1)).all()
    )


def _rect_area(rx, ry):
    return abs(
        (rx[1] - rx[0]) * (ry[3] - ry[0]) - (ry[1] - ry[0]) * (rx[3] - rx[0])
    )


class TestOrientedBbox:
    def test_axis_aligned_equals_envelope(self):
        x = np.array([0.0, 2.0, 2.0, 0.0, 1.0])
        y = np.array([0.0, 0.0, 1.0, 1.0, 0.5])
        rx, ry = geo.oriented_bbox(x, y)
        assert _rect_area(rx, ry) == pytest_approx(2.0)
        assert sorted(zip(rx, ry)) == [(0, 0), (0, 1), (2, 0), (2, 1)]

    def test_rotated_square_recovered(self):
        # unit square rotated 30°: min-area OBB area must be ~1, far
        # below the axis-aligned envelope's
        th = np.deg2rad(30)
        base = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        pts = base @ R.T
        rx, ry = geo.oriented_bbox(pts[:, 0], pts[:, 1])
        assert abs(_rect_area(rx, ry) - 1.0) < 1e-9
        env = (pts[:, 0].ptp()) * (pts[:, 1].ptp())
        assert env > 1.2  # sanity: envelope is genuinely bigger

    def test_random_contains_and_not_worse_than_envelope(self):
        rng = np.random.RandomState(3)
        for _ in range(25):
            n = rng.randint(3, 40)
            x = rng.uniform(-5, 5, n)
            y = rng.uniform(-5, 5, n)
            rx, ry = geo.oriented_bbox(x, y)
            assert _contains_all(rx, ry, x, y)
            env = (x.max() - x.min()) * (y.max() - y.min())
            assert _rect_area(rx, ry) <= env + 1e-9

    def test_degenerate(self):
        rx, ry = geo.oriented_bbox(np.array([1.0]), np.array([2.0]))
        assert list(rx) == [1.0] * 4 and list(ry) == [2.0] * 4
        rx, ry = geo.oriented_bbox(np.array([0.0, 1.0]), np.array([0.0, 1.0]))
        assert len(rx) == 4
        # collinear
        rx, ry = geo.oriented_bbox(
            np.array([0.0, 1.0, 2.0]), np.array([0.0, 1.0, 2.0])
        )
        assert _contains_all(rx, ry, np.array([0.0, 1.0, 2.0]),
                             np.array([0.0, 1.0, 2.0]))

    def test_deterministic(self):
        rng = np.random.RandomState(9)
        x = rng.uniform(0, 1, 20)
        y = rng.uniform(0, 1, 20)
        a = geo.oriented_bbox(x, y)
        b = geo.oriented_bbox(x[::-1].copy(), y[::-1].copy())
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


def pytest_approx(v, eps=1e-9):
    class A:
        def __eq__(self, other):
            return abs(other - v) < eps
    return A()


class TestObbOptionRoundTrip:
    def test_store_discovers_with_obb(self, ray_session, tmp_path_factory):
        import dataclasses

        import ray.data as rd

        from osm_live_updates_ray.pipelines import static_join, update
        from osm_live_updates_ray.sources import synthetic
        from osm_live_updates_ray.state.store import StateStore

        cfg = dataclasses.replace(DEFAULT_CONFIG, with_obb=True)
        pages = synthetic.gen_pages(0, 200)
        nodes = synthetic.gen_osm_nodes(150)
        ways = synthetic.gen_osm_ways(30, 150)
        rels = synthetic.gen_osm_relations(6, 30, 150)
        root = str(tmp_path_factory.mktemp("obb"))
        st = static_join.build_state(
            root, rd.from_arrow(pages), nodes, ways, rels, cfg
        )
        g = st.read_all("geoms")
        obb = g.column("obb_wkt").to_pylist()
        assert all(v is not None and v.startswith("POLYGON((") for v in obb)

        # ST2 round-trip: a re-opened store with a DEFAULT config must
        # rediscover with_obb=True and keep writing obb on delta
        st2 = StateStore(root)
        assert st2.discovered_config(DEFAULT_CONFIG).with_obb is True
        changes = synthetic.gen_changes(20, 150, 30, 6)
        update.apply_changes(st2, changes)
        g2 = st2.read_all("geoms")
        assert all(
            v is not None for v in g2.column("obb_wkt").to_pylist()
        )

    def test_default_off_stays_null(self, ray_session, tmp_path_factory):
        import ray.data as rd

        from osm_live_updates_ray.pipelines import static_join
        from osm_live_updates_ray.sources import synthetic

        pages = synthetic.gen_pages(0, 50)
        nodes = synthetic.gen_osm_nodes(60)
        ways = synthetic.gen_osm_ways(10, 60)
        rels = synthetic.gen_osm_relations(2, 10, 60)
        root = str(tmp_path_factory.mktemp("noobb"))
        st = static_join.build_state(
            root, rd.from_arrow(pages), nodes, ways, rels
        )
        g = st.read_all("geoms")
        assert all(v is None for v in g.column("obb_wkt").to_pylist())
