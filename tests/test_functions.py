"""Unit tests for the pure kernels (cells, geo, wkt, hashing, text)."""

import numpy as np
import pytest

from osm_live_updates_ray.functions import cells, geo, hashing, text, wkt


class TestCells:
    def test_cell_roundtrip(self):
        lon = np.array([-180.0, -0.5, 0.0, 10.4, 179.99])
        lat = np.array([-90.0, -0.5, 0.0, 50.2, 89.99])
        c = cells.cell_id(lon, lat)
        ix, iy = cells.unpack_cell(c)
        assert (ix == np.floor(lon + 180)).all()
        assert (iy == np.floor(lat + 90)).all()

    def test_boundary_clamp(self):
        c = cells.cell_id(np.array([180.0]), np.array([90.0]))
        ix, iy = cells.unpack_cell(c)
        assert ix[0] == 359 and iy[0] == 179

    def test_tile_contains_cell(self):
        lon = np.array([12.34])
        lat = np.array([45.67])
        c = cells.cell_id(lon, lat)
        t = cells.tile_id(lon, lat)
        assert (cells.cell_to_tile(c) == t).all()

    def test_morton_locality(self):
        a = cells.morton64(np.array([1], dtype=np.int64), np.array([1], dtype=np.int64))
        b = cells.morton64(np.array([1], dtype=np.int64), np.array([2], dtype=np.int64))
        far = cells.morton64(np.array([100], dtype=np.int64), np.array([100], dtype=np.int64))
        assert abs(int(a[0]) - int(b[0])) < abs(int(a[0]) - int(far[0]))

    def test_covering_bbox(self):
        got = cells.cells_covering_bbox(0.5, 0.5, 2.5, 1.5)
        assert len(got) == 3 * 2  # 3 lon cells x 2 lat cells


class TestGeo:
    def test_pip_square(self):
        rx = np.array([0.0, 10.0, 10.0, 0.0])
        ry = np.array([0.0, 0.0, 10.0, 10.0])
        px = np.array([5.0, 15.0, -1.0])
        py = np.array([5.0, 5.0, 5.0])
        assert geo.points_in_ring(px, py, rx, ry).tolist() == [True, False, False]

    def test_pip_hole(self):
        outer = (np.array([0.0, 10, 10, 0]), np.array([0.0, 0, 10, 10]))
        hole = (np.array([4.0, 6, 6, 4]), np.array([4.0, 4, 6, 6]))
        inside = geo.points_in_polygon(
            np.array([5.0, 2.0]), np.array([5.0, 2.0]), outer, [hole]
        )
        assert inside.tolist() == [False, True]

    def test_area_length_centroid(self):
        x = np.array([0.0, 4, 4, 0, 0])
        y = np.array([0.0, 0, 3, 3, 0])
        assert geo.ring_area(x, y) == 12.0
        assert geo.line_length(x, y) == 14.0
        cx, cy = geo.centroid(x[:-1], y[:-1])
        assert (cx, cy) == (2.0, 1.5)

    def test_convex_hull(self):
        hx, hy = geo.convex_hull(
            np.array([0.0, 2, 1, 1]), np.array([0.0, 0, 1, 0.2])
        )
        assert len(hx) == 3  # interior point dropped

    def test_sq_dist_argmin_tiebreak(self):
        # two candidates at identical distance -> smallest id wins
        bid, bd = geo.sq_dist_argmin(
            np.array([0.0]), np.array([0.0]),
            np.array([1.0, -1.0]), np.array([0.0, 0.0]),
            np.array([9, 4], dtype=np.int64),
        )
        assert bid[0] == 4 and bd[0] == 1.0

    def test_sq_dist_argmin_chunked_equals_direct(self):
        rng = np.random.RandomState(7)
        px, py = rng.rand(50), rng.rand(50)
        qx, qy = rng.rand(300), rng.rand(300)
        qid = rng.permutation(300).astype(np.int64)
        a = geo.sq_dist_argmin(px, py, qx, qy, qid, chunk=16, point_chunk=8)
        b = geo.sq_dist_argmin(px, py, qx, qy, qid)
        assert (a[0] == b[0]).all() and (a[1] == b[1]).all()


class TestWkt:
    def test_point_roundtrip_7_decimals(self):
        # the reference's canonical precision
        # (/root/reference/include/config/Config.h:36)
        s = wkt.point_wkt(13.5690032, 42.7957187)
        assert s == "POINT(13.5690032 42.7957187)"
        assert wkt.parse_point_wkt(s) == (13.5690032, 42.7957187)

    def test_parse_with_literal_suffix(self):
        assert wkt.parse_point_wkt(
            "POINT(1.5 -2.25)^^<http://www.opengis.net/ont/geosparql#wktLiteral>"
        ) == (1.5, -2.25)

    def test_parse_invalid_raises(self):
        with pytest.raises(ValueError):
            wkt.parse_point_wkt("LINESTRING(0 0,1 1)")

    def test_polygon_closes_ring(self):
        s = wkt.polygon_wkt(np.array([0.0, 1, 1]), np.array([0.0, 0, 1]))
        assert s.count("0.0000000 0.0000000") == 2  # closed


class TestHashing:
    def test_stability(self):
        a = hashing.hash_strings(["x", "y", "x"])
        assert a[0] == a[2] and a[0] != a[1]

    def test_minhash_similarity(self):
        t1 = "the quick brown fox jumps over the lazy dog"
        t2 = "the quick brown fox jumps over the lazy cat"
        t3 = "completely different text about something else entirely"
        s1 = hashing.minhash_signature(hashing.hash_strings(hashing.shingles(t1)).view(np.uint64))
        s2 = hashing.minhash_signature(hashing.hash_strings(hashing.shingles(t2)).view(np.uint64))
        s3 = hashing.minhash_signature(hashing.hash_strings(hashing.shingles(t3)).view(np.uint64))
        sim12 = (s1 == s2).mean()
        sim13 = (s1 == s3).mean()
        assert sim12 > 0.5 > sim13

    def test_simhash_hamming(self):
        h1 = hashing.simhash64(hashing.hash_strings("a b c d e f g".split()))
        h2 = hashing.simhash64(hashing.hash_strings("a b c d e f h".split()))
        h3 = hashing.simhash64(hashing.hash_strings("x y z w v u t".split()))
        assert hashing.hamming64(h1, h2) < hashing.hamming64(h1, h3)

    def test_jaccard(self):
        assert hashing.jaccard({1, 2}, {2, 3}) == pytest.approx(1 / 3)


class TestText:
    def test_extractor_byte_identity(self):
        for t in ["plain", "with <tags> & 'quotes' \"too\"", "", "a&amp;b"]:
            assert text.extract_text(text.render_html(t)) == t

    def test_geo_roundtrip_exact(self):
        lon, lat = -123.456, 48.123
        got = text.extract_geo(text.render_html("x", lon, lat))
        assert got == (lon, lat)

    def test_fingerprint64_batch_equals_per_row(self):
        import pyarrow as pa

        docs = [
            "", "a", "hello world", "ünïcødé ♥", "x" * 3000,
            "the quick brown fox", "\n\t mixed \0 bytes",
        ] * 3
        got = text.fingerprint64_batch(docs)
        want = np.array([text.fingerprint64(s) for s in docs], dtype=np.int64)
        np.testing.assert_array_equal(got, want)
        # sliced arrow arrays (non-zero offset) must agree too
        arr = pa.array(docs, type=pa.string()).slice(4, 9)
        got2 = text.fingerprint64_batch(arr)
        np.testing.assert_array_equal(got2, want[4:13])
        # large_string (int64 offsets) must agree too, incl. sliced
        big = pa.array(docs, type=pa.large_string())
        np.testing.assert_array_equal(text.fingerprint64_batch(big), want)
        np.testing.assert_array_equal(
            text.fingerprint64_batch(big.slice(4, 9)), want[4:13]
        )

    def test_extract_text_batch_equals_per_row(self):
        import pyarrow as pa

        tricky = [
            "plain", "", "with <tags> & 'quotes' \"too\"", "a&amp;b",
            "multi\nline\ntext", "ünïcødé ♥ text", "&gt;&lt;&amp;",
            "nested <article> marker text",
            "x" * 5000,
        ]
        htmls = [text.render_html(t) for t in tricky]
        htmls.append(b"<html>no article here</html>")
        arr = pa.array(htmls, type=pa.binary())
        got = text.extract_text_batch(arr).to_pylist()
        want = [text.extract_text(h) for h in htmls]
        assert got == want
        # invalid-UTF8 body forces the per-row fallback; results must
        # still agree for the valid rows (the invalid row raises the
        # same way in both paths or decodes identically)
        arr2 = pa.array(htmls + [b"<article>ok</article>"], type=pa.binary())
        got2 = text.extract_text_batch(arr2).to_pylist()
        assert got2[: len(want)] == want and got2[-1] == "ok"

    def test_ws_tokens(self):
        assert text.ws_tokens("  a  b\tc\n") == ["a", "b", "c"]
        assert text.ws_tokens("") == []

    def test_quality_features(self):
        f = text.quality_features("The cat sat.")
        assert f["n_tokens"] == 3 and f["n_chars"] == 12

    def test_lang_id(self):
        assert text.lang_id("the fox is that with you and the dog") == "en"
        assert text.lang_id("der hund und die katze ist nicht da") == "de"
        assert text.lang_id("你好世界你好世界你好世界") == "zh"
        assert text.lang_id("") == "und"

    def test_fingerprint_deterministic(self):
        assert text.fingerprint64("hello") == text.fingerprint64("hello")
        assert text.fingerprint64("hello") != text.fingerprint64("hellp")


class TestGeoScientificNotation:
    def test_extract_geo_scientific(self):
        from osm_live_updates_ray.functions import text

        # |coord| < 1e-4: repr() switches to e-notation ('5e-05')
        for lon, lat in [(5e-05, -3e-05), (1.25e-07, 8.1e-05), (0.0, -1e-10)]:
            got = text.extract_geo(text.render_html("x", lon, lat))
            assert got == (lon, lat)

    def test_geocoder_stage_scientific(self):
        import pyarrow as pa

        from osm_live_updates_ray.functions import text
        from osm_live_updates_ray.stages.spatial import Geocoder

        lon, lat = 5e-05, -3e-05
        batch = pa.Table.from_pydict(
            {
                "url": ["u1"],
                "html": pa.array([text.render_html("x", lon, lat)], type=pa.binary()),
            }
        )
        out = Geocoder(project=True)(batch)
        assert out.column("lon").to_pylist() == [lon]
        assert out.column("lat").to_pylist() == [lat]
        assert out.column("cell_id").to_pylist()[0] != -1


class TestGeometryDistributedEquality:
    """The distributed bootstrap geometry builders must produce exactly
    the driver-side functions' outputs (same per-object values; only
    row order may differ)."""

    def test_geoms_and_rings_distributed_equal(self, ray_session, t1_world):
        import pyarrow as pa

        from osm_live_updates_ray.config import DEFAULT_CONFIG
        from osm_live_updates_ray.stages import geometry

        w = t1_world
        lookup = geometry.NodeCoordLookup.from_table(w["osm_nodes"])
        driver = pa.concat_tables(
            [
                geometry.node_geoms(w["osm_nodes"], DEFAULT_CONFIG),
                geometry.way_geoms(w["osm_ways"], lookup, DEFAULT_CONFIG),
                geometry.relation_geoms(
                    w["osm_relations"], w["osm_ways"], lookup, DEFAULT_CONFIG
                ),
            ]
        )
        dist = geometry.build_geoms_distributed(
            w["osm_nodes"], w["osm_ways"], w["osm_relations"], lookup
        )
        key = [("type", "ascending"), ("id", "ascending")]
        a, b = driver.sort_by(key), dist.sort_by(key)
        assert a.num_rows == b.num_rows
        assert a.equals(b)

        r_driver = geometry.polygon_rings_from_osm(
            w["osm_ways"], w["osm_relations"], lookup
        )
        r_dist = geometry.build_rings_distributed(
            w["osm_ways"], w["osm_relations"], lookup
        )
        key = [("polygon_id", "ascending"), ("ring_idx", "ascending")]
        a, b = r_driver.sort_by(key), r_dist.sort_by(key)
        assert a.num_rows == b.num_rows
        assert a.equals(b)
