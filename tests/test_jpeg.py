"""Baseline JPEG codec (functions/jpeg.py): known-pixel fixtures across
quality / subsampling / restart intervals, independent IDCT math check,
wire-format interop with the header parser, and the featurize stage
taking the REAL decode path for JPEG payloads (the pattern test_png.py
pins for PNG)."""

import numpy as np
import pyarrow as pa
import pytest

from osm_live_updates_ray.functions import jpeg, media


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [x * 255 // max(w - 1, 1), y * 255 // max(h - 1, 1),
         np.clip(128 + (x - y) * 2, 0, 255)],
        axis=2,
    ).astype(np.uint8)


class TestRoundTrip:
    def test_solid_color_near_exact(self):
        """A flat block is DC-only — quantization can cost at most the
        DC rounding step (<= 1 LSB at q95)."""
        img = np.full((16, 24, 3), [120, 64, 200], dtype=np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1

    @pytest.mark.parametrize("quality,subsample,bound", [
        (95, False, 4), (90, False, 6), (90, True, 8), (75, True, 14),
    ])
    def test_smooth_gradient_error_bounds(self, quality, subsample, bound):
        img = _smooth(48, 48)
        dec = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=quality, subsample=subsample)
        )
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= bound
        assert err.mean() <= bound / 3

    def test_restart_intervals_identical(self):
        """Restart markers change the wire format, not the pixels."""
        img = _smooth(40, 56)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
        for ri in (1, 3, 7):
            enc = jpeg.encode_jpeg(img, quality=85, restart_interval=ri)
            assert b"\xff\xdd" in enc  # DRI emitted
            np.testing.assert_array_equal(jpeg.decode_jpeg(enc), base)

    def test_restart_with_subsample(self):
        img = _smooth(33, 47)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, subsample=True))
        enc = jpeg.encode_jpeg(img, quality=85, subsample=True, restart_interval=2)
        np.testing.assert_array_equal(jpeg.decode_jpeg(enc), base)

    def test_grayscale(self):
        y, x = np.mgrid[0:24, 0:40]
        g = (x * 255 // 39).astype(np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=92))
        assert dec.shape == (24, 40, 3)
        # gray replicates across channels
        np.testing.assert_array_equal(dec[..., 0], dec[..., 1])
        assert np.abs(dec[..., 0].astype(int) - g.astype(int)).max() <= 4

    @pytest.mark.parametrize("h,w", [(8, 8), (7, 9), (17, 19), (1, 1), (9, 32)])
    def test_odd_dimensions(self, h, w):
        rng = np.random.RandomState(h * 100 + w)
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        for sub in (False, True):
            dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsample=sub))
            assert dec.shape == (h, w, 3)

    def test_noise_survives_decode(self):
        """Random noise (worst case for DCT) still decodes to the right
        shape with bounded error at high quality."""
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=98))
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() < 16

    def test_decode_deterministic(self):
        img = _smooth(24, 24)
        enc = jpeg.encode_jpeg(img, quality=88)
        np.testing.assert_array_equal(jpeg.decode_jpeg(enc), jpeg.decode_jpeg(enc))


class TestMath:
    def test_idct_matches_naive_formula(self):
        """The einsum IDCT must equal the textbook T.81 A.3.3 double sum
        — an INDEPENDENT check that encode/decode don't share a basis
        bug."""
        rng = np.random.RandomState(11)
        F = rng.randint(-200, 200, (8, 8)).astype(np.float64)
        C = jpeg._dct_basis()
        fast = C.T @ F @ C
        naive = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv * F[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                naive[x, y] = s / 4.0
        np.testing.assert_allclose(fast, naive, atol=1e-9)

    def test_zigzag_is_standard(self):
        assert jpeg._ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
        assert jpeg._ZIGZAG[-4:].tolist() == [47, 55, 62, 63]
        assert sorted(jpeg._ZIGZAG.tolist()) == list(range(64))

    def test_huffman_tables_wellformed(self):
        for bits, values in (jpeg._DC_LUM, jpeg._DC_CHR, jpeg._AC_LUM,
                             jpeg._AC_CHR):
            assert sum(bits) == len(values)
            codes = jpeg._canonical_codes(bits, values)
            # prefix-free: no code is a prefix of another
            alls = sorted(
                (format(c, f"0{ln}b") for c, ln in codes.values()), key=len
            )
            for i, a in enumerate(alls):
                for b in alls[i + 1:]:
                    assert not b.startswith(a)


class TestWireFormat:
    def test_header_parser_reads_dims(self):
        img = _smooth(21, 35)
        enc = jpeg.encode_jpeg(img, quality=80, subsample=True)
        assert media.sniff(enc) == "jpeg"
        assert media.image_meta(enc) == ("jpeg", 35, 21)

    def test_decode_image_dispatch(self):
        img = _smooth(10, 12)
        enc = jpeg.encode_jpeg(img, quality=90)
        out = media.decode_image(enc)
        assert out.shape == (10, 12, 3)

    def test_sof2_routes_through_general_scan_loop(self):
        """SOF2 no longer raises (round-5 progressive decode): a
        baseline stream relabeled SOF2 is one full-band interleaved
        scan and must decode to the identical pixels via the general
        scan loop."""
        enc = bytearray(jpeg.encode_jpeg(_smooth(8, 8)))
        i = bytes(enc).find(b"\xff\xc0")
        want = jpeg.decode_jpeg(bytes(enc))
        enc[i + 1] = 0xC2
        assert np.array_equal(jpeg.decode_jpeg(bytes(enc)), want)

    def test_arithmetic_coding_rejected(self):
        """SOF9 (arithmetic) must still raise NotImplementedError
        (decode-failure null row downstream), never synthetic pixels."""
        enc = bytearray(jpeg.encode_jpeg(_smooth(8, 8)))
        i = bytes(enc).find(b"\xff\xc0")
        enc[i + 1] = 0xC9
        with pytest.raises(NotImplementedError):
            jpeg.decode_jpeg(bytes(enc))

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n")

    def test_missing_scan(self):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(b"\xff\xd8\xff\xd9")


class TestFeaturizeJpegPath:
    def test_featurizer_takes_real_path_for_jpeg(self):
        """Identical pixels via PPM (known-real path) and via JPEG at
        near-lossless quality must featurize to NEARLY the same vector
        — proof the JPEG row went through the real decode, not the byte
        stub (stub output of different containers of the same image
        would differ wildly)."""
        from osm_live_updates_ray.stages import multimodal

        img = _smooth(20, 28)
        fz = multimodal.ImageFeaturizer(out_dim=16, resize=(32, 32))
        batch = pa.table({
            "media_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array(
                [media.encode_ppm(img), jpeg.encode_jpeg(img, quality=98)],
                type=pa.binary(),
            ),
        })
        out = fz(batch)
        f = out.column("feat").to_pylist()
        assert f[0] is not None and f[1] is not None
        a, b = np.array(f[0]), np.array(f[1])
        assert np.abs(a - b).max() < 0.05
        assert out.column("decoder_version").to_pylist() == [multimodal.ImageFeaturizer.VERSION] * 2

    def test_truncated_jpeg_is_null_row_not_crash(self):
        from osm_live_updates_ray.stages import multimodal

        enc = jpeg.encode_jpeg(_smooth(16, 16), quality=90)
        fz = multimodal.ImageFeaturizer(out_dim=8, resize=(16, 16))
        batch = pa.table({
            "media_id": pa.array([1], type=pa.int64()),
            # cut inside the header segments -> parse error -> null row
            "payload": pa.array([enc[:20]], type=pa.binary()),
        })
        out = fz(batch)
        assert out.column("feat").to_pylist() == [None]


class TestProgressive:
    """SOF2 decode pinned against the baseline decoder: the scan
    script only reorders bits, so the SAME quantized coefficients must
    reconstruct — pixel-exact equality, not tolerance."""

    def _roundtrip_equal(self, img, **kw):
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, **kw))
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, **kw))
        assert np.array_equal(base, prog)
        return prog

    def test_color_shapes_and_subsampling(self):
        for h, w in ((8, 8), (20, 28), (33, 17)):
            for sub in (False, True):
                self._roundtrip_equal(_smooth(h, w), quality=90,
                                      subsample=sub)

    def test_grayscale_non_interleaved_scans(self):
        img = _smooth(24, 16)[:, :, 0]
        out = self._roundtrip_equal(img, quality=90)
        assert out.shape == (24, 16, 3)

    def test_known_pixels_flat_image(self):
        """A constant image decodes exactly (every AC band is one long
        EOB run — the multi-block EOBRUN path in first AND refine
        scans)."""
        img = np.full((64, 64, 3), 77, dtype=np.uint8)
        out = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, quality=90))
        assert np.array_equal(out, np.full((64, 64, 3), 77, np.uint8))

    def test_noise_dense_coefficients(self):
        """Dense spectra exercise ZRL + correction-bit interleaving in
        the refinement scans."""
        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (40, 56, 3), dtype=np.uint8)
        self._roundtrip_equal(img, quality=75)

    def test_sniffs_and_parses_as_jpeg(self):
        from osm_live_updates_ray.functions import media

        enc = jpeg.encode_jpeg_progressive(_smooth(16, 16), quality=90)
        assert media.sniff(enc) == "jpeg"
        assert media.image_meta(enc) == ("jpeg", 16, 16)

    def test_featurizer_mixed_fixture_no_null_rows(self):
        """VERDICT r4 task 6 'done' criterion: on a mixed PNG /
        baseline-JPEG / progressive-JPEG fixture set, image_features'
        null-row rate is 0 — progressive no longer falls into the
        decode-failure path."""
        from osm_live_updates_ray.functions import media
        from osm_live_updates_ray.stages import multimodal

        img = _smooth(16, 16)
        fz = multimodal.ImageFeaturizer(out_dim=8, resize=(16, 16))
        batch = pa.table({
            "media_id": pa.array([1, 2, 3], type=pa.int64()),
            "payload": pa.array([
                media.encode_png(img),
                jpeg.encode_jpeg(img, quality=95),
                jpeg.encode_jpeg_progressive(img, quality=95),
            ], type=pa.binary()),
        })
        out = fz(batch)
        feats = out.column("feat").to_pylist()
        assert all(f is not None for f in feats)
        # near-lossless quality: all three containers of the SAME
        # pixels land in the same feature neighborhood
        a, b, c = (np.array(f) for f in feats)
        assert np.abs(a - c).max() < 0.05
        assert np.abs(b - c).max() < 0.05
