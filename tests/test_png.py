"""Pure-stdlib PNG codec: known-pixel round trips across all five
scanline filters and the four supported color types, wire format
readable by the header parser, and the featurize stage actually taking
the REAL decode path for PNG payloads."""

import numpy as np
import pyarrow as pa
import pytest

from osm_live_updates_ray.functions import media


def _img(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestPngRoundTrip:
    @pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
    def test_rgb_all_filters(self, filt):
        img = _img(13, 17, seed=filt)
        out = media.decode_png(media.encode_png(img, filter_type=filt))
        np.testing.assert_array_equal(out, img)

    @pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
    def test_gray_all_filters(self, filt):
        g = np.arange(9 * 11, dtype=np.uint8).reshape(9, 11)
        out = media.decode_png(media.encode_png(g, filter_type=filt))
        np.testing.assert_array_equal(out, np.repeat(g[:, :, None], 3, axis=2))

    def test_rgba_alpha_dropped(self):
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, size=(7, 5, 4), dtype=np.uint8)
        out = media.decode_png(media.encode_png(img, filter_type=4))
        np.testing.assert_array_equal(out, img[:, :, :3])

    def test_known_pixels(self):
        img = np.zeros((2, 2, 3), dtype=np.uint8)
        img[0, 0] = (255, 0, 0)
        img[0, 1] = (0, 255, 0)
        img[1, 0] = (0, 0, 255)
        img[1, 1] = (10, 20, 30)
        out = media.decode_png(media.encode_png(img, filter_type=1))
        np.testing.assert_array_equal(out, img)

    def test_palette(self):
        # hand-build a color-type-3 PNG: 2x2, palette of 3 colors
        import struct
        import zlib

        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
        idx_rows = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + media._png_chunk(b"IHDR", ihdr)
            + media._png_chunk(b"PLTE", plte)
            + media._png_chunk(b"IDAT", zlib.compress(idx_rows))
            + media._png_chunk(b"IEND", b"")
        )
        out = media.decode_png(payload)
        want = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]],
            dtype=np.uint8,
        )
        np.testing.assert_array_equal(out, want)

    def test_sniff_meta_and_dispatch(self):
        img = _img(6, 4, seed=9)
        p = media.encode_png(img)
        assert media.sniff(p) == "png"
        fmt, w, h = media.image_meta(p)
        assert (fmt, w, h) == ("png", 4, 6)
        np.testing.assert_array_equal(media.decode_image(p), img)

    def test_16bit_depth_decodes_high_byte(self):
        import struct
        import zlib

        # 1x1 16-bit RGB, filter 0: samples 0xABCD 0x0102 0xFF00
        row = b"\x00" + bytes([0xAB, 0xCD, 0x01, 0x02, 0xFF, 0x00])
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
        p = (
            b"\x89PNG\r\n\x1a\n"
            + media._png_chunk(b"IHDR", ihdr)
            + media._png_chunk(b"IDAT", zlib.compress(row))
            + media._png_chunk(b"IEND", b"")
        )
        out = media.decode_png(p)
        np.testing.assert_array_equal(
            out, np.array([[[0xAB, 0x01, 0xFF]]], dtype=np.uint8))

    def test_unsupported_raise(self):
        import struct
        import zlib

        # 4-bit depth stays unsupported
        ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 0, 0, 0, 0)
        p = (
            b"\x89PNG\r\n\x1a\n"
            + media._png_chunk(b"IHDR", ihdr)
            + media._png_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + media._png_chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            media.decode_png(p)
        # 16-bit PALETTE is not a legal PNG combination; rejected
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)
        p = (
            b"\x89PNG\r\n\x1a\n"
            + media._png_chunk(b"IHDR", ihdr)
            + media._png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + media._png_chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            media.decode_png(p)
        with pytest.raises(ValueError):
            media.decode_png(b"nope")

    def test_16bit_ppm_decodes_scaled(self):
        # P6 maxval 65535: big-endian 2-byte samples scale to 8-bit
        hdr = b"P6\n2 1\n65535\n"
        px = np.array([65535, 0, 32768, 255, 1000, 65535],
                      dtype=">u2").tobytes()
        out = media.decode_ppm(hdr + px)
        want = ((np.array([65535, 0, 32768, 255, 1000, 65535],
                          dtype=np.uint32) * 255) // 65535).astype(
            np.uint8).reshape(1, 2, 3)
        np.testing.assert_array_equal(out, want)


class TestFeaturizerRealPngPath:
    def test_png_equals_ppm_features(self):
        """The SAME image through PNG and PPM payloads must featurize
        identically — proves PNG rides the real decode path, not the
        byte stub (stub features would differ between the two
        encodings of one image)."""
        from osm_live_updates_ray.stages import multimodal

        img = _img(20, 30, seed=3)
        fz = multimodal.ImageFeaturizer()
        batch = pa.table({
            "media_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array(
                [media.encode_png(img, filter_type=2), media.encode_ppm(img)],
                type=pa.binary(),
            ),
        })
        out = fz(batch)
        f = out.column("feat").to_pylist()
        assert f[0] is not None and f[0] == f[1]
        assert out.column("decoder_version").to_pylist() == [multimodal.ImageFeaturizer.VERSION] * 2

    def test_media_from_documents_image_rows_are_real_compressed(self):
        from osm_live_updates_ray.stages import multimodal

        docs = pa.table({
            "doc_id": pa.array([0, 3, 6, 9, 12, 1, 2], type=pa.int64()),
            "text": pa.array(["aaa", "bbb", "ccc", "ddd", "eee", "fff",
                              "ggg"]),
        })
        m = multimodal.media_from_documents(docs)
        imgs = m.filter(pa.compute.equal(m.column("kind"), "image"))
        assert imgs.num_rows == 5
        kinds = set()
        progressive = 0
        for row in imgs.to_pylist():
            p = row["payload"]
            k = media.sniff(p)
            kinds.add(k)
            v = (row["media_id"] // 3) % 4
            expect = {0: "png", 1: "jpeg", 2: "jpeg", 3: "gif"}[v]
            assert k == expect
            assert row["mime"] == f"image/{expect}"
            if k == "jpeg" and b"\xff\xc2" in p:
                progressive += 1  # SOF2 present
            arr = media.decode_image(p)
            assert arr.shape == (row["height"], row["width"], 3)
        # all four real compressed decode paths exercised
        assert kinds == {"png", "jpeg", "gif"}
        assert progressive >= 1


class TestAdam7:
    """Adam7 interlaced PNG: 7-pass deinterlace pinned against known
    pixels via the encoder's interlace mode (each pass filtered
    independently, empty passes emit no scanlines)."""

    @pytest.mark.parametrize("h,w", [(1, 1), (7, 9), (8, 8), (17, 19),
                                     (9, 32)])
    def test_roundtrip_all_filters(self, h, w):
        rng = np.random.RandomState(h * 31 + w)
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        for ft in range(5):
            enc = media.encode_png(img, filter_type=ft, interlace=True)
            assert np.array_equal(media.decode_png(enc), img)

    def test_interlace_flag_in_header(self):
        img = np.zeros((8, 8, 3), np.uint8)
        enc = media.encode_png(img, interlace=True)
        # IHDR data starts at byte 16; the interlace byte is its last
        assert enc[16 + 12] == 1
        assert media.decode_png(media.encode_png(img)).shape == (8, 8, 3)

    def test_gray_and_rgba_interlaced(self):
        rng = np.random.RandomState(4)
        g = rng.randint(0, 256, (13, 11), dtype=np.uint8)
        out = media.decode_png(media.encode_png(g, interlace=True))
        assert np.array_equal(out[..., 0], g)
        ra = rng.randint(0, 256, (10, 6, 4), dtype=np.uint8)
        out = media.decode_png(media.encode_png(ra, interlace=True))
        assert np.array_equal(out, ra[..., :3])

    def test_featurizer_identical_via_interlaced(self):
        from osm_live_updates_ray.stages import multimodal

        rng = np.random.RandomState(6)
        img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        fz = multimodal.ImageFeaturizer(out_dim=8, resize=(16, 16))
        batch = pa.table({
            "media_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array(
                [media.encode_png(img),
                 media.encode_png(img, filter_type=4, interlace=True)],
                type=pa.binary(),
            ),
        })
        f = fz(batch).column("feat").to_pylist()
        assert f[0] is not None and f[0] == f[1]
