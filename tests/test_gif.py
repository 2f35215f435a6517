"""GIF codec (functions/media.py): exact LZW round-trips, code-table
growth/reset, interlace row restoration, transparency compositing,
header meta, and the featurize stage taking the real GIF decode path
(the pattern test_png.py/test_jpeg.py pin for PNG/JPEG)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from osm_live_updates_ray.functions import media


def _paletted(h, w, n_colors=7, seed=0):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.randint(0, n_colors, (h, w))
    return pal[idx]


class TestRoundTrip:
    def test_small_palette_exact(self):
        img = _paletted(23, 31)
        enc = media.encode_gif(img)
        assert media.sniff(enc) == "gif"
        assert np.array_equal(media.decode_gif(enc), img)

    def test_full_256_color_palette(self):
        img = np.zeros((16, 16, 3), np.uint8)
        img[..., 0] = np.arange(256).reshape(16, 16)
        assert np.array_equal(media.decode_gif(media.encode_gif(img)), img)

    def test_two_color_min_code_size(self):
        """1-bit palettes still use min LZW code size 2 (spec floor)."""
        img = np.where(
            (np.arange(12)[:, None] + np.arange(17)[None, :]) % 2 == 0,
            0, 255,
        ).astype(np.uint8)
        img = np.stack([img] * 3, axis=2)
        assert np.array_equal(media.decode_gif(media.encode_gif(img)), img)

    def test_large_image_table_reset(self):
        """>4096 LZW codes forces CLEAR + table rebuild mid-stream."""
        rng = np.random.RandomState(9)
        g = rng.randint(0, 256, (120, 160)).astype(np.uint8)
        img = np.stack([g, g, g], axis=2)  # gray: exactly 256 colors
        assert np.array_equal(media.decode_gif(media.encode_gif(img)), img)

    def test_too_many_colors_rejected(self):
        rng = np.random.RandomState(1)
        img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="256"):
            media.encode_gif(img)

    def test_dispatch_and_meta(self):
        img = _paletted(10, 14)
        enc = media.encode_gif(img)
        assert media.image_meta(enc) == ("gif", 14, 10)
        assert np.array_equal(media.decode_image(enc), img)


def _reencode_interlaced(img):
    """Build an interlaced GIF by hand: LZW-encode the PASS-ordered
    rows and set the interlace flag — exercises the decoder's row
    restoration against a ground-truth image."""
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    bits = max(1, int(len(palette) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    grid = idx.reshape(h, w)
    order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for y in range(start, h, step)]
    stored = grid[order].reshape(-1)
    min_code = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h,
                       0x80 | (bits - 1) << 4 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40)  # interlaced
    out.append(min_code)
    out += media._lzw_encode(stored.astype(np.int64), min_code)
    out += b"\x00\x3b"
    return bytes(out)


class TestWireFeatures:
    def test_interlaced_rows_restored(self):
        img = _paletted(19, 13, n_colors=5, seed=3)
        enc = _reencode_interlaced(img)
        assert np.array_equal(media.decode_gif(enc), img)

    def test_transparency_composites_background(self):
        """A GCE transparent index must render as the logical-screen
        background color (what a thumbnailer shows on flatten)."""
        img = _paletted(8, 8, n_colors=3, seed=4)
        enc = bytearray(media.encode_gif(img))
        # inject a GCE marking palette index 0 transparent, right
        # before the image descriptor
        di = bytes(enc).index(b"\x2c", 13)
        gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])
        patched = bytes(enc[:di]) + gce + bytes(enc[di:])
        out = media.decode_gif(patched)
        # background color is palette[bg=0]; transparent pixels (index
        # 0) must equal it — here that is the same entry, so decode
        # must still succeed and match the opaque decode
        assert np.array_equal(out, media.decode_gif(bytes(enc)))

    def test_truncated_stream_tolerated(self):
        img = _paletted(12, 12)
        enc = media.encode_gif(img)
        # chop the last sub-block: decode must not crash (JPEG-reader
        # truncation discipline); shape is preserved
        out = media.decode_gif(enc[: len(enc) // 2] + b"\x00\x3b")
        assert out.shape == (12, 12, 3)

    def test_not_a_gif(self):
        with pytest.raises(ValueError):
            media.decode_gif(b"\x89PNG\r\n\x1a\n")


class TestFeaturizeGifPath:
    def test_featurizer_takes_real_path_for_gif(self):
        """Identical pixels via PPM and via GIF (lossless for a
        paletted image) must featurize IDENTICALLY — proof the GIF row
        went through the real decode."""
        from osm_live_updates_ray.stages import multimodal

        img = _paletted(16, 16, n_colors=9, seed=7)
        fz = multimodal.ImageFeaturizer(out_dim=8, resize=(16, 16))
        batch = pa.table({
            "media_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array(
                [media.encode_ppm(img), media.encode_gif(img)],
                type=pa.binary(),
            ),
        })
        out = fz(batch)
        f = out.column("feat").to_pylist()
        assert f[0] is not None and f[0] == f[1]


class TestAnimatedGif:
    def test_anim_roundtrip_every_frame(self):
        rng = np.random.RandomState(0)
        frames = [np.repeat(rng.randint(0, 256, (12, 10, 1),
                                        dtype=np.uint8), 3, axis=2)
                  for _ in range(5)]
        enc = media.encode_gif_anim(frames, frame_ms=500)
        assert media.gif_info(enc) == (5, 500)
        for i in range(5):
            assert np.array_equal(media.decode_gif_frame(enc, i),
                                  frames[i])
        # decode_gif (single-frame API) renders frame 0
        assert np.array_equal(media.decode_gif(enc), frames[0])

    def test_frame_bytes_is_standalone_gif(self):
        frames = [np.full((4, 4, 3), i * 20, dtype=np.uint8)
                  for i in range(4)]
        enc = media.encode_gif_anim(frames, frame_ms=250)
        fb = media.gif_frame_bytes(enc, 2)
        assert media.sniff(fb) == "gif"
        assert len(fb) < len(enc)  # one frame, not the whole stream
        assert np.array_equal(media.decode_gif(fb), frames[2])
        with pytest.raises(IndexError):
            media.gif_frame_bytes(enc, 4)

    def test_frame_sampler_takes_gif_path(self, ray_session):
        from osm_live_updates_ray.stages import multimodal

        frames = [np.full((4, 4, 3), i * 11, dtype=np.uint8)
                  for i in range(6)]
        payload = media.encode_gif_anim(frames, frame_ms=500)
        t = pa.table({
            "media_id": pa.array([7], pa.int64()),
            "duration_ms": pa.array([3000], pa.int32()),
            "payload": pa.array([payload], pa.binary()),
        })
        out = multimodal.FrameSampler(every_ms=1000)(t)
        assert out.num_rows == 3  # t = 0, 1000, 2000
        for row, t_ms in zip(range(3), (0, 1000, 2000)):
            blob = out.column("frame_stub")[row].as_py()
            idx = t_ms // 500
            assert np.array_equal(media.decode_gif(blob), frames[idx])
