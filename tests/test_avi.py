"""MJPEG-AVI container (functions/media.py): standard RIFF layout,
idx1-seek frame extraction without touching other frames, real JPEG
frame decode, and the FrameSampler taking the real path for AVI — the
pattern test_jpeg.py/test_png.py pin for images."""

import numpy as np
import pyarrow as pa
import pytest

from osm_live_updates_ray.functions import media
from osm_live_updates_ray.stages import multimodal


def _frames(n, h=16, w=24):
    return [
        np.full((h, w, 3), [(i * 37) % 256, 64, (200 + i) % 256],
                dtype=np.uint8)
        for i in range(n)
    ]


class TestAviContainer:
    def test_sniff_and_info(self):
        avi = media.encode_mjpeg_avi(_frames(5), fps=2)
        assert media.sniff(avi) == "avi"
        assert media.avi_info(avi) == (5, 500, 24, 16)

    def test_frames_are_jpeg_and_decode(self):
        frames = _frames(4)
        avi = media.encode_mjpeg_avi(frames, fps=4, quality=95)
        for i in range(4):
            fb = media.avi_frame_bytes(avi, i)
            assert fb[:2] == b"\xff\xd8" and fb[-2:] == b"\xff\xd9"
            dec = media.decode_avi_frame(avi, i)
            # flat blocks are DC-only: <= 1 LSB at q95
            assert np.abs(
                dec.astype(int) - frames[i].astype(int)
            ).max() <= 1

    def test_seek_does_not_touch_other_frames(self):
        avi = media.encode_mjpeg_avi(_frames(6), fps=2)
        corrupted = bytearray(avi)
        f1 = media.avi_frame_bytes(avi, 1)
        pos = avi.find(f1)
        corrupted[pos:pos + 8] = b"\xde\xad\xbe\xef\xde\xad\xbe\xef"
        assert media.avi_frame_bytes(bytes(corrupted), 3) == \
            media.avi_frame_bytes(avi, 3)

    def test_index_bounds_and_bad_container(self):
        avi = media.encode_mjpeg_avi(_frames(2), fps=2)
        with pytest.raises(IndexError):
            media.avi_frame_bytes(avi, 2)
        with pytest.raises(ValueError):
            media.avi_info(b"RIFF\x00\x00\x00\x00WAVE")

    def test_absolute_idx1_offsets_also_resolve(self):
        """Real demuxers accept both movi-relative and absolute idx1
        offsets; the reader detects which by probing for '00dc'."""
        avi = bytearray(media.encode_mjpeg_avi(_frames(3), fps=2))
        # rewrite idx1 entries to absolute offsets
        movi_pos = bytes(avi).find(b"movi")
        idx_pos = bytes(avi).find(b"idx1")
        import struct

        for e in range(3):
            base = idx_pos + 8 + 16 * e
            off, size = struct.unpack_from("<II", bytes(avi), base + 8)
            struct.pack_into("<I", avi, base + 8, movi_pos + off)
        for i in range(3):
            assert media.avi_frame_bytes(bytes(avi), i) == \
                media.avi_frame_bytes(
                    media.encode_mjpeg_avi(_frames(3), fps=2), i)


class TestFrameSamplerAvi:
    def test_sampler_extracts_right_jpeg_frame(self):
        frames = [np.full((8, 8, 3), i * 20, dtype=np.uint8)
                  for i in range(6)]
        payload = media.encode_mjpeg_avi(frames, fps=2, quality=95)
        t = pa.table({
            "media_id": pa.array([11], pa.int64()),
            "duration_ms": pa.array([3000], pa.int32()),
            "payload": pa.array([payload], pa.binary()),
        })
        out = multimodal.FrameSampler(every_ms=1000)(t)
        assert out.num_rows == 3
        from osm_live_updates_ray.functions import jpeg

        for row, t_ms in zip(range(3), (0, 1000, 2000)):
            blob = out.column("frame_stub")[row].as_py()
            dec = jpeg.decode_jpeg(blob)
            want = frames[t_ms // 500]
            assert np.abs(dec.astype(int) - want.astype(int)).max() <= 1

    def test_gen_media_mixes_containers(self):
        media_t = multimodal.gen_media(30)
        vids = media_t.filter(
            pa.compute.equal(media_t.column("kind"), "video")
        )
        fmts = {media.sniff(p.as_py()) for p in vids.column("payload")}
        assert fmts == {"ppmv", "avi", "gif"}  # r5: animated GIF joins
        out = multimodal.FrameSampler(every_ms=1000)(vids)
        assert out.num_rows == vids.num_rows * 3
        # every emitted frame is a real container frame, never a stub
        for blob in out.column("frame_stub"):
            b = blob.as_py()
            assert b[:2] in (b"P6", b"\xff\xd8", b"GI")
