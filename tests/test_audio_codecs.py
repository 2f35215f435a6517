"""Compressed-audio codecs: G.711 mu-law/A-law and IMA ADPCM WAV
(functions/media.py) — known spec values, round-trip SNR, and the
AudioFeaturizer real-path integration."""

import numpy as np
import pyarrow as pa

from osm_live_updates_ray.functions import media
from osm_live_updates_ray.stages.multimodal import AudioFeaturizer


def _sine(n=2000, rate=8000, hz=440, amp=10000):
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * hz * t / rate)).astype(np.int16)


def _snr_db(ref: np.ndarray, out: np.ndarray) -> float:
    err = out.astype(np.float64) - ref.astype(np.float64)
    return 10 * np.log10((ref.astype(np.float64) ** 2).mean() / (err**2).mean())


class TestG711:
    def test_spec_known_values(self):
        # Sun g711.c golden points: 0x00 -> -32124, 0xFF -> 0 (mu-law);
        # 0x55 -> -8, 0xD5 -> +8 (A-law)
        assert media._ULAW_DEC[0x00] == -32124
        assert media._ULAW_DEC[0xFF] == 0
        assert media._ULAW_DEC[0x80] == 32124
        assert media._ALAW_DEC[0x55] == -8
        assert media._ALAW_DEC[0xD5] == 8

    def test_decode_tables_symmetric(self):
        # complementing the sign bit negates the codeword's value
        u = np.arange(128)
        assert (media._ULAW_DEC[u] == -media._ULAW_DEC[u | 0x80]).all()
        assert (media._ALAW_DEC[u] == -media._ALAW_DEC[u | 0x80]).all()

    def test_roundtrip_snr(self):
        x = _sine()
        for law in ("ulaw", "alaw"):
            y, rate = media.decode_wav(media.encode_g711_wav(x, 8000, law))
            assert rate == 8000 and len(y) == len(x)
            assert _snr_db(x, y * 32768) > 30  # 8-bit companding band

    def test_encoder_is_nearest_codeword(self):
        # every encoded sample decodes to the closest table value
        x = np.array([-30000, -100, -1, 0, 1, 99, 12345, 32000], np.int16)
        y, _ = media.decode_wav(media.encode_g711_wav(x, 8000, "ulaw"))
        got = np.round(y * 32768).astype(np.int64)
        for xi, gi in zip(x.astype(np.int64), got):
            best = np.abs(media._ULAW_DEC.astype(np.int64) - xi).min()
            assert abs(gi - xi) == best


class TestImaAdpcm:
    def test_roundtrip_snr(self):
        x = _sine()
        y, rate = media.decode_wav(media.encode_ima_adpcm_wav(x, 8000))
        assert rate == 8000 and len(y) >= len(x)
        assert _snr_db(x, y[: len(x)] * 32768) > 20  # 4-bit ADPCM band

    def test_block_independence(self):
        # decoding blocks [0:2] of a 3-block stream equals the prefix of
        # the full decode (each block carries its own predictor header)
        x = _sine(n=1 + 504 * 3)  # 3 exact blocks at block_align=256
        p = media.encode_ima_adpcm_wav(x, 8000, block_align=256)
        full, _ = media.decode_wav(p)
        # strip the last block (256 bytes) from the data chunk
        trunc = p[: len(p) - 256]
        trunc = trunc[:4] + np.uint32(len(trunc) - 8).tobytes() + trunc[8:]
        # patch the data chunk length field (last chunk in container)
        di = trunc.rindex(b"data")
        trunc = (trunc[: di + 4]
                 + np.uint32(len(trunc) - di - 8).tobytes()
                 + trunc[di + 8 :])
        part, _ = media.decode_wav(trunc)
        assert np.array_equal(part, full[: len(part)])

    def test_meta_duration(self):
        x = _sine(n=505 * 4)
        fmt, rate, nch, dur_ms = media.audio_meta(
            media.encode_ima_adpcm_wav(x, 8000, block_align=256)
        )
        assert (fmt, rate, nch) == ("wav", 8000, 1)
        # 4 blocks x 505 samples at 8 kHz = 2525 ms (padded to blocks)
        assert dur_ms == (505 * 4 * 1000) // 8000


class TestFeaturizerIntegration:
    def test_compressed_wav_takes_real_path(self):
        """A mu-law payload and the same audio as PCM must land in the
        same spectral neighborhood; an unrecognized payload must be a
        NULL row (never synthetic features)."""
        x = _sine()
        x_far = _sine(hz=1900)  # spectrally distant control signal
        fz = AudioFeaturizer()
        batch = pa.table({
            "media_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "payload": pa.array([
                media.encode_wav(x, 8000),
                media.encode_g711_wav(x, 8000, "ulaw"),
                b"\x00\x01garbage-not-riff" * 40,  # unknown format
                media.encode_wav(x_far, 8000),
            ], type=pa.binary()),
        })
        out = fz(batch)
        raw = out.column("mfcc").to_pylist()
        assert raw[2] is None  # unknown format -> null row
        assert out.column("n_windows").to_pylist()[2] is None
        f = [np.array(v) for v in (raw[0], raw[1], raw[3])]
        assert len(f[0]) == len(f[1])  # same window layout
        # companding noise keeps the same tone spectrally close —
        # closer than a genuinely different tone
        cos = lambda a, b: (a @ b) / (
            np.linalg.norm(a) * np.linalg.norm(b)
        )
        assert cos(f[0], f[1]) > 0.9
        assert cos(f[0], f[1]) > cos(f[0][: len(f[2])], f[2])
        assert out.column("n_windows").to_pylist()[0] == out.column(
            "n_windows"
        ).to_pylist()[1]

    def test_mfcc_scale_pinned_against_independent_reference(self):
        """Pin the MFCC input scale: an independently-written
        textbook MFCC of the SAME [-1, 1] float samples must match the
        stage's first-window output exactly.  A stray re-division by
        32768 (the round-4 advisor finding) shifts coefficient 0 by
        ~2*log(32768)*sum(dct row) and clamps low mel bands to the log
        floor — this test fails loudly in that case."""
        rate, ws, n_mels, dim = 8000, 400, 26, 13
        x = _sine(n=ws, rate=rate, hz=440, amp=10000)
        fz = AudioFeaturizer(dim=dim, window_samples=ws, n_mels=n_mels)
        batch = pa.table({
            "media_id": pa.array([0], type=pa.int64()),
            "payload": pa.array([media.encode_wav(x, rate)],
                                type=pa.binary()),
        })
        got = np.array(
            fz(batch).column("mfcc").to_pylist()[0], dtype=np.float64
        )[:dim]

        # ---- independent reference (textbook formulas, no reuse) ----
        xs = x.astype(np.float64) / 32768.0  # decode_wav contract
        seg = xs * np.hanning(ws)
        P = np.abs(np.fft.rfft(seg)) ** 2
        mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)
        imel = lambda m: 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)
        pts = imel(np.linspace(mel(0.0), mel(rate / 2.0), n_mels + 2))
        bins = np.floor((ws + 1) * pts / rate).astype(int)
        fb = np.zeros((n_mels, ws // 2 + 1))
        for m in range(n_mels):
            lo, mid, hi = bins[m], bins[m + 1], bins[m + 2]
            for b in range(lo, mid):
                fb[m, b] = (b - lo) / max(mid - lo, 1)
            for b in range(mid, hi):
                fb[m, b] = (hi - b) / max(hi - mid, 1)
        logmel = np.log(fb @ P + 1e-10)
        k = np.arange(dim)[:, None]
        n = np.arange(n_mels)[None, :]
        dct = np.sqrt(2.0 / n_mels) * np.cos(np.pi * (n + 0.5) * k / n_mels)
        dct[0] /= np.sqrt(2.0)
        ref = dct @ logmel
        assert np.abs(got - ref).max() < 1e-4
        # at the correct [-1,1] scale a loud sine's mel bands sit well
        # above the 1e-10 log floor; the double-division bug pushed the
        # whole spectrum ~1e-9x down and clamped most bands to it
        assert logmel.max() > np.log(1e-10) + 10.0
