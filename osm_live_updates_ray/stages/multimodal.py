"""Multimodal columns: image/audio/video as opaque binary + typed
metadata; decode / feature-extract / resize / frame-sample as
actor-pool map_batches stages.

Decode is format-sniffed (``functions/media.py``):

- **REAL decode, no libraries needed**: P6 PPM + 24-bit BMP + PNG +
  baseline JPEG images (numpy; nearest-neighbor resize), PCM WAV +
  G.711 mu-law/A-law + mono IMA ADPCM audio (true per-window MFCCs:
  Hann -> power spectrum -> mel filterbank -> log -> DCT-II, plain
  numpy), PPMV frame sequences (length-prefixed P6 frames),
  MJPEG-AVI videos (standard RIFF layout, JPEG frames via
  functions/jpeg.py) and ANIMATED GIFs; the sampler seeks to the
  requested frame — by size prefix, idx1 index, or GIF block walk —
  without decoding the others.
- **Exotic compressed formats** (MP3/AAC, MP4...) are gated behind an
  import-try of PIL and surface as decode-failure null rows in this
  container.
- **Unknown payloads** surface as decode-failure NULL rows, same as
  undecodable recognized formats — features are never synthesized
  from raw bytes (policy stated in ``functions/jpeg.py``).  The one
  deliberate exception is :class:`FrameSampler`'s ``frame_stub``
  column, which is honestly-named raw-byte truncation, not a feature.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import media as _media

MEDIA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),  # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),  # nullable typed metadata
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

IMAGE_FEATURES = pa.schema(
    [
        ("media_id", pa.int64()),
        ("feat", pa.list_(pa.float32())),  # embedding-shaped output
        ("out_width", pa.int32()),
        ("out_height", pa.int32()),
        ("decoder_version", pa.int32()),
    ]
)


class ImageFeaturizer:
    """Actor-pool stage: decode + resize + featurize images.

    PPM/BMP/PNG/JPEG payloads take the REAL path: numpy decode ->
    nearest resize -> per-column grayscale means -> learned-weight-
    shaped projection.  Unknown payloads AND undecodable recognized
    formats yield a null row — features are never synthesized from
    raw bytes.  ``__init__`` is the once-per-actor model load;
    batches stay SMALL for large payloads (see
    :func:`featurize_images`).
    """

    VERSION = 5  # 5 = unknown-format -> null row (4 = PNG+JPEG decode)

    def __init__(self, out_dim: int = 64, resize: tuple[int, int] = (224, 224)):
        self.out_dim = out_dim
        self.resize = resize
        rng = np.random.RandomState(7)
        self.proj = rng.standard_normal((out_dim, out_dim)).astype(np.float32)

    def _raw(self, payload: bytes) -> np.ndarray | None:
        if _media.sniff(payload) in ("ppm", "bmp", "png", "gif", "jpeg"):
            img = _media.decode_image(payload)
            img = _media.resize_nearest(img, *self.resize)
            col = img.astype(np.float32).mean(axis=(0, 2))  # per-column gray
            reps = int(np.ceil(self.out_dim / len(col)))
            return np.tile(col, reps)[: self.out_dim] / 255.0
        return None  # unrecognized format -> decode-failure null row

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, w, h = [], [], []
        for payload in batch.column("payload").to_pylist():
            try:
                raw = self._raw(payload or b"")
            except Exception:
                raw = None
            if raw is None:
                # decode failures yield a null row, never a crash and
                # never a synthetic feature
                feats.append(None)
                w.append(None)
                h.append(None)
                continue
            feats.append((self.proj @ raw).tolist())
            w.append(self.resize[0])
            h.append(self.resize[1])
        return pa.Table.from_pydict(
            {
                "media_id": batch.column("media_id"),
                "feat": pa.array(feats, type=pa.list_(pa.float32())),
                "out_width": pa.array(w, type=pa.int32()),
                "out_height": pa.array(h, type=pa.int32()),
                "decoder_version": pa.array(
                    [self.VERSION] * batch.num_rows, type=pa.int32()
                ),
            }
        )


def _doc_image(doc_id: int, w: int, h: int, text: bytes) -> bytes:
    """Deterministic small REAL compressed image for an image-kind
    document row: a doc-seeded gradient through the actual encoders —
    PNG, baseline JPEG, progressive JPEG and GIF rotate per doc (a
    real crawl is mostly JPEG, a large share progressive, plus
    PNG/GIF), so featurization exercises ALL FOUR compressed decode
    paths."""
    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    s = int(doc_id) & 0xFF
    t0 = text[0] if len(text) else 0
    img = np.stack(
        [
            ((xs * 7 + s) % 256 + ys * 0).astype(np.uint8),
            ((ys * 5 + t0) % 256 + xs * 0).astype(np.uint8),
            ((xs + ys + s) % 256).astype(np.uint8),
        ],
        axis=2,
    )
    v = (int(doc_id) // 3) % 4
    if v == 1:
        from ..functions import jpeg as _jp

        return _jp.encode_jpeg(
            img, quality=85 + (int(doc_id) % 3) * 5,
            subsample=bool(int(doc_id) % 2),
        )
    if v == 2:
        from ..functions import jpeg as _jp

        return _jp.encode_jpeg_progressive(
            img, quality=85 + (int(doc_id) % 3) * 5,
            subsample=bool(int(doc_id) % 2),
        )
    if v == 3:
        # quantize until the palette fits (shift 6 bounds distinct
        # triples at 4^3 = 64, so the loop always terminates)
        for shift in (3, 4, 5, 6):
            q = (img >> shift) << shift
            if len(np.unique(q.reshape(-1, 3), axis=0)) <= 256:
                return _media.encode_gif(q)
    return _media.encode_png(img, filter_type=int(doc_id) % 5)


def _doc_audio(doc_id: int, text: bytes) -> bytes:
    """Doc-seeded RIFF audio payload rotating through the three real
    codecs the decoder supports: PCM, G.711 mu-law, mono IMA ADPCM."""
    rate = 16000 if doc_id % 2 == 0 else 8000
    n = 800 + (doc_id % 5) * 200
    buf = np.frombuffer(text or b"\x00", dtype=np.uint8)
    samples = ((np.resize(buf, n).astype(np.int16) - 128) * 200).astype(
        np.int16
    )
    v = (doc_id // 3) % 3
    if v == 1:
        return _media.encode_g711_wav(samples, rate, "ulaw")
    if v == 2:
        return _media.encode_ima_adpcm_wav(samples, rate)
    return _media.encode_wav(samples, rate)


def media_from_documents(batch: pa.Table) -> pa.Table:
    """MEDIA rows derived deterministically from the documents corpus:
    the battery's multimodal entries exercise the real test tables
    through the actor-pool plumbing instead of a synthesized side
    table.  IMAGE rows carry real doc-seeded PNG/JPEG payloads
    (alternating — so featurization runs BOTH actual compressed
    decodes); AUDIO rows carry real RIFF payloads rotating through
    PCM / G.711 mu-law / IMA ADPCM (all three real decode paths);
    video rows keep utf-8 text payloads standing in for encoded media
    (their oracled entries hash those bytes).  Runs inside
    map_batches."""
    import pyarrow.compute as pc

    did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    kind_idx = did % 3
    kinds = np.array(["image", "audio", "video"], dtype=object)[kind_idx]
    mimes = np.array(["image/png", "audio/wav", "video/mp4"], dtype=object)[kind_idx]
    is_img = kind_idx == 0
    rot = (did // 3) % 4
    mimes = np.where(is_img & ((rot == 1) | (rot == 2)),
                     "image/jpeg", mimes).astype(object)
    mimes = np.where(is_img & (rot == 3), "image/gif", mimes
                     ).astype(object)
    is_timed = ~is_img
    # small real dimensions for image rows (payload must match the
    # metadata); the byte payloads stay tiny so batch x concurrency
    # fits worker heaps at any corpus size
    width = np.where(is_img, 8 + (did % 8) * 2, 64 + (did % 8) * 16).astype(np.int32)
    height = np.where(is_img, 6 + (did % 5) * 2, 64 + (did % 5) * 16).astype(np.int32)
    dur = (1000 + (did % 10) * 500).astype(np.int32)
    texts = pc.cast(batch.column("text"), pa.binary()).to_pylist()
    payloads = [
        _doc_image(int(d), int(w_), int(h_), t or b"")
        if im
        else (_doc_audio(int(d), t or b"") if ki == 1 else (t or b""))
        for d, w_, h_, im, ki, t in zip(
            did, width, height, is_img, kind_idx, texts
        )
    ]
    return pa.Table.from_arrays(
        [
            pa.array(did, type=pa.int64()),
            pa.array(kinds, type=pa.string()),
            pa.array(payloads, type=pa.binary()),
            pa.array(mimes, type=pa.string()),
            pa.array(width, type=pa.int32(), mask=is_timed),
            pa.array(height, type=pa.int32(), mask=is_timed),
            pa.array(dur, type=pa.int32(), mask=is_img),
        ],
        schema=MEDIA,
    )


def featurize_images(media_ds, out_dim: int = 64, concurrency=(1, 8)):
    """media Dataset -> IMAGE_FEATURES Dataset.

    batch_size is deliberately SMALL: payloads are large binaries, and
    batch_size x concurrency x payload must fit each worker's heap.
    """
    return media_ds.map_batches(
        ImageFeaturizer,
        fn_constructor_args=(out_dim,),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


AUDIO_FEATURES = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mfcc", pa.list_(pa.float32())),  # per-window MFCCs (dim x n_windows flattened)
        ("n_windows", pa.int32()),
        ("decoder_version", pa.int32()),
    ]
)


class AudioFeaturizer:
    """Actor-pool audio stage: RIFF payloads take the REAL path —
    decode to float samples (PCM / G.711 / IMA ADPCM), fixed-length
    Hann windows, and TRUE MFCCs per window: power spectrum -> mel
    triangular filterbank (26 filters, Stevens-Volkmann mel scale) ->
    log -> orthonormal DCT-II, first ``dim`` coefficients — the same
    computation torchaudio/librosa produce, in plain numpy.  Unknown
    payloads yield a NULL row (never synthetic features).
    ``__init__`` is the once-per-actor setup; the rate-dependent
    filterbank/DCT matrices are cached per actor (stateful-stage
    contract), batches stay small for large payloads."""

    VERSION = 5  # 5 = [-1,1] input scale + unknown -> null row

    def __init__(self, dim: int = 13, max_windows: int = 16,
                 window_samples: int = 400, n_mels: int = 26):
        self.dim = dim
        self.max_windows = max_windows
        self.window_samples = window_samples
        self.n_mels = n_mels
        self._hann = np.hanning(window_samples).astype(np.float64)
        # orthonormal DCT-II rows (dim x n_mels), rate-independent
        k = np.arange(dim)[:, None]
        n = np.arange(n_mels)[None, :]
        self._dct = np.sqrt(2.0 / n_mels) * np.cos(
            np.pi * (n + 0.5) * k / n_mels
        )
        self._dct[0] /= np.sqrt(2.0)
        self._fb: dict[int, np.ndarray] = {}  # per-rate mel filterbank

    def _filterbank(self, rate: int) -> np.ndarray:
        fb = self._fb.get(rate)
        if fb is None:
            ws = self.window_samples
            n_bins = ws // 2 + 1

            def mel(f):
                return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

            def imel(m):
                return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

            pts = imel(np.linspace(mel(0.0), mel(rate / 2.0),
                                   self.n_mels + 2))
            bins = np.floor((ws + 1) * pts / rate).astype(np.int64)
            fb = np.zeros((self.n_mels, n_bins), dtype=np.float64)
            for m in range(self.n_mels):
                lo, mid, hi = bins[m], bins[m + 1], bins[m + 2]
                for b in range(int(lo), int(mid)):
                    if mid > lo:
                        fb[m, b] = (b - lo) / (mid - lo)
                for b in range(int(mid), int(hi)):
                    if hi > mid:
                        fb[m, b] = (hi - b) / (hi - mid)
            self._fb[rate] = fb
        return fb

    def _windows(self, payload: bytes) -> np.ndarray | None:
        if _media.sniff(payload) == "wav":
            x, rate = _media.decode_wav(payload)
            # decode_wav already returns float samples in [-1, 1]
            xs = x.astype(np.float64)
            ws = self.window_samples
            fb = self._filterbank(int(rate))
            nw = min(self.max_windows, max(1, -(-len(xs) // ws)))
            out = np.zeros((nw, self.dim), dtype=np.float32)
            for w in range(nw):
                seg = xs[w * ws : (w + 1) * ws]
                if not len(seg):
                    continue
                if len(seg) < ws:
                    seg = np.pad(seg, (0, ws - len(seg)))
                P = np.abs(np.fft.rfft(seg * self._hann)) ** 2
                logmel = np.log(fb @ P + 1e-10)
                out[w] = (self._dct @ logmel).astype(np.float32)
            return out
        return None  # unrecognized format -> decode-failure null row

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats, counts = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            try:
                out = self._windows(payload or b"")
            except Exception:
                out = None
            ids.append(mid)
            if out is None:
                feats.append(None)
                counts.append(None)
                continue
            feats.append(out.ravel().tolist())
            counts.append(len(out))
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "mfcc": pa.array(feats, type=pa.list_(pa.float32())),
                "n_windows": pa.array(counts, type=pa.int32()),
                "decoder_version": pa.array(
                    [self.VERSION] * len(ids), type=pa.int32()
                ),
            }
        )


def featurize_audio(media_ds, concurrency=(1, 8)):
    """media Dataset -> AUDIO_FEATURES Dataset (small batches: large
    binary payloads)."""
    return media_ds.map_batches(
        AudioFeaturizer,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video frame-sampling stage: one row per sampled timestamp — the
    flat_map-shaped expansion a real pipeline uses for per-frame
    inference.  PPMV and MJPEG-AVI payloads take the REAL path: the
    frame covering each sampled timestamp is extracted by seeking the
    container's size prefixes (PPMV), its idx1 index (AVI), or its
    block structure (animated GIF) — its raw P6/JPEG/single-frame-GIF
    bytes emitted; no other frame touched (GIF frames before the
    sample are block-walked, never LZW-decoded).  Unknown payloads
    emit the 16-byte prefix stub."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, offs, frames = [], [], []
        for mid, dur, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("duration_ms").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            dur = dur or 0
            payload = payload or b""
            fmt = _media.sniff(payload)
            if fmt == "ppmv":
                n_frames, frame_ms = _media.ppmv_info(payload)
                grab = _media.ppmv_frame_bytes
            elif fmt == "avi":
                n_frames, frame_ms, _, _ = _media.avi_info(payload)
                grab = _media.avi_frame_bytes
            elif fmt == "gif":
                # animated GIF: frames located by sub-block walking
                # only — no LZW decode of unsampled frames
                n_frames, frame_ms = _media.gif_info(payload)
                grab = _media.gif_frame_bytes
            else:
                grab = None
            for t in range(0, max(dur, 1), self.every_ms):
                ids.append(mid)
                offs.append(t)
                if grab is not None:
                    idx = min(t // frame_ms, n_frames - 1)
                    frames.append(grab(payload, idx))
                else:
                    # STUB fallback for unrecognized containers
                    frames.append(payload[:16])
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_ms": pa.array(offs, type=pa.int32()),
                "frame_stub": pa.array(frames, type=pa.binary()),
            }
        )


def gen_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table with REAL containers:
    P6 PPM images, PCM WAV audio, PPMV frame sequences — so tests
    exercise the real decode paths end-to-end."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    payloads, width, height, dur, mimes = [], [], [], [], []
    for i in range(n):
        k = i % 3
        if k == 0:
            w, h = 48 + (i % 4) * 16, 32 + (i % 3) * 16
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            payloads.append(_media.encode_ppm(img))
            width.append(w), height.append(h), dur.append(None)
            mimes.append("image/x-portable-pixmap")
        elif k == 1:
            t = np.arange(1600 + (i % 5) * 400)
            x = (8000 * np.sin(2 * np.pi * (110 + 13 * i) * t / 16000)).astype(
                np.int16
            )
            payloads.append(_media.encode_wav(x))
            width.append(None), height.append(None), dur.append(None)
            mimes.append("audio/wav")
        else:
            frames = [
                rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
                for _ in range(6)
            ]
            v3 = (i // 3) % 3
            if v3 == 1:
                # MJPEG-AVI: fps=2 => 500 ms/frame, same grid as PPMV
                payloads.append(_media.encode_mjpeg_avi(frames, fps=2))
                mimes.append("video/x-msvideo")
            elif v3 == 2:
                # animated GIF on the same 500 ms grid (palette-bounded
                # frames: gray ramps share <=256 colors)
                gf = [np.repeat(
                    rng.randint(0, 256, (16, 16, 1), dtype=np.uint8),
                    3, axis=2) for _ in range(6)]
                payloads.append(_media.encode_gif_anim(gf, frame_ms=500))
                mimes.append("image/gif")
            else:
                payloads.append(_media.encode_ppmv(frames, frame_ms=500))
                mimes.append("video/x-ppm-seq")
            width.append(None), height.append(None), dur.append(3000)
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": payloads,
        "mime": mimes,
        "width": width,
        "height": height,
        "duration_ms": dur,
    }
    return pa.Table.from_pydict(rows, schema=MEDIA)


# ---------------------------------------------------------------------------
# Perceptual image hashing / near-duplicate image dedup
# ---------------------------------------------------------------------------
def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash): nearest-resize to 9x8 grayscale,
    bit(r, c) = gray[r, c] > gray[r, c+1], row-major MSB-first.  Robust
    to re-encoding (PNG<->JPEG), uniform brightness/contrast shifts and
    small noise — the standard perceptual key for image-level near-dup
    dedup (LAION-style corpus hygiene), where byte-level exact dedup
    sees two encodings of the same picture as distinct."""
    g = _media.resize_nearest(img, 9, 8).astype(np.float64).mean(axis=2)
    bits = (g[:, :-1] > g[:, 1:]).astype(np.uint8)
    packed = np.packbits(bits.ravel())
    return int(np.uint64(int.from_bytes(packed.tobytes(), "big")))


def phash_images(media_ds, concurrency: int = 8):
    """Decode + perceptual-hash stage: (media_id, payload) ->
    (media_id, phash int64).  Stateless per batch (the hash needs no
    model), so a task pool, not actors; payload batches stay small via
    the caller's batch sizing.  Undecodable payloads yield a null
    phash row (the ImageFeaturizer failure contract)."""
    def hash_batch(batch: pa.Table) -> pa.Table:
        out: list[int | None] = []
        for payload in batch.column("payload").to_pylist():
            try:
                img = _media.decode_image(payload or b"")
                out.append(
                    int(np.uint64(dhash64(img)).view(np.int64))
                )
            except Exception:
                out.append(None)
        return pa.Table.from_pydict({
            "media_id": batch.column("media_id"),
            "phash": pa.array(out, type=pa.int64()),
        })

    return media_ds.map_batches(
        hash_batch, batch_format="pyarrow", batch_size=64
    )


def phash_dedup(media_ds, concurrency: int = 8):
    """Perceptual image dedup: hash (above), then group by phash and
    keep the smallest media_id of each perceptual group.  The shuffle
    carries (media_id, phash) — 16 B/image, never pixels (the
    exact-dedup hash-only-exchange shape); groups form via one small
    groupby.  Emits (media_id, phash, group_min, is_dup)."""
    hashed = phash_images(media_ds, concurrency)

    def assign(g: pa.Table) -> pa.Table:
        ids = g.column("media_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        gmin = int(ids.min())
        return pa.table({
            "media_id": pa.array(ids),
            "phash": g.column("phash"),
            "group_min": pa.array(np.full(len(ids), gmin, dtype=np.int64)),
            "is_dup": pa.array((ids != gmin).astype(np.int64)),
        })

    def drop_null(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_valid(t.column("phash")))

    return (
        hashed.map_batches(drop_null, batch_format="pyarrow")
        .groupby("phash")
        .map_groups(assign, batch_format="pyarrow")
    )
