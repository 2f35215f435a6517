"""Multimodal columns: image/audio/video as opaque binary + typed
metadata; decode / feature-extract / resize / frame-sample as
actor-pool map_batches stages.

The decode kernels are STUBBED (no image/audio libraries in this
container — clearly marked below); the Ray-side plumbing is real and
tested: schemas, actor signature, per-actor "model" initialization,
batch sizing for large binary payloads, output layout.  Swapping the
stub for Pillow/torchaudio is a one-function change per stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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


def _deterministic_fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from the payload bytes.

    Replace with a real decoder (PIL.Image.open + resize + model) when
    the imaging stack is available; everything around this function —
    batching, actor lifecycle, schema — is production-shaped.
    """
    h = np.frombuffer(payload[:1024], dtype=np.uint8).astype(np.float32)
    if len(h) == 0:
        return np.zeros(out_dim, dtype=np.float32)
    reps = int(np.ceil(out_dim / len(h)))
    return np.tile(h, reps)[:out_dim] / 255.0


class ImageFeaturizer:
    """Actor-pool stage: decode+resize+featurize images.

    ``__init__`` is the once-per-actor model load (here: dimensions
    and a seed-derived projection standing in for weights); batches
    should be SMALL for large payloads (see :func:`featurize_images`).
    """

    VERSION = 1

    def __init__(self, out_dim: int = 64, resize: tuple[int, int] = (224, 224)):
        self.out_dim = out_dim
        self.resize = resize
        rng = np.random.RandomState(7)
        self.proj = rng.standard_normal((out_dim, out_dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, w, h = [], [], []
        for payload in batch.column("payload").to_pylist():
            try:
                raw = _deterministic_fake_decode(payload or b"", self.out_dim)
            except Exception:
                # decode failures yield a null row, never a crash
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


def media_from_documents(batch: pa.Table) -> pa.Table:
    """MEDIA rows derived deterministically from the documents corpus
    (payload = utf-8 text bytes standing in for encoded media): the
    battery's multimodal entries exercise the real test tables through
    the actor-pool plumbing instead of a synthesized side table.
    Vectorized; runs inside map_batches."""
    import pyarrow.compute as pc

    did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    kind_idx = did % 3
    kinds = np.array(["image", "audio", "video"], dtype=object)[kind_idx]
    mimes = np.array(["image/png", "audio/wav", "video/mp4"], dtype=object)[kind_idx]
    is_img = kind_idx == 0
    is_timed = ~is_img
    width = (64 + (did % 8) * 16).astype(np.int32)
    height = (64 + (did % 5) * 16).astype(np.int32)
    dur = (1000 + (did % 10) * 500).astype(np.int32)
    return pa.Table.from_arrays(
        [
            pa.array(did, type=pa.int64()),
            pa.array(kinds, type=pa.string()),
            pc.cast(batch.column("text"), pa.binary()),
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
        ("mfcc_stub", pa.list_(pa.float32())),  # per-window features
        ("n_windows", pa.int32()),
        ("decoder_version", pa.int32()),
    ]
)


class AudioFeaturizer:
    """Actor-pool audio stage (STUB decode): windows the payload bytes
    into fixed-length frames and emits deterministic pseudo-MFCCs —
    the windowed-feature shape (n_windows x dim flattened) a real
    torchaudio pipeline produces.  ``__init__`` is the once-per-actor
    model load; batches stay small for large payloads."""

    VERSION = 1

    def __init__(self, dim: int = 13, window_bytes: int = 256,
                 max_windows: int = 16):
        self.dim = dim
        self.window_bytes = window_bytes
        self.max_windows = max_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats, counts = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            payload = payload or b""
            nw = min(
                self.max_windows,
                max(1, (len(payload) + self.window_bytes - 1) // self.window_bytes),
            )
            out = np.zeros((nw, self.dim), dtype=np.float32)
            for w in range(nw):
                chunk = np.frombuffer(
                    payload[w * self.window_bytes : (w + 1) * self.window_bytes],
                    dtype=np.uint8,
                ).astype(np.float32)
                if len(chunk):
                    # STUB decode: per-window moments stand in for MFCCs
                    reps = int(np.ceil(self.dim / len(chunk)))
                    out[w] = np.tile(chunk, reps)[: self.dim] / 255.0
            ids.append(mid)
            feats.append(out.ravel().tolist())
            counts.append(nw)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "mfcc_stub": pa.array(feats, type=pa.list_(pa.float32())),
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
    """Video frame-sampling stage (STUB decode): emits one row per
    sampled frame with deterministic frame offsets — the flat_map-shaped
    expansion a real pipeline uses for per-frame inference."""

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
            for t in range(0, max(dur, 1), self.every_ms):
                ids.append(mid)
                offs.append(t)
                # STUB: a real implementation decodes the frame at t
                frames.append((payload or b"")[:16])
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_ms": pa.array(offs, type=pa.int32()),
                "frame_stub": pa.array(frames, type=pa.binary()),
            }
        )


def gen_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.bytes(256 + (i % 512)) for i in range(n)],
        "mime": ["application/octet-stream"] * n,
        "width": [640 if i % 3 == 0 else None for i in range(n)],
        "height": [480 if i % 3 == 0 else None for i in range(n)],
        "duration_ms": [3000 if i % 3 == 2 else None for i in range(n)],
    }
    return pa.Table.from_pydict(rows, schema=MEDIA)
