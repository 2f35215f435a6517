"""Stable vectorized hashing: content hashes, MinHash, SimHash.

Used by the dedup stages (exact hash-partition dedup, MinHash+LSH,
SimHash) and for salting hot keys.  All hashes are deterministic
across processes and runs (fixed keys/seeds) — required because hash
values become shuffle keys that must agree between independently
scheduled tasks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MERSENNE61 = (1 << 61) - 1


def hash_strings(values) -> np.ndarray:
    """Stable 64-bit hash of a string array (vectorized C siphash via
    pandas; fixed default key => deterministic across processes)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False).view(np.int64)


def hash_int64(values: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — stable scrambling of int64 keys (for
    hash-partitioning / salting)."""
    v = np.asarray(values).astype(np.uint64)
    v = (v + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    v ^= v >> np.uint64(30)
    v = (v * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    v ^= v >> np.uint64(27)
    v = (v * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    v ^= v >> np.uint64(31)
    return v.view(np.int64)


def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def shingles(text: str, k: int = 5) -> list[str]:
    """Character k-shingles of the lowercased text (whitespace collapsed)."""
    t = " ".join(text.lower().split())
    if len(t) <= k:
        return [t]
    return [t[i : i + k] for i in range(len(t) - k + 1)]


def minhash_signature(
    shingle_hashes: np.ndarray, num_perm: int = 64, seed: int = 1
) -> np.ndarray:
    """MinHash signature from pre-hashed shingles (uint64 view ok).

    h_i(x) = (a_i * x + b_i) mod (2^61 - 1), min over shingles.
    """
    a, b = _minhash_params(num_perm, seed)
    x = shingle_hashes.view(np.uint64) % np.uint64(MERSENNE61)
    # (P, S) = a[:,None]*x[None,:] + b — modular arithmetic in uint64 is
    # exact mod 2^64; reduce mod M61 via the standard split trick.
    prod = (a[:, None] * x[None, :] + b[:, None]) & np.uint64(0xFFFFFFFFFFFFFFFF)
    red = (prod >> np.uint64(61)) + (prod & np.uint64(MERSENNE61))
    red = np.where(red >= MERSENNE61, red - MERSENNE61, red)
    return red.min(axis=1).astype(np.uint64)


def lsh_band_keys(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Hash each band of the signature -> (bands,) int64 bucket keys."""
    assert bands * rows == len(sig)
    out = np.empty(bands, dtype=np.int64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            band = sig[b * rows : (b + 1) * rows]
            h = np.uint64(1469598103934665603)  # FNV-1a over the band values
            for v in band:
                h = (h ^ np.uint64(v)) * np.uint64(1099511628211)
            out[b] = np.int64(np.uint64(h).astype(np.int64))
    return out


def simhash64(token_hashes: np.ndarray) -> np.int64:
    """64-bit SimHash of pre-hashed tokens (unweighted)."""
    if len(token_hashes) == 0:
        return np.int64(0)
    bits = (
        (token_hashes.view(np.uint64)[:, None] >> np.arange(64, dtype=np.uint64))
        & np.uint64(1)
    ).astype(np.int64)
    votes = bits.sum(axis=0) * 2 - len(token_hashes)
    word = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            word |= np.uint64(1) << np.uint64(i)
    return word.view(np.int64) if hasattr(word, "view") else np.int64(word)


def hamming64(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)
