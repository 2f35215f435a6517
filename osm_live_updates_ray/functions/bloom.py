"""Vectorized Bloom filter over int64 keys — the read-skip sidecar for
partitioned membership indexes.

A shard's Bloom bits answer "could any probe hit this shard?" from a
few KB instead of the shard's full key file: no false negatives, so
skipping a shard on an all-negative Bloom is EXACT; a false positive
only costs the shard read that would have happened anyway.  Build and
query are pure numpy (splitmix-derived double hashing, k index probes
per key via one bit-gather)."""

from __future__ import annotations

import numpy as np

from .hashing import hash_int64


def _probe_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher: k independent-enough probes from two base hashes)."""
    kk = np.asarray(keys).astype(np.int64)
    h1 = hash_int64(kk).view(np.uint64)
    h2 = hash_int64(kk ^ np.int64(0x5BF03635)).view(np.uint64) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def build(keys: np.ndarray, bits_per_key: int = 10, k: int = 7) -> np.ndarray:
    """uint8 bit array sized ``bits_per_key * len(keys)`` (>=64 bits);
    ~1% false positives at the 10/7 default."""
    n = max(1, len(keys))
    # Round the bit width UP to a byte multiple so build / build_into /
    # might_contain all hash over the IDENTICAL modulus (len(bits) * 8).
    # A build-time modulus of bits_per_key*n with a byte-padded array
    # would make probe positions differ between build and query whenever
    # bits_per_key*n % 8 != 0 — i.e. false negatives.
    m_bits = -(-max(64, int(bits_per_key) * n) // 8) * 8
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(keys):
        pos = _probe_positions(keys, m_bits, k).reshape(-1)
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits


def might_contain(bits: np.ndarray, keys: np.ndarray, k: int = 7) -> np.ndarray:
    """Vectorized membership: True = maybe present, False = DEFINITELY
    absent.  One gather + reduction over the (n, k) probe matrix."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    m_bits = len(bits) * 8
    pos = _probe_positions(keys, m_bits, k)
    got = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return got.all(axis=1)


def build_into(bits: np.ndarray, keys: np.ndarray, k: int = 7) -> np.ndarray:
    """OR new keys into an EXISTING bit array (append path): keeps the
    original width, so the false-positive rate degrades gradually as
    the shard grows — correctness (no false negatives) is unaffected.
    Returns the same array, mutated."""
    if len(keys):
        m_bits = len(bits) * 8
        pos = _probe_positions(keys, m_bits, k).reshape(-1)
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits
