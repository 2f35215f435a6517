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


def hash_strings128(values) -> tuple[np.ndarray, np.ndarray]:
    """Two independent stable 64-bit string hashes (distinct siphash
    keys) — a 128-bit fingerprint whose collision odds are negligible
    at any corpus size, so dedup exchanges can carry (h1, h2, id)
    instead of the text itself."""
    arr = np.asarray(values, dtype=object)
    h1 = pd.util.hash_array(arr, categorize=False).view(np.int64)
    h2 = pd.util.hash_array(
        arr, categorize=False, hash_key="8151b1a0e5c87d63"
    ).view(np.int64)
    return h1, h2


def hash_strings_poly(values) -> np.ndarray:
    """SQL-MIRRORABLE stable 64-bit string hash: FNV-prime polynomial
    over unicode CODE POINTS (mod 2^64) + splitmix64 finalizer — the
    same construction as the shingle kernel, over whole strings.

    Exists so sketch operators hashed with it (HLL registers) can be
    oracle-gated by a bit-exact DuckDB mirror (list_reduce over
    unicode(substr(w,j,1)) with UHUGEINT mod-2^64 arithmetic, then
    splitmix64 as CTE steps) — pd.util.hash_array's siphash cannot be
    expressed in plain SQL.  Vectorized with the same invertible-base
    global-position trick as fingerprint64_batch: one cumprod pair per
    batch, no per-row Python."""
    arr = [v if isinstance(v, str) else ("" if v is None else str(v)) for v in values]
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(s) for s in arr), dtype=np.int64, count=n)
    ends = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=ends[1:])
    buf = np.frombuffer("".join(arr).encode("utf-32-le"), dtype=np.uint32)
    if len(buf) == 0:
        return hash_int64(np.zeros(n, dtype=np.int64))
    with np.errstate(over="ignore"):
        cp = buf.astype(np.uint64)
        ppow = np.full(len(buf), _SHINGLE_BASE, dtype=np.uint64)
        ppow[0] = np.uint64(1)
        np.cumprod(ppow, out=ppow)  # BASE^g mod 2^64
        ipow = np.full(len(buf), _SHINGLE_INV, dtype=np.uint64)
        ipow[0] = np.uint64(1)
        np.cumprod(ipow, out=ipow)  # BASE^-g mod 2^64
        cs = np.zeros(len(buf) + 1, dtype=np.uint64)
        np.cumsum(cp * ipow, out=cs[1:])
        seg = cs[ends[1:]] - cs[ends[:-1]]
        poly = seg * ppow[np.maximum(ends[1:] - 1, 0)]
    poly = np.where(lens > 0, poly, np.uint64(0))
    return hash_int64(poly.view(np.int64))


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


_SHINGLE_BASE = np.uint64(1099511628211)  # FNV prime as polynomial base
#: BASE is odd => invertible mod 2^64 (the global-position cumprod trick)
_SHINGLE_INV = np.uint64(pow(1099511628211, -1, 1 << 64))


def shingle_hashes_batch(
    texts: list[str], k: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized char-k-shingle hashing for a whole BATCH of texts.

    Returns ``(hashes, offsets)``: uint64 polynomial hashes of every
    k-shingle of every normalized text (lowercased, whitespace
    collapsed — same normalization as :func:`shingles`), concatenated
    in document order, plus CSR offsets (len = n_docs + 1).  A text
    with <= k characters contributes ONE whole-text shingle, matching
    :func:`shingles`.  No per-shingle Python objects are created: texts
    become uint32 code-point arrays, the k-gram hash is k shifted
    multiply-adds over the concatenated buffer, and a splitmix64
    finalizer scrambles the polynomial into a uniform 64-bit value.
    """
    n = len(texts)
    norm = [" ".join(t.lower().split()) for t in texts]
    lens = np.fromiter((len(t) for t in norm), dtype=np.int64, count=n)
    counts = np.maximum(lens - k + 1, 1)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    buf = np.frombuffer("".join(norm).encode("utf-32-le"), dtype=np.uint32)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    out = np.empty(int(offsets[-1]), dtype=np.uint64)
    # long docs (len > k): hash EVERY buffer window with k shifted-slice
    # multiply-adds (contiguous, no gathers), then keep only windows
    # that start inside a doc and don't cross its end
    long_mask = lens > k
    if long_mask.any() and len(buf) >= k:
        nwin = len(buf) - k + 1
        acc = np.zeros(nwin, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                acc = acc * _SHINGLE_BASE + buf[j : j + nwin].astype(np.uint64)
        # validity mask: drop the k-1 window starts before each doc end
        # and every window of short docs
        valid = np.zeros(nwin, dtype=bool)
        li = np.flatnonzero(long_mask)
        span = np.repeat(starts[li], 2)
        span[1::2] = starts[li + 1] - k + 1
        delta = np.zeros(nwin + 1, dtype=np.int32)
        np.add.at(delta, span[0::2], 1)
        np.add.at(delta, span[1::2], -1)
        valid = np.cumsum(delta[:-1]) > 0
        vals = hash_int64(acc[valid]).view(np.uint64)
        dest = np.zeros(int(offsets[-1]) + 1, dtype=np.int32)
        dest[offsets[li]] += 1
        dest[offsets[li + 1]] -= 1
        out[np.cumsum(dest[:-1]) > 0] = vals
    # short docs: one whole-text shingle each
    for i in np.flatnonzero(~long_mask).tolist():
        seg = buf[starts[i] : starts[i + 1]].astype(np.uint64)
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for c in seg:
                acc = acc * _SHINGLE_BASE + c
        out[offsets[i]] = hash_int64(np.array([acc], dtype=np.uint64))[0]
    return out, offsets


def minhash_signatures_batch(
    shingle_hashes: np.ndarray, offsets: np.ndarray, num_perm: int = 64,
    seed: int = 1,
) -> np.ndarray:
    """MinHash signatures for a CSR batch of shingle hashes:
    (n_docs, num_perm) uint64.  One vectorized pass per permutation
    over the WHOLE batch (``np.minimum.reduceat`` per doc) — no per-doc
    loop, same h_i(x) = (a_i*x + b_i) mod (2^61-1) as
    :func:`minhash_signature`."""
    a, b = _minhash_params(num_perm, seed)
    x = shingle_hashes.view(np.uint64) % np.uint64(MERSENNE61)
    n = len(offsets) - 1
    if n == 0:
        return np.empty((0, num_perm), dtype=np.uint64)
    sig = np.empty((n, num_perm), dtype=np.uint64)
    # every doc has >= 1 shingle by construction (whole-text shingle for
    # short docs), so offsets are strictly increasing — reduceat-safe
    starts = offsets[:-1]
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            prod = (a[p] * x + b[p]) & np.uint64(0xFFFFFFFFFFFFFFFF)
            red = (prod >> np.uint64(61)) + (prod & np.uint64(MERSENNE61))
            red = np.where(red >= MERSENNE61, red - MERSENNE61, red)
            sig[:, p] = np.minimum.reduceat(red, starts)
    return sig


def lsh_band_keys_batch(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Band bucket keys for a SIGNATURE MATRIX (n_docs, num_perm) ->
    (n_docs, bands) int64 — FNV-1a folded over each band's rows,
    vectorized across documents (identical values to
    :func:`lsh_band_keys` row by row)."""
    n, num_perm = sig.shape
    assert bands * rows == num_perm
    out = np.empty((n, bands), dtype=np.int64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            h = np.full(n, np.uint64(1469598103934665603), dtype=np.uint64)
            for r in range(rows):
                h = (h ^ sig[:, b * rows + r]) * np.uint64(1099511628211)
            out[:, b] = h.view(np.int64)
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


def fold_int64(values: np.ndarray, n_buckets: int = 64) -> np.ndarray:
    """Coarse shuffle key: stable hash of an int64 key column folded
    into ``n_buckets`` groups.  Use when a groupby key has per-row
    cardinality (content hashes, user ids, pair ids): grouping on the
    raw key makes Ray's map_groups pay a Python slice+call per TINY
    group, while grouping on the fold keeps all rows of a key together
    and lets one vectorized pandas/numpy kernel handle the whole
    group.  Size n_buckets ~ O(cluster cores)."""
    return (
        hash_int64(np.asarray(values).astype(np.int64)).view(np.uint64)
        % np.uint64(n_buckets)
    ).astype(np.int64)


def fold_pair_int64(a: np.ndarray, b: np.ndarray,
                    n_buckets: int = 64) -> np.ndarray:
    """fold_int64 for a COMPOSITE int64 key pair (band+bucket-hash,
    id pair, ...): combines with an FNV-prime multiply/xor before the
    splitmix scramble so both components drive the bucket."""
    a = np.asarray(a).astype(np.int64)
    b = np.asarray(b).astype(np.int64)
    return (
        hash_int64(a * np.int64(0x100000001B3) ^ b).view(np.uint64)
        % np.uint64(n_buckets)
    ).astype(np.int64)

