"""HyperLogLog partials — the mergeable-sketch shape for distributed
approximate COUNT(DISTINCT).

The sketch is expressed as DATA, not state: each batch emits at most
``m`` (register, max_rank) rows per group, a ``groupby().max()``
merges them (register-wise max is exactly HLL union), and the
estimator runs on the tiny merged table.  At 100 TB the exchange is
bounded by ``groups x m x blocks`` rows — never per-token — and the
merge is associative/commutative so Ray can combine partials in any
order.  (Flajolet et al. 2007, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm".)

All hashing goes through :func:`hashing.hash_strings_poly` (stable
across processes AND bit-exactly mirrorable in SQL — the HLL battery
entry is oracle-gated by a DuckDB mirror of the register computation;
splitmix64 finalization keeps the register/rank bits uniform), so
sketches built by independently scheduled tasks agree.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash_strings_poly

# register-count exponent: m = 2^P registers => typical error 1.04/sqrt(m)
P = 10
M = 1 << P  # 1024 registers => ~3.2% standard error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def register_ranks(values) -> tuple[np.ndarray, np.ndarray]:
    """(register, rank) per input string — the per-item sketch update.

    register = low P bits of the 64-bit hash; rank = 1 + number of
    leading zeros of the remaining 64-P bits (capped at 64-P+1).
    Fully vectorized: the leading-zero count is log2 on the masked
    high bits (exact for values below 2^53; the 54..64-bit range
    cannot change the leading-zero count of a 54-bit-plus value).
    """
    h = hash_strings_poly(values).view(np.uint64)
    reg = (h & np.uint64(M - 1)).astype(np.int64)
    rest = h >> np.uint64(P)
    bits = 64 - P
    # position of highest set bit via float log2 (values < 2^54 exact;
    # larger values' exponent is still exact because log2 rounds to the
    # true exponent for any value with <= 64 significant bits here)
    nz = rest != 0
    rank = np.full(len(h), bits + 1, dtype=np.int8)  # rest==0 => max rank
    if nz.any():
        top = np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
        # 54-bit values at the float53 boundary can round UP to the next
        # power of two (top+1 => rank 0); true HLL ranks are >= 1
        rank[nz] = np.maximum(bits - top, 1).astype(np.int8)
    return reg, rank


def partial_max(reg: np.ndarray, rank: np.ndarray,
                group: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch-local register-wise max per group: one np.maximum.at pass
    over a dense (group x register) grid (groups per batch are few)."""
    groups, gidx = np.unique(group, return_inverse=True)
    grid = np.zeros((len(groups), M), dtype=np.int8)
    np.maximum.at(grid, (gidx, reg), rank)
    g_out, r_out = np.nonzero(grid)
    return groups[g_out], r_out.astype(np.int64), grid[g_out, r_out]


def estimate(regs: np.ndarray, ranks: np.ndarray) -> float:
    """Cardinality from one group's merged (register, max_rank) rows,
    with the standard small-range (linear counting) correction."""
    mreg = np.zeros(M, dtype=np.float64)
    mreg[regs] = ranks
    e = _alpha(M) * M * M / np.sum(np.exp2(-mreg))
    zeros = M - np.count_nonzero(mreg)
    if e <= 2.5 * M and zeros > 0:
        e = M * np.log(M / zeros)
    return float(e)
