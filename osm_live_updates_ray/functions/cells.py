"""Vectorized H3/S2-style grid-cell encoding over (lon, lat).

The engine's spatial-partitioning unit.  The canonical cell id packs
the integer grid coordinates as ``(ix << 32) | iy`` — trivially
invertible, hash-partitionable, and expressible in ANSI SQL
(``ix * 4294967296 + iy``) so every cell computation can be
oracle-checked in DuckDB.  A Morton (Z-order) encoding is provided for
spatially-local ordering of output partitions.

All kernels are pure numpy over float64 arrays — no Python loops —
and are used inside ``map_batches(..., batch_format="pyarrow")``.

Determinism note: the floor expressions are written IDENTICALLY here
and in the SQL oracles (same operation tree, IEEE doubles on both
sides), so cell assignment matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np

LON_OFFSET = 180.0
LAT_OFFSET = 90.0


def cell_xy(
    lon: np.ndarray, lat: np.ndarray, res_deg: float
) -> tuple[np.ndarray, np.ndarray]:
    """Integer grid coords at resolution ``res_deg``.

    SQL mirror: ``CAST(FLOOR((lon + 180.0) / res) AS BIGINT)`` (for
    res=1.0 the division is kept so the expression tree matches).
    """
    ix = np.floor((lon + LON_OFFSET) / res_deg).astype(np.int64)
    iy = np.floor((lat + LAT_OFFSET) / res_deg).astype(np.int64)
    # clamp the closed upper boundary (lon=180, lat=90) into the last cell
    nx = int(np.floor(360.0 / res_deg))
    ny = int(np.floor(180.0 / res_deg))
    np.clip(ix, 0, nx - 1, out=ix)
    np.clip(iy, 0, ny - 1, out=iy)
    return ix, iy


def pack_cell(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """``(ix << 32) | iy`` as int64.  SQL: ``ix * 4294967296 + iy``."""
    return (ix << np.int64(32)) | iy


def unpack_cell(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return cell >> np.int64(32), cell & np.int64(0xFFFFFFFF)


def cell_id(lon: np.ndarray, lat: np.ndarray, res_deg: float = 1.0) -> np.ndarray:
    ix, iy = cell_xy(lon, lat, res_deg)
    return pack_cell(ix, iy)


def tile_id(lon: np.ndarray, lat: np.ndarray, res_deg: float = 10.0) -> np.ndarray:
    ix, iy = cell_xy(lon, lat, res_deg)
    return pack_cell(ix, iy)


def cell_to_tile(cell: np.ndarray, cell_res: float = 1.0, tile_res: float = 10.0) -> np.ndarray:
    """Map cell ids to the containing tile id without touching lon/lat."""
    ix, iy = unpack_cell(cell)
    f = int(round(tile_res / cell_res))
    return pack_cell(ix // f, iy // f)


def morton64(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Interleave two 32-bit ints into a Z-order curve index (vectorized).

    Used to order output partitions spatially (neighbouring cells land
    in neighbouring files) — not for correctness-facing ids.
    """
    def _spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    return (_spread(ix) | (_spread(iy) << np.uint64(1))).astype(np.int64)


def neighbors(cell: int, ring: int, cell_res: float = 1.0) -> np.ndarray:
    """All cell ids at Chebyshev distance exactly ``ring`` (ring 0 = self).

    Used by the grid kNN ring search.  Returns an int64 array; cells
    outside the world grid are dropped.
    """
    ix = int(cell >> 32)
    iy = int(cell & 0xFFFFFFFF)
    nx = int(np.floor(360.0 / cell_res))
    ny = int(np.floor(180.0 / cell_res))
    if ring == 0:
        return np.array([cell], dtype=np.int64)
    xs, ys = [], []
    r = ring
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            if max(abs(dx), abs(dy)) != r:
                continue
            x, y = ix + dx, iy + dy
            if 0 <= x < nx and 0 <= y < ny:
                xs.append(x)
                ys.append(y)
    if not xs:
        return np.empty(0, dtype=np.int64)
    return pack_cell(np.asarray(xs, dtype=np.int64), np.asarray(ys, dtype=np.int64))


def cells_covering_bbox(
    min_lon: float,
    min_lat: float,
    max_lon: float,
    max_lat: float,
    res_deg: float = 1.0,
) -> np.ndarray:
    """All cell ids whose cell square intersects the bbox (inclusive)."""
    lo = cell_xy(np.asarray([min_lon]), np.asarray([min_lat]), res_deg)
    hi = cell_xy(np.asarray([max_lon]), np.asarray([max_lat]), res_deg)
    x0, y0 = int(lo[0][0]), int(lo[1][0])
    x1, y1 = int(hi[0][0]), int(hi[1][0])
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return pack_cell(gx.ravel(), gy.ravel())


def _bit_spread16(v: np.ndarray) -> np.ndarray:
    """Spread 16-bit values so occupied bits sit at even positions
    (each magic step doubles the gap between occupied bits)."""
    v = np.asarray(v).astype(np.int64)
    v = (v | (v << 8)) & np.int64(0x00FF00FF)
    v = (v | (v << 4)) & np.int64(0x0F0F0F0F)
    v = (v | (v << 2)) & np.int64(0x33333333)
    v = (v | (v << 1)) & np.int64(0x55555555)
    return v


def morton_interleave(gx, gy):
    """Morton (Z-order) key from 16-bit grid coordinates — the
    space-filling-curve layout key for spatially-clustered tile
    export: sorting output partitions by this key keeps geographic
    neighbors in neighboring files, so range reads over a region touch
    O(few) partitions instead of all of them.  Vectorized, no loop."""
    return _bit_spread16(gx) | (_bit_spread16(gy) << np.int64(1))
