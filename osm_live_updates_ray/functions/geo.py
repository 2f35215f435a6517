"""Pure-numpy planar geometry kernels.

The reference delegates geometry to osm2rdf/GEOS (reference:
src/osm/Osm2ttl.cpp:91-112 — WKT, centroid, envelope, convex hull,
length, area per object).  This module re-implements the needed
kernels from scratch, vectorized, with no native geometry dependency
(shapely is not available in this environment).

Coordinates are planar (lon, lat) degrees; distances are squared
planar degree distances unless stated.  All functions operate on
float64 numpy arrays.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# point-in-polygon (vectorized ray casting, even-odd rule)
# ---------------------------------------------------------------------------
def points_in_ring(
    px: np.ndarray, py: np.ndarray, ring_x: np.ndarray, ring_y: np.ndarray
) -> np.ndarray:
    """Even-odd ray-casting test of N points against ONE ring.

    ``ring_x/ring_y``: polygon ring vertices (closed or open — the
    closing edge is added implicitly).  Points exactly on an edge are
    resolved by the half-open rule (consistent, deterministic).
    Returns a boolean array of length N.  Cost O(N * V) vectorized.
    """
    if len(ring_x) >= 2 and ring_x[0] == ring_x[-1] and ring_y[0] == ring_y[-1]:
        ring_x, ring_y = ring_x[:-1], ring_y[:-1]
    n = len(ring_x)
    inside = np.zeros(len(px), dtype=bool)
    j = n - 1
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(n):  # loop over VERTICES (small); points vectorized
            xi, yi = ring_x[i], ring_y[i]
            xj, yj = ring_x[j], ring_y[j]
            crosses = (yi > py) != (yj > py)
            if crosses.any():
                t = (xj - xi) * (py - yi) / (yj - yi) + xi
                inside ^= crosses & (px < t)
            j = i
    return inside


def points_in_polygon(
    px: np.ndarray,
    py: np.ndarray,
    outer: tuple[np.ndarray, np.ndarray],
    holes: list[tuple[np.ndarray, np.ndarray]] | None = None,
) -> np.ndarray:
    """Point-in-polygon with optional holes (even-odd composition)."""
    inside = points_in_ring(px, py, outer[0], outer[1])
    for hx, hy in holes or []:
        inside &= ~points_in_ring(px, py, hx, hy)
    return inside


# ---------------------------------------------------------------------------
# scalar polygon / line properties
# ---------------------------------------------------------------------------
def ring_area(x: np.ndarray, y: np.ndarray) -> float:
    """Shoelace area (absolute), planar square degrees."""
    if len(x) >= 2 and x[0] == x[-1] and y[0] == y[-1]:
        x, y = x[:-1], y[:-1]
    if len(x) < 3:
        return 0.0
    x2 = np.roll(x, -1)
    y2 = np.roll(y, -1)
    return float(abs(np.sum(x * y2 - x2 * y)) * 0.5)


def line_length(x: np.ndarray, y: np.ndarray) -> float:
    """Planar polyline length in degrees."""
    if len(x) < 2:
        return 0.0
    return float(np.sum(np.hypot(np.diff(x), np.diff(y))))


def centroid(x: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """Vertex-mean centroid (matches the simple mean the engine
    standardizes on for derived facts; documented deviation from GEOS'
    area-weighted centroid)."""
    return float(np.mean(x)), float(np.mean(y))


def envelope(x: np.ndarray, y: np.ndarray) -> tuple[float, float, float, float]:
    return float(np.min(x)), float(np.min(y)), float(np.max(x)), float(np.max(y))


def convex_hull(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Andrew's monotone chain; returns CCW hull (closed not included).

    Deterministic: input sorted by (x, y); collinear points dropped.
    Runs on Python float tuples: OSM ways are mostly tiny (4-16
    vertices) and per-call numpy overhead (np.unique's sort machinery)
    dominated the geometry recompute — tuple sort+set is ~6x faster at
    these sizes and lexicographically identical to the old
    ``np.unique(column_stack)`` path.
    """
    pts = sorted(set(zip(x.tolist(), y.tolist())))
    n = len(pts)
    if n <= 2:
        return (
            np.array([p[0] for p in pts]),
            np.array([p[1] for p in pts]),
        )

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[tuple[float, float]] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple[float, float]] = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    return (
        np.array([p[0] for p in hull]),
        np.array([p[1] for p in hull]),
    )


def oriented_bbox(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimum-area oriented bounding rectangle — rotating calipers
    over the convex hull (the reference computes obb option-gated via
    osm2rdf; delete wiring at src/osm/OsmChangeHandler.cpp:541).

    Returns the 4 corners (open ring, CCW in the rotated frame),
    rolled so the lexicographically smallest (x, y) corner comes
    first — fully deterministic.  Degenerate inputs (1-2 distinct
    points / collinear) return the collapsed rectangle."""
    hx, hy = convex_hull(x, y)
    n = len(hx)
    if n == 0:
        return hx, hy
    if n == 1:
        return np.full(4, hx[0]), np.full(4, hy[0])
    if n == 2:
        return (
            np.array([hx[0], hx[1], hx[1], hx[0]]),
            np.array([hy[0], hy[1], hy[1], hy[0]]),
        )
    ex = np.roll(hx, -1) - hx
    ey = np.roll(hy, -1) - hy
    ln = np.hypot(ex, ey)
    ux, uy = ex / ln, ey / ln
    # project every hull point into every edge frame: (edges, points)
    px = ux[:, None] * hx[None, :] + uy[:, None] * hy[None, :]
    py = -uy[:, None] * hx[None, :] + ux[:, None] * hy[None, :]
    x0 = px.min(1); x1 = px.max(1)
    y0 = py.min(1); y1 = py.max(1)
    k = int(np.argmin((x1 - x0) * (y1 - y0)))  # ties: first edge
    cx = np.array([x0[k], x1[k], x1[k], x0[k]])
    cy = np.array([y0[k], y0[k], y1[k], y1[k]])
    rx = ux[k] * cx - uy[k] * cy
    ry = uy[k] * cx + ux[k] * cy
    s = int(np.lexsort((ry, rx))[0])
    return np.roll(rx, -s), np.roll(ry, -s)


# ---------------------------------------------------------------------------
# nearest-neighbour distance kernels
# ---------------------------------------------------------------------------
def sq_dist_argmin(
    px: np.ndarray,
    py: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
    qid: np.ndarray,
    chunk: int = 2048,
    point_chunk: int = 256,
    ids_sorted: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """For each point (px,py), the candidate (qx,qy) minimizing
    ``dx*dx + dy*dy`` with ties broken by the SMALLEST ``qid``.

    Chunked over BOTH points and candidates so intermediate matrices
    stay cache-sized; result is exact.  Pass ``ids_sorted=True`` when
    candidates are already ascending by id to skip the sort.
    SQL mirror: ``ROW_NUMBER() OVER (PARTITION BY ... ORDER BY
    (px-qx)*(px-qx)+(py-qy)*(py-qy), qid)``.
    Returns (best_id, best_sq_dist); ((-1, inf)) when no candidates.
    """
    n = len(px)
    best_d = np.full(n, np.inf)
    best_id = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    if len(qx) == 0 or n == 0:
        return np.full(n, -1, dtype=np.int64), best_d
    for ps in range(0, n, point_chunk):
        pe = min(ps + point_chunk, n)
        ppx = px[ps:pe, None]
        ppy = py[ps:pe, None]
        bd = best_d[ps:pe]
        bi = best_id[ps:pe]
        for s in range(0, len(qx), chunk):
            cid = qid[s : s + chunk]
            dx = ppx - qx[None, s : s + chunk]
            dy = ppy - qy[None, s : s + chunk]
            dx *= dx
            dy *= dy
            dx += dy
            dmin = dx.min(axis=1)
            # smallest id among ties — sortless: mask non-minima to +inf id
            idmin = np.where(dx == dmin[:, None], cid[None, :],
                             np.iinfo(np.int64).max).min(axis=1)
            take = (dmin < bd) | ((dmin == bd) & (idmin < bi))
            bd[take] = dmin[take]
            bi[take] = idmin[take]
    best_id = np.where(np.isinf(best_d), -1, best_id)
    return best_id, best_d


def padded_csr_argmin(
    px: np.ndarray,
    py: np.ndarray,
    off0: np.ndarray,
    cnt: np.ndarray,
    indices: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
    qid: np.ndarray,
    row_chunk: int = 2048,
    target_elems: int = 4_000_000,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-ROW exact nearest candidate over a CSR candidate layout.

    Row i's candidates are ``indices[off0[i] : off0[i] + cnt[i]]``
    (positions into qx/qy/qid); returns the candidate minimizing
    ``(dist², id)`` per row — the ONE padded-gather pass shared by the
    outer grid (`GridNodeIndex.knn_batch`) and the dense-cell sub-grid
    (`_DenseCellSub.knn`), replacing per-bucket Python loops.

    Rows are processed in ascending-candidate-count order and chunked
    so each padded (rows × width) matrix stays ~``target_elems``
    elements: wide rows (mega-cell neighbours with 40k-candidate sets)
    simply get fewer rows per chunk instead of being excluded.
    Rows with ``cnt == 0`` return (-1, inf).
    """
    n = len(px)
    out_id = np.full(n, -1, dtype=np.int64)
    out_d = np.full(n, np.inf)
    idxs = np.flatnonzero(cnt > 0)
    if not len(idxs):
        return out_id, out_d
    idxs = idxs[np.argsort(cnt[idxs], kind="stable")]
    MAXI = np.iinfo(np.int64).max
    i = 0
    m = len(idxs)
    while i < m:
        # greedy chunk: rows are count-sorted, so the running width is
        # the LAST row's count; stop before rows*width overshoots
        j = i + 1
        while (
            j < m
            and j - i < row_chunk
            and (j - i + 1) * int(cnt[idxs[j]]) <= target_elems
        ):
            j += 1
        g = idxs[i:j]
        i = j
        c_cnt = cnt[g]
        mc = int(c_cnt[-1])  # count-sorted: last row is widest
        cols = np.arange(mc, dtype=np.int64)
        valid = cols[None, :] < c_cnt[:, None]
        gat = off0[g][:, None] + np.where(valid, cols[None, :], 0)
        cand = indices[gat]
        dx = px[g][:, None] - qx[cand]
        dy = py[g][:, None] - qy[cand]
        dx *= dx
        dy *= dy
        dx += dy
        dx[~valid] = np.inf
        dmin = dx.min(axis=1)
        qi = np.where(valid, qid[cand], MAXI)
        idmin = np.where(dx == dmin[:, None], qi, MAXI).min(axis=1)
        out_id[g] = idmin
        out_d[g] = dmin
    return out_id, out_d


def point_segment_sq_dist(
    px: float, py: float, x1: np.ndarray, y1: np.ndarray, x2: np.ndarray, y2: np.ndarray
) -> np.ndarray:
    """Squared distance from one point to each segment (vectorized over
    segments).  Used for nearest-way queries."""
    dx = x2 - x1
    dy = y2 - y1
    seg_len2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x1) * dx + (py - y1) * dy) / seg_len2
    t = np.where(seg_len2 == 0.0, 0.0, np.clip(t, 0.0, 1.0))
    cx = x1 + t * dx
    cy = y1 + t * dy
    ddx = px - cx
    ddy = py - cy
    return ddx * ddx + ddy * ddy


def seg_dist_argmin(
    px: np.ndarray,
    py: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    x2: np.ndarray,
    y2: np.ndarray,
    way_id: np.ndarray,
    pos: np.ndarray,
    chunk: int = 1024,
    point_chunk: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """Nearest SEGMENT per point under (dist², way_id, pos) ordering.

    The distance expression mirrors its SQL oracle token-for-token:
      dx = x2-x1; dy = y2-y1; len2 = dx*dx + dy*dy
      t  = CASE WHEN len2 = 0 THEN 0 ELSE ((px-x1)*dx + (py-y1)*dy)/len2 END
      tc = LEAST(GREATEST(t, 0), 1)
      cx = x1 + tc*dx; cy = y1 + tc*dy
      d  = (px-cx)*(px-cx) + (py-cy)*(py-cy)
    Returns (best_way_id, best_d); (-1, inf) with no candidates.
    """
    n = len(px)
    best_d = np.full(n, np.inf)
    best_w = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    best_p = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    if len(x1) == 0 or n == 0:
        return np.full(n, -1, dtype=np.int64), best_d
    dx_all = x2 - x1
    dy_all = y2 - y1
    len2_all = dx_all * dx_all + dy_all * dy_all
    MAXI = np.iinfo(np.int64).max
    for ps in range(0, n, point_chunk):
        pe = min(ps + point_chunk, n)
        ppx = px[ps:pe, None]
        ppy = py[ps:pe, None]
        bd = best_d[ps:pe]
        bw = best_w[ps:pe]
        bp = best_p[ps:pe]
        for s in range(0, len(x1), chunk):
            sl = slice(s, s + chunk)
            dx = dx_all[None, sl]
            dy = dy_all[None, sl]
            len2 = len2_all[None, sl]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = ((ppx - x1[None, sl]) * dx + (ppy - y1[None, sl]) * dy) / len2
            t = np.where(len2 == 0.0, 0.0, t)
            tc = np.minimum(np.maximum(t, 0.0), 1.0)
            cx = x1[None, sl] + tc * dx
            cy = y1[None, sl] + tc * dy
            ddx = ppx - cx
            ddy = ppy - cy
            d = ddx * ddx + ddy * ddy
            dmin = d.min(axis=1)
            ties = d == dmin[:, None]
            wmin = np.where(ties, way_id[None, sl], MAXI).min(axis=1)
            pmin = np.where(
                ties & (way_id[None, sl] == wmin[:, None]), pos[None, sl], MAXI
            ).min(axis=1)
            take = (
                (dmin < bd)
                | ((dmin == bd) & (wmin < bw))
                | ((dmin == bd) & (wmin == bw) & (pmin < bp))
            )
            bd[take] = dmin[take]
            bw[take] = wmin[take]
            bp[take] = pmin[take]
    best_w = np.where(np.isinf(best_d), -1, best_w)
    return best_w, best_d
