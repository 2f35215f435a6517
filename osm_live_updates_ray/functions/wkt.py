"""Canonical WKT formatting and parsing.

The reference formats every reconstructed coordinate with exactly 7
fixed decimal places (reference: include/config/Config.h:36
DEFAULT_WKT_PRECISION; src/osm/OsmDataFetcherQLever.cpp:138-139) and
parses ``POINT(lon lat)`` while preserving the exact decimal text
(reference: src/osm/OsmObjectHelper.cpp:94-138, src/osm/Node.cpp:35-54).

Byte-exactness of WKT output is part of the conformance surface, so a
single canonical serializer lives here and everything routes through it.
"""

from __future__ import annotations

import re

import numpy as np

_POINT_RE = re.compile(
    r"^\s*POINT\s*\(\s*(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s*\)\s*"
    r"(?:\^\^.*)?$"
)


def fmt_coord(v: float, precision: int = 7) -> str:
    """One coordinate, fixed-point with exactly ``precision`` decimals."""
    return f"{v:.{precision}f}"


def point_wkt(lon: float, lat: float, precision: int = 7) -> str:
    return f"POINT({fmt_coord(lon, precision)} {fmt_coord(lat, precision)})"


def linestring_wkt(x: np.ndarray, y: np.ndarray, precision: int = 7) -> str:
    coords = ",".join(
        f"{fmt_coord(a, precision)} {fmt_coord(b, precision)}" for a, b in zip(x, y)
    )
    return f"LINESTRING({coords})"


def polygon_wkt(x: np.ndarray, y: np.ndarray, precision: int = 7) -> str:
    """Single-ring polygon; closes the ring if open."""
    xs = list(x)
    ys = list(y)
    if xs and (xs[0] != xs[-1] or ys[0] != ys[-1]):
        xs.append(xs[0])
        ys.append(ys[0])
    coords = ",".join(
        f"{fmt_coord(a, precision)} {fmt_coord(b, precision)}" for a, b in zip(xs, ys)
    )
    return f"POLYGON(({coords}))"


def parse_point_wkt(wkt: str) -> tuple[float, float]:
    """``POINT(lon lat)`` (optionally with a ``^^type`` literal suffix)
    -> (lon, lat).  Raises ValueError on malformed input, like the
    reference throws (src/osm/OsmObjectHelper.cpp:116-137)."""
    m = _POINT_RE.match(wkt)
    if not m:
        raise ValueError(f"not a WKT point: {wkt!r}")
    return float(m.group(1)), float(m.group(2))


def fmt_coords_array(
    lon: np.ndarray, lat: np.ndarray, precision: int = 7
) -> np.ndarray:
    """Vectorized POINT WKT for arrays (used for node geometry columns)."""
    return np.array(
        [point_wkt(a, b, precision) for a, b in zip(lon, lat)], dtype=object
    )
