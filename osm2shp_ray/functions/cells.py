"""From-scratch hierarchical spatial cell index (H3 / S2 analog).

The h3 / s2geometry libraries are not in this container, so the engine
implements its own cell scheme with the same *roles* the north_rule
assigns to H3 res-9 / S2 level-13: a fixed-resolution space-filling
partition key for shuffles, parent/child coarsening for tiling, and
k-ring (grid-disk) expansion for kNN candidate pruning.

Scheme A ("quadcell", the H3-res-9 analog, default partition key):
  equirectangular 2^res x 2^res grid over lon in [-180,180), lat in
  [-90,90]; packed uint64 = res(5 bits @ 58) | y(29 bits @ 29) | x(29).
  res <= 29. Deterministic, pure integer math, exactly reproducible in
  SQL (used by the DuckDB oracle for q_cell_encode).

Scheme B ("s2ish", the S2-level-13 analog): the same grid at a given
  level but indexed along a Hilbert curve (functions/hilbert.py), so
  numerically-adjacent cell ids are spatially adjacent — the property
  S2 range queries rely on.

All functions are vectorized numpy over uint64 arrays.
"""

from __future__ import annotations

import numpy as np

from .hilbert import xy2d, d2xy

_RES_SHIFT = np.uint64(58)
_Y_SHIFT = np.uint64(29)
_XY_MASK = np.uint64((1 << 29) - 1)


def _grid_xy(lat: np.ndarray, lon: np.ndarray, res: int):
    n = np.int64(1) << np.int64(res)
    fx = (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0
    fy = (90.0 - np.asarray(lat, dtype=np.float64)) / 180.0
    x = np.clip((fx * n).astype(np.int64), 0, n - 1)
    y = np.clip((fy * n).astype(np.int64), 0, n - 1)
    return x.astype(np.uint64), y.astype(np.uint64)


def latlng_to_cell(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """(lat, lon) -> packed quadcell id at resolution ``res``."""
    x, y = _grid_xy(lat, lon, res)
    return (np.uint64(res) << _RES_SHIFT) | (y << _Y_SHIFT) | x


def cell_res(cell: np.ndarray) -> np.ndarray:
    return (cell >> _RES_SHIFT).astype(np.int64)


def cell_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return ((cell & _XY_MASK)).astype(np.int64), ((cell >> _Y_SHIFT) & _XY_MASK).astype(np.int64)


def cell_to_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Coarsen a cell to ``parent_res`` (raster<->vector tile mapping)."""
    res = cell_res(cell)
    shift = (res - parent_res).astype(np.uint64)
    x, y = cell_xy(cell)
    px = (x.astype(np.uint64) >> shift)
    py = (y.astype(np.uint64) >> shift)
    return (np.uint64(parent_res) << _RES_SHIFT) | (py << _Y_SHIFT) | px


def cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell centroid (lat, lon)."""
    res = cell_res(cell)
    n = (np.int64(1) << res).astype(np.float64)
    x, y = cell_xy(cell)
    lon = (x + 0.5) / n * 360.0 - 180.0
    lat = 90.0 - (y + 0.5) / n * 180.0
    return lat, lon


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) per cell."""
    res = cell_res(cell)
    n = (np.int64(1) << res).astype(np.float64)
    x, y = cell_xy(cell)
    lon0 = x / n * 360.0 - 180.0
    lon1 = (x + 1) / n * 360.0 - 180.0
    lat1 = 90.0 - y / n * 180.0
    lat0 = 90.0 - (y + 1) / n * 180.0
    return lon0, lat0, lon1, lat1


def grid_disk(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k of ``cell`` (the k-ring /
    grid_disk of H3). Longitude wraps; latitude clamps at the poles.
    Scalar cell -> array of (2k+1)^2 (minus clamped rows) cell ids,
    sorted unique — the kNN candidate set."""
    c = np.uint64(cell)
    res = int(c >> _RES_SHIFT)
    n = 1 << res
    x = int(c & _XY_MASK)
    y = int((c >> _Y_SHIFT) & _XY_MASK)
    dx = np.arange(-k, k + 1, dtype=np.int64)
    dy = np.arange(-k, k + 1, dtype=np.int64)
    gx, gy = np.meshgrid((x + dx) % n, y + dy)
    keep = (gy >= 0) & (gy < n)
    gx, gy = gx[keep].astype(np.uint64), gy[keep].astype(np.uint64)
    cells = (np.uint64(res) << _RES_SHIFT) | (gy << _Y_SHIFT) | gx
    return np.unique(cells)


def grid_ring(cell: int, k: int) -> np.ndarray:
    """Cells at exactly Chebyshev distance k (hollow ring)."""
    if k == 0:
        return np.array([cell], dtype=np.uint64)
    disk_k = set(grid_disk(cell, k).tolist())
    disk_km1 = set(grid_disk(cell, k - 1).tolist())
    return np.array(sorted(disk_k - disk_km1), dtype=np.uint64)


# ---------------------------------------------------------------- s2ish

def latlng_to_s2ish(lat: np.ndarray, lon: np.ndarray, level: int) -> np.ndarray:
    """Hilbert-ordered cell id at ``level`` (S2 analog): the id is the
    Hilbert distance of the grid cell, tagged with the level in the top
    bits so ids from different levels never collide."""
    x, y = _grid_xy(lat, lon, level)
    d = xy2d(level, x, y)
    return (np.uint64(level) << _RES_SHIFT) | d


def s2ish_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    level = int(cell_res(np.atleast_1d(cell))[0])
    d = np.atleast_1d(cell) & ~(np.uint64(0x3F) << _RES_SHIFT)
    x, y = d2xy(level, d)
    n = float(1 << level)
    lon = (x.astype(np.float64) + 0.5) / n * 360.0 - 180.0
    lat = 90.0 - (y.astype(np.float64) + 0.5) / n * 180.0
    return lat, lon


# Scheme C: standard GEOHASH (public base32 bit-interleave encoding —
# the third cell scheme users of external tooling expect alongside the
# H3/S2 analogs). Bit 0 (most significant of the 5*precision) comes
# from longitude, alternating lon/lat, each axis a binary subdivision
# of its domain — the classic Morton/geohash layout. Pure float->int
# grid math, exactly reproducible in SQL (q_geohash_encode oracle).

GEOHASH_BASE32 = b"0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: np.ndarray, lon: np.ndarray,
                   precision: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized geohash: returns (packed int64 of the 5*precision
    interleaved bits, base32 string array). precision <= 12 keeps the
    packed value inside int64 (60 bits)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    nbits = 5 * precision
    n_lon = (nbits + 1) // 2
    n_lat = nbits // 2
    lon_idx = np.floor(((lon + 180.0) / 360.0)
                       * float(1 << n_lon)).astype(np.int64)
    lat_idx = np.floor(((lat + 90.0) / 180.0)
                       * float(1 << n_lat)).astype(np.int64)
    lon_idx = np.minimum(lon_idx, (1 << n_lon) - 1)
    lat_idx = np.minimum(lat_idx, (1 << n_lat) - 1)
    gh = np.zeros(lon.shape[0], dtype=np.int64)
    for i in range(n_lon):
        gh |= ((lon_idx >> (n_lon - 1 - i)) & 1) << (nbits - 1 - 2 * i)
    for i in range(n_lat):
        gh |= ((lat_idx >> (n_lat - 1 - i)) & 1) << (nbits - 2 - 2 * i)
    alphabet = np.frombuffer(GEOHASH_BASE32, dtype=np.uint8)
    groups = np.empty((lon.shape[0], precision), dtype=np.uint8)
    for j in range(precision):
        groups[:, j] = alphabet[
            (gh >> (5 * (precision - 1 - j))) & 31]
    strs = np.frombuffer(groups.tobytes(), dtype=f"S{precision}")
    return gh, strs.astype("U")
