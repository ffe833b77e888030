"""Vectorized Hilbert curve (public-domain algorithm, cf. Hamilton's
"Compact Hilbert Indices" / the classic Wikipedia d2xy formulation).

Two uses:
- ``phash -> (lon, lat)``: the entity adapter derives deterministic
  WGS84 coordinates from the mandated ``phash`` column (SURVEY.md §7.2)
  via Hilbert decode, so nearby hashes land near each other — giving the
  synthetic data realistic spatial locality (hot cells!).
- the S2-analog cell id (functions/cells.py): S2 orders its level-k
  cells along a Hilbert curve; our from-scratch stand-in indexes an
  equirectangular 2^L x 2^L grid the same way.
"""

from __future__ import annotations

import numpy as np


def d2xy(order: int, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Hilbert distance -> (x, y) on a 2^order grid. Vectorized."""
    d = d.astype(np.uint64, copy=True)
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    t = d.copy()
    s = np.uint64(1)
    one = np.uint64(1)
    two = np.uint64(2)
    for _ in range(order):
        rx = (t // two) & one
        ry = (t ^ rx) & one
        # rotate quadrant
        flip = ry == 0
        swap_mask = flip & (rx == 1)
        x_f = np.where(swap_mask, s - one - x, x)
        y_f = np.where(swap_mask, s - one - y, y)
        x2 = np.where(flip, y_f, x_f)
        y2 = np.where(flip, x_f, y_f)
        x = x2 + s * rx
        y = y2 + s * ry
        t //= np.uint64(4)
        s *= two
    return x, y


def xy2d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(x, y) on a 2^order grid -> Hilbert distance. Vectorized."""
    x = x.astype(np.uint64, copy=True)
    y = y.astype(np.uint64, copy=True)
    d = np.zeros_like(x)
    one = np.uint64(1)
    s = np.uint64(1) << np.uint64(order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate
        flip = ry == 0
        swap_mask = flip & (rx == 1)
        x_f = np.where(swap_mask, s - one - x, x)
        y_f = np.where(swap_mask, s - one - y, y)
        x2 = np.where(flip, y_f, x_f)
        y2 = np.where(flip, x_f, y_f)
        x, y = x2, y2
        s >>= one
    return d


PHASH_ORDER = 16  # 2^32 curve positions -> 2^16 x 2^16 lon/lat grid


def phash_to_lonlat(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic ``phash -> (lon, lat)`` in valid WGS84 range.

    Uses the low 32 bits of phash as a Hilbert distance on an order-16
    curve, mapped onto [-180, 180) x [-90, 90).
    """
    d = phash.astype(np.int64).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    hx, hy = d2xy(PHASH_ORDER, d)
    side = float(1 << PHASH_ORDER)
    lon = hx.astype(np.float64) / side * 360.0 - 180.0
    lat = hy.astype(np.float64) / side * 180.0 - 90.0
    return lon, lat
