"""Ray-crossing point-in-polygon, from scratch (no shapely in container).

The north_rule mandates "ray-crossing point-in-polygon tests against
prepared tile polygons". Shapely's prepared geometries / STRtree are
unavailable, so the engine ships its own "prepared polygon":

- ``PreparedPolygons``: per-polygon edge arrays precomputed once
  (built in a tiling actor's ``__init__`` — once per actor, never per
  batch), plus bounding boxes and a uniform grid index over bboxes for
  candidate pruning (the STRtree role).
- ``contains``: vectorized even-odd ray crossing of N points against
  one polygon (loop over polygon edges, vectorized over points) with
  the standard half-open edge rule (consistent boundary handling).

Complexity per batch: O(#candidate_polygons x #edges x #points) in
numpy kernels.
"""

from __future__ import annotations

import numpy as np


def _ring_contains(px: np.ndarray, py: np.ndarray,
                   rx: np.ndarray, ry: np.ndarray) -> np.ndarray:
    """Even-odd ray crossing: points (px,py) vs one closed ring
    (rx,ry; last vertex need not repeat the first). Vectorized over
    points; loops over ring edges (rings are small)."""
    inside = np.zeros(len(px), dtype=bool)
    n = len(rx)
    j = n - 1
    for i in range(n):
        xi, yi = rx[i], ry[i]
        xj, yj = rx[j], ry[j]
        # half-open rule: edge counts if it straddles the horizontal ray
        cond = (yi > py) != (yj > py)
        if np.any(cond):
            xint = (xj - xi) * (py[cond] - yi) / (yj - yi) + xi
            hit = px[cond] < xint
            idx = np.flatnonzero(cond)[hit]
            inside[idx] = ~inside[idx]
        j = i
    return inside


class PreparedPolygons:
    """Immutable broadcastable bundle of polygons with a grid index.

    ``polys``: list of (tile_id, xs, ys) rings. Built once (driver or
    actor __init__), shipped via ``ray.put`` — the broadcast small side
    of the point-in-polygon join (SURVEY.md §2.4 'Broadcast-small-side').
    """

    def __init__(self, tile_ids, rings_x, rings_y, grid_res: int = 64):
        self.tile_ids = list(tile_ids)
        self.rings_x = [np.asarray(x, dtype=np.float64) for x in rings_x]
        self.rings_y = [np.asarray(y, dtype=np.float64) for y in rings_y]
        n = len(self.tile_ids)
        self.bbox = np.zeros((n, 4))
        for i in range(n):
            self.bbox[i] = (self.rings_x[i].min(), self.rings_y[i].min(),
                            self.rings_x[i].max(), self.rings_y[i].max())
        # uniform grid over the global extent for candidate pruning
        self.grid_res = grid_res
        if n:
            self.gx0, self.gy0 = self.bbox[:, 0].min(), self.bbox[:, 1].min()
            self.gx1 = max(self.bbox[:, 2].max(), self.gx0 + 1e-9)
            self.gy1 = max(self.bbox[:, 3].max(), self.gy0 + 1e-9)
        else:
            self.gx0 = self.gy0 = 0.0
            self.gx1 = self.gy1 = 1.0
        self.grid: list[list[int]] = [[] for _ in range(grid_res * grid_res)]
        for i in range(n):
            cx0, cy0, cx1, cy1 = self._cells_of_bbox(*self.bbox[i])
            for cy in range(cy0, cy1 + 1):
                for cx in range(cx0, cx1 + 1):
                    self.grid[cy * grid_res + cx].append(i)

    def _cells_of_bbox(self, x0, y0, x1, y1):
        r = self.grid_res
        fx = lambda v: int(np.clip((v - self.gx0) / (self.gx1 - self.gx0) * r, 0, r - 1))
        fy = lambda v: int(np.clip((v - self.gy0) / (self.gy1 - self.gy0) * r, 0, r - 1))
        return fx(x0), fy(y0), fx(x1), fy(y1)

    def candidates(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Per-point candidate polygon count pruning: returns the set of
        polygon indices whose grid cells are touched by any point."""
        r = self.grid_res
        cx = np.clip(((px - self.gx0) / (self.gx1 - self.gx0) * r).astype(np.int64), 0, r - 1)
        cy = np.clip(((py - self.gy0) / (self.gy1 - self.gy0) * r).astype(np.int64), 0, r - 1)
        cells = np.unique(cy * r + cx)
        out: set[int] = set()
        for c in cells:
            out.update(self.grid[int(c)])
        return np.fromiter(sorted(out), dtype=np.int64, count=len(out))

    def assign_first(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """First-match tile assignment: for each point the lowest-index
        containing polygon (deterministic under overlaps, mirroring the
        reference's first-match-wins layer scan, handler.cc:96-104).
        Returns int64 polygon index, -1 when uncovered."""
        out = np.full(len(px), -1, dtype=np.int64)
        if not self.tile_ids:
            return out
        for i in self.candidates(px, py):
            undecided = out == -1
            if not np.any(undecided):
                break
            x0, y0, x1, y1 = self.bbox[i]
            m = undecided & (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
            if not np.any(m):
                continue
            hit = _ring_contains(px[m], py[m], self.rings_x[i], self.rings_y[i])
            idx = np.flatnonzero(m)[hit]
            out[idx] = i
        return out

    def assign_all(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All containing polygons: returns (point_idx, poly_idx) pairs
        (a point inside k overlapping tiles yields k rows)."""
        pts, polys = [], []
        for i in self.candidates(px, py):
            x0, y0, x1, y1 = self.bbox[i]
            m = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
            if not np.any(m):
                continue
            hit = _ring_contains(px[m], py[m], self.rings_x[i], self.rings_y[i])
            idx = np.flatnonzero(m)[hit]
            pts.append(idx)
            polys.append(np.full(len(idx), i, dtype=np.int64))
        if not pts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(pts), np.concatenate(polys)
