"""Geometry construction (M10-M12) and postprocess operators (P3-P6).

M10/M11: the reference writes 1-vertex SHPT_POINT and N-vertex
SHPT_ARC / SHPT_POLYGON objects with vertices exactly as resolved — no
ring closing, no validation (/root/reference/osm/shapefile.cc:32-49).
Here they become WKB columns built vectorized per batch.

P3-P6 re-express mapgen.sh's GRASS chain (mapgen.sh:56-90):
- P3 ``v.build.polylines`` -> merge_lines (endpoint union-find per group)
- P4 ``v.generalize method=douglas threshold=T`` -> simplify_dp
- P5 ``v.clean tool=snap,break,rmdupl`` -> snap_dedup (grid quantize +
  keep-first — exact dedup after quantization)
- P6 ``v.clean tool=rmline`` -> drop degenerate lines

All operate on the assembled-way schema (way_id, layer_idx, xs, ys).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import wkb
from .classify import GEOM_POLYGON, LAYER_GEOM, layer_name_col


def _list_col(batch: pa.Table, name: str) -> pa.ListArray:
    col = batch[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def build_way_wkb_batch(batch: pa.Table) -> pa.Table:
    """Assembled ways -> (way_id, layer string, geometry_wkb, x, y
    centroid helper cols). Vertices verbatim (shapefile.cc:41-49)."""
    xs = _list_col(batch, "xs")
    ys = _list_col(batch, "ys")
    offsets = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    fx = xs.flatten().to_numpy(zero_copy_only=False)
    fy = ys.flatten().to_numpy(zero_copy_only=False)
    layer_idx = batch["layer_idx"].to_numpy(zero_copy_only=False)
    is_poly = LAYER_GEOM[layer_idx] == GEOM_POLYGON
    n = len(batch)
    blobs: list[bytes | None] = [None] * n
    if (~is_poly).any():
        sub = _sub_offsets(offsets, ~is_poly)
        line_blobs = wkb.encode_linestrings(sub[0], fx[sub[1]], fy[sub[1]])
        for i, j in enumerate(np.flatnonzero(~is_poly)):
            blobs[j] = line_blobs[i]
    if is_poly.any():
        sub = _sub_offsets(offsets, is_poly)
        poly_blobs = wkb.encode_polygons(sub[0], fx[sub[1]], fy[sub[1]])
        for i, j in enumerate(np.flatnonzero(is_poly)):
            blobs[j] = poly_blobs[i]
    # representative point for spatial stages: first vertex
    first = offsets[:-1]
    return pa.table({
        "way_id": batch["way_id"],
        "layer": layer_name_col(layer_idx),
        "geometry_wkb": pa.array(blobs, pa.binary()),
        "x": pa.array(fx[first], pa.float64()),
        "y": pa.array(fy[first], pa.float64()),
    })


def _sub_offsets(offsets: np.ndarray, mask: np.ndarray):
    """Offsets + flat-index selector for the masked subset of features."""
    counts = np.diff(offsets)[mask]
    sub_off = np.concatenate(([0], np.cumsum(counts)))
    sel = np.concatenate([np.arange(offsets[i], offsets[i + 1])
                          for i in np.flatnonzero(mask)]) if mask.any() else np.empty(0, np.int64)
    return sub_off, sel.astype(np.int64)


def build_point_wkb_batch(batch: pa.Table) -> pa.Table:
    """Exported points -> (layer string, geometry_wkb, name, x, y)."""
    x = batch["x"].to_numpy(zero_copy_only=False)
    y = batch["y"].to_numpy(zero_copy_only=False)
    layer_idx = batch["layer_idx"].to_numpy(zero_copy_only=False)
    return pa.table({
        "layer": layer_name_col(layer_idx),
        "geometry_wkb": pa.array(wkb.encode_points(x, y), pa.binary()),
        "name": batch["name"],
        "x": pa.array(x, pa.float64()),
        "y": pa.array(y, pa.float64()),
    })


# ------------------------------------------------------------ P4: Douglas-Peucker

def dp_simplify_one(x: np.ndarray, y: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep-mask for one polyline. Iterative stack,
    vectorized distance kernel per segment (the GRASS v.generalize
    method=douglas analog, mapgen.sh:59)."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    tol2 = tol * tol
    while stack:
        a, b = stack.pop()
        if b <= a + 1:
            continue
        dx, dy = x[b] - x[a], y[b] - y[a]
        seg2 = dx * dx + dy * dy
        px = x[a + 1:b] - x[a]
        py = y[a + 1:b] - y[a]
        if seg2 == 0.0:
            d2 = px * px + py * py
        else:
            t = np.clip((px * dx + py * dy) / seg2, 0.0, 1.0)
            ex = px - t * dx
            ey = py - t * dy
            d2 = ex * ex + ey * ey
        i = int(np.argmax(d2))
        if d2[i] > tol2:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def simplify_batch(batch: pa.Table, tolerance: float) -> pa.Table:
    """P4 over assembled ways (xs/ys list columns)."""
    xs = _list_col(batch, "xs")
    ys = _list_col(batch, "ys")
    offsets = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    fx = xs.flatten().to_numpy(zero_copy_only=False)
    fy = ys.flatten().to_numpy(zero_copy_only=False)
    keep = np.zeros(len(fx), dtype=bool)
    new_counts = np.empty(len(batch), dtype=np.int64)
    for i in range(len(batch)):
        lo, hi = offsets[i], offsets[i + 1]
        if hi - lo < 3:
            keep[lo:hi] = True
            new_counts[i] = hi - lo
            continue
        k = dp_simplify_one(fx[lo:hi], fy[lo:hi], tolerance)
        keep[lo:hi] = k
        new_counts[i] = int(k.sum())
    new_off = pa.array(np.concatenate(([0], np.cumsum(new_counts))), pa.int32())
    out = batch.drop_columns(["xs", "ys"])
    out = out.append_column("xs", pa.ListArray.from_arrays(new_off, pa.array(fx[keep], pa.float64())))
    out = out.append_column("ys", pa.ListArray.from_arrays(new_off, pa.array(fy[keep], pa.float64())))
    return out


# ------------------------------------------------------------ P5: snap-dedup

def snap_key_batch(batch: pa.Table, threshold: float) -> pa.Table:
    """Append a snap-hash column: vertices quantized to a
    ``threshold`` grid, FNV-combined per geometry. Exact dedup after
    quantization = groupby(snap_key).keep-first (mapgen.sh:60)."""
    from ..functions.hashing import splitmix64
    xs = _list_col(batch, "xs")
    offsets = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    fx = xs.flatten().to_numpy(zero_copy_only=False)
    fy = _list_col(batch, "ys").flatten().to_numpy(zero_copy_only=False)
    qx = np.round(fx / threshold).astype(np.int64).astype(np.uint64)
    qy = np.round(fy / threshold).astype(np.int64).astype(np.uint64)
    vert = splitmix64(qx ^ (qy << np.uint64(32) | qy >> np.uint64(32)))
    # order-sensitive combine: multiply by position-dependent odd constant
    pos = (np.arange(len(vert), dtype=np.uint64)
           - np.repeat(offsets[:-1].astype(np.uint64), np.diff(offsets)))
    with np.errstate(over="ignore"):
        mixed = vert * (np.uint64(2) * pos + np.uint64(1))
    key = np.add.reduceat(mixed, offsets[:-1]) if len(batch) else np.empty(0, np.uint64)
    # empty geometries (reduceat quirk) -> 0
    key = np.where(np.diff(offsets) == 0, np.uint64(0), key)
    return batch.append_column("snap_key", pa.array(key.astype(np.int64), pa.int64()))


# ------------------------------------------------------------ P6: rmline

def drop_degenerate_batch(batch: pa.Table) -> pa.Table:
    """Remove zero-extent / <2-vertex lines (mapgen.sh:61)."""
    xs = _list_col(batch, "xs")
    ys = _list_col(batch, "ys")
    offsets = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    fx = xs.flatten().to_numpy(zero_copy_only=False)
    fy = ys.flatten().to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    seg_len = np.abs(np.diff(fx)) + np.abs(np.diff(fy))
    # a geometry is degenerate if <2 vertices or total length 0
    total = np.zeros(len(batch))
    for i in range(len(batch)):
        lo, hi = offsets[i], offsets[i + 1]
        total[i] = seg_len[lo:hi - 1].sum() if hi - lo >= 2 else 0.0
    keep = (counts >= 2) & (total > 0)
    return batch.filter(pa.array(keep))


# ------------------------------------------------------ length analytics

def length_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-layer polyline-length partial over assembled ways
    (way_id, layer_idx, xs, ys) -> at most n_layers rows per batch:
    (layer_idx, part_len, part_ways, part_verts).

    The analytic the reference user gets from the shapefile output
    (per-layer feature stats over osm2shp's arc layers,
    /root/reference/osm/shapefile.cc:41-49 writes vertices verbatim)
    expressed as a combiner: segment lengths are planar Euclidean
    (sqrt is IEEE-correctly-rounded, so DuckDB reproduces every
    per-segment value bit-identically), summed per layer INSIDE the
    batch so the wide exchange carries O(layers) rows regardless of
    input size. Vectorized over the flattened list buffers — the
    phantom segments that span consecutive ways are masked, never
    looped."""
    xs = _list_col(batch, "xs")
    ys = _list_col(batch, "ys")
    empty = pa.table({"layer_idx": pa.array([], pa.int64()),
                      "part_len": pa.array([], pa.float64()),
                      "part_ways": pa.array([], pa.int64()),
                      "part_verts": pa.array([], pa.int64())})
    n = len(batch)
    if n == 0:
        return empty
    offsets = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    fx = xs.flatten().to_numpy(zero_copy_only=False)
    fy = ys.flatten().to_numpy(zero_copy_only=False)
    layer_idx = batch["layer_idx"].to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    uq, inv = np.unique(layer_idx, return_inverse=True)
    part_ways = np.bincount(inv, minlength=len(uq))
    part_verts = np.bincount(inv, weights=counts.astype(np.float64),
                             minlength=len(uq)).astype(np.int64)
    if len(fx) >= 2:
        seg = np.sqrt(np.diff(fx) ** 2 + np.diff(fy) ** 2)
        cross = offsets[1:-1] - 1
        cross = cross[(cross >= 0) & (cross < len(seg))]
        seg[cross] = 0.0
        vert_way = np.repeat(np.arange(n), counts)
        seg_layer = inv[vert_way[: len(seg)]]
        part_len = np.bincount(seg_layer, weights=seg, minlength=len(uq))
    else:
        part_len = np.zeros(len(uq))
    return pa.table({
        "layer_idx": pa.array(uq.astype(np.int64), pa.int64()),
        "part_len": pa.array(part_len, pa.float64()),
        "part_ways": pa.array(part_ways.astype(np.int64), pa.int64()),
        "part_verts": pa.array(part_verts, pa.int64()),
    })


def bearing_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-(layer, compass-sector) segment counts over assembled ways
    ``(way_id, layer_idx, xs, ys)`` — the orientation histogram of a
    road network (grid-city vs organic-growth signature; the
    length_partial_batch combiner shape). Segments classify into FOUR
    half-open sectors by pure comparisons on (dx, dy) — no atan2, so
    the SQL mirror repeats the identical CASE chain on identical
    doubles: zero-length segments drop; ``|dx| >= |dy|`` routes to
    E (dx > 0) or W, else N (dy > 0) or S. At most
    ``n_layers x 4`` rows leave each batch.

    Output: ``(layer_idx, sector, part_segs)``.
    """
    xs = _list_col(batch, "xs")
    ys = _list_col(batch, "ys")
    empty = pa.table({"layer_idx": pa.array([], pa.int64()),
                      "sector": pa.array([], pa.int64()),
                      "part_segs": pa.array([], pa.int64())})
    n = len(batch)
    if n == 0:
        return empty
    offsets = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    fx = xs.flatten().to_numpy(zero_copy_only=False)
    fy = ys.flatten().to_numpy(zero_copy_only=False)
    layer_idx = batch["layer_idx"].to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    if len(fx) < 2:
        return empty
    dx = np.diff(fx)
    dy = np.diff(fy)
    valid = np.ones(len(dx), bool)
    cross = offsets[1:-1] - 1  # phantom segments spanning ways
    cross = cross[(cross >= 0) & (cross < len(dx))]
    valid[cross] = False
    valid &= (dx != 0) | (dy != 0)
    sector = np.where(np.abs(dx) >= np.abs(dy),
                      np.where(dx > 0, 0, 1),
                      np.where(dy > 0, 2, 3)).astype(np.int64)
    vert_way = np.repeat(np.arange(n), counts)
    seg_layer = layer_idx[vert_way[: len(dx)]]
    key = seg_layer[valid] * 4 + sector[valid]
    uk, cnt = np.unique(key, return_counts=True)
    return pa.table({
        "layer_idx": pa.array(uk // 4, pa.int64()),
        "sector": pa.array(uk % 4, pa.int64()),
        "part_segs": pa.array(cnt.astype(np.int64), pa.int64())})


def ring_area_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-layer implicit-ring shoelace area partial over assembled
    ways (way_id, layer_idx, xs, ys) -> at most n_layers rows per
    batch: (layer_idx, part_polys, part_area_q).

    The polygon analytic of the reference's area layers (is_area ways
    close into rings, /root/reference/osm/handler.cc area handling):
    each way with >= 3 vertices is treated as the ring formed by its
    vertex cycle (wrap edge last->first appended). The shoelace fold
    runs in strict vertex order (np.add.at accumulates sequentially,
    the same left fold DuckDB's list_sum performs), the wrap term adds
    last, and |S| quantizes per way to int64 half-micro-units
    (floor(|S| * 500000) == floor(area * 1e6)) BEFORE any cross-batch
    sum — so the distributed total is combine-order independent and
    bit-equal to the sequential SQL mirror."""
    xs = _list_col(batch, "xs")
    ys = _list_col(batch, "ys")
    empty = pa.table({"layer_idx": pa.array([], pa.int64()),
                      "part_polys": pa.array([], pa.int64()),
                      "part_area_q": pa.array([], pa.int64())})
    n = len(batch)
    if n == 0:
        return empty
    offsets = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    fx = xs.flatten().to_numpy(zero_copy_only=False)
    fy = ys.flatten().to_numpy(zero_copy_only=False)
    layer_idx = batch["layer_idx"].to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    keep = counts >= 3
    if not keep.any():
        return empty
    S = np.zeros(n, np.float64)
    if len(fx) >= 2:
        t = fx[:-1] * fy[1:] - fx[1:] * fy[:-1]
        cross = offsets[1:-1] - 1  # phantom terms spanning two ways
        cross = cross[(cross >= 0) & (cross < len(t))]
        t[cross] = 0.0
        vert_way = np.repeat(np.arange(n), counts)
        np.add.at(S, vert_way[: len(t)], t)
    last, first = offsets[1:] - 1, offsets[:-1]
    S = S + (fx[last] * fy[first] - fx[first] * fy[last])
    area_q = np.floor(np.abs(S) * 500000.0).astype(np.int64)
    uq, inv = np.unique(layer_idx[keep], return_inverse=True)
    part_polys = np.bincount(inv, minlength=len(uq)).astype(np.int64)
    part_area = np.zeros(len(uq), np.int64)
    np.add.at(part_area, inv, area_q[keep])
    return pa.table({
        "layer_idx": pa.array(uq.astype(np.int64), pa.int64()),
        "part_polys": pa.array(part_polys, pa.int64()),
        "part_area_q": pa.array(part_area, pa.int64()),
    })


def _ring_folds(batch: pa.Table):
    """Shared sequential shoelace folds over (xs, ys) list columns:
    returns (counts, S, Sx, Sy) per row — S the signed shoelace sum
    (2A), Sx/Sy the centroid numerator folds — each a strict
    vertex-order left fold plus the wrap term added last, the exact
    order DuckDB's list_sum + trailing addition evaluates."""
    xs = _list_col(batch, "xs")
    ys = _list_col(batch, "ys")
    n = len(batch)
    offsets = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    fx = xs.flatten().to_numpy(zero_copy_only=False)
    fy = ys.flatten().to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    S = np.zeros(n, np.float64)
    Sx = np.zeros(n, np.float64)
    Sy = np.zeros(n, np.float64)
    if len(fx) >= 2:
        t = fx[:-1] * fy[1:] - fx[1:] * fy[:-1]
        tx = (fx[:-1] + fx[1:]) * t
        ty = (fy[:-1] + fy[1:]) * t
        cross = offsets[1:-1] - 1
        cross = cross[(cross >= 0) & (cross < len(t))]
        t[cross] = 0.0
        tx[cross] = 0.0
        ty[cross] = 0.0
        vert_way = np.repeat(np.arange(n), counts)
        vw = vert_way[: len(t)]
        np.add.at(S, vw, t)
        np.add.at(Sx, vw, tx)
        np.add.at(Sy, vw, ty)
    last, first = offsets[1:] - 1, offsets[:-1]
    wt = fx[last] * fy[first] - fx[first] * fy[last]
    S = S + wt
    Sx = Sx + (fx[last] + fx[first]) * wt
    Sy = Sy + (fy[last] + fy[first]) * wt
    return counts, S, Sx, Sy


def ring_centroid_batch(batch: pa.Table, id_col: str = "ring_id",
                        min_area_q: int = 100) -> pa.Table:
    """Per-ring polygon centroid (id, n_verts, cx_q, cy_q): the
    standard shoelace centroid C = (Sx, Sy) / (3 S), quantized to
    int64 micro-degrees with floor (toward -inf on both engines).
    Rings with < 3 vertices or quantized area below ``min_area_q``
    (floor(|S| * 5e5) — the q_way_area unit) are dropped: a
    self-intersecting vertex cycle whose signed area nearly cancels
    has an unbounded shoelace centroid, and the default gate
    (|S| >= 2e-4 deg^2) provably keeps |C| * 1e6 inside int64 for
    WGS84 coordinates. Both conditions mirror in the SQL."""
    counts, S, Sx, Sy = _ring_folds(batch)
    aq = np.floor(np.abs(S) * 500000.0)
    keep = (counts >= 3) & (aq >= min_area_q)
    idx = np.flatnonzero(keep)
    take = pa.array(idx, pa.int64())
    cx = Sx[idx] / (3.0 * S[idx])
    cy = Sy[idx] / (3.0 * S[idx])
    return pa.table({
        id_col: batch[id_col].take(take),
        "n_verts": pa.array(counts[idx], pa.int64()),
        "cx_q": pa.array(np.floor(cx * 1e6).astype(np.int64), pa.int64()),
        "cy_q": pa.array(np.floor(cy * 1e6).astype(np.int64), pa.int64()),
    })


# ------------------------------------------------------------ P5: break

def _piece_id(way_id: int, piece: int) -> int:
    """Deterministic NEGATIVE id for piece ``piece`` of ``way_id`` —
    see break_lines_group's docstring for the id-space contract. Both
    break kernels (single-group and distributed) MUST use this same
    function: the equivalence tests compare their outputs."""
    from ..functions.hashing import splitmix64
    with np.errstate(over="ignore"):
        v = splitmix64(np.array(
            [np.uint64(way_id & 0xFFFFFFFFFFFFFFFF)
             ^ (np.uint64(piece) * np.uint64(0x9E3779B97F4A7C15))],
            dtype=np.uint64))[0]
    return -int(v >> np.uint64(2)) - 1


def _pairwise_cuts(p0x, p0y, p1x, p1y, eps: float = 1e-12,
                   chunk: int = 2048) -> list[list[float]]:
    """Interior cut parameters t per segment from all-pairs segment
    intersection (proper crossings + T-joints). The pair grid is
    evaluated in row CHUNKS so temporaries are O(chunk * m), never
    O(m^2) — a dense cell cannot OOM the worker (compute stays O(m^2),
    which is what the caller's cell partitioning bounds)."""
    m = len(p0x)
    cuts: list[list[float]] = [[] for _ in range(m)]
    if m < 2:
        return cuts
    P0 = np.stack([np.asarray(p0x, dtype=np.float64),
                   np.asarray(p0y, dtype=np.float64)], axis=1)
    R = np.stack([np.asarray(p1x, dtype=np.float64) - P0[:, 0],
                  np.asarray(p1y, dtype=np.float64) - P0[:, 1]], axis=1)
    for c0 in range(0, m, chunk):
        c1 = min(c0 + chunk, m)
        Rc = R[c0:c1]
        d = P0[None, :, :] - P0[c0:c1, None, :]          # (c, m, 2)
        denom = Rc[:, None, 0] * R[None, :, 1] - Rc[:, None, 1] * R[None, :, 0]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (d[:, :, 0] * R[None, :, 1] - d[:, :, 1] * R[None, :, 0]) / denom
            u = (d[:, :, 0] * Rc[:, None, 1] - d[:, :, 1] * Rc[:, None, 0]) / denom
        ok = (np.abs(denom) > eps) & (t >= -eps) & (t <= 1 + eps) \
            & (u >= -eps) & (u <= 1 + eps) & (t > eps) & (t < 1 - eps)
        ii, jj = np.nonzero(ok)
        for a, b in zip(ii, jj):
            if c0 + a != b:              # skip self-pair
                cuts[c0 + a].append(float(t[a, b]))
    return cuts


def _rebuild_split(xs: np.ndarray, ys: np.ndarray,
                   cuts_by_seg: dict[int, list[float]]):
    """One polyline + per-segment interior cut params -> list of
    (xs, ys) pieces, cut at every intersection point."""
    pieces: list[tuple[list, list]] = []
    cur_x = [xs[0]]
    cur_y = [ys[0]]
    for s in range(len(xs) - 1):
        ax, ay = xs[s], ys[s]
        rx, ry = xs[s + 1] - ax, ys[s + 1] - ay
        for tv in sorted(set(cuts_by_seg.get(s, ()))):
            px, py = ax + tv * rx, ay + tv * ry
            cur_x.append(px)
            cur_y.append(py)
            pieces.append((cur_x, cur_y))
            cur_x, cur_y = [px], [py]
        cur_x.append(xs[s + 1])
        cur_y.append(ys[s + 1])
    if len(cur_x) >= 2:
        pieces.append((cur_x, cur_y))
    return pieces


def break_lines_group(df, eps: float = 1e-12) -> pa.Table:
    """Split lines at intersections — the ``break`` tool of
    ``v.clean tool=snap,break,rmdupl`` (/root/reference/mapgen.sh:60).

    All elementary segments in the group are tested pairwise for proper
    crossings and T-joints (vectorized: one broadcast cross-product
    grid over the group's segments); every line is cut at each
    intersection point, producing one output line per cut piece. Two
    crossing segments therefore become 4 pieces; a T-joint splits only
    the crossed line. Collinear overlaps are left untouched (GRASS
    resolves them in snap; our snap-dedup handles exact duplicates).

    This is the SINGLE-GROUP kernel (all features of one group, every
    pair considered — callers pass ONE layer per group; the reference
    cleans layers independently) — used directly on small inputs and
    as the ground truth the distributed ``break_lines`` is
    equivalence-tested against; production mapgen uses ``break_lines``,
    which finds a crossing wherever it lies and keys its groups by
    (cell, layer).

    Split-line ids derive from the parent but live in a DISJOINT id
    space: -(splitmix64(way_id, piece) >> 2) - 1 — negative, so a
    piece id can never collide with a genuine way id (the pipeline
    only admits ids > 0, mirroring the reference's id>0 gate), and
    avalanched so it works for ANY int64 parent id (mapgen's merged
    polylines carry synthetic wrapped ids; a structural shift would
    overflow). Deterministic; cross-piece collisions are 2^-62-scale
    and only perturb dedup keep-min tie-breaks."""
    xs_l = [np.asarray(v, dtype=np.float64) for v in df["xs"]]
    ys_l = [np.asarray(v, dtype=np.float64) for v in df["ys"]]
    ids = df["way_id"].to_numpy() if "way_id" in df else np.arange(len(xs_l))
    layer_idx = df["layer_idx"].to_numpy() if len(df) else np.empty(0, np.int8)

    # explode to elementary segments (seg_bounds[i] = first segment
    # index of feature i, so per-feature rebuild is a slice, not a scan)
    nseg = np.array([max(len(a) - 1, 0) for a in xs_l], dtype=np.int64)
    seg_bounds = np.concatenate(([0], np.cumsum(nseg)))
    p0x = np.concatenate([a[:-1] for a in xs_l]) if len(xs_l) else np.empty(0)
    p0y = np.concatenate([a[:-1] for a in ys_l]) if len(ys_l) else np.empty(0)
    p1x = np.concatenate([a[1:] for a in xs_l]) if len(xs_l) else np.empty(0)
    p1y = np.concatenate([a[1:] for a in ys_l]) if len(ys_l) else np.empty(0)
    cuts = _pairwise_cuts(p0x, p0y, p1x, p1y, eps)

    # rebuild each feature with cut vertices inserted, then split;
    # an unsplit feature keeps its original way_id
    out_x, out_y, out_id, out_layer = [], [], [], []
    for i in range(len(xs_l)):
        lo = int(seg_bounds[i])
        by_seg = {s - lo: cuts[s] for s in range(lo, int(seg_bounds[i + 1]))
                  if cuts[s]}
        pieces = _rebuild_split(xs_l[i], ys_l[i], by_seg)
        for p, (px, py) in enumerate(pieces):
            out_x.append(np.asarray(px))
            out_y.append(np.asarray(py))
            out_id.append(int(ids[i]) if len(pieces) == 1
                          else _piece_id(int(ids[i]), p))
            out_layer.append(layer_idx[i])
    counts = np.array([len(a) for a in out_x], dtype=np.int64)
    off = pa.array(np.concatenate(([0], np.cumsum(counts))) if len(counts)
                   else np.array([0]), pa.int32())
    flat = lambda arrs: (np.concatenate(arrs) if arrs else np.empty(0))
    return pa.table({
        "way_id": pa.array(out_id, pa.int64()),
        "layer_idx": pa.array(np.asarray(out_layer, dtype=np.int8), pa.int8()),
        "xs": pa.ListArray.from_arrays(off, pa.array(flat(out_x), pa.float64())),
        "ys": pa.ListArray.from_arrays(off, pa.array(flat(out_y), pa.float64())),
    })


def _dda_cells(ax, ay, bx, by, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact grid-traversal cover of one segment (Amanatides-Woo walk):
    the cells the segment actually passes through — O(nx+ny), not the
    O(nx*ny) bbox rectangle. Returns (cx, cy) int64 arrays."""
    cw = 360.0 / (1 << res)  # cell width in lon degrees (2^res x 2^res
    ch = 180.0 / (1 << res)  # grid over 360x180 — functions/cells.py)
    # walk in continuous cell coordinates
    x0, y0 = (ax + 180.0) / cw, (90.0 - ay) / ch
    x1, y1 = (bx + 180.0) / cw, (90.0 - by) / ch
    cx, cy = int(x0), int(y0)
    ex, ey = int(x1), int(y1)
    out = [(cx, cy)]
    dx, dy = x1 - x0, y1 - y0
    sx = 1 if dx > 0 else -1
    sy = 1 if dy > 0 else -1
    tmx = ((cx + (sx > 0)) - x0) / dx if dx else np.inf
    tmy = ((cy + (sy > 0)) - y0) / dy if dy else np.inf
    tdx = abs(1.0 / dx) if dx else np.inf
    tdy = abs(1.0 / dy) if dy else np.inf
    for _ in range(4 * (abs(ex - cx) + abs(ey - cy) + 2)):
        if cx == ex and cy == ey:
            break
        if tmx < tmy:
            cx += sx
            tmx += tdx
        else:
            cy += sy
            tmy += tdy
        out.append((cx, cy))
    arr = np.asarray(out, dtype=np.int64)
    return arr[:, 0], arr[:, 1]


def break_lines(ds, res: int = 9, eps: float = 1e-12,
                n_buckets: int = 64):
    """DISTRIBUTED intersection break (P5 ``break``, mapgen.sh:60) —
    correct wherever the crossing lies, unlike a per-feature grouping:

    1. explode features to elementary segments; each segment is
       duplicated into every res-``res`` cell it PASSES THROUGH
       (vectorized bbox fill for short segments, exact grid-traversal
       walk for spans > 4 cells — a crossing point lies ON both
       segments, so both cover its cell);
    2. groupby(cell x layer): all-pairs segment solve (chunked,
       memory-bounded) emits (way_id, seg_idx, t) cut rows — layer is
       part of the key because the reference cleans each layer
       INDEPENDENTLY (mapgen.sh:56-62): a road never splits at a
       railway crossing. A pair co-covered by two cells emits the same
       cut twice — deduped at rebuild;
    3. cut rows union the original features, groupby(way bucket),
       rebuild + split each way at its cuts.

    The input is materialized first: it feeds BOTH the segment-explode
    branch and the rebuild union, and unmaterialized lineage would
    re-execute the whole upstream chain per consumer.

    Two shuffles total; cell ``res`` is the group-size knob (finer =
    smaller O(m^2) cells, more duplicated boundary segments)."""
    from ..functions.cells import latlng_to_cell, cell_xy
    from ..functions.hashing import bucket_of
    from .util import coalesced

    ds = ds.materialize()

    def explode_segments(t: pa.Table) -> pa.Table:
        xs = _list_col(t, "xs")
        ys = _list_col(t, "ys")
        off = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        fx = xs.flatten().to_numpy(zero_copy_only=False)
        fy = ys.flatten().to_numpy(zero_copy_only=False)
        nseg = np.maximum(np.diff(off) - 1, 0)
        wid = np.repeat(t["way_id"].to_numpy(zero_copy_only=False), nseg)
        lay = np.repeat(t["layer_idx"].to_numpy(zero_copy_only=False), nseg)
        ends = np.cumsum(nseg)
        sidx = (np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64)
                - np.repeat(ends - nseg, nseg))
        v0 = np.repeat(off[:-1], nseg) + sidx
        ax, ay = fx[v0], fy[v0]
        bx, by = fx[v0 + 1], fy[v0 + 1]
        # cell cover per segment. NOTE the cell y axis runs opposite to
        # latitude, so min/max the CELL coordinates of the corners.
        c_a = latlng_to_cell(np.minimum(ay, by), np.minimum(ax, bx), res)
        c_b = latlng_to_cell(np.maximum(ay, by), np.maximum(ax, bx), res)
        xa, ya = cell_xy(c_a)
        xb, yb = cell_xy(c_b)
        x0 = np.minimum(xa, xb)
        y0 = np.minimum(ya, yb)
        nx = (np.maximum(xa, xb) - x0 + np.uint64(1)).astype(np.int64)
        ny = (np.maximum(ya, yb) - y0 + np.uint64(1)).astype(np.int64)
        span = nx * ny
        small = span <= 4   # bbox fill == traversal for tiny spans
        counts = np.where(small, span, 0)
        total = int(counts.sum())
        row = np.repeat(np.arange(len(counts)), counts)
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.cumsum(counts) - counts, counts))
        cx = x0.astype(np.int64)[row] + within % np.maximum(nx[row], 1)
        cy = y0.astype(np.int64)[row] + within // np.maximum(nx[row], 1)
        rows = [row]
        cxs = [cx]
        cys = [cy]
        for i in np.flatnonzero(~small):   # rare long segments: exact
            tx, ty = _dda_cells(ax[i], ay[i], bx[i], by[i], res)  # walk
            rows.append(np.full(len(tx), i, dtype=np.int64))
            cxs.append(tx)
            cys.append(ty)
        row = np.concatenate(rows)
        cx = np.concatenate(cxs)
        cy = np.concatenate(cys)
        # group key packed from raw coords + layer (per-layer
        # independent cleaning); NEVER multiply a res-tagged cell id —
        # the res<<58 high bits overflow int64 (the tile_histogram
        # salt-bug class)
        key = ((cy.astype(np.int64) << np.int64(33))
               | (cx.astype(np.int64) << np.int64(4))
               | (lay[row].astype(np.int64) & 15))
        return pa.table({
            "cell": pa.array(key, pa.int64()),
            "way_id": pa.array(wid[row], pa.int64()),
            "seg_idx": pa.array(sidx[row], pa.int64()),
            "ax": pa.array(ax[row], pa.float64()),
            "ay": pa.array(ay[row], pa.float64()),
            "bx": pa.array(bx[row], pa.float64()),
            "by": pa.array(by[row], pa.float64()),
        })

    def cuts_in_cell(df) -> pa.Table:
        cuts = _pairwise_cuts(df["ax"].to_numpy(), df["ay"].to_numpy(),
                              df["bx"].to_numpy(), df["by"].to_numpy(), eps)
        wid = df["way_id"].to_numpy()
        sid = df["seg_idx"].to_numpy()
        ow, os_, ot = [], [], []
        for i, ts in enumerate(cuts):
            for tv in ts:
                ow.append(wid[i]); os_.append(sid[i]); ot.append(tv)
        return pa.table({
            "way_id": pa.array(np.asarray(ow, dtype=np.int64), pa.int64()),
            "seg_idx": pa.array(np.asarray(os_, dtype=np.int64), pa.int64()),
            "t": pa.array(np.asarray(ot, dtype=np.float64), pa.float64()),
        })

    cut_rows = (coalesced(ds.map_batches(explode_segments,
                                         batch_format="pyarrow"))
                .groupby("cell").map_groups(cuts_in_cell,
                                            batch_format="pandas"))

    def tag_cuts(t: pa.Table) -> pa.Table:
        return pa.table({
            "way_id": t["way_id"],
            "layer_idx": pa.nulls(t.num_rows, pa.int8()),
            "xs": pa.nulls(t.num_rows, pa.list_(pa.float64())),
            "ys": pa.nulls(t.num_rows, pa.list_(pa.float64())),
            "seg_idx": t["seg_idx"],
            "t": t["t"],
            "__side": pa.array(np.ones(t.num_rows, np.int8)),
        })

    def tag_feats(t: pa.Table) -> pa.Table:
        return pa.table({
            "way_id": t["way_id"],
            "layer_idx": t["layer_idx"],
            "xs": t["xs"],
            "ys": t["ys"],
            "seg_idx": pa.nulls(t.num_rows, pa.int64()),
            "t": pa.nulls(t.num_rows, pa.float64()),
            "__side": pa.array(np.zeros(t.num_rows, np.int8)),
        })

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__wb", pa.array(
            bucket_of(t["way_id"].to_numpy(zero_copy_only=False), n_buckets),
            pa.int64()))

    unioned = coalesced(
        ds.map_batches(tag_feats, batch_format="pyarrow")
        .union(cut_rows.map_batches(tag_cuts, batch_format="pyarrow"))
        .map_batches(add_bucket, batch_format="pyarrow"))

    def rebuild_group(df) -> pa.Table:
        feats = df[df["__side"] == 0]
        cuts = df[df["__side"] == 1]
        cuts_by_way: dict = {}
        for w, s, tv in zip(cuts["way_id"], cuts["seg_idx"], cuts["t"]):
            cuts_by_way.setdefault(w, {}).setdefault(int(s), []).append(
                float(tv))
        out_x, out_y, out_id, out_layer = [], [], [], []
        for _, row in feats.iterrows():
            xs = np.asarray(row["xs"], dtype=np.float64)
            ys = np.asarray(row["ys"], dtype=np.float64)
            pieces = _rebuild_split(xs, ys, cuts_by_way.get(row["way_id"], {}))
            for p, (px, py) in enumerate(pieces):
                out_x.append(np.asarray(px))
                out_y.append(np.asarray(py))
                out_id.append(int(row["way_id"]) if len(pieces) == 1
                              else _piece_id(int(row["way_id"]), p))
                out_layer.append(row["layer_idx"])
        counts = np.array([len(a) for a in out_x], dtype=np.int64)
        offs = pa.array(np.concatenate(([0], np.cumsum(counts))) if len(counts)
                        else np.array([0]), pa.int32())
        flat = lambda arrs: (np.concatenate(arrs) if arrs else np.empty(0))
        return pa.table({
            "way_id": pa.array(out_id, pa.int64()),
            "layer_idx": pa.array(np.asarray(out_layer, dtype=np.int8),
                                  pa.int8()),
            "xs": pa.ListArray.from_arrays(offs, pa.array(flat(out_x),
                                                          pa.float64())),
            "ys": pa.ListArray.from_arrays(offs, pa.array(flat(out_y),
                                                          pa.float64())),
        })

    return unioned.groupby("__wb").map_groups(rebuild_group,
                                              batch_format="pandas")


# ------------------------------------------------------------ P3: polyline merge

def merge_lines_group(df, stop_keys=None) -> pa.Table:
    """Merge touching line segments within a group (layer or
    layer x coarse-cell): endpoint-keyed walk, chains stop at
    junctions (the v.build.polylines analog, mapgen.sh:58).

    ``stop_keys``: optional set of (layer_idx, kx, ky) endpoint keys
    the chain must NEVER merge through — the per-cell pass feeds the
    CROSS-GROUP endpoint keys here, because a node whose ends live in
    more than one group has an incomplete local view (local degree 2
    can be global degree 3: a junction whose third branch starts in
    another cell). Those nodes are resolved by the boundary stitch,
    whose components contain every sharer by construction. Callers
    with a complete view (single-group use, stitch components) pass
    None and get plain local-degree semantics."""
    import pandas as pd  # noqa: F401
    xs_l = list(df["xs"])
    ys_l = list(df["ys"])
    layer_idx = df["layer_idx"].iloc[0] if len(df) else 0
    eps = 1e-9

    def key(x, y):
        return (round(x / eps), round(y / eps))

    # adjacency between segment endpoints
    endpoint: dict[tuple, list[tuple[int, int]]] = {}
    for i, (xa, ya) in enumerate(zip(xs_l, ys_l)):
        for end in (0, 1):
            k = key(xa[0 if end == 0 else -1], ya[0 if end == 0 else -1])
            endpoint.setdefault(k, []).append((i, end))
    used = np.zeros(len(xs_l), dtype=bool)
    out_x, out_y, out_ids = [], [], []
    for i in range(len(xs_l)):
        if used[i]:
            continue
        # grow a chain from segment i in both directions
        chain_x = list(xs_l[i])
        chain_y = list(ys_l[i])
        used[i] = True
        for direction in (1, 0):
            while True:
                k = key(chain_x[-1], chain_y[-1]) if direction else key(chain_x[0], chain_y[0])
                if stop_keys is not None and (int(layer_idx), k[0], k[1]) in stop_keys:
                    break  # cross-group node: the stitch pass decides
                all_ends = endpoint.get(k, [])
                nxt = [(j, e) for (j, e) in all_ends if not used[j]]
                # junction test uses the TOTAL degree at the node, not
                # the unused count: once an earlier chain consumed one
                # branch of a T, the unused count at the junction drops
                # to 1 and an unused-only test would merge straight
                # through it (order-dependent wrong output)
                if len(all_ends) != 2 or len(nxt) != 1:
                    break  # junction or dead end: polylines stop there
                j, e = nxt[0]
                seg_x = list(xs_l[j])
                seg_y = list(ys_l[j])
                if direction:
                    if e != 0:
                        seg_x.reverse(); seg_y.reverse()
                    chain_x.extend(seg_x[1:]); chain_y.extend(seg_y[1:])
                else:
                    if e != 1:
                        seg_x.reverse(); seg_y.reverse()
                    chain_x = seg_x[:-1] + chain_x; chain_y = seg_y[:-1] + chain_y
                used[j] = True
        out_x.append(np.asarray(chain_x))
        out_y.append(np.asarray(chain_y))
        out_ids.append(len(out_ids))
    counts = np.array([len(a) for a in out_x], dtype=np.int64)
    off = pa.array(np.concatenate(([0], np.cumsum(counts))), pa.int32())
    return pa.table({
        "way_id": pa.array(np.arange(len(out_x)), pa.int64()),
        "layer_idx": pa.array(np.full(len(out_x), layer_idx), pa.int8()),
        "xs": pa.ListArray.from_arrays(off, pa.array(np.concatenate(out_x) if out_x else np.empty(0), pa.float64())),
        "ys": pa.ListArray.from_arrays(off, pa.array(np.concatenate(out_y) if out_y else np.empty(0), pa.float64())),
    })


def resample_segments_batch(t: pa.Table, step: float,
                            id_col: str = "seg_id",
                            cols: tuple[str, str, str, str] = (
                                "x1", "y1", "x2", "y2"),
                            quant: float = 1e7) -> pa.Table:
    """ST_Segmentize/densify analog: emit evenly spaced points along
    each segment so no span exceeds ``step`` — k = ceil(len/step)
    sub-segments, k+1 points at t = j/k (endpoints always included;
    zero-length segments emit their single point once).

    Fully vectorized ragged expansion (repeat + arange, no per-segment
    loop) and batch-local (each segment's points come from its own
    row), so the operator adds ZERO exchanges at any scale; callers
    that need global order sort afterwards. Coordinates are emitted
    both raw (float64, bit-identical to x1 + dx * (j/k)) and
    floor-quantized int64 for exact downstream aggregation — the
    parenthesization is mirrored by the q_resample_segments SQL.
    """
    c_x1, c_y1, c_x2, c_y2 = cols
    sid = t[id_col].to_numpy(zero_copy_only=False)
    x1 = t[c_x1].to_numpy(zero_copy_only=False)
    y1 = t[c_y1].to_numpy(zero_copy_only=False)
    x2 = t[c_x2].to_numpy(zero_copy_only=False)
    y2 = t[c_y2].to_numpy(zero_copy_only=False)
    dx = x2 - x1
    dy = y2 - y1
    seg_len = np.sqrt(dx * dx + dy * dy)
    k = np.maximum(np.ceil(seg_len / step), 1.0).astype(np.int64)
    npts = np.where(seg_len > 0, k + 1, 1)
    total = int(npts.sum())
    row = np.repeat(np.arange(sid.shape[0]), npts)
    starts = np.concatenate([[0], np.cumsum(npts)[:-1]])
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, npts)
    tpar = j / k[row].astype(np.float64)
    px = x1[row] + dx[row] * tpar
    py = y1[row] + dy[row] * tpar
    return pa.table({
        id_col: pa.array(sid[row]),
        "j": pa.array(j, pa.int64()),
        "px": pa.array(px, pa.float64()),
        "py": pa.array(py, pa.float64()),
        "pxq": pa.array(np.floor(px * quant).astype(np.int64)),
        "pyq": pa.array(np.floor(py * quant).astype(np.int64)),
    })


def way_segments_batch(batch: pa.Table) -> pa.Table:
    """Assembled ways -> one row per consecutive vertex pair
    (layer, x1, y1, x2, y2): the segment view that feeds clipping /
    densify / intersection stages. Vectorized mask over the flattened
    vertex arrays (the last vertex of each way emits no segment);
    <2-vertex ways emit nothing."""
    xs = _list_col(batch, "xs")
    ys = _list_col(batch, "ys")
    offsets = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    fx = xs.flatten().to_numpy(zero_copy_only=False)
    fy = ys.flatten().to_numpy(zero_copy_only=False)
    total = len(fx)
    is_last = np.zeros(total, dtype=bool)
    ends = offsets[1:] - 1
    is_last[ends[ends >= 0]] = True
    sel = np.flatnonzero(~is_last)
    counts = np.maximum(np.diff(offsets) - 1, 0)
    layer = layer_name_col(
        batch["layer_idx"].to_numpy(zero_copy_only=False))
    lay_seg = layer.take(pa.array(
        np.repeat(np.arange(len(batch), dtype=np.int64), counts)))
    return pa.table({
        "layer": lay_seg,
        "x1": pa.array(fx[sel], pa.float64()),
        "y1": pa.array(fy[sel], pa.float64()),
        "x2": pa.array(fx[sel + 1], pa.float64()),
        "y2": pa.array(fy[sel + 1], pa.float64()),
    })
