"""Minimal vectorized WKB (Well-Known Binary) codec.

The reference writes geometry to shapefiles verbatim — vertices exactly
as resolved, no ring closing, no validation
(/root/reference/osm/shapefile.cc:32-49; SURVEY.md §7.4.3). Our sink is
partitioned parquet with a WKB ``binary`` column, so this module
encodes/decodes the three geometry types the reference emits (POINT,
LINESTRING for SHPT_ARC, POLYGON single-ring for SHPT_POLYGON) with the
same verbatim-vertex contract. Little-endian, OGC geometry type codes.

Encoding is vectorized: one output buffer per batch, headers written
via fancy indexing, coordinates scattered with a single interleave —
no per-vertex Python loop.
"""

from __future__ import annotations

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3

_GEOM_CODE = {"point": WKB_POINT, "line": WKB_LINESTRING, "polygon": WKB_POLYGON}


def encode_points(x: np.ndarray, y: np.ndarray) -> list[bytes]:
    """N points -> N WKB blobs (21 bytes each). Fully vectorized."""
    n = len(x)
    buf = np.zeros((n, 21), dtype=np.uint8)
    buf[:, 0] = 1  # little endian
    buf[:, 1] = WKB_POINT
    buf[:, 5:13] = np.asarray(x, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.asarray(y, dtype="<f8").view(np.uint8).reshape(n, 8)
    return [b.tobytes() for b in buf]


def _encode_varlen(kind: int, offsets: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                   polygon: bool) -> list[bytes]:
    """Shared body for linestrings / single-ring polygons.

    offsets: int64 array of length n+1 delimiting each feature's
    vertices inside flat xs/ys. Vertices are emitted verbatim — a
    polygon ring is NOT auto-closed (conformance with shapefile.cc:41-49).
    """
    counts = np.diff(offsets)
    n = len(counts)
    header = 9 + (4 if polygon else 0)  # byteorder+type+[nrings]+npoints
    sizes = header + 16 * counts
    out_off = np.concatenate(([0], np.cumsum(sizes)))
    total = int(out_off[-1])
    buf = np.zeros(total, dtype=np.uint8)
    starts = out_off[:-1]
    buf[starts] = 1
    # geometry type int32 at offset 1 (value < 256 so one byte suffices)
    buf[starts + 1] = kind
    if polygon:
        buf[starts + 5] = 1  # nrings = 1
        cnt_pos = starts + 9
    else:
        cnt_pos = starts + 5
    cnt_le = counts.astype("<u4").view(np.uint8).reshape(n, 4)
    for b in range(4):
        buf[cnt_pos + b] = cnt_le[:, b]
    # interleave coordinates: (total_pts, 2) doubles
    inter = np.empty((len(xs), 2), dtype="<f8")
    inter[:, 0] = xs
    inter[:, 1] = ys
    coord_bytes = inter.view(np.uint8).reshape(-1)  # 16 bytes per vertex
    # destination byte index for each coordinate byte
    data_start = starts + header
    dst = (np.repeat(data_start, counts * 16)
           + _within_feature_arange(counts * 16))
    buf[dst] = coord_bytes
    return [buf[out_off[i]:out_off[i + 1]].tobytes() for i in range(n)]


def _within_feature_arange(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated, vectorized."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lengths)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - lengths, lengths)


def encode_linestrings(offsets: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> list[bytes]:
    return _encode_varlen(WKB_LINESTRING, offsets, xs, ys, polygon=False)


def encode_polygons(offsets: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> list[bytes]:
    """Single-ring polygons, ring written verbatim (not auto-closed)."""
    return _encode_varlen(WKB_POLYGON, offsets, xs, ys, polygon=True)


def decode(blob: bytes):
    """One WKB blob -> (geom_type_str, x_array, y_array). Scalar helper
    for tests / oracles, not a hot path."""
    if blob[0] != 1:
        raise ValueError("big-endian WKB not produced by this engine")
    kind = int(np.frombuffer(blob, dtype="<u4", count=1, offset=1)[0])
    if kind == WKB_POINT:
        x = np.frombuffer(blob, dtype="<f8", count=1, offset=5)
        y = np.frombuffer(blob, dtype="<f8", count=1, offset=13)
        return "point", x.copy(), y.copy()
    if kind == WKB_LINESTRING:
        npts = int(np.frombuffer(blob, dtype="<u4", count=1, offset=5)[0])
        coords = np.frombuffer(blob, dtype="<f8", count=2 * npts, offset=9).reshape(npts, 2)
        return "line", coords[:, 0].copy(), coords[:, 1].copy()
    if kind == WKB_POLYGON:
        nrings = int(np.frombuffer(blob, dtype="<u4", count=1, offset=5)[0])
        if nrings != 1:
            raise ValueError("multi-ring polygons not produced by this engine")
        npts = int(np.frombuffer(blob, dtype="<u4", count=1, offset=9)[0])
        coords = np.frombuffer(blob, dtype="<f8", count=2 * npts, offset=13).reshape(npts, 2)
        return "polygon", coords[:, 0].copy(), coords[:, 1].copy()
    raise ValueError(f"unsupported WKB geometry type {kind}")


def decode_batch(blobs) -> tuple[list[str], list[np.ndarray], list[np.ndarray]]:
    kinds, xs, ys = [], [], []
    for b in blobs:
        k, x, y = decode(b)
        kinds.append(k)
        xs.append(x)
        ys.append(y)
    return kinds, xs, ys
