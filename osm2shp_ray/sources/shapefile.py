"""Pure-Python ESRI shapefile sink (.shp/.shx/.dbf/.prj) — the K1-K4
output-parity surface.

The reference's observable output is one shapefile triple per layer
(/root/reference/osm/shapefile.cc:51-79): SHPT_POINT / SHPT_ARC /
SHPT_POLYGON geometry, a DBF with a single 64-char ``name`` field for
point layers (shapefile.cc:21-30 — the 64-char truncation is
reproduced here), and a hard-coded EPSG:4326 .prj (shapefile.cc:65-79).

The engine's DISTRIBUTED sink is partitioned parquet+WKB (resumable,
parallel); this writer is the drop-in export for consumers of the
reference's files. Shapefiles are single-file by design, so
``export_layer`` streams one layer's Dataset through an appender —
bounded memory, one sequential writer per layer, exactly the
reference's per-layer sink cardinality.

Format layout from the public ESRI Shapefile Technical Description
(July 1998) and the dBASE III header layout.
"""

from __future__ import annotations

import os
import struct

import numpy as np

SHPT_POINT = 1
SHPT_ARC = 3
SHPT_POLYGON = 5

WGS84_WKT = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)

NAME_FIELD_LEN = 64  # shapefile.cc:23: DBF name field width


class ShapefileWriter:
    """STREAMING appender for one layer (one .shp/.shx/.dbf/.prj set):
    records go to disk as they arrive; only the (tiny) .shx offset
    table and the running bbox stay in memory. Headers carry
    placeholders that close() backfills via seek (file length, bbox,
    DBF record count) — so memory is O(1) in layer size.

    Usage: w = ShapefileWriter(base, SHPT_ARC, with_name=False);
    w.add(xs, ys[, name]) per feature; w.close().
    """

    def __init__(self, base: str, shp_type: int, with_name: bool = False):
        self.base = base
        self.shp_type = shp_type
        self.with_name = with_name
        self._n = 0
        self._lengths: list[int] = []   # content words per record (shx)
        self._bbox = [np.inf, np.inf, -np.inf, -np.inf]
        self._shp = open(base + ".shp", "wb")
        self._shp.write(self._header(0))
        self._dbf = open(base + ".dbf", "wb")
        self._fields = ([(b"name", b"C", NAME_FIELD_LEN)] if with_name
                        else [(b"id", b"N", 10)])  # DBF needs >=1 field
        self._rec_len = 1 + sum(f[2] for f in self._fields)
        self._dbf.write(struct.pack("<4Bi2H20x", 3, 99, 1, 1, 0,
                                    32 + 32 * len(self._fields) + 1,
                                    self._rec_len))
        for fname, ftype, flen in self._fields:
            self._dbf.write(struct.pack("<11s c 4x B B 14x",
                                        fname, ftype, flen, 0))
        self._dbf.write(b"\x0d")

    def add(self, xs: np.ndarray, ys: np.ndarray, name: str | None = None):
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        self._bbox[0] = min(self._bbox[0], xs.min())
        self._bbox[1] = min(self._bbox[1], ys.min())
        self._bbox[2] = max(self._bbox[2], xs.max())
        self._bbox[3] = max(self._bbox[3], ys.max())
        if self.shp_type == SHPT_POINT:
            content = struct.pack("<i2d", SHPT_POINT, xs[0], ys[0])
        else:
            pts = np.empty((len(xs), 2), dtype="<f8")
            pts[:, 0], pts[:, 1] = xs, ys
            content = struct.pack(
                "<i4d2i i", self.shp_type, xs.min(), ys.min(), xs.max(),
                ys.max(), 1, len(xs), 0) + pts.tobytes()
        self._n += 1
        self._lengths.append(len(content) // 2)
        self._shp.write(struct.pack(">ii", self._n, len(content) // 2))
        self._shp.write(content)
        if self.with_name:
            # the reference truncates names to the field width
            # (shapefile.cc:23-30)
            val = (name or "")[:NAME_FIELD_LEN].encode(
                "utf-8", "replace")[:NAME_FIELD_LEN]
            self._dbf.write(b" " + val.ljust(NAME_FIELD_LEN, b" "))
        else:
            self._dbf.write(b" " + str(self._n).rjust(10).encode())

    def close(self) -> None:
        total_words = 50 + sum(4 + ln for ln in self._lengths)
        self._shp.seek(0)
        self._shp.write(self._header(total_words))
        self._shp.close()
        self._dbf.write(b"\x1a")
        self._dbf.seek(4)
        self._dbf.write(struct.pack("<i", self._n))
        self._dbf.close()
        with open(self.base + ".shx", "wb") as f:
            f.write(self._header(50 + 4 * self._n))
            pos_words = 50
            for ln in self._lengths:
                f.write(struct.pack(">ii", pos_words, ln))
                pos_words += 4 + ln
        with open(self.base + ".prj", "w") as f:
            f.write(WGS84_WKT)

    def _header(self, total_words: int) -> bytes:
        bbox = self._bbox if self._n else [0.0, 0.0, 0.0, 0.0]
        return (struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, total_words)
                + struct.pack("<ii", 1000, self.shp_type)
                + struct.pack("<4d", *bbox) + struct.pack("<4d", 0, 0, 0, 0))


def export_layer(ds, base: str, shp_type: int, with_name: bool = False,
                 name_col: str = "name") -> int:
    """Stream one layer Dataset (geometry_wkb [+ name]) into a
    shapefile triple; returns the feature count."""
    from ..functions.wkb import decode_batch
    w = ShapefileWriter(base, shp_type, with_name=with_name)
    n = 0
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        _kinds, xs_l, ys_l = decode_batch(batch["geometry_wkb"].to_pylist())
        names = (batch[name_col].to_pylist() if with_name
                 and name_col in batch.schema.names else [None] * len(xs_l))
        for xs, ys, nm in zip(xs_l, ys_l, names):
            w.add(xs, ys, nm)
            n += 1
    w.close()
    return n


def export_shapefiles(points_ds, ways_ds, out_dir: str) -> dict[str, int]:
    """All layers -> shapefile triples under ``out_dir`` (the K4 output
    directory layout, one sink per layer like handler.cc:34-43).
    Returns per-layer feature counts."""
    from .. import config
    os.makedirs(out_dir, exist_ok=True)
    counts: dict[str, int] = {}
    type_of = {config.POINT: SHPT_POINT, config.LINE: SHPT_ARC,
               config.POLYGON: SHPT_POLYGON}
    for layer, shape in config.SHAPES.items():
        src = points_ds if shape == config.POINT else ways_ds
        sub = src.filter(expr=f"layer == '{layer}'")
        counts[layer] = export_layer(
            sub, os.path.join(out_dir, layer), type_of[shape],
            with_name=(shape == config.POINT))
    return counts


# ------------------------------------------------------------- reader
# (round-trip verification; also lets tests compare against WKB)

def read_shp(base: str) -> tuple[int, list[np.ndarray], list[np.ndarray]]:
    """.shp -> (shape_type, xs per feature, ys per feature)."""
    with open(base + ".shp", "rb") as f:
        data = f.read()
    (shp_type,) = struct.unpack_from("<i", data, 32)
    pos = 100
    xs_l, ys_l = [], []
    while pos < len(data):
        (_rec, clen) = struct.unpack_from(">ii", data, pos)
        pos += 8
        if shp_type == SHPT_POINT:
            _t, x, y = struct.unpack_from("<i2d", data, pos)
            xs_l.append(np.array([x]))
            ys_l.append(np.array([y]))
        else:
            _t, _x0, _y0, _x1, _y1, _np_, npts = struct.unpack_from(
                "<i4d2i", data, pos)
            arr = np.frombuffer(data, dtype="<f8", count=npts * 2,
                                offset=pos + 4 + 32 + 8 + 4)
            pts = arr.reshape(npts, 2)
            xs_l.append(pts[:, 0].copy())
            ys_l.append(pts[:, 1].copy())
        pos += clen * 2
    return shp_type, xs_l, ys_l


def read_dbf_names(base: str) -> list[str]:
    with open(base + ".dbf", "rb") as f:
        data = f.read()
    n, hdr_len, rec_len = struct.unpack_from("<iHH", data, 4)
    out = []
    for i in range(n):
        rec = data[hdr_len + i * rec_len:hdr_len + (i + 1) * rec_len]
        out.append(rec[1:].decode("utf-8", "replace").rstrip())
    return out
