"""Line-delimited GeoJSON (GeoJSONL / newline-delimited features)
sink + source.

The reference exports shapefiles only (osm2shp.cc writes .shp/.dbf
via libshp); GeoJSONL is the interchange format modern consumers of
such exports expect (tippecanoe, ogr2ogr, web pipelines), so the
engine offers it beside the shapefile and parquet+WKB sinks (K1/P7
family).

Layout is the resumable-output pattern: each input block becomes ONE
``<md5-of-content>.geojsonl`` file under the output directory —
content-addressed names make re-runs idempotent (a rewritten block
overwrites its identical self, never duplicates), and a failed run
resumes by just re-running (no partial-file hazard: writes go to a
temp name, then an atomic rename).

Feature schema: ``{"type": "Feature", "properties": {"id": ...,
"layer": ...}, "geometry": {Point | LineString}}``. Coordinates are
emitted with Python ``repr`` (shortest round-trip), so a write->read
cycle reproduces every float64 bit-exactly — the q_geojson_roundtrip
oracle relies on this.

Serialization cost note: GeoJSON is a per-feature TEXT format — the
encoder is a per-row json.dumps loop by nature (like every GeoJSON
writer); it lives in sink tasks only, never inside a transform, and
parallelizes across blocks.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa


def _features_to_lines(ids, layers, names, kinds, xs_list,
                       ys_list) -> bytes:
    out = []
    for i, layer, name, kind, xs, ys in zip(ids, layers, names, kinds,
                                            xs_list, ys_list):
        if kind == "point":
            geom = {"type": "Point",
                    "coordinates": [float(xs[0]), float(ys[0])]}
        elif kind == "polygon":
            geom = {"type": "Polygon",
                    "coordinates": [[[float(x), float(y)]
                                     for x, y in zip(xs, ys)]]}
        else:
            geom = {"type": "LineString",
                    "coordinates": [[float(x), float(y)]
                                    for x, y in zip(xs, ys)]}
        props = {"id": int(i), "layer": str(layer)}
        if name is not None:
            props["name"] = str(name)
        out.append(json.dumps(
            {"type": "Feature", "properties": props, "geometry": geom},
            separators=(",", ":")))
    return ("\n".join(out) + "\n").encode() if out else b""


def write_geojsonl(ds, out_dir: str, id_col: str = "way_id",
                   layer_col: str = "layer",
                   wkb_col: str = "geometry_wkb",
                   return_paths: bool = False):
    """Write a feature Dataset (id, layer, WKB Point/LineString) as
    one content-addressed .geojsonl file per block. Returns the
    number of features written (a scalar reduce — no feature rows
    return to the driver), or, with ``return_paths=True``,
    ``(count, sorted shard paths)`` — the writer tasks emit their
    shard paths through the data plane so the read side needs no
    driver listing of worker-written files (one metadata row per
    block reaches the driver; ``out_dir`` must be a shared URI on a
    multi-node cluster, the same precondition as write_parquet)."""
    from ..functions import wkb as wkbmod

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        ids = (t[id_col].to_numpy(zero_copy_only=False)
               if id_col in t.schema.names
               else np.full(t.num_rows, -1, np.int64))
        layers = t[layer_col].to_pylist()
        names = (t["name"].to_pylist() if "name" in t.schema.names
                 else [None] * t.num_rows)
        kinds, xs_l, ys_l = wkbmod.decode_batch(t[wkb_col].to_pylist())
        payload = _features_to_lines(ids, layers, names, kinds, xs_l,
                                     ys_l)
        path = ""
        if payload:
            name = hashlib.md5(payload).hexdigest()[:20]
            final = os.path.join(out_dir, f"{name}.geojsonl")
            tmp = final + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, final)  # atomic: no partial files survive
            path = final
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "path": pa.array([path], pa.string())})

    out = ds.map_batches(write_block, batch_format="pyarrow")
    if not return_paths:
        return out.sum("n")
    rows = out.take_all()   # shard manifest — one row per block
    return (sum(r["n"] for r in rows),
            sorted(r["path"] for r in rows if r["path"]))


def read_geojsonl(path: str | list[str],
                  override_num_blocks: int | None = None):
    """Read a GeoJSONL directory (or single file, or an explicit shard
    list from ``write_geojsonl(..., return_paths=True)``) back into a
    feature Dataset (id, layer, geometry_wkb) — one parse task per
    file, so the read parallelizes like any file-sharded source.
    Passing the writer's own shard manifest avoids any directory
    listing of worker-written files."""
    import ray.data as rd

    from ..functions import wkb as wkbmod

    if isinstance(path, (list, tuple)):
        files = list(path)
    elif os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".geojsonl"))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no .geojsonl files under {path!r}")

    def parse(batch: pa.Table) -> pa.Table:
        ids, layers, names, blobs = [], [], [], []
        for fp in batch["path"].to_pylist():
            with open(fp, "rb") as f:
                for line in f:
                    if not line.strip():
                        continue
                    feat = json.loads(line)
                    geom = feat["geometry"]
                    props = feat["properties"]
                    ids.append(int(props["id"]))
                    layers.append(str(props["layer"]))
                    names.append(props.get("name"))
                    if geom["type"] == "Point":
                        x, y = geom["coordinates"]
                        blobs.append(wkbmod.encode_points(
                            np.array([x]), np.array([y]))[0])
                    elif geom["type"] == "LineString":
                        cs = np.asarray(geom["coordinates"], np.float64)
                        blobs.append(wkbmod.encode_linestrings(
                            np.array([0, len(cs)], np.int64),
                            cs[:, 0], cs[:, 1])[0])
                    elif geom["type"] == "Polygon":
                        cs = np.asarray(geom["coordinates"][0],
                                        np.float64)
                        blobs.append(wkbmod.encode_polygons(
                            np.array([0, len(cs)], np.int64),
                            cs[:, 0], cs[:, 1])[0])
                    else:
                        raise ValueError(
                            f"unsupported geometry {geom['type']!r}")
        return pa.table({"way_id": pa.array(ids, pa.int64()),
                         "layer": pa.array(layers, pa.string()),
                         "name": pa.array(names, pa.string()),
                         "geometry_wkb": pa.array(blobs, pa.binary())})

    paths = pa.table({"path": pa.array(files, pa.string())})
    return (rd.from_arrow(paths)
            .repartition(override_num_blocks or min(len(files), 64))
            .map_batches(parse, batch_format="pyarrow"))
