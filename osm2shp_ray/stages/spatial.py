"""Spatial operators mandated by the north_rule (SURVEY.md §2.8):
cell encoding, point-in-polygon tile assignment, kNN via k-ring
expansion, raster<->vector tile assignment with salted-key skew
mitigation, and phash-exact dedup.

These have no reference counterpart (the reference's only spatial
notion is the per-layer shapefile sink, /root/reference/osm/handler.cc:
34-43); they are designed Ray-Data-first per BASELINE.json.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import config
from ..functions import cells as cellmod
from ..functions.hashing import bucket_of, splitmix64
from ..functions.pip import PreparedPolygons
from .util import coalesced
from ..functions.wkb import decode_batch


class CellEncoder:
    """Actor-pool stage: append quadcell (H3-analog) and Hilbert-cell
    (S2-analog) ids. State (resolution constants, any lookup tables) is
    built once per actor in __init__ — the pattern the north_star
    prescribes for compiled H3/S2 index state; our from-scratch index
    is pure numpy so the state is just configuration."""

    def __init__(self, res: int = config.H3_ANALOG_RES,
                 s2_level: int = config.S2_ANALOG_LEVEL,
                 lon_col: str = "x", lat_col: str = "y"):
        self.res = res
        self.s2_level = s2_level
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        h3c = cellmod.latlng_to_cell(lat, lon, self.res).astype(np.int64)
        s2c = cellmod.latlng_to_s2ish(lat, lon, self.s2_level).astype(np.int64)
        return (batch
                .append_column("h3_cell", pa.array(h3c, pa.int64()))
                .append_column("s2_cell", pa.array(s2c, pa.int64())))


def encode_cells(ds, res: int = config.H3_ANALOG_RES,
                 s2_level: int = config.S2_ANALOG_LEVEL,
                 lon_col: str = "x", lat_col: str = "y",
                 concurrency=None, batch_size: int = 65536):
    """Cell encoding is pure config + numpy — stateless, so it runs as
    elastic tasks (an INSTANCE of CellEncoder used as a plain
    function), not an actor pool: fixed pools reserving CPUs alongside
    other pools can starve the read stage on small hosts. Pass
    ``concurrency`` only to force an actor pool."""
    if concurrency is not None:
        return ds.map_batches(
            CellEncoder, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency,
            fn_constructor_kwargs=dict(res=res, s2_level=s2_level,
                                       lon_col=lon_col, lat_col=lat_col))
    fn = CellEncoder(res=res, s2_level=s2_level, lon_col=lon_col, lat_col=lat_col)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


# ------------------------------------------------------ PIP tile assign

def prepare_tiles(tiles_table: pa.Table) -> PreparedPolygons:
    """Tile polygon table (tile_id, geometry_wkb) -> prepared bundle.
    Call once on the driver; ship via ray.put (broadcast join side)."""
    kinds, xs, ys = decode_batch(tiles_table["geometry_wkb"].to_pylist())
    return PreparedPolygons(tiles_table["tile_id"].to_pylist(), xs, ys)


class TileAssigner:
    """Broadcast PIP stage: the driver ray.put()s the PreparedPolygons
    once; each worker resolves the ref lazily on first batch and caches
    it (per-worker when used as an instance-function, per-actor when
    used as an actor pool — the classic broadcast join either way,
    SURVEY.md §2.4). __call__ runs the vectorized ray-crossing test."""

    def __init__(self, prepared_ref, mode: str = "first",
                 lon_col: str = "x", lat_col: str = "y"):
        self._ref = prepared_ref
        self.prep = None
        self.tile_ids = None
        self.mode = mode
        self.lon_col = lon_col
        self.lat_col = lat_col

    def _resolve(self):
        if self.prep is None:
            if isinstance(self._ref, PreparedPolygons):
                self.prep = self._ref
            else:
                import ray
                self.prep = ray.get(self._ref)
            self.tile_ids = np.asarray(self.prep.tile_ids + [""], dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._resolve()
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        if self.mode == "first":
            idx = self.prep.assign_first(lon, lat)
            tid = self.tile_ids[np.where(idx < 0, len(self.tile_ids) - 1, idx)]
            col = pa.array(tid, pa.string())
            col = pc.if_else(pa.array(idx >= 0), col, pa.scalar(None, pa.string()))
            return batch.append_column("tile_id", col)
        # mode == "all": explode — one output row per containing tile
        pts, polys = self.prep.assign_all(lon, lat)
        sub = batch.take(pa.array(pts))
        return sub.append_column(
            "tile_id", pa.array(self.tile_ids[polys], pa.string()))


def assign_tiles(ds, prepared_or_ref, mode: str = "first",
                 lon_col: str = "x", lat_col: str = "y",
                 concurrency=None, batch_size: int = 65536,
                 num_cpus: float = 1):
    """Default: instance-as-function elastic tasks; the broadcast
    polygons resolve once per worker (lazy ray.get, cached). Pass
    ``concurrency`` to force an actor pool instead — measured on this
    bench, elastic tasks beat both fixed pools (read starvation) and
    autoscaling pools (slow ramp)."""
    if concurrency is not None:
        return ds.map_batches(
            TileAssigner, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=num_cpus,
            fn_constructor_kwargs=dict(prepared_ref=prepared_or_ref, mode=mode,
                                       lon_col=lon_col, lat_col=lat_col))
    fn = TileAssigner(prepared_ref=prepared_or_ref, mode=mode,
                      lon_col=lon_col, lat_col=lat_col)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


# ------------------------------------------------------------------ kNN

def knn(ds, query_lon: float, query_lat: float, k: int,
        ring: int | None = None, res: int = config.H3_ANALOG_RES,
        lon_col: str = "x", lat_col: str = "y", id_col: str | None = None):
    """k nearest rows to a query point.

    Scale path: when ``ring`` is given, candidates are pre-filtered to
    the H3-analog grid_disk(query_cell, ring) — the k-ring expansion of
    the north_star — so only candidate cells' rows are scored; the
    caller widens ``ring`` if fewer than k rows return. Each batch then
    emits only its local top-k (per-partition max-heap == vectorized
    argpartition), and the global answer is the tiny sort+limit of
    those partials. Distances are squared-degree euclidean (consistent
    tie-breaking via id_col when given).
    """
    qcell = cellmod.latlng_to_cell(np.array([query_lat]), np.array([query_lon]), res)[0]
    cand_cells = cellmod.grid_disk(int(qcell), ring).astype(np.int64) if ring is not None else None

    def local_topk(batch: pa.Table) -> pa.Table:
        if cand_cells is not None and "h3_cell" in batch.schema.names:
            mask = pc.is_in(batch["h3_cell"], value_set=pa.array(cand_cells, pa.int64()))
            batch = batch.filter(mask)
        if batch.num_rows == 0:
            return batch.append_column("dist", pa.array([], pa.float64()))
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        d = (lon - query_lon) ** 2 + (lat - query_lat) ** 2
        batch = batch.append_column("dist", pa.array(d, pa.float64()))
        if batch.num_rows > k:
            keep = np.argpartition(d, k)[:k]
            batch = batch.take(pa.array(np.sort(keep)))
        return batch

    from .util import topk as ds_topk
    out = ds.map_batches(local_topk, batch_format="pyarrow")
    sort_keys = ["dist"] + ([id_col] if id_col else [])
    return ds_topk(out, sort_keys, [False] * len(sort_keys), k)


# ------------------------------------- raster<->vector + salted reduce

def tile_histogram(ds, zoom: int, salt: int = config.DEFAULT_SALT,
                   cell_col: str = "h3_cell"):
    """Rows-per-raster-tile histogram with explicit skew mitigation:
    batch-local partial counts keyed by (tile, salt) -> small shuffle ->
    final unsalted reduce. The salt splits a hot tile's stream across
    ``salt`` reducers (SURVEY.md §4 'Skew')."""
    from ray.data.aggregate import Sum

    sv = max(1, salt)

    def partial(batch: pa.Table) -> pa.Table:
        cell = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        tile = cellmod.cell_to_parent(cell, zoom).astype(np.int64)
        s = (splitmix64(cell) % np.uint64(sv)).astype(np.int64)
        # tile and salt stay SEPARATE columns: tile ids carry res<<58 in
        # the high bits, so any tile*salt combined key overflows int64
        # and silently splits/merges tiles. Local combine via a dense
        # factorized index (never the raw tile value).
        utile, inv = np.unique(tile, return_inverse=True)
        ck = inv.astype(np.int64) * sv + s
        counts = np.bincount(ck, minlength=len(utile) * sv)
        nz = counts > 0
        return pa.table({
            "tile": pa.array(np.repeat(utile, sv)[nz], pa.int64()),
            "__s": pa.array(np.tile(np.arange(sv, dtype=np.int64), len(utile))[nz],
                            pa.int64()),
            "partial_n": pa.array(counts[nz], pa.int64()),
        })

    salted = (coalesced(ds.map_batches(partial, batch_format="pyarrow"))
                .groupby(["tile", "__s"])
                .aggregate(Sum("partial_n", alias_name="n_salted")))

    def unsalt(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile": batch["tile"],
            "partial_n": batch["n_salted"],
        })

    return (salted.map_batches(unsalt, batch_format="pyarrow")
                  .groupby("tile").aggregate(Sum("partial_n", alias_name="n")))


def cell_pyramid(ds, levels, cell_col: str = "h3_cell"):
    """Multi-resolution tile-pyramid rollup in ONE pass: per batch,
    every row's finest cell is coarsened to each requested resolution
    (``cell_to_parent`` bit shifts) and the batch emits one partial
    count row per DISTINCT (level, cell) — so the exchange carries
    ~levels x distinct-cells-per-batch rows, never the row stream —
    then a single groupby sums partials. The packed cell id embeds its
    resolution in the high bits, so one int64 group key covers all
    levels at once (no two-key groupby, no per-level pass: the classic
    z/x/y pyramid build that would otherwise re-aggregate the corpus
    once per zoom).

    Output: (res: int64, cell: int64, n: int64)."""
    from ray.data.aggregate import Sum

    lv = sorted(set(int(x) for x in levels), reverse=True)
    if not lv:
        raise ValueError("cell_pyramid: need at least one level")

    def partial(batch: pa.Table) -> pa.Table:
        cell = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        outs, cnts = [], []
        for r in lv:
            p = cellmod.cell_to_parent(cell, r).astype(np.int64)
            u, c = np.unique(p, return_counts=True)
            outs.append(u)
            cnts.append(c.astype(np.int64))
        return pa.table({
            "cell": pa.array(np.concatenate(outs), pa.int64()),
            "partial_n": pa.array(np.concatenate(cnts), pa.int64())})

    agg = (coalesced(ds.map_batches(partial, batch_format="pyarrow"))
           .groupby("cell").aggregate(Sum("partial_n", alias_name="n")))

    def add_res(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        res = cellmod.cell_res(cell).astype(np.int64)
        return pa.table({"res": pa.array(res, pa.int64()),
                         "cell": t["cell"], "n": t["n"]})

    return agg.map_batches(add_res, batch_format="pyarrow")


def raster_tile_ids(ds, zoom: int, cell_col: str = "h3_cell",
                    out_col: str = "raster_tile"):
    """Append a z/x/y raster tile id string per row (vector feature ->
    raster tile assignment)."""
    def fn(batch: pa.Table) -> pa.Table:
        cell = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        parent = cellmod.cell_to_parent(cell, zoom)
        x, y = cellmod.cell_xy(parent)
        ids = np.char.add(np.char.add(np.char.add(f"{zoom}/",
                          x.astype(str)), "/"), y.astype(str))
        return batch.append_column(out_col, pa.array(ids.tolist(), pa.string()))
    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------------------ exact dedup

def dedup_exact(ds, key_col: str = "phash", order_col: str = "image_id",
                n_buckets: int = config.DEFAULT_JOIN_BUCKETS):
    """Exact dedup: keep the row with the smallest ``order_col`` per
    ``key_col`` value (deterministic winner). Hash-partitioned by a
    bucket of the key so the shuffle key is dense; the per-bucket
    keep-first is a vectorized pandas groupby-idxmin, not per-group
    Python."""
    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        if keys.dtype.kind in ("i", "u"):
            b = bucket_of(keys, n_buckets)
        else:  # string keys: vectorized polars hash -> bucket
            import polars as pl
            col = t[key_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            h = pl.from_arrow(col).hash(seed=17).to_numpy().astype(np.uint64)
            b = (h % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        idx = df.groupby(key_col, sort=False)[order_col].idxmin()
        return df.loc[idx.sort_values()].drop(columns="__bucket")

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
              .groupby("__bucket")
              .map_groups(keep_first, batch_format="pandas"))


# ----------------------------------- partitioned PIP (large tile side)

def assign_tiles_partitioned(points_ds, tiles_ds, res: int = 7,
                             lon_col: str = "x", lat_col: str = "y",
                             max_cover: int = 4096):
    """Point-in-polygon when the polygon side is TOO LARGE to broadcast
    (the scale path; `assign_tiles` is the broadcast path).

    Grid-partitioned spatial join: each polygon is exploded to the
    res-``res`` cells covering its bbox, each point to its single cell,
    and a groupby(cell) co-groups them; the exact ray-crossing test
    runs inside the group against only that cell's candidate polygons.
    First-match order is tile_id-lexicographic (deterministic across
    partitions — callers of the broadcast path get the same order by
    sorting their tile table by tile_id).

    ``max_cover`` guards degenerate polygons whose bbox covers more
    than that many cells (logged and skipped, not silent); lower
    ``res`` if legitimate polygons trip it.
    Output: points that fall in >=1 polygon, with a ``tile_id`` column.
    """
    from ..functions.wkb import decode_batch

    def explode_tiles(t: pa.Table) -> pa.Table:
        # one batched corner-cell computation for ALL polygons, then a
        # flat arange/repeat meshgrid fill — no per-polygon kernel calls
        n = t.num_rows
        _k, xs, ys = decode_batch(t["geometry_wkb"].to_pylist())
        min_x = np.array([v.min() for v in xs]) if n else np.empty(0)
        max_x = np.array([v.max() for v in xs]) if n else np.empty(0)
        min_y = np.array([v.min() for v in ys]) if n else np.empty(0)
        max_y = np.array([v.max() for v in ys]) if n else np.empty(0)
        c0 = cellmod.latlng_to_cell(min_y, min_x, res)
        c1 = cellmod.latlng_to_cell(max_y, max_x, res)
        x0, y0 = cellmod.cell_xy(c0)
        x1, y1 = cellmod.cell_xy(c1)
        gx0 = np.minimum(x0, x1).astype(np.int64)
        gx1 = np.maximum(x0, x1).astype(np.int64)
        gy0 = np.minimum(y0, y1).astype(np.int64)
        gy1 = np.maximum(y0, y1).astype(np.int64)
        nx = gx1 - gx0 + 1
        ny = gy1 - gy0 + 1
        ncells = nx * ny
        keep = ncells <= max_cover
        skipped = int(n - keep.sum())
        if skipped:
            print(f"assign_tiles_partitioned: skipped {skipped} polygons "
                  f"covering > {max_cover} cells at res {res}")
        poly = np.flatnonzero(keep)
        counts = ncells[poly]
        tot = int(counts.sum())
        rep = np.repeat(np.arange(len(poly)), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1])) if len(poly) else np.empty(0, np.int64)
        local = np.arange(tot, dtype=np.int64) - np.repeat(starts, counts)
        src = poly[rep]
        cx = (gx0[src] + local % nx[src]).astype(np.uint64)
        cy = (gy0[src] + local // nx[src]).astype(np.uint64)
        cells = ((np.uint64(res) << np.uint64(58))
                 | (cy << np.uint64(29)) | cx).astype(np.int64)
        take = pa.array(src, pa.int64())
        return pa.table({
            "__cell": pa.array(cells, pa.int64()),
            "tile_id": t["tile_id"].take(take),
            "geometry_wkb": t["geometry_wkb"].take(take),
            "__side": pa.array(np.ones(tot, np.int8)),
        })

    pt_schema = points_ds.schema()
    pt_names = list(pt_schema.names)
    pt_types = dict(zip(pt_schema.names, pt_schema.types))

    def prep_points(t: pa.Table) -> pa.Table:
        lon = t[lon_col].to_numpy(zero_copy_only=False)
        lat = t[lat_col].to_numpy(zero_copy_only=False)
        cell = cellmod.latlng_to_cell(lat, lon, res).astype(np.int64)
        cols = {"__cell": pa.array(cell, pa.int64()),
                "tile_id": pa.nulls(t.num_rows, pa.string()),
                "geometry_wkb": pa.nulls(t.num_rows, pa.binary()),
                "__side": pa.array(np.zeros(t.num_rows, np.int8))}
        for c in pt_names:
            cols[c] = t[c]
        return pa.table(cols)

    def tiles_pad(t: pa.Table) -> pa.Table:
        for c in pt_names:
            t = t.append_column(c, pa.nulls(t.num_rows, pt_types[c]))
        return t

    unioned = (points_ds.map_batches(prep_points, batch_format="pyarrow")
               .union(tiles_ds.map_batches(explode_tiles, batch_format="pyarrow")
                      .map_batches(tiles_pad, batch_format="pyarrow")))

    def pip_group(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        polys = t.filter(pa.array(side == 1))
        pts = t.filter(pa.array(side == 0))
        empty = pts.slice(0, 0).select(pt_names).append_column(
            "tile_id", pa.array([], pa.string()))
        if polys.num_rows == 0 or pts.num_rows == 0:
            return empty
        # dedupe + order polygons by tile_id for deterministic first-match
        pids = np.asarray(polys["tile_id"].to_pylist(), dtype=object)
        order = np.argsort(pids, kind="stable")
        seen, keep = set(), []
        for j in order:
            if pids[j] not in seen:
                seen.add(pids[j])
                keep.append(j)
        polys = polys.take(pa.array(keep))
        from ..functions.pip import PreparedPolygons
        _k, xs, ys = decode_batch(polys["geometry_wkb"].to_pylist())
        prep = PreparedPolygons(polys["tile_id"].to_pylist(), xs, ys)
        lon = pts[lon_col].to_numpy(zero_copy_only=False)
        lat = pts[lat_col].to_numpy(zero_copy_only=False)
        idx = prep.assign_first(lon, lat)
        hit = idx >= 0
        out = pts.filter(pa.array(hit)).select(pt_names)
        tid = np.asarray(prep.tile_ids, dtype=object)[idx[hit]]
        return out.append_column("tile_id", pa.array(tid.tolist(), pa.string()))

    return (coalesced(unioned).groupby("__cell")
            .map_groups(pip_group, batch_format="pyarrow"))


def write_cell_partitioned(ds, path: str, res: int = 6,
                           lon_col: str = "x", lat_col: str = "y"):
    """Write ``ds`` as parquet partitioned by a coarse quad-cell column
    — the storage layout that makes spatial queries prunable AT THE
    READ (kNN / PIP touch only candidate-cell partitions instead of
    scanning everything). Returns the partition column name."""
    col = f"cell{res}"

    def add_cell(t: pa.Table) -> pa.Table:
        lon = t[lon_col].to_numpy(zero_copy_only=False)
        lat = t[lat_col].to_numpy(zero_copy_only=False)
        c = cellmod.latlng_to_cell(lat, lon, res).astype(np.int64)
        return t.append_column(col, pa.array(c, pa.int64()))

    ds.map_batches(add_cell, batch_format="pyarrow").write_parquet(
        path, partition_cols=[col])
    return col


def knn_partitioned(path: str, query_lon: float, query_lat: float, k: int,
                    res: int = 6, max_ring: int = 16,
                    lon_col: str = "x", lat_col: str = "y",
                    id_col: str | None = None):
    """Exact kNN over a cell-partitioned parquet dataset (written by
    write_cell_partitioned): each k-ring expansion READS ONLY the
    candidate cells' partitions (parquet partition filter — hive
    pruning), so cost scales with the k-ring's data, not the table.
    Same auto-expanding exactness logic as knn_auto: grow the disk
    until >= k candidates, then cover the kth distance; falls back to
    the full dataset only past ``max_ring``."""
    import math

    import ray.data as rd

    col = f"cell{res}"
    qcell = cellmod.latlng_to_cell(np.array([query_lat]),
                                   np.array([query_lon]), res)[0]
    cell_h = 180.0 / (1 << res)

    def read_ring(ring: int | None):
        if ring is None:
            return rd.read_parquet(path)
        cand = cellmod.grid_disk(int(qcell), ring).astype(np.int64)
        # explicit partition-directory pruning: only candidate cells'
        # directories are even LISTED, let alone read (arrow filter
        # pushdown on hive columns is unreliable in this Ray version)
        import glob as _glob
        files = [f for c in cand
                 for f in _glob.glob(os.path.join(path, f"{col}={c}", "*.parquet"))]
        if not files:
            return None
        return rd.read_parquet(files)

    ring = 1
    while True:
        cand_ds = read_ring(ring)
        rows = (knn(cand_ds, query_lon, query_lat, k, lon_col=lon_col,
                    lat_col=lat_col, id_col=id_col).take(k)
                if cand_ds is not None else [])
        if len(rows) >= k:
            kth = math.sqrt(rows[-1]["dist"])
            need = int(kth / cell_h) + 2
            if need <= ring:
                return rows
            if need > max_ring:
                return knn(read_ring(None), query_lon, query_lat, k,
                           lon_col=lon_col, lat_col=lat_col,
                           id_col=id_col).take(k)
            cover = read_ring(need)
            return knn(cover if cover is not None else read_ring(None),
                       query_lon, query_lat, k,
                       lon_col=lon_col, lat_col=lat_col, id_col=id_col).take(k)
        if ring >= max_ring:
            return knn(read_ring(None), query_lon, query_lat, k,
                       lon_col=lon_col, lat_col=lat_col, id_col=id_col).take(k)
        ring *= 4


def knn_auto(ds, query_lon: float, query_lat: float, k: int,
             res: int = config.H3_ANALOG_RES,
             lon_col: str = "x", lat_col: str = "y",
             id_col: str | None = None, max_ring: int = 64):
    """Exact kNN via auto-expanding k-ring: grow the grid_disk until it
    holds >= k candidates, then expand once more to the ring that
    provably covers the kth candidate's distance (a nearer point cannot
    hide outside that ring), and take the exact top-k.

    Each expansion is one filtered streaming pass (candidate cells are
    broadcast via the is_in value set); passes is 2-4 for any
    non-degenerate density. Falls back to a full-scan knn at
    ``max_ring``.

    WHEN TO USE: on cell-partitioned storage (output partitioned by a
    coarse cell, so the candidate-cell filter prunes at the read) each
    pass touches only the disk's partitions and this wins by orders of
    magnitude at 10^12 rows. On small unpartitioned data a single
    full-scan `knn()` is faster (measured: 0.7s vs 5.4s at 600k rows)
    because every pass re-scans everything."""
    import math

    qcell = cellmod.latlng_to_cell(np.array([query_lat]),
                                   np.array([query_lon]), res)[0]
    cell_h = 180.0 / (1 << res)          # degrees per cell row
    ring = 1
    while True:
        cand = knn(ds, query_lon, query_lat, k, ring=ring, res=res,
                   lon_col=lon_col, lat_col=lat_col, id_col=id_col)
        rows = cand.take(k)
        if len(rows) >= k:
            kth = math.sqrt(rows[-1]["dist"])
            # ring guaranteeing coverage of radius kth (lat degrees are
            # the tighter bound; lon cells only get wider off-equator)
            need = int(kth / cell_h) + 2
            if need <= ring:
                return cand
            if need > max_ring:
                # the coverage ring cannot be clamped without losing the
                # exactness guarantee (the kth candidate may sit at a
                # Chebyshev-disk corner) -> full scan, same as the <k path
                return knn(ds, query_lon, query_lat, k, ring=None, res=res,
                           lon_col=lon_col, lat_col=lat_col, id_col=id_col)
            final = knn(ds, query_lon, query_lat, k, ring=need, res=res,
                        lon_col=lon_col, lat_col=lat_col, id_col=id_col)
            return final
        if ring >= max_ring:
            return knn(ds, query_lon, query_lat, k, ring=None, res=res,
                       lon_col=lon_col, lat_col=lat_col, id_col=id_col)
        ring *= 4


def distance_join(left_ds, right_ds, radius: float,
                  left_id: str = "left_id", right_id: str = "right_id",
                  lon_col: str = "x", lat_col: str = "y",
                  res: int | None = None, ndigits: int = 6,
                  pair_block: int = 1 << 22):
    """Within-radius spatial join between two point sets (grid join).

    Returns one row per (left, right) pair with planar squared-degree
    distance <= radius**2, columns ``(left_id, right_id, dist2)``.

    Scale design (the only one that works at 10^12 rows): pick the
    finest quadcell resolution whose cell edge is >= ``radius``; key
    every LEFT point by its own cell, replicate every RIGHT point to
    its 3x3 cell neighborhood (factor <= 9 on the side the caller
    should make the smaller one), and co-group with ONE shuffle. Any
    pair within ``radius`` then lands in exactly one group — the left
    point's cell — because |cell delta| <= 1 on each axis when the
    cell edge >= radius. In-group distances are a blocked vectorized
    matrix (<= ``pair_block`` float ops resident per block), so a hot
    cell degrades to bounded-memory brute force rather than OOM.
    Planar semantics (no antimeridian wrap), matching knn()/q_knn.

    Reference analog: the reference has no spatial join at all — its
    only "join" is the node-ref sqlite lookup
    (/root/reference/osm/point_database.cc:63-71); this operator is a
    north_rule §2.8 addition designed Ray-Data-first.
    """
    if not (radius > 0):
        raise ValueError(f"distance_join: radius must be > 0, got {radius}")
    if res is None:
        # finest res with lat cell edge (180/2^res) >= radius; lon edge
        # is 2x that, so both axes are covered by the 3x3 neighborhood
        res = int(np.floor(np.log2(180.0 / radius))) if radius < 180.0 else 0
        res = max(0, min(28, res))
    elif 180.0 / (1 << res) < radius:
        raise ValueError(f"distance_join: cell edge at res {res} is "
                         f"smaller than radius {radius}; pairs would be missed")
    r2 = radius * radius
    n_grid = np.int64(1) << np.int64(res)
    lid_type = dict(zip(left_ds.schema().names, left_ds.schema().types))[left_id]
    rid_type = dict(zip(right_ds.schema().names, right_ds.schema().types))[right_id]

    def prep_left(t: pa.Table) -> pa.Table:
        lon = t[lon_col].to_numpy(zero_copy_only=False)
        lat = t[lat_col].to_numpy(zero_copy_only=False)
        cell = cellmod.latlng_to_cell(lat, lon, res).astype(np.int64)
        return pa.table({
            "__dcell": pa.array(cell, pa.int64()),
            "__side": pa.array(np.zeros(t.num_rows, np.int8)),
            "__lid": t[left_id],
            "__rid": pa.nulls(t.num_rows, rid_type),
            "__px": pa.array(lon, pa.float64()),
            "__py": pa.array(lat, pa.float64()),
        })

    def prep_right(t: pa.Table) -> pa.Table:
        lon = t[lon_col].to_numpy(zero_copy_only=False)
        lat = t[lat_col].to_numpy(zero_copy_only=False)
        cell = cellmod.latlng_to_cell(lat, lon, res)
        cx, cy = cellmod.cell_xy(cell)
        n = t.num_rows
        # 9 neighbor offsets, vectorized: out-of-grid neighbors dropped
        # (planar grid, no wrap — consistent with the distance metric)
        dx = np.repeat(np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1]), n)
        dy = np.repeat(np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1]), n)
        nx = np.tile(cx, 9) + dx
        ny = np.tile(cy, 9) + dy
        ok = (nx >= 0) & (nx < n_grid) & (ny >= 0) & (ny < n_grid)
        src = np.tile(np.arange(n, dtype=np.int64), 9)[ok]
        ncell = ((np.uint64(res) << np.uint64(58))
                 | (ny[ok].astype(np.uint64) << np.uint64(29))
                 | nx[ok].astype(np.uint64)).astype(np.int64)
        take = pa.array(src, pa.int64())
        return pa.table({
            "__dcell": pa.array(ncell, pa.int64()),
            "__side": pa.array(np.ones(len(src), np.int8)),
            "__lid": pa.nulls(len(src), lid_type),
            "__rid": t[right_id].take(take),
            "__px": pa.array(lon[src], pa.float64()),
            "__py": pa.array(lat[src], pa.float64()),
        })

    empty = pa.table({left_id: pa.array([], lid_type),
                      right_id: pa.array([], rid_type),
                      "dist2": pa.array([], pa.float64())})

    def join_group(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0))
        rt = t.filter(pa.array(side == 1))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        lx = lt["__px"].to_numpy(zero_copy_only=False)
        ly = lt["__py"].to_numpy(zero_copy_only=False)
        rx = rt["__px"].to_numpy(zero_copy_only=False)
        ry = rt["__py"].to_numpy(zero_copy_only=False)
        nl, nr = len(lx), len(rx)
        step = max(1, pair_block // max(1, nr))
        out = []
        for s in range(0, nl, step):
            e = min(nl, s + step)
            ddx = lx[s:e, None] - rx[None, :]
            ddy = ly[s:e, None] - ry[None, :]
            d2 = ddx * ddx + ddy * ddy
            li, ri = np.nonzero(d2 <= r2)
            if len(li) == 0:
                continue
            out.append(pa.table({
                left_id: lt["__lid"].take(pa.array(li + s, pa.int64())),
                right_id: rt["__rid"].take(pa.array(ri, pa.int64())),
                "dist2": pa.array(np.round(d2[li, ri], ndigits), pa.float64()),
            }))
        if not out:
            return empty
        return pa.concat_tables(out)

    unioned = (left_ds.map_batches(prep_left, batch_format="pyarrow")
               .union(right_ds.map_batches(prep_right, batch_format="pyarrow")))
    return (coalesced(unioned).groupby("__dcell")
            .map_groups(join_group, batch_format="pyarrow"))


def bbox_join(left_ds, right_ds, left_cols: list[str],
              right_cols: list[str], cell: float,
              max_cells: int = 256,
              x_lo: str = "x_lo", x_hi: str = "x_hi",
              y_lo: str = "y_lo", y_hi: str = "y_hi"):
    """Rectangle-OVERLAP spatial join without an equi key: one row per
    (left, right) pair whose closed bboxes intersect in BOTH axes —
    the 2D generalization of ``temporal.interval_join``'s owner-bin
    contract. Both inputs carry bounds under the same four column
    names; carried columns must be disjoint.

    Scale shape: each rect replicates to every ``cell``-sized grid
    square its bbox overlaps (one vectorized grouped-arange explode,
    no Python loop); a pair is emitted ONLY in its owner square
    ``(floor(max(lx)/cell), floor(max(ly)/cell))`` — the square
    holding the overlap region's min corner, which both rects provably
    cover — so output is exactly-once with no dedup pass. One groupby
    on the (bx, by) square; the in-square kernel is a vectorized
    l x r mask. Pick ``cell`` near the typical rect size to keep
    replication O(1); rects covering more than ``max_cells`` squares
    are skipped with a log line (route such outliers through a
    broadcast join instead). Emits ``overlap_q``:
    floor(1e6 * overlap_w * overlap_h), float-identical on both
    engines because every operand derives identically.
    """
    from .util import coalesced

    if cell <= 0:
        raise ValueError(f"cell must be positive, got {cell}")
    bounds = [x_lo, x_hi, y_lo, y_hi]
    lsch, rsch = left_ds.schema(), right_ds.schema()
    l_types = dict(zip(lsch.names, lsch.types))
    r_types = dict(zip(rsch.names, rsch.types))
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"carried columns overlap: {sorted(overlap)}")

    def explode(t: pa.Table, side: int, carry: list[str]) -> pa.Table:
        xl = t[x_lo].to_numpy(zero_copy_only=False).astype(np.float64)
        xh = t[x_hi].to_numpy(zero_copy_only=False).astype(np.float64)
        yl = t[y_lo].to_numpy(zero_copy_only=False).astype(np.float64)
        yh = t[y_hi].to_numpy(zero_copy_only=False).astype(np.float64)
        bx0 = np.floor(xl / cell).astype(np.int64)
        bx1 = np.floor(xh / cell).astype(np.int64)
        by0 = np.floor(yl / cell).astype(np.int64)
        by1 = np.floor(yh / cell).astype(np.int64)
        nx, ny = bx1 - bx0 + 1, by1 - by0 + 1
        counts = nx * ny
        wide = counts > max_cells
        if wide.any():
            import logging
            logging.getLogger(__name__).warning(
                "bbox_join: skipping %d rects covering > %d cells",
                int(wide.sum()), max_cells)
            counts = np.where(wide, 0, counts)
        total = int(counts.sum())
        src = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        within = np.arange(total, dtype=np.int64) - starts[src]
        ny_s = ny[src]
        bx = bx0[src] + within // ny_s
        by = by0[src] + within % ny_s
        take = pa.array(src, pa.int64())
        cols = {"__bx": pa.array(bx, pa.int64()),
                "__by": pa.array(by, pa.int64()),
                "__xl": pa.array(xl[src]), "__xh": pa.array(xh[src]),
                "__yl": pa.array(yl[src]), "__yh": pa.array(yh[src]),
                "__side": pa.array(np.full(total, side, np.int8))}
        for c in carry:
            cols[c] = t[c].take(take)
        return pa.table(cols)

    unioned = coalesced(
        left_ds.map_batches(lambda t: explode(t, 0, left_cols),
                            batch_format="pyarrow")
        .union(right_ds.map_batches(lambda t: explode(t, 1, right_cols),
                                    batch_format="pyarrow")))

    out_types = {**l_types, **r_types}
    out_schema = pa.schema([(c, out_types[c])
                            for c in left_cols + right_cols]
                           + [("overlap_q", pa.int64())])

    def match(t: pa.Table) -> pa.Table:
        is_l = pc.equal(t["__side"], 0)
        lt = t.filter(is_l)
        rt = t.filter(pc.invert(is_l))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        lxl = lt["__xl"].to_numpy(zero_copy_only=False)[:, None]
        lxh = lt["__xh"].to_numpy(zero_copy_only=False)[:, None]
        lyl = lt["__yl"].to_numpy(zero_copy_only=False)[:, None]
        lyh = lt["__yh"].to_numpy(zero_copy_only=False)[:, None]
        rxl = rt["__xl"].to_numpy(zero_copy_only=False)[None, :]
        rxh = rt["__xh"].to_numpy(zero_copy_only=False)[None, :]
        ryl = rt["__yl"].to_numpy(zero_copy_only=False)[None, :]
        ryh = rt["__yh"].to_numpy(zero_copy_only=False)[None, :]
        bx = int(t["__bx"][0].as_py())
        by = int(t["__by"][0].as_py())
        mx = np.maximum(lxl, rxl)
        my = np.maximum(lyl, ryl)
        owner = (np.floor(mx / cell) == bx) & (np.floor(my / cell) == by)
        hit = (lxl <= rxh) & (rxl <= lxh) & (lyl <= ryh) & (ryl <= lyh) \
            & owner
        li_, ri_ = np.nonzero(hit)
        w = np.minimum(lxh[li_, 0], rxh[0, ri_]) - mx[li_, ri_]
        h = np.minimum(lyh[li_, 0], ryh[0, ri_]) - my[li_, ri_]
        oq = np.floor(w * h * 1e6).astype(np.int64)
        cols = {c: lt[c].take(pa.array(li_, pa.int64()))
                for c in left_cols}
        for c in right_cols:
            cols[c] = rt[c].take(pa.array(ri_, pa.int64()))
        cols["overlap_q"] = pa.array(oq, pa.int64())
        return pa.table(cols).cast(out_schema)

    return unioned.groupby(["__bx", "__by"]).map_groups(
        match, batch_format="pyarrow")


def clip_to_rects(segments_ds, rects: pa.Table,
                  cols: tuple[str, str, str, str] = ("x1", "y1",
                                                     "x2", "y2"),
                  rect_id_col: str = "tile_id",
                  quant: float = 1e7, group_col: str | None = None):
    """Liang-Barsky clip of line segments to axis-aligned rectangles
    (the ST_ClipByBox2D analog of the tiling engine): for every
    (segment, rect) pair that overlaps, the clipped-length
    contribution, pre-summed per rect inside each batch.

    Returns a Dataset of per-batch partials (rect_id, clip_len_q,
    n_clipped) — callers finish with groupby(rect_id).sum, so the
    exchange is O(n_rects) rows per block regardless of segment
    count. With ``group_col`` (e.g. a layer), partials are per
    (group, rect) — scatter-added per batch, so the exchange grows
    only to O(n_rects x groups-per-batch).

    The parametric intervals use sign-dispatched divisions with
    +/-1e300 sentinels for axis-parallel segments (NO inf/NaN ever
    enters the pipeline, so the arithmetic is reproducible in plain
    SQL); clipped length is floor-quantized to int64 micro-units per
    PAIR before summation, making group sums exact under any combine
    order. Rects are a driver-size table broadcast via ray.put (the
    tile list is the small side — thousands, not billions); for
    massive rect sets, grid-partition first with bbox_join's owner-
    cell pattern.

    Reference analog: the reference clips nothing itself — GRASS
    v.in.region / v.overlay handle extraction windows after export
    (mapgen.sh) — but a tiling engine at 10^12 rows must cut
    geometry to tile boundaries before per-tile sinks.
    """
    import ray

    rid = rects[rect_id_col].to_numpy(zero_copy_only=False)
    rx_lo = rects["x_lo"].to_numpy(zero_copy_only=False).astype(np.float64)
    rx_hi = rects["x_hi"].to_numpy(zero_copy_only=False).astype(np.float64)
    ry_lo = rects["y_lo"].to_numpy(zero_copy_only=False).astype(np.float64)
    ry_hi = rects["y_hi"].to_numpy(zero_copy_only=False).astype(np.float64)
    rects_ref = ray.put((rid, rx_lo, rx_hi, ry_lo, ry_hi))
    c_x1, c_y1, c_x2, c_y2 = cols
    BIG = 1e300

    def _axis_interval(p1, d, lo, hi):
        """Per-axis parametric [t_lo, t_hi] of rect overlap; d == 0
        dispatches to an in-range test with +/-BIG sentinels (exactly
        mirrored by the SQL CASE)."""
        # shapes: p1/d are (n_seg, 1); lo/hi are (n_rect,)
        with np.errstate(divide="ignore", invalid="ignore"):
            a = (lo - p1) / d
            b = (hi - p1) / d
        pos = d > 0
        neg = d < 0
        t_lo = np.where(pos, a, np.where(neg, b, 0.0))
        t_hi = np.where(pos, b, np.where(neg, a, 0.0))
        inside = (p1 >= lo) & (p1 <= hi)
        zero = ~(pos | neg)
        t_lo = np.where(zero, np.where(inside, -BIG, BIG), t_lo)
        t_hi = np.where(zero, np.where(inside, BIG, -BIG), t_hi)
        return t_lo, t_hi

    def clip_batch(t: pa.Table) -> pa.Table:
        import ray as _ray
        r_id, x_lo, x_hi, y_lo, y_hi = _ray.get(rects_ref)
        x1 = t[c_x1].to_numpy(zero_copy_only=False)[:, None]
        y1 = t[c_y1].to_numpy(zero_copy_only=False)[:, None]
        x2 = t[c_x2].to_numpy(zero_copy_only=False)[:, None]
        y2 = t[c_y2].to_numpy(zero_copy_only=False)[:, None]
        dx = x2 - x1
        dy = y2 - y1
        tx_lo, tx_hi = _axis_interval(x1, dx, x_lo, x_hi)
        ty_lo, ty_hi = _axis_interval(y1, dy, y_lo, y_hi)
        t0 = np.maximum(0.0, np.maximum(tx_lo, ty_lo))
        t1 = np.minimum(1.0, np.minimum(tx_hi, ty_hi))
        hit = t1 > t0
        seg_len = np.sqrt(dx * dx + dy * dy)
        # ((t1 - t0) * seg_len) * quant — parenthesization mirrored
        # exactly by the SQL. Non-hit pairs can overflow float64 via
        # the +/-1e300 sentinels; they are masked to 0 BEFORE the
        # int64 cast (the SQL CASE guards the same way).
        with np.errstate(over="ignore", invalid="ignore"):
            contrib = np.floor(((t1 - t0) * seg_len) * quant)
        contrib = np.where(hit, contrib, 0.0).astype(np.int64)
        n_rect = r_id.shape[0]

        def rect_col(take=None):
            arr = r_id if take is None else r_id[take]
            return (pa.array(arr, pa.string())
                    if r_id.dtype.kind in "OU" else pa.array(arr))

        if group_col is None:
            return pa.table({
                rect_id_col: rect_col(),
                "clip_len_q": pa.array(contrib.sum(axis=0), pa.int64()),
                "n_clipped": pa.array(hit.sum(axis=0).astype(np.int64)),
            })
        gvals = t[group_col].to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(gvals, return_inverse=True)
        acc = np.zeros((len(uniq), n_rect), np.int64)
        cnt = np.zeros((len(uniq), n_rect), np.int64)
        np.add.at(acc, codes, contrib)
        np.add.at(cnt, codes, hit.astype(np.int64))
        gi = np.repeat(np.arange(len(uniq)), n_rect)
        ri = np.tile(np.arange(n_rect), len(uniq))
        gcol = pa.array(uniq[gi]) if uniq.dtype.kind != "O" else \
            pa.array(uniq[gi], pa.string())
        return pa.table({
            group_col: gcol,
            rect_id_col: rect_col(ri),
            "clip_len_q": pa.array(acc.reshape(-1), pa.int64()),
            "n_clipped": pa.array(cnt.reshape(-1), pa.int64()),
        })

    return segments_ds.map_batches(clip_batch, batch_format="pyarrow")


def knn_join(left_ds, right_ds, k: int,
             left_id: str = "left_id", right_id: str = "right_id",
             lon_col: str = "x", lat_col: str = "y",
             res: int = 4, pair_block: int = 1 << 22,
             fallback_cap: int = 2_000_000,
             exclude_self: bool = False):
    """Exact k-nearest-neighbors JOIN: for EVERY left point, its k
    nearest right points by planar squared-degree distance, ties
    broken by right id — the per-row generalization of the
    north-rule's single-query kNN.

    Scale design: one 3x3 grid co-group (the distance_join exchange —
    right points replicate <= 9x, left points key by their own cell),
    then per group a blocked distance matrix with per-left stable
    argsort over rid-presorted candidates, so (d2, rid) order is
    total and deterministic. A left row is PROVEN exact when it found
    >= k candidates and its kth distance does not exceed the distance
    to the covered 3x3 boundary (domain edges count as covered —
    no points exist beyond the grid). Unproven lefts — sparse cells,
    boundary-huggers — go to a SECOND pass: brute force against the
    full right side with the unresolved lefts broadcast once
    (ray.put), per-right-block partial top-k, and a final per-left
    reduce. Both passes are exact, so the resolve test only routes
    work and never changes the answer. The unresolved count is
    asserted <= ``fallback_cap`` and logged (the knn_auto full-scan
    fallback contract, stages/spatial.py:474) — at true scale pick
    ``res`` so the fallback is the tail, or raise the cap knowingly.

    Returns (left_id, rank 1..k, right_id, dist2). ``exclude_self``
    drops candidate rows whose right id equals the left id (self
    kNN join).
    """
    import ray

    if k < 1:
        raise ValueError("k must be >= 1")
    n_grid = np.int64(1) << np.int64(res)
    wlon = 360.0 / (1 << res)
    wlat = 180.0 / (1 << res)
    lid_type = dict(zip(left_ds.schema().names,
                        left_ds.schema().types))[left_id]
    rid_type = dict(zip(right_ds.schema().names,
                        right_ds.schema().types))[right_id]
    BIG = 1e30

    def prep_left(t: pa.Table) -> pa.Table:
        lon = t[lon_col].to_numpy(zero_copy_only=False)
        lat = t[lat_col].to_numpy(zero_copy_only=False)
        cell = cellmod.latlng_to_cell(lat, lon, res).astype(np.int64)
        return pa.table({
            "__dcell": pa.array(cell, pa.int64()),
            "__side": pa.array(np.zeros(t.num_rows, np.int8)),
            "__lid": t[left_id],
            "__rid": pa.nulls(t.num_rows, rid_type),
            "__px": pa.array(lon, pa.float64()),
            "__py": pa.array(lat, pa.float64()),
        })

    def prep_right(t: pa.Table) -> pa.Table:
        lon = t[lon_col].to_numpy(zero_copy_only=False)
        lat = t[lat_col].to_numpy(zero_copy_only=False)
        cell = cellmod.latlng_to_cell(lat, lon, res)
        cx, cy = cellmod.cell_xy(cell)
        n = t.num_rows
        dx = np.repeat(np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1]), n)
        dy = np.repeat(np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1]), n)
        nx = np.tile(cx, 9) + dx
        ny = np.tile(cy, 9) + dy
        ok = (nx >= 0) & (nx < n_grid) & (ny >= 0) & (ny < n_grid)
        src = np.tile(np.arange(n, dtype=np.int64), 9)[ok]
        ncell = ((np.uint64(res) << np.uint64(58))
                 | (ny[ok].astype(np.uint64) << np.uint64(29))
                 | nx[ok].astype(np.uint64)).astype(np.int64)
        take = pa.array(src, pa.int64())
        return pa.table({
            "__dcell": pa.array(ncell, pa.int64()),
            "__side": pa.array(np.ones(len(src), np.int8)),
            "__lid": pa.nulls(len(src), lid_type),
            "__rid": t[right_id].take(take),
            "__px": pa.array(lon[src], pa.float64()),
            "__py": pa.array(lat[src], pa.float64()),
        })

    out_schema = pa.schema([(left_id, lid_type), ("rank", pa.int64()),
                            (right_id, rid_type),
                            ("dist2", pa.float64()),
                            ("__unres", pa.int8()),
                            ("__px", pa.float64()),
                            ("__py", pa.float64())])

    def _topk_rows(lt_lid, lx, ly, r_rid, rx, ry, lid_is_rid_mask=None):
        """Blocked exact top-k of (d2, rid) for each left row against
        rid-PRESORTED right arrays. Returns (lid_idx, rank, rid_idx,
        d2, kth_d2 per left, n_cand)."""
        nl, nr = len(lx), len(rx)
        rows = []
        step = max(1, pair_block // max(1, nr))
        for s in range(0, nl, step):
            e = min(nl, s + step)
            ddx = lx[s:e, None] - rx[None, :]
            ddy = ly[s:e, None] - ry[None, :]
            d2 = ddx * ddx + ddy * ddy
            if lid_is_rid_mask is not None:
                d2 = np.where(lid_is_rid_mask[s:e], BIG, d2)
            idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
            rows.append((s, e, idx, np.take_along_axis(d2, idx, axis=1)))
        return rows

    def join_group(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0))
        rt = t.filter(pa.array(side == 1))
        if lt.num_rows == 0:
            return out_schema.empty_table()
        lx = lt["__px"].to_numpy(zero_copy_only=False)
        ly = lt["__py"].to_numpy(zero_copy_only=False)
        lid = lt["__lid"]
        if rt.num_rows == 0:
            # no candidates at all: every left is unresolved
            return pa.table({
                left_id: lid, "rank": pa.array(
                    np.zeros(lt.num_rows, np.int64)),
                right_id: pa.nulls(lt.num_rows, rid_type),
                "dist2": pa.array(np.zeros(lt.num_rows)),
                "__unres": pa.array(np.ones(lt.num_rows, np.int8)),
                "__px": pa.array(lx), "__py": pa.array(ly),
            }).cast(out_schema)
        # presort candidates by rid so stable argsort yields (d2, rid)
        order = pc.sort_indices(rt["__rid"])
        rt = rt.take(order)
        rx = rt["__px"].to_numpy(zero_copy_only=False)
        ry = rt["__py"].to_numpy(zero_copy_only=False)
        rid = rt["__rid"]
        self_mask = None
        if exclude_self:
            lid_np = lid.to_numpy(zero_copy_only=False)
            rid_np = rid.to_numpy(zero_copy_only=False)
            self_mask = lid_np[:, None] == rid_np[None, :]
        nr = rt.num_rows
        kk = min(k, nr)
        # guarantee distance to the covered 3x3 boundary (domain
        # edges covered by construction)
        cell = cellmod.latlng_to_cell(ly, lx, res)
        cx, cy = cellmod.cell_xy(cell)
        cov_x_lo = np.where(cx >= 1, (cx - 1) * wlon - 180.0, -np.inf)
        cov_x_hi = np.where(cx + 2 <= n_grid, (cx + 2) * wlon - 180.0,
                            np.inf)
        # grid y grows as lat falls: cell cy covers lat in
        # [90-(cy+1)*wlat, 90-cy*wlat]; the 3x3 lat floor needs cy+1
        # to exist, the ceiling needs cy-1
        cov_y_lo = np.where(cy + 2 <= n_grid, 90.0 - (cy + 2) * wlat,
                            -np.inf)
        cov_y_hi = np.where(cy >= 1, 90.0 - (cy - 1) * wlat, np.inf)
        g = np.minimum(np.minimum(lx - cov_x_lo, cov_x_hi - lx),
                       np.minimum(ly - cov_y_lo, cov_y_hi - ly))
        g = np.where(np.isfinite(g), g, BIG)
        parts = []
        for s, e, idx, d2k in _topk_rows(lid, lx, ly, rid, rx, ry,
                                         self_mask):
            n_here = e - s
            # masked self rows carry BIG distances; the flat_d2 < BIG
            # keep-filter drops those placeholders below
            kth = d2k[:, kk - 1]
            resolved = (nr >= k) & (kth <= g[s:e] * g[s:e]) & (
                kth < BIG)
            li = np.repeat(np.arange(s, e), kk)
            ranks = np.tile(np.arange(1, kk + 1, dtype=np.int64),
                            n_here)
            flat_idx = idx.reshape(-1)
            flat_d2 = d2k.reshape(-1)
            keep = np.repeat(resolved, kk) & (flat_d2 < BIG)
            parts.append(pa.table({
                left_id: lid.take(pa.array(li[keep], pa.int64())),
                "rank": pa.array(ranks[keep]),
                right_id: rid.take(pa.array(flat_idx[keep], pa.int64())),
                "dist2": pa.array(flat_d2[keep]),
                "__unres": pa.array(np.zeros(int(keep.sum()), np.int8)),
                "__px": pa.array(lx[li[keep]]),
                "__py": pa.array(ly[li[keep]]),
            }).cast(out_schema))
            un = ~resolved
            if un.any():
                sel = np.flatnonzero(un) + s
                parts.append(pa.table({
                    left_id: lid.take(pa.array(sel, pa.int64())),
                    "rank": pa.array(np.zeros(len(sel), np.int64)),
                    right_id: pa.nulls(len(sel), rid_type),
                    "dist2": pa.array(np.zeros(len(sel))),
                    "__unres": pa.array(np.ones(len(sel), np.int8)),
                    "__px": pa.array(lx[sel]),
                    "__py": pa.array(ly[sel]),
                }).cast(out_schema))
        return pa.concat_tables(parts) if parts else out_schema.empty_table()

    unioned = (left_ds.map_batches(prep_left, batch_format="pyarrow")
               .union(right_ds.map_batches(prep_right,
                                           batch_format="pyarrow")))
    pass1 = (coalesced(unioned).groupby("__dcell")
             .map_groups(join_group, batch_format="pyarrow")
             .materialize())  # consumed twice: resolved + unresolved

    resolved = pass1.filter(expr="__unres == 0").select_columns(
        [left_id, "rank", right_id, "dist2"])
    unres = pass1.filter(expr="__unres == 1").select_columns(
        [left_id, "__px", "__py"])
    n_unres = unres.count()
    if n_unres == 0:
        return resolved
    if n_unres > fallback_cap:
        raise ValueError(
            f"knn_join: {n_unres} unresolved lefts exceed fallback_cap="
            f"{fallback_cap}; lower res (bigger cells) or raise the cap")
    import logging
    logging.getLogger(__name__).info(
        "knn_join: %d lefts to brute-force fallback", n_unres)
    ut = unres.take_all()
    u_lid = np.array([r[left_id] for r in ut])
    u_x = np.array([r["__px"] for r in ut], np.float64)
    u_y = np.array([r["__py"] for r in ut], np.float64)
    u_ref = ray.put((u_lid, u_x, u_y))

    cand_schema = pa.schema([(left_id, lid_type), (right_id, rid_type),
                             ("dist2", pa.float64())])

    def block_topk(t: pa.Table) -> pa.Table:
        import ray as _ray
        b_lid, b_x, b_y = _ray.get(u_ref)
        order = pc.sort_indices(t[right_id])
        t = t.take(order)
        rx = t[lon_col].to_numpy(zero_copy_only=False)
        ry = t[lat_col].to_numpy(zero_copy_only=False)
        rid = t[right_id]
        nr = t.num_rows
        kk = min(k, nr)
        if nr == 0:
            return cand_schema.empty_table()
        parts = []
        step = max(1, pair_block // max(1, nr))
        for s in range(0, len(b_x), step):
            e = min(len(b_x), s + step)
            ddx = b_x[s:e, None] - rx[None, :]
            ddy = b_y[s:e, None] - ry[None, :]
            d2 = ddx * ddx + ddy * ddy
            if exclude_self:
                d2 = np.where(b_lid[s:e, None]
                              == rid.to_numpy(zero_copy_only=False)[None, :],
                              BIG, d2)
            idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]
            d2k = np.take_along_axis(d2, idx, axis=1)
            li = np.repeat(np.arange(s, e), kk)
            flat = idx.reshape(-1)
            fd2 = d2k.reshape(-1)
            keep = fd2 < BIG
            parts.append(pa.table({
                left_id: pa.array(b_lid[li[keep]]),
                right_id: rid.take(pa.array(flat[keep], pa.int64())),
                "dist2": pa.array(fd2[keep]),
            }).cast(cand_schema))
        return (pa.concat_tables(parts) if parts
                else cand_schema.empty_table())

    def finish(df):
        import pandas as pd
        df = df.sort_values(["dist2", right_id]).head(k)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[[left_id, "rank", right_id, "dist2"]]

    fb = (right_ds.map_batches(block_topk, batch_format="pyarrow")
          .groupby(left_id).map_groups(finish, batch_format="pandas"))
    fb = fb.map_batches(
        lambda t: t.cast(pa.schema([(left_id, lid_type),
                                    ("rank", pa.int64()),
                                    (right_id, rid_type),
                                    ("dist2", pa.float64())])),
        batch_format="pyarrow")
    return resolved.union(fb)


def snap_to_segments(points_ds, seg_ids: np.ndarray,
                     ax: np.ndarray, ay: np.ndarray,
                     bx: np.ndarray, by: np.ndarray,
                     id_col: str = "id", x_col: str = "x",
                     y_col: str = "y", quant: float = 1_000_000.0):
    """Nearest-SEGMENT snap (the map-matching primitive — ST_Distance
    point-to-linestring + argmin): for every point, the closest of a
    broadcast segment set by clamped-projection distance, quantized to
    ``floor(d2 * quant)`` int64 so the SQL mirror (identical operand
    shapes) picks the same argmin with the same (dq, seg_id) tie
    order. Degenerate zero-length segments divide by a guarded 1.0 on
    BOTH sides (dot is 0 there, so t = 0 — distance to the endpoint).

    Scale shape: the segment network is ray.put ONCE (road networks
    are dimension-sized against 10^12 points); each point batch does
    one vectorized (n x m) distance block, argmin per row, zero
    exchanges. For networks past broadcast size, pre-bucket with
    ``bbox_join``/``knn_join`` and run this per bucket.

    Output: (id_col, seg_id: int64, dq: int64).
    """
    import ray

    segs = np.argsort(seg_ids, kind="stable")  # argmin tie = min seg_id
    ref = ray.put((seg_ids[segs].astype(np.int64),
                   ax[segs].astype(np.float64), ay[segs].astype(np.float64),
                   bx[segs].astype(np.float64), by[segs].astype(np.float64)))

    def snap(t: pa.Table) -> pa.Table:
        import ray as _ray
        sid, sax, say, sbx, sby = _ray.get(ref)
        px = t[x_col].to_numpy(zero_copy_only=False)[:, None]
        py = t[y_col].to_numpy(zero_copy_only=False)[:, None]
        if t.num_rows == 0 or len(sid) == 0:
            idc = (t[id_col].combine_chunks()
                   if isinstance(t[id_col], pa.ChunkedArray) else t[id_col])
            return pa.table({id_col: idc.slice(0, 0),
                             "seg_id": pa.array([], pa.int64()),
                             "dq": pa.array([], pa.int64())})
        vx = (sbx - sax)[None, :]
        vy = (sby - say)[None, :]
        vv_raw = vx * vx + vy * vy
        vv = np.where(vv_raw == 0.0, 1.0, vv_raw)
        dot = (px - sax[None, :]) * vx + (py - say[None, :]) * vy
        tc = np.minimum(1.0, np.maximum(0.0, dot / vv))
        dx = px - (sax[None, :] + tc * vx)
        dy = py - (say[None, :] + tc * vy)
        dq = np.floor((dx * dx + dy * dy) * quant).astype(np.int64)
        best = np.argmin(dq, axis=1)  # first minimum = smallest seg_id
        rows = np.arange(len(best))
        return pa.table({id_col: t[id_col],
                         "seg_id": pa.array(sid[best], pa.int64()),
                         "dq": pa.array(dq[rows, best], pa.int64())})

    return points_ds.map_batches(snap, batch_format="pyarrow")


def morans_i(cells_ds, cx_col: str = "cx", cy_col: str = "cy",
             val_col: str = "c", n_buckets: int | None = None):
    """Global Moran's I spatial autocorrelation over a cell grid with
    rook (4-neighbor) adjacency — the hotspot/clustering statistic of
    spatial analysis. To keep the gate exact the statistic is emitted
    as its RAW integer parts rather than a float ratio:

      d_i   = n * c_i - S           (integer deviations, Σ d_i = 0)
      num   = n * Σ_{ij adjacent} d_i d_j     (directed pairs)
      den   = W * Σ d_i^2                     (W = directed pair count)
      I     = num / den  (left to the reader — division would need
                          HUGEINT on one side and bignum on the other)

    computed over the NON-EMPTY cells only (documented convention;
    the SQL mirror adopts it verbatim). Caller owns the int64 budget:
    |n * Σ d_i d_j| must stay < 2^63 — for count-valued cells on a
    bounded grid this holds with orders of magnitude to spare.

    Scale shape: one groupby builds the cell counts; each cell
    explodes to its 4 neighbor keys carrying d_i and meets the
    d-table in a size-adaptive dim_join (broadcast while the
    non-empty-cell table is dimension-sized, bucketed past the cap);
    two scalar aggregates finish.

    Output: pandas single row (n_cells, w_pairs, num, den).
    """
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    from .. import config
    from .joins import dim_join

    b = n_buckets or config.DEFAULT_JOIN_BUCKETS
    PACK = np.int64(1) << np.int64(32)

    def keyed(t: pa.Table) -> pa.Table:
        cx = t[cx_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cy = t[cy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(cx) and (cx.min() < 0 or cy.min() < 0):
            raise ValueError("morans_i: cell coords must be non-negative")
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"k": pa.array(cx * PACK + cy, pa.int64()),
                         "c": pa.array(v, pa.int64())})

    counts = (cells_ds.map_batches(keyed, batch_format="pyarrow")
              .groupby("k").aggregate(Sum("c", alias_name="c"))
              .materialize())
    n = counts.count()
    if n == 0:
        return pd.DataFrame({"n_cells": [0], "w_pairs": [0],
                             "num": [0], "den": [0]})
    s = int(counts.sum("c"))

    def dev(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        return pa.table({"k": t["k"],
                         "d": pa.array(n * c - s, pa.int64())})

    dtab = counts.map_batches(dev, batch_format="pyarrow").materialize()

    def neighbors(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        cx, cy = k // PACK, k % PACK
        offs = [(1, 0), (-1, 0), (0, 1), (0, -1)]
        ks, ds = [], []
        for ox, oy in offs:
            nx, ny = cx + ox, cy + oy
            ok = (nx >= 0) & (ny >= 0)
            ks.append(nx[ok] * PACK + ny[ok])
            ds.append(d[ok])
        return pa.table({"k": pa.array(np.concatenate(ks), pa.int64()),
                         "da": pa.array(np.concatenate(ds), pa.int64())})

    adj = dim_join(dtab.map_batches(neighbors, batch_format="pyarrow"),
                   dtab.map_batches(lambda t: pa.table(
                       {"k": t["k"], "db": t["d"]}),
                       batch_format="pyarrow"),
                   on="k", n_buckets=b)
    prods = adj.map_batches(
        lambda t: pa.table({"dd": pa.compute.multiply(t["da"], t["db"]),
                            "one": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    agg = prods.aggregate(Sum("dd", alias_name="cross"),
                          Sum("one", alias_name="w"))
    cross = int(agg["cross"] or 0)
    w = int(agg["w"] or 0)
    d2 = int(dtab.map_batches(
        lambda t: pa.table({"d2": pa.compute.multiply(t["d"], t["d"])}),
        batch_format="pyarrow").sum("d2"))
    return pd.DataFrame({"n_cells": [n], "w_pairs": [w],
                         "num": [n * cross], "den": [w * d2]})


def areal_interp(ds, x0_col: str, y0_col: str, x1_col: str, y1_col: str,
                 val_col: str, cell_micro: int,
                 max_cells: int = 4096, n_buckets: int | None = None):
    """AREAL INTERPOLATION — the zone-transfer operator of spatial
    statistics (census reallocation, raster zonal re-gridding): every
    source rectangle's integer value distributes onto a fixed square
    cell grid proportional to its area of overlap with each cell,
    ``contribution = trunc(val * overlap_area / rect_area)`` with
    EXPLICIT toward-zero division (values may be negative; numpy //
    floors where DuckDB truncates, so both engines run
    sign * (abs // den)).

    Coordinates are non-negative micro-degree int64s, rects half-open
    ``[x0, x1) x [y0, y1)``. One exchange: the per-batch kernel
    explodes each rect across its covered cell window with the
    grouped-arange trick (rects spanning more than ``max_cells``
    cells drop with a log line — route such outliers through a
    coarser grid), computes all overlaps vectorized, pre-combines to
    per-cell partial sums on a PACKED single int64 cell key, and one
    groupby-sum finishes. Output: ``(cell_x, cell_y, v_q: int64)``.
    """
    from ray.data.aggregate import Sum

    c = int(cell_micro)
    if c <= 0:
        raise ValueError(f"cell_micro must be positive, got {cell_micro}")

    def explode(t: pa.Table) -> pa.Table:
        x0 = t[x0_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y0 = t[y0_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = t[x1_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y1 = t[y1_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cx0, cx1 = x0 // c, (x1 - 1) // c
        cy0, cy1 = y0 // c, (y1 - 1) // c
        nx = cx1 - cx0 + 1
        ny = cy1 - cy0 + 1
        ncell = nx * ny
        over = ncell > max_cells
        if over.any():
            print(f"areal_interp: skipped {int(over.sum())} rects "
                  f"covering > {max_cells} cells")
            ncell = np.where(over, 0, ncell)
        total = int(ncell.sum())
        empty = pa.table({"__cell": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64())})
        if total == 0:
            return empty
        rep = np.repeat(np.arange(len(ncell)), ncell)
        offs = np.concatenate(([0], np.cumsum(ncell)[:-1]))
        local = (np.arange(total, dtype=np.int64)
                 - np.repeat(offs, ncell))
        cx = cx0[rep] + local % nx[rep]
        cy = cy0[rep] + local // nx[rep]
        ox = (np.minimum(x1[rep], (cx + 1) * c)
              - np.maximum(x0[rep], cx * c))
        oy = (np.minimum(y1[rep], (cy + 1) * c)
              - np.maximum(y0[rep], cy * c))
        area = (x1[rep] - x0[rep]) * (y1[rep] - y0[rep])
        num = v[rep] * ox * oy
        contrib = np.sign(num) * (np.abs(num) // area)
        key = cy * np.int64(1) * (1 << 32) + cx  # packed cell key
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, contrib)
        return pa.table({"__cell": pa.array(uk, pa.int64()),
                         "v": pa.array(s, pa.int64())})

    agg = (coalesced(ds.map_batches(explode, batch_format="pyarrow"))
           .groupby("__cell").aggregate(Sum("v", alias_name="v_q")))

    def unpack(t: pa.Table) -> pa.Table:
        k = t["__cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "cell_x": pa.array(k & ((1 << 32) - 1), pa.int64()),
            "cell_y": pa.array(k >> 32, pa.int64()),
            "v_q": t["v_q"].cast(pa.int64())})

    return agg.map_batches(unpack, batch_format="pyarrow")
