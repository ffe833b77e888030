"""The flagship conversion pipeline — full osm2shp parity on Ray Data.

Reference lifecycle (/root/reference/osm2shp.cc:16-18 +
osm/handler.cc): single-threaded event loop, nodes staged to sqlite,
named+tag-matched nodes exported as points, tag-matched ways joined
against the staging DB and exported as lines/polygons, everything
appended to 10 shapefile sinks.

Ray-native lifecycle (SURVEY.md §3.4): two Dataset branches from the
same node source, one bucketed shuffle join, partitioned parquet write
keyed by the ``layer`` column (the layer column IS the sink dispatch of
handler.cc:74-76).
"""

from __future__ import annotations

import pyarrow as pa

from .. import config
from ..stages import classify, geometry, join


def with_crs(ds):
    """Stamp the CRS into the Arrow schema metadata of every block —
    the K3 analog of the reference's hard-coded EPSG:4326 .prj writer
    (/root/reference/osm/shapefile.cc:65-79). Parquet files written
    from these blocks carry the metadata and any reader can recover it."""
    meta = {b"crs": config.CRS.encode()}

    def stamp(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(meta)

    return ds.map_batches(stamp, batch_format="pyarrow")


def export_points(nodes_ds):
    """Nodes -> exported point features (layer, geometry_wkb, name, x, y)."""
    return (nodes_ds
            .map_batches(classify.classify_nodes_batch, batch_format="pyarrow")
            .map_batches(geometry.build_point_wkb_batch, batch_format="pyarrow"))


def export_ways(nodes_ds, ways_ds, n_buckets: int | None = None):
    """Ways -> exported way features (way_id, layer, geometry_wkb, x, y)."""
    classified = ways_ds.map_batches(classify.classify_ways_batch,
                                     batch_format="pyarrow")
    assembled = join.resolve_ways(nodes_ds, classified, n_buckets=n_buckets)
    return assembled.map_batches(geometry.build_way_wkb_batch,
                                 batch_format="pyarrow")


def convert(nodes_ds, ways_ds, out_dir: str | None = None,
            n_buckets: int | None = None):
    """Run both branches. Returns (points_ds, ways_out_ds); when
    ``out_dir`` is given, also writes partitioned parquet
    (one directory per layer — the sink-per-layer analog of
    handler.cc:34-43, resumable because partitions are independent)."""
    points = export_points(nodes_ds)
    ways_out = export_ways(nodes_ds, ways_ds, n_buckets=n_buckets)
    if out_dir:
        with_crs(points).write_parquet(f"{out_dir}/points", partition_cols=["layer"])
        with_crs(ways_out).write_parquet(f"{out_dir}/ways", partition_cols=["layer"])
    return points, ways_out


def layer_counts(points_ds, ways_out_ds) -> pa.Table:
    """The reference's observable correctness surface: exported counts
    per sink (handler.cc:59-62 totals; A2 exact-equality gate)."""
    p = points_ds.groupby("layer").count().to_pandas()
    w = ways_out_ds.groupby("layer").count().to_pandas()
    p["kind"] = "point"
    w["kind"] = "way"
    import pandas as pd
    return pa.Table.from_pandas(pd.concat([p, w], ignore_index=True),
                                preserve_index=False)
