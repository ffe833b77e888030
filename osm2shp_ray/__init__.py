"""osm2shp_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch re-expression of the data-processing capabilities of
minad/osm2shp (reference at /root/reference, MIT) on Ray Data:

- the reference's sqlite3 node-staging + IN-batch lookup join
  (osm/point_database.cc) becomes a distributed bucketed hash join
  expressed as explode -> union -> groupby(bucket).map_groups;
- its per-entity tag classification and geometry construction
  (osm/handler.cc, osm/shapefile.cc) become vectorized Arrow
  map_batches stages;
- its shapefile sinks become partitioned parquet writes with WKB
  geometry columns and CRS metadata;
- on top, the north_rule additions: H3/S2-style cell indexing,
  ray-crossing point-in-polygon tiling, kNN via k-ring expansion,
  raster<->vector tile assignment with salted-key skew mitigation,
  dedup / similarity / text-analysis operators for training-data
  pipelines, and per-partition checkpoint manifests.

No code is copied from the reference; every behavioral contract is
cited by file:line in the implementing module's docstring.
"""

__version__ = "0.1.0"
