"""Layer configuration and engine constants.

The reference hard-codes 10 shapefile sinks and 12 layer rules in
declaration order (/root/reference/osm/handler.cc:34-56); rule order is
semantically load-bearing because classification is first-match-wins
(handler.cc:96-104 for nodes, handler.cc:115-123 for ways). We keep the
rules as a constant table consumed by a vectorized ordered classifier.
"""

from __future__ import annotations

# Geometry types (mirror SHPT_POINT / SHPT_ARC / SHPT_POLYGON roles,
# /root/reference/osm/handler.cc:34-43).
POINT = "point"
LINE = "line"
POLYGON = "polygon"

# Sinks: name -> geometry type (handler.cc:34-43). Point sinks carry a
# `name` attribute field (handler.cc:69-70, shapefile.cc:21-30).
SHAPES: dict[str, str] = {
    "roadbig_line": LINE,
    "roadmedium_line": LINE,
    "roadsmall_line": LINE,
    "railway_line": LINE,
    "city_point": POINT,
    "town_point": POINT,
    "suburb_point": POINT,
    "village_point": POINT,
    "water_line": LINE,
    "water_area": POLYGON,
}

# Layer rules in declaration order (handler.cc:45-56):
# (sink_name, tag_key, tag_value). First match wins.
LAYER_RULES: list[tuple[str, str, str]] = [
    ("roadbig_line", "highway", "motorway"),
    ("roadbig_line", "highway", "trunk"),
    ("roadmedium_line", "highway", "primary"),
    ("roadsmall_line", "highway", "secondary"),
    ("railway_line", "railway", "rail"),
    ("city_point", "place", "city"),
    ("town_point", "place", "town"),
    ("suburb_point", "place", "suburb"),
    ("village_point", "place", "village"),
    ("water_line", "waterway", "river"),
    ("water_line", "waterway", "canal"),
    ("water_area", "natural", "water"),
]

# is_area predicate branches (handler.cc:127-133). NOTE: the literal
# value "woord" is a typo for "wood" present in the reference; it is
# reproduced intentionally for conformance (SURVEY.md §7.4.6).
AREA_NATURAL_VALUES = ("land", "water", "woord")

# Tag keys the engine ever inspects (classifier + is_area + name).
TAG_KEYS = ("highway", "railway", "place", "waterway", "natural",
            "landuse", "area", "name")

# CRS pinned by the reference's .prj writer (shapefile.cc:65-79).
CRS = "EPSG:4326"

# Cell-index resolutions mandated by the north_rule: H3 res-9
# (~0.1 km^2 hex) and S2 level-13 (~1 km^2). Our from-scratch quad-cell
# scheme (functions/cells.py) uses resolution 15 (~1.2 km at the
# equator) as the H3-res-9 analog and Hilbert level 13 as the S2 analog.
H3_ANALOG_RES = 15
S2_ANALOG_LEVEL = 13

# Default shuffle knobs. At 100 TB these scale with the cluster:
# buckets ~ 4 x total cores; SALT sized to split the hottest key across
# that many subkeys. Buckets are also kept WELL above the sort
# partition count (~1-2 per core): with as many distinct bucket values
# as range partitions, the sort's sampled boundaries duplicate and the
# empty reduce ranges emit zero-column blocks (Ray's RefBundle schema
# warning). 128 over the usual ≤64 reducers keeps boundary-duplicate
# odds low (a duplicate needs one value holding ~1/reducers of the
# sample — 4-8x its flat share) without inflating group-kernel
# invocation counts (measured: 256 cost the headline ~20% in
# per-group overhead; the REAL empty-range offenders were
# reducer-SIZED literals of 16-32 in the adapter/entity chains, now
# removed in favor of this default).
DEFAULT_JOIN_BUCKETS = 128
DEFAULT_SALT = 8
