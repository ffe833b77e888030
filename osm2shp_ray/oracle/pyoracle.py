"""Single-process pure-Python oracle reproducing the reference's exact
semantics (/root/reference/osm/handler.cc + point_database.cc), used as
the golden-output generator for conformance tests (SURVEY.md §5.1).

Deliberately written as the most literal possible row-loop translation
of the C++ control flow — slow and simple — so that any disagreement
with the distributed engine indicts the engine, not the oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .. import config
from ..functions.hashing import splitmix64, stable_id64
from ..functions.hilbert import phash_to_lonlat
from ..functions.cells import latlng_to_cell
from ..pipelines.adapter import NEG_MOD, WAY_CELL_RES, WAY_SUBGROUPS, _POS_C


def _parse_tags(s: str) -> dict[str, str]:
    out = {}
    for tok in (s or "").split(" "):
        if "=" in tok:
            k, _, v = tok.partition("=")
            if k and k not in out:  # first occurrence wins (get_value_by_key)
                out[k] = v
    return out


def _is_area(tags: dict[str, str]) -> bool:
    # handler.cc:127-133 (incl. the literal 'woord')
    return (tags.get("area") == "yes" or "landuse" in tags
            or tags.get("natural") in config.AREA_NATURAL_VALUES)


@dataclass
class OracleResult:
    points: dict[str, list] = field(default_factory=dict)   # layer -> [(x, y, name)]
    ways: dict[str, list] = field(default_factory=dict)     # layer -> [(way_id, xs, ys)]
    exported_nodes: int = 0
    exported_ways: int = 0
    unresolved_refs: list = field(default_factory=list)

    def layer_counts(self) -> dict[str, int]:
        out = {k: len(v) for k, v in self.points.items()}
        for k, v in self.ways.items():
            out[k] = out.get(k, 0) + len(v)
        return out


def convert_oracle(nodes_rows, ways_rows) -> OracleResult:
    """nodes_rows: iterable of dicts (id, lon, lat, tags[str]);
    ways_rows: iterable of dicts (way_id, node_refs, tags[str]).
    Mirrors the node-phase-then-way-phase event loop (osm2shp.cc:18)."""
    res = OracleResult()
    db: dict[int, tuple[float, float]] = {}
    for nd in nodes_rows:
        nid = nd["id"]
        if nid <= 0:          # handler.cc:87-88
            continue
        db[nid] = (nd["lon"], nd["lat"])   # handler.cc:90 (staged regardless of tags)
        tags = _parse_tags(nd["tags"])
        name = tags.get("name")
        if name is None:      # handler.cc:92-94
            continue
        for sink, key, value in config.LAYER_RULES:   # handler.cc:96-104
            if config.SHAPES[sink] == config.POINT and tags.get(key) == value:
                res.points.setdefault(sink, []).append((nd["lon"], nd["lat"], name))
                res.exported_nodes += 1
                break
    for wy in ways_rows:
        tags = _parse_tags(wy["tags"])
        geom = config.POLYGON if _is_area(tags) else config.LINE   # handler.cc:111
        refs = list(wy["node_refs"])
        if (geom == config.POLYGON and len(refs) < 3) or len(refs) < 2:  # handler.cc:112-113
            continue
        for sink, key, value in config.LAYER_RULES:   # handler.cc:115-123
            if config.SHAPES[sink] == geom and tags.get(key) == value:
                xs, ys, ok = [], [], True
                for r in refs:                        # point_database.cc:48-112
                    if r in db:
                        xs.append(db[r][0]); ys.append(db[r][1])
                    else:
                        res.unresolved_refs.append(r)  # point_database.cc:104-109
                        ok = False
                if ok:
                    res.ways.setdefault(sink, []).append((wy["way_id"], xs, ys))
                    res.exported_ways += 1
                break   # first match wins even when unresolved (handler.cc:122)
    return res


def adapt_oracle(images_rows):
    """Single-process re-implementation of the entity adapter
    (pipelines/adapter.py) — same arithmetic, row loops."""
    nodes = []
    membership = []
    for r in images_rows:
        rid = int(stable_id64([r["image_id"]])[0])
        if int(splitmix64(np.array([rid], dtype=np.uint64))[0]) % NEG_MOD == 0:
            rid = -rid
        lon, lat = phash_to_lonlat(np.array([r["phash"]], dtype=np.int64))
        lon, lat = float(lon[0]), float(lat[0])
        tags = " ".join(t for t in r["caption"].split(" ") if "=" in t)
        nodes.append({"id": rid, "lon": lon, "lat": lat, "tags": tags})
        cell = latlng_to_cell(np.array([lat]), np.array([lon]), WAY_CELL_RES)[0]
        sub = int(splitmix64(np.array([abs(rid)], dtype=np.uint64))[0]) % WAY_SUBGROUPS
        way_id = int(splitmix64(np.array([cell ^ np.uint64(sub + 1)], dtype=np.uint64))[0]) >> 1
        pos = int(splitmix64(np.array([abs(rid)], dtype=np.uint64) ^ _POS_C)[0]) >> 1
        membership.append((way_id, pos, rid, tags))
    membership.sort()
    ways = []
    i = 0
    while i < len(membership):
        j = i
        while j < len(membership) and membership[j][0] == membership[i][0]:
            j += 1
        group = membership[i:j]
        ways.append({"way_id": group[0][0],
                     "node_refs": [g[2] for g in group],
                     "tags": group[0][3]})
        i = j
    return nodes, ways
