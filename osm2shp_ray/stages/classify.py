"""Vectorized classifiers — operators M1-M9 of SURVEY.md §2.2.

Reference semantics reproduced here:
- node id validity: drop ``id <= 0`` before staging or export
  (/root/reference/osm/handler.cc:87-88);
- node point export: requires a ``name`` tag (handler.cc:92-94), then a
  first-match-wins scan of the layer rules in declaration order
  restricted to POINT sinks (handler.cc:96-104);
- way ``is_area``: ``area=yes`` OR any ``landuse`` OR ``natural`` in
  {land, water, woord} — the literal "woord" typo is intentional
  fidelity (handler.cc:127-133);
- way vertex filter: drop if (polygon and n_refs < 3) or n_refs < 2
  (handler.cc:112-113);
- way first-match-wins scan restricted to sinks whose geometry type
  equals the way's computed type (handler.cc:115-123). Classification
  happens BEFORE the coordinate join; a way that matches rule i and
  later fails resolution is dropped, never retried on rule i+1
  (SURVEY.md §7.4.1) — hence the engine classifies pre-join too and
  gates post-join.

All kernels are batch-vectorized (numpy over polars-extracted tag
columns); no per-row Python in the hot path. Layers travel as a
compact ``layer_idx`` int8 (index into config.LAYER_RULES) until the
final write, where it becomes the sink-name string.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import config
from ..functions.tags import tag_value

LAYER_NAMES = [r[0] for r in config.LAYER_RULES]
LAYER_GEOM = np.array([{"point": 0, "line": 1, "polygon": 2}[config.SHAPES[r[0]]]
                       for r in config.LAYER_RULES], dtype=np.int8)
GEOM_POINT, GEOM_LINE, GEOM_POLYGON = 0, 1, 2


def _rule_tag_matches(tags: pa.Array, key: str, value: str) -> np.ndarray:
    v = tag_value(tags, key)
    return pc.fill_null(pc.equal(v, value), False).to_numpy(zero_copy_only=False)


def first_match_layer(tags: pa.Array, geom_type: np.ndarray) -> np.ndarray:
    """Ordered first-match-wins layer classification.

    geom_type: int8 per row (GEOM_POINT/LINE/POLYGON). Returns int8
    layer_idx, -1 = no match. Scans config.LAYER_RULES in declaration
    order; a rule is eligible only when its sink's geometry type equals
    the row's type (handler.cc:97-98 for nodes, :116 for ways).
    """
    n = len(tags)
    out = np.full(n, -1, dtype=np.int8)
    for i, (_sink, key, value) in enumerate(config.LAYER_RULES):
        undecided = out == -1
        if not undecided.any():
            break
        eligible = undecided & (geom_type == LAYER_GEOM[i])
        if not eligible.any():
            continue
        m = eligible & _rule_tag_matches(tags, key, value)
        out[m] = i
    return out


def is_area(tags: pa.Array) -> np.ndarray:
    """handler.cc:127-133, including the literal 'woord'."""
    area = _rule_tag_matches(tags, "area", "yes")
    landuse = pc.is_valid(tag_value(tags, "landuse")).to_numpy(zero_copy_only=False)
    natural = tag_value(tags, "natural")
    nat = np.zeros(len(tags), dtype=bool)
    for v in config.AREA_NATURAL_VALUES:
        nat |= pc.fill_null(pc.equal(natural, v), False).to_numpy(zero_copy_only=False)
    return area | landuse | nat


def classify_nodes_batch(batch: pa.Table) -> pa.Table:
    """Nodes (id, lon, lat, tags) -> exported points
    (layer_idx int8, x, y, name). Applies M1 (id>0), M5 (named), M6
    (first-match point rule)."""
    ids = batch["id"].to_numpy(zero_copy_only=False)
    valid = ids > 0
    name = tag_value(batch["tags"].combine_chunks() if isinstance(batch["tags"], pa.ChunkedArray)
                     else batch["tags"], "name")
    named = pc.is_valid(name).to_numpy(zero_copy_only=False)
    cand = valid & named
    tags_col = batch["tags"]
    if isinstance(tags_col, pa.ChunkedArray):
        tags_col = tags_col.combine_chunks()
    geom = np.full(len(batch), GEOM_POINT, dtype=np.int8)
    layer = first_match_layer(tags_col, geom)
    keep = cand & (layer >= 0)
    idx = np.flatnonzero(keep)
    return pa.table({
        "layer_idx": pa.array(layer[idx], pa.int8()),
        "x": pa.array(batch["lon"].to_numpy(zero_copy_only=False)[idx], pa.float64()),
        "y": pa.array(batch["lat"].to_numpy(zero_copy_only=False)[idx], pa.float64()),
        "name": pc.take(name, pa.array(idx)),
    })


def classify_ways_batch(batch: pa.Table) -> pa.Table:
    """Ways (way_id, node_refs, tags) -> tag-matched ways
    (way_id, node_refs, layer_idx, geom_type). Applies M7 (is_area),
    M8 (vertex filter), M9 (first-match by type). Non-matching ways are
    filtered here — they never reach the join (the reference only runs
    the sqlite lookup for rule-matched ways, handler.cc:115-118)."""
    tags_col = batch["tags"]
    if isinstance(tags_col, pa.ChunkedArray):
        tags_col = tags_col.combine_chunks()
    refs = batch["node_refs"]
    if isinstance(refs, pa.ChunkedArray):
        refs = refs.combine_chunks()
    n_refs = pc.list_value_length(refs).to_numpy(zero_copy_only=False).astype(np.int64)
    area = is_area(tags_col)
    geom = np.where(area, GEOM_POLYGON, GEOM_LINE).astype(np.int8)
    ok = ~(((geom == GEOM_POLYGON) & (n_refs < 3)) | (n_refs < 2))
    layer = first_match_layer(tags_col, geom)
    keep = ok & (layer >= 0)
    idx = np.flatnonzero(keep)
    take = pa.array(idx)
    return pa.table({
        "way_id": pc.take(batch["way_id"], take),
        "node_refs": pc.take(refs, take),
        "layer_idx": pa.array(layer[idx], pa.int8()),
        "geom_type": pa.array(geom[idx], pa.int8()),
    })


def layer_name_col(layer_idx: np.ndarray) -> pa.Array:
    """int8 layer_idx -> sink-name string column (dictionary-encoded
    source array keeps this cheap)."""
    names = np.asarray(LAYER_NAMES, dtype=object)
    return pa.array(names[layer_idx], pa.string())
