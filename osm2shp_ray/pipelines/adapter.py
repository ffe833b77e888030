"""Entity adapter: the mandated image-caption table -> (nodes, ways).

Graft contract (SURVEY.md §7.2): the engine core is generic over
(nodes, ways, tiles) datasets; the single mandated input shape
(image_id, bytes, w, h, fmt, caption, phash) is adapted
deterministically:

- ``id = stable_hash64(image_id)`` (positive), then a deterministic ~1%
  subset is negated so the reference's id<=0 drop path
  (/root/reference/osm/handler.cc:87-88) — and, transitively, the
  dangling-ref way drop (point_database.cc:104-109) — is exercised on
  every input;
- ``(lon, lat) = hilbert_decode(phash)`` — valid WGS84;
- ``tags = parse_kv(caption)`` (space-separated k=v tokens);
- way membership is arithmetic and order-free: a node joins way
  ``way_id = f(coarse_cell(lon,lat), splitmix(id) % k)`` — ways are
  spatially coherent groups; the position inside the way is the stable
  pseudo-random key ``pos = splitmix(id ^ C)`` (assembly sorts by it).
  Way tags are the tags of the member with the smallest pos (the
  "first" node), decided inside the way-build groupby.

Everything is a pure function of the row — no global counts, no
ordering assumptions — so the adapter streams at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.cells import latlng_to_cell
from ..functions.hashing import bucket_of, splitmix64, stable_id64
from ..functions.hilbert import phash_to_lonlat
from ..functions.tags import parse_caption_tags

NEG_MOD = 97            # splitmix(id) % 97 == 0 -> negate id (~1%)
WAY_CELL_RES = 12       # coarse cell that scopes a way
WAY_SUBGROUPS = 4       # ways per cell
_POS_C = np.uint64(0x5851F42D4C957F2D)


def nodes_from_images_batch(batch: pa.Table) -> pa.Table:
    """images -> nodes (id, lon, lat, tags). ``bytes`` is dropped here:
    image payloads must never ride through the join shuffle
    (SURVEY.md §7.4.4); stages that need pixels re-join by image_id."""
    ids = stable_id64(batch["image_id"].to_pylist())
    neg = splitmix64(ids.astype(np.uint64)) % np.uint64(NEG_MOD) == 0
    ids = np.where(neg, -ids, ids)
    lon, lat = phash_to_lonlat(batch["phash"].to_numpy(zero_copy_only=False))
    caption = batch["caption"]
    if isinstance(caption, pa.ChunkedArray):
        caption = caption.combine_chunks()
    tags = parse_caption_tags(caption)
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
        "tags": tags,
    })


def way_membership_batch(batch: pa.Table) -> pa.Table:
    """nodes -> way-membership rows (way_id, pos, ref, tags).

    Note: membership is emitted for ALL nodes including negated-id ones
    — their refs will dangle (the node side drops id<=0), exactly like
    a way referencing a missing node in the reference."""
    ids = batch["id"].to_numpy(zero_copy_only=False)
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    cell = latlng_to_cell(lat, lon, WAY_CELL_RES)
    sub = splitmix64(np.abs(ids).astype(np.uint64)) % np.uint64(WAY_SUBGROUPS)
    way_id = (splitmix64(cell ^ (sub + np.uint64(1))) >> np.uint64(1)).astype(np.int64)
    with np.errstate(over="ignore"):
        pos = (splitmix64(np.abs(ids).astype(np.uint64) ^ _POS_C) >> np.uint64(1)).astype(np.int64)
    return pa.table({
        "way_id": pa.array(way_id, pa.int64()),
        "pos": pa.array(pos, pa.int64()),
        "ref": pa.array(ids, pa.int64()),
        "tags": batch["tags"],
    })


def _build_ways_group(df: pd.DataFrame) -> pa.Table:
    """Per-bucket way construction: order members by pos, way tags from
    the first member."""
    if len(df) == 0:
        return pa.table({
            "way_id": pa.array([], pa.int64()),
            "node_refs": pa.array([], pa.list_(pa.int64())),
            "tags": pa.array([], pa.string()),
        })
    w = df["way_id"].to_numpy()
    pos = df["pos"].to_numpy()
    ref = df["ref"].to_numpy()
    tags = df["tags"].to_numpy()
    order = np.lexsort((pos, w))
    w, ref, tags = w[order], ref[order], tags[order]
    starts = np.flatnonzero(np.concatenate(([True], w[1:] != w[:-1])))
    counts = np.diff(np.concatenate((starts, [len(w)])))
    off = pa.array(np.concatenate(([0], np.cumsum(counts))), pa.int32())
    return pa.table({
        "way_id": pa.array(w[starts], pa.int64()),
        "node_refs": pa.ListArray.from_arrays(off, pa.array(ref, pa.int64())),
        "tags": pa.array(tags[starts], pa.string()),
    })


def adapt_images(images_ds, n_buckets: int | None = None):
    """images Dataset -> (nodes_ds, ways_ds).

    One groupby (bucketed by way_id) constructs the ways side; the
    nodes side is a pure map. The ways groupby is narrow: membership
    rows are (3 ints + tags string) — payload bytes were dropped in
    nodes_from_images_batch. n_buckets defaults to
    config.DEFAULT_JOIN_BUCKETS — deliberately far above the sort
    partition count, because bucket counts ~ reducer counts duplicate
    the sort's sampled boundaries and the empty reduce ranges emit
    schema-less empty blocks that poison every downstream stage with
    RefBundle schema warnings (measured: 5 of 32 adapter output
    blocks were zero-column at n_buckets=32, sf0.1)."""
    from .. import config
    n_buckets = n_buckets or config.DEFAULT_JOIN_BUCKETS
    nodes = images_ds.map_batches(nodes_from_images_batch, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pa.array(bucket_of(t["way_id"].to_numpy(zero_copy_only=False),
                                         n_buckets), pa.int64()))

    from ..stages.util import coalesced
    ways = (coalesced(nodes
                      .map_batches(way_membership_batch, batch_format="pyarrow")
                      .map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(_build_ways_group, batch_format="pandas"))
    return nodes, ways
