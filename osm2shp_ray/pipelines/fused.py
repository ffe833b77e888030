"""Fused image->ways path: 2 shuffles instead of 3.

The generic path (adapter.adapt_images -> classify -> join.resolve_ways)
pays three sort-shuffles: way-build (list assembly), ref-attach, and
way-assemble. When the input is the image table, the way-build shuffle
exists only to decide way tags / classification before exploding the
very lists it just built. This fused path skips it:

    membership rows (ref, way_id, pos, tags)   [pure map]
    ∪ node coord rows (ref, x, y)              [pure map]
    -> groupby(bucket(ref))   : attach coords (hash join)
    -> groupby(bucket(way_id)): assemble + classify + vertex filter +
                                completeness gate in ONE group kernel

Semantic equivalence with the generic path (asserted in
tests/test_fused.py): classification uses the same first-match rules on
the way's tags (first member by pos — identical to the way-build rule);
a way that matches no rule is dropped either way; a matched way with
any unresolved ref is dropped whole (J2). The only difference is WHEN
unmatched ways are pruned — post-join here, pre-join there — which
trades a slightly larger shuffle for one fewer barrier; output is
identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import config
from ..functions.hashing import bucket_of
from ..stages.classify import GEOM_LINE, GEOM_POLYGON, first_match_layer, is_area
from ..stages.util import coalesced
from .adapter import nodes_from_images_batch, way_membership_batch


def _member_side(t: pa.Table) -> pa.Table:
    m = way_membership_batch(t)
    n = m.num_rows
    return pa.table({
        "ref": m["ref"],
        "way_id": m["way_id"],
        "pos": m["pos"],
        "tags": m["tags"],
        "x": pa.array(np.full(n, np.nan), pa.float64()),
        "y": pa.array(np.full(n, np.nan), pa.float64()),
    })


def _node_side(t: pa.Table) -> pa.Table:
    ids = t["id"].to_numpy(zero_copy_only=False)
    keep = np.flatnonzero(ids > 0)
    n = len(keep)
    return pa.table({
        "ref": pa.array(ids[keep], pa.int64()),
        "way_id": pa.array(np.full(n, -1, np.int64)),
        "pos": pa.array(np.zeros(n, np.int64)),
        "tags": pa.array([""] * n, pa.string()),
        "x": pa.array(t["lon"].to_numpy(zero_copy_only=False)[keep], pa.float64()),
        "y": pa.array(t["lat"].to_numpy(zero_copy_only=False)[keep], pa.float64()),
    })


def _attach(df: pd.DataFrame) -> pd.DataFrame:
    is_node = df["way_id"].values == -1
    nodes = df.loc[is_node, ["ref", "x", "y"]]
    refs = df.loc[~is_node, ["ref", "way_id", "pos", "tags"]]
    if len(nodes):
        nodes = nodes.sort_values(["ref", "x", "y"]).drop_duplicates("ref", keep="first")
    out = refs.merge(nodes, on="ref", how="left")
    from ..stages.util import arrow_table
    return arrow_table(out.drop(columns=["ref"]))


def _assemble_classify(df: pd.DataFrame) -> pa.Table:
    empty = pa.table({
        "way_id": pa.array([], pa.int64()),
        "layer_idx": pa.array([], pa.int8()),
        "xs": pa.array([], pa.list_(pa.float64())),
        "ys": pa.array([], pa.list_(pa.float64())),
    })
    if len(df) == 0:
        return empty
    w = df["way_id"].to_numpy()
    pos = df["pos"].to_numpy()
    x = df["x"].to_numpy(dtype=np.float64)
    y = df["y"].to_numpy(dtype=np.float64)
    tags = df["tags"].to_numpy()
    order = np.lexsort((pos, w))
    w, pos, x, y, tags = w[order], pos[order], x[order], y[order], tags[order]
    starts = np.flatnonzero(np.concatenate(([True], w[1:] != w[:-1])))
    counts = np.diff(np.concatenate((starts, [len(w)])))
    # way tags = first member's tags (same rule the way-build stage uses)
    way_tags = pa.array(tags[starts], pa.string())
    area = is_area(way_tags)
    geom = np.where(area, GEOM_POLYGON, GEOM_LINE).astype(np.int8)
    ok_len = ~(((geom == GEOM_POLYGON) & (counts < 3)) | (counts < 2))
    layer = first_match_layer(way_tags, geom)
    resolved = ~np.isnan(x)
    complete = np.add.reduceat(resolved, starts) == counts
    keep = ok_len & (layer >= 0) & complete
    if not keep.any():
        return empty
    keep_rows = np.repeat(keep, counts)
    kc = counts[keep]
    offsets = pa.array(np.concatenate(([0], np.cumsum(kc))), pa.int32())
    return pa.table({
        "way_id": pa.array(w[starts][keep], pa.int64()),
        "layer_idx": pa.array(layer[keep], pa.int8()),
        "xs": pa.ListArray.from_arrays(offsets, pa.array(x[keep_rows], pa.float64())),
        "ys": pa.ListArray.from_arrays(offsets, pa.array(y[keep_rows], pa.float64())),
    })


def assembled_ways_fused(images_meta_ds, n_buckets: int | None = None,
                         coalesce: bool = True):
    """images meta Dataset (image_id, caption, phash) -> assembled ways
    (way_id, layer_idx, xs, ys) with two shuffles.

    ``coalesce=False`` skips the pre-shuffle repartition barrier — pass
    it when the caller already right-sized the read blocks
    (override_num_blocks≈cpus), where the repartition is pure overhead."""
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS
    nodes = images_meta_ds.map_batches(nodes_from_images_batch, batch_format="pyarrow")
    member = nodes.map_batches(_member_side, batch_format="pyarrow")
    node_side = nodes.map_batches(_node_side, batch_format="pyarrow")

    def add_ref_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", pa.array(
            bucket_of(t["ref"].to_numpy(zero_copy_only=False), b), pa.int64()))

    unioned = member.union(node_side).map_batches(add_ref_bucket,
                                                  batch_format="pyarrow")
    if coalesce:
        unioned = coalesced(unioned)
    attached = unioned.groupby("bucket").map_groups(_attach, batch_format="pandas")

    def add_way_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("wbucket", pa.array(
            bucket_of(t["way_id"].to_numpy(zero_copy_only=False), b), pa.int64()))

    return (attached.map_batches(add_way_bucket, batch_format="pyarrow")
            .groupby("wbucket")
            .map_groups(_assemble_classify, batch_format="pandas"))
