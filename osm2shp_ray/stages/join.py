"""The distributed node-ref -> coordinate join (J1/J2, SURVEY.md §2.4).

This replaces the reference's entire sqlite staging machinery
(/root/reference/osm/point_database.cc): its ``set`` during the node
phase (handler.cc:90) + batched ``SELECT ... IN (...)`` lookups of 128
ids (point_database.cc:48-112) become one distributed bucketed hash
join expressed purely in Ray Data:

    ways -> explode to (ref, way_id, pos, layer_idx) rows
    nodes(id>0) -> (ref, x, y)
    union -> groupby(bucket(ref)).map_groups(attach coords)
          -> groupby(bucket(way_id)).map_groups(assemble ordered arrays)

Reference contracts reproduced:
- positional scatter: every position referencing an id receives its
  coordinates, duplicate refs included (point_database.cc:88-95) — the
  explode emits one row per POSITION, so duplicates are naturally
  preserved;
- completeness gate: any unresolved ref drops the whole way, which is
  NOT retried on other layers (point_database.cc:104-109,
  handler.cc:118-121) — classification already happened pre-explode;
- vertex order: restored by an explicit (way_id, pos) sort inside
  assemble — no reliance on dataset order (SURVEY.md §4 'Ordering').

Scale notes (100 TB design): the two groupbys are the only wide
exchanges in the conversion pipeline; the bucket count should be
~4x total cluster cores (default config.DEFAULT_JOIN_BUCKETS locally).
Buckets are avalanched hashes of the key, so sequential-id skew cannot
concentrate; a single pathological hot *ref* can further be split by
raising n_buckets (refs of one node stay correct across buckets only
via replication — not needed for OSM-shaped data where node in-degree
is bounded by way membership). Exploded rows carry only
(ref, way_id, pos, layer_idx) — 25 bytes/row; image payloads never
enter the shuffle (SURVEY.md §7.4.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import config
from ..functions.hashing import bucket_of

_NODE_MARK = np.int64(-1)


def explode_ways_batch(batch: pa.Table) -> pa.Table:
    """Classified ways -> one row per (way, position). Vectorized via
    list offsets (the pc.list_flatten / list_parent_indices pattern)."""
    refs = batch["node_refs"]
    if isinstance(refs, pa.ChunkedArray):
        refs = refs.combine_chunks()
    offsets = refs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = refs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets - offsets[0])
    way_id = np.repeat(batch["way_id"].to_numpy(zero_copy_only=False), counts)
    layer_idx = np.repeat(batch["layer_idx"].to_numpy(zero_copy_only=False), counts)
    ends = np.cumsum(counts)
    pos = (np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64)
           - np.repeat(ends - counts, counts)).astype(np.int32)
    return pa.table({
        "ref": pa.array(flat, pa.int64()),
        "way_id": pa.array(way_id, pa.int64()),
        "pos": pa.array(pos, pa.int32()),
        "layer_idx": pa.array(layer_idx, pa.int8()),
        "x": pa.array(np.full(len(flat), np.nan), pa.float64()),
        "y": pa.array(np.full(len(flat), np.nan), pa.float64()),
    })


def nodes_side_batch(batch: pa.Table) -> pa.Table:
    """Nodes -> join side rows (id>0 filter = M1, handler.cc:87-88;
    staging is unconditional on tags, handler.cc:90)."""
    ids = batch["id"].to_numpy(zero_copy_only=False)
    keep = np.flatnonzero(ids > 0)
    n = len(keep)
    return pa.table({
        "ref": pa.array(ids[keep], pa.int64()),
        "way_id": pa.array(np.full(n, _NODE_MARK), pa.int64()),
        "pos": pa.array(np.zeros(n, np.int32), pa.int32()),
        "layer_idx": pa.array(np.zeros(n, np.int8), pa.int8()),
        "x": pa.array(batch["lon"].to_numpy(zero_copy_only=False)[keep], pa.float64()),
        "y": pa.array(batch["lat"].to_numpy(zero_copy_only=False)[keep], pa.float64()),
    })


def _attach_group(df: pd.DataFrame) -> pd.DataFrame:
    """Per-ref-bucket coordinate attach: hash-join refs against the
    node rows of the same bucket (pandas C-level merge)."""
    if len(df):
        from ..state.metrics import observe_partition
        observe_partition("join_ref_bucket", df["bucket"].iloc[0], len(df))
    is_node = df["way_id"].values == _NODE_MARK
    nodes = df.loc[is_node, ["ref", "x", "y"]]
    refs = df.loc[~is_node, ["ref", "way_id", "pos", "layer_idx"]]
    if len(nodes):
        # deterministic winner under (rare) id collisions
        nodes = nodes.sort_values(["ref", "x", "y"]).drop_duplicates("ref", keep="first")
    # ref rides along so the assembly side can LOG which node ids were
    # unresolved (the reference prints "unresolved node <ref>" per
    # dropped way, point_database.cc:104-109)
    from .util import arrow_table
    return arrow_table(refs.merge(nodes, on="ref", how="left"))


def resolve_ways(nodes_ds, ways_classified_ds, n_buckets: int | None = None,
                 salt: int = 1):
    """nodes Dataset (id, lon, lat, ...) x classified ways Dataset
    (way_id, node_refs, layer_idx, geom_type) -> Dataset
    (way_id, layer_idx, xs list<f64>, ys list<f64>) of complete ways.

    ``salt > 1`` enables hot-key mitigation for the ref shuffle: each
    exploded ref row is salted by hash(way_id) % salt, so one node
    referenced by millions of ways spreads across ``salt`` reducers;
    the node side is replicated salt-fold (cheap: nodes are 24-byte
    rows) so every salted bucket can still resolve every ref. Use when
    the ref-degree histogram is skewed (hub nodes); output is
    byte-identical to salt=1 (tests/test_join_salt.py)."""
    import ray.data  # noqa: F401  (Dataset methods only; no init)

    b = n_buckets or config.DEFAULT_JOIN_BUCKETS
    s = max(1, salt)

    exploded = ways_classified_ds.map_batches(
        lambda t: explode_ways_batch(t), batch_format="pyarrow")
    node_side = nodes_ds.map_batches(
        lambda t: nodes_side_batch(t), batch_format="pyarrow")

    if s > 1:
        def salt_refs(t: pa.Table) -> pa.Table:
            from ..functions.hashing import splitmix64
            w = t["way_id"].to_numpy(zero_copy_only=False)
            sv = (splitmix64(w.astype(np.uint64)) % np.uint64(s)).astype(np.int64)
            return t.append_column("salt", pa.array(sv, pa.int64()))

        def replicate_nodes(t: pa.Table) -> pa.Table:
            parts = [t.append_column("salt", pa.array(
                np.full(t.num_rows, k, np.int64))) for k in range(s)]
            return pa.concat_tables(parts)

        exploded = exploded.map_batches(salt_refs, batch_format="pyarrow")
        node_side = node_side.map_batches(replicate_nodes, batch_format="pyarrow")

    def add_ref_bucket(t: pa.Table) -> pa.Table:
        refs = t["ref"].to_numpy(zero_copy_only=False)
        if s > 1:
            # salted key: (ref, salt) -> bucket
            with np.errstate(over="ignore"):
                key = refs.astype(np.uint64) * np.uint64(2654435761) \
                    ^ t["salt"].to_numpy(zero_copy_only=False).astype(np.uint64)
            bcol = bucket_of(key.view(np.int64), b)
            t = t.drop_columns(["salt"])
        else:
            bcol = bucket_of(refs, b)
        return t.append_column("bucket", pa.array(bcol, pa.int64()))

    from .util import coalesced

    # coalesce before the wide op: union of two deep map chains carries
    # hundreds of tiny inherited blocks, and sort-shuffle cost is
    # quadratic in block count (see util.shuffle_blocks)
    unioned = coalesced(
        exploded.union(node_side).map_batches(add_ref_bucket, batch_format="pyarrow"))

    attached = unioned.groupby("bucket").map_groups(
        lambda df: _attach_group(df), batch_format="pandas")

    def add_way_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "wbucket", pa.array(bucket_of(t["way_id"].to_numpy(zero_copy_only=False), b),
                                pa.int64()))

    assembled = (attached
                 .map_batches(add_way_bucket, batch_format="pyarrow")
                 .groupby("wbucket")
                 .map_groups(lambda df: _assemble_arrow(df), batch_format="pandas"))
    return assembled


def _report_dropped(n_ways: int, n_refs: int, sample_refs: np.ndarray) -> None:
    """J2 drop observability: counters on the metrics actor (visible in
    the CLI's A4 job-end report) + a bounded sample log of the missing
    node ids — the distributed analog of the reference's per-way
    "unresolved node <ref>" stderr line (point_database.cc:106)."""
    try:
        import ray
        ray.get_actor("osm2shp_metrics").inc_many.remote(
            {"dropped_ways": n_ways, "unresolved_refs": n_refs})
    except Exception:
        pass  # no metrics actor in this session — log only
    print(f"join: dropped {n_ways} incomplete ways "
          f"({n_refs} unresolved refs; sample node ids: "
          f"{sample_refs.astype(np.int64).tolist()})")


def _assemble_arrow(df: pd.DataFrame) -> pa.Table:
    """Per-way-bucket ordered assembly + completeness gate (J2),
    emitting Arrow list columns directly (no python-object lists)."""
    if len(df) == 0:
        return pa.table({
            "way_id": pa.array([], pa.int64()),
            "layer_idx": pa.array([], pa.int8()),
            "xs": pa.array([], pa.list_(pa.float64())),
            "ys": pa.array([], pa.list_(pa.float64())),
        })
    w = df["way_id"].to_numpy()
    pos = df["pos"].to_numpy()
    x = df["x"].to_numpy(dtype=np.float64)
    y = df["y"].to_numpy(dtype=np.float64)
    layer = df["layer_idx"].to_numpy()
    order = np.lexsort((pos, w))
    w, pos, x, y, layer = w[order], pos[order], x[order], y[order], layer[order]
    starts = np.flatnonzero(np.concatenate(([True], w[1:] != w[:-1])))
    counts = np.diff(np.concatenate((starts, [len(w)])))
    resolved = ~np.isnan(x)
    complete = np.add.reduceat(resolved, starts) == counts
    keep_rows = np.repeat(complete, counts)
    n_dropped = int((~complete).sum())
    if n_dropped:
        _report_dropped(n_dropped, int((~resolved).sum()),
                        df["ref"].to_numpy()[order][~resolved][:5])
    kc = counts[complete]
    offsets = pa.array(np.concatenate(([0], np.cumsum(kc))), pa.int32())
    xs = pa.ListArray.from_arrays(offsets, pa.array(x[keep_rows], pa.float64()))
    ys = pa.ListArray.from_arrays(offsets, pa.array(y[keep_rows], pa.float64()))
    return pa.table({
        "way_id": pa.array(w[starts][complete], pa.int64()),
        "layer_idx": pa.array(layer[starts][complete], pa.int8()),
        "xs": xs,
        "ys": ys,
    })
