"""The mapgen post-pipeline (P2-P7, /root/reference/mapgen.sh:41-93):
point layers copied untouched; each line layer runs
polyline-build -> Douglas-Peucker generalize -> snap/dedup -> rmline ->
export, with threshold 0.002 (0.001 for roadsmall_line, mapgen.sh:86).

Ray-native shape: everything operates on the assembled-way Dataset
(way_id, layer_idx, xs, ys). The polyline merge groups by
(layer, coarse cell) — distributable, but on its own it never merges
across a coarse cell boundary. A second BOUNDARY-STITCH pass closes
that gap (the reference merges whole layers, mapgen.sh:58): merged
polylines become graph nodes, exact shared-endpoint keys become edges
(within-cell sharing is already merged, so surviving edges are the
cross-boundary ones), distributed connected components label the
cross-cell chains, and each component re-merges with the same kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import config
from ..functions.cells import latlng_to_cell
from ..stages import geometry
from ..stages.classify import LAYER_NAMES
from ..stages.util import coalesced

LINE_LAYERS = ["roadbig_line", "roadmedium_line", "roadsmall_line", "railway_line"]
THRESHOLDS = {name: (0.001 if name == "roadsmall_line" else 0.002)
              for name in LINE_LAYERS}
MERGE_CELL_RES = 6

# rule index -> FIRST rule index of the same sink: the reference
# post-processes one FILE per sink layer (mapgen.sh:63-90), so
# motorway and trunk ways both live in roadbig_line and may merge /
# dedup with each other; the engine canonicalizes layer_idx to the
# sink representative before the line chain (layer NAMES are
# unchanged — LAYER_NAMES[canon] is the same sink name).
_SINK_CANON = np.array(
    [LAYER_NAMES.index(n) for n in LAYER_NAMES], dtype=np.int8)


def _add_merge_key(t: pa.Table) -> pa.Table:
    """(layer, coarse cell of first vertex) group key for the polyline
    MERGE (the break uses segment-level cell cover instead,
    geometry.break_lines)."""
    xs = t["xs"]
    if isinstance(xs, pa.ChunkedArray):
        xs = xs.combine_chunks()
    ys = t["ys"]
    if isinstance(ys, pa.ChunkedArray):
        ys = ys.combine_chunks()
    off = xs.offsets.to_numpy(zero_copy_only=False)
    first = (off - off[0])[:-1]
    fx = xs.flatten().to_numpy(zero_copy_only=False)
    fy = ys.flatten().to_numpy(zero_copy_only=False)
    cell = latlng_to_cell(fy[first], fx[first], MERGE_CELL_RES)
    layer = t["layer_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = (cell.astype(np.int64) << np.int64(4)) | layer
    return t.append_column("merge_key", pa.array(key, pa.int64()))


def postprocess_lines(assembled_ds, merge: bool = True,
                      do_break: bool = True, stitch: bool = True):
    """Assembled ways -> cleaned line layers (non-line layers pass
    through untouched, the P2 point-passthrough analog).

    Chain per mapgen.sh:56-62: polyline merge (P3: per-cell merge +
    boundary stitch, so chains crossing coarse-cell borders merge like
    the reference's whole-layer v.build.polylines) -> Douglas-Peucker
    (P4) -> v.clean snap,break,rmdupl (P5: DISTRIBUTED intersection
    break — segment-level cell cover, geometry.break_lines — then
    snap-key dedup) -> rmline (P6). ``do_break`` costs two extra
    shuffles after simplify — skip it for inputs known to be planar;
    ``stitch=False`` skips the boundary pass (per-cell merge only)."""
    line_idx = pa.array(
        [i for i, n in enumerate(LAYER_NAMES) if n in LINE_LAYERS], pa.int8())

    def split_lines(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_in(t["layer_idx"], value_set=line_idx))

    def split_rest(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.invert(pc.is_in(t["layer_idx"], value_set=line_idx)))

    def canon_sink(t: pa.Table) -> pa.Table:
        li = t["layer_idx"].to_numpy(zero_copy_only=False)
        return t.set_column(t.schema.get_field_index("layer_idx"),
                            "layer_idx",
                            pa.array(_SINK_CANON[li], pa.int8()))

    lines = (assembled_ds.map_batches(split_lines, batch_format="pyarrow")
             .map_batches(canon_sink, batch_format="pyarrow"))
    rest = assembled_ds.map_batches(split_rest, batch_format="pyarrow")

    if merge:
        keyed = coalesced(
            lines.map_batches(_add_merge_key, batch_format="pyarrow"))
        if stitch:
            # two consumers (stop-key scan + merge groupby) and the
            # correctness pre-pass below need the same blocks once
            keyed = keyed.materialize()
            stop_ref = _cross_group_stop_keys(keyed)
        else:
            stop_ref = None
        import functools
        lines = (keyed.groupby("merge_key")
                 .map_groups(functools.partial(_merge_group,
                                               stop_ref=stop_ref),
                             batch_format="pandas"))
        if stitch:
            lines = stitch_lines(lines)

    def simplify(t: pa.Table) -> pa.Table:
        # per-layer threshold: split batch by threshold class
        layer = t["layer_idx"].to_numpy(zero_copy_only=False)
        small = np.asarray([LAYER_NAMES[i] == "roadsmall_line" for i in layer])
        parts = []
        if small.any():
            parts.append(geometry.simplify_batch(t.filter(pa.array(small)), 0.001))
        if (~small).any():
            parts.append(geometry.simplify_batch(t.filter(pa.array(~small)), 0.002))
        return pa.concat_tables(parts) if parts else t

    lines = lines.map_batches(simplify, batch_format="pyarrow")
    if do_break:
        # distributed break: segment-level cell cover finds a crossing
        # wherever it lies (grouping whole FEATURES by their first
        # vertex would miss crossings of long multi-cell polylines)
        lines = geometry.break_lines(lines)
    lines = lines.map_batches(lambda t: geometry.snap_key_batch(t, 0.002),
                              batch_format="pyarrow")

    def keep_first(t: pa.Table) -> pa.Table:
        i = int(np.argmin(t["way_id"].to_numpy(zero_copy_only=False)))
        return t.slice(i, 1).drop_columns(["snap_key"])

    # dedup key includes layer_idx: identical geometries in DIFFERENT
    # line layers must both survive (the reference runs v.clean per
    # layer independently, mapgen.sh:56-62)
    lines = (coalesced(lines).groupby(["layer_idx", "snap_key"])
             .map_groups(keep_first, batch_format="pyarrow"))
    lines = lines.map_batches(geometry.drop_degenerate_batch, batch_format="pyarrow")
    return rest.union(lines)


def _cross_group_stop_keys(keyed_ds):
    """Endpoint keys whose segment-ends span MORE THAN ONE merge group
    — at such a node the per-cell kernel's local degree can differ
    from the global degree (a junction's third branch may start in
    another cell), so pass 1 must not merge through it; the stitch
    pass, whose components contain every sharer, decides with the
    complete view. Returns a ray.put ref of the (lay, kx, ky) set —
    ids-only and bounded by cross-cell endpoints (logged); at extreme
    scale this broadcast becomes a semijoin, same dual as elsewhere."""
    import ray

    from ..functions.hashing import splitmix64

    def endpoint_rows(t: pa.Table) -> pa.Table:
        xs = t["xs"].combine_chunks() if isinstance(t["xs"], pa.ChunkedArray) else t["xs"]
        ys = t["ys"].combine_chunks() if isinstance(t["ys"], pa.ChunkedArray) else t["ys"]
        off = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        fx = xs.flatten().to_numpy(zero_copy_only=False)
        fy = ys.flatten().to_numpy(zero_copy_only=False)
        idx = np.concatenate([off[:-1], off[1:] - 1])
        lay = np.tile(t["layer_idx"].to_numpy(zero_copy_only=False)
                      .astype(np.int64), 2)
        grp = np.tile(t["merge_key"].to_numpy(zero_copy_only=False), 2)
        # same quantization as the merge kernel's endpoint key
        qx = np.round(fx[idx] / 1e-9).astype(np.int64)
        qy = np.round(fy[idx] / 1e-9).astype(np.int64)
        with np.errstate(over="ignore"):
            kb = (splitmix64(qx.astype(np.uint64)
                             ^ splitmix64(qy.astype(np.uint64))
                             ^ lay.astype(np.uint64))
                  % np.uint64(64)).astype(np.int64)
        return pa.table({
            "lay": pa.array(lay), "qx": pa.array(qx), "qy": pa.array(qy),
            "grp": pa.array(grp), "__kb": pa.array(kb),
        })

    def cross_in_bucket(df) -> pa.Table:
        nun = df.groupby(["lay", "qx", "qy"])["grp"].nunique()
        hit = nun[nun > 1].reset_index()[["lay", "qx", "qy"]]
        return pa.Table.from_pandas(hit, preserve_index=False).cast(
            pa.schema([("lay", pa.int64()), ("qx", pa.int64()),
                       ("qy", pa.int64())]))

    rows = (keyed_ds.map_batches(endpoint_rows, batch_format="pyarrow")
            .groupby("__kb").map_groups(cross_in_bucket,
                                        batch_format="pandas")
            .take_all())
    stop = {(r["lay"], r["qx"], r["qy"]) for r in rows}
    if stop:
        print(f"mapgen: {len(stop)} cross-cell endpoint keys excluded "
              f"from the per-cell merge (stitch decides them)")
    return ray.put(stop)


def _merge_group(df, stop_ref=None) -> pa.Table:
    stop = None
    if stop_ref is not None:
        import ray
        stop = ray.get(stop_ref)
    out = geometry.merge_lines_group(df, stop_keys=stop)
    # unique deterministic ids across groups: derive from the group key
    base = np.int64(df["merge_key"].iloc[0]) << np.int64(16) if len(df) else np.int64(0)
    ids = base + np.arange(out.num_rows, dtype=np.int64)
    return out.set_column(out.schema.get_field_index("way_id"), "way_id",
                          pa.array(ids, pa.int64()))


_STITCH_EPS = 1e-9  # MUST equal merge_lines_group's endpoint key eps


def stitch_lines(lines_ds, label_cap: int = 1_000_000):
    """Boundary-stitch pass after the per-cell merge: re-merges chains
    that the (layer, cell) partitioning left split at cell borders.

    Polylines are nodes; an exact shared-endpoint key (the same
    round(x/eps) quantization as the merge kernel) between two
    polylines is an edge. Within-cell shareable endpoints were already
    merged, so the edge set is only border crossings plus junctions —
    orders of magnitude smaller than the feature set. Distributed
    connected components (stages/components.py) label the chains, and
    each component re-merges with the same kernel, which re-applies
    the junction rules over the component's complete neighborhood
    (every endpoint-sharing polyline is IN the component by
    construction).

    Label attach is the usual small-side dual: at or below
    ``label_cap`` labels the (id -> root) map is collected ids-only
    and broadcast (one ``ray.put``, searchsorted per batch — no
    shuffle of the geometry payloads); above it, labels stay a
    Dataset and attach via a distributed left ``hash_join``, so no
    driver-side array ever exceeds the cap even on adversarial
    inputs where most features touch a cell border.
    """
    import ray
    import pyarrow.compute as pc

    from ..functions.hashing import splitmix64
    from ..stages.components import connected_components

    # materialize ONCE up front: the edges pipeline and the labeled
    # split below are two consumers, and without this the upstream
    # per-cell merge shuffle re-executes for each (Ray lineage)
    lines_ds = lines_ds.materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        xs = t["xs"].combine_chunks() if isinstance(t["xs"], pa.ChunkedArray) else t["xs"]
        ys = t["ys"].combine_chunks() if isinstance(t["ys"], pa.ChunkedArray) else t["ys"]
        off = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        fx = xs.flatten().to_numpy(zero_copy_only=False)
        fy = ys.flatten().to_numpy(zero_copy_only=False)
        first = off[:-1]
        last = off[1:] - 1
        idx = np.concatenate([first, last])
        wid = np.tile(t["way_id"].to_numpy(zero_copy_only=False), 2)
        lay = np.tile(t["layer_idx"].to_numpy(zero_copy_only=False)
                      .astype(np.int64), 2)
        return pa.table({
            "qx": pa.array(np.round(fx[idx] / _STITCH_EPS).astype(np.int64)),
            "qy": pa.array(np.round(fy[idx] / _STITCH_EPS).astype(np.int64)),
            "lay": pa.array(lay, pa.int64()),
            "way_id": pa.array(wid, pa.int64()),
        })

    def make_edges(t: pa.Table) -> pa.Table:
        ids = np.unique(t["way_id"].to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        return pa.table({"id_a": pa.array(np.full(len(ids) - 1, ids[0])),
                         "id_b": pa.array(ids[1:])})

    edges = (coalesced(lines_ds.map_batches(endpoints, batch_format="pyarrow"))
             .groupby(["lay", "qx", "qy"])
             .map_groups(make_edges, batch_format="pyarrow")
             .materialize())
    if edges.count() == 0:
        return lines_ds

    labels_ds = connected_components(edges).materialize()
    n_labels = labels_ds.count()
    orig_names = [n for n in lines_ds.schema().names]

    if n_labels <= label_cap:
        labels = labels_ds.take_all()  # ids only: the number of
        # border-crossing polylines, not features or vertices
        member_ids = np.array([r["id"] for r in labels], dtype=np.int64)
        roots = np.array([r["root"] for r in labels], dtype=np.int64)
        order = np.argsort(member_ids)
        lut_ref = ray.put((member_ids[order], roots[order]))

        def add_root(t: pa.Table) -> pa.Table:
            import ray as _ray
            ids_s, roots_s = _ray.get(lut_ref)
            w = t["way_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ids_s, w)
            pos = np.clip(pos, 0, max(len(ids_s) - 1, 0))
            hit = (len(ids_s) > 0) & (ids_s[pos] == w)
            root = np.where(hit, roots_s[pos], np.int64(-1))
            return t.append_column("stitch_root", pa.array(root, pa.int64()))

        labeled = lines_ds.map_batches(add_root, batch_format="pyarrow")
    else:
        from ..stages.joins import hash_join
        print(f"stitch_lines: {n_labels} labels exceed label_cap="
              f"{label_cap}; attaching roots via distributed hash_join")
        lab = labels_ds.map_batches(
            lambda t: pa.table({"way_id": t["id"], "stitch_root": t["root"]}),
            batch_format="pyarrow")

        def fill_unlabeled(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("stitch_root")
            t = t.set_column(i, "stitch_root",
                             pc.fill_null(t["stitch_root"], -1))
            return t.select(orig_names + ["stitch_root"])

        labeled = (hash_join(lines_ds, lab, on="way_id", how="left")
                   .map_batches(fill_unlabeled, batch_format="pyarrow"))

    # materialize: the labeled set itself feeds two consumers
    # (members + pass-through)
    labeled = labeled.materialize()
    rest = labeled.map_batches(
        lambda t: t.filter(pc.equal(t["stitch_root"], -1))
                   .drop_columns(["stitch_root"]),
        batch_format="pyarrow")
    members = labeled.map_batches(
        lambda t: t.filter(pc.not_equal(t["stitch_root"], -1)),
        batch_format="pyarrow")

    def merge_component(df) -> pa.Table:
        out = geometry.merge_lines_group(df)
        root = np.uint64(np.int64(df["stitch_root"].iloc[0]))
        base = np.int64((splitmix64(np.array([root]))[0]
                         >> np.uint64(17)) << np.uint64(16))
        ids = base + np.arange(out.num_rows, dtype=np.int64)
        return out.set_column(out.schema.get_field_index("way_id"),
                              "way_id", pa.array(ids, pa.int64()))

    merged = (members.groupby("stitch_root")
              .map_groups(merge_component, batch_format="pandas"))
    return rest.union(merged)
