"""The mapgen post-pipeline (P2-P7, /root/reference/mapgen.sh:41-93):
point layers copied untouched; each line layer runs
polyline-build -> Douglas-Peucker generalize -> snap/dedup -> rmline ->
export, with threshold 0.002 (0.001 for roadsmall_line, mapgen.sh:86).

Ray-native shape: everything operates on the assembled-way Dataset
(way_id, layer_idx, xs, ys). The polyline merge groups by
(layer, coarse cell): merges never cross a coarse cell boundary — the
partitioning assumption that makes the merge distributable; cell
resolution is the knob trading merge completeness vs partition size.
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
                      do_break: bool = True):
    """Assembled ways -> cleaned line layers (non-line layers pass
    through untouched, the P2 point-passthrough analog).

    Chain per mapgen.sh:56-62: polyline merge (P3) -> Douglas-Peucker
    (P4) -> v.clean snap,break,rmdupl (P5: DISTRIBUTED intersection
    break — segment-level cell cover, geometry.break_lines — then
    snap-key dedup) -> rmline (P6). ``do_break`` costs two extra
    shuffles after simplify — skip it for inputs known to be planar."""
    line_idx = pa.array(
        [i for i, n in enumerate(LAYER_NAMES) if n in LINE_LAYERS], pa.int8())

    def split_lines(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_in(t["layer_idx"], value_set=line_idx))

    def split_rest(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.invert(pc.is_in(t["layer_idx"], value_set=line_idx)))

    lines = assembled_ds.map_batches(split_lines, batch_format="pyarrow")
    rest = assembled_ds.map_batches(split_rest, batch_format="pyarrow")

    if merge:
        lines = (coalesced(lines.map_batches(_add_merge_key, batch_format="pyarrow"))
                 .groupby("merge_key")
                 .map_groups(_merge_group, batch_format="pandas"))

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


def _merge_group(df) -> pa.Table:
    out = geometry.merge_lines_group(df)
    # unique deterministic ids across groups: derive from the group key
    base = np.int64(df["merge_key"].iloc[0]) << np.int64(16) if len(df) else np.int64(0)
    ids = base + np.arange(out.num_rows, dtype=np.int64)
    return out.set_column(out.schema.get_field_index("way_id"), "way_id",
                          pa.array(ids, pa.int64()))
