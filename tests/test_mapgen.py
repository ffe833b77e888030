"""mapgen postprocess chain (P2-P7) + reader dispatch tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from osm2shp_ray.pipelines import mapgen
from osm2shp_ray.sources import readers
from osm2shp_ray.stages.classify import LAYER_NAMES


def _assembled(rows):
    """rows: list of (way_id, layer_name, [(x,y), ...])."""
    offs = [0]
    xs, ys = [], []
    for _, _, pts in rows:
        xs.extend(p[0] for p in pts)
        ys.extend(p[1] for p in pts)
        offs.append(len(xs))
    off = pa.array(np.array(offs, np.int32), pa.int32())
    return pa.table({
        "way_id": pa.array([r[0] for r in rows], pa.int64()),
        "layer_idx": pa.array([LAYER_NAMES.index(r[1]) for r in rows], pa.int8()),
        "xs": pa.ListArray.from_arrays(off, pa.array(xs, pa.float64())),
        "ys": pa.ListArray.from_arrays(off, pa.array(ys, pa.float64())),
    })


def test_postprocess_merges_and_simplifies(ray_session):
    # two touching road segments (should merge into one polyline), a
    # near-duplicate pair (snap dedup keeps one), a polygon passthrough
    t = _assembled([
        (1, "roadbig_line", [(0.0, 0.0), (0.01, 0.0)]),
        (2, "roadbig_line", [(0.01, 0.0), (0.02, 0.0)]),
        (3, "roadmedium_line", [(1.0, 1.0), (1.01, 1.0)]),
        (4, "roadmedium_line", [(1.0, 1.0001), (1.01, 1.0001)]),  # snap-dup of 3
        (5, "water_area", [(5.0, 5.0), (5.1, 5.0), (5.1, 5.1)]),
        (6, "railway_line", [(2.0, 2.0), (2.0, 2.0)]),             # degenerate
    ])
    out = mapgen.postprocess_lines(rd.from_arrow(t)).take_all()
    by_layer = {}
    for r in out:
        by_layer.setdefault(LAYER_NAMES[r["layer_idx"]], []).append(r)
    assert len(by_layer["roadbig_line"]) == 1          # merged 1+2
    # merged chain spans both segments; DP then drops the collinear mid
    assert by_layer["roadbig_line"][0]["xs"][0] in (0.0, 0.02)
    assert abs(by_layer["roadbig_line"][0]["xs"][-1]
               - (0.02 - by_layer["roadbig_line"][0]["xs"][0])) < 1e-12
    assert len(by_layer["roadmedium_line"]) == 1       # snap-deduped 3/4
    assert len(by_layer["water_area"]) == 1            # passthrough
    assert "railway_line" not in by_layer              # degenerate removed


def test_simplify_thresholds(ray_session):
    # zigzag below threshold collapses for roadbig (0.002) but a larger
    # detour survives
    t = _assembled([
        (1, "roadbig_line", [(0.0, 0.0), (0.005, 0.0005), (0.01, 0.0)]),
        (2, "roadbig_line", [(0.0, 0.0), (0.005, 0.5), (0.01, 0.0)]),
    ])
    out = mapgen.postprocess_lines(rd.from_arrow(t), merge=False).take_all()
    sizes = {r["way_id"]: len(r["xs"]) for r in out}
    assert sizes[1] == 2 and sizes[2] == 3


def test_reader_dispatch(tmp_path):
    import pyarrow.parquet as pq
    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"a": [1, 2]}), p)
    assert readers.discover_input(str(tmp_path / "t")) == str(p)
    with pytest.raises(FileNotFoundError):
        readers.discover_input(str(tmp_path / "missing"))
    with pytest.raises(NotImplementedError):
        readers.read_table("x.xml")
    # .lance now dispatches to the vendored reader (tests/test_lance.py);
    # a nonexistent dataset is a clear FileNotFoundError, not ImportError
    with pytest.raises(FileNotFoundError):
        readers.read_table("x.lance")


def test_reader_parquet(ray_session, tmp_path):
    import pyarrow.parquet as pq
    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": [1, 2, 3]}), p)
    assert readers.read_table(p).count() == 3
