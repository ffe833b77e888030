"""Shapefile sink (K1-K4 output parity): round-trip of all three shape
types, DBF name 64-char truncation (shapefile.cc:23), and the per-layer
export over a real convert() output. Plus the S1/S2 Lance-dispatch
contract test (pylance absent from this container)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from osm2shp_ray.sources import shapefile as shp


def test_point_roundtrip(tmp_path):
    base = str(tmp_path / "pts")
    w = shp.ShapefileWriter(base, shp.SHPT_POINT, with_name=True)
    w.add(np.array([1.5]), np.array([-2.5]), "Alpha")
    w.add(np.array([3.0]), np.array([4.0]), "B" * 100)  # > 64 chars
    w.close()
    t, xs, ys = shp.read_shp(base)
    assert t == shp.SHPT_POINT
    assert xs[0][0] == 1.5 and ys[0][0] == -2.5
    names = shp.read_dbf_names(base)
    assert names[0] == "Alpha"
    assert names[1] == "B" * 64      # truncated to the DBF field width
    assert os.path.exists(base + ".prj") and os.path.exists(base + ".shx")
    assert "WGS_1984" in open(base + ".prj").read()


@pytest.mark.parametrize("stype", [shp.SHPT_ARC, shp.SHPT_POLYGON])
def test_varlen_roundtrip(tmp_path, stype):
    base = str(tmp_path / f"t{stype}")
    w = shp.ShapefileWriter(base, stype)
    g1 = (np.array([0.0, 1.0, 2.0]), np.array([0.0, 1.0, 0.0]))
    g2 = (np.array([5.0, 6.0, 6.0, 5.0]), np.array([5.0, 5.0, 6.0, 6.0]))
    w.add(*g1)
    w.add(*g2)
    w.close()
    t, xs, ys = shp.read_shp(base)
    assert t == stype and len(xs) == 2
    assert np.array_equal(xs[0], g1[0]) and np.array_equal(ys[1], g2[1])


def test_export_shapefiles_matches_wkb(ray_session, tmp_path):
    import ray.data as rd
    from osm2shp_ray.functions.wkb import decode_batch
    from osm2shp_ray.pipelines import convert
    from osm2shp_ray.sources.fixtures import nodes_ways_tables
    nodes_t, ways_t = nodes_ways_tables()
    points, ways_out = convert.convert(rd.from_arrow(nodes_t),
                                       rd.from_arrow(ways_t), n_buckets=4)
    points = points.materialize()
    ways_out = ways_out.materialize()
    out = str(tmp_path / "shp")
    counts = shp.export_shapefiles(points, ways_out, out)
    # counts match the datasets
    import collections
    want = collections.Counter(r["layer"] for r in points.take_all())
    want.update(r["layer"] for r in ways_out.take_all())
    got = {k: v for k, v in counts.items() if v}
    assert got == dict(want)
    # geometry round-trip equality on a line layer
    sub = [r for r in ways_out.take_all() if r["layer"] == "roadbig_line"]
    _k, wkb_xs, wkb_ys = decode_batch([r["geometry_wkb"] for r in sub])
    t, xs, ys = shp.read_shp(os.path.join(out, "roadbig_line"))
    assert t == shp.SHPT_ARC and len(xs) == len(wkb_xs)
    key = lambda arrs: sorted(tuple(a.tolist()) for a in arrs)
    assert key(xs) == key(wkb_xs) and key(ys) == key(wkb_ys)
    # point layer carries names in the DBF
    names = shp.read_dbf_names(os.path.join(out, "city_point"))
    assert "Metropolis" in names


def test_read_table_lance_dispatch(ray_session, monkeypatch, tmp_path):
    """S1/S2 contract: with pylance importable, a .lance path
    dispatches to ray.data.read_lance with columns passed through
    (mocked — pylance is absent here); WITHOUT it, the vendored
    reader serves the path (full coverage in tests/test_lance.py)."""
    import sys
    import types

    import ray.data as rd
    from osm2shp_ray.sources import readers
    calls = {}

    def fake_read_lance(path, columns=None, **kw):
        calls["path"], calls["columns"] = path, columns
        return rd.range(3)

    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)
    ds = readers.read_table("/data/images.lance", columns=["image_id", "phash"])
    assert calls == {"path": "/data/images.lance",
                     "columns": ["image_id", "phash"]}
    assert ds.count() == 3
    # without pylance the vendored reader serves the path: a missing
    # dataset is a clear FileNotFoundError, not an ImportError
    monkeypatch.delitem(sys.modules, "lance")
    with pytest.raises(FileNotFoundError, match="lance"):
        readers.read_table(str(tmp_path / "missing.lance"))
