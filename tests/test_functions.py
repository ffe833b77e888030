"""Unit tests for the pure-function layer (no Ray needed)."""

import numpy as np
import pyarrow as pa
import pytest

from osm2shp_ray.functions import cells, codec, hilbert, pip, tags, wkb
from osm2shp_ray.functions.hashing import (bucket_of, fnv1a_bytes, hash_strings,
                                           splitmix64, stable_id64)


def test_hash_strings_matches_scalar_fnv():
    vals = ["", "a", "abc", "hello world", "img-000000042"]
    vec = hash_strings(vals)
    for v, hv in zip(vals, vec):
        assert int(hv) == fnv1a_bytes(v.encode())


def test_stable_id64_positive_and_deterministic():
    ids = stable_id64([f"img-{i:09d}" for i in range(1000)])
    assert (ids > 0).all()
    ids2 = stable_id64([f"img-{i:09d}" for i in range(1000)])
    assert np.array_equal(ids, ids2)
    assert len(np.unique(ids)) == 1000  # no collisions on this corpus


def test_bucket_spread():
    keys = np.arange(100_000, dtype=np.int64)
    b = bucket_of(keys, 64)
    counts = np.bincount(b, minlength=64)
    assert counts.min() > 100_000 / 64 * 0.8


def test_hilbert_roundtrip():
    d = np.arange(4096, dtype=np.uint64)
    x, y = hilbert.d2xy(6, d)
    assert np.array_equal(hilbert.xy2d(6, x, y), d)
    # adjacency: consecutive distances are grid neighbors
    dist = np.abs(np.diff(x.astype(np.int64))) + np.abs(np.diff(y.astype(np.int64)))
    assert (dist == 1).all()


def test_phash_lonlat_range():
    lon, lat = hilbert.phash_to_lonlat(np.array([0, 1, 2**31, 2**32 - 1, -5]))
    assert (lon >= -180).all() and (lon < 180).all()
    assert (lat >= -90).all() and (lat < 90).all()


def test_cells_roundtrip_and_parent():
    lat = np.array([0.0, 45.0, -45.0, 89.9, -89.9])
    lon = np.array([0.0, 90.0, -90.0, 179.9, -179.9])
    c = cells.latlng_to_cell(lat, lon, 15)
    assert (cells.cell_res(c) == 15).all()
    clat, clon = cells.cell_center(c)
    assert np.abs(clat - lat).max() < 180.0 / (1 << 15)
    assert np.abs(clon - lon).max() < 360.0 / (1 << 15)
    p = cells.cell_to_parent(c, 10)
    assert (cells.cell_res(p) == 10).all()
    # parent of center == parent cell
    assert np.array_equal(cells.latlng_to_cell(clat, clon, 10), p)


def test_grid_disk():
    c = cells.latlng_to_cell(np.array([10.0]), np.array([10.0]), 8)[0]
    disk0 = cells.grid_disk(int(c), 0)
    assert disk0.tolist() == [int(c)]
    disk2 = cells.grid_disk(int(c), 2)
    assert len(disk2) == 25
    assert int(c) in disk2.tolist()
    ring2 = cells.grid_ring(int(c), 2)
    assert len(ring2) == 16


def test_s2ish_locality():
    lat = np.full(100, 37.0) + np.arange(100) * 1e-4
    lon = np.full(100, -122.0)
    c = cells.latlng_to_s2ish(lat, lon, 13)
    # nearby points -> few distinct, numerically close ids
    u = np.unique(c)
    assert len(u) <= 3


def test_wkb_point_roundtrip():
    xs = np.array([1.5, -3.25])
    ys = np.array([2.5, 4.75])
    blobs = wkb.encode_points(xs, ys)
    for i, b in enumerate(blobs):
        kind, x, y = wkb.decode(b)
        assert kind == "point" and x[0] == xs[i] and y[0] == ys[i]


def test_wkb_linestring_polygon_verbatim():
    offs = np.array([0, 3, 7])
    xs = np.arange(7, dtype=float)
    ys = np.arange(7, dtype=float) * 2
    lines = wkb.encode_linestrings(offs, xs, ys)
    k, x, y = wkb.decode(lines[1])
    assert k == "line" and np.array_equal(x, xs[3:7]) and np.array_equal(y, ys[3:7])
    polys = wkb.encode_polygons(offs, xs, ys)
    k, x, y = wkb.decode(polys[0])
    # ring NOT auto-closed (shapefile.cc:41-49 verbatim-vertex contract)
    assert k == "polygon" and np.array_equal(x, xs[0:3]) and x[0] != x[-1]


def test_tag_value():
    t = pa.array(["place=city name=Alpha", "highway=motorway", "", "name=x place=town"])
    v = tags.tag_value(t, "place")
    assert v.to_pylist() == ["city", None, None, "town"]
    assert tags.tag_value(t, "name").to_pylist() == ["Alpha", None, None, "x"]


def test_parse_caption_tags():
    c = pa.array(["aerial view place=city name=Alpha7", "scenic photo of a lake"])
    out = tags.parse_caption_tags(c)
    assert out.to_pylist() == ["place=city name=Alpha7", ""]


def test_tags_from_map():
    m = pa.array([[("a", "1"), ("b", "2")], []], type=pa.map_(pa.string(), pa.string()))
    assert tags.tags_from_map(m).to_pylist() == ["a=1 b=2", ""]


def test_png_roundtrip_lossless():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 17, 3), dtype=np.uint8)
    assert np.array_equal(codec.decode_png(codec.encode_png(img)), img)


def test_lossy_psnr_above_40():
    """The mandated invariant: default-quality JPEG holds >= 40 dB on
    the fixture's own (natural-spectrum) content, across every size
    class, with real margin (>= 43 dB measured)."""
    from osm2shp_ray.sources.fixtures import ground_truth_pixels
    for i, (w, h) in enumerate([(16, 16), (32, 32), (64, 64), (64, 16)]):
        img = ground_truth_pixels(i, w, h)
        dec = codec.decode_lossy(codec.encode_lossy(img))
        assert codec.psnr(img, dec) >= 43.0
    # and JFIF magic: "jpeg" rows are REAL baseline JPEG since round 4
    assert codec.encode_lossy(ground_truth_pixels(0, 16, 16))[:2] == b"\xff\xd8"


def test_decode_dispatch_unknown():
    with pytest.raises(NotImplementedError):
        codec.decode_image(b"xx", "webp")


def test_resize_box():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:8] = 200
    out = codec.resize_box(img, 4, 4)
    assert out.shape == (4, 4, 3)
    assert (out[:2] == 200).all() and (out[2:] == 0).all()


def test_pip_square_and_overlap():
    # two overlapping unit squares; first-match goes to index 0
    prep = pip.PreparedPolygons(
        ["t0", "t1"],
        [np.array([0.0, 2.0, 2.0, 0.0]), np.array([1.0, 3.0, 3.0, 1.0])],
        [np.array([0.0, 0.0, 2.0, 2.0]), np.array([0.0, 0.0, 2.0, 2.0])],
    )
    px = np.array([0.5, 1.5, 2.5, 5.0])
    py = np.array([0.5, 1.0, 1.0, 5.0])
    first = prep.assign_first(px, py)
    assert first.tolist() == [0, 0, 1, -1]
    pts, polys = prep.assign_all(px, py)
    pairs = sorted(zip(pts.tolist(), polys.tolist()))
    assert pairs == [(0, 0), (1, 0), (1, 1), (2, 1)]


def test_pip_concave():
    # U-shape: point in the notch is outside
    rx = np.array([0.0, 6.0, 6.0, 4.0, 4.0, 2.0, 2.0, 0.0])
    ry = np.array([0.0, 0.0, 5.0, 5.0, 2.0, 2.0, 5.0, 5.0])
    prep = pip.PreparedPolygons(["u"], [rx], [ry])
    px = np.array([3.0, 1.0, 5.0])
    py = np.array([4.0, 4.0, 4.0])
    assert prep.assign_first(px, py).tolist() == [-1, 0, 0]


def test_splitmix_deterministic():
    a = splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    b = splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    assert np.array_equal(a, b)
    assert len(np.unique(a)) == 3
