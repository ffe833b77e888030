"""Golden-output conformance: the distributed pipeline must reproduce
the pure-Python oracle (literal handler.cc semantics) exactly —
per-layer counts, names, and verbatim vertex sequences (SURVEY.md §5.1).
"""

import numpy as np
import pytest

import ray.data as rd

from osm2shp_ray.functions import wkb
from osm2shp_ray.oracle import pyoracle
from osm2shp_ray.pipelines import adapter, convert
from osm2shp_ray.sources import fixtures


def _points_by_layer(points_ds):
    out = {}
    for r in points_ds.take_all():
        out.setdefault(r["layer"], []).append((r["x"], r["y"], r["name"]))
    return out


def _ways_by_layer(ways_ds):
    out = {}
    for r in ways_ds.take_all():
        kind, xs, ys = wkb.decode(r["geometry_wkb"])
        out.setdefault(r["layer"], []).append((r["way_id"], kind, xs.tolist(), ys.tolist()))
    return out


@pytest.fixture(scope="module")
def osm_fixture(ray_session):
    nodes_t, ways_t = fixtures.nodes_ways_tables()
    return rd.from_arrow(nodes_t), rd.from_arrow(ways_t), nodes_t, ways_t


def test_conformance_osm_analog(osm_fixture):
    nodes_ds, ways_ds, nodes_t, ways_t = osm_fixture
    points, ways_out = convert.convert(nodes_ds, ways_ds, n_buckets=8)
    got_points = _points_by_layer(points)
    got_ways = _ways_by_layer(ways_out)

    oracle = pyoracle.convert_oracle(nodes_t.to_pylist(), ways_t.to_pylist())

    # points: exact sets of (x, y, name) per layer
    assert set(got_points) == set(oracle.points)
    for layer in oracle.points:
        assert sorted(got_points[layer]) == sorted(oracle.points[layer]), layer

    # ways: per-layer sets of (way_id, verbatim vertex sequence)
    assert set(got_ways) == set(oracle.ways)
    for layer in oracle.ways:
        exp = sorted((wid, xs, ys) for wid, xs, ys in oracle.ways[layer])
        got = sorted((wid, xs, ys) for wid, _k, xs, ys in got_ways[layer])
        assert got == exp, layer

    # counter parity (A2): exported totals exactly equal
    assert sum(len(v) for v in got_points.values()) == oracle.exported_nodes
    assert sum(len(v) for v in got_ways.values()) == oracle.exported_ways


def test_conformance_specific_branches(osm_fixture):
    nodes_ds, ways_ds, nodes_t, ways_t = osm_fixture
    points, ways_out = convert.convert(nodes_ds, ways_ds, n_buckets=8)
    got_ways = _ways_by_layer(ways_out)
    got_points = _points_by_layer(points)

    all_way_ids = {wid for lst in got_ways.values() for wid, *_ in lst}
    # dropped: 2-vertex polygon (10), 1-vertex line (11), dangling (12),
    # ref-to-negative-node (13), area+no-poly-rule (15,16), type-mismatch (17),
    # untagged (19), polygon+dangling (20)
    for dropped in (10, 11, 12, 13, 15, 16, 17, 19, 20):
        assert dropped not in all_way_ids, dropped
    # kept: ring with duplicate ref preserved verbatim (way 8)
    water = got_ways["water_area"]
    ring = next(w for w in water if w[0] == 8)
    assert len(ring[2]) == 5 and ring[2][0] == ring[2][-1]  # dup ref scatter
    # overlap way 14 went to roadbig (first match), not railway
    assert 14 in {w[0] for w in got_ways["roadbig_line"]}
    assert 14 not in {w[0] for w in got_ways.get("railway_line", [])}
    # node first-match: 206 is a city, not a town
    assert any(n == "First" for _, _, n in got_points["city_point"])
    assert not any(n == "First" for _, _, n in got_points.get("town_point", []))
    # unnamed place (205) and negative ids (-5, 0) never exported
    names = {n for lst in got_points.values() for _, _, n in lst}
    assert {"Negative", "Zero"}.isdisjoint(names)


def test_conformance_images_adapter(ray_session):
    """End-to-end on the mandated input shape: images -> adapter ->
    convert must match the single-process oracle chain."""
    imgs = fixtures.images_table(400)
    images_ds = rd.from_arrow(imgs)
    nodes_ds, ways_ds = adapter.adapt_images(images_ds, n_buckets=8)
    points, ways_out = convert.convert(nodes_ds, ways_ds, n_buckets=8)

    o_nodes, o_ways = pyoracle.adapt_oracle(imgs.to_pylist())
    oracle = pyoracle.convert_oracle(o_nodes, o_ways)

    got_points = _points_by_layer(points)
    got_ways = _ways_by_layer(ways_out)
    assert {k: len(v) for k, v in got_points.items()} == \
           {k: len(v) for k, v in oracle.points.items()}
    for layer in oracle.points:
        assert sorted(got_points[layer]) == sorted(oracle.points[layer])
    assert {k: len(v) for k, v in got_ways.items()} == \
           {k: len(v) for k, v in oracle.ways.items()}
    for layer in oracle.ways:
        exp = sorted((wid, xs, ys) for wid, xs, ys in oracle.ways[layer])
        got = sorted((wid, xs, ys) for wid, _k, xs, ys in got_ways[layer])
        assert got == exp


def test_crs_metadata_written(osm_fixture, tmp_path):
    """K3 analog: EPSG:4326 recoverable from written parquet."""
    import pyarrow.parquet as pq
    import os
    nodes_ds, ways_ds, _, _ = osm_fixture
    out = str(tmp_path / "o")
    convert.convert(nodes_ds, ways_ds, out_dir=out, n_buckets=4)
    found = False
    for root, _dirs, files in os.walk(out):
        for f in files:
            if f.endswith(".parquet"):
                md = pq.read_schema(os.path.join(root, f)).metadata or {}
                assert md.get(b"crs") == b"EPSG:4326", (root, f, md)
                found = True
    assert found
