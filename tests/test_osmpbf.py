"""OSM PBF codec (S2): varint/zigzag primitives, blob framing, dense
node + way round-trips against the edge-case fixture corpus, blob
scan-parallel reads, and convert() equality vs the in-memory tables."""

import numpy as np
import pyarrow as pa
import pytest

from osm2shp_ray.sources import osmpbf
from osm2shp_ray.sources.fixtures import nodes_ways_tables


def test_varint_roundtrip():
    rng = np.random.default_rng(3)
    vals = np.concatenate([
        rng.integers(0, 1 << 62, 500, dtype=np.uint64),
        np.array([0, 1, 127, 128, (1 << 64) - 1], dtype=np.uint64)])
    assert np.array_equal(osmpbf.decode_varints(
        np.frombuffer(osmpbf.encode_varints(vals), np.uint8)), vals)
    s = rng.integers(-(1 << 60), 1 << 60, 300)
    assert np.array_equal(osmpbf.unzigzag(osmpbf.zigzag(s)), s)


@pytest.fixture(scope="module")
def pbf_file(tmp_path_factory):
    nodes_t, ways_t = nodes_ways_tables()
    path = str(tmp_path_factory.mktemp("pbf") / "map.osm.pbf")
    # small block_rows forces multiple blobs (the parallel split unit)
    n_blocks = osmpbf.write_osm_pbf(path, nodes_t, ways_t, block_rows=40)
    assert n_blocks >= 3
    return path, nodes_t, ways_t


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(st.integers(0, (1 << 64) - 1), max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_varint_roundtrip_property(vals):
        arr = np.array(vals, dtype=np.uint64)
        got = osmpbf.decode_varints(
            np.frombuffer(osmpbf.encode_varints(arr), np.uint8))
        assert np.array_equal(got, arr)

    @given(st.lists(st.integers(-(1 << 63), (1 << 63) - 1), max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_zigzag_roundtrip_property(vals):
        arr = np.array(vals, dtype=np.int64)
        assert np.array_equal(osmpbf.unzigzag(osmpbf.zigzag(arr)), arr)

    _token = st.text(
        alphabet=st.characters(blacklist_characters=" =",
                               blacklist_categories=("Cs", "Zs", "Cc")),
        min_size=1, max_size=12)

    @given(st.lists(st.tuples(_token, _token), max_size=6))
    @settings(max_examples=30, deadline=None)
    def test_unicode_tags_roundtrip_property(pairs):
        tags = " ".join(f"{k}={v}" for k, v in pairs)
        nodes_t = pa.table({"id": pa.array([7], pa.int64()),
                            "lon": pa.array([1.0]), "lat": pa.array([2.0]),
                            "tags": pa.array([tags], pa.string())})
        ways_t = pa.table({"way_id": pa.array([], pa.int64()),
                           "node_refs": pa.array([], pa.list_(pa.int64())),
                           "tags": pa.array([], pa.string())})
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "t.osm.pbf")
            osmpbf.write_osm_pbf(p, nodes_t, ways_t)
            blobs = osmpbf.scan_blobs(p)
            for off, size, t in blobs:
                if t != "OSMData":
                    continue
                with open(p, "rb") as f:
                    f.seek(off)
                    nt, _wt = osmpbf._decode_block(
                        osmpbf._decompress_blob(f.read(size)))
                assert nt["tags"].to_pylist() == [tags]
except ImportError:
    pass


def test_blob_scan(pbf_file):
    path, _n, _w = pbf_file
    blobs = osmpbf.scan_blobs(path)
    assert blobs[0][2] == "OSMHeader"
    assert sum(1 for _o, _s, t in blobs if t == "OSMData") >= 3


def test_pbf_roundtrip_tables(pbf_file, ray_session):
    path, nodes_t, ways_t = pbf_file
    nodes, ways = osmpbf.read_osm_pbf(path)
    nd = nodes.to_pandas().sort_values("id").reset_index(drop=True)
    ref = nodes_t.to_pandas().sort_values("id").reset_index(drop=True)
    assert nd["id"].tolist() == ref["id"].tolist()
    # coords survive at the PBF's fixed 1e-7-degree precision
    assert np.allclose(nd["lon"], ref["lon"], atol=1e-6)
    assert np.allclose(nd["lat"], ref["lat"], atol=1e-6)
    assert nd["tags"].tolist() == ref["tags"].tolist()
    wd = ways.to_pandas().sort_values("way_id").reset_index(drop=True)
    wref = ways_t.to_pandas().sort_values("way_id").reset_index(drop=True)
    assert wd["way_id"].tolist() == wref["way_id"].tolist()
    assert [list(r) for r in wd["node_refs"]] == \
        [list(r) for r in wref["node_refs"]]
    assert wd["tags"].tolist() == wref["tags"].tolist()


def test_pbf_random_roundtrip(tmp_path, ray_session):
    """Randomized corpus: ids/coords on the PBF's exact 1e-7 grid,
    random tag multiplicities (0-3 per entity) -> byte-exact
    round-trip."""
    rng = np.random.default_rng(17)
    n = 5000
    ids = np.sort(rng.choice(np.arange(1, 10_000_000), n, replace=False))
    lon = rng.integers(-1_800_000_000, 1_800_000_000, n) / 1e7
    lat = rng.integers(-900_000_000, 900_000_000, n) / 1e7
    vocab = ["highway", "name", "place", "x1", "landuse"]
    vals = ["motorway", "Alpha", "city", "v2", "residential", ""]
    def tags():
        k = rng.integers(0, 4)
        return " ".join(f"{rng.choice(vocab)}={rng.choice(vals)}"
                        for _ in range(k))
    nodes_t = pa.table({
        "id": pa.array(ids, pa.int64()),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
        "tags": pa.array([tags() for _ in range(n)], pa.string()),
    })
    ways_t = pa.table({
        "way_id": pa.array(np.arange(1, 301), pa.int64()),
        "node_refs": pa.array([rng.choice(ids, rng.integers(2, 9)).tolist()
                               for _ in range(300)], pa.list_(pa.int64())),
        "tags": pa.array([tags() for _ in range(300)], pa.string()),
    })
    path = str(tmp_path / "rand.osm.pbf")
    osmpbf.write_osm_pbf(path, nodes_t, ways_t, block_rows=1024)
    nodes, ways = osmpbf.read_osm_pbf(path)
    nd = nodes.to_pandas().sort_values("id").reset_index(drop=True)
    assert nd["id"].tolist() == ids.tolist()
    assert np.allclose(nd["lon"], lon, atol=5e-8)   # exact 1e-7 grid
    assert np.allclose(nd["lat"], lat, atol=5e-8)
    assert nd["tags"].tolist() == nodes_t["tags"].to_pylist()
    wd = ways.to_pandas().sort_values("way_id").reset_index(drop=True)
    assert wd["tags"].tolist() == ways_t["tags"].to_pylist()
    assert [list(r) for r in wd["node_refs"]] == \
        [list(r) for r in ways_t["node_refs"].to_pylist()]


def test_plain_node_group_and_negative_offset():
    """Spec coverage: non-dense Node messages and a negative
    lat_offset (int64 two's-complement varint) decode correctly."""
    st, idx = osmpbf._string_table(["place", "city"])
    node = (osmpbf._field(1, 0) + osmpbf.encode_varints(osmpbf.zigzag([42]))
            + osmpbf._packed(2, np.array([idx["place"]], np.uint64))
            + osmpbf._packed(3, np.array([idx["city"]], np.uint64))
            + osmpbf._field(8, 0) + osmpbf.encode_varints(osmpbf.zigzag([500_000_000]))
            + osmpbf._field(9, 0) + osmpbf.encode_varints(osmpbf.zigzag([100_000_000])))
    group = osmpbf._len_field(1, node)
    neg_off = -1_000_000_000  # -1 degree offset in nanodegrees
    block = (osmpbf._len_field(1, st) + osmpbf._len_field(2, group)
             + osmpbf._field(19, 0)
             + osmpbf.encode_varints(np.array([neg_off & ((1 << 64) - 1)],
                                              dtype=np.uint64)))
    nodes, ways = osmpbf._decode_block(block)
    assert nodes["id"].to_pylist() == [42]
    assert nodes["tags"].to_pylist() == ["place=city"]
    assert abs(nodes["lat"][0].as_py() - (50.0 - 1.0)) < 1e-9
    assert abs(nodes["lon"][0].as_py() - 10.0) < 1e-9
    assert ways.num_rows == 0


def test_required_features_rejection(tmp_path, ray_session):
    import struct as _s
    import zlib as _z
    path = str(tmp_path / "hist.osm.pbf")
    payload = osmpbf._len_field(4, b"HistoricalInformation")
    z = _z.compress(payload)
    blob = (osmpbf._field(2, 0)
            + osmpbf.encode_varints(np.array([len(payload)], np.uint64))
            + osmpbf._len_field(3, z))
    bh = (osmpbf._len_field(1, b"OSMHeader") + osmpbf._field(3, 0)
          + osmpbf.encode_varints(np.array([len(blob)], np.uint64)))
    with open(path, "wb") as f:
        f.write(_s.pack(">I", len(bh)) + bh + blob)
    with pytest.raises(NotImplementedError, match="HistoricalInformation"):
        osmpbf.read_osm_pbf(path)


def test_cli_convert_from_pbf(pbf_file, tmp_path):
    """End-to-end: the user CLI converts a .osm.pbf input directly
    (subprocess — the CLI owns its own Ray session)."""
    import os
    import subprocess
    import sys
    path, _n, _w = pbf_file
    out = str(tmp_path / "out")
    proc = subprocess.run(
        [sys.executable, "-m", "osm2shp_ray", "convert", path, out,
         "--num-cpus", "4"],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-800:]
    assert os.path.isdir(os.path.join(out, "points"))
    assert os.path.isdir(os.path.join(out, "ways"))


def test_pbf_drives_convert(pbf_file, ray_session):
    import ray.data as rd
    from osm2shp_ray.pipelines import convert
    from osm2shp_ray.sources.osmxml import read_osm
    path, nodes_t, ways_t = pbf_file
    nodes, ways = read_osm(path)       # dispatches to the PBF reader
    p1, w1 = convert.convert(nodes, ways, n_buckets=4)
    p2, w2 = convert.convert(rd.from_arrow(nodes_t), rd.from_arrow(ways_t),
                             n_buckets=4)
    count = lambda ds: sorted((r["layer"],) for r in ds.take_all())
    assert count(p1) == count(p2)
    assert count(w1) == count(w2)
