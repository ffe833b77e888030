"""Property-based tests (SURVEY.md §5.3): pure kernels fuzzed heavily,
plus randomized end-to-end conformance against the Python oracle."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from osm2shp_ray.functions import cells, codec, wkb
from osm2shp_ray.functions.hashing import hash_strings, splitmix64
from osm2shp_ray.oracle import pyoracle
from osm2shp_ray.stages import classify

finite_lat = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
finite_lon = st.floats(min_value=-180.0, max_value=179.999999, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(st.lists(finite_lat, min_size=1, max_size=50),
       st.integers(min_value=1, max_value=20))
def test_cell_roundtrip_contains_point(lats, res):
    lats = np.asarray(lats)
    lons = (lats * 3.7) % 360.0 - 180.0
    c = cells.latlng_to_cell(lats, lons, res)
    lo, la0, hi, la1 = cells.cell_bounds(c)
    assert (lo <= lons).all() and (lons < hi + 1e-9).all()
    assert (la0 - 1e-9 <= lats).all() and (lats <= la1 + 1e-9).all()


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**29 - 1),
       st.integers(min_value=1, max_value=12),
       st.integers(min_value=0, max_value=4))
def test_grid_disk_symmetry(seed, res, k):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-89, 89)
    lon = rng.uniform(-179, 179)
    c = int(cells.latlng_to_cell(np.array([lat]), np.array([lon]), res)[0])
    disk = cells.grid_disk(c, k)
    # symmetry: c is in the disk of each member at the same k
    for other in disk[:5]:
        assert c in cells.grid_disk(int(other), k)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(
    st.floats(-1e6, 1e6, allow_nan=False), st.floats(-1e6, 1e6, allow_nan=False)),
    min_size=1, max_size=30))
def test_wkb_roundtrip_exact(pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    offs = np.array([0, len(xs)])
    blob = wkb.encode_linestrings(offs, xs, ys)[0]
    _, x2, y2 = wkb.decode(blob)
    assert np.array_equal(x2, xs) and np.array_equal(y2, ys)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=2**31), st.integers(2, 32), st.integers(2, 32))
def test_codec_roundtrip(seed, w, h):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(codec.decode_png(codec.encode_png(img)), img)
    # arbitrary content (hypothesis feeds white noise — the most
    # JPEG-hostile input): quality 99 holds >= 40 dB on ANY content;
    # the default quality's >= 40 dB contract is over the fixture's
    # natural-spectrum content (test_functions.test_lossy_psnr_above_40)
    from osm2shp_ray.functions import jpeg
    assert codec.psnr(img, jpeg.decode_jpeg(jpeg.encode_jpeg(img, 99))) >= 40.0


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=20))
def test_hash_deterministic_and_order_free(strings):
    a = hash_strings(strings)
    b = hash_strings(strings)
    assert np.array_equal(a, b)
    perm = np.random.default_rng(0).permutation(len(strings))
    c = hash_strings([strings[i] for i in perm])
    assert np.array_equal(a[perm], c)


_tag_token = st.sampled_from(
    ["highway=motorway", "highway=trunk", "highway=primary", "highway=secondary",
     "railway=rail", "place=city", "place=town", "place=suburb", "place=village",
     "waterway=river", "waterway=canal", "natural=water", "natural=woord",
     "natural=land", "landuse=forest", "area=yes", "name=N1", "name=N2", ""])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(_tag_token, min_size=0, max_size=4), min_size=1, max_size=60),
       st.integers(0, 2))
def test_classifier_matches_oracle_rules(tag_lists, geom_code):
    """Vectorized first-match classifier == literal per-row rule scan."""
    tags = pa.array([" ".join(t) for t in tag_lists])
    geom = np.full(len(tag_lists), geom_code, dtype=np.int8)
    got = classify.first_match_layer(tags, geom)
    from osm2shp_ray import config
    gmap = {0: config.POINT, 1: config.LINE, 2: config.POLYGON}
    for i, toks in enumerate(tag_lists):
        d = pyoracle._parse_tags(" ".join(toks))
        exp = -1
        for j, (sink, key, value) in enumerate(config.LAYER_RULES):
            if config.SHAPES[sink] == gmap[geom_code] and d.get(key) == value:
                exp = j
                break
        assert got[i] == exp, (toks, geom_code)


@settings(max_examples=60, deadline=None)
@given(st.lists(_tag_token, min_size=0, max_size=5))
def test_is_area_matches_oracle(toks):
    t = pa.array([" ".join(toks)])
    assert bool(classify.is_area(t)[0]) == pyoracle._is_area(
        pyoracle._parse_tags(" ".join(toks)))


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=2**31))
def test_splitmix_bijective_sample(seed):
    x = np.random.default_rng(seed).integers(0, 2**63, 100, dtype=np.uint64)
    y = splitmix64(x)
    assert len(np.unique(y)) == len(np.unique(x))


def test_fuzzed_end_to_end_conformance(ray_session):
    """Randomized nodes/ways tables through the distributed pipeline
    must match the oracle exactly (3 seeds x full compare)."""
    import ray.data as rd
    from osm2shp_ray.pipelines import convert
    from osm2shp_ray.functions import wkb as wkbmod

    for seed in (7, 99, 12345):
        rng = np.random.default_rng(seed)
        n_nodes, n_ways = 300, 120
        ids = rng.choice(np.arange(-20, 500), size=n_nodes, replace=False)
        tokens = ["highway=motorway", "place=city", "place=town", "natural=water",
                  "area=yes", "name=X", "name=Y", "railway=rail", "landuse=grass", ""]
        node_tags = [" ".join(rng.choice(tokens, size=rng.integers(0, 3), replace=False))
                     for _ in range(n_nodes)]
        nodes_t = pa.table({
            "id": pa.array(ids, pa.int64()),
            "lon": pa.array(rng.uniform(-10, 10, n_nodes), pa.float64()),
            "lat": pa.array(rng.uniform(-10, 10, n_nodes), pa.float64()),
            "tags": pa.array(node_tags, pa.string()),
        })
        refs, offs = [], [0]
        way_tags = []
        for _ in range(n_ways):
            k = int(rng.integers(1, 8))
            refs.extend(rng.choice(np.arange(-20, 520), size=k).tolist())
            offs.append(len(refs))
            way_tags.append(" ".join(rng.choice(tokens, size=rng.integers(0, 3),
                                                replace=False)))
        ways_t = pa.table({
            "way_id": pa.array(np.arange(n_ways), pa.int64()),
            "node_refs": pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), pa.array(refs, pa.int64())),
            "tags": pa.array(way_tags, pa.string()),
        })
        points, ways_out = convert.convert(
            rd.from_arrow(nodes_t), rd.from_arrow(ways_t), n_buckets=8)
        oracle = pyoracle.convert_oracle(nodes_t.to_pylist(), ways_t.to_pylist())
        got_p = sorted((r["layer"], r["x"], r["y"], r["name"])
                       for r in points.take_all())
        exp_p = sorted((layer, x, y, nm) for layer, lst in oracle.points.items()
                       for x, y, nm in lst)
        assert got_p == exp_p, seed
        got_w = sorted((r["layer"], r["way_id"],
                        tuple(wkbmod.decode(r["geometry_wkb"])[1]),
                        tuple(wkbmod.decode(r["geometry_wkb"])[2]))
                       for r in ways_out.take_all())
        exp_w = sorted((layer, wid, tuple(xs), tuple(ys))
                       for layer, lst in oracle.ways.items()
                       for wid, xs, ys in lst)
        assert got_w == exp_w, seed
