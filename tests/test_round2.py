"""Round-2 additions: generic hash_join, distributed connected
components, exact-Jaccard verification, PNG filter vectorization,
J2 drop observability, and the ADVICE bug fixes (tile_histogram salt
overflow, empty tag values, layer-aware snap dedup)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ------------------------------------------------------------ hash_join

def _rds(df):
    import ray.data as rd
    return rd.from_pandas(df)


def test_hash_join_inner(ray_session):
    left = _rds(pd.DataFrame({"k": [1, 2, 3, 3, 5], "lv": [10, 20, 30, 31, 50]}))
    right = _rds(pd.DataFrame({"k": [2, 3, 4], "rv": ["b", "c", "d"]}))
    from osm2shp_ray.stages.joins import hash_join
    out = hash_join(left, right, on="k", n_buckets=4).to_pandas()
    out = out.sort_values(["k", "lv"]).reset_index(drop=True)
    assert out["k"].tolist() == [2, 3, 3]
    assert out["lv"].tolist() == [20, 30, 31]
    assert out["rv"].tolist() == ["b", "c", "c"]
    assert out["lv"].dtype == np.int64  # no null-widening leaks


def test_hash_join_semi_anti(ray_session):
    left = _rds(pd.DataFrame({"k": [1, 2, 3, 4], "lv": [1, 2, 3, 4]}))
    right = _rds(pd.DataFrame({"k": [2, 4, 4], "rv": [0, 0, 0]}))
    from osm2shp_ray.stages.joins import hash_join
    semi = hash_join(left, right, on="k", how="left_semi", n_buckets=4).to_pandas()
    anti = hash_join(left, right, on="k", how="left_anti", n_buckets=4).to_pandas()
    assert sorted(semi["k"].tolist()) == [2, 4]
    assert sorted(anti["k"].tolist()) == [1, 3]
    assert list(semi.columns) == ["k", "lv"]


def test_hash_join_matches_pandas_reference(ray_session):
    rng = np.random.default_rng(5)
    ldf = pd.DataFrame({"k": rng.integers(0, 50, 300),
                        "lv": rng.integers(0, 1000, 300)})
    rdf = pd.DataFrame({"k": rng.integers(0, 50, 80),
                        "rv": rng.integers(0, 1000, 80)})
    from osm2shp_ray.stages.joins import hash_join
    got = (hash_join(_rds(ldf), _rds(rdf), on="k", n_buckets=8).to_pandas()
           .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    want = (ldf.merge(rdf, on="k")
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "lv", "rv"]], want)


# ------------------------------------------------ connected components

def _cc_reference(edges):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = {n for e in edges for n in e}
    return {n: find(n) for n in nodes}


def test_connected_components_chain_and_clusters(ray_session):
    # a long chain (worst-case diameter) + separate triangles
    edges = [(i, i + 1) for i in range(10, 20)] + \
            [(100, 101), (101, 102), (100, 102), (7, 3)]
    df = pd.DataFrame({"id_a": [e[0] for e in edges],
                       "id_b": [e[1] for e in edges]})
    from osm2shp_ray.stages.components import connected_components
    got = {r["id"]: r["root"]
           for r in connected_components(_rds(df), n_buckets=4).take_all()}
    assert got == _cc_reference(edges)


def test_connected_components_random_graph(ray_session):
    rng = np.random.default_rng(13)
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 120, size=(400, 2)) if a != b]
    df = pd.DataFrame({"id_a": [e[0] for e in edges],
                       "id_b": [e[1] for e in edges]})
    from osm2shp_ray.stages.components import connected_components
    got = {r["id"]: r["root"]
           for r in connected_components(_rds(df), n_buckets=8).take_all()}
    assert got == _cc_reference(edges)


def test_dedup_minhash_distributed_path_matches_driver(ray_session):
    """Same corpus through the driver union-find path and the
    distributed label-propagation path (cap=0 forces it)."""
    import ray.data as rd
    from osm2shp_ray.stages.dedup import dedup_minhash
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    texts, ids = [], []
    for i in range(30):
        ids.append(i)
        if i % 3 == 0:
            texts.append(base + f" variant{i % 2}")   # near-dup cluster
        else:
            texts.append(f"totally unrelated document number {i} "
                         f"with its own words {i * 7} {i * 13}")
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    a = sorted(r["doc_id"] for r in dedup_minhash(
        rd.from_pandas(df), threshold=0.7).take_all())
    b = sorted(r["doc_id"] for r in dedup_minhash(
        rd.from_pandas(df), threshold=0.7, component_cap=0).take_all())
    assert a == b
    assert len(a) < 30  # something was actually deduped


# ------------------------------------------------ exact jaccard verify

def test_exact_jaccard_pairs_matches_bruteforce(ray_session):
    import ray.data as rd
    from osm2shp_ray.stages.dedup import exact_jaccard_pairs, shingle_sets_batch
    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    texts[7] = texts[3]                      # exact dup
    texts[12] = texts[5] + " extraword"      # near dup
    df = pd.DataFrame({"doc_id": range(40), "text": texts})
    t = pa.Table.from_pandas(df)
    sets_t = shingle_sets_batch(t, shingle_mode="word", n=3)
    sets = {sets_t["doc_id"][i].as_py(): set(sets_t["sh"][i].as_py())
            for i in range(40)}
    want = set()
    for i in range(40):
        for j in range(i + 1, 40):
            si, sj = sets[i], sets[j]
            u = len(si | sj)
            if u and len(si & sj) / u >= 0.6:
                want.add((i, j))
    got = {(r["id_a"], r["id_b"]) for r in exact_jaccard_pairs(
        rd.from_pandas(df), threshold=0.6, shingle_mode="word",
        shingle_n=3).take_all()}
    assert got == want and (3, 7) in got
    # the distributed join path (small_cap=0) returns the same set
    got_dist = {(r["id_a"], r["id_b"]) for r in exact_jaccard_pairs(
        rd.from_pandas(df), threshold=0.6, shingle_mode="word",
        shingle_n=3, small_cap=0).take_all()}
    assert got_dist == want


def test_minhash_signature_stable_under_trailing_empty_docs():
    """Regression (review finding): a trailing empty-shingle doc must
    not steal the preceding doc's last shingle from the reduceat."""
    from osm2shp_ray.stages.dedup import minhash_signatures
    alone = minhash_signatures(["a b c d"], num_perm=8, n=3,
                               shingle_mode="word")
    with_empty = minhash_signatures(["a b c d", ""], num_perm=8, n=3,
                                    shingle_mode="word")
    sandwiched = minhash_signatures(["", "a b c d", "", "a b c d", ""],
                                    num_perm=8, n=3, shingle_mode="word")
    assert np.array_equal(alone[0], with_empty[0])
    assert np.array_equal(sandwiched[1], alone[0])
    assert np.array_equal(sandwiched[3], alone[0])


def test_exact_cosine_pairs_matches_numpy(ray_session):
    import ray.data as rd
    from osm2shp_ray.stages.ann import exact_cosine_pairs
    rng = np.random.default_rng(9)
    V = rng.standard_normal((60, 16))
    V[41] = V[7] + 0.01 * rng.standard_normal(16)   # planted near-dup
    V[55] = V[12]                                   # exact dup
    df = pd.DataFrame({"vec_id": np.arange(60), "embedding": list(V)})
    got = {(r["id_a"], r["id_b"]) for r in exact_cosine_pairs(
        _rds(df), threshold=0.95).take_all()}
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    iu = np.triu_indices(60, 1)
    want = {(int(a), int(b)) for a, b in zip(*iu) if S[a, b] >= 0.95}
    assert got == want and (7, 41) in got and (12, 55) in got


# --------------------------------------------------------- codec filters

@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filters_roundtrip(ftype):
    from osm2shp_ray.functions import codec
    rng = np.random.default_rng(ftype)
    img = rng.integers(0, 256, size=(33, 17, 3), dtype=np.uint8)
    assert np.array_equal(codec.decode_png(codec.encode_png(img, ftype)), img)


# --------------------------------------------------- ADVICE bug fixes

def test_tile_histogram_default_salt_no_overflow(ray_session):
    """Regression: tile*salt int64 overflow with res<<58 tile ids made
    default-salt histograms silently wrong; tile/salt are separate
    group keys now."""
    import ray.data as rd
    from osm2shp_ray.stages import spatial
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"x": rng.uniform(-170, 170, 3000),
                       "y": rng.uniform(-80, 80, 3000)})
    ds = spatial.encode_cells(rd.from_pandas(df), res=13)
    for salt in (1, 4, 8):   # includes config.DEFAULT_SALT
        hist = spatial.tile_histogram(ds, zoom=6, salt=salt).to_pandas()
        assert (hist["tile"] >= 0).all()
        assert hist["n"].sum() == 3000
        if salt == 1:
            base = hist.sort_values("tile").reset_index(drop=True)
        else:
            cur = hist.sort_values("tile").reset_index(drop=True)
            pd.testing.assert_frame_equal(cur, base)


def test_tag_value_empty_value_is_present():
    from osm2shp_ray.functions.tags import tag_value
    tags = pa.array(["landuse= name=x", "landuse=farm", "name=y"])
    v = tag_value(tags, "landuse")
    assert v[0].as_py() == ""      # empty value, key PRESENT
    assert v[1].as_py() == "farm"
    assert not v[2].is_valid       # absent key -> null


def test_snap_dedup_is_layer_aware(ray_session):
    """Identical geometry in two different line layers must survive in
    both (the reference cleans each layer independently)."""
    import ray.data as rd
    from osm2shp_ray.pipelines.mapgen import postprocess_lines
    from osm2shp_ray.stages.classify import LAYER_NAMES
    i_big = LAYER_NAMES.index("roadbig_line")
    i_rail = LAYER_NAMES.index("railway_line")
    xs = [[0.0, 1.0], [0.0, 1.0]]
    ys = [[0.0, 1.0], [0.0, 1.0]]
    t = pa.table({
        "way_id": pa.array([1, 2], pa.int64()),
        "layer_idx": pa.array([i_big, i_rail], pa.int8()),
        "xs": pa.array(xs, pa.list_(pa.float64())),
        "ys": pa.array(ys, pa.list_(pa.float64())),
    })
    out = postprocess_lines(rd.from_arrow(t), merge=False).to_pandas()
    assert sorted(out["layer_idx"].tolist()) == sorted([i_big, i_rail])


# -------------------------------------------- partition-pruned kNN

def test_knn_partitioned_matches_full_scan(ray_session, tmp_path):
    import ray.data as rd
    from osm2shp_ray.stages import spatial
    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "pid": np.arange(5000),
        "x": rng.uniform(-60, 60, 5000),
        "y": rng.uniform(-30, 30, 5000),
    })
    path = str(tmp_path / "pts")
    col = spatial.write_cell_partitioned(rd.from_pandas(df), path, res=5)
    assert col == "cell5"
    import os
    assert len(os.listdir(path)) > 4     # actually partitioned
    qx, qy = 10.3, 5.7
    got = spatial.knn_partitioned(path, qx, qy, 15, res=5, id_col="pid")
    want = spatial.knn(rd.from_pandas(df), qx, qy, 15, id_col="pid").take(15)
    assert [r["pid"] for r in got] == [r["pid"] for r in want]
    # far-corner query exercises ring expansion across partitions
    got2 = spatial.knn_partitioned(path, -59.9, -29.9, 5, res=5, id_col="pid")
    want2 = spatial.knn(rd.from_pandas(df), -59.9, -29.9, 5, id_col="pid").take(5)
    assert [r["pid"] for r in got2] == [r["pid"] for r in want2]


# ----------------------------------------------------- P5 break

def test_break_crossing_segments():
    from osm2shp_ray.stages.geometry import break_lines_group
    df = pd.DataFrame({
        "way_id": [1, 2], "layer_idx": [0, 0],
        "xs": [np.array([0.0, 2.0]), np.array([1.0, 1.0])],
        "ys": [np.array([1.0, 1.0]), np.array([0.0, 2.0])],
    })
    out = break_lines_group(df)
    assert out.num_rows == 4          # X crossing -> 4 pieces
    for i in range(4):                # every piece touches the crossing
        assert (1.0, 1.0) in list(zip(out["xs"][i].as_py(), out["ys"][i].as_py()))
    # T-joint: only the crossed line splits
    df2 = pd.DataFrame({
        "way_id": [1, 2], "layer_idx": [0, 0],
        "xs": [np.array([0.0, 2.0]), np.array([1.0, 1.0])],
        "ys": [np.array([0.0, 0.0]), np.array([0.0, 5.0])],
    })
    assert break_lines_group(df2).num_rows == 3
    # disjoint lines pass through
    df3 = pd.DataFrame({
        "way_id": [1], "layer_idx": [0],
        "xs": [np.array([0.0, 1.0, 2.0])], "ys": [np.array([0.0, 1.0, 0.0])],
    })
    assert break_lines_group(df3).num_rows == 1


def test_break_lines_distributed_cross_cell(ray_session):
    """Review regression: a crossing between lines whose FIRST vertices
    sit in different coarse cells must still split (the old grouping by
    first-vertex cell missed it)."""
    import ray.data as rd
    from osm2shp_ray.stages.geometry import break_lines
    # A runs 40 degrees east, crossing B near its far end; B is local.
    t = pa.table({
        "way_id": pa.array([1, 2], pa.int64()),
        "layer_idx": pa.array([0, 0], pa.int8()),
        "xs": pa.array([[-30.0, 10.0], [5.0, 5.0]], pa.list_(pa.float64())),
        "ys": pa.array([[3.0, 3.0], [0.0, 6.0]], pa.list_(pa.float64())),
    })
    out = break_lines(rd.from_arrow(t)).to_pandas()
    assert len(out) == 4
    cross = (5.0, 3.0)
    for _, r in out.iterrows():
        assert cross in list(zip(r["xs"], r["ys"]))


def test_break_lines_is_layer_independent(ray_session):
    """A road crossing a railway must NOT split either (the reference
    cleans each layer independently, mapgen.sh:56-62)."""
    import ray.data as rd
    from osm2shp_ray.stages.geometry import break_lines
    t = pa.table({
        "way_id": pa.array([1, 2], pa.int64()),
        "layer_idx": pa.array([0, 3], pa.int8()),     # different layers
        "xs": pa.array([[-1.0, 1.0], [0.0, 0.0]], pa.list_(pa.float64())),
        "ys": pa.array([[0.0, 0.0], [-1.0, 1.0]], pa.list_(pa.float64())),
    })
    out = break_lines(rd.from_arrow(t)).to_pandas()
    assert sorted(out["way_id"]) == [1, 2]            # untouched
    # same geometry, same layer -> 4 pieces
    t2 = t.set_column(1, "layer_idx", pa.array([0, 0], pa.int8()))
    assert len(break_lines(rd.from_arrow(t2)).to_pandas()) == 4


def test_break_lines_long_diagonal_dda_cover(ray_session):
    """A long diagonal segment (span >> 4 cells, the grid-traversal
    path) must still find a crossing deep along its length."""
    import ray.data as rd
    from osm2shp_ray.stages.geometry import break_lines
    t = pa.table({
        "way_id": pa.array([1, 2], pa.int64()),
        "layer_idx": pa.array([0, 0], pa.int8()),
        # 20-degree diagonal crossed by a short vertical at (7, 7)
        "xs": pa.array([[-3.0, 17.0], [7.0, 7.0]], pa.list_(pa.float64())),
        "ys": pa.array([[-3.0, 17.0], [6.5, 7.5]], pa.list_(pa.float64())),
    })
    out = break_lines(rd.from_arrow(t)).to_pandas()
    assert len(out) == 4
    for _, r in out.iterrows():
        assert (7.0, 7.0) in [(round(x, 9), round(y, 9))
                              for x, y in zip(r["xs"], r["ys"])]


def test_is_osm_path_cwd_independent(tmp_path, monkeypatch):
    d = tmp_path / "inputs" / "extracts"
    d.mkdir(parents=True)
    (d / "a.osm").write_text("<osm/>")
    from osm2shp_ray.sources.readers import is_osm_path
    monkeypatch.chdir(tmp_path)
    assert is_osm_path(str(d))
    assert not is_osm_path(str(tmp_path / "inputs"))  # only a subDIR inside
    monkeypatch.chdir(d)
    assert is_osm_path(str(d))                        # same answer anywhere


def test_break_lines_matches_single_group_reference(ray_session):
    """Distributed break (cell-covered segments) must produce exactly
    the same piece multiset as the single-group kernel, which sees
    every pair by construction — catches any cell-cover gap."""
    import ray.data as rd
    from osm2shp_ray.stages.geometry import break_lines, break_lines_group
    rng = np.random.default_rng(31)
    n = 60
    cx = rng.uniform(-2.0, 2.0, n)
    cy = rng.uniform(-2.0, 2.0, n)
    dx = rng.uniform(-1.5, 1.5, n)
    dy = rng.uniform(-1.5, 1.5, n)
    dx[:6] *= 8.0   # a few LONG segments exercise the DDA cover path
    dy[:6] *= 8.0
    layers = (np.arange(n) % 2).astype(np.int8)   # two layers
    xs = [[cx[i], cx[i] + dx[i]] for i in range(n)]
    ys = [[cy[i], cy[i] + dy[i]] for i in range(n)]
    t = pa.table({
        "way_id": pa.array(np.arange(n), pa.int64()),
        "layer_idx": pa.array(layers, pa.int8()),
        "xs": pa.array(xs, pa.list_(pa.float64())),
        "ys": pa.array(ys, pa.list_(pa.float64())),
    })
    dist = break_lines(rd.from_arrow(t), res=9).to_pandas()
    # ground truth: the single-group kernel run PER LAYER (the
    # reference's independence contract)
    refs = []
    for lay in (0, 1):
        m = layers == lay
        refs.append(break_lines_group(pd.DataFrame({
            "way_id": np.arange(n)[m], "layer_idx": layers[m],
            "xs": [np.asarray(xs[i]) for i in np.flatnonzero(m)],
            "ys": [np.asarray(ys[i]) for i in np.flatnonzero(m)]})).to_pandas())
    ref = pd.concat(refs, ignore_index=True)
    key = lambda df: sorted(
        (int(r["way_id"]), tuple(np.round(r["xs"], 9)), tuple(np.round(r["ys"], 9)))
        for _, r in df.iterrows())
    assert len(ref) > n          # randomized soup actually crosses
    assert key(dist) == key(ref)


def test_postprocess_breaks_at_intersections(ray_session):
    import ray.data as rd
    from osm2shp_ray.pipelines.mapgen import postprocess_lines
    from osm2shp_ray.stages.classify import LAYER_NAMES
    i_big = LAYER_NAMES.index("roadbig_line")
    # crossing segments inside one merge cell (they do not touch at
    # endpoints, so the polyline merge leaves them separate)
    t = pa.table({
        "way_id": pa.array([1, 2], pa.int64()),
        "layer_idx": pa.array([i_big, i_big], pa.int8()),
        "xs": pa.array([[10.0, 10.2], [10.1, 10.1]], pa.list_(pa.float64())),
        "ys": pa.array([[10.1, 10.1], [10.0, 10.2]], pa.list_(pa.float64())),
    })
    out = postprocess_lines(rd.from_arrow(t), merge=False).to_pandas()
    assert len(out) == 4


# ------------------------------------------------- J2 observability

def test_join_reports_dropped_ways(ray_session):
    import ray
    import ray.data as rd
    from osm2shp_ray.sources.fixtures import nodes_ways_tables
    from osm2shp_ray.stages.classify import classify_ways_batch
    from osm2shp_ray.stages.join import resolve_ways
    from osm2shp_ray.state import metrics
    actor = metrics.get_or_create()
    before = ray.get(actor.get.remote("dropped_ways"))
    nodes_t, ways_t = nodes_ways_tables()
    nodes = rd.from_arrow(nodes_t)
    ways = rd.from_arrow(ways_t).map_batches(classify_ways_batch,
                                             batch_format="pyarrow")
    resolve_ways(nodes, ways, n_buckets=4).materialize()
    after = ray.get(actor.get.remote("dropped_ways"))
    # fixture ways 12 (ref 999), 13 (ref -5) and 20 (ref 999) dangle
    assert after - before == 3
