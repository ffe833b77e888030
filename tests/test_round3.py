"""Round-3 regression tests: string-id connected components, the
distributed dedup fallback with string doc ids, PBF malformed-stream
validation, and the disjoint split-piece id space."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_connected_components_string_ids(ray_session):
    from osm2shp_ray.stages.components import connected_components
    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": ["b", "c", "x"], "id_b": ["a", "b", "y"]}))
    got = {r["id"]: r["root"] for r in connected_components(pairs).take_all()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_int_ids_large_values(ray_session):
    # 63-bit ids: the old sum(label) fixpoint check overflowed here
    from osm2shp_ray.stages.components import connected_components
    big = (1 << 62) + 5
    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": [big, big + 1], "id_b": [big + 1, big + 2]}))
    got = {r["id"]: r["root"] for r in connected_components(pairs).take_all()}
    assert got == {big: big, big + 1: big, big + 2: big}


def test_dedup_minhash_string_ids_distributed(ray_session):
    # component_cap=0 forces the distributed CC fallback, which used to
    # hardcode int64 node ids and crash on string doc ids
    from osm2shp_ray.stages.dedup import dedup_minhash
    base = "the quick brown fox jumps over the lazy dog " * 3
    df = pd.DataFrame({
        "doc_id": ["d1", "d2", "d3"],
        "text": [base, base + "!",
                 "completely different text about ray data engines"]})
    kept = sorted(r["doc_id"] for r in dedup_minhash(
        rd.from_pandas(df), threshold=0.7, shingle_n=3,
        component_cap=0).take_all())
    assert kept == ["d1", "d3"]


def test_dense_tags_truncated_raises():
    from osm2shp_ray.sources.osmpbf import _dense_tags
    sarr = np.array(["", "k", "v"], dtype=object)
    with pytest.raises(ValueError, match="truncated"):
        _dense_tags(np.array([1]), sarr, 1)  # stream ends on a key id
    with pytest.raises(ValueError, match="truncated"):
        _dense_tags(np.array([1, 0]), sarr, 1)  # value slot is the end marker
    assert _dense_tags(np.array([1, 2, 0]), sarr, 1) == ["k=v"]


def test_break_piece_ids_disjoint():
    # two crossing lines -> 4 pieces; piece ids are negative (disjoint
    # from genuine way ids, which the pipeline requires to be > 0) and
    # unique per (way, piece)
    from osm2shp_ray.stages.geometry import break_lines_group
    df = pd.DataFrame({
        "way_id": [7, 8],
        "layer_idx": np.array([0, 0], dtype=np.int8),
        "xs": [np.array([-1.0, 1.0]), np.array([0.0, 0.0])],
        "ys": [np.array([0.0, 0.0]), np.array([-1.0, 1.0])],
    })
    from osm2shp_ray.stages.geometry import _piece_id
    out = break_lines_group(df)
    ids = out["way_id"].to_numpy(zero_copy_only=False)
    assert len(ids) == 4
    assert (ids < 0).all()
    assert len(np.unique(ids)) == 4
    assert set(ids) == {_piece_id(w, p) for w in (7, 8) for p in (0, 1)}
    # any int64 parent id (incl. mapgen's wrapped synthetic merge ids)
    # maps into the negative space without overflow
    assert _piece_id(-(1 << 62) - 5, 3) < 0 and _piece_id((1 << 62), 0) < 0


def test_stitch_merges_across_cell_boundary(ray_session):
    # res-6 cells are 5.625 deg; lon=0 is a cell border. Two touching
    # segments whose first vertices fall in different cells stay split
    # by the per-cell merge and MUST be joined by the stitch pass.
    import pyarrow as pa
    import ray.data as rd
    from osm2shp_ray.pipelines.mapgen import postprocess_lines, stitch_lines

    def ways_table():
        off = pa.array([0, 2, 4, 6], type=pa.int32())
        xs = pa.ListArray.from_arrays(off, pa.array(
            [-0.1, 0.0, 0.0, 0.1, 3.0, 3.2], pa.float64()))
        ys = pa.ListArray.from_arrays(off, pa.array(
            [10.0, 10.05, 10.05, 10.0, -20.0, -20.0], pa.float64()))
        # shared vertex (0.0, 10.05) deviates > tol from the chord, so
        # Douglas-Peucker keeps it and the merged chain stays 3 points
        return pa.table({
            "way_id": pa.array([1, 2, 3], pa.int64()),
            "layer_idx": pa.array(np.array([0, 0, 0], np.int8), pa.int8()),
            "xs": xs, "ys": ys,
        })

    out = postprocess_lines(rd.from_arrow(ways_table()),
                            merge=True, do_break=False).take_all()
    assert len(out) == 2  # boundary chain merged; isolated segment kept
    lens = sorted(len(r["xs"]) for r in out)
    assert lens == [2, 3]
    merged = next(r for r in out if len(r["xs"]) == 3)
    assert sorted(merged["xs"]) == [-0.1, 0.0, 0.1]

    # stitch alone is a no-op when nothing crosses
    iso = ways_table().slice(2, 1)
    assert len(stitch_lines(rd.from_arrow(iso)).take_all()) == 1

    # label_cap=0 forces the distributed hash_join attach; it must be
    # byte-equivalent to the broadcast path (same roots -> same
    # synthesized ids -> same merged chains)
    def canon(rows):
        return sorted((r["way_id"], r["layer_idx"],
                       tuple(r["xs"]), tuple(r["ys"])) for r in rows)

    unstitched = postprocess_lines(rd.from_arrow(ways_table()),
                                   merge=True, do_break=False, stitch=False)
    joined = stitch_lines(unstitched, label_cap=0).take_all()
    assert canon(joined) == canon(out)


def test_skew_histogram_detects_hot_key(ray_session):
    # SURVEY 7.4.5: per-partition row histograms from the metrics
    # actor. A hub node referenced by every way concentrates one join
    # bucket; the report must expose it, and salting must spread it.
    import ray
    import pyarrow as pa
    import ray.data as rd
    from osm2shp_ray.state import metrics
    from osm2shp_ray.stages.join import resolve_ways

    n_ways, n_cold = 400, 50
    nodes = pd.DataFrame({
        "id": np.arange(1, n_cold + 2),
        "lon": np.linspace(-10, 10, n_cold + 1),
        "lat": np.linspace(40, 50, n_cold + 1),
        "tags": [""] * (n_cold + 1),
    })
    refs = pa.ListArray.from_arrays(
        pa.array(np.arange(0, 2 * n_ways + 1, 2), pa.int32()),
        pa.array(np.column_stack([
            np.full(n_ways, 1),                       # hub: node 1 in EVERY way
            2 + np.arange(n_ways) % n_cold,
        ]).reshape(-1), pa.int64()))
    ways = pa.table({
        "way_id": pa.array(np.arange(1000, 1000 + n_ways), pa.int64()),
        "node_refs": refs,
        "layer_idx": pa.array(np.zeros(n_ways, np.int8), pa.int8()),
        "geom_type": pa.array(np.ones(n_ways, np.int8), pa.int8()),
    })

    def ratio(salt):
        actor = metrics.get_or_create()
        assert resolve_ways(rd.from_pandas(nodes), rd.from_arrow(ways),
                            n_buckets=8, salt=salt).count() == n_ways
        rep = ray.get(actor.report.remote())
        ray.kill(actor)  # fresh histogram per phase
        return rep["skew[join_ref_bucket]"]

    hot = ratio(salt=1)
    assert hot["partitions"] <= 8 and hot["rows"] >= 2 * n_ways
    assert hot["max_over_mean"] > 2.0  # the hub bucket sticks out
    salted = ratio(salt=8)
    assert salted["max_over_mean"] < hot["max_over_mean"]


def test_ivf_partitioned_matches_scan(ray_session, tmp_path):
    # the on-disk partitioned inverted file must return EXACTLY what
    # the scan-and-filter variant returns on the same index, and both
    # must be exact at nprobe = n_centroids
    import ray.data as rd
    from osm2shp_ray.stages import ann

    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ann.train_centroids(emb, n_centroids=8)
    rows = emb.take_all()
    queries = np.stack([np.asarray(rows[3]["embedding"], dtype=np.float64),
                        np.asarray(rows[11]["embedding"], dtype=np.float64)])

    idx_path = str(tmp_path / "ivf_index")
    ann.build_ivf_index(emb, cents, idx_path)
    import os
    cells = [d for d in os.listdir(idx_path) if d.startswith("ivf_cell=")]
    assert len(cells) >= 2  # genuinely partitioned on disk

    def key(rows_):
        return sorted((r["query_id"], r["vec_id"], round(r["cosine"], 12))
                      for r in rows_)

    scan = ann.ivf_topk(ann.assign_centroids(emb, cents), cents, queries,
                        k=5, nprobe=3)
    part = ann.ivf_topk_partitioned(idx_path, cents, queries, k=5, nprobe=3)
    assert key(part.take_all()) == key(scan.take_all())

    # exactness: nprobe = all cells == brute force
    brute = ann.brute_force_topk(emb, queries, k=5)
    full = ann.ivf_topk_partitioned(idx_path, cents, queries, k=5, nprobe=8)
    assert key(full.take_all()) == key(brute.take_all())


def test_cross_cell_junction_stays_split(ray_session):
    # T-junction at v whose third branch STARTS in another res-6 cell:
    # per-cell merge alone would see local degree 2 at v and fuse
    # W1+W2 through the junction (the reference's whole-layer merge
    # sees degree 3 and keeps all three). The cross-group stop keys +
    # stitch must reproduce the reference: 3 separate lines.
    import pyarrow as pa
    import ray.data as rd
    from osm2shp_ray.pipelines.mapgen import postprocess_lines

    v = (0.0, 10.05)
    off = pa.array([0, 2, 4, 6], type=pa.int32())
    xs = pa.ListArray.from_arrays(off, pa.array(
        [-0.1, v[0], -0.05, v[0], 0.1, v[0]], pa.float64()))
    ys = pa.ListArray.from_arrays(off, pa.array(
        [10.0, v[1], 10.2, v[1], 10.0, v[1]], pa.float64()))
    ways = pa.table({
        "way_id": pa.array([1, 2, 3], pa.int64()),   # W1, W2 first-vertex
        "layer_idx": pa.array(np.zeros(3, np.int8), pa.int8()),  # cell A;
        "xs": xs, "ys": ys,                          # W3 first-vertex cell B
    })
    out = postprocess_lines(rd.from_arrow(ways), merge=True,
                            do_break=False).take_all()
    assert len(out) == 3
    assert sorted(len(r["xs"]) for r in out) == [2, 2, 2]


def test_merge_kernel_junction_uses_total_degree():
    # 3 segments meeting at one node, all in ONE group: every row
    # order must yield 3 chains — the old unused-count test merged two
    # of them once the first chain consumed a branch
    import itertools
    from osm2shp_ray.stages.geometry import merge_lines_group

    segs = {
        "A": ([-1.0, 0.0], [0.0, 0.0]),
        "B": ([0.0, 1.0], [0.0, 0.0]),
        "C": ([0.0, 0.0], [0.0, 1.0]),
    }
    for order in itertools.permutations("ABC"):
        df = pd.DataFrame({
            "way_id": [ord(c) for c in order],
            "layer_idx": np.zeros(3, np.int8),
            "xs": [np.asarray(segs[c][0]) for c in order],
            "ys": [np.asarray(segs[c][1]) for c in order],
        })
        out = merge_lines_group(df)
        assert out.num_rows == 3, order


def test_merge_unifies_rules_of_one_sink(ray_session):
    # motorway (rule 0) and trunk (rule 1) both live in the
    # roadbig_line SINK; the reference post-processes one file per
    # sink, so their touching segments must merge into one chain
    import pyarrow as pa
    import ray.data as rd
    from osm2shp_ray.pipelines.mapgen import postprocess_lines

    off = pa.array([0, 2, 4], type=pa.int32())
    xs = pa.ListArray.from_arrays(off, pa.array(
        [1.0, 1.5, 1.5, 2.0], pa.float64()))
    ys = pa.ListArray.from_arrays(off, pa.array(
        [10.0, 10.3, 10.3, 10.0], pa.float64()))
    ways = pa.table({
        "way_id": pa.array([1, 2], pa.int64()),
        "layer_idx": pa.array(np.array([0, 1], np.int8), pa.int8()),
        "xs": xs, "ys": ys,
    })
    out = postprocess_lines(rd.from_arrow(ways), merge=True,
                            do_break=False).take_all()
    assert len(out) == 1
    assert len(out[0]["xs"]) == 3
    assert out[0]["layer_idx"] == 0  # canonical roadbig_line index


def test_range_join_semantics(ray_session):
    # inclusive bounds, cross-bin intervals, exactly-once pairs, and
    # the max_bins skip guard
    import pyarrow as pa
    import ray.data as rd
    from osm2shp_ray.stages.temporal import range_join

    pts = rd.from_arrow(pa.table({
        "pid": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([5, 10, 19, 100], pa.int64()),
    }))
    ivs = rd.from_arrow(pa.table({
        "iid": pa.array([10, 20, 30], pa.int64()),
        "lo": pa.array([5, 8, 0], pa.int64()),
        "hi": pa.array([10, 19, 1000], pa.int64()),  # iid=30 spans >64 bins
    }))
    out = range_join(pts, ivs, "v", "lo", "hi", ["pid"], ["iid"],
                     bin_width=10).take_all()
    got = sorted((r["pid"], r["iid"]) for r in out)
    # iid=30 skipped (spans 101 bins); bounds are inclusive on both ends
    assert got == [(1, 10), (2, 10), (2, 20), (3, 20)]

    # empty interval side -> empty typed result, no crash
    import pyarrow.compute as pc
    empty_ivs = ivs.map_batches(
        lambda t: t.filter(pc.equal(t["iid"], -1)), batch_format="pyarrow")
    none = range_join(pts, empty_ivs, "v", "lo", "hi", ["pid"], ["iid"],
                      bin_width=10).take_all()
    assert none == []


def test_pack_chunks_semantics(ray_session):
    # budget cuts at running-total boundaries per key, in id order;
    # oversize docs still land in exactly one chunk
    import pyarrow as pa
    import ray.data as rd
    from osm2shp_ray.stages.text import pack_chunks

    t = pa.table({
        "source": pa.array(["a"] * 4 + ["b"] * 2),
        "doc_id": pa.array([1, 2, 3, 4, 1, 2], pa.int64()),
        "n_tokens": pa.array([60, 50, 1000, 10, 10, 10], pa.int64()),
    })
    out = {(r["source"], r["doc_id"]): r["chunk"]
           for r in pack_chunks(rd.from_arrow(t), budget=100).take_all()}
    assert out == {("a", 1): 0,   # run-before 0
                   ("a", 2): 0,   # run-before 60
                   ("a", 3): 1,   # run-before 110 -> chunk 1 (oversize doc)
                   ("a", 4): 11,  # run-before 1110
                   ("b", 1): 0, ("b", 2): 0}


def test_phash_near_dup_recall_matches_brute_force(ray_session):
    # planted <=4-bit perturbations MUST all surface (pigeonhole over
    # 5 bands is complete for hamming <= 4); result equals brute force
    import pyarrow as pa
    import ray.data as rd
    from osm2shp_ray.stages.dedup import phash_near_dup_pairs

    rng = np.random.default_rng(5)
    base = rng.integers(0, 1 << 63, size=300, dtype=np.int64)
    mutated = base[:50].copy()
    for i in range(50):
        flips = rng.choice(64, size=rng.integers(1, 5), replace=False)
        for f in flips:
            mutated[i] ^= np.int64(1) << np.int64(int(f))
    ph = np.concatenate([base, mutated])
    ids = np.array([f"im-{i:04d}" for i in range(len(ph))])
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in phash_near_dup_pairs(
        rd.from_arrow(pa.table({"image_id": ids, "phash": ph}))).take_all()}

    u = ph.astype(np.uint64)
    ia, ib = np.triu_indices(len(u), k=1)
    ham = np.unpackbits((u[ia] ^ u[ib])[:, None].view(np.uint8),
                        axis=1).sum(axis=1)
    keep = ham <= 4
    want = {(min(ids[a], ids[b]), max(ids[a], ids[b]), int(h))
            for a, b, h in zip(ia[keep], ib[keep], ham[keep])}
    assert got == want and len(want) >= 50


def test_range_join_randomized_matches_brute_force(ray_session):
    # seeded fuzz: arbitrary points/intervals/bin widths must emit
    # exactly the brute-force containment pairs, each exactly once
    import pyarrow as pa
    import ray.data as rd
    from osm2shp_ray.stages.temporal import range_join

    rng = np.random.default_rng(11)
    for trial in range(4):
        n_p, n_i = rng.integers(1, 200), rng.integers(1, 50)
        v = rng.integers(-1000, 1000, size=n_p)
        lo = rng.integers(-1000, 1000, size=n_i)
        hi = lo + rng.integers(0, 300, size=n_i)
        bw = int(rng.integers(7, 200))
        pts = rd.from_arrow(pa.table({
            "pid": pa.array(np.arange(n_p), pa.int64()),
            "v": pa.array(v, pa.int64())}))
        ivs = rd.from_arrow(pa.table({
            "iid": pa.array(np.arange(n_i), pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64())}))
        out = range_join(pts, ivs, "v", "lo", "hi", ["pid"], ["iid"],
                         bin_width=bw, max_bins=10**9).take_all()
        got = sorted((r["pid"], r["iid"]) for r in out)
        mask = (v[:, None] >= lo[None, :]) & (v[:, None] <= hi[None, :])
        want = sorted(zip(*[a.tolist() for a in np.nonzero(mask)]))
        assert got == want, (trial, bw)


def test_distance_join_matches_brute_force(ray_session):
    """Grid distance join == brute-force all-pairs, fuzzed across radii
    (incl. a radius forcing res=0 full cross) and grid-edge points."""
    from osm2shp_ray.stages.spatial import distance_join
    rng = np.random.default_rng(42)
    nl, nr = 300, 120
    lx = rng.uniform(-180, 180, nl).round(6)
    ly = rng.uniform(-90, 90, nl).round(6)
    rx = rng.uniform(-180, 180, nr).round(6)
    ry = rng.uniform(-90, 90, nr).round(6)
    # pin some points on grid/world edges
    lx[:3], ly[:3] = [-180.0, 179.999999, 0.0], [-90.0, 90.0, 0.0]
    rx[:3], ry[:3] = [-179.5, 179.5, 0.25], [-89.7, 89.9, -0.25]
    left = rd.from_arrow(__import__("pyarrow").table(
        {"lid": np.arange(nl, dtype=np.int64), "x": lx, "y": ly}))
    right = rd.from_arrow(__import__("pyarrow").table(
        {"rid": np.arange(nr, dtype=np.int64), "x": rx, "y": ry}))
    for radius in (0.5, 7.3, 200.0):
        d2 = ((lx[:, None] - rx[None, :]) ** 2
              + (ly[:, None] - ry[None, :]) ** 2)
        li, ri = np.nonzero(d2 <= radius * radius)
        want = set(zip(li.tolist(), ri.tolist()))
        got_df = distance_join(left, right, radius, left_id="lid",
                               right_id="rid").to_pandas()
        got = set(zip(got_df["lid"].tolist(), got_df["rid"].tolist()))
        assert got == want, (radius, len(got), len(want))
        assert len(got_df) == len(got)  # no duplicate pairs


def test_distance_join_rejects_bad_args(ray_session):
    from osm2shp_ray.stages.spatial import distance_join
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({"lid": [1], "x": [0.0], "y": [0.0]}))
    with pytest.raises(ValueError):
        distance_join(ds, ds, 0.0, left_id="lid", right_id="lid")
    with pytest.raises(ValueError):
        # res 10 cell edge (0.176 deg) < radius 1.0 -> must refuse
        distance_join(ds, ds, 1.0, left_id="lid", right_id="lid", res=10)


def test_binned_quantiles_error_bound(ray_session):
    """Sketch quantiles are within one bin_width of exact quantiles,
    grouped and ungrouped; bad width rejected."""
    import pyarrow as pa
    from osm2shp_ray.stages.sketch import binned_quantiles
    rng = np.random.default_rng(7)
    v = rng.gamma(2.0, 150.0, 20000)
    g = rng.choice(["a", "b"], 20000)
    ds = rd.from_arrow(pa.table({"v": v, "g": g}))
    W = 25.0
    qs = (0.1, 0.5, 0.9)
    out = binned_quantiles(ds, "v", qs, W, group_col="g").to_pandas()
    assert len(out) == 6
    for (grp, q), approx in out.set_index(["g", "q"])["approx"].items():
        exact = np.quantile(v[g == grp], q)
        assert exact - W <= approx <= exact + W, (grp, q, approx, exact)
    flat = binned_quantiles(ds, "v", qs, W).to_pandas()
    assert list(sorted(flat.columns)) == ["approx", "q"]
    assert len(flat) == 3
    for q, approx in flat.set_index("q")["approx"].items():
        exact = np.quantile(v, q)
        assert exact - W <= approx <= exact + W
    with pytest.raises(ValueError):
        binned_quantiles(ds, "v", qs, 0.0)


def test_length_partial_batch_combiner():
    """Per-layer length partial: masks phantom cross-way segments,
    counts ways/vertices per layer, and sums exactly what a per-way
    loop would."""
    import pyarrow as pa
    from osm2shp_ray.stages.geometry import length_partial_batch
    xs = [[0.0, 3.0, 3.0], [1.0, 1.0], [5.0, 5.0, 6.0, 6.0]]
    ys = [[0.0, 4.0, 5.0], [2.0, 9.0], [0.0, 1.0, 1.0, 0.0]]
    t = pa.table({"way_id": [1, 2, 3],
                  "layer_idx": pa.array([0, 1, 0], pa.int8()),
                  "xs": pa.array(xs, pa.list_(pa.float64())),
                  "ys": pa.array(ys, pa.list_(pa.float64()))})
    out = length_partial_batch(t).to_pandas().set_index("layer_idx")
    assert out.loc[0, "part_ways"] == 2
    assert out.loc[0, "part_verts"] == 7
    assert abs(out.loc[0, "part_len"] - (5.0 + 1.0 + 3.0)) < 1e-12
    assert out.loc[1, "part_ways"] == 1
    assert out.loc[1, "part_verts"] == 2
    assert abs(out.loc[1, "part_len"] - 7.0) < 1e-12
    empty = length_partial_batch(t.slice(0, 0))
    assert empty.num_rows == 0
    assert empty.column_names == ["layer_idx", "part_len", "part_ways",
                                  "part_verts"]


def test_bm25_matches_local_reference(ray_session):
    """BM25 top-k equals a single-process numpy reference over the
    same corpus (same tokenizer, Robertson idf, k1/b defaults), and
    rejects empty term lists."""
    import re
    import pyarrow as pa
    from osm2shp_ray.stages.text import bm25_topk
    docs = ["spark join hash", "hash hash hash join", "nothing here",
            "join the spark", "spark spark join hash table scan",
            "", "HASH Join SPARK", "a b c d e f g h i j k"] * 3
    ids = list(range(len(docs)))
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": docs}))
    terms = ["hash", "spark"]
    got = (bm25_topk(ds, terms, k=5).to_pandas()
           .sort_values(["raw", "doc_id"], ascending=[False, True])
           .head(5))
    toks = [re.findall(r"[a-z0-9_]+", d.lower()) for d in docs]
    dl = np.array([len(t) for t in toks], dtype=np.float64)
    n = float(len(docs))
    avgdl = dl.sum() / n
    score = np.zeros(len(docs))
    for tm in terms:
        df_ = float(sum(tm in t for t in toks))
        w = np.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0)
        tf = np.array([t.count(tm) for t in toks], dtype=np.float64)
        score += w * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    order = sorted(range(len(docs)), key=lambda i: (-score[i], i))[:5]
    assert got["doc_id"].tolist() == order
    assert np.allclose(got["raw"].to_numpy(), score[order], atol=1e-12)
    with pytest.raises(ValueError):
        bm25_topk(ds, [], k=5)
    with pytest.raises(ValueError):
        bm25_topk(ds, terms, k=0)


def test_kmeans_matches_local_lloyd(ray_session):
    """Distributed k-means equals a sequential Lloyd reference with
    the same init + centroid quantization; empty clusters drop."""
    import pyarrow as pa
    from osm2shp_ray.stages.ann import kmeans
    rng = np.random.default_rng(11)
    centers = np.array([[0.0, 0.0], [5.0, 5.0], [-5.0, 4.0]])
    x = np.concatenate([c + rng.normal(0, 0.4, (40, 2)) for c in centers])
    ids = np.arange(len(x), dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "vec_id": ids,
        "embedding": pa.array(list(x), pa.list_(pa.float64()))}))
    # 4th centroid far away -> captures nothing -> must drop
    init = np.vstack([x[0], x[40], x[80], [100.0, 100.0]])
    cids, C, out = kmeans(ds, init, iters=3, quant=4)
    got = out.to_pandas().sort_values("vec_id")["cluster"].to_numpy()

    Cr = init.astype(np.float64).copy()
    ref_ids = np.arange(4)
    for _ in range(3):
        a = np.argmin(((x[:, None, :] - Cr[None]) ** 2).sum(-1), axis=1)
        present = np.unique(a)
        Cr = np.round(np.stack([x[a == j].mean(axis=0) for j in present]), 4)
        ref_ids = ref_ids[present]
    ref = ref_ids[np.argmin(((x[:, None, :] - Cr[None]) ** 2).sum(-1), axis=1)]
    assert (got == ref).all()
    assert 100.0 not in C  # the empty far centroid is gone
    assert len(cids) == len(C) <= 4
    with pytest.raises(ValueError):
        kmeans(ds, np.empty((0, 2)), iters=1)


def test_bloom_prefilter_join_equivalence(ray_session):
    """hash_join output is identical with and without the bloom
    prefilter for every how, including int64 keys above 2^53 and a
    probe side that is mostly definite non-members."""
    import pyarrow as pa
    from osm2shp_ray.stages.joins import hash_join
    big = 1 << 60
    lk = np.arange(2000, dtype=np.int64) + big
    left = rd.from_arrow(pa.table({"k": lk, "lv": lk * 3}))
    rk = (np.arange(0, 2000, 7, dtype=np.int64) + big)  # ~14% overlap
    right = rd.from_arrow(pa.table({"k": rk, "rv": rk % 97}))
    for how in ("inner", "left", "left_semi", "left_anti",
                "right", "full_outer"):
        base = hash_join(left, right, on="k", how=how,
                         n_buckets=8).to_pandas()
        blm = hash_join(left, right, on="k", how=how, n_buckets=8,
                        bloom_prefilter=True,
                        bloom_bits=1 << 12).to_pandas()
        cols = list(base.columns)
        a = base.sort_values(cols, ignore_index=True)
        b = blm[cols].sort_values(cols, ignore_index=True)
        assert a.equals(b), how
        if how == "inner":
            assert len(a) == len(rk)
            assert (a["lv"].to_numpy() == a["k"].to_numpy() * 3).all()


def test_bloom_no_false_negatives_and_fp_rate():
    """build_bloom/_bloom_maybe: every inserted key tests positive;
    the false-positive rate on disjoint keys is near the analytic
    bound for the sizing."""
    import pyarrow as pa
    from osm2shp_ray.stages.joins import build_bloom, _bloom_maybe
    n_bits, kh = 1 << 16, 4
    ins = pa.table({"k": np.arange(4000, dtype=np.int64)})
    probe = pa.table({"k": np.arange(4000, 40000, dtype=np.int64)})
    words = build_bloom(rd.from_arrow(ins), ["k"], n_bits, kh)
    assert _bloom_maybe(ins, ["k"], words, n_bits, kh).all()
    fp = _bloom_maybe(probe, ["k"], words, n_bits, kh).mean()
    # m/n = 16.4, k = 4 -> analytic fp ~0.24%; allow generous slack
    assert fp < 0.02, fp


def test_bloom_join_string_keys(ray_session):
    """Bloom prefilter with string keys (polars-hash path)."""
    import pyarrow as pa
    from osm2shp_ray.stages.joins import hash_join
    left = rd.from_arrow(pa.table({"k": [f"u{i}" for i in range(500)],
                                   "lv": list(range(500))}))
    right = rd.from_arrow(pa.table({"k": [f"u{i}" for i in range(0, 500, 9)],
                                    "rv": list(range(0, 500, 9))}))
    for how in ("left_semi", "left_anti"):
        base = hash_join(left, right, on="k", how=how).to_pandas()
        blm = hash_join(left, right, on="k", how=how,
                        bloom_prefilter=True, bloom_bits=1 << 10).to_pandas()
        a = base.sort_values(list(base.columns), ignore_index=True)
        b = blm[base.columns].sort_values(list(base.columns),
                                          ignore_index=True)
        assert a.equals(b), how


def test_stratified_sample_deterministic_cap(ray_session):
    """Every stratum is capped at k, small strata keep all rows, and
    the draw is deterministic across re-runs and repartitioning."""
    import pyarrow as pa
    from osm2shp_ray.stages.sketch import stratified_sample
    ids = np.arange(1000, dtype=np.int64)
    grp = np.where(ids < 700, "big", np.where(ids < 990, "mid", "tiny"))
    t = pa.table({"doc_id": ids, "source": grp.astype(object)})
    ds = rd.from_arrow(t)
    out = stratified_sample(ds, "source", "doc_id", 50).to_pandas()
    sizes = out.groupby("source").size().to_dict()
    assert sizes == {"big": 50, "mid": 50, "tiny": 10}
    out2 = stratified_sample(ds.repartition(7), "source", "doc_id",
                             50).to_pandas()
    a = out.sort_values(["source", "doc_id"], ignore_index=True)
    b = out2.sort_values(["source", "doc_id"], ignore_index=True)
    assert a.equals(b)
    with pytest.raises(ValueError):
        stratified_sample(ds, "source", "doc_id", 0)


def test_pq_adc_recall_and_code_semantics(ray_session):
    """PQ: codes are the per-subspace nearest centroids; ADC top-k
    achieves high recall vs exact L2 top-k on clustered data."""
    import pyarrow as pa
    from osm2shp_ray.stages.ann import pq_train, pq_encode, pq_adc_topk
    rng = np.random.default_rng(3)
    centers = rng.normal(0, 1, (6, 16))
    x = np.concatenate([c + rng.normal(0, 0.15, (50, 16)) for c in centers])
    ids = np.arange(len(x), dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "vec_id": ids,
        "embedding": pa.array(list(x), pa.list_(pa.float64()))}))
    init = x[:4]
    books = pq_train(ds, 16, 4, 4, 2, init)
    assert len(books) == 4
    codes = pq_encode(ds, books, 4).to_pandas().sort_values("vec_id")
    # every code is one of its subspace's cluster ids; spot-check
    # nearest-centroid semantics on subspace 0
    cids0, C0 = books[0]
    a0 = np.argmin(((x[:, None, :4] - C0[None]) ** 2).sum(-1), axis=1)
    assert (codes["code_0"].to_numpy() == cids0[a0]).all()
    q = x[7]
    got = (pq_adc_topk(pq_encode(ds, books, 4), books, 4, q, 10)
           .to_pandas().sort_values(["raw", "vec_id"]).head(10))
    # PQ at this granularity collapses a cluster to a handful of code
    # tuples, so the guarantee is CELL-level: every retrieved id
    # belongs to the query's true cluster (members 0..49)
    assert all(0 <= i < 50 for i in got["vec_id"]), got
    # exact semantics: the distributed scan must equal a brute-force
    # ADC over the full code table with the same (raw, id) tie order
    luts = []
    for j, (cids, C) in enumerate(books):
        qs = q[j * 4:(j + 1) * 4]
        luts.append((cids, ((qs[None, :] - C) ** 2).sum(axis=1)))
    adc = np.zeros(len(x))
    for j, (cids, lut) in enumerate(luts):
        code = codes.sort_values("vec_id")[f"code_{j}"].to_numpy()
        adc += lut[np.searchsorted(cids, code)]
    order = np.lexsort((ids, adc))[:10]
    assert got["vec_id"].tolist() == ids[order].tolist()
    assert np.allclose(got["raw"].to_numpy(), adc[order])
    with pytest.raises(ValueError):
        pq_train(ds, 16, 5, 4, 2, init)


def test_repetition_stats_edge_cases(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.text import repetition_stats_batch
    t = pa.table({"doc_id": [1, 2, 3, 4, 5],
                  "text": ["", "   ", "one", "a a a a", "x y x y #!"]})
    out = repetition_stats_batch(t)
    dup = out["dup_tok_frac"].to_pylist()
    topu = out["top_unigram_frac"].to_pylist()
    topb = out["top_bigram_frac"].to_pylist()
    sym = out["symbol_ratio"].to_pylist()
    # empty / blank text: every stat 0
    assert dup[0] == dup[1] == 0.0 and topb[0] == topb[1] == 0.0
    # single token: no bigrams, top unigram is the whole doc
    assert dup[2] == 0.0 and topu[2] == 1.0 and topb[2] == 0.0
    # pure repetition: 4 tokens 1 distinct; bigram "a a" is all 3
    assert dup[3] == 0.75 and topu[3] == 1.0 and topb[3] == 1.0
    # "x y x y #!": 5 tokens 3 distinct; "x y" is 2 of 4 bigrams;
    # symbol chars are '#' and '!' of 10 chars
    assert dup[4] == pytest.approx(1 - 3 / 5)
    assert topb[4] == 0.5 and sym[4] == pytest.approx(0.2)


def test_heavy_hitters_exact_with_forced_mg_reduction(ray_session):
    # plant a skewed stream and force m far below the cardinality so
    # every batch takes the Misra-Gries decrement path; the two-pass
    # operator must still return EXACT counts of exactly the items at
    # or above ceil(phi * N)
    import collections
    import pyarrow as pa
    from osm2shp_ray.stages.sketch import heavy_hitters
    rng = np.random.default_rng(5)
    hot = np.repeat([f"hot{i}" for i in range(4)], [4000, 3000, 800, 700])
    cold = np.array([f"c{i}" for i in rng.integers(0, 3000, 12000)])
    vals = np.concatenate((hot, cold))
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())}))
    ds = ds.repartition(8)
    phi = 0.03  # threshold = ceil(0.03 * 20500) = 615
    got = heavy_hitters(ds, "v", phi, m=8).to_pandas()
    exact = collections.Counter(vals.tolist())
    thr = int(np.ceil(phi * len(vals)))
    want = {k: c for k, c in exact.items() if c >= thr}
    assert dict(zip(got["v"], got["cnt"])) == want
    assert set(want) >= {"hot0", "hot1", "hot2", "hot3"}


def test_heavy_hitters_rejects_bad_phi(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.sketch import heavy_hitters
    ds = rd.from_arrow(pa.table({"v": pa.array(["a"], pa.string())}))
    with pytest.raises(ValueError):
        heavy_hitters(ds, "v", 0.0)


def test_semantic_dedup_prune_rule(ray_session):
    # two tight clusters far apart; within each, ids 0/1 are near-dups
    # (cos >= tau) and id 2 is distinct. The lower-id survivor stays;
    # cross-cluster near-identical vectors must NOT prune each other.
    import pyarrow as pa
    from osm2shp_ray.stages.dedup import semantic_dedup
    base_a = np.array([1.0, 0.0, 0.0, 0.0])
    base_b = np.array([0.0, 1.0, 0.0, 0.0])
    vecs = np.stack([
        base_a, base_a + 1e-3, np.array([0.7, 0.0, 0.7, 0.0]),   # cluster A
        base_b, base_b + 1e-3, np.array([0.0, 0.7, 0.0, 0.7]),   # cluster B
    ])
    ids = np.arange(6, dtype=np.int64)
    t = pa.table({"vec_id": ids,
                  "embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(3)
    cids = np.array([0, 1], dtype=np.int64)
    C = np.stack([base_a, base_b])
    kept = semantic_dedup(ds, cids, C, tau=0.95).to_pandas()
    got = sorted(map(tuple, kept[["vec_id", "cluster"]].to_numpy()))
    # ids 1 and 4 pruned (near-dup of lower id in same cluster)
    assert got == [(0, 0), (2, 0), (3, 1), (5, 1)]
    with pytest.raises(ValueError):
        semantic_dedup(ds, cids, C, tau=0.0)


def test_semantic_dedup_blocked_matches_unblocked(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.dedup import semantic_dedup
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 8))
    t = pa.table({"vec_id": np.arange(200, dtype=np.int64),
                  "embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(4)
    C = vecs[:3]
    a = semantic_dedup(ds, np.arange(3), C, tau=0.6, block=7).to_pandas()
    b = semantic_dedup(ds, np.arange(3), C, tau=0.6, block=4096).to_pandas()
    key = lambda df: sorted(map(tuple, df[["vec_id", "cluster"]].to_numpy()))
    assert key(a) == key(b)


def test_mixture_sample_semantics(ray_session):
    import pyarrow as pa
    from osm2shp_ray.functions.hashing import md5_hash60
    from osm2shp_ray.stages.sketch import mixture_sample
    n = 4000
    t = pa.table({"id": np.arange(n, dtype=np.int64),
                  "src": np.where(np.arange(n) % 2 == 0, "a", "b")})
    ds = rd.from_arrow(t).repartition(4)
    got = mixture_sample(ds, "src", "id", {"a": 0.25, "b": 1.0}).to_pandas()
    # fraction-1.0 groups keep everything; fraction-0 default drops
    assert (got["src"] == "b").sum() == n // 2
    # exact decision-rule reproduction for the sampled group
    ids_a = np.arange(0, n, 2)
    want = ids_a[md5_hash60(ids_a) % 10000 < 2500]
    assert sorted(got.loc[got["src"] == "a", "id"]) == sorted(want)
    # unlisted group falls to the default (drop)
    got2 = mixture_sample(ds, "src", "id", {"b": 0.5}, default=0.0).to_pandas()
    assert (got2["src"] == "a").sum() == 0
    with pytest.raises(ValueError):
        mixture_sample(ds, "src", "id", {"a": 1.5})


def test_decontaminate_semantics_and_dual(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.text import decontaminate
    ev = rd.from_arrow(pa.table({
        "doc_id": [100, 101],
        "text": ["the quick brown fox jumps", "over the lazy dog today"]}))
    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            # contains "the quick brown" and "quick brown fox" -> 2 hits
            "so the quick brown fox ran",
            # contains "over the lazy" only -> 1 hit
            "it leapt over the lazy cat",
            # shares words but no full 3-gram -> clean
            "brown dog fox lazy the quick",
            "completely unrelated text here",
        ]})).repartition(3)
    got = decontaminate(docs, ev, n=3).to_pandas()
    assert dict(zip(got["doc_id"], got["n_hit"])) == {1: 2, 2: 1}
    # distinct-gram counting: a repeated contaminated gram counts once
    rep = rd.from_arrow(pa.table({
        "doc_id": [9],
        "text": ["the quick brown fox the quick brown fox"]}))
    got2 = decontaminate(rep, ev, n=3).to_pandas()
    # grams hit: "the quick brown" (x2 -> 1), "quick brown fox" (x2 -> 1)
    assert dict(zip(got2["doc_id"], got2["n_hit"])) == {9: 2}
    # distributed dual is byte-identical
    key = lambda df: sorted(map(tuple, df[["doc_id", "n_hit"]].to_numpy()))
    dist = decontaminate(docs, ev, n=3, distributed=True).to_pandas()
    assert key(dist) == key(got)
    with pytest.raises(ValueError):
        decontaminate(docs, ev, n=0)


def test_lm_score_semantics_and_dual(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.text import LM_SCALE, lm_score
    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["aa bb aa", "bb cc", "", "AA, cc!"]})).repartition(3)
    got = lm_score(docs).to_pandas().set_index("doc_id").sort_index()
    # corpus counts: aa=3 (doc4's "AA" lowercases), bb=2, cc=2; T=7
    lp = {t: int(np.floor(LM_SCALE * np.log(c / 7.0)))
          for t, c in {"aa": 3.0, "bb": 2.0, "cc": 2.0}.items()}
    assert got.loc[1, "n_tok"] == 3
    assert got.loc[1, "lp_sum"] == 2 * lp["aa"] + lp["bb"]
    assert got.loc[2, "lp_sum"] == lp["bb"] + lp["cc"]
    assert got.loc[4, "lp_sum"] == lp["aa"] + lp["cc"]
    assert 3 not in got.index  # empty doc: no LM evidence
    dist = (lm_score(docs, distributed=True).to_pandas()
            .set_index("doc_id").sort_index())
    assert dist.equals(got)
    with pytest.raises(ValueError):
        lm_score(docs, scale=0)


def test_lag_rank_semantics(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.temporal import lag_rank
    ts = pa.array([1_000_000, 3_000_000, 2_000_000, 2_000_000, 9_000_000],
                  pa.timestamp("us"))
    t = pa.table({"event_id": [10, 11, 12, 13, 14],
                  "user_id": [1, 1, 1, 2, 2],
                  "ts": ts})
    got = (lag_rank(rd.from_arrow(t).repartition(3)).to_pandas()
           .set_index("event_id").sort_index())
    # user 1 ordered by (ts, event_id): 10@1s rn1, 12@2s rn2, 11@3s rn3
    assert got.loc[10, ["rn", "delta_us"]].tolist() == [1, -1]
    assert got.loc[12, ["rn", "delta_us"]].tolist() == [2, 1_000_000]
    assert got.loc[11, ["rn", "delta_us"]].tolist() == [3, 1_000_000]
    assert got.loc[13, ["rn", "delta_us"]].tolist() == [1, -1]
    assert got.loc[14, ["rn", "delta_us"]].tolist() == [2, 7_000_000]


def test_dsir_weights_semantics(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.text import LM_SCALE, dsir_weights
    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["aa aa bb", "bb cc", "aa cc cc"]})).repartition(2)
    tgt = rd.from_arrow(pa.table({"doc_id": [10], "text": ["aa aa aa bb"]}))
    got = (dsir_weights(docs, tgt).to_pandas()
           .set_index("doc_id").sort_index())
    # raw: aa=3 bb=2 cc=3, T=8, V=3; tgt: aa=3 bb=1 cc=0, Tt=4
    def q(x):
        return np.floor(LM_SCALE * np.log(x))
    w = {"aa": q(4.0 / 7.0) - q(3.0 / 8.0),
         "bb": q(2.0 / 7.0) - q(2.0 / 8.0),
         "cc": q(1.0 / 7.0) - q(3.0 / 8.0)}
    assert got.loc[1, "w_sum"] == int(2 * w["aa"] + w["bb"])
    assert got.loc[2, "w_sum"] == int(w["bb"] + w["cc"])
    assert got.loc[3, "w_sum"] == int(w["aa"] + 2 * w["cc"])
    assert got["n_tok"].tolist() == [3, 2, 3]
    # target-favored doc 1 outranks target-unseen-heavy doc 3
    assert got.loc[1, "w_sum"] > got.loc[3, "w_sum"]
    with pytest.raises(ValueError):
        dsir_weights(docs, tgt, scale=-1)


def test_grouped_mode_semantics(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.sketch import grouped_mode
    t = pa.table({"k": [1, 1, 1, 2, 2, 2, 3],
                  "v": ["b", "a", "b", "z", "a", "z", "q"]})
    got = (grouped_mode(rd.from_arrow(t).repartition(3), "k", "v")
           .to_pandas().set_index("k").sort_index())
    assert got.loc[1].tolist() == ["b", 2]
    assert got.loc[3].tolist() == ["q", 1]
    assert got.loc[2].tolist() == ["z", 2]
    # tie-break: equally frequent -> smallest value wins
    t2 = pa.table({"k": [7, 7], "v": ["beta", "alpha"]})
    got2 = grouped_mode(rd.from_arrow(t2), "k", "v").to_pandas()
    assert got2["mode_val"].tolist() == ["alpha"]
    # string keys route through the polars hash bucket path
    t3 = pa.table({"k": ["x", "x", "y"], "v": [5, 5, 9]})
    got3 = (grouped_mode(rd.from_arrow(t3).repartition(2), "k", "v")
            .to_pandas().set_index("k").sort_index())
    assert got3.loc["x"].tolist() == [5, 2]
    assert got3.loc["y"].tolist() == [9, 1]


def test_caption_image_score_semantics(ray_session):
    import pyarrow as pa
    from osm2shp_ray.functions.hashing import md5_hash60
    from osm2shp_ray.functions import codec
    from osm2shp_ray.sources.fixtures import images_batch
    from osm2shp_ray.stages.images import caption_image_score
    imgs = images_batch(np.arange(8))
    got = (caption_image_score(rd.from_arrow(imgs), batch_size=3)
           .to_pandas().set_index("image_id"))
    assert len(got) == 8  # all fixture rows decode and have tokens
    # hand-compute row 0: quadrant means of the decoded image x
    # 5-bit-slice caption features
    img = codec.decode_image(imgs["bytes"][0].as_py(), imgs["fmt"][0].as_py())
    m = codec.resize_box(img, 2, 2).astype(np.float64).reshape(-1) / 255.0
    import re
    toks = re.findall(r"[a-z0-9_]+", imgs["caption"][0].as_py().lower())
    h = md5_hash60(np.array(toks, dtype=object))
    c = (((h[:, None] >> (5 * np.arange(12))) & 31) * 2 - 31).sum(axis=0)
    want = float(np.dot(m, c) / (np.linalg.norm(m) * np.linalg.norm(c.astype(float))))
    assert abs(got.loc["img-000000000", "clip_score"] - want) < 1e-9
    assert got["clip_score"].between(-1.0, 1.0).all()
    # undecodable blob and token-free caption are dropped, not scored
    bad = pa.table({
        "image_id": ["x1", "x2"],
        "bytes": [b"notanimage", imgs["bytes"][1].as_py()],
        "fmt": ["png", "jpeg"],
        "caption": ["valid words here", "!!! ..."]})
    got2 = caption_image_score(rd.from_arrow(bad)).to_pandas()
    assert len(got2) == 0


def test_incremental_dedup_semantics(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.dedup import incremental_dedup
    seen = rd.from_arrow(pa.table({
        "doc_id": [100, 101],
        "text": ["the cat sat on the mat today", "other snapshot content"]}))
    new = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "The CAT sat on the mat entirely different tail",  # same 5-tok prefix
            "the cat sat on a rug",                            # differs at tok 5
            "fresh unrelated document",
        ]})).repartition(2)
    got = incremental_dedup(new, seen, prefix_k=5).to_pandas()
    assert sorted(got["doc_id"]) == [2, 3]
    # whole-text identity: only byte-identical (case-sensitive) dups drop
    new2 = rd.from_arrow(pa.table({
        "doc_id": [7, 8],
        "text": ["other snapshot content", "Other Snapshot Content"]}))
    got2 = incremental_dedup(new2, seen, prefix_k=None).to_pandas()
    assert got2["doc_id"].tolist() == [8]
    # bloom on/off equivalence
    got3 = incremental_dedup(new, seen, prefix_k=5,
                             bloom_prefilter=False).to_pandas()
    assert sorted(got3["doc_id"]) == sorted(got["doc_id"])


def test_cooccurrence_pmi_semantics(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.sketch import cooccurrence_pmi
    # baskets: u1={a,b}, u2={a,b}, u3={a,c} (dup rows collapse)
    t = pa.table({"u": [1, 1, 1, 2, 2, 3, 3],
                  "it": ["a", "b", "b", "a", "b", "a", "c"]})
    got = (cooccurrence_pmi(rd.from_arrow(t).repartition(3), "u", "it")
           .to_pandas().set_index(["item_a", "item_b"]).sort_index())
    # N=3, c_a=3, c_b=2, c_c=1; pairs: (a,b)x2, (a,c)x1
    assert got.loc[("a", "b"), "n_pairs"] == 2
    assert got.loc[("a", "c"), "n_pairs"] == 1
    assert len(got) == 2  # (b,c) never co-occur
    pmi_ab = int(np.floor(1e6 * np.log((2.0 * 3.0) / (3.0 * 2.0))))
    pmi_ac = int(np.floor(1e6 * np.log((1.0 * 3.0) / (3.0 * 1.0))))
    assert got.loc[("a", "b"), "pmi_q"] == pmi_ab == 0
    assert got.loc[("a", "c"), "pmi_q"] == pmi_ac == 0
    # anti-correlated pair scores negative
    t2 = pa.table({"u": [1, 1, 2, 2, 3, 3, 4],
                   "it": ["a", "b", "a", "c", "b", "c", "a"]})
    got2 = (cooccurrence_pmi(rd.from_arrow(t2), "u", "it")
            .to_pandas().set_index(["item_a", "item_b"]))
    # (a,b): c=1, N=4, ca=3, cb=2 -> ln(4/6) < 0
    assert got2.loc[("a", "b"), "pmi_q"] == int(np.floor(1e6 * np.log(4.0 / 6.0)))
    with pytest.raises(ValueError):
        cooccurrence_pmi(rd.from_arrow(t), "u", "it", scale=0)


def test_top_fraction_semantics(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.sketch import top_fraction
    t = pa.table({"id": np.arange(10, dtype=np.int64),
                  "s": np.array([5, 3, 9, 9, 1, 7, 2, 8, 9, 0], np.float64)})
    ds = rd.from_arrow(t).repartition(4)
    # frac 0.3 of 10 -> exactly 3 rows; ties on s=9 break by id ASC
    got = top_fraction(ds, "s", "id", 0.3).to_pandas()
    assert sorted(got["id"]) == [2, 3, 8]
    # ceil: frac 0.25 of 10 -> 3 rows as well
    got2 = top_fraction(ds, "s", "id", 0.25).to_pandas()
    assert len(got2) == 3
    # frac 1.0 keeps everything
    assert len(top_fraction(ds, "s", "id", 1.0).to_pandas()) == 10
    with pytest.raises(ValueError):
        top_fraction(ds, "s", "id", 0.0)


def test_dsir_weights_distributed_dual(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.text import dsir_weights
    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["aa aa bb", "bb cc", "aa cc cc"]})).repartition(2)
    tgt = rd.from_arrow(pa.table({"doc_id": [10], "text": ["aa aa aa bb"]}))
    a = (dsir_weights(docs, tgt).to_pandas()
         .set_index("doc_id").sort_index())
    b = (dsir_weights(docs, tgt, distributed=True).to_pandas()
         .set_index("doc_id").sort_index())
    assert b.equals(a)


def test_distinct_count_semantics(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.sketch import distinct_count
    t = pa.table({"k": [1, 1, 1, 2, 2], "v": ["a", "a", "b", "c", "c"]})
    got = (distinct_count(rd.from_arrow(t).repartition(3), "k", "v")
           .to_pandas().set_index("k").sort_index())
    assert got["n_distinct"].tolist() == [2, 1]


def test_centroid_outliers_semantics(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.ann import centroid_outliers
    C = np.array([[0.0, 0.0], [10.0, 0.0]])
    vecs = [[0.1, 0.0],    # near c0: d2=0.01
            [10.0, 2.0],   # near c1: d2=4.0
            [5.0, 0.0],    # equidistant (d2=25): tie -> cluster 0
            [0.0, 3.0]]    # near c0: d2=9.0
    ds = rd.from_arrow(pa.table({
        "vec_id": [1, 2, 3, 4],
        "embedding": pa.array(vecs, pa.list_(pa.float32()))})).repartition(2)
    got = (centroid_outliers(ds, np.array([0, 1]), C, 1.0).to_pandas()
           .set_index("vec_id").sort_index())
    assert got.index.tolist() == [2, 3, 4]  # vec 1 is under the threshold
    assert got.loc[2, "cluster"] == 1 and got.loc[2, "d2"] == 4.0
    assert got.loc[3, "cluster"] == 0 and got.loc[3, "d2"] == 25.0
    assert got.loc[4, "cluster"] == 0 and got.loc[4, "d2"] == 9.0
    with pytest.raises(ValueError):
        centroid_outliers(ds, np.array([0, 1]), C, -1.0)


# ------------------------------------------- right / full-outer joins

def test_hash_join_right_and_full_outer(ray_session):
    import pyarrow as pa
    from osm2shp_ray.stages.joins import hash_join
    left = rd.from_arrow(pa.table({"k": [1, 2, 3, 3], "lv": [10, 20, 30, 31]}))
    right = rd.from_arrow(pa.table({"k": [2, 3, 5], "rv": ["b", "c", "e"]}))

    r = (hash_join(left, right, on="k", how="right", n_buckets=4).to_pandas()
         .sort_values(["k", "lv"], na_position="last", ignore_index=True))
    assert r["k"].tolist() == [2, 3, 3, 5]
    assert r["rv"].tolist() == ["b", "c", "c", "e"]
    assert r["lv"].tolist()[:3] == [20, 30, 31] and pd.isna(r["lv"].iloc[3])

    f = (hash_join(left, right, on="k", how="full_outer", n_buckets=4)
         .to_pandas()
         .sort_values(["k", "lv"], na_position="last", ignore_index=True))
    assert f["k"].tolist() == [1, 2, 3, 3, 5]
    assert pd.isna(f["rv"].iloc[0]) and pd.isna(f["lv"].iloc[4])
    assert f["rv"].tolist()[1:4] == ["b", "c", "c"]


def test_hash_join_outer_matches_pandas_reference(ray_session):
    """Randomized right/full_outer vs the pandas merge oracle,
    including keys with no match on either side."""
    from osm2shp_ray.stages.joins import hash_join
    rng = np.random.default_rng(11)
    ldf = pd.DataFrame({"k": rng.integers(0, 40, 250),
                        "lv": rng.integers(0, 1000, 250)})
    rdf = pd.DataFrame({"k": rng.integers(20, 60, 90),
                        "rv": rng.integers(0, 1000, 90)})
    for how, pd_how in (("right", "right"), ("full_outer", "outer")):
        got = (hash_join(rd.from_pandas(ldf), rd.from_pandas(rdf),
                         on="k", how=how, n_buckets=8).to_pandas())
        got = (got.astype({"lv": "float64", "rv": "float64"})
               .sort_values(["k", "lv", "rv"], ignore_index=True))
        want = (ldf.merge(rdf, on="k", how=pd_how)
                .astype({"lv": "float64", "rv": "float64"})
                .sort_values(["k", "lv", "rv"], ignore_index=True))
        pd.testing.assert_frame_equal(got[["k", "lv", "rv"]],
                                      want[["k", "lv", "rv"]], check_dtype=False)


def test_hash_join_full_outer_int64_exact(ray_session):
    """full_outer keeps unmatched int64 values exact above 2^53
    (typed Arrow nulls, never NaN-widened floats, on BOTH sides)."""
    import pyarrow as pa
    from osm2shp_ray.stages.joins import hash_join
    big = (1 << 60) + 1
    left = rd.from_arrow(pa.table({"k": [1, 2], "lv": [big, big + 2]}))
    right = rd.from_arrow(pa.table({"k": [2, 3], "rv": [big + 5, big + 7]}))
    out = hash_join(left, right, on="k", how="full_outer", n_buckets=2)
    t = pa.concat_tables(
        b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows)
    df = t.to_pandas(types_mapper=pd.ArrowDtype).sort_values(
        "k", ignore_index=True)
    assert df.loc[0, "lv"] == big and pd.isna(df.loc[0, "rv"])
    assert df.loc[1, "lv"] == big + 2 and df.loc[1, "rv"] == big + 5
    assert pd.isna(df.loc[2, "lv"]) and df.loc[2, "rv"] == big + 7


# ------------------------------------------------ distributed prefix scan

def test_running_total_matches_sequential(ray_session):
    """Two-phase scan == sequential cumsum across bin boundaries,
    negative values, and ts ties broken by event_id."""
    from osm2shp_ray.stages.temporal import running_total
    rng = np.random.default_rng(3)
    n = 5000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 72 * 3600, n).astype("timedelta64[s]")
    ts[100] = ts[101]  # planted tie
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts.astype("datetime64[us]"),
        "value": rng.normal(0, 50, n),
    })
    got = (running_total(rd.from_pandas(df).repartition(8))
           .to_pandas().set_index("event_id").sort_index())
    q = np.floor(df["value"].to_numpy() * 10000).astype(np.int64)
    order = np.lexsort((df["event_id"].to_numpy(), df["ts"].to_numpy()))
    want = np.empty(n, dtype=np.int64)
    want[order] = np.cumsum(q[order])
    assert (got["run_q"].to_numpy() == want).all()


# --------------------------------------------------------------- rollup

def test_rollup_levels_match_pandas(ray_session):
    """rollup == the union of per-level pandas groupbys, including the
    grand total, with '*' sentinels on rolled-up keys."""
    from osm2shp_ray.stages.sketch import rollup
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 400),
        "b": rng.choice(["p", "q"], 400),
        "v": rng.integers(0, 100, 400),
    })
    got = (rollup(rd.from_pandas(df).repartition(6), ["a", "b"],
                  sum_col="v", count_alias="n", sum_alias="tv")
           .to_pandas().sort_values(["a", "b"], ignore_index=True))
    fine = (df.groupby(["a", "b"], as_index=False)
            .agg(n=("v", "size"), tv=("v", "sum")))
    mid = (df.groupby("a", as_index=False)
           .agg(n=("v", "size"), tv=("v", "sum")).assign(b="*"))
    top = pd.DataFrame({"a": ["*"], "b": ["*"],
                        "n": [len(df)], "tv": [df["v"].sum()]})
    want = (pd.concat([fine, mid, top], ignore_index=True)
            [["a", "b", "n", "tv"]]
            .sort_values(["a", "b"], ignore_index=True))
    want["n"] = want["n"].astype(np.int64)
    want["tv"] = want["tv"].astype(np.int64)
    pd.testing.assert_frame_equal(got[["a", "b", "n", "tv"]], want,
                                  check_dtype=False)


def test_rollup_count_only(ray_session):
    from osm2shp_ray.stages.sketch import rollup
    df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["p", "q", "p"]})
    got = (rollup(rd.from_pandas(df), ["a", "b"]).to_pandas()
           .sort_values(["a", "b"], ignore_index=True))
    assert got.loc[(got["a"] == "*") & (got["b"] == "*"), "n"].iloc[0] == 3
    assert got.loc[(got["a"] == "x") & (got["b"] == "*"), "n"].iloc[0] == 2
    assert len(got) == 3 + 2 + 1


# ---------------------------------------------------------------- ntile

def test_ntile_sql_tile_sizes(ray_session):
    """Exact SQL NTILE semantics: first n%k tiles get one extra row;
    n < k degenerates to one row per tile."""
    from osm2shp_ray.stages.temporal import ntile
    rows = []
    base = np.datetime64("2024-01-01", "us")
    for uid, n in ((1, 10), (2, 3), (3, 8), (4, 1)):
        for i in range(n):
            rows.append((uid * 1000 + i, uid, base + np.timedelta64(i, "s")))
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    got = (ntile(rd.from_pandas(df).repartition(4), 4)
           .to_pandas().sort_values("event_id"))
    by_uid = {uid: g["tile"].tolist()
              for uid, g in got.groupby(got["event_id"] // 1000)}
    assert by_uid[1] == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]  # 10 = 3+3+2+2
    assert by_uid[2] == [1, 2, 3]
    assert by_uid[3] == [1, 1, 2, 2, 3, 3, 4, 4]
    assert by_uid[4] == [1]
    with pytest.raises(ValueError):
        ntile(rd.from_pandas(df), 0)


# ------------------------------------------------------------- pagerank

def test_pagerank_matches_sequential_reference(ray_session):
    """3-iteration integer PageRank == a sequential pure-Python
    implementation of the same integer recurrence."""
    from osm2shp_ray.stages.graph import pagerank, PR_SCALE
    rng = np.random.default_rng(4)
    raw = {(int(a), int(b)) for a, b in
           zip(rng.integers(0, 30, 200), rng.integers(0, 30, 200))
           if a != b}
    edges = sorted(raw | {(b, a) for a, b in raw})
    df = pd.DataFrame(edges, columns=["src", "dst"])

    got = {r["node"]: r["r"] for r in
           pagerank(rd.from_pandas(df).repartition(4), iters=3,
                    n_buckets=8).take_all()}

    nodes = sorted({s for s, _ in edges})
    deg = {u: 0 for u in nodes}
    for s, _ in edges:
        deg[s] += 1
    r0 = PR_SCALE // len(nodes)
    base = (15 * r0) // 100
    r = {u: r0 for u in nodes}
    for _ in range(3):
        s = {u: 0 for u in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {u: base + (85 * s[u]) // 100 for u in nodes}
    assert got == r

    with pytest.raises(ValueError):
        pagerank(rd.from_pandas(df), iters=0)


# ----------------------------------------------------- exact selection

def test_exact_kth_matches_numpy(ray_session):
    from osm2shp_ray.stages.sketch import exact_kth
    rng = np.random.default_rng(8)
    v = np.concatenate([rng.normal(0, 1000, 4000),
                        np.full(500, 42.5),  # heavy duplicate run
                        rng.uniform(-5, 5, 1500)])
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(8)
    sv = np.sort(v)
    for k in (1, 2, 137, len(v) // 2, len(v) - 1, len(v)):
        got = exact_kth(ds, "x", k, coarse_width=100.0, collect_cap=256)
        assert got == sv[k - 1], k
    with pytest.raises(ValueError):
        exact_kth(ds, "x", 0, coarse_width=100.0)
    with pytest.raises(ValueError):
        exact_kth(ds, "x", len(v) + 1, coarse_width=100.0)
    with pytest.raises(ValueError):
        exact_kth(ds, "x", 5, coarse_width=-1.0)


def test_exact_kth_refines_dense_bin(ray_session):
    # all mass in ONE coarse bin forces the refinement level
    from osm2shp_ray.stages.sketch import exact_kth
    rng = np.random.default_rng(13)
    v = rng.uniform(10.0, 10.001, 3000)
    ds = rd.from_pandas(pd.DataFrame({"x": v}))
    k = 1501
    got = exact_kth(ds, "x", k, coarse_width=1000.0, collect_cap=100)
    assert got == np.sort(v)[k - 1]


# ------------------------------------------------ interval-overlap join

def test_interval_join_matches_brute_force(ray_session):
    from osm2shp_ray.stages.temporal import interval_join
    rng = np.random.default_rng(21)
    na, nb = 300, 250
    a_lo = rng.uniform(0, 1000, na)
    a_hi = a_lo + rng.uniform(0, 30, na)
    b_lo = rng.uniform(0, 1000, nb)
    b_hi = b_lo + rng.uniform(0, 30, nb)
    left = rd.from_pandas(pd.DataFrame(
        {"id_a": np.arange(na, dtype=np.int64), "lo": a_lo, "hi": a_hi}))
    right = rd.from_pandas(pd.DataFrame(
        {"id_b": np.arange(nb, dtype=np.int64), "lo": b_lo, "hi": b_hi}))
    got = (interval_join(left, right, "lo", "hi", ["id_a"], ["id_b"],
                         bin_width=25.0)
           .to_pandas())
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert len(pairs) == len(got)  # exactly-once emission
    hit = (a_lo[:, None] <= b_hi[None, :]) & (b_lo[None, :] <= a_hi[:, None])
    want = set(zip(*np.nonzero(hit)))
    assert pairs == want
    with pytest.raises(ValueError):
        interval_join(left, right, "lo", "hi", ["id_a"], ["id_b"],
                      bin_width=0)


def test_pagerank_paths_equivalent(ray_session):
    """node_cap=0 forces the distributed hash_join dual; it must match
    the broadcast stationary-edges path exactly."""
    from osm2shp_ray.stages.graph import pagerank
    rng = np.random.default_rng(14)
    raw = {(int(a), int(b)) for a, b in
           zip(rng.integers(0, 40, 300), rng.integers(0, 40, 300))
           if a != b}
    edges = sorted(raw | {(b, a) for a, b in raw})
    df = pd.DataFrame(edges, columns=["src", "dst"])
    a = {r["node"]: r["r"] for r in
         pagerank(rd.from_pandas(df), iters=3, n_buckets=8).take_all()}
    b = {r["node"]: r["r"] for r in
         pagerank(rd.from_pandas(df), iters=3, n_buckets=8,
                  node_cap=0).take_all()}
    assert a == b and len(a) == 40


def test_pagerank_dedup_multigraph(ray_session):
    """dedup=True on a multigraph == no-dedup on the pre-deduped
    simple graph."""
    from osm2shp_ray.stages.graph import pagerank
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)]
    dup = pd.DataFrame(edges * 3, columns=["src", "dst"])
    simple = pd.DataFrame(edges, columns=["src", "dst"])
    a = {r["node"]: r["r"] for r in
         pagerank(rd.from_pandas(dup), iters=2, dedup=True).take_all()}
    b = {r["node"]: r["r"] for r in
         pagerank(rd.from_pandas(simple), iters=2).take_all()}
    assert a == b


# --------------------------------------------------------------- skyline

def test_skyline_matches_brute_force(ray_session):
    from osm2shp_ray.stages.sketch import skyline
    rng = np.random.default_rng(17)
    n = 3000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "a": rng.uniform(0, 100, n),
                       "b": rng.uniform(0, 100, n)})
    # plant exact duplicates on the frontier: both must be kept
    df.loc[1, ["a", "b"]] = df.loc[0, ["a", "b"]] = (0.001, 0.001)
    got = set(skyline(rd.from_pandas(df).repartition(8), ["a", "b"])
              .to_pandas()["id"])
    X = df[["a", "b"]].to_numpy()
    dom = ((X[None, :, :] <= X[:, None, :]).all(-1)
           & (X[None, :, :] < X[:, None, :]).any(-1)).any(1)
    want = set(df["id"][~dom])
    assert got == want and {0, 1} <= got


def test_skyline_cap_raises(ray_session):
    # perfectly anti-correlated points: EVERY row is on the frontier
    from osm2shp_ray.stages.sketch import skyline
    n = 500
    df = pd.DataFrame({"id": np.arange(n), "a": np.arange(n, dtype=float),
                       "b": np.arange(n, 0, -1, dtype=float)})
    assert len(skyline(rd.from_pandas(df), ["a", "b"]).to_pandas()) == n
    with pytest.raises(ValueError, match="global_cap"):
        skyline(rd.from_pandas(df), ["a", "b"], global_cap=100)


# -------------------------------------------------------- grouped corr

def test_grouped_corr_matches_numpy(ray_session):
    from osm2shp_ray.stages.sketch import grouped_corr
    rng = np.random.default_rng(23)
    n = 4000
    k = rng.integers(0, 20, n)
    x = rng.integers(-500, 500, n)
    y = (x // 7) + rng.integers(-50, 50, n)  # correlated
    df = pd.DataFrame({"k": k, "x": x, "y": y})
    # a constant-y key: zero variance -> corr defined as 0.0
    df.loc[df["k"] == 5, "y"] = 3
    got = (grouped_corr(rd.from_pandas(df).repartition(8), "k", "x", "y")
           .to_pandas().set_index("k").sort_index())
    for key, g in df.groupby("k"):
        want = 0.0 if g["y"].nunique() == 1 or g["x"].nunique() == 1 \
            else np.corrcoef(g["x"], g["y"])[0, 1]
        assert abs(got.loc[key, "corr"] - want) < 1e-9, key
        assert got.loc[key, "n"] == len(g)


def test_pps_sample_deterministic_and_weighted(ray_session):
    from osm2shp_ray.stages.sketch import pps_sample
    from osm2shp_ray.functions.hashing import md5_hash60
    n = 2000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "w": np.where(np.arange(n) % 2 == 0, 100, 4000)})
    got = pps_sample(rd.from_pandas(df), "doc_id", "w",
                     1.0 / 4000.0).to_pandas()
    # heavy rows (w=4000 -> p=1.0) are ALL kept
    assert (got["w"] == 4000).sum() == (df["w"] == 4000).sum()
    # light rows kept iff the hash decision says so (reproducible)
    h = md5_hash60(df["doc_id"].to_numpy().astype(str)) % 1_000_000
    lim = np.minimum(1_000_000,
                     np.floor(df["w"] * (1.0 / 4000.0) * 1_000_000)
                     .astype(np.int64))
    assert set(got["doc_id"]) == set(df["doc_id"][h < lim])
    with pytest.raises(ValueError):
        pps_sample(rd.from_pandas(df), "doc_id", "w", -0.1)


# --------------------------------------------------------------- set ops

def test_set_ops_match_pandas(ray_session):
    from osm2shp_ray.stages.joins import (distinct_rows, except_distinct,
                                          intersect_distinct)
    rng = np.random.default_rng(31)
    l = pd.DataFrame({"a": rng.integers(0, 30, 400),
                      "b": rng.choice(["x", "y"], 400)})
    r = pd.DataFrame({"a": rng.integers(15, 45, 300),
                      "b": rng.choice(["x", "y", "z"], 300)})
    ld, rd_ = rd.from_pandas(l), rd.from_pandas(r)
    cols = ["a", "b"]

    d = (distinct_rows(ld, cols).to_pandas()
         .sort_values(cols, ignore_index=True))
    want_d = l.drop_duplicates().sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(d, want_d)

    li = set(map(tuple, l.drop_duplicates().itertuples(index=False)))
    ri = set(map(tuple, r.drop_duplicates().itertuples(index=False)))
    inter = set(map(tuple, intersect_distinct(ld, rd_, cols).to_pandas()
                    .itertuples(index=False)))
    assert inter == (li & ri)
    exc = set(map(tuple, except_distinct(ld, rd_, cols).to_pandas()
                  .itertuples(index=False)))
    assert exc == (li - ri)


def test_exact_kth_bin_edge_values(ray_session):
    # values exactly on / within one ulp of bin boundaries: the filter
    # must use the same floor(v/w) the histogram used
    from osm2shp_ray.stages.sketch import exact_kth
    w = 0.1  # not a binary fraction: v/w rounding is in play
    v = np.concatenate([np.arange(0, 50) * w,
                        np.nextafter(np.arange(1, 40) * w, 0.0),
                        np.nextafter(np.arange(1, 40) * w, 1e9)])
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(4)
    sv = np.sort(v)
    for k in (1, 17, 64, len(v) // 2, len(v)):
        assert exact_kth(ds, "x", k, coarse_width=w,
                         collect_cap=8) == sv[k - 1], k


def test_keyed_range_join_matches_brute_force(ray_session):
    from osm2shp_ray.stages.temporal import keyed_range_join
    rng = np.random.default_rng(27)
    npt, niv = 400, 200
    pts = pd.DataFrame({"k": rng.integers(0, 12, npt).astype(np.int64),
                        "v": rng.uniform(0, 500, npt),
                        "pid": np.arange(npt, dtype=np.int64)})
    ivs = pd.DataFrame({"k": rng.integers(0, 12, niv).astype(np.int64),
                        "lo": rng.uniform(0, 480, niv)})
    ivs["hi"] = ivs["lo"] + rng.uniform(0, 40, niv)
    ivs["iid"] = np.arange(niv, dtype=np.int64)
    got = keyed_range_join(
        rd.from_pandas(pts), rd.from_pandas(ivs), "k", "v", "lo", "hi",
        ["pid"], ["iid"], bin_width=30.0).to_pandas()
    pairs = set(zip(got["pid"], got["iid"]))
    assert len(pairs) == len(got)
    want = set()
    for p in pts.itertuples():
        for i in ivs.itertuples():
            if p.k == i.k and i.lo <= p.v <= i.hi:
                want.add((p.pid, i.iid))
    assert pairs == want
    with pytest.raises(ValueError):
        keyed_range_join(rd.from_pandas(pts), rd.from_pandas(ivs),
                         "k", "v", "lo", "hi", ["pid"], ["iid"],
                         bin_width=0.0)


def test_grouping_sets_validation_and_cube(ray_session):
    from osm2shp_ray.stages.sketch import cube, grouping_sets
    df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["p", "q", "p"],
                       "v": [1, 2, 4]})
    got = (cube(rd.from_pandas(df), ["a", "b"], sum_col="v")
           .to_pandas().sort_values(["a", "b"], ignore_index=True))
    assert len(got) == 3 + 2 + 2 + 1  # fine + (a) + (b) + grand
    bonly = got[(got["a"] == "*") & (got["b"] != "*")]
    assert dict(zip(bonly["b"], bonly["total"])) == {"p": 5, "q": 2}
    assert got.loc[(got["a"] == "*") & (got["b"] == "*"), "total"].iloc[0] == 7
    with pytest.raises(ValueError, match="unknown"):
        grouping_sets(rd.from_pandas(df), ["a", "b"], [["zzz"]])
    with pytest.raises(ValueError, match="duplicate"):
        grouping_sets(rd.from_pandas(df), ["a", "b"], [["a"], ["a"]])


def test_grouped_entropy_matches_reference(ray_session):
    from osm2shp_ray.stages.sketch import grouped_entropy
    rng = np.random.default_rng(37)
    n = 3000
    df = pd.DataFrame({"k": rng.integers(0, 25, n),
                       "v": rng.choice(list("abcde"), n)})
    df.loc[df["k"] == 7, "v"] = "a"  # zero-entropy key
    got = (grouped_entropy(rd.from_pandas(df).repartition(6), "k", "v")
           .to_pandas().set_index("k").sort_index())
    for key, g in df.groupby("k"):
        c = g["v"].value_counts().to_numpy().astype(np.float64)
        p = c / c.sum()
        want = int(np.floor(1_000_000 * (-(p) * np.log(p))).astype(np.int64).sum())
        assert got.loc[key, "entropy_q"] == want, key
        assert got.loc[key, "n"] == len(g)
    assert got.loc[7, "entropy_q"] == 0


# ---------------------------------------------------------------- funnel

def test_funnel_semantics(ray_session):
    from osm2shp_ray.stages.temporal import funnel
    base = np.datetime64("2024-01-01", "us")
    rows = [
        # u1 completes in order
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
        # u2: purchase BEFORE click -> reaches click only
        (2, "view", 0), (2, "purchase", 5), (2, "click", 10),
        # u3: click with no prior view -> reaches nothing
        (3, "click", 0), (3, "purchase", 5),
        # u4: tie at the same timestamp passes (>=)
        (4, "view", 7), (4, "click", 7), (4, "purchase", 7),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "s"])
    df["ts"] = base + df.pop("s").to_numpy().astype("timedelta64[s]")
    got = {r["stage"]: r["n_keys"] for r in
           funnel(rd.from_pandas(df).repartition(3),
                  ["view", "click", "purchase"]).take_all()}
    assert got == {"view": 3, "click": 3, "purchase": 2}
    with pytest.raises(ValueError):
        funnel(rd.from_pandas(df), [])


# ------------------------------------------- retention / time-weighted

def test_retention_cohorts_semantics(ray_session):
    from osm2shp_ray.stages.temporal import retention_cohorts
    base = np.datetime64("2024-01-01", "us")
    rows = [(1, 0), (1, 0), (1, 2),          # u1: cohort 0, days 0+2
            (2, 1), (2, 1), (2, 3), (2, 4),  # u2: cohort 1, offsets 0,2,3
            (3, 2)]                          # u3: cohort 2, offset 0
    df = pd.DataFrame(rows, columns=["user_id", "d"])
    df["ts"] = base + df.pop("d").to_numpy().astype("timedelta64[D]").astype("timedelta64[us]")
    day0 = int(base.astype("datetime64[D]").astype(np.int64)) + 19723 - 19723
    got = {(r["cohort_day"], r["day_offset"]): r["n_keys"]
           for r in retention_cohorts(rd.from_pandas(df).repartition(3))
           .take_all()}
    c = int(np.datetime64("2024-01-01").astype("datetime64[D]").astype(np.int64))
    assert got == {(c, 0): 1, (c, 2): 1,
                   (c + 1, 0): 1, (c + 1, 2): 1, (c + 1, 3): 1,
                   (c + 2, 0): 1}


def test_time_weighted_matches_reference(ray_session):
    from osm2shp_ray.stages.temporal import time_weighted
    rng = np.random.default_rng(41)
    n = 2000
    base = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 15, n),
        "ts": base + rng.integers(0, 10**9, n).astype("timedelta64[us]"),
        "value": rng.normal(0, 30, n)})
    df.loc[5, ["user_id", "ts"]] = df.loc[6, ["user_id", "ts"]]  # tie
    got = (time_weighted(rd.from_pandas(df).repartition(5))
           .to_pandas().set_index("user_id").sort_index())
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy().astype(np.int64)
        vq = np.floor(g["value"].to_numpy() * 10000).astype(np.int64)
        dt = np.concatenate((np.diff(ts), [0]))
        assert got.loc[uid, "wsum_q"] == int((vq * dt).sum())
        assert got.loc[uid, "dur_us"] == int(dt.sum())
        assert got.loc[uid, "n_intervals"] == int((dt > 0).sum())


# ------------------------------------------- review-fix regressions

def test_keyed_range_join_mixed_int_float_sides(ray_session):
    """int64 points x float interval bounds with fractional bin_width:
    both sides must share ONE bin space (review finding)."""
    from osm2shp_ray.stages.temporal import keyed_range_join
    pts = pd.DataFrame({"k": np.array([1, 1, 2], np.int64),
                        "v": np.array([9, 3, 9], np.int64),  # INT values
                        "pid": np.array([0, 1, 2], np.int64)})
    ivs = pd.DataFrame({"k": np.array([1, 2], np.int64),
                        "lo": [8.9, 9.5], "hi": [9.1, 9.9],
                        "iid": np.array([10, 11], np.int64)})
    got = keyed_range_join(
        rd.from_pandas(pts), rd.from_pandas(ivs), "k", "v", "lo", "hi",
        ["pid"], ["iid"], bin_width=2.5).to_pandas()
    assert set(zip(got["pid"], got["iid"])) == {(0, 10)}


def test_pagerank_multigraph_no_dedup_keeps_duplicates(ray_session):
    """dedup=False must preserve multigraph semantics on BOTH paths:
    duplicate edges contribute rank mass per copy (review finding)."""
    from osm2shp_ray.stages.graph import pagerank, PR_SCALE
    edges = [(0, 1), (1, 0), (0, 1), (1, 0), (1, 2), (2, 1)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    a = {r["node"]: r["r"] for r in
         pagerank(rd.from_pandas(df), iters=2).take_all()}
    b = {r["node"]: r["r"] for r in
         pagerank(rd.from_pandas(df), iters=2, node_cap=0).take_all()}
    assert a == b
    # sequential reference WITH duplicates
    nodes = [0, 1, 2]
    deg = {0: 2, 1: 3, 2: 1}
    r0 = PR_SCALE // 3
    base = (15 * r0) // 100
    r = {u: r0 for u in nodes}
    for _ in range(2):
        s = {u: 0 for u in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {u: base + (85 * s[u]) // 100 for u in nodes}
    assert a == r


def test_distinct_rows_nullable_int64_above_2_53(ray_session):
    """Arrow-native dedup: nullable int64 values above 2^53 survive
    exactly and nulls form one distinct row (review finding)."""
    import pyarrow as pa
    from osm2shp_ray.stages.joins import distinct_rows
    big = (1 << 53) + 1
    t = pa.table({"a": pa.array([big, big, big + 1, None], pa.int64()),
                  "b": ["x", "x", "x", "y"]})
    out = pa.concat_tables(
        b_ for b_ in distinct_rows(rd.from_arrow(t))
        .iter_batches(batch_format="pyarrow") if b_.num_rows)
    assert out["a"].type == pa.int64()  # never float-widened
    vals = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    assert vals == {(big, "x"), (big + 1, "x"), (None, "y")}


def test_rollup_empty_input_grand_total(ray_session):
    from osm2shp_ray.stages.sketch import rollup
    import pyarrow as pa
    empty = rd.from_arrow(pa.table({
        "a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
        "v": pa.array([], pa.int64())}))
    got = rollup(empty, ["a", "b"], sum_col="v").to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["a"] == "*" and got.iloc[0]["n"] == 0
    assert pd.isna(got.iloc[0]["total"])


def test_funnel_emits_zero_rows_for_absent_stages(ray_session):
    from osm2shp_ray.stages.temporal import funnel
    df = pd.DataFrame({"user_id": [1], "event_type": ["signup"],
                       "ts": [np.datetime64("2024-01-01", "us")]})
    got = {r["stage"]: r["n_keys"]
           for r in funnel(rd.from_pandas(df),
                           ["view", "click", "purchase"]).take_all()}
    assert got == {"view": 0, "click": 0, "purchase": 0}


def test_rolling_sum_matches_pandas(ray_session):
    from osm2shp_ray.stages.temporal import rolling_sum
    rng = np.random.default_rng(43)
    n = 3000
    base = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 12, n),
        "ts": base + rng.integers(0, 10**8, n).astype("timedelta64[us]"),
        "value": rng.normal(0, 40, n)})
    got = (rolling_sum(rd.from_pandas(df).repartition(6), 5)
           .to_pandas().set_index("event_id").sort_index())
    s = df.sort_values(["user_id", "ts", "event_id"]).copy()
    s["vq"] = np.floor(s["value"] * 10000).astype(np.int64)
    want_roll = (s.groupby("user_id")["vq"]
                 .rolling(5, min_periods=1).sum()
                 .reset_index(level=0, drop=True).astype(np.int64))
    want_n = (s.groupby("user_id")["vq"]
              .rolling(5, min_periods=1).count()
              .reset_index(level=0, drop=True).astype(np.int64))
    s["want_roll"], s["want_n"] = want_roll, want_n
    s = s.set_index("event_id").sort_index()
    assert (got["roll_q"] == s["want_roll"]).all()
    assert (got["n_in_frame"] == s["want_n"]).all()
    with pytest.raises(ValueError):
        rolling_sum(rd.from_pandas(df), 0)


def test_json_extract_field_handles_garbage(ray_session):
    from osm2shp_ray.stages.text import json_extract_field
    df = pd.DataFrame({"id": [1, 2, 3, 4, 5],
                       "props": ['{"k": 42}', '{"k": -7}', "not json",
                                 '{"other": 1}', None]})
    got = (json_extract_field(rd.from_pandas(df), "props", "k", "k")
           .to_pandas().set_index("id").sort_index())
    assert got.loc[1, "k"] == 42 and got.loc[2, "k"] == -7
    assert pd.isna(got.loc[3, "k"]) and pd.isna(got.loc[4, "k"])
    assert pd.isna(got.loc[5, "k"])


def test_session_ids_boundary_exact(ray_session):
    # gap strictly greater than gap_s breaks; equality does NOT
    from osm2shp_ray.stages.temporal import session_ids
    ts = pd.to_datetime([0, 1800_000_000, 3600_000_001, 100], unit="us")
    df = pd.DataFrame({"user_id": [1, 1, 1, 2],
                       "ts": ts, "event_id": [10, 11, 12, 13]})
    out = session_ids(rd.from_pandas(df), gap_s=1800.0).to_pandas()
    got = dict(zip(out["event_id"], out["session_seq"]))
    # 0 -> 1800s gap (== gap, same session) -> 1800.000001s gap (new)
    assert got == {10: 1, 11: 1, 12: 2, 13: 1}


def test_transition_counts_singleton_keys(ray_session):
    # every key a singleton in some buckets: the empty-pair schema pin
    # must keep the downstream groupby green
    from osm2shp_ray.stages.temporal import transition_counts
    ts = pd.to_datetime(range(6), unit="s")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 3, 4],
        "ts": ts,
        "event_id": list(range(6)),
        "event_type": ["a", "b", "a", "x", "y", "z"]})
    out = transition_counts(rd.from_pandas(df)).to_pandas()
    got = {(r.from_state, r.to_state): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "a"): 1}


def test_pivot_counts_matches_pandas(ray_session):
    from osm2shp_ray.stages.sketch import pivot_counts
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"k": rng.integers(0, 20, 500),
                       "c": rng.choice(["u", "v", "w"], 500)})
    out = (pivot_counts(rd.from_pandas(df), "k", "c", ["u", "v", "w"])
           .to_pandas().sort_values("k", ignore_index=True))
    ref = (pd.crosstab(df["k"], df["c"])
           .reindex(columns=["u", "v", "w"], fill_value=0)
           .rename(columns=lambda c: "n_" + c)
           .reset_index().rename_axis(None, axis=1)
           .sort_values("k", ignore_index=True))
    pd.testing.assert_frame_equal(
        out[["k", "n_u", "n_v", "n_w"]].astype({"n_u": np.int64,
                                                "n_v": np.int64,
                                                "n_w": np.int64}),
        ref.astype({"n_u": np.int64, "n_v": np.int64, "n_w": np.int64}),
        check_dtype=False)


# --- 7th session: profiling, snapshot diff -------------------------


def test_profile_columns_nulls_and_distinct(ray_session):
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.sketch import profile_columns

    df = pd.DataFrame({
        "a": [1, 1, 2, None, None],
        "b": ["x", "y", "x", "x", None],
    })
    out = profile_columns(rd.from_pandas(df), ["a", "b"])
    got = {r["col"]: (r["n"], r["n_null"], r["n_distinct"])
           for _, r in out.iterrows()}
    assert got["a"] == (5, 2, 2)
    assert got["b"] == (5, 1, 2)


def test_snapshot_diff_statuses(ray_session):
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.joins import snapshot_diff

    old = pd.DataFrame({"k": [1, 2, 3, 4],
                        "v": [10, 20, 30, None]})
    new = pd.DataFrame({"k": [2, 3, 4, 5],
                        "v": [20, 31, None, 50]})
    out = (snapshot_diff(rd.from_pandas(old), rd.from_pandas(new),
                         on="k", compare=["v"])
           .to_pandas().set_index("k"))
    assert out.loc[1, "status"] == "removed"
    assert out.loc[2, "status"] == "same"
    assert out.loc[3, "status"] == "changed"
    assert out.loc[4, "status"] == "same"      # null == null
    assert out.loc[5, "status"] == "added"
    # one-sided null counts as changed
    old2 = pd.DataFrame({"k": [7], "v": [1.0]})
    new2 = pd.DataFrame({"k": [7], "v": [None]})
    out2 = (snapshot_diff(rd.from_pandas(old2), rd.from_pandas(new2),
                          on="k", compare=["v"]).to_pandas())
    assert out2["status"].tolist() == ["changed"]


def test_edit_distance_pairs_brute_force(ray_session):
    import itertools
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.text import edit_distance_pairs

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            new = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                new[j] = min(dp[j] + 1, new[j - 1] + 1,
                             dp[j - 1] + (a[i - 1] != b[j - 1]))
            dp = new
        return dp[len(b)]

    words = ["cold widget", "bold widget", "old widget", "large bolt",
             "large bolts", "blue rod", "blu rod", "blue rode", "x",
             "xy", "xyz", "", "a b", "ab", "small widget",
             "smal widget", "smallwidget", "large bolt"]
    uniq = sorted(set(words))
    expect = sorted((a, b, lev(a, b))
                    for a, b in itertools.combinations(uniq, 2)
                    if lev(a, b) <= 2)
    got = (edit_distance_pairs(
               rd.from_pandas(pd.DataFrame({"name": words})), "name", k=2)
           .to_pandas())
    assert sorted(map(tuple, got[["name_a", "name_b", "dist"]].values)) \
        == expect


def test_triangle_count_brute_force(ray_session):
    import itertools
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.graph import triangle_count

    rng = np.random.default_rng(7)
    eu = rng.integers(0, 40, 180)
    ev = rng.integers(0, 40, 180)
    out = triangle_count(
        rd.from_pandas(pd.DataFrame({"u": eu, "v": ev})), "u", "v")
    E = {(min(a, b), max(a, b)) for a, b in zip(eu, ev) if a != b}
    adj: dict = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(1 for a, b, c in itertools.combinations(sorted(adj), 3)
              if b in adj[a] and c in adj[a] and c in adj[b])
    assert int(out["n_edges"][0]) == len(E)
    assert int(out["n_triangles"][0]) == tri
    # the bucketed fallback (degree hash_joins + closing semijoin)
    # must count identically to the broadcast duals (bcast_cap=0
    # forces it)
    out2 = triangle_count(
        rd.from_pandas(pd.DataFrame({"u": eu, "v": ev})), "u", "v",
        bcast_cap=0)
    assert int(out2["n_edges"][0]) == len(E)
    assert int(out2["n_triangles"][0]) == tri


def test_rolling_anomaly_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.temporal import rolling_anomaly

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 7, n),
        "ts": pd.to_datetime(rng.integers(0, 10**9, n), unit="s"),
        "value": np.where(rng.random(n) < 0.05,
                          rng.uniform(400, 500, n),
                          rng.uniform(0, 10, n)),
    })
    W, Z, MINN, Q = 8, 2, 6, 100
    got = (rolling_anomaly(rd.from_pandas(df), window=W, z_num=Z,
                           min_n=MINN, quant=Q)
           .to_pandas().set_index("event_id").sort_index())

    df = df.sort_values(["user_id", "ts", "event_id"])
    vq = np.floor(df["value"].to_numpy() * Q).astype(np.int64)
    df["vq"] = vq
    exp_flag, exp_n = {}, {}
    for _, g in df.groupby("user_id"):
        v = g["vq"].to_numpy()
        for i in range(len(v)):
            f0 = max(0, i - (W - 1))
            fr = v[f0:i + 1].astype(object)  # python ints: no overflow
            nn, s, ssq = len(fr), sum(fr), sum(x * x for x in fr)
            lhs = (nn * int(v[i]) - s) ** 2
            rhs = Z * Z * (nn * ssq - s * s)
            eid = int(g["event_id"].iloc[i])
            exp_flag[eid] = int(nn >= MINN and lhs > rhs)
            exp_n[eid] = nn
    assert got["flag"].to_dict() == exp_flag
    assert got["n_in_frame"].to_dict() == exp_n
    assert sum(exp_flag.values()) > 0  # the planted outliers fire


def test_kl_drift_identical_sources_zero(ray_session):
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.text import kl_drift

    # both sources have the SAME token distribution -> p == q for
    # every term -> ln(1) == 0 -> kl_q exactly 0
    docs = pd.DataFrame({
        "source": ["a"] * 4 + ["b"] * 4,
        "text": ["x y z", "x x y", "z z y", "x y y"] * 2,
    })
    out = kl_drift(rd.from_pandas(docs), "source")
    assert sorted(out["source"]) == ["a", "b"]
    assert (out["kl_q"] == 0).all()
    assert (out["n"] == 12).all()

    # skewed source diverges positively
    docs2 = pd.DataFrame({
        "source": ["a"] * 8 + ["b"] * 2,
        "text": ["x y"] * 8 + ["q q q q", "q q q q"],
    })
    out2 = kl_drift(rd.from_pandas(docs2), "source").set_index("source")
    assert out2.loc["b", "kl_q"] > 0


def test_interval_coverage_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.temporal import interval_coverage

    rng = np.random.default_rng(11)
    n = 300
    lo = rng.integers(0, 1000, n).astype(np.int64)
    df = pd.DataFrame({"k": rng.integers(0, 9, n),
                       "id": np.arange(n, dtype=np.int64),
                       "lo": lo,
                       "hi": lo + rng.integers(1, 60, n)})
    got = (interval_coverage(rd.from_pandas(df), "k", "lo", "hi", "id")
           .to_pandas().set_index("k").sort_index())

    for k, g in df.groupby("k"):
        ivs = sorted(zip(g["lo"], g["hi"]))
        islands, cov, cur_lo, cur_hi = 0, 0, None, None
        for a, b in ivs:
            if cur_hi is None or a > cur_hi:
                if cur_hi is not None:
                    cov += cur_hi - cur_lo
                islands += 1
                cur_lo, cur_hi = a, b
            else:
                cur_hi = max(cur_hi, b)
        cov += cur_hi - cur_lo
        assert got.loc[k, "n_islands"] == islands
        assert got.loc[k, "covered"] == cov


def test_event_sequences_and_melt(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.temporal import event_sequences
    from osm2shp_ray.stages.sketch import melt

    df = pd.DataFrame({
        "event_id": [3, 1, 2, 4],
        "user_id": [1, 1, 1, 2],
        "ts": pd.to_datetime([30, 10, 10, 5], unit="s"),
        "event_type": ["c", "a", "b", "x"],
    })
    out = (event_sequences(rd.from_pandas(df))
           .to_pandas().set_index("user_id"))
    # ties on ts break by event_id: a (id 1) before b (id 2)
    assert out.loc[1, "seq"] == "a>b>c" and out.loc[1, "n"] == 3
    assert out.loc[2, "seq"] == "x"

    wide = pd.DataFrame({"id": [1, 2], "x": [1.5, 2.5], "y": [10.0, 20.0]})
    long = melt(rd.from_pandas(wide), ["id"], ["x", "y"]).to_pandas()
    assert len(long) == 4
    assert set(long["variable"]) == {"x", "y"}
    assert long.set_index(["id", "variable"]).loc[(2, "y"), "value"] == 20.0


def test_share_of_total_sums_to_scale(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.sketch import share_of_total

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"id": np.arange(100, dtype=np.int64),
                       "k": rng.integers(0, 6, 100),
                       "v": rng.uniform(0.01, 50, 100)})
    out = (share_of_total(rd.from_pandas(df), "k", "v", "id")
           .to_pandas())
    # floor division: per-key share sums land in (scale - n, scale]
    g = out.groupby("k").agg(s=("share_ppm", "sum"), n=("id", "count"))
    assert ((g["s"] <= 1_000_000) & (g["s"] > 1_000_000 - g["n"])).all()
    # exact expected value for one row
    r = out[out["id"] == 0].iloc[0]
    tot = out[out["k"] == r["k"]]["vq"].sum()
    assert r["share_ppm"] == (1_000_000 * r["vq"]) // tot


def test_chi_square_independent_and_dependent(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.sketch import chi_square

    # perfectly independent 2x2 (uniform) -> chi2 == 0
    df = pd.DataFrame({"a": ["x", "x", "y", "y"] * 50,
                       "b": [0, 1, 0, 1] * 50})
    out = chi_square(rd.from_pandas(df), "a", "b")
    assert int(out["chi2_q"][0]) == 0 and int(out["dof"][0]) == 1
    assert int(out["n"][0]) == 200

    # perfectly dependent -> chi2_q ~= scale * n
    df2 = pd.DataFrame({"a": ["x"] * 100 + ["y"] * 100,
                        "b": [0] * 100 + [1] * 100})
    out2 = chi_square(rd.from_pandas(df2), "a", "b")
    assert int(out2["chi2_q"][0]) == 1_000_000 * 200


def test_minmax_scale_and_grouped_mad(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.sketch import grouped_mad, minmax_scale

    df = pd.DataFrame({"id": np.arange(7, dtype=np.int64),
                       "k": [1, 1, 1, 1, 2, 2, 3],
                       "v": [0.0, 5.0, 10.0, 2.5, 4.0, 4.0, 9.0]})
    out = (minmax_scale(rd.from_pandas(df), "k", "v", "id")
           .to_pandas().set_index("id"))
    assert out.loc[0, "scaled_q"] == 0
    assert out.loc[2, "scaled_q"] == 1_000_000
    assert out.loc[1, "scaled_q"] == 500_000
    assert out.loc[3, "scaled_q"] == 250_000
    # degenerate keys (single value or constant) emit 0
    assert out.loc[4, "scaled_q"] == 0 and out.loc[6, "scaled_q"] == 0

    mad = (grouped_mad(rd.from_pandas(df), "k", "v")
           .to_pandas().set_index("k"))
    # k=1: vq = [0, 500, 1000, 250]; median = 375; |dev| = [375, 125,
    # 625, 125] -> mad = 250
    assert mad.loc[1, "med"] == 375.0 and mad.loc[1, "mad"] == 250.0
    assert mad.loc[2, "mad"] == 0.0 and mad.loc[3, "n"] == 1


def test_percent_rank_and_keep_best(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.sketch import percent_rank
    from osm2shp_ray.stages.dedup import dedup_keep_best

    df = pd.DataFrame({"id": np.arange(6, dtype=np.int64),
                       "k": ["a", "a", "a", "a", "b", "b"],
                       "v": [10, 20, 20, 30, 7, 7]})
    out = (percent_rank(rd.from_pandas(df), "k", "v", "id")
           .to_pandas().set_index("id"))
    # rank() ties: ranks are 1,2,2,4 over n=4 -> pr = 0, 1/3, 1/3, 1
    third = int(np.floor(1e6 * (1.0 / 3.0)))
    assert out.loc[0, "pr_q"] == 0
    assert out.loc[1, "pr_q"] == third and out.loc[2, "pr_q"] == third
    assert out.loc[3, "pr_q"] == 1_000_000
    # both "b" rows tie at rank 1 -> pr 0
    assert out.loc[4, "pr_q"] == 0 and out.loc[5, "pr_q"] == 0

    best = (dedup_keep_best(rd.from_pandas(df), ["k"], "v", "id")
            .to_pandas().set_index("k"))
    assert best.loc["a", "id"] == 3 and best.loc["a", "v"] == 30
    assert best.loc["b", "id"] == 4  # score tie -> smallest id


def test_ewma_matches_scalar_recurrence(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from osm2shp_ray.stages.temporal import ewma

    rng = np.random.default_rng(9)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 5, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "value": rng.uniform(0, 100, n)})
    got = (ewma(rd.from_pandas(df), num=3, den=4)
           .to_pandas().set_index("event_id"))
    df = df.sort_values(["user_id", "ts", "event_id"])
    for _, g in df.groupby("user_id"):
        vq = np.floor(g["value"].to_numpy() * 100).astype(np.int64)
        s = int(vq[0])
        for i, eid in enumerate(g["event_id"]):
            if i > 0:
                s = (3 * s + 1 * int(vq[i])) // 4
            assert got.loc[int(eid), "ewma_q"] == s


def test_ohlc_and_union_by_name(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from osm2shp_ray.stages.temporal import ohlc
    from osm2shp_ray.stages.joins import union_by_name

    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 7],
        "ts": pd.to_datetime([10, 20, 30, 3700], unit="s"),
        "value": [5.0, 9.0, 1.0, 4.0]})
    out = (ohlc(rd.from_pandas(df)).to_pandas()
           .set_index("bucket_id").sort_index())
    assert out.loc[0, "open"] == 5.0 and out.loc[0, "close"] == 1.0
    assert out.loc[0, "high"] == 9.0 and out.loc[0, "low"] == 1.0
    assert out.loc[0, "n"] == 3 and out.loc[1, "open"] == 4.0

    a = rd.from_pandas(pd.DataFrame({"x": [1, 2], "y": ["p", "q"]}))
    c = rd.from_pandas(pd.DataFrame({"x": [3], "z": [9.5]}))
    u = union_by_name([a, c]).to_pandas().sort_values("x",
                                                      ignore_index=True)
    assert list(u.columns) == ["x", "y", "z"]
    assert u["y"].isna().tolist() == [False, False, True]
    assert u["z"].isna().tolist() == [True, True, False]


def test_ring_area_partial_batch_known_shapes(ray_session):
    import numpy as np
    import pyarrow as pa
    from osm2shp_ray.stages.geometry import ring_area_partial_batch

    def mk(rings, layers):
        offs = np.cumsum([0] + [len(r) for r in rings]).astype(np.int32)
        fx = np.array([p[0] for r in rings for p in r], dtype=float)
        fy = np.array([p[1] for r in rings for p in r], dtype=float)
        return pa.table({
            "layer_idx": pa.array(layers, pa.int64()),
            "xs": pa.ListArray.from_arrays(pa.array(offs), pa.array(fx)),
            "ys": pa.ListArray.from_arrays(pa.array(offs), pa.array(fy))})

    # open unit square (implicit wrap), CW triangle (abs), 2-vertex
    # way (excluded), explicitly closed unit square (wrap term = 0)
    sq = [(0, 0), (1, 0), (1, 1), (0, 1)]
    tri = [(0, 0), (0, 2), (2, 0)]  # clockwise, area 2
    seg = [(0, 0), (5, 5)]
    sq_closed = sq + [sq[0]]
    t = mk([sq, tri, seg, sq_closed], [0, 0, 1, 2])
    out = ring_area_partial_batch(t).to_pandas().set_index("layer_idx")
    assert out.loc[0, "part_polys"] == 2
    assert out.loc[0, "part_area_q"] == 1_000_000 + 2_000_000
    assert 1 not in out.index  # <3 vertices never counts
    assert out.loc[2, "part_polys"] == 1
    assert out.loc[2, "part_area_q"] == 1_000_000

    # empty batch and all-short batch both return the empty schema
    assert len(ring_area_partial_batch(mk([], []))) == 0
    assert len(ring_area_partial_batch(mk([seg], [3]))) == 0


def test_bbox_join_matches_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from osm2shp_ray.stages.spatial import bbox_join

    rng = np.random.default_rng(20260818)

    def rects(n, key):
        cx = rng.uniform(-50, 50, n)
        cy = rng.uniform(-50, 50, n)
        hx = rng.uniform(0.1, 12.0, n)  # some rects span many cells
        hy = rng.uniform(0.1, 12.0, n)
        return pd.DataFrame({key: np.arange(n, dtype=np.int64),
                             "x_lo": cx - hx, "x_hi": cx + hx,
                             "y_lo": cy - hy, "y_hi": cy + hy})

    L, R = rects(120, "lid"), rects(90, "rid")
    out = (bbox_join(rd.from_pandas(L), rd.from_pandas(R),
                     ["lid"], ["rid"], cell=5.0, max_cells=10_000)
           .to_pandas().sort_values(["lid", "rid"], ignore_index=True))

    la = L.to_numpy(); ra = R.to_numpy()
    hits = []
    for _, l in L.iterrows():
        m = ((l.x_lo <= R.x_hi) & (R.x_lo <= l.x_hi)
             & (l.y_lo <= R.y_hi) & (R.y_lo <= l.y_hi))
        for _, r in R[m].iterrows():
            w = min(l.x_hi, r.x_hi) - max(l.x_lo, r.x_lo)
            h = min(l.y_hi, r.y_hi) - max(l.y_lo, r.y_lo)
            hits.append((int(l.lid), int(r.rid),
                         int(np.floor(w * h * 1e6))))
    exp = (pd.DataFrame(hits, columns=["lid", "rid", "overlap_q"])
           .sort_values(["lid", "rid"], ignore_index=True))
    assert len(out) == len(exp) and len(exp) > 100
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)

    # exactly-once even when a pair's overlap spans many owner
    # candidates: no duplicate (lid, rid)
    assert not out.duplicated(["lid", "rid"]).any()


def test_geojsonl_roundtrip_all_geometries(ray_session, tmp_path):
    """Point / LineString / Polygon features survive a GeoJSONL
    write->read cycle bit-exactly (ids, layers, and every float64
    coordinate)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osm2shp_ray.functions import wkb as wkbmod
    from osm2shp_ray.sources.geojson import read_geojsonl, write_geojsonl

    rng = np.random.default_rng(9)
    pts = wkbmod.encode_points(rng.uniform(-180, 180, 5),
                               rng.uniform(-90, 90, 5))
    lx = rng.uniform(-180, 180, 7)
    ly = rng.uniform(-90, 90, 7)
    lines = wkbmod.encode_linestrings(np.array([0, 3, 7], np.int64),
                                      lx, ly)
    px = np.array([0.1, 1.3, 1.7, 0.1])
    py = np.array([0.2, 0.4, 1.9, 0.2])
    polys = wkbmod.encode_polygons(np.array([0, 4], np.int64), px, py)
    blobs = pts + lines + polys
    n = len(blobs)
    t = pa.table({"way_id": pa.array(np.arange(n), pa.int64()),
                  "layer": pa.array([f"L{i % 3}" for i in range(n)]),
                  "geometry_wkb": pa.array(blobs, pa.binary())})
    out = str(tmp_path / "gj")
    assert write_geojsonl(rd.from_arrow(t), out) == n
    back = (read_geojsonl(out).to_pandas()
            .sort_values("way_id", ignore_index=True))
    assert list(back["way_id"]) == list(range(n))
    assert list(back["layer"]) == [f"L{i % 3}" for i in range(n)]
    for i in range(n):
        k0, x0, y0 = wkbmod.decode(blobs[i])
        k1, x1, y1 = wkbmod.decode(back["geometry_wkb"][i])
        assert k0 == k1
        assert np.array_equal(x0, x1) and np.array_equal(y0, y1)


def test_thumbnail_png_roundtrip(ray_session):
    """The re-encoded thumbnail PNG decodes back to the exact
    downsampled array (PNG is lossless), and dims/sums match the
    generator-side ground truth."""
    import numpy as np
    import pyarrow.parquet as pq

    from osm2shp_ray.functions import codec
    from osm2shp_ray.sources.fixtures import (cached_images_parquet,
                                              cached_thumb_stats_parquet,
                                              ground_truth_pixels)
    from osm2shp_ray.stages.images import Thumbnail

    n = 60
    t = pq.read_table(cached_images_parquet(2000, use_ray=False)).slice(0, n)
    out = Thumbnail(4)(t.select(["image_id", "bytes", "fmt", "w", "h"]))
    gt = pq.read_table(cached_thumb_stats_parquet(2000)).slice(0, n)
    f = 4
    checked = 0
    for i in range(n):
        if out["fmt"][i].as_py() != "png":
            continue
        checked += 1
        assert out["t_w"][i].as_py() == gt["t_w"][i].as_py()
        assert out["t_h"][i].as_py() == gt["t_h"][i].as_py()
        assert out["tr_sum"][i].as_py() == gt["tr_sum"][i].as_py()
        w0, h0 = t["w"][i].as_py(), t["h"][i].as_py()
        exp = (ground_truth_pixels(i, w0, h0).astype(np.int64)
               .reshape(h0 // f, f, w0 // f, f, 3).sum(axis=(1, 3))
               // (f * f)).astype(np.uint8)
        back = codec.decode_image(out["thumb"][i].as_py(), "png")
        assert np.array_equal(back, exp)
    assert checked == n // 2


def test_bfs_paths_equivalent(ray_session):
    """Broadcast (edge_cap) and distributed BFS compute identical
    (node, min-hop) sets, including unreachable nodes being absent
    and seeds at hop 0."""
    import numpy as np
    import pandas as pd
    import ray
    from osm2shp_ray.stages.graph import bfs_hops

    rng = np.random.default_rng(11)
    src = rng.integers(0, 200, 3000)
    dst = rng.integers(0, 200, 3000)
    # isolated island: nodes 900/901 unreachable from seeds
    edges = pd.DataFrame({
        "src": np.concatenate([src, [900]]),
        "dst": np.concatenate([dst, [901]])}).astype("int64")
    seeds = [0, 7]
    a = (bfs_hops(ray.data.from_pandas(edges), seeds, max_hops=3)
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (bfs_hops(ray.data.from_pandas(edges), seeds, max_hops=3,
                  edge_cap=0)  # force the distributed dual
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert a.equals(b)
    assert set(a.loc[a.hops == 0, "node"]) == set(seeds)
    assert 900 not in set(a.node) and 901 not in set(a.node)
    # brute-force reference on the driver
    adj = {}
    for s, d in zip(edges.src, edges.dst):
        adj.setdefault(int(s), set()).add(int(d))
    ref, frontier = {s: 0 for s in seeds}, set(seeds)
    for h in range(1, 4):
        frontier = {d for s in frontier for d in adj.get(s, ())} - set(ref)
        ref.update({d: h for d in frontier})
    got = dict(zip(a.node.astype(int), a.hops.astype(int)))
    assert got == ref


def test_bigram_lm_duals_equivalent(ray_session):
    """Broadcast and distributed bigram LM paths are byte-identical;
    single-token and empty docs carry no evidence."""
    import pandas as pd
    import ray
    from osm2shp_ray.stages.text import bigram_lm_score

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["the cat sat on the mat",
                 "the cat sat",
                 "cat",          # single token: no bigram evidence
                 "",             # empty: dropped
                 "on the mat the cat"]})
    ds = ray.data.from_pandas(docs)
    a = (bigram_lm_score(ds).to_pandas()
         .sort_values("doc_id", ignore_index=True))
    b = (bigram_lm_score(ds, distributed=True).to_pandas()
         .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)],
        check_dtype=False, check_exact=True)
    assert set(a.doc_id) == {1, 2, 5}
    assert a.loc[a.doc_id == 1, "n_big"].item() == 5
    # deterministic spot value against hand-counted corpus bigrams
    import numpy as np
    one = a.loc[a.doc_id == 2].iloc[0]
    # doc 2 bigrams: 'the cat' (3 of c1('the')=5), 'cat sat' (2 of 2)
    exp = (np.floor(1e6 * np.log(3 / 5)) + np.floor(1e6 * np.log(2 / 2)))
    assert one.lp_sum == int(exp) and one.n_big == 2


def test_path_length_singletons_and_order(ray_session):
    """path_length: one-point keys yield 0; result is insertion-order
    independent (same ints whatever the block layout)."""
    import pandas as pd
    import numpy as np
    import ray
    from osm2shp_ray.stages.temporal import path_length

    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": ["a", "a", "a", "b", "c"],
        "ts": pd.to_datetime([3, 1, 2, 9, 9], unit="s"),
        "x": [0.0, 0.0, 1.0, 5.0, 6.0],
        "y": [0.0, 0.0, 0.0, 5.0, 6.0]})
    out = (path_length(ray.data.from_pandas(df), n_buckets=2)
           .to_pandas().sort_values("user_id", ignore_index=True))
    assert list(out.user_id) == ["a", "b", "c"]
    assert list(out.n_points) == [3, 1, 1]
    assert out.loc[1, "path_m"] == 0 and out.loc[2, "path_m"] == 0
    # a: (0,0)@1s -> (1,0)@2s -> (0,0)@3s — two ~111 km legs
    rad, R = 0.017453292519943295, 6371000.0
    leg = np.floor(2.0 * np.arcsin(np.sqrt(min(1.0,
          np.cos(0.0) * np.cos(0.0) * np.sin(0.5 * rad) ** 2))) * R)
    assert out.loc[0, "path_m"] == 2 * int(leg)
    # shuffled input -> identical totals
    out2 = (path_length(ray.data.from_pandas(df.iloc[::-1].reset_index(drop=True)),
                        n_buckets=2)
            .to_pandas().sort_values("user_id", ignore_index=True))
    assert out.equals(out2)
