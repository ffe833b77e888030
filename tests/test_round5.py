"""Round-5 additions.

Golden-anchor test for the vendored baseline-JPEG decoder
(osm2shp_ray/functions/jpeg.py): tests/golden_jpeg_decode.json is a
COMMITTED freeze of per-image channel sums for the 32 fmt='jpeg' rows
of images_table(64), produced once at DECODE_REV=2.  Unlike the
fixture-side `cached_image_stats_lossy_parquet` (which recomputes its
ground truth with the decoder under test — the decode-round-trip
contract), this file is never regenerated automatically: a decoder
change that shifts ANY output pixel fails here until a human updates
the golden on purpose.  This breaks the circularity the round-4
verdict flagged — PSNR>=40dB bounds error magnitude, the golden pins
exact pixels against silent +-1 drift.
"""
import json
import os

import numpy as np
import pyarrow as pa
import pytest

from osm2shp_ray.functions import codec
from osm2shp_ray.sources import fixtures

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_jpeg_decode.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def test_golden_jpeg_decode_exact(golden):
    tbl = fixtures.images_table(golden["n_source_rows"])
    blobs = dict(zip(tbl["image_id"].to_pylist(), tbl["bytes"].to_pylist()))
    fmts = dict(zip(tbl["image_id"].to_pylist(), tbl["fmt"].to_pylist()))
    assert len(golden["images"]) == 32
    for g in golden["images"]:
        iid = g["image_id"]
        assert fmts[iid] == "jpeg"
        img = codec.decode_image(blobs[iid], "jpeg")
        px = img.astype(np.int64)
        got = {
            "w": int(img.shape[1]),
            "h": int(img.shape[0]),
            "r_sum": int(px[:, :, 0].sum()),
            "g_sum": int(px[:, :, 1].sum()),
            "b_sum": int(px[:, :, 2].sum()),
            "px_min": int(px.min()),
            "px_max": int(px.max()),
        }
        want = {k: g[k] for k in got}
        assert got == want, (
            f"{iid}: decoder output drifted from the committed golden "
            f"(frozen at DECODE_REV={golden['decode_rev_at_freeze']}). "
            "If the change is intentional, regenerate "
            "tests/golden_jpeg_decode.json deliberately and say so in "
            "the commit message."
        )


def test_golden_matches_fixture_contract(golden):
    """The decode-round-trip fixture table and the frozen golden must
    agree on their overlap — catches a fixture regeneration that
    silently diverged from the anchored decode."""
    import pyarrow.parquet as pq

    path = fixtures.cached_image_stats_lossy_parquet(golden["n_source_rows"])
    t = pq.read_table(path)
    rows = {r["image_id"]: r for r in t.to_pylist()}
    for g in golden["images"]:
        r = rows[g["image_id"]]
        assert r["r_sum"] == g["r_sum"]
        assert r["g_sum"] == g["g_sum"]
        assert r["b_sum"] == g["b_sum"]
        assert r["px_min"] == g["px_min"]
        assert r["px_max"] == g["px_max"]
        assert r["n_px"] == g["w"] * g["h"]


def test_hash_join_sort_blocks_equivalence(ray_session):
    """hash_join output is byte-identical with an explicit sort_blocks
    (the vocab-sized-union escape hatch for Ray's empty-range
    zero-column blocks) and with the default coalesce."""
    import ray.data as rd

    from osm2shp_ray.stages.joins import hash_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([i % 7 for i in range(50)], pa.int64()),
        "a": pa.array(list(range(50)), pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array(list(range(5)), pa.int64()),
        "b": pa.array([10 * i for i in range(5)], pa.int64())}))
    for how in ("inner", "left", "left_semi", "left_anti"):
        base = (hash_join(left, right, on="k", how=how)
                .to_pandas().sort_values(["k", "a"]).reset_index(drop=True))
        one = (hash_join(left, right, on="k", how=how, sort_blocks=1)
               .to_pandas().sort_values(["k", "a"]).reset_index(drop=True))
        assert base.equals(one), how


def test_jpeg_dimensions_large_appn():
    """jpeg_dimensions must grow its header window past a fixed 4 KB
    prefix when a large APPn/EXIF segment (embedded thumbnail)
    precedes SOF0 — a hard cap silently diverges from
    decode_jpeg_batch, which decodes such blobs fine."""
    from osm2shp_ray.functions import codec, jpeg

    img = fixtures.ground_truth_pixels(3, 16, 16)
    blob = codec.encode_lossy(img)
    assert blob[:2] == b"\xff\xd8"
    # splice an 8 KB APP1 (EXIF-shaped) segment right after SOI
    payload = b"Exif\x00\x00" + b"\x00" * 8186
    seg = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    fat = blob[:2] + seg + blob[2:]
    w, h, sub = jpeg.jpeg_dimensions(fat)
    assert (w, h) == (16, 16)
    assert jpeg.jpeg_dimensions(blob)[:2] == (16, 16)
    # and the decode side agrees with the meta side on the fat blob
    out = jpeg.decode_jpeg(fat)
    assert out.shape == (16, 16, 3)


def _lsh_docs():
    import pandas as pd

    # a 260-member duplicate cluster (over max_bucket=200) + distinct tails
    texts = ["the quick brown fox jumps over the lazy dog again " * 3] * 260
    texts += [f"unique document body number {i} with its own words "
              f"{i * 7} {i * 13} trailing" for i in range(100)]
    return pd.DataFrame({
        "doc_id": pd.Series(range(len(texts)), dtype="int64"),
        "text": texts})


@pytest.mark.parametrize("max_bucket", [200, None])
def test_lsh_flatten_heavy_equivalence(ray_session, max_bucket):
    """Heavy-bucket exchange flattening (triangle cells in all-pairs
    mode, salted star vs broadcast exact-min center in star mode)
    produces the identical verified pair set as the unflattened path
    on a planted 260-member duplicate cluster."""
    import ray.data as rd

    from osm2shp_ray.stages import dedup

    df = _lsh_docs()

    def pairs(flatten):
        out = dedup.lsh_candidate_pairs(
            rd.from_pandas(df), max_bucket=max_bucket,
            flatten_heavy=flatten).to_pandas()
        return set(zip(out["id_a"], out["id_b"],
                       out["sim"].round(9)))

    assert pairs(True) == pairs(False)


def test_kcore_dual_equivalence(ray_session):
    """kcore's broadcast (stationary edges + driver peel) and
    distributed (per-round semijoin) paths reach the identical
    fixpoint — node_cap=0 forces the distributed dual."""
    import ray.data as rd

    from osm2shp_ray.stages.graph import kcore

    # a 4-clique (3-core) with a pendant path that peels away over
    # several rounds: 1-2-3-4 complete, then 4-5-6-7 chain
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
           (4, 5), (5, 6), (6, 7)]
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    edges = rd.from_items([{"src": s, "dst": d} for s, d in zip(src, dst)])

    def got(**kw):
        out = kcore(edges, k=2, **kw).to_pandas()
        return sorted(map(tuple, out[["node", "deg"]].values.tolist()))

    b = got()
    d = got(node_cap=0)
    assert b == d
    # the 2-core of this graph is exactly the 4-clique
    assert [n for n, _ in b] == [1, 2, 3, 4]
    assert all(deg == 3 for _, deg in b)


def test_nb_classify_dual_equivalence_and_ties(ray_session):
    """nb_classify's broadcast and sparse-delta distributed paths are
    byte-identical, tie scores break to the lexicographically smaller
    label, and zero-token docs are dropped."""
    import ray.data as rd

    from osm2shp_ray.stages.text import nb_classify

    docs = rd.from_items([
        {"doc_id": 1, "text": "x x y", "source": "b"},
        {"doc_id": 2, "text": "x x y", "source": "a"},
        {"doc_id": 3, "text": "y z", "source": "a"},
        {"doc_id": 4, "text": "y z", "source": "b"},
        {"doc_id": 5, "text": "???", "source": "a"},  # zero tokens
    ])

    def got(**kw):
        out = nb_classify(docs, **kw).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    b = got()
    d = got(distributed=True)
    assert b.values.tolist() == d.values.tolist()
    assert b["doc_id"].tolist() == [1, 2, 3, 4]  # doc 5 dropped
    # the corpus is fully symmetric in (a, b): every score ties, so
    # every prediction is the lexicographically smaller label
    assert set(b["pred"]) == {"a"}


def test_clustering_coeff_duals_and_values(ray_session):
    """clustering_coeff's broadcast probe/attach and the bcast_cap=0
    distributed (semijoin + hash_join) paths agree, and values are
    exact on a hand-checked graph."""
    import ray.data as rd

    from osm2shp_ray.stages.graph import clustering_coeff

    # 4-clique {1,2,3,4} + pendant 5 attached to 1 and 2 (one extra
    # triangle 1-2-5), + isolated edge 6-7 (deg 1 -> excluded)
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
           (1, 5), (2, 5), (6, 7)]
    edges = rd.from_items([{"u": a, "v": b} for a, b in und])

    def got(**kw):
        out = clustering_coeff(edges, **kw).to_pandas()
        return sorted(map(tuple, out.values.tolist()))

    b = got()
    d = got(bcast_cap=0)
    assert b == d
    # node: (deg, tri, cc_ppm = 2e6*tri // (deg*(deg-1)))
    expect = {1: (4, 4), 2: (4, 4), 3: (3, 3), 4: (3, 3), 5: (2, 1)}
    assert {n: (dg, t) for n, dg, t, _ in b} == expect
    cc = {n: c for n, dg, t, c in b}
    assert cc[5] == 1_000_000  # 2*1e6*1 // (2*1)
    assert cc[3] == 1_000_000  # 2*1e6*3 // (3*2)
    assert cc[1] == 666_666    # 2*1e6*4 // (4*3)
    assert 6 not in cc and 7 not in cc


def test_interp_resample_edges(ray_session):
    """interp_resample: exact-hit grid points, negative-slope
    toward-zero division, and last-write-wins duplicate timestamps."""
    import datetime as dt

    import ray.data as rd

    from osm2shp_ray.stages.temporal import interp_resample

    def t(sec):
        return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=sec)

    rows = [
        # key 1: v 100 at t=0 (on-grid, exact hit), dup ts at t=90
        # where the higher event_id (999) wins -> grid at 60s:
        # 100 + trunc((999-100)*60/90) = 100 + 599 = 699
        {"event_id": 1, "user_id": 1, "ts": t(0), "vq": 100},
        {"event_id": 2, "user_id": 1, "ts": t(90), "vq": -50},
        {"event_id": 3, "user_id": 1, "ts": t(90), "vq": 999},
        # key 2: rising 10 -> 13 over 120s: grid 60s ->
        # 10 + trunc(3*30/120) = 10, grid 120s -> 10 + trunc(2.25) = 12
        {"event_id": 4, "user_id": 2, "ts": t(30), "vq": 10},
        {"event_id": 5, "user_id": 2, "ts": t(150), "vq": 13},
        # key 3: falling 10 -> 7: trunc TOWARD ZERO on negatives:
        # grid 60s -> 10 + trunc(-0.75) = 10, grid 120s ->
        # 10 + trunc(-2.25) = 8 (floor would give 9 and 7)
        {"event_id": 6, "user_id": 3, "ts": t(30), "vq": 10},
        {"event_id": 7, "user_id": 3, "ts": t(150), "vq": 7},
    ]
    out = interp_resample(rd.from_items(rows), key_col="user_id",
                          ts_col="ts", value_col="vq",
                          id_col="event_id", bucket_s=60).to_pandas()
    base = int(dt.datetime(2024, 1, 1,
                           tzinfo=dt.timezone.utc).timestamp()) // 60
    got = {(r.user_id, r.bucket - base): r.v_q for r in out.itertuples()}
    assert got == {(1, 0): 100, (1, 1): 699,
                   (2, 1): 10, (2, 2): 12,
                   (3, 1): 10, (3, 2): 8}


def test_sssp_dual_equivalence(ray_session):
    """sssp's broadcast relaxation and the edge_cap=0 distributed
    (join + union + groupby-min) paths reach identical distances,
    checked against hand-computed values."""
    import ray.data as rd

    from osm2shp_ray.stages.graph import sssp

    # 1 -2-> 2 -3-> 3;  1 -10-> 3 (longer direct edge);  parallel
    # edge 1->2 weight 7 collapses to the min (2);  4 unreachable src
    rows = [(1, 2, 2), (2, 3, 3), (1, 3, 10), (1, 2, 7), (4, 1, 1)]
    edges = rd.from_items([{"src": s, "dst": d, "w": w}
                           for s, d, w in rows])

    def got(**kw):
        out = sssp(edges, [1], rounds=3, **kw).to_pandas()
        return dict(zip(out["node"], out["dist"]))

    b = got()
    d = got(edge_cap=0)
    assert b == d == {1: 0, 2: 2, 3: 5}

    # rounds=1 cannot take the 2-edge path yet: dist(3) = 10
    one = sssp(edges, [1], rounds=1).to_pandas()
    assert dict(zip(one["node"], one["dist"])) == {1: 0, 2: 2, 3: 10}


def test_assortativity_duals(ray_session):
    """assortativity's broadcast degree attach and the bcast_cap=0
    hash_join path agree; a star graph is maximally disassortative."""
    import ray.data as rd

    from osm2shp_ray.stages.graph import assortativity

    star = [(0, i) for i in range(1, 6)]
    edges = rd.from_items([{"u": a, "v": b} for a, b in star])
    b = assortativity(edges)
    d = assortativity(edges, bcast_cap=0)
    assert b["n_edges"][0] == d["n_edges"][0] == 5
    assert round(b["r"][0], 9) == round(d["r"][0], 9) == -1.0


def test_areal_interp_mass_and_split(ray_session):
    """areal_interp conserves mass up to per-piece truncation and
    splits a straddling rect by exact overlap proportions."""
    import ray.data as rd

    from osm2shp_ray.stages.spatial import areal_interp

    # rect [500k, 1.5M) x [0, 1M) with value 1000: exactly half in
    # cell (0,0) and half in cell (1,0)
    rows = [{"x0": 500_000, "y0": 0, "x1": 1_500_000, "y1": 1_000_000,
             "vq": 1000},
            # negative value fully inside cell (2, 3)
            {"x0": 2_100_000, "y0": 3_100_000, "x1": 2_400_000,
             "y1": 3_500_000, "vq": -700}]
    out = areal_interp(rd.from_items(rows), "x0", "y0", "x1", "y1",
                       "vq", cell_micro=1_000_000).to_pandas()
    got = {(r.cell_x, r.cell_y): r.v_q for r in out.itertuples()}
    assert got == {(0, 0): 500, (1, 0): 500, (2, 3): -700}
    assert sum(got.values()) == 1000 - 700  # mass conserved here


def test_pagerank_weighted_duals(ray_session):
    """pagerank_weighted's broadcast and node_cap=0 distributed paths
    produce identical integer ranks; weight guards fire."""
    import ray.data as rd

    from osm2shp_ray.stages.graph import pagerank_weighted

    und = [(1, 2, 3), (2, 1, 3), (2, 3, 1), (3, 2, 1),
           (1, 3, 6), (3, 1, 6), (1, 2, 2), (2, 1, 2)]  # parallel 1-2
    edges = rd.from_items([{"src": s, "dst": d, "w": w}
                           for s, d, w in und])

    def got(**kw):
        out = pagerank_weighted(edges, iters=2, **kw).to_pandas()
        return dict(zip(out["node"], out["r"]))

    b = got()
    d = got(node_cap=0)
    assert b == d
    assert set(b) == {1, 2, 3}
    # node 1 carries the most weighted in-flow (weights 3+2 from 2, 6
    # from 3)
    assert b[1] == max(b.values())

    import pytest as _pytest
    bad = rd.from_items([{"src": 1, "dst": 2, "w": 0},
                         {"src": 2, "dst": 1, "w": 1}])
    with _pytest.raises(ValueError, match="weights must be >= 1"):
        pagerank_weighted(bad, iters=1)


def test_mutual_info_independence_and_dependence(ray_session):
    """mutual_info reports exactly 0 on an independent contingency
    table (every cell ratio is 1, floor(ln 1) = 0) and positive on a
    deterministic dependence."""
    import ray.data as rd

    from osm2shp_ray.stages.sketch import mutual_info

    indep = rd.from_items([{"x": x, "y": y}
                           for x in "ab" for y in "cd" for _ in range(5)])
    out = mutual_info(indep, "x", "y")
    assert out["n"][0] == 20 and out["mi_q"][0] == 0

    dep = rd.from_items([{"x": "a", "y": "c"}] * 10
                        + [{"x": "b", "y": "d"}] * 10)
    out2 = mutual_info(dep, "x", "y")
    # perfect dependence: MI = ln 2 nats -> mi_q ~= 20 * 1e6 * ln 2
    assert out2["n"][0] == 20
    assert abs(out2["mi_q"][0] - round(20 * 1_000_000 * 0.6931471805599453)) <= 20


def test_ab_welch_guards_and_zero_diff(ray_session):
    """ab_welch: identical constant arms yield t = 0 via the
    zero-variance guard; arms with a clear shift yield the right
    sign."""
    import numpy as np
    import ray.data as rd

    from osm2shp_ray.functions.hashing import md5_hash60
    from osm2shp_ray.stages.sketch import ab_welch

    units = np.arange(1, 401)
    const = rd.from_items([{"k": "t", "u": int(u), "v": 7}
                           for u in units])
    out = ab_welch(const, "k", "u", "v").to_pandas()
    assert out["t"].tolist() == [0.0]
    assert out["n_a"][0] + out["n_b"][0] == 400

    # arm B (hash odd) gets +100: t must be negative (mean_a < mean_b)
    arm_b = md5_hash60(units) % 2 == 1
    shift = rd.from_items([
        {"k": "t", "u": int(u), "v": 10 + (100 if b else 0)}
        for u, b in zip(units, arm_b)])
    out2 = ab_welch(shift, "k", "u", "v").to_pandas()
    # both arms constant -> zero variance -> guard fires (den == 0)
    assert out2["t"].tolist() == [0.0]
    # add one unit of jitter so variances are positive
    jit = rd.from_items([
        {"k": "t", "u": int(u), "v": 10 + (100 if b else 0) + int(u % 2)}
        for u, b in zip(units, arm_b)])
    out3 = ab_welch(jit, "k", "u", "v").to_pandas()
    assert out3["t"][0] < -100  # enormous effect size, negative sign


def test_clustering_coeff_brute_force(ray_session):
    """clustering_coeff on a seeded random graph equals the adjacency
    -matrix brute force (tri/node = diag(A^3)/2, deg = row sums)."""
    import numpy as np
    import ray.data as rd

    from osm2shp_ray.stages.graph import clustering_coeff

    rng = np.random.default_rng(7)
    n = 40
    A = np.triu((rng.random((n, n)) < 0.2), 1).astype(np.int64)
    A = A + A.T
    us, vs = np.nonzero(np.triu(A, 1))
    edges = rd.from_items([{"u": int(a), "v": int(b)}
                           for a, b in zip(us, vs)])
    out = clustering_coeff(edges).to_pandas()
    deg = A.sum(axis=1)
    tri = np.diag(np.linalg.matrix_power(A, 3)) // 2
    want = {i: (int(deg[i]), int(tri[i]),
                int(2_000_000 * tri[i]) // int(deg[i] * (deg[i] - 1)))
            for i in range(n) if deg[i] >= 2}
    got = {r.node: (r.deg, r.tri_cnt, r.cc_ppm) for r in out.itertuples()}
    assert got == want


def test_interp_resample_brute_force(ray_session):
    """interp_resample on seeded random per-key events equals a
    per-key numpy reimplementation (trunc division, last-write-wins)."""
    import datetime as dt

    import numpy as np
    import ray.data as rd

    from osm2shp_ray.stages.temporal import interp_resample

    rng = np.random.default_rng(11)
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for k in range(6):
        for _ in range(rng.integers(2, 30)):
            eid += 1
            rows.append({"event_id": eid, "user_id": k,
                         "ts": base + dt.timedelta(
                             seconds=int(rng.integers(0, 7200))),
                         "vq": int(rng.integers(-500, 500))})
    out = interp_resample(rd.from_items(rows), key_col="user_id",
                          ts_col="ts", value_col="vq",
                          id_col="event_id", bucket_s=600).to_pandas()
    got = {(r.user_id, r.bucket): r.v_q for r in out.itertuples()}

    want = {}
    B = 600_000_000
    by_key: dict = {}
    for r in rows:
        us = int(np.datetime64(r["ts"], "us").astype(np.int64))
        by_key.setdefault(r["user_id"], {})
        cur = by_key[r["user_id"]]
        if us not in cur or r["event_id"] > cur[us][0]:
            cur[us] = (r["event_id"], r["vq"])
    for k, m in by_key.items():
        ts = np.array(sorted(m))
        v = np.array([m[t][1] for t in ts], np.int64)
        for g in range(-(-int(ts[0]) // B), int(ts[-1]) // B + 1):
            gt = g * B
            pi = np.searchsorted(ts, gt, side="right") - 1
            ni = np.searchsorted(ts, gt, side="left")
            if ts[ni] == ts[pi]:
                want[(k, g)] = int(v[pi])
            else:
                num = int(v[ni] - v[pi]) * (gt - int(ts[pi]))
                den = int(ts[ni] - ts[pi])
                q = abs(num) // den
                want[(k, g)] = int(v[pi]) + (q if num >= 0 else -q)
    assert got == want
