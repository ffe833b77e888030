"""Spatial pack + image-stage tests (Ray session required)."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from osm2shp_ray.functions import cells as cellmod
from osm2shp_ray.sources import fixtures
from osm2shp_ray.stages import images as imgstage
from osm2shp_ray.stages import spatial


@pytest.fixture(scope="module")
def points_ds(ray_session):
    rng = np.random.default_rng(5)
    n = 5000
    t = pa.table({
        "pid": pa.array(np.arange(n), pa.int64()),
        "x": pa.array(rng.uniform(-170, 170, n), pa.float64()),
        "y": pa.array(rng.uniform(-80, 80, n), pa.float64()),
    })
    return rd.from_arrow(t), t


def test_encode_cells(points_ds):
    ds, t = points_ds
    out = spatial.encode_cells(ds, concurrency=2).take_batch(5000, batch_format="pyarrow")
    lat = t["y"].to_numpy()
    lon = t["x"].to_numpy()
    exp = cellmod.latlng_to_cell(lat, lon, 15).astype(np.int64)
    got = dict(zip(out["pid"].to_numpy(), out["h3_cell"].to_numpy()))
    exp_map = dict(zip(t["pid"].to_numpy(), exp))
    assert got == exp_map
    assert "s2_cell" in out.schema.names


def test_tile_assign_matches_local(points_ds, ray_session):
    ds, t = points_ds
    tiles = fixtures.tiles_table(16)
    prep = spatial.prepare_tiles(tiles)
    ref = ray.put(prep)
    out = spatial.assign_tiles(ds, ref, concurrency=2).take_batch(5000, batch_format="pyarrow")
    # local truth
    idx = prep.assign_first(t["x"].to_numpy(), t["y"].to_numpy())
    tid = np.asarray(prep.tile_ids + [None], dtype=object)[np.where(idx < 0, len(prep.tile_ids), idx)]
    exp = dict(zip(t["pid"].to_numpy(), tid))
    got = dict(zip(out["pid"].to_numpy(), out["tile_id"].to_pylist()))
    assert got == exp
    assert any(v is not None for v in got.values())


def test_tile_assign_all_mode(points_ds, ray_session):
    ds, t = points_ds
    tiles = fixtures.tiles_table(16)
    prep = spatial.prepare_tiles(tiles)
    out = spatial.assign_tiles(ds, ray.put(prep), mode="all", concurrency=2)
    rows = out.take_all()
    pts, polys = prep.assign_all(t["x"].to_numpy(), t["y"].to_numpy())
    assert len(rows) == len(pts)


def test_knn_bruteforce_and_kring(points_ds):
    ds, t = points_ds
    q = (12.0, 34.0)
    x = t["x"].to_numpy(); y = t["y"].to_numpy()
    d = (x - q[0]) ** 2 + (y - q[1]) ** 2
    exp = t["pid"].to_numpy()[np.argsort(d, kind="stable")[:10]]
    got = spatial.knn(ds, q[0], q[1], 10, id_col="pid").to_pandas()
    assert sorted(got["pid"].tolist()) == sorted(exp.tolist())
    # k-ring pruned variant at coarse res so the disk holds enough rows
    ds_cells = spatial.encode_cells(ds, res=4, concurrency=2)
    got2 = spatial.knn(ds_cells, q[0], q[1], 10, ring=2, res=4, id_col="pid").to_pandas()
    assert sorted(got2["pid"].tolist()) == sorted(exp.tolist())


def test_tile_histogram_salted(points_ds):
    ds, t = points_ds
    ds_cells = spatial.encode_cells(ds, concurrency=2)
    hist = spatial.tile_histogram(ds_cells, zoom=3, salt=4).to_pandas()
    assert hist["n"].sum() == 5000
    # local truth
    cells = cellmod.latlng_to_cell(t["y"].to_numpy(), t["x"].to_numpy(), 15)
    parents = cellmod.cell_to_parent(cells, 3).astype(np.int64)
    import collections
    exp = collections.Counter(parents.tolist())
    got = dict(zip(hist["tile"], hist["n"]))
    assert got == dict(exp)


def test_raster_tile_ids(points_ds):
    ds, t = points_ds
    out = (spatial.raster_tile_ids(spatial.encode_cells(ds, concurrency=2), zoom=2)
           .take_batch(10, batch_format="pyarrow"))
    for v in out["raster_tile"].to_pylist():
        z, xx, yy = v.split("/")
        assert z == "2" and 0 <= int(xx) < 4 and 0 <= int(yy) < 4


def test_dedup_exact(ray_session):
    imgs = fixtures.images_table(300)
    ds = rd.from_arrow(imgs.select(["image_id", "phash"]))
    out = spatial.dedup_exact(ds, key_col="phash", order_col="image_id", n_buckets=8).to_pandas()
    ph = imgs["phash"].to_numpy()
    ids = np.asarray(imgs["image_id"].to_pylist(), dtype=object)
    import pandas as pd
    exp = (pd.DataFrame({"phash": ph, "image_id": ids})
           .sort_values("image_id").groupby("phash", sort=False).first())
    assert len(out) == len(exp)
    assert set(out["image_id"]) == set(exp["image_id"])


def test_decode_validate_invariants(ray_session):
    imgs = fixtures.images_table(120)
    ds = rd.from_arrow(imgs)
    out = imgstage.decode_validate(ds, concurrency=2, batch_size=64).to_pandas()
    assert out["decode_ok"].all()
    assert (out["psnr_db"] >= 40.0).all()   # input_hint invariant
    # caption passthrough equality
    merged = out.merge(imgs.select(["image_id", "caption"]).to_pandas(),
                       on="image_id", suffixes=("", "_orig"))
    assert (merged["caption"] == merged["caption_orig"]).all()
    assert "bytes" not in out.columns


def test_image_features(ray_session):
    imgs = fixtures.images_table(40)
    out = imgstage.image_features(rd.from_arrow(imgs), concurrency=2).take_batch(40, batch_format="pyarrow")
    feats = out["features"].to_pylist()
    assert all(len(f) == 48 for f in feats)
    assert any(max(f) > 0 for f in feats)


def test_multimodal_audio_video_moved():
    """Audio/video stages are real now (stages/audio.py, round 2);
    the old stubs are gone from stages/images.py."""
    assert not hasattr(imgstage, "AudioFeatures")
    from osm2shp_ray.stages.audio import AudioFeatures, VideoFrameSample
    assert AudioFeatures and VideoFrameSample


def test_partitioned_pip_matches_broadcast(points_ds, ray_session):
    """The large-side grid-partitioned PIP must agree with the
    broadcast path under tile_id-ordered first-match."""
    import pandas as pd
    ds, t = points_ds
    tiles = fixtures.tiles_table(16).sort_by("tile_id")
    # broadcast truth (tile_id order)
    prep = spatial.prepare_tiles(tiles)
    idx = prep.assign_first(t["x"].to_numpy(), t["y"].to_numpy())
    hit = idx >= 0
    exp = pd.DataFrame({
        "pid": t["pid"].to_numpy()[hit],
        "tile_id": np.asarray(prep.tile_ids, dtype=object)[idx[hit]]})
    got = (spatial.assign_tiles_partitioned(ds, rd.from_arrow(tiles), res=5)
           .to_pandas())
    assert len(got) == len(exp)
    merged = exp.merge(got[["pid", "tile_id"]], on="pid", suffixes=("_e", "_g"))
    assert (merged["tile_id_e"] == merged["tile_id_g"]).all()


def test_knn_auto_exact(ray_session):
    """Auto-expanding k-ring kNN must equal brute force, including on
    clustered data where the first ring holds fewer than k points."""
    rng = np.random.default_rng(11)
    # dense cluster near the query + sparse far field
    n1, n2 = 4000, 1000
    x = np.concatenate([rng.normal(12.0, 0.05, n1), rng.uniform(-170, 170, n2)])
    y = np.concatenate([rng.normal(34.0, 0.05, n1), rng.uniform(-80, 80, n2)])
    t = pa.table({"pid": pa.array(np.arange(n1 + n2), pa.int64()),
                  "x": pa.array(x, pa.float64()),
                  "y": pa.array(y, pa.float64())})
    ds = spatial.encode_cells(rd.from_arrow(t))
    d = (x - 12.0) ** 2 + (y - 34.0) ** 2
    exp = set(np.asarray(np.argsort(d, kind="stable")[:25]).tolist())
    got = spatial.knn_auto(ds, 12.0, 34.0, 25, id_col="pid").to_pandas()
    assert set(got["pid"]) == exp
    # sparse query point far from the cluster: forces ring expansion
    d2 = (x + 150.0) ** 2 + (y - 70.0) ** 2
    exp2 = set(np.asarray(np.argsort(d2, kind="stable")[:5]).tolist())
    got2 = spatial.knn_auto(ds, -150.0, 70.0, 5, id_col="pid").to_pandas()
    assert set(got2["pid"]) == exp2


def test_clip_to_rects_properties(ray_session):
    """Liang-Barsky clip invariants on random segments: clipped
    length never exceeds segment length, fully-inside segments keep
    full length, disjoint-bbox segments contribute nothing, and the
    clipped fraction matches a dense parametric point-sampling
    estimate."""
    rng = np.random.default_rng(42)
    n = 400
    x1 = rng.uniform(-50, 50, n)
    y1 = rng.uniform(-50, 50, n)
    x2 = x1 + rng.uniform(-30, 30, n)
    y2 = y1 + rng.uniform(-30, 30, n)
    # axis-parallel edge cases
    x2[:20] = x1[:20]
    y2[20:40] = y1[20:40]
    segs = pa.table({"x1": pa.array(x1), "y1": pa.array(y1),
                     "x2": pa.array(x2), "y2": pa.array(y2)})
    rects = pa.table({
        "tile_id": pa.array(["r0", "r1", "r2"]),
        "x_lo": pa.array([-10.0, -100.0, 200.0]),
        "y_lo": pa.array([-10.0, -100.0, 200.0]),
        "x_hi": pa.array([10.0, 100.0, 210.0]),
        "y_hi": pa.array([10.0, 100.0, 210.0]),
    })
    out = (spatial.clip_to_rects(rd.from_arrow(segs), rects)
           .groupby("tile_id")
           .aggregate(rd.aggregate.Sum("clip_len_q", alias_name="len_q"),
                      rd.aggregate.Sum("n_clipped", alias_name="n"))
           .to_pandas().set_index("tile_id"))
    seg_len = np.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2)
    # r1 covers the whole sample domain: every positive-length segment
    # is fully inside -> total equals the exact full length sum
    full_q = np.floor((1.0 * seg_len) * 1e7).astype(np.int64).sum()
    assert out.loc["r1", "len_q"] == full_q
    assert out.loc["r1", "n"] == int((seg_len > 0).sum())
    # r2 is disjoint from the domain
    assert out.loc["r2", "len_q"] == 0 and out.loc["r2", "n"] == 0
    # r0: compare against dense parametric sampling
    ts = np.linspace(0.0, 1.0, 20001)[None, :]
    px = x1[:, None] + (x2 - x1)[:, None] * ts
    py = y1[:, None] + (y2 - y1)[:, None] * ts
    inside = ((px >= -10) & (px <= 10) & (py >= -10) & (py <= 10))
    est = (inside.mean(axis=1) * seg_len).sum()
    got = out.loc["r0", "len_q"] / 1e7
    assert got <= seg_len.sum() + 1e-9
    assert abs(got - est) < seg_len.sum() * 2e-4


@pytest.mark.parametrize("res,exclude_self", [(2, False), (5, False),
                                              (3, True)])
def test_knn_join_exact_vs_brute_force(ray_session, res, exclude_self):
    """knn_join == brute-force top-k by (d2, rid) at coarse res (most
    lefts proven in-group) AND fine res (most lefts through the
    fallback), including the self-join variant."""
    rng = np.random.default_rng(7 + res)
    nl, nr, k = 300, 220, 4
    lx = rng.uniform(-179, 179, nl)
    ly = rng.uniform(-89, 89, nl)
    lid = np.arange(nl, dtype=np.int64)
    if exclude_self:
        rx, ry, rid_a = lx, ly, lid
    else:
        rx = rng.uniform(-179, 179, nr)
        ry = rng.uniform(-89, 89, nr)
        rid_a = np.arange(1000, 1000 + nr, dtype=np.int64)
    left = rd.from_arrow(pa.table({"left_id": pa.array(lid),
                                   "x": pa.array(lx), "y": pa.array(ly)}))
    right = rd.from_arrow(pa.table({"right_id": pa.array(rid_a),
                                    "x": pa.array(rx), "y": pa.array(ry)}))
    out = (spatial.knn_join(left, right, k, res=res,
                            exclude_self=exclude_self)
           .to_pandas().sort_values(["left_id", "rank"],
                                    ignore_index=True))
    # brute force
    d2 = ((lx[:, None] - rx[None, :]) ** 2
          + (ly[:, None] - ry[None, :]) ** 2)
    if exclude_self:
        d2[lid[:, None] == rid_a[None, :]] = np.inf
    rows = []
    for i in range(nl):
        order = sorted(range(len(rx)), key=lambda j: (d2[i, j], rid_a[j]))
        for rnk, j in enumerate(order[:k], 1):
            if not np.isfinite(d2[i, j]):
                continue
            rows.append((lid[i], rnk, rid_a[j], d2[i, j]))
    import pandas as pd
    exp = pd.DataFrame(rows, columns=["left_id", "rank", "right_id",
                                      "dist2"])
    assert len(out) == len(exp)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
