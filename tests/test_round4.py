"""Round-4 additions: enforced skew contracts, partial top-k tails,
the oracle-gated LSH embedding near-dup path, and the vendored
baseline-JPEG codec."""

import numpy as np
import pyarrow as pa
import pytest


# ------------------------------------------------ ra_link_scores caps

def test_ra_wedges_drops_power_law_hub():
    """A planted hub with degree > max_hub_degree contributes ZERO
    wedge rows and is counted as dropped (no silent caps)."""
    from osm2shp_ray.stages.graph import _ra_wedges

    cap = 8
    hot_deg = 100                     # would be 4950 wedges uncapped
    o = np.concatenate([np.zeros(hot_deg, np.int64),       # hot hub 0
                        np.array([1, 1, 1, 2, 2], np.int64)])
    p = np.concatenate([np.arange(hot_deg, dtype=np.int64) + 10,
                        np.array([3, 4, 5, 3, 4], np.int64)])
    tbl, n_dropped = _ra_wedges(o, p, quant=1_000_000_000,
                                max_hub_degree=cap)
    assert n_dropped == 1
    # only hubs 1 (deg 3 -> 3 pairs) and 2 (deg 2 -> 1 pair) survive;
    # pair (3,4) shared -> 3 distinct pair keys
    assert tbl.num_rows == 3
    # wedge volume is bounded by surviving-hub degrees, never deg^2
    # of the hot hub
    assert int(pa.compute.sum(tbl["cnt"]).as_py()) == 4


def test_ra_link_scores_cap_end_to_end(ray_session):
    """End-to-end: with the cap below a planted hub's degree, its
    pairs vanish from the scores; with the cap above, they return."""
    import ray.data as rd

    from osm2shp_ray.stages.graph import ra_link_scores

    rows = []
    for item in range(20):            # hot hub 999: degree 20
        rows.append({"o": 999, "p": 100 + item})
    for hub, items in [(1, [1, 2]), (2, [1, 2]), (3, [2, 5])]:
        for item in items:
            rows.append({"o": hub, "p": item})
    ds = rd.from_items(rows)
    capped = ra_link_scores(ds, topk=50, max_hub_degree=10)
    # only the small hubs' pairs survive: (1,2) with 2 common hubs,
    # (2,5) with 1
    assert len(capped) == 2
    assert capped.iloc[0]["p1"] == 1 and capped.iloc[0]["p2"] == 2
    assert capped.iloc[0]["n_common"] == 2
    uncapped = ra_link_scores(ds, topk=500, max_hub_degree=4096)
    assert len(uncapped) == 2 + 20 * 19 // 2


# ------------------------------------------------ baseline JPEG codec

def test_jpeg_annex_k_tables_consistent():
    """The Annex K Huffman specs are internally consistent: BITS sums
    match value counts, every (run, size) AC symbol is present exactly
    once, and the canonical construction yields prefix-free codes."""
    from osm2shp_ray.functions import jpeg

    for bits, vals in [(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS),
                       (jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS),
                       (jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS),
                       (jpeg.AC_CHROMA_BITS, jpeg.AC_CHROMA_VALS)]:
        assert sum(bits) == len(vals) == len(set(vals))
        jpeg._canonical_codes(bits, vals)   # asserts code < 2^len
    need = {0x00, 0xF0} | {(r << 4) | s for r in range(16)
                           for s in range(1, 11)}
    assert set(jpeg.AC_LUMA_VALS) == need
    assert set(jpeg.AC_CHROMA_VALS) == need


def test_jpeg_roundtrip_psnr_and_markers():
    from osm2shp_ray.functions import codec, jpeg

    rng = np.random.default_rng(11)
    for (h, w) in [(8, 8), (16, 16), (64, 64), (17, 23), (40, 24)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        blob = jpeg.encode_jpeg(img, quality=99)
        # JFIF structure: SOI, APP0-JFIF, EOI, restart markers present
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        assert blob[2:4] == b"\xff\xe0" and blob[6:11] == b"JFIF\x00"
        if (h + 7) // 8 * ((w + 7) // 8) > 1:
            assert b"\xff\xd0" in blob       # DRI=1 restart markers
        dec = jpeg.decode_jpeg(blob)
        assert dec.shape == img.shape
        assert codec.psnr(img, dec) >= 40.0


def test_jpeg_batch_decode_isolates_failures():
    from osm2shp_ray.functions import jpeg

    rng = np.random.default_rng(12)
    imgs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            for _ in range(4)]
    blobs = [jpeg.encode_jpeg(i, 99) for i in imgs]
    corrupt = bytearray(blobs[2])
    corrupt[len(corrupt) // 2] ^= 0xFF
    res = jpeg.decode_jpeg_batch(
        [blobs[0], b"not a jpeg", bytes(corrupt), blobs[3]])
    assert res[0] is not None and res[3] is not None
    assert res[1] is None
    # a mid-stream bitflip either fails or decodes to wrong pixels —
    # it must NOT corrupt neighbors
    assert np.array_equal(res[0], jpeg.decode_jpeg(blobs[0]))
    assert np.array_equal(res[3], jpeg.decode_jpeg(blobs[3]))


def test_jpeg_batch_equals_single_decode():
    """Lockstep batch decode is bit-identical to one-at-a-time decode
    across mixed sizes (the fixture's size classes)."""
    from osm2shp_ray.functions import jpeg
    from osm2shp_ray.sources.fixtures import ground_truth_pixels

    sizes = [(16, 16), (32, 16), (64, 64), (16, 64), (32, 32)]
    imgs = [ground_truth_pixels(i, w, h) for i, (w, h) in enumerate(sizes)]
    blobs = [jpeg.encode_jpeg(im) for im in imgs]
    batch = jpeg.decode_jpeg_batch(blobs)
    for im, blob, got in zip(imgs, blobs, batch):
        assert np.array_equal(got, jpeg.decode_jpeg(blob))
        assert got.shape == im.shape


def test_fixture_jpeg_rows_are_real_jfif(ray_session):
    """The mandated table's fmt='jpeg' rows carry real JFIF bytes and
    pass the PSNR >= 40 dB invariant through the engine's own decode
    stage (BASELINE.json input_hint gate)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from osm2shp_ray.sources.fixtures import cached_images_parquet
    from osm2shp_ray.stages.images import decode_validate

    path = cached_images_parquet(300, use_ray=False)
    tbl = pq.read_table(path)
    fmts = tbl["fmt"].to_pylist()
    blobs = tbl["bytes"].to_pylist()
    jpg = [b for b, f in zip(blobs, fmts) if f == "jpeg"]
    assert jpg and all(b[:2] == b"\xff\xd8" and b"JFIF" in b[:16]
                       for b in jpg)
    res = decode_validate(rd.read_parquet(path)).to_pandas()
    assert bool(res["decode_ok"].all())
    assert float(res["psnr_db"].min()) >= 40.0


def test_ra_link_scores_id_width_validation(ray_session):
    import ray.data as rd

    from osm2shp_ray.stages.graph import ra_link_scores

    bad_hub = rd.from_items([{"o": 1 << 32, "p": 1}])
    with pytest.raises(Exception, match="hub ids"):
        ra_link_scores(bad_hub)
    bad_item = rd.from_items([{"o": 1, "p": 1 << 31}])
    with pytest.raises(Exception, match="item ids"):
        ra_link_scores(bad_item)


def _smooth_image(h, w, seed):
    """Natural-spectrum content: blockwise base + low noise (the kind
    of signal chroma subsampling is designed for)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h // 8 + 2, w // 8 + 2, 3)).astype(np.float64)
    big = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
    return np.clip(big + rng.normal(0, 3, (h, w, 3)), 0, 255).astype(np.uint8)


def test_jpeg_420_roundtrip_and_markers():
    """4:2:0 encode -> decode: correct shape, SOF sampling bytes
    0x22/0x11, luma PSNR >= 44 dB (luma is untouched by chroma
    subsampling), full-RGB PSNR >= 35 dB on natural-spectrum content,
    across odd sizes and restart intervals (cross-MCU DC prediction
    through all four Y blocks)."""
    from osm2shp_ray.functions import jpeg

    for (h, w) in [(16, 16), (32, 32), (17, 23), (48, 64), (100, 36)]:
        img = _smooth_image(h, w, h * 100 + w)
        for restart in (1, 3):
            blob = jpeg.encode_jpeg(img, quality=97, restart=restart,
                                    subsampling="420")
            sof = blob.find(b"\xff\xc0")
            assert sof > 0
            comp = blob[sof + 4 + 6:sof + 4 + 15]
            assert comp[1] == 0x22 and comp[4] == 0x11 and comp[7] == 0x11
            dec = jpeg.decode_jpeg(blob)
            assert dec.shape == img.shape
            yi = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                  + 0.114 * img[..., 2]).astype(np.float64)
            yd = (0.299 * dec[..., 0] + 0.587 * dec[..., 1]
                  + 0.114 * dec[..., 2]).astype(np.float64)
            luma_psnr = 10 * np.log10(255.0 ** 2 / np.mean((yi - yd) ** 2))
            rgb_mse = np.mean((img.astype(np.float64)
                               - dec.astype(np.float64)) ** 2)
            assert luma_psnr >= 44.0
            assert 10 * np.log10(255.0 ** 2 / rgb_mse) >= 35.0


def test_jpeg_mixed_layout_batch():
    """One decode_jpeg_batch call over interleaved 4:4:4 / 4:2:0 /
    corrupt blobs: each image decodes exactly as its single-blob
    decode; corrupt blobs fail in isolation."""
    from osm2shp_ray.functions import jpeg

    imgs = [_smooth_image(32, 32, i) for i in range(5)]
    blobs = [jpeg.encode_jpeg(imgs[0]),
             jpeg.encode_jpeg(imgs[1], subsampling="420"),
             jpeg.encode_jpeg(imgs[2], restart=5, subsampling="420"),
             jpeg.encode_jpeg(imgs[3])[:30],          # truncated
             jpeg.encode_jpeg(imgs[4], subsampling="420", quality=60)]
    res = jpeg.decode_jpeg_batch(blobs)
    assert res[3] is None
    for i in (0, 1, 2, 4):
        assert np.array_equal(res[i], jpeg.decode_jpeg(blobs[i]))


def test_jpeg_444_output_bit_stable_under_cmap_generalization():
    """The 4:2:0 generalization must not move a single bit of 4:4:4
    output: fixture blobs are content-hashed by the oracle gates. The
    committed reference bytes pin the encoder."""
    from osm2shp_ray.functions import jpeg
    from osm2shp_ray.sources.fixtures import ground_truth_pixels

    import hashlib
    img = ground_truth_pixels(7, 32, 16)
    blob = jpeg.encode_jpeg(img, quality=97)
    assert hashlib.md5(blob).hexdigest() == \
        "fef468fc88e8fd3b66cc8acd58ce2b6d"


def test_decode_validate_mixed_subsampling(ray_session):
    """The Ray decode stage handles a table whose jpeg rows mix 4:4:4
    and 4:2:0 layouts (a foreign corpus shape): every row decodes,
    shapes match, and mean luminance tracks the source."""
    import ray
    from osm2shp_ray.functions import codec, jpeg
    from osm2shp_ray.stages import images as imgstage

    n = 24
    imgs = [_smooth_image(32, 32, 1000 + i) for i in range(n)]
    rows = []
    for i, im in enumerate(imgs):
        if i % 3 == 0:
            blob, fmt = codec.encode_png(im), "png"
        elif i % 3 == 1:
            blob, fmt = jpeg.encode_jpeg(im, quality=97), "jpeg"
        else:
            blob, fmt = jpeg.encode_jpeg(im, quality=97,
                                         subsampling="420"), "jpeg"
        rows.append({"image_id": f"x-{i}", "bytes": blob, "w": 32,
                     "h": 32, "fmt": fmt, "caption": "c"})
    ds = ray.data.from_items(rows)
    out = imgstage.decode_validate(ds, check_ground_truth=False).to_pandas()
    assert len(out) == n
    assert out["decode_ok"].all()
    src_lum = np.array([im.mean() for im in imgs])
    got = out.sort_values("image_id",
                          key=lambda s: s.str.split("-").str[1].astype(int))
    assert np.allclose(got["mean_lum"].to_numpy(), src_lum, atol=1.5)


def test_image_meta_scan_headers_and_failures(ray_session):
    """Header-only meta scan: dims/format/detail parsed from container
    bytes without decode; corrupt blobs surface as fmt='' rows."""
    import ray
    from osm2shp_ray.functions import codec, jpeg
    from osm2shp_ray.stages import images as imgstage

    rows = [
        {"image_id": "p0", "bytes": codec.encode_png(_smooth_image(24, 17, 5))},
        {"image_id": "j4", "bytes": jpeg.encode_jpeg(_smooth_image(16, 33, 6), quality=90)},
        {"image_id": "j2", "bytes": jpeg.encode_jpeg(_smooth_image(32, 32, 7), subsampling="420")},
        {"image_id": "qq", "bytes": codec.encode_qjpg(_smooth_image(9, 11, 8))},
        {"image_id": "xx", "bytes": b"\x00\x01garbage"},
        {"image_id": "tr", "bytes": b"\xff\xd8\xff\xe0"},  # truncated JPEG
    ]
    out = (imgstage.meta_scan(ray.data.from_items(rows))
           .to_pandas().set_index("image_id"))
    # _smooth_image(h, w, seed) -> header must report (w, h)
    assert tuple(out.loc["p0", ["fmt", "w", "h", "detail"]]) == ("png", 17, 24, "rgb8")
    assert tuple(out.loc["j4", ["fmt", "w", "h", "detail"]]) == ("jpeg", 33, 16, "444")
    assert tuple(out.loc["j2", ["fmt", "w", "h", "detail"]]) == ("jpeg", 32, 32, "420")
    assert tuple(out.loc["qq", ["fmt", "w", "h"]]) == ("qjpg", 11, 9)
    assert tuple(out.loc["xx", ["fmt", "w", "h"]]) == ("", -1, -1)
    assert tuple(out.loc["tr", ["fmt", "w", "h"]]) == ("", -1, -1)


def test_watermark_late_planted_stream(ray_session):
    """Planted out-of-order stream: rows 'arrive' in event_id order;
    exactly the rows whose ts trails the running max by > late_us are
    late, across bin boundaries (bin_sz=4 forces multi-bin scans)."""
    import pandas as pd
    import ray
    from osm2shp_ray.stages import temporal

    # arrival order 0..7; event times (us): head runs to 10_000, two
    # stragglers (idx 3: 2_000 behind; idx 6: 200 behind), one exactly
    # AT the watermark (idx 7 - not late; strict <)
    tu = np.array([1000, 5000, 10_000, 8000 - 0, 11_000, 12_000,
                   11_800, 11_500], np.int64)
    late_us = 500
    df = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "ts": pd.to_datetime(tu, unit="us"),
        "event_type": ["a", "a", "a", "a", "b", "b", "b", "b"]})
    out = (temporal.watermark_late(ray.data.from_pandas(df),
                                   late_us=late_us, bin_sz=4)
           .to_pandas().set_index("event_type"))
    # idx 3: hwm=10_000, ts=8000 -> late by 1500; idx 7: hwm=12_000,
    # ts=11_500 = hwm-500 -> NOT late (strict); idx 6: 11_800 -> not
    assert int(out.loc["a", "n_late"]) == 1
    assert int(out.loc["a", "max_late_us"]) == 1500
    assert int(out.loc["a", "n_events"]) == 4
    assert int(out.loc["b", "n_late"]) == 0
    assert int(out.loc["b", "max_late_us"]) == 0
    assert int(out.loc["b", "n_events"]) == 4
