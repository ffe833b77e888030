"""Deterministic fixture generators (seed-fixed, no external data).

F1 ``images`` — the mandated input shape (BASELINE.json input_hint):
    (image_id string, bytes binary, w int32, h int32, fmt string,
     caption string, phash int64).
Captions embed space-separated ``k=v`` tag tokens so that every one of
the reference's 12 layer rules (/root/reference/osm/handler.cc:45-56),
every is_area branch incl. the literal ``natural=woord`` typo
(handler.cc:127-133), unnamed-place drops (handler.cc:92-94) and
first-match-wins overlaps (handler.cc:96-104) are exercised. ``phash``
is a Hilbert encoding of clustered (lon, lat) so synthetic data has
realistic spatial hot cells; some phashes are duplicated to exercise
exact dedup.

F2/F3 ``nodes``/``ways`` — OSM-analog edge-case corpus for direct
conformance (dangling refs, duplicate refs / closed rings, <2 / <3
vertex ways, id<=0 nodes).

F4 ``tiles`` — convex polygon side table for point-in-polygon.

Everything is a pure function of (row index, seed): a batch can be
generated anywhere (driver or Ray task) and always yields identical
rows — this is what makes fixture generation parallel and the decode
invariant checkable without storing ground-truth pixels.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import codec
from ..functions.hashing import splitmix64
from ..functions.hilbert import xy2d, PHASH_ORDER

SEED = 42

CAPTION_TEMPLATES = [
    "aerial view place=city name=Alpha{k}",
    "busy streets place=town name=Beta{k}",
    "quiet corner place=suburb name=Gamma{k}",
    "small houses place=village name=Delta{k}",
    "place=city",                              # unnamed -> never exported as point
    "long road highway=motorway",
    "highway=trunk at dusk",
    "highway=primary",
    "highway=secondary",
    "railway=rail crossing",
    "waterway=river bend",
    "waterway=canal",
    "natural=water lake panorama",             # polygon rule
    "forest natural=woord",                    # is_area via the reference's literal typo
    "natural=land",                            # area, no matching rule
    "landuse=residential blocks",              # area via landuse, no rule
    "area=yes waterway=river",                 # area + line-only rule -> type mismatch, dropped
    "junction highway=motorway railway=rail",  # first-match-wins overlap
    "scenic photo of a lake",                  # no tags at all
    "name=Epsilon{k} portrait",                # name but no layer tag
]

_SIZES = np.array([16, 32, 64], dtype=np.int32)
_N_CLUSTERS = 64
_CLUSTER_RUN = 50  # consecutive rows share a spatial cluster -> hot cells


def ground_truth_pixels(row_idx: int, w: int, h: int) -> np.ndarray:
    """The original pixel array for fixture row ``row_idx`` — re-derivable
    anywhere, which is how DecodeValidate checks PSNR without shipping
    ground truth through the pipeline.

    Content is NATURAL-SPECTRUM (round 4): a bilinear-upsampled
    low-resolution noise base (the energy-concentrated-in-low-
    frequencies profile of photographs) plus small high-frequency
    texture. Pre-round-4 fixtures used uniform white noise — the
    single most JPEG-hostile content there is (every DCT coefficient
    nonzero), which made the lossy half of the corpus unrepresentative
    of any real image table once "jpeg" rows became real baseline
    JPEG. Still a pure deterministic function of the row index."""
    rng = np.random.default_rng(SEED * 1_000_003 + row_idx)
    gh, gw = max(2, h // 8 + 1), max(2, w // 8 + 1)
    coarse = rng.integers(8, 248, size=(gh, gw, 3)).astype(np.float64)
    tex = rng.integers(-2, 3, size=(h, w, 3))
    iy, fy, ix, fx = _bilinear_grid(h, w, gh, gw)
    rows = coarse[iy] * (1.0 - fy) + coarse[iy + 1] * fy      # (h, gw, 3)
    base = rows[:, ix] * (1.0 - fx) + rows[:, ix + 1] * fx    # (h, w, 3)
    return np.clip(np.rint(base) + tex, 0, 255).astype(np.uint8)


@functools.lru_cache(maxsize=64)
def _bilinear_grid(h: int, w: int, gh: int, gw: int):
    """Size-keyed interpolation grids (the fixture has 9 size classes;
    regenerating linspace per row was ~15% of DecodeValidate's
    ground-truth check)."""
    ys = np.linspace(0.0, gh - 1.0, h)
    xs = np.linspace(0.0, gw - 1.0, w)
    iy = np.minimum(ys.astype(np.int64), gh - 2)
    ix = np.minimum(xs.astype(np.int64), gw - 2)
    return iy, (ys - iy)[:, None, None], ix, (xs - ix)[None, :, None]


def _cluster_lonlat(idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cluster = (idx // _CLUSTER_RUN) % _N_CLUSTERS
    cr = np.random.default_rng(SEED)
    centers_lon = cr.uniform(-170, 170, _N_CLUSTERS)
    centers_lat = cr.uniform(-80, 80, _N_CLUSTERS)
    jitter = splitmix64(idx.astype(np.uint64))
    jlon = ((jitter & np.uint64(0xFFFF)).astype(np.float64) / 65535.0 - 0.5) * 2.0
    jlat = (((jitter >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.float64) / 65535.0 - 0.5) * 2.0
    return centers_lon[cluster] + jlon, centers_lat[cluster] + jlat


def phash_of(idx: np.ndarray) -> np.ndarray:
    """Row index -> phash: Hilbert distance of the quantized clustered
    (lon, lat), upper bits carrying a splitmix tag. Every 37th row
    reuses the previous multiple-of-37 row's phash (exact-dup corpus)."""
    lon, lat = _cluster_lonlat(idx)
    side = 1 << PHASH_ORDER
    hx = np.clip(((lon + 180.0) / 360.0 * side).astype(np.int64), 0, side - 1)
    hy = np.clip(((lat + 90.0) / 180.0 * side).astype(np.int64), 0, side - 1)
    d = xy2d(PHASH_ORDER, hx.astype(np.uint64), hy.astype(np.uint64))
    # duplicates: rows where idx % 37 == 1 copy the phash of idx-1
    dup_src = np.where(idx % 37 == 1, idx - 1, idx)
    if not np.array_equal(dup_src, idx):
        lon2, lat2 = _cluster_lonlat(dup_src)
        hx2 = np.clip(((lon2 + 180.0) / 360.0 * side).astype(np.int64), 0, side - 1)
        hy2 = np.clip(((lat2 + 90.0) / 180.0 * side).astype(np.int64), 0, side - 1)
        d = xy2d(PHASH_ORDER, hx2.astype(np.uint64), hy2.astype(np.uint64))
    return d.astype(np.int64)


def images_batch(idx: np.ndarray) -> pa.Table:
    """Row indices -> an Arrow batch of the mandated images table."""
    idx = np.asarray(idx, dtype=np.int64)
    n = len(idx)
    image_id = [f"img-{i:09d}" for i in idx]
    w = _SIZES[idx % 3]
    h = _SIZES[(idx // 3) % 3]
    fmt = np.where(idx % 2 == 0, "png", "jpeg")
    captions = [
        CAPTION_TEMPLATES[i % len(CAPTION_TEMPLATES)].format(k=i // len(CAPTION_TEMPLATES))
        for i in idx
    ]
    blobs = []
    for j in range(n):
        img = ground_truth_pixels(int(idx[j]), int(w[j]), int(h[j]))
        blobs.append(codec.encode_png(img) if fmt[j] == "png" else codec.encode_lossy(img))
    return pa.table({
        "image_id": pa.array(image_id, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(w, pa.int32()),
        "h": pa.array(h, pa.int32()),
        "fmt": pa.array(fmt.tolist(), pa.string()),
        "caption": pa.array(captions, pa.string()),
        "phash": pa.array(phash_of(idx), pa.int64()),
    })


def images_table(n: int) -> pa.Table:
    return images_batch(np.arange(n))


# ---------------------------------------------------- F5 audio / video

def _audio_samples(i: int, rate: int = 8000) -> tuple[np.ndarray, float]:
    """The deterministic int16 waveform of clip ``i`` (shared by the
    clip generator AND the oracle-side metadata writer, so both always
    describe the same samples)."""
    rng = np.random.default_rng(SEED * 7 + int(i))
    f0 = 200.0 + (int(i) % 20) * 150.0
    t = np.arange(int(rate * 0.5)) / rate
    x = (0.6 * np.sin(2 * np.pi * f0 * t)
         + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
         + 0.02 * rng.standard_normal(len(t)))
    return np.clip(x * 20000, -32768, 32767).astype(np.int16), f0


def audio_batch(idx: np.ndarray, rate: int = 8000) -> pa.Table:
    """Deterministic audio-clip table (clip_id, bytes WAV, rate,
    caption): each clip is a two-tone sine mix whose frequencies derive
    from the row index — features (centroid, rms) are predictable."""
    idx = np.asarray(idx, dtype=np.int64)
    clips, f0s = [], []
    for i in idx:
        samples, f0 = _audio_samples(int(i), rate)
        clips.append(codec.encode_wav(samples, rate))
        f0s.append(f0)
    return pa.table({
        "clip_id": pa.array([f"aud-{i:06d}" for i in idx], pa.string()),
        "bytes": pa.array(clips, pa.binary()),
        "rate": pa.array(np.full(len(idx), rate, np.int32), pa.int32()),
        "f0_hz": pa.array(f0s, pa.float64()),  # ground truth for tests
    })


def video_batch(idx: np.ndarray, n_frames: int = 12,
                w: int = 16, h: int = 12) -> pa.Table:
    """Deterministic video-clip table (clip_id, bytes QVID): frame k of
    clip i is the ground_truth_pixels of row (i*1000 + k), so sampled
    frames are verifiable without storing them."""
    idx = np.asarray(idx, dtype=np.int64)
    blobs = []
    for i in idx:
        frames = np.stack([ground_truth_pixels(int(i) * 1000 + k, w, h)
                           for k in range(n_frames)])
        blobs.append(codec.encode_qvid(frames, fps=6))
    return pa.table({
        "clip_id": pa.array([f"vid-{i:06d}" for i in idx], pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "n_frames": pa.array(np.full(len(idx), n_frames, np.int32), pa.int32()),
    })


# ------------------------------------------------------- OSM-analog F2/F3

def nodes_ways_tables() -> tuple[pa.Table, pa.Table]:
    """Hand-built edge-case corpus; see FIXTURES.md F2/F3."""
    nodes = []
    # a 10x10 grid of valid nodes, ids 1..100
    for i in range(100):
        gx, gy = i % 10, i // 10
        nodes.append((i + 1, -10.0 + gx * 0.5, 40.0 + gy * 0.5, ""))
    # tagged point nodes
    nodes += [
        (201, 1.0, 1.0, "place=city name=Metropolis"),
        (202, 2.0, 1.0, "place=town name=Smallville"),
        (203, 3.0, 1.0, "place=suburb name=Edge"),
        (204, 4.0, 1.0, "place=village name=Hamlet"),
        (205, 5.0, 1.0, "place=city"),                        # unnamed -> dropped
        (206, 6.0, 1.0, "place=city place=town name=First"),  # first-match
        (207, 7.0, 1.0, "highway=motorway name=NotAPoint"),   # line rule on node -> no point
        (-5, 8.0, 1.0, "place=city name=Negative"),           # id<=0 -> dropped entirely
        (0, 9.0, 1.0, "place=town name=Zero"),                # id==0 -> dropped
    ]
    nodes_t = pa.table({
        "id": pa.array([n[0] for n in nodes], pa.int64()),
        "lon": pa.array([n[1] for n in nodes], pa.float64()),
        "lat": pa.array([n[2] for n in nodes], pa.float64()),
        "tags": pa.array([n[3] for n in nodes], pa.string()),
    })
    ways = [
        (1, [1, 2, 3, 4], "highway=motorway"),
        (2, [5, 6], "highway=trunk"),
        (3, [7, 8, 9], "highway=primary"),
        (4, [10, 11], "highway=secondary"),
        (5, [12, 13, 14], "railway=rail"),
        (6, [15, 16], "waterway=river"),
        (7, [17, 18, 19], "waterway=canal"),
        (8, [21, 22, 32, 31, 21], "natural=water"),         # closed ring, dup ref
        (9, [23, 24, 25], "natural=water area=yes"),        # polygon via rule + area
        (10, [26, 27], "natural=water"),                    # polygon but 2 verts -> dropped
        (11, [28], "highway=motorway"),                     # 1 vert line -> dropped
        (12, [29, 30, 999], "highway=motorway"),            # dangling ref -> dropped
        (13, [33, 34, -5], "highway=trunk"),                # ref to dropped node -> dropped
        (14, [35, 36, 37], "highway=motorway railway=rail"),  # overlap: first match
        (15, [38, 39, 40], "landuse=forest"),               # area, no polygon rule -> no match
        (16, [41, 42, 43], "natural=woord"),                # area via typo, no rule -> no match
        (17, [44, 45], "area=yes waterway=river"),          # area + line rule -> type mismatch
        (18, [46, 47, 46], "highway=primary"),              # duplicate ref mid-way
        (19, [48, 49, 50], ""),                             # untagged
        (20, [51, 52, 53, 999], "natural=water"),           # polygon + dangling -> dropped
    ]
    ways_t = pa.table({
        "way_id": pa.array([w[0] for w in ways], pa.int64()),
        "node_refs": pa.array([w[1] for w in ways], pa.list_(pa.int64())),
        "tags": pa.array([w[2] for w in ways], pa.string()),
    })
    return nodes_t, ways_t


# ----------------------------------------------------------------- F4

def tiles_table(n_tiles: int = 32, seed: int = SEED) -> pa.Table:
    """Seeded convex polygons (irregular hexagons around grid centers)
    covering the fixture extent, with overlaps."""
    from ..functions.wkb import encode_polygons
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(n_tiles)))
    ids, offs, xs, ys = [], [0], [], []
    for t in range(n_tiles):
        cx = -170 + (t % side + 0.5) * 340.0 / side
        cy = -80 + (t // side + 0.5) * 160.0 / side
        r = rng.uniform(25, 45)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 6))
        px = cx + r * np.cos(ang)
        py = np.clip(cy + r * np.sin(ang) * 0.5, -89.9, 89.9)
        ids.append(f"13/{t % side}/{t // side}")
        xs.extend(px.tolist())
        ys.extend(py.tolist())
        offs.append(len(xs))
    wkbs = encode_polygons(np.array(offs), np.array(xs), np.array(ys))
    return pa.table({
        "tile_id": pa.array(ids, pa.string()),
        "geometry_wkb": pa.array(wkbs, pa.binary()),
    })


# ------------------------------------------------------------- caching

# _r4 suffix: round 4 switched "jpeg" rows from the QJPG stand-in to
# real baseline JPEG (functions/jpeg.py), changing every lossy blob —
# a new cache root regenerates all fixtures and side tables together
FIXTURE_ROOT = "/tmp/osm2shp_ray_fixtures_r4"


def cached_images_parquet(n: int, use_ray: bool = True) -> str:
    """Write (once) and return the path of an images fixture parquet
    directory for ``n`` rows. Generation is Ray-parallel for large n
    (each task generates a disjoint index range — pure function of row
    index, so output is identical regardless of parallelism)."""
    path = os.path.join(FIXTURE_ROOT, f"images_n{n}")
    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    if use_ray and n > 20_000:
        import ray.data as rd
        (rd.range(n, override_num_blocks=max(8, n // 25_000))
           .map_batches(lambda b: images_batch(b["id"]),
                        batch_format="numpy", batch_size=4096)
           .write_parquet(path))
    else:
        pq.write_table(images_table(n), os.path.join(path, "part-0.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return path


# ------------------------------------------------ SQL-oracle side tables
#
# Engine-independent relational views of the fixtures, written at
# fixture time so the driver's DuckDB oracle can re-derive expected
# aggregates (the q_convert_pipeline pattern) for the image/audio/video
# query family. Derivations use only the pure kernels in functions/
# (independently parity-tested: 200k-key int-parity for cells, Hilbert
# round-trip) plus the adapter CONTRACT constants restated below —
# never the Ray pipeline under test (pipelines/adapter.py, stages/*).

_ADAPTER_NEG_MOD = 97     # contract: splitmix(id) % 97 == 0 -> id negated
_ADAPTER_CELL_RES = 12    # contract: coarse cell scoping a way
_ADAPTER_SUBGROUPS = 4    # contract: ways per cell
_ADAPTER_POS_C = np.uint64(0x5851F42D4C957F2D)


def _atomic_parquet(table: pa.Table, path: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def cached_entities_parquet(n: int) -> str:
    """The adapter-contract relational view of images fixture ``n``:
    one row per image with (id, lon, lat, caption, way_id, pos) — the
    node identity/geometry plus its way membership. DuckDB re-derives
    classify/join/count aggregates from this table (tags parsed from
    the raw caption IN SQL, so even tag parsing is independently
    re-done on the oracle side)."""
    path = os.path.join(FIXTURE_ROOT, f"entities_n{n}.parquet")
    if os.path.exists(path):
        return path
    from ..functions.cells import latlng_to_cell
    from ..functions.hashing import stable_id64
    from ..functions.hilbert import phash_to_lonlat
    idx = np.arange(n, dtype=np.int64)
    ids = stable_id64([f"img-{i:09d}" for i in idx])
    neg = splitmix64(ids.astype(np.uint64)) % np.uint64(_ADAPTER_NEG_MOD) == 0
    ids = np.where(neg, -ids, ids)
    lon, lat = phash_to_lonlat(phash_of(idx))
    captions = [
        CAPTION_TEMPLATES[i % len(CAPTION_TEMPLATES)].format(k=i // len(CAPTION_TEMPLATES))
        for i in idx
    ]
    cell = latlng_to_cell(lat, lon, _ADAPTER_CELL_RES)
    sub = splitmix64(np.abs(ids).astype(np.uint64)) % np.uint64(_ADAPTER_SUBGROUPS)
    way_id = (splitmix64(cell ^ (sub + np.uint64(1))) >> np.uint64(1)).astype(np.int64)
    with np.errstate(over="ignore"):
        pos = (splitmix64(np.abs(ids).astype(np.uint64) ^ _ADAPTER_POS_C)
               >> np.uint64(1)).astype(np.int64)
    return _atomic_parquet(pa.table({
        "id": pa.array(ids, pa.int64()),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
        "caption": pa.array(captions, pa.string()),
        "way_id": pa.array(way_id, pa.int64()),
        "pos": pa.array(pos, pa.int64()),
    }), path)


def cached_image_cells_parquet(n: int, res: int = 13) -> str:
    """Engine-independent spatial ground truth for the images fixture:
    (image_id, cell) where cell is the res-``res`` quadcell of the
    image's phash-derived location — computed HERE from the
    generator's own phash chain (phash_of -> hilbert decode ->
    latlng_to_cell), so the engine's in-pipeline derivation from the
    stored phash COLUMN must reproduce every id bit-exactly. DuckDB
    re-derives tile rollups from this table with pure int64 bit
    arithmetic (cell layout: res<<58 | y<<29 | x)."""
    path = os.path.join(FIXTURE_ROOT, f"image_cells_n{n}_r{res}.parquet")
    if os.path.exists(path):
        return path
    from ..functions.cells import latlng_to_cell
    from ..functions.hilbert import phash_to_lonlat
    idx = np.arange(n, dtype=np.int64)
    lon, lat = phash_to_lonlat(phash_of(idx))
    cell = latlng_to_cell(lat, lon, res).astype(np.int64)
    return _atomic_parquet(pa.table({
        "image_id": pa.array([f"img-{i:09d}" for i in idx], pa.string()),
        "cell": pa.array(cell, pa.int64()),
    }), path)


def cached_audio_meta_parquet(n: int, rate: int = 8000) -> str:
    """Per-clip ground truth for the audio fixture: nominal tone and
    the RMS of the exact int16 samples the WAV encodes (computed here
    from the generator's own waveform, x = int16/32768, in float64 —
    PCM16 decode is lossless, so the engine's DSP must reproduce it
    bit-exactly)."""
    path = os.path.join(FIXTURE_ROOT, f"audio_meta_n{n}_r{rate}.parquet")
    if os.path.exists(path):
        return path
    rms, f0s = [], []
    for i in range(n):
        samples, f0 = _audio_samples(i, rate)
        x = samples.astype(np.float64) / 32768.0
        rms.append(float(np.sqrt(np.mean(x * x))))
        f0s.append(f0)
    return _atomic_parquet(pa.table({
        "clip_id": pa.array([f"aud-{i:06d}" for i in range(n)], pa.string()),
        "f0_hz": pa.array(f0s, pa.float64()),
        "rms": pa.array(rms, pa.float64()),
    }), path)


def cached_video_meta_parquet(n: int, n_frames: int = 12) -> str:
    """Per-clip frame counts for the video fixture (the sampler's
    expected output size is pure arithmetic over this)."""
    path = os.path.join(FIXTURE_ROOT, f"video_meta_n{n}_f{n_frames}.parquet")
    if os.path.exists(path):
        return path
    return _atomic_parquet(pa.table({
        "clip_id": pa.array([f"vid-{i:06d}" for i in range(n)], pa.string()),
        "n_frames": pa.array(np.full(n, n_frames, np.int32), pa.int32()),
    }), path)


def cached_clip_meta_parquet(n: int) -> str:
    """Per-image ground truth for the caption-image consistency
    scorer: the caption text and the 12 quadrant means (2x2 box
    resize / 255, float64) of the image AS DECODED from the fixture
    blob — computed here by round-tripping the generator's own encode
    (PNG is lossless, the lossy stand-in is deterministic, so the
    engine's decode must reproduce these doubles bit-exactly; the
    audio-meta contract).

    The filename carries codec.DECODE_REV: this is the ONE side table
    derived from DECODED pixels rather than generator ground truth, so
    a decoder rounding change (e.g. the round-4 float32 IDCT) must
    regenerate it coherently — everything else in FIXTURE_ROOT stays
    valid because the encoder (hence every blob) is unchanged."""
    path = os.path.join(
        FIXTURE_ROOT, f"clip_meta_d{codec.DECODE_REV}_n{n}.parquet")
    if os.path.exists(path):
        return path
    tbl = images_table(n)
    blobs = tbl["bytes"].to_pylist()
    fmts = tbl["fmt"].to_pylist()
    ms = np.empty((n, 12), dtype=np.float64)
    for i in range(n):
        img = codec.decode_image(blobs[i], fmts[i])
        ms[i] = codec.resize_box(img, 2, 2).astype(np.float64).reshape(-1) / 255.0
    cols = {"image_id": tbl["image_id"], "caption": tbl["caption"]}
    for d in range(12):
        cols[f"m{d}"] = pa.array(ms[:, d], pa.float64())
    return _atomic_parquet(pa.table(cols), path)


def cached_image_stats_parquet(n: int) -> str:
    """Per-image channel ground truth for the images fixture: int64
    R/G/B sums and global pixel min/max computed here from
    ground_truth_pixels — the exact array the PNG rows encode
    losslessly, so the engine's decode + channel-stats stage must
    reproduce every value bit-exactly on fmt='png' rows (lossy rows
    carry the truth of the SOURCE pixels, not of a decode)."""
    path = os.path.join(FIXTURE_ROOT, f"image_stats_n{n}.parquet")
    if os.path.exists(path):
        return path
    idx = np.arange(n, dtype=np.int64)
    ws = _SIZES[idx % 3]
    hs = _SIZES[(idx // 3) % 3]
    fmt = np.where(idx % 2 == 0, "png", "jpeg")
    rs, gs, bs, mins, maxs, npx = [], [], [], [], [], []
    for i in idx:
        img = ground_truth_pixels(int(i), int(ws[i]), int(hs[i]))
        px = img.astype(np.int64)
        rs.append(int(px[:, :, 0].sum()))
        gs.append(int(px[:, :, 1].sum()))
        bs.append(int(px[:, :, 2].sum()))
        mins.append(int(px.min()))
        maxs.append(int(px.max()))
        npx.append(int(img.shape[0] * img.shape[1]))
    return _atomic_parquet(pa.table({
        "image_id": pa.array([f"img-{i:09d}" for i in idx], pa.string()),
        "fmt": pa.array(fmt.tolist(), pa.string()),
        "n_px": pa.array(npx, pa.int64()),
        "r_sum": pa.array(rs, pa.int64()),
        "g_sum": pa.array(gs, pa.int64()),
        "b_sum": pa.array(bs, pa.int64()),
        "px_min": pa.array(mins, pa.int64()),
        "px_max": pa.array(maxs, pa.int64()),
    }), path)


def cached_image_stats_lossy_parquet(n: int) -> str:
    """Per-image channel ground truth of the DECODE of the LOSSY
    (fmt='jpeg') rows — the decode-round-trip contract
    (cached_clip_meta_parquet): values are computed here by decoding
    the generator's own blobs, so the engine's distributed decode +
    channel-stats must reproduce every int64 bit-exactly. This is the
    full-pixel-sum hash gate on the vendored JPEG decoder's OUTPUT
    (the PSNR gate bounds error; this one pins the exact pixels).
    Filename carries codec.DECODE_REV — see clip_meta."""
    path = os.path.join(
        FIXTURE_ROOT,
        f"image_stats_lossy_d{codec.DECODE_REV}_n{n}.parquet")
    if os.path.exists(path):
        return path
    tbl = images_table(n)
    fmts = tbl["fmt"].to_pylist()
    blobs = tbl["bytes"].to_pylist()
    ids = tbl["image_id"].to_pylist()
    keep, npx, rs, gs, bs, mins, maxs = [], [], [], [], [], [], []
    for i in range(n):
        if fmts[i] != "jpeg":
            continue
        img = codec.decode_image(blobs[i], fmts[i])
        px = img.astype(np.int64)
        keep.append(ids[i])
        npx.append(int(img.shape[0] * img.shape[1]))
        rs.append(int(px[:, :, 0].sum()))
        gs.append(int(px[:, :, 1].sum()))
        bs.append(int(px[:, :, 2].sum()))
        mins.append(int(px.min()))
        maxs.append(int(px.max()))
    return _atomic_parquet(pa.table({
        "image_id": pa.array(keep, pa.string()),
        "n_px": pa.array(npx, pa.int64()),
        "r_sum": pa.array(rs, pa.int64()),
        "g_sum": pa.array(gs, pa.int64()),
        "b_sum": pa.array(bs, pa.int64()),
        "px_min": pa.array(mins, pa.int64()),
        "px_max": pa.array(maxs, pa.int64()),
    }), path)


def cached_image_sharpness_parquet(n: int) -> str:
    """Per-image sharpness ground truth: integer 4-neighbor Laplacian
    sum-of-squares over the channel-sum luma of ground_truth_pixels
    (the variance-of-Laplacian blur signal, kept as exact int64 so the
    engine's decode + Laplacian stage must reproduce it bit-exactly on
    fmt='png' rows)."""
    path = os.path.join(FIXTURE_ROOT, f"image_sharp_n{n}.parquet")
    if os.path.exists(path):
        return path
    idx = np.arange(n, dtype=np.int64)
    ws = _SIZES[idx % 3]
    hs = _SIZES[(idx // 3) % 3]
    fmt = np.where(idx % 2 == 0, "png", "jpeg")
    nints, sums = [], []
    for i in idx:
        g = ground_truth_pixels(int(i), int(ws[i]), int(hs[i])
                                ).astype(np.int64).sum(axis=2)
        lap = (4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
               - g[1:-1, :-2] - g[1:-1, 2:])
        nints.append(int(lap.size))
        sums.append(int((lap * lap).sum()))
    return _atomic_parquet(pa.table({
        "image_id": pa.array([f"img-{i:09d}" for i in idx], pa.string()),
        "fmt": pa.array(fmt.tolist(), pa.string()),
        "n_interior": pa.array(nints, pa.int64()),
        "lap_sq_sum": pa.array(sums, pa.int64()),
    }), path)


SCENE_THRESH_Q = 54_000  # milli-units of mean |diff|; the fixture's
# frames are independent natural-spectrum images (round 4), so
# per-pair mad_q spreads 26.7k-94.4k with median ~53.9k; the
# near-median threshold exercises both classes while staying
# sensitive to exact integer reproduction


def cached_video_scene_parquet(n: int, n_frames: int = 12,
                               w: int = 16, h: int = 12) -> str:
    """Per-clip frame-differencing ground truth for the video fixture:
    for consecutive frame pairs, mad_q = (1000 * sum|a-b|) // (w*h*3)
    in exact int64; n_changes counts pairs with mad_q >= SCENE_THRESH_Q.
    Computed here from ground_truth_pixels — the QVID blocks are
    zlib-lossless, so the engine's decode must reproduce every value
    bit-exactly."""
    path = os.path.join(FIXTURE_ROOT,
                        f"video_scene_n{n}_f{n_frames}.parquet")
    if os.path.exists(path):
        return path
    denom = w * h * 3
    ids, chg, sums = [], [], []
    for i in range(n):
        frames = [ground_truth_pixels(i * 1000 + k, w, h).astype(np.int64)
                  for k in range(n_frames)]
        madqs = [int(1000 * np.abs(frames[k] - frames[k - 1]).sum())
                 // denom for k in range(1, n_frames)]
        ids.append(f"vid-{i:06d}")
        chg.append(sum(1 for m in madqs if m >= SCENE_THRESH_Q))
        sums.append(sum(madqs))
    return _atomic_parquet(pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "n_frames": pa.array(np.full(n, n_frames, np.int64), pa.int64()),
        "n_changes": pa.array(chg, pa.int64()),
        "mad_q_sum": pa.array(sums, pa.int64()),
    }), path)


def cached_thumb_stats_parquet(n: int, factor: int = 4) -> str:
    """Per-image THUMBNAIL ground truth: exact integer box-downsample
    of ground_truth_pixels by ``factor`` (block sums // factor^2 — the
    fixture sizes are all multiples of 4), then int64 channel sums of
    the thumbnail. PNG rows encode the source losslessly, so the
    engine's decode -> downsample -> (re-encode ->) stats chain must
    reproduce every value bit-exactly."""
    path = os.path.join(FIXTURE_ROOT, f"thumb_stats_n{n}_f{factor}.parquet")
    if os.path.exists(path):
        return path
    idx = np.arange(n, dtype=np.int64)
    ws = _SIZES[idx % 3]
    hs = _SIZES[(idx // 3) % 3]
    fmt = np.where(idx % 2 == 0, "png", "jpeg")
    tw, th, rs, gs, bs = [], [], [], [], []
    f2 = factor * factor
    for i in idx:
        img = ground_truth_pixels(int(i), int(ws[i]), int(hs[i]))
        h0, w0 = img.shape[0], img.shape[1]
        blk = (img.astype(np.int64)
               .reshape(h0 // factor, factor, w0 // factor, factor, 3)
               .sum(axis=(1, 3)) // f2)
        tw.append(int(w0 // factor))
        th.append(int(h0 // factor))
        rs.append(int(blk[:, :, 0].sum()))
        gs.append(int(blk[:, :, 1].sum()))
        bs.append(int(blk[:, :, 2].sum()))
    return _atomic_parquet(pa.table({
        "image_id": pa.array([f"img-{i:09d}" for i in idx], pa.string()),
        "fmt": pa.array(fmt.tolist(), pa.string()),
        "t_w": pa.array(tw, pa.int64()),
        "t_h": pa.array(th, pa.int64()),
        "tr_sum": pa.array(rs, pa.int64()),
        "tg_sum": pa.array(gs, pa.int64()),
        "tb_sum": pa.array(bs, pa.int64()),
    }), path)
