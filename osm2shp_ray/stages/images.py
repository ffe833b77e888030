"""Multimodal (image payload) stages — actor-pool map_batches over the
opaque ``bytes`` column (SURVEY.md §2.8 'Multimodal columns').

Decode is per-row by nature (each blob is an independent compressed
stream); the vectorization lives inside the codec kernels and in
batching: one actor call decodes ``batch_size`` images, amortizing
actor dispatch. Memory: batch_size x concurrency x max_image_bytes
must fit the worker heap — callers size batch_size down for large
payloads (SURVEY.md §4 'Memory-aware').

The PSNR>=40dB + caption-equality invariant (BASELINE.json input_hint)
is checked against ground truth re-derived from the deterministic
fixture seed — nothing but the mandated columns rides the pipeline.

Audio / video stages live in stages/audio.py (real WAV codec + DSP;
video frame sampling over a seekable frame-container stand-in).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codec


def _binary_views(col) -> list:
    """Zero-copy memoryview per blob (to_pylist would copy the whole
    payload column into Python bytes; zlib/struct accept buffers)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        return col.to_pylist()
    import numpy as _np
    bufs = col.buffers()
    # cast to unsigned bytes: Arrow buffers expose format 'b' (signed),
    # under which memoryview==bytes comparisons of high bytes fail
    buf = memoryview(bufs[2]).cast("B")
    # offsets buffer (int32 for binary); account for the array's offset
    offs = _np.frombuffer(bufs[1], dtype=_np.int32,
                          count=len(col) + 1, offset=col.offset * 4)
    return [buf[offs[i]:offs[i + 1]] for i in range(len(col))]


class DecodeValidate:
    """bytes -> decoded stats + invariant columns.

    Emits per row: ok (decode succeeded), psnr_db (vs ground truth when
    derivable, else NaN), mean_lum. Decode failures do not abort the
    stream — they surface as ok=false rows (the reference instead
    aborts on any error, osm2shp.cc:20-23; at 10^12 rows that is not an
    option, so failures become data)."""

    def __init__(self, check_ground_truth: bool = True):
        self.check_ground_truth = check_ground_truth
        if check_ground_truth:
            from ..sources.fixtures import ground_truth_pixels
            self._gt = ground_truth_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = _binary_views(batch["bytes"])
        fmts = batch["fmt"].to_pylist()
        ids = batch["image_id"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        n = len(blobs)
        ok = np.zeros(n, dtype=bool)
        psnr = np.full(n, np.nan)
        mean_lum = np.full(n, np.nan)
        imgs = codec.decode_images_batch(blobs, fmts)
        for i in range(n):
            img = imgs[i]
            if img is None:
                continue
            ok[i] = img.shape == (hs[i], ws[i], 3)
            mean_lum[i] = float(img.mean())
            if self.check_ground_truth and ok[i]:
                row_idx = int(ids[i].rsplit("-", 1)[-1]) if ids[i].rsplit("-", 1)[-1].isdigit() else None
                if row_idx is not None:
                    gt = self._gt(row_idx, ws[i], hs[i])
                    psnr[i] = codec.psnr(gt, img)
        out = batch.drop_columns(["bytes"])
        return (out
                .append_column("decode_ok", pa.array(ok, pa.bool_()))
                .append_column("psnr_db", pa.array(psnr, pa.float64()))
                .append_column("mean_lum", pa.array(mean_lum, pa.float64())))


def meta_scan_batch(batch: pa.Table) -> pa.Table:
    """Header-only metadata scan over the image table: format sniffed
    from magic bytes, dimensions/layout parsed from the container
    header (PNG IHDR / JFIF SOF0 / QJPG) — NO pixel decode, no
    inflate. This is the cheap first pass of a 100-TB image pipeline:
    filter by dimensions/format/subsampling BEFORE paying a decode,
    reading a few hundred bytes per blob instead of all of them.
    Parse failures surface as fmt='' rows (failures are data, the
    DecodeValidate contract; the reference instead aborts,
    /root/reference/osm2shp.cc:20-23)."""
    blobs = _binary_views(batch["bytes"])
    meta = codec.image_meta_batch(blobs)
    out = batch.drop_columns(["bytes"])
    return (out.append_column("fmt", pa.array(meta["fmt"], pa.string()))
            .append_column("w", pa.array(meta["w"], pa.int64()))
            .append_column("h", pa.array(meta["h"], pa.int64()))
            .append_column("detail", pa.array(meta["detail"],
                                              pa.string())))


def meta_scan(ds, batch_size: int = 2048):
    """Dataset wrapper of meta_scan_batch (stateless elastic tasks —
    header parsing needs no per-actor setup)."""
    return ds.map_batches(meta_scan_batch, batch_format="pyarrow",
                          batch_size=batch_size)


class ImageFeatures:
    """bytes -> compact feature vector: 4x4 box-resized RGB thumbnail
    (48 dims, [0,1]) — the decode/resize/feature-extract actor stage
    shape for embedding-style pipelines."""

    def __init__(self, thumb: int = 4):
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = _binary_views(batch["bytes"])
        fmts = batch["fmt"].to_pylist()
        n = len(blobs)
        dim = self.thumb * self.thumb * 3
        feats = np.zeros((n, dim), dtype=np.float32)
        imgs = codec.decode_images_batch(blobs, fmts)
        for i in range(n):
            img = imgs[i]
            if img is None:
                continue
            feats[i] = (codec.resize_box(img, self.thumb, self.thumb)
                        .astype(np.float32).reshape(-1) / 255.0)
        out = batch.drop_columns(["bytes"])
        flat = pa.array(feats.reshape(-1), pa.float32())
        offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32), pa.int32())
        return out.append_column("features", pa.ListArray.from_arrays(offs, flat))


def decode_validate(ds, concurrency=None, batch_size: int = 1024,
                    check_ground_truth: bool = True, num_cpus: float = 1):
    """Default: INSTANCE-as-function -> stateless elastic tasks. The
    instance is cloudpickled once into the task spec and cached per
    worker process, so per-worker setup is amortized WITHOUT reserving
    CPUs the way an actor pool does (a fixed pool starves the read
    stage; an autoscaling pool ramps too slowly — both measured on the
    32-CPU bench). Pass ``concurrency`` to force an actor pool (needed
    only when setup is too heavy for per-worker init, e.g. GPU model
    load)."""
    if concurrency is not None:
        return ds.map_batches(DecodeValidate, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency,
                              num_cpus=num_cpus,
                              fn_constructor_kwargs=dict(check_ground_truth=check_ground_truth))
    fn = DecodeValidate(check_ground_truth=check_ground_truth)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def image_features(ds, concurrency=None, batch_size: int = 1024, thumb: int = 4,
                   num_cpus: float = 1):
    if concurrency is not None:
        return ds.map_batches(ImageFeatures, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency,
                              num_cpus=num_cpus,
                              fn_constructor_kwargs=dict(thumb=thumb))
    return ds.map_batches(ImageFeatures(thumb=thumb), batch_format="pyarrow",
                          batch_size=batch_size)


# Audio / video stages live in stages/audio.py: AudioFeatures is real
# end-to-end (RIFF/WAVE PCM16 codec + DSP features); VideoFrameSample
# seek-decodes sampled frames from the QVID frame-container stand-in.


class CaptionImageScore:
    """Caption-image consistency score — the CLIP-score curation gate
    (drop pairs whose caption doesn't match the image) with a
    DETERMINISTIC stand-in joint encoder, so the whole stage is
    oracle-checkable; a real deployment swaps the two embed steps for
    a learned model and keeps the stage shape (actor pool via
    ``concurrency=``, batch-sized decode, payload dropped on output).

    Image side: decode -> 2x2 box-resize quadrant means / 255
    (12-dim float64 — ground-truth-reproducible from the fixture side
    table). Caption side: each token's 60-bit md5 hash sliced into
    twelve 5-bit signed integer features (SQL-expressible bit
    arithmetic). Score: cosine, accumulated in the SQL expression's
    left-associative order so both engines agree to the ulp.

    Emits (image_id, clip_score: float64); rows whose image fails to
    decode or whose caption has no tokens are dropped (they carry no
    evidence — the SQL inner-join semantics).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_hash60
        from .text import _token_rows

        n = batch.num_rows
        blobs = _binary_views(batch["bytes"])
        fmts = batch["fmt"].to_pylist()
        m = np.full((n, 12), np.nan)
        imgs = codec.decode_images_batch(blobs, fmts)
        for i in range(n):
            img = imgs[i]
            if img is None:
                continue
            m[i] = (codec.resize_box(img, 2, 2).astype(np.float64)
                    .reshape(-1) / 255.0)

        cap = np.zeros((n, 12), dtype=np.int64)
        long = _token_rows(batch["caption"])
        if long.height:
            h = md5_hash60(long["tok"].to_numpy())
            feats = (((h[:, None] >> (5 * np.arange(12))) & 31) * 2 - 31)
            np.add.at(cap, long["i"].to_numpy(), feats)
        has_tok = np.zeros(n, dtype=bool)
        if long.height:
            has_tok[np.unique(long["i"].to_numpy())] = True

        capf = cap.astype(np.float64)
        dot = m[:, 0] * capf[:, 0]
        na = m[:, 0] * m[:, 0]
        nb = cap[:, 0] * cap[:, 0]
        for d in range(1, 12):
            dot = dot + m[:, d] * capf[:, d]
            na = na + m[:, d] * m[:, d]
            nb = nb + cap[:, d] * cap[:, d]
        keep = has_tok & ~np.isnan(m[:, 0]) & (nb > 0)
        score = np.where(keep, dot / (np.sqrt(na) * np.sqrt(nb.astype(np.float64))), np.nan)
        idc = (batch["image_id"].combine_chunks()
               if isinstance(batch["image_id"], pa.ChunkedArray)
               else batch["image_id"])
        sel = np.flatnonzero(keep)
        return pa.table({
            "image_id": idc.take(pa.array(sel, pa.int64())),
            "clip_score": pa.array(score[sel], pa.float64())})


def caption_image_score(ds, concurrency=None, batch_size: int = 512,
                        num_cpus: float = 1):
    """Stage wrapper (decode_validate pattern): instance-as-function
    elastic tasks by default; pass ``concurrency`` for an actor pool
    when the encoder warrants per-actor setup."""
    if concurrency is not None:
        return ds.map_batches(CaptionImageScore, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency,
                              num_cpus=num_cpus)
    return ds.map_batches(CaptionImageScore(), batch_format="pyarrow",
                          batch_size=batch_size)


class ChannelStats:
    """bytes -> exact per-image channel statistics: int64 R/G/B sums,
    global pixel min/max, pixel count. The per-channel reduce is one
    numpy sum over the decoded array (no Python pixel loops); decode
    failures surface as n_px = 0 rows, never as stream aborts. On
    losslessly-coded rows (PNG) every value equals the generator-side
    ground truth of the source pixels — the decode-correctness gate
    the reference gets implicitly from feeding decoded data onward
    (/root/reference/osm2shp.cc:20-23 aborts on any decode error)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = _binary_views(batch["bytes"])
        fmts = batch["fmt"].to_pylist()
        n = len(blobs)
        npx = np.zeros(n, np.int64)
        sums = np.zeros((n, 3), np.int64)
        mins = np.zeros(n, np.int64)
        maxs = np.zeros(n, np.int64)
        imgs = codec.decode_images_batch(blobs, fmts)
        for i in range(n):
            img = imgs[i]
            if img is None:
                continue
            npx[i] = img.shape[0] * img.shape[1]
            sums[i] = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            mins[i] = int(img.min())
            maxs[i] = int(img.max())
        out = batch.drop_columns(["bytes"])
        return (out
                .append_column("n_px", pa.array(npx, pa.int64()))
                .append_column("r_sum", pa.array(sums[:, 0], pa.int64()))
                .append_column("g_sum", pa.array(sums[:, 1], pa.int64()))
                .append_column("b_sum", pa.array(sums[:, 2], pa.int64()))
                .append_column("px_min", pa.array(mins, pa.int64()))
                .append_column("px_max", pa.array(maxs, pa.int64())))


def channel_stats(ds, concurrency=None, batch_size: int = 1024,
                  num_cpus: float = 1.0):
    """Distributed exact channel statistics over an image table —
    stateless per-batch decode+reduce; payload bytes drop before any
    downstream exchange."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size,
                  num_cpus=num_cpus)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(ChannelStats(), **kwargs)


class Sharpness:
    """bytes -> integer blur/sharpness signal: the 4-neighbor
    Laplacian sum-of-squares over the channel-sum luma (the classic
    variance-of-Laplacian focus measure, kept in exact int64 — luma
    <= 765, |lap| <= 3060, so a 64x64 interior sums far below 2^63).
    One vectorized stencil per image, no Python pixel loops; decode
    failures surface as n_interior = 0 rows. On lossless rows the
    value equals the generator-side ground truth of the source
    pixels (the same decode-correctness gate as ChannelStats)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = _binary_views(batch["bytes"])
        fmts = batch["fmt"].to_pylist()
        n = len(blobs)
        nints = np.zeros(n, np.int64)
        sums = np.zeros(n, np.int64)
        imgs = codec.decode_images_batch(blobs, fmts)
        for i in range(n):
            img = imgs[i]
            if img is None:
                continue
            g = img.astype(np.int64).sum(axis=2)
            lap = (4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
                   - g[1:-1, :-2] - g[1:-1, 2:])
            nints[i] = lap.size
            sums[i] = int((lap * lap).sum())
        out = batch.drop_columns(["bytes"])
        return (out
                .append_column("n_interior", pa.array(nints, pa.int64()))
                .append_column("lap_sq_sum", pa.array(sums, pa.int64())))


def sharpness(ds, concurrency=None, batch_size: int = 1024,
              num_cpus: float = 1.0):
    """Distributed sharpness scoring over an image table — stateless
    per-batch decode+stencil; payload bytes drop before any
    downstream exchange."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size,
                  num_cpus=num_cpus)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(Sharpness(), **kwargs)


class Thumbnail:
    """bytes -> thumbnail: exact integer box-downsample by ``factor``
    (non-overlapping factor x factor block means, sums // factor^2 —
    truncating division so the result is reproducible as pure integer
    math), re-encoded as PNG. Emits the thumbnail payload plus exact
    int64 channel sums and dims; images whose dimensions are not
    multiples of ``factor`` crop the ragged right/bottom edge first
    (documented; the fixture sizes divide evenly so nothing crops
    there). Decode failures surface as t_w = 0 rows, never stream
    aborts.

    The resize path every multimodal pipeline needs (training-set
    thumbnailing, pyramid levels); runs as stateless map_batches
    tasks or an actor pool via ``thumbnails()``.
    """

    def __init__(self, factor: int = 4):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        f = self.factor
        f2 = f * f
        blobs = _binary_views(batch["bytes"])
        fmts = batch["fmt"].to_pylist()
        n = len(blobs)
        tw = np.zeros(n, np.int64)
        th = np.zeros(n, np.int64)
        sums = np.zeros((n, 3), np.int64)
        thumbs: list[bytes | None] = [None] * n
        imgs = codec.decode_images_batch(blobs, fmts)
        for i in range(n):
            img = imgs[i]
            if img is None:
                continue
            h0 = (img.shape[0] // f) * f
            w0 = (img.shape[1] // f) * f
            if h0 == 0 or w0 == 0:
                continue
            blk = (img[:h0, :w0].astype(np.int64)
                   .reshape(h0 // f, f, w0 // f, f, 3)
                   .sum(axis=(1, 3)) // f2)
            tw[i] = w0 // f
            th[i] = h0 // f
            sums[i] = blk.reshape(-1, 3).sum(axis=0)
            thumbs[i] = codec.encode_png(blk.astype(np.uint8))
        out = batch.drop_columns(["bytes"])
        return (out
                .append_column("thumb", pa.array(thumbs, pa.binary()))
                .append_column("t_w", pa.array(tw, pa.int64()))
                .append_column("t_h", pa.array(th, pa.int64()))
                .append_column("tr_sum", pa.array(sums[:, 0], pa.int64()))
                .append_column("tg_sum", pa.array(sums[:, 1], pa.int64()))
                .append_column("tb_sum", pa.array(sums[:, 2], pa.int64())))


def thumbnails(ds, factor: int = 4, concurrency=None,
               batch_size: int = 512, num_cpus: float = 1.0):
    """Distributed thumbnail generation — small batches keep
    payload x concurrency inside worker heaps (binary columns)."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size,
                  num_cpus=num_cpus)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(Thumbnail(factor), **kwargs)
