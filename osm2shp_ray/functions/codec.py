"""Image payload codecs (self-contained; no PIL/OpenCV in container).

The mandated input table carries opaque image ``bytes`` with ``fmt`` in
{"png", "jpeg"} and a per-row invariant: decoded pixels must match the
reference decode at PSNR >= 40 dB for lossy, exactly for lossless
(BASELINE.json input_hint). Since no image libraries exist in this
environment, the engine ships:

- a REAL minimal PNG codec (RGB8, all five scanline filters on decode,
  filter-0 on encode, zlib + CRC chunks) — lossless, spec-conformant
  for the subset it emits (readable by any PNG reader);
- a REAL baseline JPEG codec for "jpeg" rows (vendored ITU-T T.81
  implementation in functions/jpeg.py: 8x8 DCT, quality-scaled
  Annex K quantization, Annex K Huffman tables, JFIF markers,
  restart intervals; decode is a batch-lockstep vectorized Huffman
  decoder — see that module's doc). Round 4 replaced the earlier
  QJPG quantize+zlib stand-in, which survives as encode_qjpg /
  decode_qjpg for old blobs.

All codecs are deterministic and pure numpy/zlib.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QJPG_MAGIC = b"QJPG"
# Decode revision: bump whenever a decoder change may alter OUTPUT
# PIXELS (even by rint-boundary +-1), so decode-round-trip fixture
# side tables (fixtures.cached_clip_meta_parquet) regenerate with the
# decoder that the queries will run. rev 2 = round-4 float32 IDCT.
DECODE_REV = 2

_QSTEP = 6  # quantization step: RMSE ~= 6/sqrt(12) = 1.73 -> PSNR ~= 43.3 dB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, bit depth 8).
    ``filter_type`` selects the scanline filter for every row (0-4);
    all five are computed vectorized from the source pixels (the
    filters reference reconstructed bytes, which equal the source)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    if filter_type == 0:   # hot path: no predictor arrays needed
        raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
        raw[:, 1:] = img.reshape(h, w * 3)
        idat = zlib.compress(raw.tobytes(), 6)
        return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
                + _chunk(b"IEND", b""))
    flat = img.reshape(h, w * 3).astype(np.int32)
    left = np.zeros_like(flat)
    left[:, 3:] = flat[:, :-3]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    diag = np.zeros_like(flat)
    diag[1:, 3:] = flat[:-1, :-3]
    if filter_type == 1:
        filt = flat - left
    elif filter_type == 2:
        filt = flat - up
    elif filter_type == 3:
        filt = flat - (left + up) // 2
    elif filter_type == 4:
        p = left + up - diag
        pa_, pb_, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - diag)
        pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                        np.where(pb_ <= pc_, up, diag))
        filt = flat - pred
    else:
        raise ValueError(f"bad filter {filter_type}")
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = filter_type
    raw[:, 1:] = (filt & 0xFF).astype(np.uint8)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_dimensions(data) -> tuple[int, int, int, int]:
    """(w, h, bit_depth, color_type) from the IHDR chunk only — the
    PNG header-scan twin of jpeg.jpeg_dimensions (IHDR is mandated to
    be the first chunk, so this reads exactly 33 bytes)."""
    if bytes(data[:8]) != _PNG_SIG:
        raise ValueError("not a PNG")
    if bytes(data[12:16]) != b"IHDR":
        raise ValueError("IHDR not first")
    w, h, depth, ctype = struct.unpack(">IIBB", bytes(data[16:26]))
    return int(w), int(h), int(depth), int(ctype)


def image_meta_batch(blobs: list) -> dict:
    """Header-only metadata for a batch of image blobs: format sniffed
    from magic bytes, dimensions from the container header — NO pixel
    decode, no decompression. Returns dict of numpy/object arrays
    (fmt, w, h, detail) with fmt='' and w=h=-1 on parse failure
    (failures are data, the DecodeValidate contract). ``detail`` is
    the format-specific layout tag: chroma subsampling for JPEG,
    'rgb8'-style depth/type for PNG."""
    from . import jpeg as _jpeg

    n = len(blobs)
    fmts = np.empty(n, object)
    ws = np.full(n, -1, np.int64)
    hs = np.full(n, -1, np.int64)
    det = np.empty(n, object)
    for i, b in enumerate(blobs):
        try:
            head = bytes(b[:8])
            if head == _PNG_SIG:
                w, h, depth, ctype = png_dimensions(b)
                fmts[i], ws[i], hs[i] = "png", w, h
                kind = {0: "gray", 2: "rgb", 3: "pal", 4: "graya",
                        6: "rgba"}.get(ctype, f"ct{ctype}")
                det[i] = f"{kind}{depth}"
            elif head[:2] == b"\xff\xd8":
                w, h, sub = _jpeg.jpeg_dimensions(b)
                fmts[i], ws[i], hs[i], det[i] = "jpeg", w, h, sub
            elif head[:4] == _QJPG_MAGIC:
                w, h, step = struct.unpack(">IIB", bytes(b[4:13]))
                fmts[i], ws[i], hs[i] = "qjpg", w, h
                det[i] = f"q{step}"
            else:
                fmts[i], det[i] = "", ""
        except Exception:
            fmts[i], det[i] = "", ""
    return {"fmt": fmts, "w": ws, "h": hs, "detail": det}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. Supports 8-bit RGB, filters 0-4."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat_parts: list = []   # buffer-friendly: input may be a memoryview
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = bytes(data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or inter != 0:
                raise ValueError("unsupported PNG subset")
        elif tag == b"IDAT":
            idat_parts.append(payload)
        elif tag == b"IEND":
            break
    idat = idat_parts[0] if len(idat_parts) == 1 else b"".join(
        bytes(p) for p in idat_parts)
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = 1 + w * 3
    rows = raw.reshape(h, stride)
    # whole-image fast paths for uniform non-recursive filters (the
    # common encoder choices — our own fixture writer emits filter 0):
    # one vectorized op instead of a per-scanline Python loop
    ftypes = rows[:, 0]
    body = rows[:, 1:]
    if not ftypes.any():                               # all None
        return body.reshape(h, w, 3).copy()
    if (ftypes == 2).all():                            # all Up
        return ((np.cumsum(body, axis=0, dtype=np.int64) & 0xFF)
                .astype(np.uint8).reshape(h, w, 3))
    if (ftypes == 1).all():                            # all Sub
        return ((np.cumsum(body.reshape(h, w, 3), axis=1, dtype=np.int64)
                 & 0xFF).astype(np.uint8))
    out = np.zeros((h, w * 3), dtype=np.uint8)
    bpp = 3
    for r in range(h):
        ftype = rows[r, 0]
        line = rows[r, 1:].astype(np.int32)
        prior = out[r - 1].astype(np.int32) if r > 0 else np.zeros(w * 3, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up — fully vectorized
            rec = (line + prior) & 0xFF
        elif ftype == 1:  # Sub — rec[x] = sum of raw[0..x] per channel:
            # one cumulative sum along the pixel axis (mod 256 at the end
            # is exact: the int64 cumsum never overflows a scanline)
            rec = (np.cumsum(line.reshape(w, bpp), axis=0, dtype=np.int64)
                   .reshape(-1) & 0xFF).astype(np.int32)
        elif ftype == 3:  # Average — left-recursive; loop over PIXELS
            # with the 3 channels as one vector op per step (w iters,
            # not w*3)
            rec2 = np.empty((w, bpp), dtype=np.int32)
            l2 = line.reshape(w, bpp)
            p2 = prior.reshape(w, bpp)
            a = np.zeros(bpp, dtype=np.int32)
            for xcol in range(w):
                a = (l2[xcol] + (a + p2[xcol]) // 2) & 0xFF
                rec2[xcol] = a
            rec = rec2.reshape(-1)
        elif ftype == 4:  # Paeth — left-recursive; per-pixel loop,
            # channels vectorized
            rec2 = np.empty((w, bpp), dtype=np.int32)
            l2 = line.reshape(w, bpp)
            p2 = prior.reshape(w, bpp)
            a = np.zeros(bpp, dtype=np.int32)
            cdiag = np.zeros(bpp, dtype=np.int32)
            for xcol in range(w):
                bvec = p2[xcol]
                p = a + bvec - cdiag
                pa_, pb_, pc_ = np.abs(p - a), np.abs(p - bvec), np.abs(p - cdiag)
                pred = np.where((pa_ <= pb_) & (pa_ <= pc_), a,
                                np.where(pb_ <= pc_, bvec, cdiag))
                a = (l2[xcol] + pred) & 0xFF
                rec2[xcol] = a
                cdiag = bvec
            rec = rec2.reshape(-1)
        else:
            raise ValueError(f"bad filter {ftype}")
        out[r] = rec.astype(np.uint8)
    return out.reshape(h, w, 3)


JPEG_QUALITY = 97  # PSNR >= 44.0 dB measured over 2000 fixture-shaped
# images (min/p1/median 44.0/44.2/44.6) — the >= 40 dB gate passes
# with 4 dB of margin at half the entropy-decode cost of q99


def encode_lossy(img: np.ndarray) -> bytes:
    """"jpeg" rows: REAL baseline JPEG (the vendored ITU-T T.81 codec,
    functions/jpeg.py — round 4 replaced the QJPG quantize+zlib
    stand-in). JFIF bytes readable by any standard decoder."""
    from . import jpeg as _jpeg
    return _jpeg.encode_jpeg(img, quality=JPEG_QUALITY)


def decode_lossy(data) -> np.ndarray:
    """Lossy decode, dispatched on magic: real JPEG (SOI) or the
    legacy QJPG container (kept so pre-round-4 fixture blobs and the
    qjpg fmt tag keep decoding)."""
    if bytes(data[:2]) == b"\xff\xd8":
        from . import jpeg as _jpeg
        return _jpeg.decode_jpeg(data)
    return decode_qjpg(data)


def encode_qjpg(img: np.ndarray) -> bytes:
    """Legacy deterministic lossy stand-in: quantize to step _QSTEP
    then zlib. NOT a real JPEG (pre-round-4 'jpeg' rows used this)."""
    h, w, c = img.shape
    q = np.clip(np.rint(img.astype(np.float64) / _QSTEP), 0, 255 // _QSTEP).astype(np.uint8)
    payload = zlib.compress(q.tobytes(), 6)
    return _QJPG_MAGIC + struct.pack(">IIB", w, h, _QSTEP) + payload


def decode_qjpg(data) -> np.ndarray:
    if bytes(data[:4]) != _QJPG_MAGIC:
        raise ValueError("not a QJPG payload")
    w, h, step = struct.unpack(">IIB", data[4:13])
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    img = np.clip(q.astype(np.int32) * step, 0, 255).astype(np.uint8)
    return img.reshape(h, w, 3)


def decode_image(data, fmt: str) -> np.ndarray:
    """Format-dispatched decode (sources S1/S2 analog: one reader API,
    format plurality behind it — SURVEY.md §2.1)."""
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg", "qjpg"):
        return decode_lossy(data)
    raise NotImplementedError(
        f"format {fmt!r}: real decoders for this format are not available "
        "in this container; plug one in here")


def decode_images_batch(blobs: list, fmts: list) -> list:
    """Batch decode: JPEG rows run through the lockstep vectorized
    T.81 decoder in ONE call (functions/jpeg.py module doc — batching
    is where its throughput comes from); PNG/QJPG rows decode per row.
    Returns one (h, w, 3) uint8 array per input, None on failure."""
    n = len(blobs)
    out: list = [None] * n
    jpeg_ix = [i for i in range(n)
               if fmts[i] in ("jpeg", "jpg", "qjpg")
               and bytes(blobs[i][:2]) == b"\xff\xd8"]
    if jpeg_ix:
        from . import jpeg as _jpeg
        dec = _jpeg.decode_jpeg_batch([blobs[i] for i in jpeg_ix])
        for j, i in enumerate(jpeg_ix):
            out[i] = dec[j]
    rest = set(range(n)) - set(jpeg_ix)
    for i in rest:
        try:
            out[i] = decode_image(blobs[i], fmts[i])
        except Exception:
            pass
    return out


# ------------------------------------------------------------- audio
# REAL RIFF/WAVE PCM16 codec (the format is pure struct + samples; no
# external codec needed, unlike compressed audio)

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """1-D int16 samples -> mono PCM16 WAV bytes."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples, rate). Mono PCM16 subset."""
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        tag = bytes(data[pos:pos + 4])
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if tag == b"fmt ":
            afmt, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[pos + 8:pos + 24])
            if afmt != 1 or ch != 1 or bits != 16:
                raise ValueError("unsupported WAV subset")
        elif tag == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=ln // 2,
                                    offset=pos + 8)
        pos += 8 + ln + (ln & 1)
    if rate is None or samples is None:
        raise ValueError("truncated WAV")
    return samples, rate


# ------------------------------------------------------------- video
# Deterministic frame-container stand-in ("QVID"): per-frame zlib
# blocks behind a length table, so sampling frame k decompresses ONLY
# frame k (the seek property real containers provide). NOT a real
# video codec — swap encode/decode for one in production; the Ray-side
# stage contract (stages/audio.py VideoFrameSample) is what's real.

_QVID_MAGIC = b"QVID"


def encode_qvid(frames: np.ndarray, fps: int = 30) -> bytes:
    """(n, h, w, 3) uint8 -> QVID bytes."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    blocks = [zlib.compress(frames[i].tobytes(), 1) for i in range(n)]
    head = _QVID_MAGIC + struct.pack(">IIHI", w, h, fps, n)
    table = struct.pack(f">{n}I", *(len(b) for b in blocks))
    return head + table + b"".join(blocks)


def qvid_info(data) -> tuple[int, int, int, int]:
    """-> (w, h, fps, n_frames) without touching frame data."""
    if bytes(data[:4]) != _QVID_MAGIC:
        raise ValueError("not a QVID payload")
    return struct.unpack(">IIHI", data[4:18])


def decode_qvid_frame(data, idx: int) -> np.ndarray:
    """Seek-decode ONE frame -> (h, w, 3) uint8."""
    w, h, _fps, n = qvid_info(data)
    if not 0 <= idx < n:
        raise IndexError(idx)
    lens = struct.unpack(f">{n}I", data[18:18 + 4 * n])
    off = 18 + 4 * n + sum(lens[:idx])
    raw = zlib.decompress(data[off:off + lens[idx]])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def resize_box(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Box-filter (area-average) resize, vectorized. Multimodal
    feature-extraction stage helper (SURVEY.md §2.8)."""
    h, w, c = img.shape
    ys = (np.arange(out_h + 1) * h // out_h)
    xs = (np.arange(out_w + 1) * w // out_w)
    integral = np.zeros((h + 1, w + 1, c), dtype=np.float64)
    integral[1:, 1:] = np.cumsum(np.cumsum(img.astype(np.float64), axis=0), axis=1)
    y0, y1 = ys[:-1][:, None], ys[1:][:, None]
    x0, x1 = xs[:-1][None, :], xs[1:][None, :]
    area = ((y1 - y0) * (x1 - x0))[..., None]
    s = (integral[y1, x1] - integral[y0, x1] - integral[y1, x0] + integral[y0, x0])
    return np.clip(np.rint(s / area), 0, 255).astype(np.uint8)
