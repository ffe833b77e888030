"""Audio / video multimodal stages (SURVEY.md §2.8 'Multimodal
columns') — the same actor-pool map_batches contract as
stages/images.py, over opaque ``bytes`` columns.

Audio is REAL end-to-end: the engine ships a RIFF/WAVE PCM16 codec
(functions/codec.py — the format needs no external library) and the
features are honest DSP (RMS, zero-crossing rate, spectral centroid
via rfft). Video decode uses the QVID frame-container stand-in (real
codecs are absent from this container); the stage's Ray-side surface —
schema, per-frame seek, explode-to-rows layout, actor signature — is
real and tested, and swapping in a real demuxer touches only the two
codec calls.

Memory: batch_size x concurrency x max_payload must fit the worker
heap; video callers size batch_size DOWN (frames are the large side)
— the memory-aware-batching rule of SURVEY.md §4.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codec
from .images import _binary_views


class AudioFeatures:
    """WAV bytes -> per-clip feature columns: duration_s, rms, zcr
    (zero-crossing rate), spectral_centroid_hz. Failures surface as
    audio_ok=false rows (never abort the stream)."""

    def __init__(self, n_fft: int = 2048):
        self.n_fft = n_fft

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = _binary_views(batch["bytes"])
        n = len(blobs)
        ok = np.zeros(n, dtype=bool)
        dur = np.full(n, np.nan)
        rms = np.full(n, np.nan)
        zcr = np.full(n, np.nan)
        cent = np.full(n, np.nan)
        for i in range(n):
            try:
                samples, rate = codec.decode_wav(blobs[i])
            except Exception:
                continue
            ok[i] = True
            x = samples.astype(np.float64) / 32768.0
            dur[i] = len(x) / rate
            if len(x):
                rms[i] = float(np.sqrt(np.mean(x * x)))
                zcr[i] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                w = x[:self.n_fft]
                power = np.abs(np.fft.rfft(w, n=self.n_fft)) ** 2
                freqs = np.fft.rfftfreq(self.n_fft, d=1.0 / rate)
                denom = power.sum()  # power weighting: tonal peaks
                # dominate; a magnitude-weighted centroid drifts with
                # any broadband noise floor
                cent[i] = float((freqs * power).sum() / denom) if denom else 0.0
        out = batch.drop_columns(["bytes"])
        return (out
                .append_column("audio_ok", pa.array(ok, pa.bool_()))
                .append_column("duration_s", pa.array(dur, pa.float64()))
                .append_column("rms", pa.array(rms, pa.float64()))
                .append_column("zcr", pa.array(zcr, pa.float64()))
                .append_column("spectral_centroid_hz", pa.array(cent, pa.float64())))


class VideoFrameSample:
    """Video bytes -> EXPLODED rows, one per sampled frame
    (every ``every_n``-th): id columns ride along, plus frame_idx and
    the frame re-encoded as PNG bytes (so downstream image stages
    consume sampled frames unchanged). Seek-decodes only the sampled
    frames — never the whole clip."""

    def __init__(self, every_n: int = 30, id_cols: tuple = ("clip_id",)):
        self.every_n = every_n
        self.id_cols = list(id_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = _binary_views(batch["bytes"])
        id_vals = {c: batch[c].to_pylist() for c in self.id_cols
                   if c in batch.schema.names}
        out_ids: dict[str, list] = {c: [] for c in id_vals}
        out_idx: list[int] = []
        out_png: list[bytes] = []
        out_img_id: list[str] = []
        out_w: list[int] = []
        out_h: list[int] = []
        for i, blob in enumerate(blobs):
            try:
                w, h, _fps, nf = codec.qvid_info(blob)
            except Exception:
                continue
            base = (id_vals[self.id_cols[0]][i]
                    if self.id_cols and self.id_cols[0] in id_vals else str(i))
            for k in range(0, nf, self.every_n):
                frame = codec.decode_qvid_frame(blob, k)
                out_idx.append(k)
                out_png.append(codec.encode_png(frame))
                out_img_id.append(f"{base}#{k}")
                out_w.append(w)
                out_h.append(h)
                for c in out_ids:
                    out_ids[c].append(id_vals[c][i])
        # full image-row schema (input_hint shape): sampled frames feed
        # any downstream image stage unchanged. Id columns keep the
        # INPUT column's type — pa.array([]) would infer null and break
        # block concatenation when a batch yields zero frames
        cols: dict = {c: pa.array(v, type=batch[c].type)
                      for c, v in out_ids.items()}
        cols["frame_idx"] = pa.array(out_idx, pa.int64())
        cols["image_id"] = pa.array(out_img_id, pa.string())
        cols["bytes"] = pa.array(out_png, pa.binary())
        cols["w"] = pa.array(np.asarray(out_w, dtype=np.int32), pa.int32())
        cols["h"] = pa.array(np.asarray(out_h, dtype=np.int32), pa.int32())
        cols["fmt"] = pa.array(["png"] * len(out_png), pa.string())
        return pa.table(cols)


def audio_features(ds, concurrency=None, batch_size: int = 1024,
                   num_cpus: float = 1):
    """Same elastic-task default as decode_validate (fixed pools starve
    the read stage; pass ``concurrency`` to force an actor pool)."""
    if concurrency is not None:
        return ds.map_batches(AudioFeatures, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency,
                              num_cpus=num_cpus)
    return ds.map_batches(AudioFeatures(), batch_format="pyarrow",
                          batch_size=batch_size)


def sample_video_frames(ds, every_n: int = 30, id_cols=("clip_id",),
                        concurrency=None, batch_size: int = 64,
                        num_cpus: float = 1):
    """Small default batch_size: frames are the heavy side (memory-aware
    batching)."""
    if concurrency is not None:
        return ds.map_batches(
            VideoFrameSample, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=num_cpus,
            fn_constructor_kwargs=dict(every_n=every_n, id_cols=tuple(id_cols)))
    return ds.map_batches(VideoFrameSample(every_n=every_n,
                                           id_cols=tuple(id_cols)),
                          batch_format="pyarrow", batch_size=batch_size)


class SceneChanges:
    """QVID bytes -> per-clip frame-differencing stats: for every
    consecutive frame pair, the exact integer mean-abs-diff
    mad_q = (1000 * sum|a-b|) // (w*h*3); a pair with mad_q >=
    ``thresh_q`` is a scene change. The per-pair diff is one
    vectorized int64 reduce over the decoded arrays; payload bytes
    drop before any exchange. Decode failures surface as
    n_frames = 0 rows, never stream aborts."""

    def __init__(self, thresh_q: int):
        self.thresh_q = int(thresh_q)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import codec
        from ..stages.images import _binary_views
        blobs = _binary_views(batch["bytes"])
        n = len(blobs)
        nf = np.zeros(n, np.int64)
        chg = np.zeros(n, np.int64)
        sums = np.zeros(n, np.int64)
        for i in range(n):
            try:
                w, h, _fps, nfr = codec.qvid_info(blobs[i])
                denom = w * h * 3
                prev = None
                for k in range(nfr):
                    cur = codec.decode_qvid_frame(blobs[i], k) \
                        .astype(np.int64)
                    if prev is not None:
                        mad_q = int(1000 * np.abs(cur - prev).sum()) \
                            // denom
                        sums[i] += mad_q
                        chg[i] += int(mad_q >= self.thresh_q)
                    prev = cur
                nf[i] = nfr
            except Exception:
                continue
        drop = [c for c in ("bytes", "n_frames", "n_changes",
                            "mad_q_sum") if c in batch.column_names]
        out = batch.drop_columns(drop)
        return (out
                .append_column("n_frames", pa.array(nf, pa.int64()))
                .append_column("n_changes", pa.array(chg, pa.int64()))
                .append_column("mad_q_sum", pa.array(sums, pa.int64())))


def scene_changes(ds, thresh_q: int, concurrency=None,
                  batch_size: int = 64, num_cpus: float = 1.0):
    """Distributed per-clip scene-change detection over a QVID video
    table — stateless per-batch decode + integer frame differencing."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size,
                  num_cpus=num_cpus)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(SceneChanges(thresh_q), **kwargs)
