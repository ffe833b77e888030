"""Audio/video multimodal stages: WAV codec round-trip, DSP feature
sanity against the fixture's known tone frequencies, QVID frame seek,
and the explode-to-rows video sampling stage feeding the image decoder
unchanged."""

import numpy as np
import pyarrow as pa
import pytest

from osm2shp_ray.functions import codec
from osm2shp_ray.sources.fixtures import (audio_batch, ground_truth_pixels,
                                          video_batch)


def test_wav_roundtrip():
    x = (np.sin(np.arange(4000) / 10.0) * 20000).astype(np.int16)
    data = codec.encode_wav(x, rate=8000)
    y, rate = codec.decode_wav(data)
    assert rate == 8000 and np.array_equal(x, y)
    with pytest.raises(ValueError):
        codec.decode_wav(b"nope" + data)


def test_qvid_seek_decode():
    frames = np.stack([ground_truth_pixels(i, 8, 6) for i in range(5)])
    data = codec.encode_qvid(frames, fps=6)
    assert codec.qvid_info(data) == (8, 6, 6, 5)
    for k in (0, 3, 4):
        assert np.array_equal(codec.decode_qvid_frame(data, k), frames[k])
    with pytest.raises(IndexError):
        codec.decode_qvid_frame(data, 5)


def test_audio_features_match_known_tones(ray_session):
    import ray.data as rd
    from osm2shp_ray.stages.audio import audio_features
    t = audio_batch(np.arange(8))
    out = audio_features(rd.from_arrow(t), batch_size=4).to_pandas()
    assert out["audio_ok"].all()
    assert np.allclose(out["duration_s"], 0.5)
    # spectral centroid tracks the clip's fundamental (two-tone mix ->
    # centroid between f0 and 2*f0)
    assert ((out["spectral_centroid_hz"] > out["f0_hz"] * 0.8)
            & (out["spectral_centroid_hz"] < out["f0_hz"] * 2.6)).all()
    # corrupted payload -> ok=false row, stream survives
    bad = pa.table({"clip_id": pa.array(["x"]),
                    "bytes": pa.array([b"garbage"], pa.binary())})
    outb = audio_features(rd.from_arrow(bad)).to_pandas()
    assert len(outb) == 1 and not outb["audio_ok"].iloc[0]


def test_video_frame_sampling_feeds_image_decode(ray_session):
    import ray.data as rd
    from osm2shp_ray.stages.audio import sample_video_frames
    t = video_batch(np.arange(3), n_frames=12)
    frames = sample_video_frames(rd.from_arrow(t), every_n=5,
                                 id_cols=("clip_id",))
    df = frames.to_pandas()
    # 12 frames sampled every 5 -> indices 0, 5, 10 per clip
    assert sorted(df["frame_idx"].unique()) == [0, 5, 10]
    assert len(df) == 9
    # sampled frames decode through the ordinary image path and match
    # the deterministic ground truth
    row = df.iloc[0]
    img = codec.decode_image(row["bytes"], row["fmt"])
    clip_idx = int(row["clip_id"].rsplit("-", 1)[-1])
    assert np.array_equal(
        img, ground_truth_pixels(clip_idx * 1000 + row["frame_idx"], 16, 12))
