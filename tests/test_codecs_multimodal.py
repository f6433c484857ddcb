"""Real media codecs (functions/codecs.py) + the multimodal stages that
use them: PNG round-trips across all five scanline filters, WAV PCM
round-trips, real decode features, real nearest-neighbour resize, and
the honest video stub."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_core_ray.functions.codecs import (
    decode_png,
    decode_wav,
    decode_y4m,
    encode_png,
    encode_wav,
    encode_y4m,
)
from search_engine_core_ray.stages.multimodal import (
    DecodeAudio,
    DecodeImage,
    ResizeImage,
    SampleFrames,
    synth_media_table,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(5, 7), (8, 3, 3), (4, 6, 4), (1, 1)])
def test_png_round_trip(filter_type, shape):
    rng = np.random.RandomState(filter_type * 100 + len(shape))
    img = rng.randint(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img, filter_type=filter_type))
    want = img if img.ndim == 3 else img[:, :, None]
    assert np.array_equal(back, want)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_wav_round_trip_mono_and_stereo():
    s = (np.sin(np.linspace(0, 100, 2000)) * 15000).astype(np.int16)
    back, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and np.array_equal(back[:, 0], s)
    st = np.column_stack([s, -s])
    back2, rate2 = decode_wav(encode_wav(st, 16000))
    assert rate2 == 16000 and np.array_equal(back2, st)


def test_decode_image_real_features():
    img = np.zeros((10, 20, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # pure red
    t = pa.table(
        {"media_id": pa.array([7], pa.int64()),
         "payload": pa.array([encode_png(img)], pa.binary())}
    )
    out = DecodeImage()(t)
    f = out.column("feature")[0].as_py()
    assert len(f) == DecodeImage.FEATURE_DIM
    assert f[0] == 20.0 and f[1] == 10.0 and f[2] == 3.0  # w, h, channels
    assert f[3] == pytest.approx(1.0)   # mean R
    assert f[4] == pytest.approx(0.0)   # mean G
    # uniform image: zero luminance std, uniform 3x3 grid
    assert f[6] == pytest.approx(0.0)
    assert all(g == pytest.approx(255 / 3 / 255.0) for g in f[7:])


def test_decode_audio_real_features():
    rate = 8000
    t_axis = np.arange(rate)  # exactly 1 s
    sig = (np.sin(2 * np.pi * 440 * t_axis / rate) * 16000).astype(np.int16)
    t = pa.table(
        {"media_id": pa.array([1], pa.int64()),
         "payload": pa.array([encode_wav(sig, rate)], pa.binary())}
    )
    f = DecodeAudio()(t).column("feature")[0].as_py()
    assert len(f) == DecodeAudio.FEATURE_DIM
    assert f[0] == pytest.approx(1.0)           # duration s
    assert f[1] == pytest.approx(8.0)           # rate kHz
    assert f[2] == 1.0                           # channels
    assert f[3] == pytest.approx(16000 / 32768 / np.sqrt(2), rel=1e-3)  # rms
    # 440 Hz of a 0-4 kHz spectrum lands in band 1 of 11
    bands = f[5:]
    assert int(np.argmax(bands)) == 1
    assert sum(bands) == pytest.approx(1.0, rel=1e-5)


def test_resize_image_real():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(30, 40, 3), dtype=np.uint8)
    t = synth_media_table(3, seed=4)
    t = t.set_column(
        t.schema.get_field_index("payload"), "payload",
        pa.array([encode_png(img)] * 3, pa.binary()),
    )
    out = ResizeImage(target=(8, 6))(t)
    for p in out.column("payload").to_pylist():
        back = decode_png(p)
        assert back.shape == (6, 8, 3)
    assert out.column("width").to_pylist() == [8, 8, 8]
    assert out.column("height").to_pylist() == [6, 6, 6]
    # nearest-neighbour: every output pixel exists in the source
    src_px = {tuple(v) for v in img.reshape(-1, 3).tolist()}
    assert all(
        tuple(v) in src_px
        for v in decode_png(out.column("payload")[0].as_py()).reshape(-1, 3).tolist()
    )


def test_synth_media_payloads_really_decode():
    t = synth_media_table(12, seed=9)
    for kind, payload in zip(
        t.column("kind").to_pylist(), t.column("payload").to_pylist()
    ):
        if kind == "image":
            img = decode_png(payload)
            assert img.ndim == 3 and img.shape[2] == 3
        elif kind == "audio":
            s, rate = decode_wav(payload)
            assert rate == 8000 and len(s) > 0
        else:
            frames, meta = decode_y4m(payload)
            assert frames.ndim == 4 and frames.shape[3] == 3
            assert meta["width"] == frames.shape[2]


def test_y4m_roundtrip_c444_exact_and_c420_luma_exact():
    rng = np.random.RandomState(3)
    f = rng.randint(0, 256, (5, 16, 20, 3), dtype=np.uint8)
    dec, meta = decode_y4m(encode_y4m(f, fps=(30, 1), chroma="444"))
    assert (dec == f).all() and meta["fps"] == (30, 1)
    dec2, meta2 = decode_y4m(encode_y4m(f, chroma="420jpeg"))
    assert (dec2[:, :, :, 0] == f[:, :, :, 0]).all()  # luma lossless
    assert dec2.shape == f.shape and meta2["chroma"] == "420jpeg"
    # 2x2-mean chroma survives within rounding of the downsample
    u = f[:, :, :, 1].reshape(5, 8, 2, 10, 2).mean(axis=(2, 4))
    got_u = dec2[:, ::2, ::2, 1].astype(np.float64)
    assert np.abs(got_u - u).max() <= 0.5


def test_y4m_rejects_garbage():
    with pytest.raises(ValueError):
        decode_y4m(b"not a stream")
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + b"\x00" * 7)  # truncated


def test_video_frames_really_decode():
    t = synth_media_table(6, seed=2)
    vids = t.filter(pa.compute.equal(t.column("kind"), "video"))
    out = SampleFrames(n_frames=3)(vids)
    assert out.num_rows > 0
    assert set(out.column("media_id").to_pylist()) == set(
        vids.column("media_id").to_pylist()
    )
    # features match a direct decode of the first clip's first frame
    payload = vids.column("payload")[0].as_py()
    frames, _ = decode_y4m(payload)
    first = out.filter(
        pa.compute.and_(
            pa.compute.equal(out.column("media_id"), vids.column("media_id")[0]),
            pa.compute.equal(out.column("frame_idx"), 0),
        )
    )
    assert first.num_rows == 1
    assert first.column("y_mean")[0].as_py() == float(
        frames[0, :, :, 0].astype(np.float64).mean()
    )
    # offsets increase with frame index
    offs = out.column("frame_offset_ms").to_pylist()
    idxs = out.column("frame_idx").to_pylist()
    assert all(
        o2 >= o1
        for (i1, o1), (i2, o2) in zip(
            sorted(zip(idxs, offs)), sorted(zip(idxs, offs))[1:]
        )
    )


def test_video_fake_path_offsets_only():
    t = synth_media_table(3, seed=2)
    out = SampleFrames(n_frames=2, fake=True)(t)
    assert out.num_rows == 6
    assert out.schema.names == ["media_id", "frame_offset_ms"]


def test_fake_paths_still_work():
    t = synth_media_table(6, seed=5)
    out = DecodeImage(fake=True)(t)
    assert out.num_rows == 6
    out2 = ResizeImage(fake=True)(t)
    assert out2.column("width").to_pylist() == [64] * 6
