"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.

Codec status: the container has no PIL/ffmpeg, but PNG, 16-bit PCM
WAV and YUV4MPEG2 (y4m) are decodable with numpy + the standard
library, so image, audio AND video stages run a REAL decode by default
(``functions/codecs.py`` — zlib-inflated, filter-reconstructed PNG
scanlines; ``wave``-module PCM; plain-header uncompressed planar y4m
frames). The synthetic media table generates real PNG/WAV/Y4M
payloads so every decode path is exercised end to end.  ``fake=True``
on each stage keeps the old deterministic plumbing-only stubs.
Compressed video containers (mp4 etc.) stay out of scope — no stdlib
entropy decoder exists — but the per-frame sampling, decode and
feature plumbing below is the real shape a codec actor would slot
into.

Scale notes: binary payloads are large, so these stages must run with
small ``batch_size`` (payload_bytes * batch_size * concurrency bounded
by worker heap) and ``batch_format="pyarrow"`` (binary columns don't
round-trip pandas cleanly).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.codecs import (
    decode_png,
    decode_wav,
    decode_y4m,
    encode_png,
    encode_wav,
    encode_y4m,
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),          # -1 when unknown
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media rows with REAL payloads: gradient+noise RGB
    PNGs (decodable by DecodeImage), sine-mix 16-bit WAVs (decodable by
    DecodeAudio) and moving-gradient YUV4MPEG2 clips (decodable by
    SampleFrames) — alternating C444/C420jpeg chroma so both decoder
    paths are exercised."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w = int(rng.randint(8, 48))
            h = int(rng.randint(8, 48))
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                    (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                    rng.randint(0, 256, size=(h, w), dtype=np.uint8),
                ],
                axis=2,
            )
            payload = encode_png(img, filter_type=int(rng.randint(0, 5)))
            width, height, dur = w, h, -1
        elif kind == "audio":
            rate = 8000
            dur_ms = int(rng.randint(50, 400))
            t = np.arange(int(rate * dur_ms / 1000))
            freq = float(rng.randint(100, 1200))
            sig = (
                np.sin(2 * np.pi * freq * t / rate) * 12000
                + rng.randn(len(t)) * 500
            ).astype(np.int16)
            payload = encode_wav(sig, rate)
            width = height = -1
            dur = dur_ms
        else:  # video: real uncompressed y4m clip
            w = int(rng.randint(4, 16)) * 2  # even dims for C420
            h = int(rng.randint(4, 16)) * 2
            n_frames = int(rng.randint(4, 12))
            fps = (int(rng.choice([24, 25, 30])), 1)
            yy, xx = np.mgrid[0:h, 0:w]
            frames = np.zeros((n_frames, h, w, 3), np.uint8)
            phase = int(rng.randint(0, 255))
            for fidx in range(n_frames):
                frames[fidx, :, :, 0] = (
                    (xx * 4 + yy * 2 + fidx * 17 + phase) % 256
                ).astype(np.uint8)
                frames[fidx, :, :, 1] = ((yy * 8 + fidx * 3) % 256).astype(np.uint8)
                frames[fidx, :, :, 2] = ((xx * 8 + fidx * 5) % 256).astype(np.uint8)
            frames[:, :, :, 1:] += rng.randint(
                0, 8, size=(n_frames, h, w, 2), dtype=np.uint8
            )
            chroma = "444" if i % 2 else "420jpeg"
            payload = encode_y4m(frames, fps=fps, chroma=chroma)
            width, height = w, h
            dur = n_frames * 1000 * fps[1] // fps[0]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(
            {"image": "image/png", "audio": "audio/wav",
             "video": "video/x-yuv4mpeg"}[kind]
        )
        rows["width"].append(width)
        rows["height"].append(height)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool stage: PNG payload -> 16-dim feature vector, REALLY
    decoded (functions/codecs.decode_png). Features: [w, h, channels,
    mean R/G/B, std(luminance), 3x3 block-mean luminance grid] — all
    /255-normalized except dims. ``fake=True`` keeps the old
    hash-derived stub (plumbing-only path, still deterministic)."""

    FEATURE_DIM = FEATURE_DIM

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.fake:
            d = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM).digest()
            return np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 255.0
        img = decode_png(payload).astype(np.float32)
        h, w, ch = img.shape
        if ch == 1:
            rgb = np.repeat(img, 3, axis=2)
        else:
            rgb = img[:, :, :3]
        lum = rgb.mean(axis=2)
        # 3x3 block means (grid cells may be uneven; all cells non-empty)
        ys = np.array_split(np.arange(h), 3)
        xs = np.array_split(np.arange(w), 3)
        grid = [
            lum[np.ix_(y, x)].mean() / 255.0 if len(y) and len(x) else 0.0
            for y in ys
            for x in xs
        ]
        feat = [
            float(w),
            float(h),
            float(ch),
            float(rgb[:, :, 0].mean() / 255.0),
            float(rgb[:, :, 1].mean() / 255.0),
            float(rgb[:, :, 2].mean() / 255.0),
            float(lum.std() / 255.0),
        ] + [float(g) for g in grid]
        return np.asarray(feat, dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch.column("payload").to_pylist()]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


class DecodeAudio:
    """Actor-pool stage: WAV payload -> 16-dim feature vector, REALLY
    decoded (stdlib wave). Features: [duration_s, rate_khz, channels,
    rms, zero-crossing rate, 11 rFFT band energies (L1-normalized)]."""

    FEATURE_DIM = FEATURE_DIM
    N_BANDS = 11

    def _decode(self, payload: bytes) -> np.ndarray:
        samples, rate = decode_wav(payload)
        mono = samples.astype(np.float64).mean(axis=1)
        n = len(mono)
        rms = float(np.sqrt((mono**2).mean()) / 32768.0) if n else 0.0
        zcr = float(np.count_nonzero(np.diff(np.sign(mono))) / max(n - 1, 1))
        spec = np.abs(np.fft.rfft(mono / 32768.0)) if n else np.zeros(1)
        bands = [b.sum() for b in np.array_split(spec, self.N_BANDS)]
        total = sum(bands) or 1.0
        feat = [
            n / rate,
            rate / 1000.0,
            float(samples.shape[1]),
            rms,
            zcr,
        ] + [b / total for b in bands]
        return np.asarray(feat, dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch.column("payload").to_pylist()]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


class ResizeImage:
    """Actor-pool stage: PNG payload -> REALLY resized PNG payload
    (nearest-neighbour via numpy index grids, re-encoded) with updated
    dims. ``fake=True`` keeps the old passthrough stub."""

    def __init__(self, target: tuple[int, int] = (64, 64), fake: bool = False):
        self.target = target
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        tw, th = self.target
        if self.fake:
            payloads = batch.column("payload")
        else:
            out = []
            for p in batch.column("payload").to_pylist():
                img = decode_png(p)
                h, w = img.shape[:2]
                yi = (np.arange(th) * h // th).clip(0, h - 1)
                xi = (np.arange(tw) * w // tw).clip(0, w - 1)
                out.append(encode_png(img[np.ix_(yi, xi)]))
            payloads = pa.array(out, pa.binary())
        w_arr = pa.array([tw] * batch.num_rows, pa.int32())
        h_arr = pa.array([th] * batch.num_rows, pa.int32())
        return (
            batch.set_column(
                batch.schema.get_field_index("payload"), "payload", payloads
            )
            .set_column(batch.schema.get_field_index("width"), "width", w_arr)
            .set_column(batch.schema.get_field_index("height"), "height", h_arr)
        )


class SampleFrames:
    """Actor-pool stage: y4m video payload -> n evenly-spaced frames,
    REALLY decoded (functions/codecs.decode_y4m), each reduced to
    integer-exact per-frame features: (media_id, frame_idx,
    frame_offset_ms, y_mean, y_std, u_mean, v_mean).  Plane means are
    single divisions of exact integer sums, so the output is stable
    enough for golden-file comparison.  ``fake=True`` keeps the old
    offsets-only plumbing stub (media_id, frame_offset_ms) computed
    from the duration metadata without touching the payload."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.fake:
            ids, offs = [], []
            for mid, dur in zip(
                batch.column("media_id").to_pylist(),
                batch.column("duration_ms").to_pylist(),
            ):
                dur = max(int(dur), 0)
                for j in range(self.n):
                    ids.append(mid)
                    offs.append(dur * j // max(self.n, 1))
            return pa.table(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "frame_offset_ms": pa.array(offs, pa.int32()),
                }
            )
        cols = {
            "media_id": [], "frame_idx": [], "frame_offset_ms": [],
            "y_mean": [], "y_std": [], "u_mean": [], "v_mean": [],
        }
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            frames, meta = decode_y4m(payload)
            nf = len(frames)
            if nf == 0:
                continue
            num, den = meta["fps"]
            picks = sorted(
                {j * (nf - 1) // max(self.n - 1, 1) for j in range(min(self.n, nf))}
            )
            for idx in picks:
                fr = frames[idx].astype(np.float64)
                cols["media_id"].append(mid)
                cols["frame_idx"].append(idx)
                cols["frame_offset_ms"].append(idx * 1000 * den // num)
                cols["y_mean"].append(float(fr[:, :, 0].mean()))
                cols["y_std"].append(float(fr[:, :, 0].std()))
                cols["u_mean"].append(float(fr[:, :, 1].mean()))
                cols["v_mean"].append(float(fr[:, :, 2].mean()))
        return pa.table(
            {
                "media_id": pa.array(cols["media_id"], pa.int64()),
                "frame_idx": pa.array(cols["frame_idx"], pa.int64()),
                "frame_offset_ms": pa.array(cols["frame_offset_ms"], pa.int32()),
                "y_mean": pa.array(cols["y_mean"], pa.float64()),
                "y_std": pa.array(cols["y_std"], pa.float64()),
                "u_mean": pa.array(cols["u_mean"], pa.float64()),
                "v_mean": pa.array(cols["v_mean"], pa.float64()),
            }
        )
