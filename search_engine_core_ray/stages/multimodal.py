"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.

Codec status: the container has no PIL/ffmpeg, but PNG and 16-bit PCM
WAV are decodable with numpy + the standard library, so the image and
audio stages run a REAL decode by default (``functions/codecs.py`` —
zlib-inflated, filter-reconstructed PNG scanlines; ``wave``-module
PCM). The synthetic media table generates real PNG/WAV payloads so the
full decode path is exercised end to end. Video has no feasible
stdlib container parser — ``SampleFrames`` emits deterministic frame
OFFSETS only and its per-frame decode stays stubbed
(NotImplementedError; ``fake=True`` for the plumbing-only path).

Scale notes: binary payloads are large, so these stages must run with
small ``batch_size`` (payload_bytes * batch_size * concurrency bounded
by worker heap) and ``batch_format="pyarrow"`` (binary columns don't
round-trip pandas cleanly).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.codecs import decode_png, decode_wav, encode_png, encode_wav

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
    PNGs (decodable by DecodeImage) and sine-mix 16-bit WAVs (decodable
    by DecodeAudio); video payloads are opaque bytes (stub kind)."""
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
        else:  # video: opaque bytes, stub decode
            payload = rng.bytes(256 + int(rng.randint(0, 1024)))
            width = int(rng.randint(16, 512))
            height = int(rng.randint(16, 512))
            dur = int(rng.randint(1000, 60000))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
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
    """Actor-pool stage: video payload -> n deterministic frame offsets
    (offsets are real; the per-frame DECODE has no stdlib codec and
    stays stubbed — fake=True for the plumbing-only path)."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video codec not available in this environment; "
                "SampleFrames(fake=True) emits the deterministic offsets"
            )
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
