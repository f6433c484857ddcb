"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The actual codec libraries (PIL/ffmpeg/etc.)
are NOT in this container, so the decode kernels are STUBBED: by
default they raise NotImplementedError; with ``fake=True`` they run a
deterministic fake decode so the Ray-side plumbing — schema, batch
sizing, actor signature, output layout — is real and tested.

Scale notes: binary payloads are large, so these stages must run with
small ``batch_size`` (payload_bytes * batch_size * concurrency bounded
by worker heap) and ``batch_format="pyarrow"`` (binary columns don't
round-trip pandas cleanly).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for tests/benches."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + int(rng.randint(0, 1024)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.randint(16, 512)) if kind != "audio" else -1)
        rows["height"].append(int(rng.randint(16, 512)) if kind != "audio" else -1)
        rows["duration_ms"].append(int(rng.randint(1000, 60000)) if kind != "image" else -1)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool stage: payload -> decoded feature vector.

    Real implementation would do ``PIL.Image.open`` in ``__init__``-loaded
    codec state; here: stub. ``fake=True`` derives a deterministic
    16-dim feature from blake2b(payload) so downstream stages are
    exercisable.
    """

    FEATURE_DIM = 16

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "construct DecodeImage(fake=True) for the deterministic stub"
            )
        d = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM).digest()
        return np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p) for p in batch.column("payload").to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


class ResizeImage:
    """Actor-pool stage: payload -> resized payload (stub: passthrough
    with recorded target dims; real impl swaps in PIL thumbnail)."""

    def __init__(self, target: tuple[int, int] = (64, 64), fake: bool = False):
        self.target = target
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("image codec not available; use fake=True")
        w = pa.array([self.target[0]] * batch.num_rows, pa.int32())
        h = pa.array([self.target[1]] * batch.num_rows, pa.int32())
        return (
            batch.set_column(batch.schema.get_field_index("width"), "width", w)
            .set_column(batch.schema.get_field_index("height"), "height", h)
        )


class SampleFrames:
    """Actor-pool stage: video payload -> n deterministic frame offsets
    (stub emits offsets only; real impl decodes frames at them)."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("video codec not available; use fake=True")
        ids, offs = [], []
        for mid, dur in zip(
            batch.column("media_id").to_pylist(), batch.column("duration_ms").to_pylist()
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
