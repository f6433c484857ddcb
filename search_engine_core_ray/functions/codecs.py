"""Real, dependency-free media codecs for the multimodal stages.

The container has no PIL/ffmpeg, but two formats are fully decodable
with the standard library + numpy, so the decode stages can be REAL
rather than stubbed:

- **PNG** (image): minimal encoder/decoder — zlib-compressed IDAT,
  8-bit grayscale / RGB / RGBA, no interlace; all five scanline
  filters (None/Sub/Up/Average/Paeth) implemented on the decode side
  and selectable on the encode side so the decoder's filter paths are
  round-trip testable.
- **WAV** (audio): PCM 16-bit via the stdlib ``wave`` module.

Video stays honestly stubbed (no container parser is feasible here).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> PNG color type
_CHANNELS = {0: 1, 2: 3, 6: 4}    # PNG color type -> channels


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W) | (H, W, 3) | (H, W, 4) uint8 -> PNG bytes. ``filter_type``
    (0-4) is applied to every scanline — exists so tests can exercise
    each decoder filter path."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    bpp = ch
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        row = a[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.vstack([np.zeros((1, ch), np.uint8), row[:-1]])
            filt = (row.astype(np.int16) - left.astype(np.int16)) % 256
        elif filter_type == 2:  # Up
            filt = (row.astype(np.int16) - prev.astype(np.int16)) % 256
        elif filter_type == 3:  # Average
            left = np.vstack([np.zeros((1, ch), np.uint8), row[:-1]])
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            filt = (row.astype(np.int16) - avg) % 256
        elif filter_type == 4:  # Paeth
            left = np.vstack([np.zeros((1, ch), np.uint8), row[:-1]])
            ul = np.vstack([np.zeros((1, ch), np.uint8), prev[:-1]])
            filt = (row.astype(np.int16) - _paeth(left, prev, ul)) % 256
        else:
            raise ValueError("filter_type must be 0-4")
        raw.append(filter_type)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=upper-left)."""
    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, channels) uint8. Supports 8-bit grayscale /
    RGB / RGBA, filters 0-4, no interlace."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, flt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color_type}, "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, width, ch), dtype=np.uint8)
    prev = np.zeros((width, ch), dtype=np.int16)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).reshape(width, ch).astype(np.int16)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left -> scan
            rec = np.zeros_like(line)
            for x in range(width):
                left = rec[x - 1] if x > 0 else np.zeros(ch, np.int16)
                if f == 1:
                    rec[x] = (line[x] + left) % 256
                elif f == 3:
                    rec[x] = (line[x] + (left + prev[x]) // 2) % 256
                else:
                    ul = prev[x - 1] if x > 0 else np.zeros(ch, np.int16)
                    rec[x] = (line[x] + _paeth(left, prev[x], ul)) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono/stereo samples -> WAV bytes (PCM 16-bit)."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples shaped (n, channels), sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        n = w.getnframes()
        ch = w.getnchannels()
        raw = w.readframes(n)
        samples = np.frombuffer(raw, dtype=np.int16).reshape(n, ch)
        return samples, w.getframerate()
