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
- **Y4M / YUV4MPEG2** (video): plain-text header + uncompressed
  planar Y'CbCr frames — the one video container that needs no
  entropy decoder, so frame sampling can be a REAL decode too.
  C444 (full-res chroma) and the C420 family (2x2-subsampled chroma,
  mean-downsampled on encode, nearest-upsampled on decode) are
  supported.
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


# ----------------------------------------------------------------------
# Y4M / YUV4MPEG2 (uncompressed planar video)
# ----------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    frames: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    chroma: str = "444",
) -> bytes:
    """uint8 frames shaped (n, h, w, 3) — planes are Y'CbCr — to a
    YUV4MPEG2 stream.  ``chroma='444'`` stores full-resolution planes;
    ``'420jpeg'`` / ``'420'`` 2x2-mean-downsamples Cb/Cr (h and w must
    be even)."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) uint8")
    n, h, w, _ = f.shape
    sub = chroma.startswith("420")
    if sub and (h % 2 or w % 2):
        raise ValueError("C420 needs even width and height")
    out = io.BytesIO()
    out.write(
        b"%s W%d H%d F%d:%d Ip A1:1 C%s\n"
        % (_Y4M_MAGIC, w, h, fps[0], fps[1], chroma.encode())
    )
    for i in range(n):
        out.write(b"FRAME\n")
        out.write(f[i, :, :, 0].tobytes())
        for p in (1, 2):
            plane = f[i, :, :, p]
            if sub:
                plane = (
                    plane.reshape(h // 2, 2, w // 2, 2)
                    .mean(axis=(1, 3))
                    .round()
                    .astype(np.uint8)
                )
            out.write(plane.tobytes())
    return out.getvalue()


def decode_y4m(data: bytes) -> tuple[np.ndarray, dict]:
    """YUV4MPEG2 bytes -> (uint8 frames (n, h, w, 3) in Y'CbCr, params
    dict with 'width', 'height', 'fps' (num, den), 'chroma').  C420*
    chroma is nearest-upsampled back to full resolution."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_Y4M_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    chroma = "420jpeg"  # the spec default when C is absent
    for tok in data[len(_Y4M_MAGIC) + 1 : nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:].decode("ascii", "replace")
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif key == b"C":
            chroma = val
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    sub = chroma.startswith("420")
    if sub and (h % 2 or w % 2):
        raise ValueError("C420 stream with odd dimensions")
    if not sub and not chroma.startswith("444"):
        raise ValueError(f"unsupported chroma sampling C{chroma}")
    cw, ch_ = (w // 2, h // 2) if sub else (w, h)
    ysz, csz = w * h, cw * ch_
    pos = nl + 1
    frames = []
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = fnl + 1
        if pos + ysz + 2 * csz > len(data):
            raise ValueError("truncated Y4M frame payload")
        y = np.frombuffer(data, np.uint8, ysz, pos).reshape(h, w)
        u = np.frombuffer(data, np.uint8, csz, pos + ysz).reshape(ch_, cw)
        v = np.frombuffer(data, np.uint8, csz, pos + ysz + csz).reshape(ch_, cw)
        if sub:
            u = u.repeat(2, axis=0).repeat(2, axis=1)
            v = v.repeat(2, axis=0).repeat(2, axis=1)
        frames.append(np.stack([y, u, v], axis=2))
        pos += ysz + 2 * csz
    return (
        np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8),
        {"width": w, "height": h, "fps": fps, "chroma": chroma},
    )
