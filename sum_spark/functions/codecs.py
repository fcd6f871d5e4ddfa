"""Dependency-free image/audio codecs for the multimodal operators.

The environment may lack PIL/soundfile; these engine-own decoders make
``decoder='strict'`` a REAL decode path anyway for the two formats a
training pipeline can rely on everywhere:

- PNG (RFC 2083): signature check, IHDR parse, IDAT concat + zlib
  inflate, scanline unfilter (all five filter types), for 8-bit
  greyscale / RGB / grey+alpha / RGBA, non-interlaced — the subset
  virtually all corpus PNGs use. Unsupported shapes raise ValueError
  (a DECODE error, distinct from the codec-missing NotImplementedError).
- WAV via the stdlib ``wave`` module: 8/16/32-bit PCM to float32 mono.

Both are deterministic pure functions of the payload bytes — the
property the multimodal tests and the fake-decode stand-in already
depend on — and run inside Arrow batches on executors (numpy only).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def is_png(data: bytes) -> bool:
    return bool(data) and data[:8] == PNG_MAGIC


def is_wav(data: bytes) -> bool:
    return bool(data) and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG shape (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); supported: 8-bit non-interlaced "
            "grey/RGB/grey+alpha/RGBA"
        )
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need the reconstructed left pixel
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                x = line[i]
                if f == 1:
                    cur[i] = (x + a) & 0xFF
                elif f == 3:
                    cur[i] = (x + (a + b) // 2) & 0xFF
                elif f == 4:
                    cur[i] = (x + _paeth(int(a), int(b), int(c))) & 0xFF
                else:
                    raise ValueError(f"bad filter byte {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W[, C]) uint8 array -> PNG bytes. ``filter_type`` applies one
    filter to every scanline (0 is the simple/correct default; the other
    values exist so tests can exercise each unfilter path)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 3: 2, 2: 4, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    flat = a.reshape(h, w * ch).astype(np.int64)
    stride = w * ch
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 2:
            filt = (cur - prev) & 0xFF
        else:
            filt = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                aa = cur[i - ch] if i >= ch else 0
                bb = prev[i]
                cc = prev[i - ch] if i >= ch else 0
                if filter_type == 1:
                    filt[i] = (cur[i] - aa) & 0xFF
                elif filter_type == 3:
                    filt[i] = (cur[i] - (aa + bb) // 2) & 0xFF
                elif filter_type == 4:
                    filt[i] = (cur[i] - _paeth(int(aa), int(bb), int(cc))) & 0xFF
                else:
                    raise ValueError(f"bad filter type {filter_type}")
        lines.append(filter_type)
        lines.extend(filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def png_to_grey(arr: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 -> (H, W) float32 luminance in [0, 1] (ITU-R
    601-2 weights for color; alpha ignored)."""
    a = arr.astype(np.float32)
    if a.shape[2] >= 3:
        grey = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) / 1000.0
    else:
        grey = a[:, :, 0]
    return grey / 255.0


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample of (H, W[, C])."""
    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono samples in [-1, 1], sample rate).
    Stdlib ``wave`` handles the RIFF parsing; 8/16/32-bit PCM."""
    import io
    import wave

    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF header)")
    with wave.open(io.BytesIO(data), "rb") as wf:
        n_ch = wf.getnchannels()
        rate = wf.getframerate()
        depth = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if depth == 1:  # unsigned 8-bit
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
        samples = (samples - 128.0) / 128.0
    elif depth == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif depth == 4:
        samples = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {depth}")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples, rate
