"""Dependency-free image/audio/video codecs for the multimodal operators.

The environment may lack PIL/soundfile/PyAV; these engine-own decoders
make ``decoder='strict'`` a REAL decode path anyway, one format per
modality that a training pipeline can rely on everywhere:

- PNG (RFC 2083): signature check, IHDR parse, IDAT concat + zlib
  inflate, scanline unfilter (all five filter types), for 8-bit
  greyscale / RGB / grey+alpha / RGBA, non-interlaced — the subset
  virtually all corpus PNGs use. Unsupported shapes raise ValueError
  (a DECODE error, distinct from the codec-missing NotImplementedError).
- WAV via the stdlib ``wave`` module: 8/16/32-bit PCM to float32 mono.
- Baseline JFIF (JPEG, ITU-T T.81): full Huffman/DCT decode with
  file-supplied tables, subsampling and restart markers; encoder with
  Annex K tables (see the JPEG section below).
- MJPEG AVI: RIFF container walk + per-frame baseline JPEG — the one
  video format honestly decodable without a codec library.

All are deterministic pure functions of the payload bytes — the
property the multimodal tests and the fake-decode stand-in already
depend on — and run inside Arrow batches on executors (numpy only).
"""

from __future__ import annotations

import functools
import struct
import zlib

import numpy as np


def _decode_guard(fn):
    """Decoders consume UNTRUSTED corpus bytes: any parse-level escape —
    IndexError from truncated tables/segments, KeyError from dangling
    table ids, OverflowError from corrupt coefficients overflowing the
    int32 cells, struct.error from short headers, zlib.error from
    corrupt deflate streams — is a MALFORMED-INPUT condition and
    surfaces as the documented ValueError, never an unclassified crash
    in an executor decoding a 100 TB crawl (fuzz-tested in
    test_codecs). ValueError and the codec-missing NotImplementedError
    pass through untouched."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (IndexError, KeyError, OverflowError, struct.error, zlib.error) as e:
            raise ValueError(
                f"malformed input to {fn.__name__}: {type(e).__name__}"
            ) from e

    return wrapped


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


@_decode_guard
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
        elif f == 1:  # Sub: a per-channel-lane prefix sum mod 256
            cur = (np.cumsum(line.reshape(-1, ch), axis=0) & 0xFF).reshape(-1)
        elif f in (3, 4):
            # Average/Paeth reconstruct sequentially (each pixel needs
            # the DECODED left neighbor) — plain-list arithmetic, which
            # runs several times faster than per-element numpy indexing
            # on this genuinely serial recurrence.
            xl = line.tolist()
            pv = prev.tolist()
            cl = [0] * stride
            if f == 3:
                for i in range(stride):
                    a = cl[i - ch] if i >= ch else 0
                    cl[i] = (xl[i] + ((a + pv[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    a = cl[i - ch] if i >= ch else 0
                    c = pv[i - ch] if i >= ch else 0
                    cl[i] = (xl[i] + _paeth(a, pv[i], c)) & 0xFF
            cur = np.array(cl, dtype=np.int64)
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


@_decode_guard
def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono samples in [-1, 1], sample rate).
    Stdlib ``wave`` handles the RIFF parsing; 8/16/32-bit PCM."""
    import io
    import wave

    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF header)")
    try:
        # Bounded to the STDLIB parse only: wave/chunk raise wave.Error,
        # EOFError, and RuntimeError on corrupt containers — all
        # malformed-input conditions here (the module-wide _decode_guard
        # deliberately excludes RuntimeError to avoid masking real bugs
        # in our own code).
        with wave.open(io.BytesIO(data), "rb") as wf:
            n_ch = wf.getnchannels()
            rate = wf.getframerate()
            depth = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, RuntimeError) as e:
        raise ValueError(f"malformed WAV: {type(e).__name__}") from e
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


# ---------------------------------------------------------------------------
# Baseline JFIF (JPEG) — ITU-T T.81 baseline sequential DCT, dependency-free
# ---------------------------------------------------------------------------
#
# Decoder: baseline sequential (SOF0/1) AND progressive (SOF2) — together
# the overwhelming majority of corpus JPEGs. 8-bit samples, greyscale or
# YCbCr with any h/v sampling factors up to 2 (4:4:4, 4:2:2, 4:2:0),
# restart markers honored. Progressive handles every scan kind of T.81
# Annex G.2 Huffman coding: interleaved/single-component DC first and
# refinement, per-band AC first and refinement with EOB-run coding and
# buffered correction bits (the IJG successive-approximation semantics).
# Quant/Huffman tables come from the FILE (DQT/DHT), so decode correctness
# never depends on the encoders below. Lossless/hierarchical/arithmetic
# coding raise ValueError — a DECODE error, distinct from the
# codec-missing NotImplementedError.
#
# Encoders: baseline (optionally 4:2:0 + restart intervals) and a
# progressive encoder (encode_jpeg_progressive: DC+AC successive
# approximation with spectral-selection bands and EOB runs) — enough to
# round-trip the multimodal tests, to re-encode thumbnails without PIL,
# and to exercise every progressive decode path self-contained. Both are
# lossy only in the shared quantization step, so progressive(decode) ==
# baseline(decode) EXACTLY for the same input/quality — the round-trip
# equality the tests pin.

JPEG_MAGIC = b"\xff\xd8\xff"

_ZZ = [
    r * 8 + c
    for (r, c) in sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
    )
]

_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_Q_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_H_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_H_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_H_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_H_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def is_jpeg(data: bytes) -> bool:
    return data[:3] == JPEG_MAGIC


def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(-1, 1).astype(np.float64)
    n = np.arange(8).reshape(1, -1).astype(np.float64)
    d = np.cos((2 * n + 1) * k * np.pi / 16.0) * np.sqrt(2.0 / 8.0)
    d[0, :] /= np.sqrt(2.0)
    return d


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the reader."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (stuffing still applies)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (size category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _scale_q(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


def _quantize_plane(p: np.ndarray, qdiv: np.ndarray) -> np.ndarray:
    """(H, W) padded float plane -> (H//8, W//8, 64) int32 ZIGZAG-ordered
    quantized DCT coefficients — every block in one batched matmul pass
    (the per-block Python loop was the encoder's hot spot on real
    corpus images). ``qdiv`` is the (8, 8) natural-order quant table."""
    bh, bw = p.shape[0] // 8, p.shape[1] // 8
    blocks = (p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0).reshape(
        -1, 8, 8
    )
    coef = np.matmul(_DCT, np.matmul(blocks, _DCT.T))
    qz = np.round(coef / qdiv).astype(np.int32).reshape(bh, bw, 64)
    return qz[:, :, _ZZ]


def _idct_plane(zz: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(bh, bw, 64) int32 zigzag coefficients + natural-order flat quant
    table -> (bh*8, bw*8) float plane (level-shifted) — the decoder-side
    batched twin of _quantize_plane, shared by the baseline and
    progressive reconstruction paths."""
    bh, bw = zz.shape[0], zz.shape[1]
    nat = np.zeros((bh * bw, 64), dtype=np.float64)
    nat[:, _ZZ] = zz.reshape(-1, 64) * q[_ZZ]
    blocks = np.matmul(_DCT.T, np.matmul(nat.reshape(-1, 8, 8), _DCT)) + 128.0
    return (
        blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )


def _box_half(p: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample with edge replication for odd dims."""
    h, w = p.shape
    if h % 2:
        p = np.vstack([p, p[-1:, :]])
    if w % 2:
        p = np.hstack([p, p[:, -1:]])
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0


def _encode_prep(arr, quality: int, subsample: bool):
    """Shared encoder front (baseline + progressive): color transform,
    optional 4:2:0 chroma downsample, quality-scaled Annex K quant
    tables, MCU-grid padding with edge replication. Returns
    (h, w, n_comp, samp, qt, padded_planes, mcux, mcuy)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg wants uint8 (H, W[, 1|3])")
    h, w, n_comp = a.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")

    if n_comp == 3:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
        if subsample:
            planes = [planes[0], _box_half(planes[1]), _box_half(planes[2])]
    else:
        planes = [a[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]

    qt = [_scale_q(_Q_LUM, quality)]
    if n_comp == 3:
        qt.append(_scale_q(_Q_CHR, quality))

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        pp = np.empty((ph, pw), dtype=np.float64)
        ah, aw = min(p.shape[0], ph), min(p.shape[1], pw)
        pp[:ah, :aw] = p[:ah, :aw]
        pp[ah:, :aw] = pp[ah - 1 : ah, :aw]  # edge replicate
        pp[:, aw:] = pp[:, aw - 1 : aw]
        padded.append(pp)
    return h, w, n_comp, samp, qt, padded, mcux, mcuy


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 75,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W) / (H, W, 1) greyscale or (H, W, 3) RGB uint8 -> baseline
    JFIF bytes (Annex K tables scaled by the libjpeg quality rule).
    ``subsample`` emits 4:2:0 chroma (2x2 Y blocks per MCU);
    ``restart_interval`` emits a DRI segment and RSTn markers every N
    MCUs. Deterministic pure function of its arguments."""
    h, w, n_comp, samp, qt, padded, mcux, mcuy = _encode_prep(arr, quality, subsample)

    enc_dc = [_canonical_codes(*_H_DC_LUM), _canonical_codes(*_H_DC_CHR)]
    enc_ac = [_canonical_codes(*_H_AC_LUM), _canonical_codes(*_H_AC_CHR)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    wtr = _BitWriter()
    pred = [0] * n_comp
    mcu_count = 0
    rst = 0
    qarrs = [
        _quantize_plane(p, qt[0 if ci == 0 else 1].reshape(8, 8))
        for ci, p in enumerate(padded)
    ]

    def emit_block(ci: int, y0: int, x0: int) -> None:
        t = 0 if ci == 0 else 1
        zz = qarrs[ci][y0 // 8, x0 // 8]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size, bits = _magnitude(diff)
        code, length = enc_dc[t][size]
        wtr.put(code, length)
        wtr.put(bits, size)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = enc_ac[t][0xF0]  # ZRL
                wtr.put(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = enc_ac[t][(run << 4) | size]
            wtr.put(code, length)
            wtr.put(bits, size)
            run = 0
        if last_nz < 63:
            code, length = enc_ac[t][0x00]  # EOB
            wtr.put(code, length)

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # close the entropy segment, emit RSTn, reset predictors
                wtr.align()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * n_comp
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        emit_block(ci, (my * sv + by) * 8, (mx * sh + bx) * 8)
            mcu_count += 1
    scan = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, t in enumerate(qt):
        out += seg(0xDB, bytes([tid]) + bytes(int(t.reshape(-1)[i]) for i in _ZZ))
    comps = b""
    for ci in range(n_comp):
        sh, sv = samp[ci]
        comps += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, n_comp) + comps)
    for cls, tid, spec in (
        (0, 0, _H_DC_LUM),
        (1, 0, _H_AC_LUM),
        (0, 1, _H_DC_CHR),
        (1, 1, _H_AC_CHR),
    ):
        if tid == 1 and n_comp == 1:
            continue
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(spec[0]) + bytes(spec[1]))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([n_comp])
    for ci in range(n_comp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# Progressive AC scans need EOBn symbols ((r << 4) | 0 for r in 1..14),
# which the Annex K sequential AC tables don't carry. Correctness-only
# fixed-length table: all 176 possible AC-scan symbols at length 8 —
# canonical codes 0..175, the all-ones code unused (so 1-padding never
# decodes), Kraft-valid. Compression is irrelevant here; being able to
# code EVERY symbol (and thus exercise every decoder path) is the point.
_H_AC_PROG_SYMS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {r << 4 for r in range(16)}
)
_H_AC_PROG = ([0] * 7 + [len(_H_AC_PROG_SYMS)] + [0] * 8, _H_AC_PROG_SYMS)


class _ProgAC:
    """Cross-block AC-scan state: the pending EOB run and the correction
    bits buffered inside it (emitted right after the EOBn symbol — the
    order the decoder's EOB-run tail consumes them in)."""

    def __init__(self, wtr: _BitWriter, codes: dict) -> None:
        self.wtr = wtr
        self.codes = codes
        self.eobrun = 0
        self.corr: list[int] = []

    def flush_eob(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, length = self.codes[r << 4]
            self.wtr.put(code, length)
            if r:
                self.wtr.put(self.eobrun - (1 << r), r)
            for b in self.corr:
                self.wtr.put(b, 1)
        self.eobrun = 0
        self.corr = []


def _emit_ac_first(st: _ProgAC, zz, ss: int, se: int, al: int) -> None:
    """One block of an AC first pass: point-transformed values
    (sign * (|v| >> al)), zero-run/magnitude coding, trailing zeros and
    all-zero blocks joining the cross-block EOB run."""
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v) >> al
        vals.append(-a if v < 0 else a)
    nz = [i for i, v in enumerate(vals) if v]
    if not nz:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob()
        return
    st.flush_eob()
    last = nz[-1]
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = st.codes[0xF0]
            st.wtr.put(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = st.codes[(run << 4) | size]
        st.wtr.put(code, length)
        st.wtr.put(bits, size)
        run = 0
    if last < se - ss:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob()


def _emit_ac_refine(st: _ProgAC, zz, ss: int, se: int, al: int) -> None:
    """One block of an AC refinement pass (IJG encode_mcu_AC_refine
    semantics): runs count zero-HISTORY positions; nonzero-history
    coefficients buffer their bit-al correction bit, flushed right after
    the next symbol; newly-nonzero (|v| >> al == 1) coefficients emit
    (run, 1) + sign; trailing state joins the cross-block EOB run."""
    absv = []
    sign = []
    eobpos = -1
    for i, k in enumerate(range(ss, se + 1)):
        v = int(zz[k])
        a = abs(v) >> al
        absv.append(a)
        sign.append(v < 0)
        if a == 1:
            eobpos = i
    r = 0
    pend: list[int] = []
    for i, a in enumerate(absv):
        if a == 0:
            r += 1
            continue
        while r > 15 and i <= eobpos:
            st.flush_eob()
            code, length = st.codes[0xF0]
            st.wtr.put(code, length)
            r -= 16
            for b in pend:
                st.wtr.put(b, 1)
            pend = []
        if a > 1:
            pend.append(a & 1)
            continue
        st.flush_eob()
        code, length = st.codes[(r << 4) | 1]
        st.wtr.put(code, length)
        st.wtr.put(0 if sign[i] else 1, 1)
        for b in pend:
            st.wtr.put(b, 1)
        pend = []
        r = 0
    if r > 0 or pend:
        st.eobrun += 1
        st.corr.extend(pend)
        if st.eobrun == 0x7FFF or len(st.corr) > 900:
            st.flush_eob()


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 75,
    subsample: bool = False,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
    restart_interval: int = 0,
) -> bytes:
    """(H, W[, 1|3]) uint8 -> PROGRESSIVE JFIF bytes (SOF2) with a
    successive-approximation scan script: interleaved DC first at Al=1,
    per-band per-component AC first at Al=1, a DC refinement scan, then
    per-band AC refinement — every Huffman scan kind of T.81 G.2, so a
    round-trip exercises the whole progressive decoder. Quantization is
    IDENTICAL to encode_jpeg (same tables, same rounding) and successive
    approximation is a lossless re-coding of those integers, so
    decode(progressive) == decode(baseline) EXACTLY at equal arguments.
    ``restart_interval`` emits a DRI segment and RSTn markers every N
    units in EVERY scan (T.81: the unit is an MCU in interleaved DC
    scans, a block in single-component scans) — predictors, EOB runs,
    and buffered correction bits never cross a restart."""
    h, w, n_comp, samp, qt, padded, mcux, mcuy = _encode_prep(arr, quality, subsample)
    # True tiling check: a gap would silently drop coefficients and
    # break the decode(progressive) == decode(baseline) guarantee.
    expect = 1
    for lo, hi in bands:
        if lo != expect or hi < lo or hi > 63:
            raise ValueError("bands must tile 1..63 contiguously")
        expect = hi + 1
    if expect != 64:
        raise ValueError("bands must tile 1..63 contiguously")

    # Quantized zigzag coefficients over the padded MCU grid — the same
    # batched pass the baseline encoder uses, so the two encoders share
    # quantization EXACTLY (the decode-equality guarantee rests on it).
    qblocks = [
        _quantize_plane(p, qt[0 if ci == 0 else 1].reshape(8, 8))
        for ci, p in enumerate(padded)
    ]

    enc_dc = [_canonical_codes(*_H_DC_LUM), _canonical_codes(*_H_DC_CHR)]
    enc_ac_prog = _canonical_codes(*_H_AC_PROG)
    # Non-interleaved AC scan grids (padding blocks are never coded).
    frame_like = {
        "h": h,
        "w": w,
        "hmax": max(s[0] for s in samp),
        "vmax": max(s[1] for s in samp),
        "comps": [{"h": sh, "v": sv} for sh, sv in samp],
    }
    nids = [_nid(frame_like, ci) for ci in range(n_comp)]

    rst_n = [0]

    def _restart(wtr: _BitWriter, unit: int) -> bool:
        """Emit a RSTn boundary before unit ``unit`` when due (mirrors
        the decoder's ``n and n % restart == 0`` check)."""
        if restart_interval and unit and unit % restart_interval == 0:
            wtr.align()
            wtr.out += bytes([0xFF, 0xD0 + rst_n[0]])
            rst_n[0] = (rst_n[0] + 1) % 8
            return True
        return False

    def dc_first_scan(al: int) -> bytes:
        wtr = _BitWriter()
        rst_n[0] = 0
        pred = [0] * n_comp
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if _restart(wtr, n):
                    pred = [0] * n_comp
                for ci, (sh, sv) in enumerate(samp):
                    t = 0 if ci == 0 else 1
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(qblocks[ci][my * sv + by, mx * sh + bx, 0]) >> al
                            size, bits = _magnitude(v - pred[ci])
                            pred[ci] = v
                            code, length = enc_dc[t][size]
                            wtr.put(code, length)
                            wtr.put(bits, size)
                n += 1
        return wtr.flush()

    def dc_refine_scan(al: int) -> bytes:
        wtr = _BitWriter()
        rst_n[0] = 0
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                _restart(wtr, n)
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            wtr.put(
                                (int(qblocks[ci][my * sv + by, mx * sh + bx, 0]) >> al)
                                & 1,
                                1,
                            )
                n += 1
        return wtr.flush()

    def ac_scan(ci: int, lo: int, hi: int, al: int, refine: bool) -> bytes:
        wtr = _BitWriter()
        rst_n[0] = 0
        st = _ProgAC(wtr, enc_ac_prog)
        bh, bw = nids[ci]
        emit = _emit_ac_refine if refine else _emit_ac_first
        n = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and n and n % restart_interval == 0:
                    # pending EOB run / correction bits must not cross
                    st.flush_eob()
                    _restart(wtr, n)
                emit(st, qblocks[ci][by, bx], lo, hi, al)
                n += 1
        st.flush_eob()
        return wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(scomps: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(scomps)])
        for cid, dt, at in scomps:
            body += bytes([cid, (dt << 4) | at])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, t in enumerate(qt):
        out += seg(0xDB, bytes([tid]) + bytes(int(t.reshape(-1)[i]) for i in _ZZ))
    comps = b""
    for ci in range(n_comp):
        sh, sv = samp[ci]
        comps += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, n_comp) + comps)
    out += seg(0xC4, bytes([0x00]) + bytes(_H_DC_LUM[0]) + bytes(_H_DC_LUM[1]))
    if n_comp == 3:
        out += seg(0xC4, bytes([0x01]) + bytes(_H_DC_CHR[0]) + bytes(_H_DC_CHR[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(_H_AC_PROG[0]) + bytes(_H_AC_PROG[1]))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    all_comps = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(n_comp)]
    out += sos(all_comps, 0, 0, 0, 1)
    out += dc_first_scan(1)
    for lo, hi in bands:
        for ci in range(n_comp):
            out += sos([(ci + 1, 0, 0)], lo, hi, 0, 1)
            out += ac_scan(ci, lo, hi, 1, refine=False)
    out += sos(all_comps, 0, 0, 1, 0)
    out += dc_refine_scan(0)
    for lo, hi in bands:
        for ci in range(n_comp):
            out += sos([(ci + 1, 0, 0)], lo, hi, 1, 0)
            out += ac_scan(ci, lo, hi, 0, refine=True)
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """Entropy-segment reader with FF00 unstuffing; restart markers are
    consumed by ``sync_restart``. The accumulator is MASKED to the live
    bits on every refill — without that it silently grows into a
    scan-length bignum whose every shift costs O(bits consumed so far),
    turning megapixel decodes quadratic."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        self.acc &= (1 << self.nbits) - 1  # drop consumed high bits
        while self.nbits <= 24:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG scan")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    self.pos += 2
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: stop filling, sync_restart eats it
                else:
                    break  # EOI or other marker: pad with zeros below
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        while self.nbits <= 24:  # marker reached: zero-pad (legal tail)
            self.acc <<= 8
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        # Chunk reads wider than the refill window: valid streams never
        # exceed 16, but a CORRUPT Huffman table can hand the scan loop a
        # size symbol up to 255 — an unchunked wait-for-n-bits loop can
        # then never be satisfied and spins forever (fuzz-caught).
        v = 0
        while n > 16:
            v = (v << 16) | self.bits(16)
            n -= 16
        if n == 0:
            return v
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (v << n) | ((self.acc >> self.nbits) & ((1 << n) - 1))

    def peek16(self) -> int:
        while self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def sync_restart(self) -> None:
        """Discard pad bits and consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def _huff_lut(table: dict[tuple[int, int], int]) -> np.ndarray:
    """16-bit-prefix lookup table for a canonical Huffman code: entry =
    (symbol << 5) | code length, -1 for invalid prefixes. One array read
    replaces up to 16 per-bit dict probes per symbol — with the masked
    accumulator above, this is what makes Python-side entropy decoding
    usable on real corpus images."""
    lut = np.full(1 << 16, -1, dtype=np.int32)
    for (length, code), sym in table.items():
        base = code << (16 - length)
        lut[base : base + (1 << (16 - length))] = (sym << 5) | length
    return lut


def _huff_decode(rd: _BitReader, lut: np.ndarray) -> int:
    v = int(lut[rd.peek16()])
    if v < 0:
        raise ValueError("bad Huffman code")
    rd.nbits -= v & 31
    return v >> 5


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


@_decode_guard
def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JFIF bytes -> (H, W, C) uint8 with C in
    {1, 3} (RGB for color). Tables and sampling factors come from the
    file; lossless/hierarchical/arithmetic-coded streams raise
    ValueError."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    store = None  # progressive: per-component coefficient accumulators
    restart = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if ln < 2 or pos + 2 + ln > len(data):
            raise ValueError("truncated JPEG segment")
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int32)
                for k in range(64):
                    t[_ZZ[k]] = body[i + 1 + k]
                qt[tid] = t
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _huff_lut(_decode_table(bits, vals))
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit samples supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
                raise ValueError("sampling factors beyond 2 unsupported")
            frame = {
                "h": fh,
                "w": fw,
                "comps": comps,
                "prog": marker == 0xC2,
                "hmax": hmax,
                "vmax": vmax,
                "mcux": (fw + 8 * hmax - 1) // (8 * hmax),
                "mcuy": (fh + 8 * vmax - 1) // (8 * vmax),
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only DCT Huffman JPEG (SOF0/1/2) supported")
        elif marker == 0xDD:
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            if not frame["prog"]:
                ns = body[0]
                scan_sel = {}
                for si in range(ns):
                    cid, tt = body[1 + si * 2 : 3 + si * 2]
                    scan_sel[cid] = (tt >> 4, tt & 0x0F)
                return _decode_scan(data, pos, frame, scan_sel, qt, huff, restart)
            if store is None:
                store = [
                    np.zeros(
                        (frame["mcuy"] * c["v"], frame["mcux"] * c["h"], 64),
                        dtype=np.int32,
                    )
                    for c in frame["comps"]
                ]
            pos = _decode_prog_scan(data, pos, body, frame, store, huff, restart)
    if store is not None:
        return _reconstruct_progressive(frame, store, qt)
    raise ValueError("no scan data found")


def _nid(frame: dict, ci: int) -> tuple[int, int]:
    """(block rows, block cols) of component ``ci`` in a NON-interleaved
    scan: ceil of the component's own sample dimensions — smaller than
    the MCU-padded grid whenever the image ends inside a partial MCU
    (T.81 A.2.2: single-component scans never code the padding blocks)."""
    c = frame["comps"][ci]
    cw = -(-(frame["w"] * c["h"]) // frame["hmax"])
    ch = -(-(frame["h"] * c["v"]) // frame["vmax"])
    return -(-ch // 8), -(-cw // 8)


def _decode_scan(data, pos, frame, scan_sel, qt, huff, restart):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise ValueError("sampling factors beyond 2 unsupported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    store = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    ]
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("missing quant table")
    rd = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                rd.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan_sel[c["id"]]
                dtab = huff.get((0, dc_t))
                atab = huff.get((1, ac_t))
                if dtab is None or atab is None:
                    raise ValueError("missing Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = store[ci][my * c["v"] + by, mx * c["h"] + bx]
                        size = _huff_decode(rd, dtab)
                        pred[ci] += _extend(rd.bits(size), size)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(rd, atab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(rd.bits(s), s)
                            k += 1
            mcu_count += 1
    # Entropy decoding is inherently sequential; the IDCT is not — all
    # blocks reconstruct in one batched pass (shared with progressive).
    planes = [
        _idct_plane(store[ci], qt[c["tq"]]) for ci, c in enumerate(comps)
    ]
    return _assemble(planes, comps, hmax, vmax, h, w)


def _assemble(planes, comps, hmax, vmax, h, w) -> np.ndarray:
    """Upsample subsampled planes, crop to the frame, YCbCr->RGB."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = full[0][:, :, None]
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        out = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=2,
        )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _decode_prog_scan(data, pos, body, frame, store, huff, restart) -> int:
    """Decode ONE progressive scan into the coefficient accumulators and
    return the position of the next marker. Covers all four Huffman scan
    kinds of T.81 G.2: DC first (interleaved or single-component), DC
    refinement (one raw bit per block), AC first per spectral band with
    EOB-run coding, AC refinement (correction bits over zero-history
    runs, IJG semantics). Restart intervals reset predictors/EOB runs."""
    comps = frame["comps"]
    ns = body[0]
    sel = []
    for si in range(ns):
        cid, tt = body[1 + si * 2 : 3 + si * 2]
        cis = [i for i, c in enumerate(comps) if c["id"] == cid]
        if not cis:
            raise ValueError("scan references a component absent from SOF")
        sel.append((cis[0], tt >> 4, tt & 0x0F))
    ss, se, ahal = body[1 + ns * 2 : 4 + ns * 2]
    ah, al = ahal >> 4, ahal & 0x0F
    rd = _BitReader(data, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("bad progressive DC scan (Se != 0)")
        if ns > 1:
            # Interleaved DC scan: MCU order over the padded grid.
            pred = [0] * len(comps)
            n = 0
            for my in range(frame["mcuy"]):
                for mx in range(frame["mcux"]):
                    if restart and n and n % restart == 0:
                        rd.sync_restart()
                        pred = [0] * len(comps)
                    for ci, dc_t, _a in sel:
                        c = comps[ci]
                        dtab = huff.get((0, dc_t)) if ah == 0 else None
                        if ah == 0 and dtab is None:
                            raise ValueError("missing Huffman table")
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = store[ci][my * c["v"] + by, mx * c["h"] + bx]
                                if ah == 0:
                                    size = _huff_decode(rd, dtab)
                                    pred[ci] += _extend(rd.bits(size), size)
                                    blk[0] = pred[ci] << al
                                elif rd.bit():
                                    blk[0] |= 1 << al
                    n += 1
        else:
            ci, dc_t, _a = sel[0]
            dtab = huff.get((0, dc_t)) if ah == 0 else None
            if ah == 0 and dtab is None:
                raise ValueError("missing Huffman table")
            bh, bw = _nid(frame, ci)
            pred = 0
            n = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart and n and n % restart == 0:
                        rd.sync_restart()
                        pred = 0
                    blk = store[ci][by, bx]
                    if ah == 0:
                        size = _huff_decode(rd, dtab)
                        pred += _extend(rd.bits(size), size)
                        blk[0] = pred << al
                    elif rd.bit():
                        blk[0] |= 1 << al
                    n += 1
    else:
        if ns != 1:
            raise ValueError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise ValueError("bad spectral band")
        ci, _d, ac_t = sel[0]
        atab = huff.get((1, ac_t))
        if atab is None:
            raise ValueError("missing Huffman table")
        bh, bw = _nid(frame, ci)
        eobrun = 0
        n = 0
        for by in range(bh):
            for bx in range(bw):
                if restart and n and n % restart == 0:
                    rd.sync_restart()
                    eobrun = 0
                blk = store[ci][by, bx]
                if ah == 0:
                    eobrun = _ac_first(rd, blk, ss, se, al, eobrun, atab)
                else:
                    eobrun = _ac_refine(rd, blk, ss, se, al, eobrun, atab)
                n += 1
    # Skip any pad bits / trailing restart markers to the next marker.
    p = max(rd.pos, pos)
    while p + 1 < len(data):
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            break
        p += 1
    return p


def _ac_first(rd, blk, ss, se, al, eobrun, atab) -> int:
    """AC first pass for one block: values arrive point-transformed
    (sign * (|coef| >> al)) and are stored shifted back up; an EOBn
    symbol ends the block and skips the next (2^r - 1 + bits) blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(rd, atab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += rd.bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC index overflow")
        blk[k] = _extend(rd.bits(s), s) << al
        k += 1
    return 0


def _ac_refine(rd, blk, ss, se, al, eobrun, atab) -> int:
    """AC successive-approximation refinement for one block (the IJG
    decode_mcu_AC_refine semantics): runs count ZERO-HISTORY positions
    only; every nonzero-history coefficient passed over spends one
    correction bit (set -> magnitude grows by 1 << al, two's-complement
    bitwise like the C reference); s==1 symbols insert a new +-1<<al
    coefficient at the end of their run; inside an EOB run the block
    still spends correction bits on its remaining nonzero history."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(rd, atab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.bits(r)
                    break
                val = 0  # ZRL: 16 zero-history skips, nothing inserted
            elif s == 1:
                val = p1 if rd.bit() else m1
            else:
                raise ValueError("bad AC refinement symbol")
            while k <= se:
                if blk[k] != 0:
                    if rd.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0 and rd.bit() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, store, qt) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficients (blocks no scan
    ever touched are all-zero -> flat 128 after level shift) and
    assemble exactly like the baseline path."""
    comps = frame["comps"]
    planes = []
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("missing quant table")
        planes.append(_idct_plane(store[ci], q))
    return _assemble(
        planes, comps, frame["hmax"], frame["vmax"], frame["h"], frame["w"]
    )


# ---------------------------------------------------------------------------
# Minimal AVI (MJPEG) — the dependency-free video strict path
# ---------------------------------------------------------------------------
#
# Motion-JPEG in a RIFF/AVI container: every video frame is a complete
# baseline JPEG in its own '00dc' chunk, so the JFIF decoder above does all
# the real work and the container layer is pure struct walking. This is the
# one video format a dependency-free engine can honestly decode end-to-end;
# anything else (H.26x, VP9, AV1) requires a real codec library and stays
# behind the PyAV import gate in operators/multimodal.sample_frames.

AVI_MAGIC = b"RIFF"


def is_avi(data: bytes) -> bool:
    return data[:4] == AVI_MAGIC and data[8:12] == b"AVI "


def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a RIFF chunk
    run; descends into LIST chunks."""
    pos = start
    while pos + 8 <= end:
        cc = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body0 = pos + 8
        if body0 + size > end:
            raise ValueError("truncated AVI chunk")
        if cc in (b"LIST", b"RIFF"):
            yield from _riff_chunks(data, body0 + 4, body0 + size)
        else:
            yield cc, body0, size
        pos = body0 + size + (size & 1)  # chunks pad to even


@_decode_guard
def decode_avi_frames(data: bytes) -> list[np.ndarray]:
    """MJPEG AVI bytes -> list of decoded (H, W, C) uint8 frames.
    Frames live in '00dc' (stream-0 compressed) chunks; each payload is
    a complete baseline JPEG handled by decode_jpeg. Non-MJPEG payloads
    fail its SOI check — a DECODE error, not a silent fake."""
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF/AVI header)")
    frames = []
    for cc, off, size in _riff_chunks(data, 12, len(data)):
        if cc == b"00dc" and size > 0:
            frames.append(decode_jpeg(data[off : off + size]))
    if not frames:
        raise ValueError("AVI contains no stream-0 video frames")
    return frames


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 25, quality: int = 90
) -> bytes:
    """Encode uint8 frames (consistent (H, W[, C])) as a minimal MJPEG
    AVI: RIFF('AVI ' LIST hdrl(avih, LIST strl(strh, strf)) LIST
    movi('00dc' JPEG ...)). Deterministic; enough structure for this
    decoder and common players."""
    if not frames:
        raise ValueError("no frames")
    jpgs = [encode_jpeg(f, quality=quality) for f in frames]
    h, w = frames[0].shape[0], frames[0].shape[1]

    def chunk(cc: bytes, body: bytes) -> bytes:
        return cc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    us_per_frame = 1_000_000 // max(1, int(fps))
    avih = struct.pack(
        "<14I", us_per_frame, 0, 0, 0x10, len(jpgs), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",  # flags, prio, lang, init, scale, rate, start,
            0, 0, 0, 0, 1, max(1, int(fps)), 0,  # length, bufsize, quality,
            len(jpgs), 0, 0xFFFFFFFF, 0,  # samplesize
        )
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpgs))
    inner = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(inner)) + inner
