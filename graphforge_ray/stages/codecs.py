"""Pure-stdlib media codecs (leaf module — numpy + stdlib only).

The environment has no PIL/cv2/ffmpeg, but several real formats are
decodable with nothing beyond numpy and the standard library, which makes
the multimodal stages' "real codec" path genuinely real for:

* **PPM/PGM** (``P6``/``P5`` binary Netpbm) — the interchange format of
  every image toolchain; 8-bit maxval.
* **BMP** (Windows ``BM``, uncompressed ``BI_RGB`` 24/32-bit) — struct
  parsing of the DIB header + bottom-up row decoding.
* **WAV** (RIFF PCM, 8/16-bit, any channel count) — via the stdlib
  ``wave`` module.
* **PNG** (non-interlaced, 8-bit gray / RGB / palette / gray-alpha /
  RGBA) — a real COMPRESSED format: chunk walk + ``zlib`` inflate +
  scanline unfiltering (all five filter types incl. Paeth). 16-bit
  channels and Adam7 interlace raise ``UnsupportedCodec``.

Codecs with no stdlib decompressor (JPEG/MP3/…) remain honestly
unsupported and raise ``UnsupportedCodec`` — a poison row in the
pipeline, never a crash.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

__all__ = [
    "sniff_media", "decode_image", "encode_ppm", "decode_wav",
    "decode_png", "encode_png", "UnsupportedCodec",
]


class UnsupportedCodec(NotImplementedError):
    """Raised for real-but-undecodable formats (JPEG/PNG/…)."""


def sniff_media(payload: bytes) -> str:
    head = payload[:16]
    if head.startswith(b"GFIMG|"):
        return "gfimg"
    if head.startswith(b"GFAUD|"):
        return "gfaud"
    if head.startswith(b"P6") or head.startswith(b"P5"):
        return "ppm"
    if head.startswith(b"BM"):
        return "bmp"
    if head.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    if head.startswith(b"\x89PNG"):
        return "png"
    if head.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    return "unknown"


# ---------------------------------------------------------------------------
# Netpbm (PPM P6 / PGM P5)
# ---------------------------------------------------------------------------

def _read_pnm_token(buf: io.BytesIO) -> bytes:
    """Next whitespace-delimited token, skipping ``#`` comment lines."""
    tok = b""
    while True:
        ch = buf.read(1)
        if not ch:
            raise ValueError("truncated PNM header")
        if ch == b"#":
            while ch not in (b"\n", b""):
                ch = buf.read(1)
            continue
        if ch.isspace():
            if tok:
                return tok
            continue
        tok += ch


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) binary Netpbm → uint8 array (h, w, c)."""
    buf = io.BytesIO(payload)
    magic = buf.read(2)
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PNM: {magic!r}")
    w = int(_read_pnm_token(buf))
    h = int(_read_pnm_token(buf))
    maxval = int(_read_pnm_token(buf))
    if maxval > 255:
        raise UnsupportedCodec("16-bit PNM not supported")
    if maxval <= 0:
        raise ValueError(f"bad PNM maxval {maxval}")
    c = 3 if magic == b"P6" else 1
    data = buf.read(w * h * c)
    if len(data) < w * h * c:
        raise ValueError("truncated PNM pixel data")
    arr = np.frombuffer(data, dtype=np.uint8).reshape(h, w, c)
    if maxval != 255:
        # rescale to the full 8-bit range (a maxval-15 PGM's samples are
        # in [0,15]; leaving them raw skews mean/phash features 17×)
        arr = np.round(arr.astype(np.float64) * (255.0 / maxval)).astype(
            np.uint8
        )
    return arr


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 array (h, w, 1|3) → binary PGM/PPM payload."""
    h, w, c = arr.shape
    if c == 3:
        header = f"P6 {w} {h} 255\n".encode()
        return header + arr.astype(np.uint8).tobytes()
    header = f"P5 {w} {h} 255\n".encode()
    return header + arr[:, :, 0].astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# BMP (uncompressed BI_RGB, 24/32-bit)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → uint8 RGB array (h, w, 3)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise UnsupportedCodec("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise UnsupportedCodec(f"compressed BMP (method {compression})")
    if bpp not in (24, 32):
        raise UnsupportedCodec(f"{bpp}-bit BMP not supported")
    bottom_up = h > 0
    h = abs(h)
    bytes_pp = bpp // 8
    row_stride = (w * bytes_pp + 3) & ~3  # rows pad to 4 bytes
    need = pixel_off + row_stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * h, offset=pixel_off
    ).reshape(h, row_stride)
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if bottom_up:
        px = px[::-1]
    # BGR(A) → RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


# ---------------------------------------------------------------------------
# PNG (stdlib zlib inflate + scanline unfiltering)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (before palette expansion)
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    pos = len(_PNG_SIG)
    n = len(payload)
    while pos + 8 <= n:
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        data_start = pos + 8
        if data_start + length + 4 > n:
            raise ValueError("truncated PNG chunk")
        yield ctype, payload[data_start : data_start + length]
        pos = data_start + length + 4  # skip CRC
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Filtered scanline stream → (h, w*bpp) uint8 (RFC 2083 §6)."""
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG scanlines")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1)
        pos += stride + 1
        if f == 0:
            cur = line.copy()
        elif f == 2:  # Up (uint8 addition wraps mod 256 — the spec's rule)
            cur = line + prev
        elif f == 1:  # Sub: per-lane cumulative sum over the row
            lanes = line.reshape(w, bpp).astype(np.int64)
            cur = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f == 3:  # Average — left-sequential, loop per byte
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth — left-sequential, loop per byte
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (int(line[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG → uint8 array (h, w, c). Gray → c=1,
    RGB → 3, palette → 3 (PLTE lookup), gray-alpha → 2, RGBA → 4.
    16-bit channels, sub-byte depths and Adam7 raise UnsupportedCodec."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise UnsupportedCodec(f"{depth}-bit PNG not supported")
    if color not in _PNG_SAMPLES:
        raise ValueError(f"bad PNG color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("bad PNG compression/filter method")
    if interlace != 0:
        raise UnsupportedCodec("Adam7-interlaced PNG not supported")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG deflate stream: {e}") from e
    bpp = _PNG_SAMPLES[color]
    arr = _unfilter(raw, w, h, bpp).reshape(h, w, bpp)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        arr = plte[idx]
    return np.ascontiguousarray(arr)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w, c∈{1,2,3,4}) → PNG. ``filter_type`` applies one
    filter to every scanline (0/1/2/3/4 — non-zero types exist so tests
    can exercise every unfilter branch with true roundtrips)."""
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    arr = arr.astype(np.uint8)
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int64)
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(c, np.int64), cur[:-c]])
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            left = np.concatenate([np.zeros(c, np.int64), cur[:-c]])
            enc = cur - (left + prev) // 2
        elif filter_type == 4:
            left = np.concatenate([np.zeros(c, np.int64), cur[:-c]])
            ul = np.concatenate([np.zeros(c, np.int64), prev[:-c]])
            pred = np.fromiter(
                (_paeth(int(a), int(b), int(cc))
                 for a, b, cc in zip(left, prev, ul)),
                dtype=np.int64, count=stride,
            )
            enc = cur - pred
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + (enc % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Real-format image decode (PPM/PGM/BMP/PNG); UnsupportedCodec for
    formats with no stdlib decompressor (JPEG/…)."""
    kind = sniff_media(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "png":
        return decode_png(payload)
    raise UnsupportedCodec(f"no stdlib decoder for {kind!r}")


# ---------------------------------------------------------------------------
# WAV (RIFF PCM via stdlib wave)
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF PCM WAV → (sample_rate, float64 mono samples in [-1, 1]);
    multi-channel input is mean-downmixed."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            rate = wf.getframerate()
            n = wf.getnframes()
            width = wf.getsampwidth()
            channels = wf.getnchannels()
            raw = wf.readframes(n)
    except (wave.Error, EOFError) as e:
        raise ValueError(f"bad WAV: {e}") from e
    if rate <= 0:
        raise ValueError(f"bad WAV: nonpositive sample rate {rate}")
    if width == 1:  # unsigned 8-bit
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:  # signed 16-bit LE
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    else:
        raise UnsupportedCodec(f"{8 * width}-bit PCM not supported")
    if channels > 1:
        arr = arr[: (len(arr) // channels) * channels]
        arr = arr.reshape(-1, channels).mean(axis=1)
    return rate, arr
