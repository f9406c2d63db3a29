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

Compressed codecs (JPEG/PNG/MP3/…) remain honestly unsupported and raise
``NotImplementedError`` — a poison row in the pipeline, never a crash.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

__all__ = [
    "sniff_media", "decode_image", "encode_ppm", "decode_wav",
    "UnsupportedCodec",
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


def decode_image(payload: bytes) -> np.ndarray:
    """Real-format image decode (PPM/PGM/BMP); UnsupportedCodec for
    compressed formats."""
    kind = sniff_media(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
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
