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
* **GIF** (87a/89a, first frame) — a second compressed format with a
  from-scratch LZW codec: LSB-first variable-width codes, clear/end
  handling, KwKwK case, 12-bit cap + table-reset, global/local color
  tables, extension skip, interlace row reordering. Encoder included
  (≤256-color quantization-free palette build).

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
    "decode_png", "encode_png", "decode_gif", "encode_gif",
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
    if head.startswith(b"GIF87a") or head.startswith(b"GIF89a"):
        return "gif"
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
# GIF (87a/89a: LZW decompression, palette expansion, interlace)
# ---------------------------------------------------------------------------

_GIF_MAX_CODE_SIZE = 12


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, clear/end codes, code
    width grows 1 bit whenever the next free code no longer fits
    (canonical decoder rule), capped at 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    nbits = len(data) * 8
    bitpos = 0
    out = bytearray()
    code_size = min_code_size + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    prev: bytes | None = None
    while True:
        if bitpos + code_size > nbits:
            break
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == end:
            break
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            if next_code < (1 << _GIF_MAX_CODE_SIZE):
                table[next_code] = prev + entry[:1]
                next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
            if next_code < (1 << _GIF_MAX_CODE_SIZE):
                table[next_code] = entry
                next_code += 1
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out += entry
        prev = entry
        if (next_code >= (1 << code_size)
                and code_size < _GIF_MAX_CODE_SIZE):
            code_size += 1
    return bytes(out)


def _gif_interlace_rows(h: int) -> list[int]:
    """GIF interlace pass order: rows 0,8,16… then 4,12… then 2,6… then
    odd rows."""
    return (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a → (h, w, 3) uint8 RGB of the FIRST frame (animation
    frames beyond the first are ignored). Handles global/local color
    tables, extensions, interlace, and the full LZW variant."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnsupportedCodec("not a GIF signature")
    sw, sh = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    bg_index = payload[11]
    palette = None
    pos = 13
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = np.frombuffer(
            payload[pos:pos + 3 * n], np.uint8
        ).reshape(-1, 3)
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension block: label byte + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += payload[pos] + 1
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            left, top, iw, ih = struct.unpack(
                "<HHHH", payload[pos + 1:pos + 9]
            )
            iflags = payload[pos + 9]
            pos += 10
            if iflags & 0x80:  # local color table overrides global
                n = 2 << (iflags & 0x07)
                palette = np.frombuffer(
                    payload[pos:pos + 3 * n], np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if palette is None:
                raise UnsupportedCodec("GIF without a color table")
            mcs = payload[pos]
            pos += 1
            blocks = []
            while payload[pos] != 0:
                ln = payload[pos]
                blocks.append(payload[pos + 1:pos + 1 + ln])
                pos += ln + 1
            idx = np.frombuffer(
                _gif_lzw_decode(b"".join(blocks), mcs), np.uint8
            )
            if len(idx) < iw * ih:
                raise ValueError("truncated GIF image data")
            idx = idx[: iw * ih].reshape(ih, iw)
            if iflags & 0x40:  # interlaced: rows arrive in pass order
                out = np.empty_like(idx)
                out[_gif_interlace_rows(ih)] = idx
                idx = out
            if int(idx.max(initial=0)) >= len(palette):
                raise ValueError("GIF pixel index outside color table")
            if (left, top) == (0, 0) and (iw, ih) == (sw, sh):
                return palette[idx]
            # optimized GIFs describe a sub-rectangle of the logical
            # screen: composite onto a background-color canvas so the
            # returned dims are the IMAGE dims, not the frame's
            if left + iw > sw or top + ih > sh:
                raise ValueError("GIF frame outside the logical screen")
            fill = bg_index if bg_index < len(palette) else 0
            canvas = np.full((sh, sw), fill, np.uint8)
            canvas[top:top + ih, left:left + iw] = idx
            return palette[canvas]
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image data")


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """LZW encode synchronized with the canonical decoder's code-width
    rule (encoder bumps one add later: next_code == (1<<size)+1)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    cur = 0
    curbits = 0
    code_size = min_code_size + 1

    def emit(code: int):
        nonlocal cur, curbits
        cur |= code << curbits
        curbits += code_size
        while curbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            curbits -= 8

    def flush():
        nonlocal cur, curbits
        if curbits:
            out.append(cur & 0xFF)
            cur = 0
            curbits = 0

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < (1 << _GIF_MAX_CODE_SIZE):
            table[wc] = next_code
            next_code += 1
            if (next_code == (1 << code_size) + 1
                    and code_size < _GIF_MAX_CODE_SIZE):
                code_size += 1
        else:  # table full: reset both sides with a clear code
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(end)
    flush()
    return bytes(out)


def encode_gif(arr: np.ndarray) -> bytes:
    """(h, w[, 3]) uint8 → single-frame GIF89a (≤256 distinct colors;
    grayscale input is expanded to RGB)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(
            f"encode_gif needs (h, w) gray or (h, w, 3) RGB, got "
            f"shape {arr.shape}"
        )
    h, w = arr.shape[:2]
    colors, inverse = np.unique(
        arr.reshape(-1, 3), axis=0, return_inverse=True
    )
    if len(colors) > 256:
        raise ValueError(f"GIF supports ≤256 colors, got {len(colors)}")
    # color-table size must be a power of two ≥ 2; mcs ≥ 2 per spec
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    table_n = 1 << bits
    palette = np.zeros((table_n, 3), np.uint8)
    palette[: len(colors)] = colors
    mcs = max(2, bits)
    lzw = _gif_lzw_encode(inverse.astype(np.uint8).tobytes(), mcs)
    parts = [
        b"GIF89a",
        struct.pack("<HH", w, h),
        bytes([0x80 | (bits - 1), 0, 0]),  # GCT present, size 2^bits
        palette.tobytes(),
        b"\x2C", struct.pack("<HHHH", 0, 0, w, h), b"\x00",
        bytes([mcs]),
    ]
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        parts.append(bytes([len(chunk)]) + chunk)
    parts.append(b"\x00\x3B")
    return b"".join(parts)


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
    """Real-format image decode (PPM/PGM/BMP/PNG/GIF); UnsupportedCodec
    for formats with no stdlib decompressor (JPEG/…). Low-level parse
    errors from corrupt/truncated payloads (index/key/struct/zlib) are
    normalized to ValueError so the pipeline's poison-row quarantine —
    which catches ValueError, never bare IndexError — always applies."""
    kind = sniff_media(payload)
    try:
        if kind == "ppm":
            return decode_ppm(payload)
        if kind == "bmp":
            return decode_bmp(payload)
        if kind == "png":
            return decode_png(payload)
        if kind == "gif":
            return decode_gif(payload)
    except (IndexError, KeyError, struct.error, zlib.error,
            OverflowError) as e:
        raise ValueError(f"corrupt {kind} payload: {e!r}") from e
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
