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

* **JPEG** (baseline sequential DCT, JFIF) — a third compressed format,
  entirely from scratch: Annex K quantization + Huffman tables,
  vectorized 8x8 DCT/IDCT, canonical Huffman coding, byte stuffing,
  restart markers, 4:4:4/4:2:0/4:2:2 chroma. Progressive/arithmetic/
  12-bit raise ``UnsupportedCodec``.

Codecs with no practical pure-Python path (MP3/H.264/…) remain honestly
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
    "decode_jpeg", "encode_jpeg", "UnsupportedCodec",
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
        if kind == "jpeg":
            return decode_jpeg(payload)
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


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, ITU T.81; JFIF container)
#
# A third compressed format, from scratch: standard Annex K quantization
# and Huffman tables (public spec constants), vectorized 8x8 DCT/IDCT
# (orthonormal matrix form, one einsum over all blocks), canonical
# Huffman coding, byte stuffing, restart markers, 4:4:4 / 4:2:0 / 4:2:2
# chroma layouts (any h,v in {1,2}). Progressive (SOF2), arithmetic,
# 12-bit and hierarchical modes raise UnsupportedCodec. The entropy
# coder is per-block Python (inherently sequential bit I/O) — media
# payloads run inside map_batches tasks, so per-payload cost
# parallelizes across the pool.
# ---------------------------------------------------------------------------

def _zigzag_order() -> np.ndarray:
    """Flat block indices in zigzag scan order (generated, not
    transcribed): anti-diagonals, even diagonals walked bottom-left to
    top-right."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        order.extend(diag)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_JPEG_ZZ = _zigzag_order()

_JPEG_QL = np.array([  # Annex K.1 luminance
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

_JPEG_QC = np.array([  # Annex K.2 chrominance
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# Annex K.3-K.6 Huffman specs: (BITS[1..16], HUFFVAL)
_HUFF_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
_HUFF_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_HUFF_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    d = np.sqrt(2.0 / 8.0) * np.cos((2 * n[None, :] + 1) * n[:, None]
                                    * np.pi / 16.0)
    d[0] /= np.sqrt(2.0)
    return d


_JPEG_DCT = _dct_matrix()


def _huff_canonical(bits: list[int], vals: list[int]):
    """Canonical JPEG Huffman codes → list of (symbol, code, length)."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec

    def marker(self, m: int) -> None:
        """Byte-align and emit a raw marker (RSTn) into the stream."""
        self.align()
        self.buf += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality convention (public): 5000/Q below 50, else
    200-2Q percent."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((q * s + 50) / 100), 1, 255)


def _mag_bits(v: int) -> tuple[int, int]:
    """(size, code) of a DC/AC magnitude per T.81 F.1.2.1: negatives
    code as v + 2^size - 1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


_JPEG_SAMPLING = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder: uint8 HxW (grayscale, 1 component) or
    HxWx3 RGB (YCbCr). Standard Annex K tables scaled by ``quality``;
    DCT vectorized over all blocks. ``subsampling`` picks the chroma
    layout ('444'/'420'/'422' — luma carries the max factors, chroma is
    box-average downsampled); ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs (exercises the decoder's resync)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg expects HxW or HxWx3")
    if subsampling not in _JPEG_SAMPLING:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        ly = _JPEG_SAMPLING[subsampling]
        samp = [ly, (1, 1), (1, 1)]
    ncomp = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    ql = _quality_scale(_JPEG_QL, quality)
    qc = _quality_scale(_JPEG_QC, quality)
    qtabs = [ql] if gray else [ql, qc]
    zz = _JPEG_ZZ

    comp_coefs = []
    for ci, plane in enumerate(planes):
        ch, cv = samp[ci]
        fy, fx = vmax // cv, hmax // ch
        if fy > 1 or fx > 1:  # box-average chroma downsample
            p = np.pad(
                plane,
                ((0, -plane.shape[0] % fy), (0, -plane.shape[1] % fx)),
                mode="edge",
            )
            plane = p.reshape(
                p.shape[0] // fy, fy, p.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        th, tw = mcuy * cv * 8, mcux * ch * 8  # block-grid-aligned dims
        p = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        bh, bw = th // 8, tw // 8
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,xyjk,lk->xyil", _JPEG_DCT, blocks, _JPEG_DCT)
        q = qtabs[min(ci, 1)]
        comp_coefs.append(np.round(coef / q).astype(np.int64))

    dc_specs = [_HUFF_DC_L] if gray else [_HUFF_DC_L, _HUFF_DC_C]
    ac_specs = [_HUFF_AC_L] if gray else [_HUFF_AC_L, _HUFF_AC_C]
    dc_enc = [{s: (c, l) for s, c, l in _huff_canonical(*spec)}
              for spec in dc_specs]
    ac_enc = [{s: (c, l) for s, c, l in _huff_canonical(*spec)}
              for spec in ac_specs]

    def write_block(bw_, ti: int, block: np.ndarray, pred: list, ci: int):
        diff = int(block[0]) - pred[ci]
        pred[ci] = int(block[0])
        size, code = _mag_bits(diff)
        hc, hl = dc_enc[ti][size]
        bw_.write(hc, hl)
        if size:
            bw_.write(code, size)
        run = 0
        last = 63
        while last > 0 and block[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(block[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                zc, zl = ac_enc[ti][0xF0]  # ZRL
                bw_.write(zc, zl)
                run -= 16
            size, code = _mag_bits(v)
            hc, hl = ac_enc[ti][(run << 4) | size]
            bw_.write(hc, hl)
            bw_.write(code, size)
            run = 0
        if last < 63:
            ec, el = ac_enc[ti][0x00]  # EOB
            bw_.write(ec, el)

    bw_ = _BitWriter()
    pred = [0] * ncomp
    n_mcu = mcux * mcuy
    rst = 0
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            bw_.marker(0xD0 + rst)
            rst = (rst + 1) % 8
            pred = [0] * ncomp
        my, mx = divmod(mi, mcux)
        for ci in range(ncomp):
            ch, cv = samp[ci]
            for by in range(cv):
                for bx in range(ch):
                    block = comp_coefs[ci][
                        my * cv + by, mx * ch + bx
                    ].reshape(64)[zz]
                    write_block(bw_, min(ci, 1), block, pred, ci)
    entropy = bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    for ti, q in enumerate(qtabs):
        zzq = q.reshape(64)[zz].astype(np.uint8).tobytes()
        out.append(seg(0xFFDB, bytes([ti]) + zzq))
    comp_spec = b"".join(
        bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], min(ci, 1)])
        for ci in range(ncomp)
    )
    out.append(seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + comp_spec))
    for cls, specs in ((0, dc_specs), (1, ac_specs)):
        for ti, (bits, vals) in enumerate(specs):
            out.append(seg(
                0xFFC4,
                bytes([(cls << 4) | ti]) + bytes(bits) + bytes(vals),
            ))
    if restart_interval:
        out.append(seg(0xFFDD, struct.pack(">H", restart_interval)))
    scan = b"".join(
        bytes([ci + 1, (min(ci, 1) << 4) | min(ci, 1)])
        for ci in range(ncomp)
    )
    out.append(seg(0xFFDA, bytes([ncomp]) + scan + b"\x00\x3f\x00"))
    out.append(entropy)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing; any other marker
    ends the segment (restart markers are consumed by the scan loop via
    ``restart()``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError("unexpected restart marker mid-block")
            else:
                raise ValueError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker; reset bit state."""
        self.acc = 0
        self.nbits = 0
        if not (self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


def _huff_decoder(bits: list[int], vals: list[int]) -> dict:
    return {(l, c): s for s, c, l in _huff_canonical(bits, vals)}


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG → uint8 HxW (grayscale) or HxWx3 RGB.
    Handles 4:4:4 / 4:2:0 / 4:2:2 (h,v ∈ {1,2}), restart intervals,
    byte stuffing. Progressive/arithmetic/12-bit → UnsupportedCodec."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_order: list[dict] = []

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data")
        (seg_len,) = struct.unpack(">H", payload[pos:pos + 2])
        body = payload[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise UnsupportedCodec("16-bit quant tables")
                tab = np.zeros(64, dtype=np.float64)
                tab[_JPEG_ZZ] = np.frombuffer(
                    body[i + 1:i + 65], dtype=np.uint8
                )
                qtabs[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                (dc_tabs if cls == 0 else ac_tabs)[th] = _huff_decoder(
                    bits, vals
                )
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline-ish)
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise UnsupportedCodec(f"{prec}-bit JPEG")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                ch, cv = hv >> 4, hv & 0xF
                if ch not in (1, 2) or cv not in (1, 2):
                    raise UnsupportedCodec(f"sampling {ch}x{cv}")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedCodec("non-baseline JPEG (progressive/"
                                   "arithmetic/hierarchical)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for si in range(ns):
                cid, tt = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cid)
                scan_order.append(
                    {**comp, "dc": tt >> 4, "ac": tt & 0xF}
                )
            pos += seg_len
            break
        pos += seg_len
    if not scan_order or not h:
        raise ValueError("missing SOF/SOS")
    if len(scan_order) not in (1, 3):
        raise UnsupportedCodec(f"{len(scan_order)}-component JPEG")

    hmax = max(c["h"] for c in scan_order)
    vmax = max(c["v"] for c in scan_order)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in scan_order:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.float64)

    reader = _BitReader(payload, pos)
    pred = [0] * len(scan_order)
    n_mcu = mcux * mcuy
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            reader.restart()
            pred = [0] * len(scan_order)
        my, mx = divmod(mi, mcux)
        for ci, c in enumerate(scan_order):
            dct = dc_tabs[c["dc"]]
            act = ac_tabs[c["ac"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, dtype=np.float64)
                    size = _huff_decode(reader, dct)
                    diff = _extend(reader.receive(size), size) if size else 0
                    pred[ci] += diff
                    blk[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(reader, act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflow")
                        blk[k] = _extend(reader.receive(s), s)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coef"][row * c["bw"] + col] = blk

    planes = []
    for c in scan_order:
        q = qtabs[c["tq"]]
        de = np.zeros((c["coef"].shape[0], 64), dtype=np.float64)
        de[:, _JPEG_ZZ] = c["coef"]  # inverse zigzag
        blocks = de.reshape(-1, 8, 8) * q
        pix = np.einsum("ji,xjk,kl->xil", _JPEG_DCT, blocks, _JPEG_DCT)
        pix = pix.reshape(c["bh"], c["bw"], 8, 8).transpose(0, 2, 1, 3)
        plane = pix.reshape(c["bh"] * 8, c["bw"] * 8) + 128.0
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [y + 1.402 * cr,
         y - 0.344136 * cb - 0.714136 * cr,
         y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
