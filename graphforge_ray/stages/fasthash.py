"""Vectorized MD5 for short row keys.

The sampling / quota / shuffle stages key every row by
``md5(str(id) + ':' + salt)`` because the rule is SQL-replayable
(DuckDB ``md5()``) — but a per-row ``hashlib.md5`` Python loop is the
dominant cost of those stages at corpus scale (r3 verdict, "What's
wrong" #2). Two vectorized backends, digest-identical to hashlib:

* **DuckDB kernel** (primary): the in-process DuckDB ``md5()`` C
  function over one Arrow column — literally the same function the SQL
  oracles run. ``PRAGMA threads=1`` so a Ray worker never spawns its
  own thread pool (the POLARS_MAX_THREADS oversubscription lesson,
  CLAUDE.md); one cached connection per worker process.
* **numpy fallback**: from-scratch single-block MD5 (RFC 1321 public
  constants) — every key here is short (int64 id + ':' + salt < 56
  bytes), so each message fits ONE 64-byte block and the 64 rounds
  vectorize as uint32 lane arithmetic, chunked to stay L2-resident.
  Rows > 55 bytes fall back to hashlib row-by-row.

Measured (this host, 1M int keys, tests/test_fasthash.py bench):
hashlib loop 1.7 s → duckdb 0.38 s (~4.5×), numpy fallback ~0.9 s.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["md5_bytes", "md5_hex", "md5_hex_keyed", "hex_prefix_int"]

# ---------------------------------------------------------------------------
# DuckDB backend (primary)
# ---------------------------------------------------------------------------

_DUCK_CON = None


def _duck_con():
    global _DUCK_CON
    if _DUCK_CON is None:
        import duckdb

        con = duckdb.connect()
        con.execute("PRAGMA threads=1")
        _DUCK_CON = con
    return _DUCK_CON


def _md5_hex_duckdb(keys, salt: str) -> np.ndarray:
    """md5(CAST(k AS VARCHAR) || ':salt') via DuckDB → object ndarray of
    32-char hex str, in input row order (projection-only query;
    preserve_insertion_order is DuckDB's default)."""
    import pyarrow as pa

    con = _duck_con()
    tbl = pa.table({"k": pa.array(keys)})
    con.register("_fasthash_in", tbl)
    try:
        out = con.execute(
            "SELECT md5(CAST(k AS VARCHAR) || ?) AS h FROM _fasthash_in",
            [f":{salt}"],
        ).fetchnumpy()["h"]
    finally:
        con.unregister("_fasthash_in")
    return np.asarray(out, dtype=object)


# ---------------------------------------------------------------------------
# numpy fallback: from-scratch single-block MD5 (RFC 1321)
# ---------------------------------------------------------------------------

_K = np.floor(np.abs(np.sin(np.arange(1, 65))) * (2.0**32)).astype(
    np.uint64
).astype(np.uint32)
_S = [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 \
    + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4
_INIT = (
    np.uint32(0x67452301),
    np.uint32(0xEFCDAB89),
    np.uint32(0x98BADCFE),
    np.uint32(0x10325476),
)
_HEXD = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
_CHUNK = 65536  # lanes per rounds pass: 64k × 4 B × ~6 live arrays ≈ L2


def _md5_rounds(m: np.ndarray) -> np.ndarray:
    """(n, 16) uint32 message words → (n, 16) uint8 digests. In-place
    temps; the boolean functions use the xor forms (F = d ^ (b & (c ^
    d)) etc.) to save one temporary per round."""
    n = m.shape[0]
    a = np.full(n, _INIT[0])
    b = np.full(n, _INIT[1])
    c = np.full(n, _INIT[2])
    d = np.full(n, _INIT[3])
    t1 = np.empty(n, np.uint32)
    t2 = np.empty(n, np.uint32)
    for i in range(64):
        if i < 16:
            np.bitwise_xor(c, d, out=t1)
            np.bitwise_and(t1, b, out=t1)
            np.bitwise_xor(t1, d, out=t1)
            g = i
        elif i < 32:
            np.bitwise_xor(b, c, out=t1)
            np.bitwise_and(t1, d, out=t1)
            np.bitwise_xor(t1, c, out=t1)
            g = (5 * i + 1) % 16
        elif i < 48:
            np.bitwise_xor(b, c, out=t1)
            np.bitwise_xor(t1, d, out=t1)
            g = (3 * i + 5) % 16
        else:
            np.bitwise_not(d, out=t1)
            np.bitwise_or(t1, b, out=t1)
            np.bitwise_xor(t1, c, out=t1)
            g = (7 * i) % 16
        np.add(t1, a, out=t1)
        np.add(t1, _K[i], out=t1)
        np.add(t1, m[:, g], out=t1)
        s = np.uint32(_S[i])
        s2 = np.uint32(32 - _S[i])
        np.left_shift(t1, s, out=t2)
        np.right_shift(t1, s2, out=t1)
        np.bitwise_or(t1, t2, out=t1)
        np.add(t1, b, out=t1)
        # rotate registers; the retired 'a' buffer becomes next round's t1
        a, b, c, d, t1 = d, t1, b, c, a
    out = np.empty((n, 4), dtype="<u4")
    out[:, 0] = a + _INIT[0]
    out[:, 1] = b + _INIT[1]
    out[:, 2] = c + _INIT[2]
    out[:, 3] = d + _INIT[3]
    return out.view(np.uint8).reshape(n, 16)


def md5_bytes(values) -> np.ndarray:
    """MD5 digests of a sequence of str/bytes → (N, 16) uint8 (numpy
    single-block path; rows > 55 bytes via hashlib)."""
    msgs = [
        v if isinstance(v, bytes) else str(v).encode("utf-8")
        for v in values
    ]
    n = len(msgs)
    if n == 0:
        return np.empty((0, 16), dtype=np.uint8)
    lens = np.fromiter((len(m) for m in msgs), dtype=np.int64, count=n)
    long_rows = lens > 55
    # dtype='S56' zero-pads on the right (and would TRUNCATE longer
    # messages — those rows are overwritten by the hashlib fallback)
    buf = np.zeros((n, 64), dtype=np.uint8)
    s = np.array(msgs, dtype="S56")
    buf[:, :56] = s.view(np.uint8).reshape(n, 56)
    idx = np.nonzero(~long_rows)[0]
    buf[idx, lens[idx]] = 0x80
    bitlen = (lens.astype(np.uint64) * 8).astype("<u8")
    buf[:, 56:64] = bitlen.view(np.uint8).reshape(n, 8)
    words = buf.view("<u4").reshape(n, 16)
    digests = np.empty((n, 16), dtype=np.uint8)
    for i in range(0, n, _CHUNK):
        digests[i : i + _CHUNK] = _md5_rounds(
            np.ascontiguousarray(words[i : i + _CHUNK])
        )
    if long_rows.any():
        for i in np.nonzero(long_rows)[0]:
            digests[i] = np.frombuffer(
                hashlib.md5(msgs[i]).digest(), dtype=np.uint8
            )
    return digests


def _to_hex(digests: np.ndarray) -> np.ndarray:
    # build the 'U32' array directly from uint32 codepoints — a U32
    # element IS 32 little-endian uint32 codepoints, so a contiguous
    # (n, 32) uint32 array views as (n, 1) U32 at zero cost. The
    # previous .view('S32').astype('U32') decode was ~3.3 s/1M on this
    # host (the CLAUDE.md S→U astype trap); this path is ~0.01 s/1M.
    n = digests.shape[0]
    codes = np.empty((n, 32), dtype=np.uint32)
    codes[:, 0::2] = _HEXD[digests >> 4]
    codes[:, 1::2] = _HEXD[digests & 0xF]
    return codes.view("U32").ravel()


def _md5_hex_duckdb_str(values) -> np.ndarray:
    """md5(v) over a str column via DuckDB (hashes the UTF-8 bytes,
    identical to hashlib.md5(v.encode())) → object ndarray of 32-char
    hex str, in input row order."""
    import pyarrow as pa

    con = _duck_con()
    tbl = pa.table({"v": pa.array(values, type=pa.string())})
    con.register("_fasthash_in", tbl)
    try:
        out = con.execute(
            "SELECT md5(v) AS h FROM _fasthash_in"
        ).fetchnumpy()["h"]
    finally:
        con.unregister("_fasthash_in")
    return np.asarray(out, dtype=object)


def md5_hex(values) -> np.ndarray:
    """MD5 hex digests of a sequence of str/bytes → (N,) str array
    (drop-in for ``[hashlib.md5(v).hexdigest() for v in values]``).
    str inputs take the DuckDB C kernel (primary); bytes or a missing
    DuckDB fall back to the numpy backend. dtype is object (duckdb)
    or '<U32' (numpy) — both compare equal as str."""
    arr = np.asarray(values, dtype=object)
    if arr.size and isinstance(arr.flat[0], str):
        try:
            return _md5_hex_duckdb_str(arr)
        except Exception:
            pass
    return _to_hex(md5_bytes(values))


def md5_hex_keyed(keys, salt: str) -> np.ndarray:
    """``md5(str(key) + ':' + salt)`` hex digests — the shared keying
    rule of hash_split / deterministic_shuffle / per_source_quota
    (SQL: ``md5(CAST(k AS VARCHAR) || ':salt')``). DuckDB kernel with
    numpy fallback; returns an object ndarray of 32-char hex str."""
    try:
        return _md5_hex_duckdb(keys, salt)
    except Exception:
        suffix = f":{salt}".encode()
        return md5_hex(
            [str(k).encode() + suffix for k in keys]
        ).astype(object)


def hex_prefix_int(hexes: np.ndarray, n_hex_chars: int) -> np.ndarray:
    """int value of the first ``n_hex_chars`` of each hex digest —
    ``int(h[:n], 16)`` vectorized over an (N,) str array."""
    # 'U<n>'/'S<n>' casts truncate to the first n chars — C-speed slice
    pre = np.asarray(hexes, dtype=f"U{n_hex_chars}")
    codes = pre.view(np.uint32).reshape(-1, n_hex_chars)
    # '0'-'9' → 0-9, 'a'-'f' → 10-15
    nib = np.where(codes >= ord("a"), codes - ord("a") + 10,
                   codes - ord("0")).astype(np.int64)
    val = np.zeros(pre.shape[0], dtype=np.int64)
    for i in range(n_hex_chars):
        val = val * 16 + nib[:, i]
    return val
