"""Bloom-filter membership — the broadcast-friendly decontamination /
blocklist primitive (Bloom 1970, public; the form Dolma/CCNet-scale
pipelines use when the probe set is too large to ship raw).

``contamination_flags`` / ``ngram_overlap_flags`` broadcast the
benchmark's raw grams — right when eval sets are bounded. When the
blocklist is itself corpus-scale (all previously-trained shards, a
URL blocklist, another corpus's n-grams), the scale-correct shape is:
build the BITSET distributed (one pass over the key Dataset, per-block
partial bitsets OR-reduced), broadcast the fixed-size bytes once, and
scan the corpus map-side. False positives are an explicit, DETERMINED
property: every bit is a pure md5 function of (salt, j, key), so a
SQL oracle replays membership — including the false positives —
exactly.

bit_j(key) = md5("<salt>|<j>|<key>")[:10 hex] % m_bits, j ∈ [0, k).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .fasthash import hex_prefix_int, md5_hex

__all__ = ["build_bloom", "bloom_ngram_flags"]


def _positions(vals: np.ndarray, j: int, m_bits: int,
               salt: str) -> np.ndarray:
    keys = np.array([f"{salt}|{j}|{v}" for v in vals], dtype=object)
    return (hex_prefix_int(md5_hex(keys), 10) % m_bits).astype(np.int64)


def build_bloom(
    keys: "ray.data.Dataset",
    col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    salt: str = "graft-bloom",
) -> bytes:
    """One distributed pass over the key Dataset → the filter as
    ``m_bits/8`` bytes. Per-block partial bitsets OR-reduce on the
    driver (each partial is the fixed filter size — bound the block
    count, not the key count). ``m_bits`` must be a multiple of 8."""
    if m_bits < 8 or m_bits % 8:
        raise ValueError(f"m_bits must be a positive multiple of 8: "
                         f"{m_bits}")
    if k < 1:
        raise ValueError(f"k must be ≥ 1: {k}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[col].astype(str).to_numpy(dtype=object)
        bits = np.zeros(m_bits // 8, np.uint8)
        for j in range(k):
            pos = _positions(vals, j, m_bits, salt)
            np.bitwise_or.at(
                bits, pos // 8,
                np.left_shift(np.uint8(1),
                              (pos % 8).astype(np.uint8)))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    out = np.zeros(m_bits // 8, np.uint8)
    for row in keys.map_batches(
            partial, batch_format="pandas").take_all():
        out |= np.frombuffer(row["bits"], np.uint8)
    return out.tobytes()


def bloom_ngram_flags(
    docs: "ray.data.Dataset",
    bloom: bytes,
    n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 4,
    salt: str = "graft-bloom",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """→ docs + (n_grams, n_hit, contaminated) — a document is flagged
    when ANY of its distinct word n-grams tests positive in the bloom
    (all k bits set). Pure map-side: the filter ships once via
    ``ray.put``; the gram build is the flattened shifted-concat kernel
    of ``ngram_overlap_flags`` (no per-row Python)."""
    import ray as _ray

    if len(bloom) * 8 != m_bits:
        raise ValueError(
            f"bloom size {len(bloom)} bytes ≠ m_bits/8 = {m_bits // 8}")
    ref = _ray.put(bloom)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.frombuffer(_ray.get(ref), np.uint8)
        out = df.copy()
        words = df[text_col].fillna("").str.split()
        lens = words.str.len().to_numpy(np.int64)
        n_grams = np.zeros(len(df), dtype=np.int64)
        n_hit = np.zeros(len(df), dtype=np.int64)
        if lens.sum() > 0:
            flat = pd.Series(
                np.concatenate([np.asarray(w, dtype=object)
                                for w in words if len(w)]),
                dtype=object,
            )
            doc_idx = np.repeat(np.arange(len(df)), lens)
            gram = flat.copy()
            for sh in range(1, n):
                gram = gram + " " + flat.shift(-sh)
            ends = np.cumsum(lens)
            starts = ends - lens
            pos = np.arange(len(flat)) - np.repeat(starts, lens)
            valid = pos + n <= np.repeat(lens, lens)
            g = pd.DataFrame(
                {"d": doc_idx[valid],
                 "g": gram.to_numpy(object)[valid]}
            ).drop_duplicates()
            vals = g["g"].to_numpy(dtype=object)
            ok = np.ones(len(vals), bool)
            for j in range(k):
                p = _positions(vals, j, m_bits, salt)
                ok &= (
                    (bits[p // 8] >> (p % 8).astype(np.uint8)) & 1
                ).astype(bool)
            g["hit"] = ok
            agg = g.groupby("d").agg(
                n_grams=("g", "size"), n_hit=("hit", "sum"))
            n_grams[agg.index.to_numpy()] = agg["n_grams"].to_numpy()
            n_hit[agg.index.to_numpy()] = agg["n_hit"].to_numpy()
        out["n_grams"] = n_grams
        out["n_hit"] = n_hit
        out["contaminated"] = (n_hit > 0).astype(np.int64)
        return out

    return docs.map_batches(scan, batch_format="pandas")
