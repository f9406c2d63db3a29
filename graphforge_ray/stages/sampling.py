"""Deterministic sampling / splitting for training-data pipelines.

``hash_split`` assigns every row to train/test by a keyed md5 of its id —
a pure function of (key, salt), so the split is REPRODUCIBLE across runs,
processes and cluster sizes (never ``random_sample`` for persistent
splits: resharding would reassign rows), and rows added later don't
perturb existing assignments (the property that matters when a 100 TB
corpus grows incrementally). Map-side only — no shuffle.

The assignment rule is intentionally SQL-expressible (md5 hex prefix
compared against a threshold) so the split is oracle-checkable:

    bucket = md5(str(key) + ':' + salt)[:4]   # 16-bit hex
    test   = bucket < format(int(65536 * pct / 100), '04x')

(valid for 0 < pct < 100; the boundary percentages are clamped — see
``_threshold_hex`` — because pct=100 would format a 5-char threshold
that breaks the 4-char lexicographic compare).
"""

from __future__ import annotations

import hashlib

import pandas as pd

import ray.data

__all__ = ["hash_split_column", "hash_split"]


def _threshold_hex(test_pct: float) -> str:
    """4-hex-char threshold; boundary pcts are clamped so the 4-char
    lexicographic compare stays valid (pct=100 would otherwise format as
    5-char '10000' and send everything to train)."""
    t = int(65536 * test_pct / 100.0)
    if t <= 0:
        return "0000"   # bucket < '0000' is never true → all train
    if t >= 65536:
        return "zzzz"   # every hex bucket < 'zzzz' → all test
    return format(t, "04x")


def hash_split_column(
    df: pd.DataFrame,
    key_col: str = "doc_id",
    test_pct: float = 10.0,
    salt: str = "graft-split",
) -> pd.DataFrame:
    """map_batches body: adds a ``split`` column ('train' | 'test')."""
    thresh = _threshold_hex(test_pct)
    buckets = [
        hashlib.md5(f"{k}:{salt}".encode()).hexdigest()[:4]
        for k in df[key_col]
    ]
    out = df.copy()
    out["split"] = ["test" if b < thresh else "train" for b in buckets]
    return out


def hash_split(
    ds: "ray.data.Dataset",
    key_col: str = "doc_id",
    test_pct: float = 10.0,
    salt: str = "graft-split",
) -> "ray.data.Dataset":
    """→ the Dataset with a deterministic ``split`` column (map-side)."""
    return ds.map_batches(
        lambda df: hash_split_column(df, key_col, test_pct, salt),
        batch_format="pandas",
    )
