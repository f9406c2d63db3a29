"""Mergeable corpus sketches: heavy hitters and approximate distinct.

At 100 TB, "what are the most frequent tokens" and "how many distinct
values does this column hold" are the two profiling questions every
curation run asks first. Both are answered here with MERGEABLE partials
(the map-side combiner shape every other wide stage in this repo uses),
so the shuffle moves per-(batch, key) summaries — never the corpus:

- ``corpus_top_terms``: exact global top-k terms. Per-batch term-count
  combiner → term-bucketed sum (each term lives wholly in one bucket,
  so a per-bucket top-k is globally EXACT, not approximate) → one final
  reduce over ≤ k·num_buckets rows.
- ``approx_distinct_kmv``: K-Minimum-Values distinct-count sketch
  (Bar-Yossef et al. 2002, the classic mergeable distinct sketch): keep
  the k smallest md5 values of the column; if fewer than k distinct
  hashes exist the answer is exact, else estimate (k-1)/v_k where v_k
  is the k-th smallest hash mapped to (0,1]. md5 (via
  ``stages/fasthash``) keeps the rule SQL-replayable, so the driver
  oracle recomputes the IDENTICAL estimate — the correctness gate pins
  the estimator, not a tolerance band.

Reference scope note: the reference engine (Skreen5hot/GraphForge) has
no sketching surface — these are the beyond-reference scale operators
the build brief asks for alongside dedup/ANN.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import bucket_tag
from .fasthash import hex_prefix_int, md5_hex

__all__ = ["corpus_top_terms", "approx_distinct_kmv",
           "approx_distinct_hll", "approx_distinct_hll_grouped",
           "count_min_sketch", "cms_estimate"]

# fraction denominator: 10 hex chars = 40 bits. Small enough that
# (k-1)·16^10 stays far inside double's 2^53 exact-integer range (so
# numpy and DuckDB round the division identically), large enough that
# v_k collisions at the prefix are negligible for k ≤ 4096.
_PREFIX_HEX = 10
_PREFIX_DEN = float(16 ** _PREFIX_HEX)


def corpus_top_terms(
    docs: "ray.data.Dataset",
    k: int = 20,
    text_col: str = "text",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Exact global top-k most frequent whitespace terms → Dataset
    (rank:int64, term, count:int64), ties broken by term asc (fully
    deterministic — SQL ``ORDER BY count DESC, term LIMIT k`` replays
    it exactly).

    Three narrow stages: per-batch count combiner (corpus text never
    leaves the batch), term-bucket sum + per-bucket top-k (exact: a
    term's total lives wholly in its hash bucket), and one final reduce
    over the ≤ k·num_buckets survivors."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1: {k}")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[text_col].fillna("").str.findall(r"\S+").explode().dropna()
        if ex.empty:
            return pd.DataFrame(
                {"term": pd.Series([], dtype=object),
                 "count": pd.Series([], dtype=np.int64),
                 "_bucket": pd.Series([], dtype="int32")}
            )
        g = (
            ex.to_frame("term")
            .groupby("term", as_index=False)
            .size()
            .rename(columns={"size": "count"})
        )
        g["count"] = g["count"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "term", num_buckets))

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("term", as_index=False)["count"].sum()
        t["count"] = t["count"].astype(np.int64)
        t = t.sort_values(["count", "term"],
                          ascending=[False, True]).head(k)
        # constant reduce key: survivors are ≤ k per bucket
        return t.assign(_one=np.int8(0))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        t = (
            g.sort_values(["count", "term"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )
        t["rank"] = np.arange(1, len(t) + 1, dtype=np.int64)
        return t[["rank", "term", "count"]]

    return (
        docs.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .groupby("_one")
        .map_groups(final_topk, batch_format="pandas")
    )


def approx_distinct_kmv(
    ds: "ray.data.Dataset",
    col: str,
    k: int = 256,
) -> pd.DataFrame:
    """KMV (k-minimum-values) distinct-count estimate of ``ds[col]`` →
    one-row DataFrame (k:int64, n_hashes:int64, est_distinct:int64).

    Rule (SQL-replayable, see the driver oracle): h = md5 of the
    value's string cast; keep the k lexicographically smallest DISTINCT
    hex digests (fixed-width lowercase hex, so string order = numeric
    order). If fewer than k distinct digests exist, ``est_distinct`` is
    their exact count; else est = floor((k-1) / (v_k / 16^10)) with v_k
    = the integer value of the k-th smallest digest's first 10 hex
    chars. Both sides divide the same two exactly-representable
    doubles, so the floor is bit-identical.

    Shape: per-batch partial (≤ k distinct digests each — nulls
    excluded), one constant-key reduce over ≤ k·num_blocks short rows.
    The estimator's partials are mergeable, so this composes under
    union/incremental append without rescanning old shards."""
    if k < 2:
        raise ValueError(f"KMV needs k ≥ 2: {k}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[col].dropna()
        if vals.empty:
            return pd.DataFrame({"h": pd.Series([], dtype=object),
                                 "_one": pd.Series([], dtype=np.int8)})
        hx = md5_hex(vals.astype(str).to_numpy(dtype=object))
        hx = np.unique(hx)[:k]  # sorted ascending; keep k smallest
        return pd.DataFrame({"h": hx, "_one": np.int8(0)})

    def reduce_all(g: pd.DataFrame) -> pd.DataFrame:
        hx = np.unique(g["h"].to_numpy(dtype=object))
        n = len(hx)
        if n < k:
            est = n
        else:
            vk = int(hx[k - 1][:_PREFIX_HEX], 16)
            est = int(np.floor((k - 1) / (float(vk) / _PREFIX_DEN)))
        return pd.DataFrame(
            {"k": np.int64(k), "n_hashes": np.int64(min(n, k)),
             "est_distinct": np.int64(est)},
            index=[0],
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_one")
        .map_groups(reduce_all, batch_format="pandas")
    )
    df = out.to_pandas()
    if df.empty or "k" not in df.columns:
        # all-empty/all-null input → zero groups; honor the documented
        # one-row (k, n_hashes, est_distinct) contract
        return pd.DataFrame(
            {"k": [np.int64(k)], "n_hashes": [np.int64(0)],
             "est_distinct": [np.int64(0)]}
        )
    for c in ("k", "n_hashes", "est_distinct"):
        df[c] = df[c].astype(np.int64)
    return df.reset_index(drop=True)


def approx_distinct_hll(
    ds: "ray.data.Dataset",
    col: str,
    b: int = 10,
    salt: str = "graft-hll",
) -> pd.DataFrame:
    """HyperLogLog distinct-count estimate (Flajolet et al. 2007,
    public) → one-row DataFrame (m:int64, est:float64) with
    est = FLOOR(1e4·E)/1e4 (the float-parity convention).

    Register rule (SQL-replayable — see the driver oracle): over the
    40-bit md5 prefix h of ``salt|value``, register index = the top
    ``b`` bits, register value M = position of the leftmost 1 in the
    remaining w = 40−b bits (w − ⌊log2(rem)⌋; rem = 0 → w+1).
    Estimator: α_m·m²/Σ 2^−M over all m registers (absent = 0), with
    the standard small-range correction E ≤ 2.5m ∧ V>0 →
    m·ln(m/V). The hash space (2^40) dwarfs any fixture count, so the
    large-range branch is never taken.

    Shape: per-block partial = m-byte register maxes (mergeable bytes
    row); the driver maxes block partials — the sketch, not the keys,
    moves. Complements ``approx_distinct_kmv``: HLL registers are
    constant-size under union/incremental append."""
    if not (4 <= b <= 16):
        raise ValueError(f"b must be in [4, 16]: {b}")
    m = 1 << b
    w = 40 - b

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].dropna()
        regs = np.zeros(m, np.uint8)
        if len(v):
            keys = np.array(
                [f"{salt}|{x}" for x in v.astype(str)], dtype=object)
            h = hex_prefix_int(md5_hex(keys), 10)
            idx = (h >> w).astype(np.int64)
            rem = (h & ((1 << w) - 1)).astype(np.int64)
            rho = np.where(
                rem == 0, w + 1,
                w - np.floor(np.log2(np.where(rem == 0, 1, rem)))
            ).astype(np.uint8)
            np.maximum.at(regs, idx, rho)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    regs = np.zeros(m, np.uint8)
    for row in ds.map_batches(
            partial, batch_format="pandas").take_all():
        regs = np.maximum(regs, np.frombuffer(row["regs"], np.uint8))
    M = regs.astype(np.float64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -M))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return pd.DataFrame({
        "m": pd.Series([m], dtype="int64"),
        "est": [float(np.floor(est * 1e4) / 1e4)],
    })


def _cms_slots(values: np.ndarray, row: int, width: int,
               salt: str) -> np.ndarray:
    """Slot index of each value under sketch row ``row`` — md5 of
    ``{salt}{row}|{value}`` 40-bit prefix mod width (the same
    SQL-replayable rule every md5-keyed stage here uses)."""
    keys = np.array([f"{salt}{row}|{v}" for v in values], dtype=object)
    return (hex_prefix_int(md5_hex(keys), _PREFIX_HEX)
            % np.int64(width)).astype(np.int64)


def count_min_sketch(
    ds: "ray.data.Dataset",
    col: str,
    width: int = 64,
    depth: int = 3,
    salt: str = "graft-cms",
) -> pd.DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, public) of the
    frequency distribution of ``ds[col]`` → DataFrame (row:int64,
    slot:int64, count:int64), one entry per NON-ZERO counter (absent
    (row, slot) pairs are zero).

    Counters are additive, so the shuffle shape is the repo's standard
    combiner: each block folds its rows into ≤ depth·width partial
    counter rows (np.bincount per sketch row — the column's values
    never leave the block), then one (row, slot) groupby-sum merges
    partials. The merged sketch is depth·width rows — driver-sized by
    construction (the whole point of the sketch), and mergeable across
    shards/snapshots without rescanning (same property as the KMV/HLL
    sketches above).

    Nulls are excluded (COUNT(col) semantics, matching KMV/HLL)."""
    if width < 2 or depth < 1:
        raise ValueError(f"need width ≥ 2, depth ≥ 1: {width}×{depth}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].dropna()
        if v.empty:
            return pd.DataFrame(
                {"row": pd.Series([], dtype=np.int64),
                 "slot": pd.Series([], dtype=np.int64),
                 "count": pd.Series([], dtype=np.int64)})
        # hash DISTINCT values once per row, scale by their counts
        vc = v.astype(str).value_counts()
        vals = vc.index.to_numpy(dtype=object)
        cnts = vc.to_numpy(dtype=np.int64)
        rows, slots, counts = [], [], []
        for i in range(depth):
            sl = _cms_slots(vals, i, width, salt)
            binned = np.bincount(sl, weights=cnts, minlength=width)
            nz = np.nonzero(binned)[0]
            rows.append(np.full(len(nz), i, dtype=np.int64))
            slots.append(nz.astype(np.int64))
            counts.append(binned[nz].astype(np.int64))
        return pd.DataFrame({"row": np.concatenate(rows),
                             "slot": np.concatenate(slots),
                             "count": np.concatenate(counts)})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["row", "slot"], as_index=False)["count"].sum()
        for c in ("row", "slot", "count"):
            out[c] = out[c].astype(np.int64)
        return out

    df = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("row")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    if df.empty or "row" not in df.columns:
        return pd.DataFrame({"row": pd.Series([], dtype=np.int64),
                             "slot": pd.Series([], dtype=np.int64),
                             "count": pd.Series([], dtype=np.int64)})
    for c in ("row", "slot", "count"):
        df[c] = df[c].astype(np.int64)
    return (df.sort_values(["row", "slot"])
            .reset_index(drop=True))


def cms_estimate(
    sketch: pd.DataFrame,
    keys,
    width: int = 64,
    depth: int = 3,
    salt: str = "graft-cms",
) -> pd.DataFrame:
    """Point-frequency estimates from a ``count_min_sketch`` table →
    DataFrame (key, est:int64), est = min over sketch rows of the
    key's counter (the CM upper-bound estimator; never under-counts).
    ``width``/``depth``/``salt`` must match the sketch build."""
    keys = np.array([str(k) for k in keys], dtype=object)
    counters = {(int(r), int(s)): int(c)
                for r, s, c in sketch[["row", "slot", "count"]]
                .itertuples(index=False)}
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(depth):
        sl = _cms_slots(keys, i, width, salt)
        got = np.array([counters.get((i, int(s)), 0) for s in sl],
                       dtype=np.int64)
        est = np.minimum(est, got)
    return pd.DataFrame({"key": keys, "est": est})


def approx_distinct_hll_grouped(
    ds: "ray.data.Dataset",
    key: str,
    col: str,
    b: int = 10,
    salt: str = "graft-hll",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-group HyperLogLog distinct-count estimates → Dataset
    (``key``, m:int64, est:float64) — ``approx_distinct_hll`` with one
    register row PER GROUP (same register rule, same estimator, same
    FLOOR(1e4·E)/1e4 parity convention; rows with a null key or null
    value are dropped).

    Shape (fully distributed — unlike the global form, the sketch never
    touches the driver): per batch, registers for ALL groups build in
    one vectorized ``np.maximum.at`` over a (groups × m) matrix → one
    m-byte row per (batch, group); ONE key-bucket shuffle; per bucket a
    ``np.maximum.reduceat`` fold per key and the vectorized estimator.
    The shuffle moves (batch·group) register rows, never values."""
    if not (4 <= b <= 16):
        raise ValueError(f"b must be in [4, 16]: {b}")
    m = 1 << b
    w = 40 - b

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, col]].dropna()
        if not len(d):
            return pd.DataFrame({key: pd.Series([], dtype=object),
                                 "regs": pd.Series([], dtype=object),
                                 "_bucket": pd.Series([], dtype="int32")})
        codes, uniq = pd.factorize(d[key], sort=False)
        keys = np.array(
            [f"{salt}|{x}" for x in d[col].astype(str)], dtype=object)
        h = hex_prefix_int(md5_hex(keys), _PREFIX_HEX)
        idx = (h >> w).astype(np.int64)
        rem = (h & ((1 << w) - 1)).astype(np.int64)
        rho = np.where(
            rem == 0, w + 1,
            w - np.floor(np.log2(np.where(rem == 0, 1, rem)))
        ).astype(np.uint8)
        regs = np.zeros((len(uniq), m), np.uint8)
        np.maximum.at(regs, (codes, idx), rho)
        out = pd.DataFrame({
            key: uniq.astype(object),
            "regs": [r.tobytes() for r in regs],
        })
        return out.assign(_bucket=bucket_tag(out, key, num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key, kind="stable")
        mat = np.frombuffer(
            b"".join(g["regs"]), np.uint8).reshape(-1, m)
        ks = g[key].to_numpy()
        starts = np.flatnonzero(
            np.r_[True, ks[1:] != ks[:-1]]) if len(ks) else np.array(
            [], dtype=np.int64)
        folded = np.maximum.reduceat(mat, starts, axis=0)
        M = folded.astype(np.float64)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.power(2.0, -M), axis=1)
        zeros = (folded == 0).sum(axis=1)
        corr = np.where(zeros > 0,
                        m * np.log(m / np.where(zeros > 0, zeros, 1)),
                        est)
        est = np.where((est <= 2.5 * m) & (zeros > 0), corr, est)
        return pd.DataFrame({
            key: ks[starts],
            "m": np.full(len(starts), m, dtype=np.int64),
            "est": np.floor(est * 1e4) / 1e4,
        })

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )
