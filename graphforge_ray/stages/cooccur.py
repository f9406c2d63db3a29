"""Windowed term co-occurrence counts and PMI.

The lexical-statistics primitive behind collocation mining, phrase
detection (word2vec-style "New_York"), and distributional-similarity
features: count unordered term pairs co-occurring within ±``window``
token positions, then score each pair with pointwise mutual
information::

    pmi(x, y) = ln( p(x,y) / (p(x) · p(y)) )
              = ln(c_xy / P) − ln(c_x / N) − ln(c_y / N)

with N = total tokens, P = total windowed pair slots. Every count is
an integer and every ln is a single op evaluated in the identical
expression shape on both engines, so the oracle matches exactly up to
the FLOOR-1e-4 guard (no order-sensitive float sums anywhere).

Distributed shape (the lm.py pattern — the vocabulary and the pair
table flow through shuffles, never the driver):

1. unigram counts: map-side combiner → term-bucket reduce; N = one
   scalar.
2. pair counts: per batch, pairs are built VECTORIZED (array shifts
   for offsets 1..window, same-doc mask, LEAST/GREATEST normalization)
   → map-side combiner → pair-bucket reduce; P = one scalar.
3. each pair row joins c_x then c_y through ``bindings_join`` on the
   term; ``min_count`` prunes BEFORE the joins (the classic tail cut —
   counted nowhere because it is a *parameter*, not a silent cap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import bindings_join, bucket_tag, pair_bucket_tag, snap_lineage
from .lm import _doc_words

__all__ = ["cooccurrence_pmi", "textrank_keywords"]


def _doc_pairs(
    df: pd.DataFrame, id_col: str, text_col: str, window: int
) -> pd.DataFrame:
    """Unordered within-window pairs, one row per position pair."""
    w = _doc_words(df, id_col, text_col)
    if w.empty:
        return pd.DataFrame({"x": [], "y": []}, dtype=object)
    ids = w[id_col].to_numpy()
    toks = w["w"].to_numpy(dtype=object)
    xs, ys = [], []
    for off in range(1, window + 1):
        if off >= len(toks):
            break
        same = ids[:-off] == ids[off:]
        a = toks[:-off][same]
        b = toks[off:][same]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        xs.append(lo)
        ys.append(hi)
    if not xs:
        return pd.DataFrame({"x": [], "y": []}, dtype=object)
    return pd.DataFrame(
        {"x": np.concatenate(xs), "y": np.concatenate(ys)}
    )


def cooccurrence_pmi(
    docs: "ray.data.Dataset",
    window: int = 3,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ Dataset (x, y, c_xy:int64, pmi:float64): every unordered term
    pair (x ≤ y) co-occurring within ±``window`` positions at least
    ``min_count`` times, PMI FLOOR-truncated at 1e-4."""
    if window < 1 or min_count < 1:
        raise ValueError(
            f"window/min_count must be ≥ 1: {window}/{min_count}"
        )

    # ---- unigram counts (term-bucketed) + N --------------------------
    def uni_combine(df: pd.DataFrame) -> pd.DataFrame:
        w = _doc_words(df, id_col, text_col)
        g = w.groupby("w", as_index=False).size().rename(
            columns={"size": "c1"}
        )
        g["c1"] = g["c1"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "w", num_buckets))

    uni = snap_lineage(
        docs.map_batches(uni_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.groupby("w", as_index=False)["c1"].sum(),
            batch_format="pandas",
        )
    )
    n_parts = uni.map_batches(
        lambda df: pd.DataFrame({"n": [np.int64(df["c1"].sum())]}),
        batch_format="pandas",
    ).to_pandas()
    n_tokens = float(n_parts["n"].sum()) if "n" in n_parts.columns else 0.0
    if n_tokens == 0:
        raise ValueError("cooccurrence_pmi: no tokens")

    # ---- pair counts (pair-bucketed) + P ------------------------------
    def pair_combine(df: pd.DataFrame) -> pd.DataFrame:
        p = _doc_pairs(df, id_col, text_col, window)
        g = p.groupby(["x", "y"], as_index=False).size().rename(
            columns={"size": "c_xy"}
        )
        g["c_xy"] = g["c_xy"].astype(np.int64)
        return g.assign(
            _bucket=pair_bucket_tag(g, ["x", "y"], num_buckets)
        )

    pairs = snap_lineage(
        docs.map_batches(pair_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.groupby(["x", "y"], as_index=False)["c_xy"].sum(),
            batch_format="pandas",
        )
    )
    p_parts = pairs.map_batches(
        lambda df: pd.DataFrame({"p": [np.int64(df["c_xy"].sum())]}),
        batch_format="pandas",
    ).to_pandas()
    n_pairs = float(p_parts["p"].sum()) if "p" in p_parts.columns else 0.0
    if n_pairs == 0:
        raise ValueError("cooccurrence_pmi: no pairs (window too small?)")

    # min_count prunes BEFORE the two unigram joins
    kept = pairs.map_batches(
        lambda df: df.loc[df["c_xy"] >= min_count],
        batch_format="pandas",
    )

    with_x = bindings_join(
        kept,
        uni.map_batches(
            lambda df: df.rename(columns={"w": "x", "c1": "c_x"}),
            batch_format="pandas",
        ),
        on=["x"],
        num_buckets=num_buckets,
    )
    with_y = bindings_join(
        with_x,
        uni.map_batches(
            lambda df: df.rename(columns={"w": "y", "c1": "c_y"}),
            batch_format="pandas",
        ),
        on=["y"],
        num_buckets=num_buckets,
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        c_xy = df["c_xy"].astype(np.float64).to_numpy()
        c_x = df["c_x"].astype(np.float64).to_numpy()
        c_y = df["c_y"].astype(np.float64).to_numpy()
        pmi = (
            np.log(c_xy / n_pairs)
            - np.log(c_x / n_tokens)
            - np.log(c_y / n_tokens)
        )
        return pd.DataFrame(
            {
                "x": df["x"].to_numpy(),
                "y": df["y"].to_numpy(),
                "c_xy": df["c_xy"].astype(np.int64).to_numpy(),
                "pmi": np.floor(pmi * 1e4) / 1e4,
            }
        )

    return with_y.map_batches(score, batch_format="pandas")


def textrank_keywords(
    docs: "ray.data.Dataset",
    window: int = 3,
    min_count: int = 2,
    num_iters: int = 3,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004, public):
    PageRank over the word co-occurrence graph — terms co-occurring
    within ±``window`` positions ≥ ``min_count`` times form a weighted
    UNDIRECTED graph (weight = co-occurrence count), damped PageRank
    ranks them, the top ``k`` by (rank desc, word asc) are the corpus
    keywords → small DataFrame (word, rank:float64 rounded 8).

    Pure composition: the PMI pair-count combiner feeds
    ``stages/graph.pagerank(weight_col=…)`` via the symmetric edge
    expansion (each undirected pair contributes both orientations);
    only the top-k rows reach the driver (per-block partial top-k)."""
    if window < 1 or min_count < 1 or num_iters < 1 or k < 1:
        raise ValueError(
            "window/min_count/num_iters/k must all be ≥ 1"
        )
    from .graph import pagerank

    def pair_combine(df: pd.DataFrame) -> pd.DataFrame:
        p = _doc_pairs(df, id_col, text_col, window)
        g = p.groupby(["x", "y"], as_index=False).size().rename(
            columns={"size": "c_xy"}
        )
        g["c_xy"] = g["c_xy"].astype(np.int64)
        return g.assign(
            _bucket=pair_bucket_tag(g, ["x", "y"], num_buckets)
        )

    pairs = (
        docs.map_batches(pair_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.groupby(["x", "y"], as_index=False)["c_xy"].sum(),
            batch_format="pandas",
        )
        .map_batches(
            lambda df, _m=min_count: df.loc[df["c_xy"] >= _m],
            batch_format="pandas",
        )
    )

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        w = df["c_xy"].astype(np.float64)
        return pd.DataFrame({
            "s": pd.concat([df["x"], df["y"]], ignore_index=True),
            "o": pd.concat([df["y"], df["x"]], ignore_index=True),
            "w": pd.concat([w, w], ignore_index=True),
        })

    ranks = pagerank(pairs.map_batches(sym, batch_format="pandas"),
                     num_iters=num_iters, weight_col="w")

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "word": df["node"].astype(object),
            "rank": df["rank"].round(8)})
        return d.sort_values(["rank", "word"],
                             ascending=[False, True]).head(k)

    parts = ranks.map_batches(topk, batch_format="pandas").to_pandas()
    if parts.empty:
        raise ValueError("textrank_keywords: no pairs above min_count")
    return (parts.sort_values(["rank", "word"],
                              ascending=[False, True])
            .head(k).reset_index(drop=True))
