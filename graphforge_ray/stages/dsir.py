"""DSIR — Data Selection with Importance Resampling (hashed n-grams).

Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023, public): estimate bag-of-hashed-ngram
unigram models for a small TARGET distribution (e.g. wiki-like text)
and the RAW crawl, weight every raw document by the log-likelihood
ratio, and resample proportionally — the standard pretraining-corpus
selection pass between quality filtering and dedup.

Scale shape:

- Feature extraction is stateless and map-side: hashed BIGRAMS of
  whitespace tokens, ``f = int(md5(tok_i ⊔ ' ' ⊔ tok_{i+1})[:10], 16)
  mod dim`` (same md5 rule as stages/vectorize — the SQL oracle replays
  it verbatim).
- Model estimation is one pass: per-batch ``np.bincount`` partials in
  LONG form (f, target_cnt, raw_cnt) → one dim-sized distributed
  groupby; only the dim-row model lands on the driver (presentation-
  sized by construction, dim ≤ a few thousand).
- The log-ratio vector is QUANTIZED to int64 (floor(llr·1e6)) and
  broadcast; per-doc weights are integer dot products — exact in both
  engines regardless of summation order, so the oracle hash-matches
  with no float tolerance. (The only float op is the driver-side ln of
  model counts; a floor-boundary flip would need the ratio to sit
  within one ulp of a 1e-6 grid line.)
- Selection: deterministic top-k by (weight, doc_id) via distributed
  sort+limit, or Gumbel-top-k sampling (``sample=True``) with
  md5-derived noise — reproducible without shipping any RNG state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .fasthash import hex_prefix_int, md5_hex

__all__ = ["dsir_weights", "dsir_select"]

_PREFIX = 10  # 40 bits, exact in doubles (same rationale as vectorize)


def _bigram_features(texts: pd.Series, dim: int) -> tuple:
    """→ (doc_idx:int64[], f:int64[]) one row per bigram occurrence —
    vectorized shift-pairs (the stages/cooccur idiom): explode keeps
    tokens in order, so adjacent entries with the same row position are
    consecutive tokens of one document."""
    ex = texts.fillna("").reset_index(drop=True).str.findall(r"\S+") \
        .explode().dropna()
    if len(ex) < 2:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    pos = ex.index.to_numpy(np.int64)
    toks = ex.to_numpy(dtype=object)
    same = pos[1:] == pos[:-1]
    if not same.any():
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    grams = np.add(np.add(toks[:-1][same], " "), toks[1:][same])
    uniq, inv = np.unique(grams, return_inverse=True)
    f_u = (hex_prefix_int(md5_hex(uniq), _PREFIX) % dim).astype(np.int64)
    return (pos[:-1][same], f_u[inv])


def _fit_logratio(
    docs: "ray.data.Dataset",
    target_expr: str,
    dim: int,
    text_col: str,
) -> np.ndarray:
    """One corpus pass → quantized log-ratio vector lq[dim] (int64)."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        mask = df.eval(target_expr).to_numpy(dtype=bool)
        rows, f = _bigram_features(df[text_col], dim)
        if not len(f):
            return pd.DataFrame({
                "f": pd.Series([], dtype=np.int64),
                "t": pd.Series([], dtype=np.int64),
                "r": pd.Series([], dtype=np.int64)})
        raw = np.bincount(f, minlength=dim)
        tgt = np.bincount(f[mask[rows]], minlength=dim)
        nz = np.flatnonzero(raw)
        return pd.DataFrame({"f": nz.astype(np.int64),
                             "t": tgt[nz].astype(np.int64),
                             "r": raw[nz].astype(np.int64)})

    model = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("f").aggregate(Sum(on="t", alias_name="t"),
                                Sum(on="r", alias_name="r"))
        .to_pandas()  # ≤ dim rows — presentation-sized by construction
    )
    t = np.zeros(dim, np.float64)
    r = np.zeros(dim, np.float64)
    if len(model):
        t[model["f"].to_numpy()] = model["t"].to_numpy()
        r[model["f"].to_numpy()] = model["r"].to_numpy()
    T, R = t.sum(), r.sum()
    llr = (np.log(t + 1.0) - np.log(T + dim)
           - np.log(r + 1.0) + np.log(R + dim))
    return np.floor(llr * 1e6).astype(np.int64)


def dsir_weights(
    docs: "ray.data.Dataset",
    target_expr: str,
    dim: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """→ Dataset (id, w:int64): per-document DSIR importance weight.

    ``target_expr`` is a pandas ``DataFrame.eval`` boolean expression
    over the doc columns (e.g. ``"source == 'wiki'"``) defining the
    target distribution; the raw distribution is the whole input.
    ``w = Σ_f count(doc, f) · floor(llr_f · 1e6)`` — an integer, exact
    on every engine. Docs with fewer than two tokens weigh 0."""
    if dim < 1:
        raise ValueError(f"dim must be ≥ 1: {dim}")
    import ray

    lq_ref = ray.put(_fit_logratio(docs, target_expr, dim, text_col))

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        lq = _ray.get(lq_ref)
        rows, f = _bigram_features(df[text_col], dim)
        w = np.zeros(len(df), np.int64)
        if len(f):
            np.add.at(w, rows, lq[f])
        return pd.DataFrame({id_col: df[id_col].to_numpy(), "w": w})

    return docs.map_batches(weigh, batch_format="pandas")


def dsir_select(
    docs: "ray.data.Dataset",
    target_expr: str,
    k: int,
    dim: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample: bool = False,
    seed: int = 0,
) -> "ray.data.Dataset":
    """Top-k DSIR selection.

    ``sample=False``: deterministic — the k highest weights, doc id
    ascending as the tie-break (distributed sort + limit; fully
    SQL-replayable). ``sample=True``: Gumbel-top-k importance
    resampling — ``key = w·1e-6 + Gumbel(u)`` with
    ``u = (int(md5(f'dsir:{seed}:{id}')[:10], 16) + 0.5) / 2^40``,
    reproducible on every node with no RNG state shipped."""
    weights = dsir_weights(docs, target_expr, dim, id_col, text_col)
    if not sample:
        return weights.sort(
            ["w", id_col], descending=[True, False]
        ).limit(k)

    def gumbel(df: pd.DataFrame) -> pd.DataFrame:
        keys = np.array(
            [f"dsir:{seed}:{v}" for v in df[id_col]], dtype=object)
        u = (hex_prefix_int(md5_hex(keys), _PREFIX) + 0.5) / float(2 ** 40)
        g = -np.log(-np.log(u))
        out = df[[id_col, "w"]].copy()
        out["key"] = df["w"].to_numpy(np.float64) * 1e-6 + g
        return out

    return (weights.map_batches(gumbel, batch_format="pandas")
            .sort("key", descending=True).limit(k))
