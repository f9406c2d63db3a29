"""Corpus-trained bigram language-model scoring (CCNet-style quality
filtering: train a small LM on the corpus, keep documents whose
per-token log-probability is high; low scores = word-salad/boilerplate).

``bigram_logprob_scores`` is TWO distributed passes over the same
documents Dataset and three bucket shuffles — no model ever lands on
the driver:

1. train: unigram counts (word-bucketed) and bigram counts
   (pair-bucketed), both with map-side combiners;
2. score: each document's bigrams join their corpus counts through the
   acero-safe ``bindings_join`` (bigram-key buckets, then w1 buckets),
   per-bigram add-1-smoothed log-probability
   ``ln((c(w1,w2) + 1) / (c(w1) + V))``, and a per-doc bucketed
   mean — so web-scale vocabularies flow through shuffles instead of a
   broadcast table.

Every doc's bigrams exist in the corpus counts by construction (the
corpus includes the doc), so the count joins are inner. Documents with
fewer than two words score 0.0 (no evidence ≠ low quality). Scores are
FLOOR-truncated at 1e-4: the mean's summation order differs between
engines, so parity needs headroom above double ulp noise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import bindings_join, bucket_tag, pair_bucket_tag

__all__ = ["bigram_logprob_scores"]


def _doc_words(df: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    words = df[text_col].fillna("").str.findall(r"\S+")
    ex = words.explode().dropna()
    if ex.empty:
        return pd.DataFrame({id_col: [], "w": []})
    return pd.DataFrame(
        {id_col: df[id_col].reindex(ex.index).to_numpy(),
         "w": ex.to_numpy()}
    )


def _doc_bigrams(df: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    w = _doc_words(df, id_col, text_col)
    if w.empty:
        return pd.DataFrame({id_col: [], "w1": [], "w2": []})
    nxt = w["w"].shift(-1)
    same = w[id_col].to_numpy() == np.roll(w[id_col].to_numpy(), -1)
    same[-1] = False
    return pd.DataFrame(
        {
            id_col: w.loc[same, id_col].to_numpy(),
            "w1": w.loc[same, "w"].to_numpy(),
            "w2": nxt[same].to_numpy(),
        }
    )


def bigram_logprob_scores(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ Dataset (id, lm_score): mean add-1-smoothed bigram
    log-probability per document under the corpus-trained bigram LM
    (0.0 for docs with < 2 words), FLOOR-truncated at 1e-4."""
    # capture the id dtype up front: bindings_join's side-normalization
    # widens it to object, and pandas hash_array(object) !=
    # hash_array(int64) for equal values — every post-join bucket_tag /
    # join on the id must see the RESTORED dtype or keys split across
    # buckets (shuffle.py caveat, measured on the zero-fill anti join)
    from ..shuffle import np_key_dtype

    id_np = np_key_dtype(docs, id_col)

    def _restore_id(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[id_col] = df[id_col].astype(id_np)
        return df
    # ---- pass 1: corpus counts -------------------------------------
    def uni_combine(df: pd.DataFrame) -> pd.DataFrame:
        w = _doc_words(df, id_col, text_col)
        g = w.groupby("w", as_index=False).size().rename(
            columns={"size": "c1"}
        )
        g["c1"] = g["c1"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "w", num_buckets))

    uni = (
        docs.map_batches(uni_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.groupby("w", as_index=False)["c1"].sum(),
            batch_format="pandas",
        )
        .materialize()  # reused for V and the w1 join
    )
    vocab_size = float(uni.count())

    def bi_combine(df: pd.DataFrame) -> pd.DataFrame:
        b = _doc_bigrams(df, id_col, text_col)
        g = b.groupby(["w1", "w2"], as_index=False).size().rename(
            columns={"size": "c2"}
        )
        g["c2"] = g["c2"].astype(np.int64)
        return g.assign(
            _bucket=pair_bucket_tag(g, ["w1", "w2"], num_buckets)
        )

    bi = (
        docs.map_batches(bi_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.groupby(["w1", "w2"], as_index=False)["c2"].sum(),
            batch_format="pandas",
        )
    )

    # ---- pass 2: per-doc bigrams join their counts, bucketed mean ---
    doc_bi = docs.map_batches(
        lambda df: _doc_bigrams(df, id_col, text_col),
        batch_format="pandas",
    )
    with_c2 = bindings_join(doc_bi, bi, on=["w1", "w2"],
                            num_buckets=num_buckets)
    with_c1 = bindings_join(with_c2, uni.map_batches(
        lambda df: df.rename(columns={"w": "w1"}), batch_format="pandas"
    ), on=["w1"], num_buckets=num_buckets)

    def partial_mean(df: pd.DataFrame) -> pd.DataFrame:
        # bindings_join widens filled columns — restore numerics
        df = _restore_id(df)
        c2 = df["c2"].astype(np.float64).to_numpy()
        c1 = df["c1"].astype(np.float64).to_numpy()
        lp = np.log((c2 + 1.0) / (c1 + vocab_size))
        g = pd.DataFrame({id_col: df[id_col].to_numpy(), "lp": lp})
        out = g.groupby(id_col, as_index=False).agg(
            s=("lp", "sum"), n=("lp", "size")
        )
        out["n"] = out["n"].astype(np.int64)
        return out.assign(_bucket=bucket_tag(out, id_col, num_buckets))

    def reduce_mean(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(id_col, as_index=False).agg(
            s=("s", "sum"), n=("n", "sum")
        )
        return pd.DataFrame(
            {
                id_col: out[id_col],
                "lm_score": np.floor(
                    out["s"].to_numpy() / out["n"].to_numpy() * 1e4
                ) / 1e4,
            }
        )

    # snap: `scored` feeds BOTH the anti join (zero-score docs) and the
    # final union — unsnapped, Ray Data replays the whole 3-shuffle
    # scoring sub-plan once per consumer (measured: the contract query
    # ran 2× the work, 41.5 s → 16.7 s after snapping)
    from ..shuffle import snap_lineage

    scored = snap_lineage(
        with_c1.map_batches(partial_mean, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_mean, batch_format="pandas")
    )

    # docs with < 2 words never produced a bigram row → score 0.0
    all_ids = docs.map_batches(
        lambda df: df[[id_col]], batch_format="pandas"
    )
    rest = bindings_join(all_ids, scored.map_batches(
        lambda df: _restore_id(df[[id_col]]), batch_format="pandas"
    ), on=[id_col], how="anti", num_buckets=num_buckets)
    zero = rest.map_batches(
        lambda df: df.assign(lm_score=np.float64(0.0)),
        batch_format="pandas",
    )
    return scored.union(zero)
