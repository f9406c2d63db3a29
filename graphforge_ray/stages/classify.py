"""Corpus-trained multinomial Naive Bayes text classifier.

The GPT-3 / CCNet-style curation move: train a cheap classifier on
labeled text (label = source, language, quality tier) and score every
document against every class — downstream filters keep docs whose
high-quality-class score wins. Naive Bayes is the right first
classifier at 100 TB because training IS counting: the model is the
per-(label, term) count table, built with the same map-side-combine +
term-bucket shuffle as the bigram LM (stages/lm.py), and it NEVER lands
on the driver — web-scale vocabularies flow through shuffles.

``nb_scores`` = three tokenizing corpus passes (train counts, per-doc
term counts, per-doc lengths) plus a label-column-only count pass, and
three bucket shuffles — all streaming, nothing corpus-sized on the
driver (folding the length pass into the term-count pass is a known
seam; it would save one tokenize at the cost of a per-doc shuffle):

1. train: (label, term) counts, term-bucketed; per-label token totals
   and document priors are k-sized driver scalars (k = #labels).
2. score: per-doc term counts join the model on the TERM (acero-safe
   ``bindings_join``), so each (doc, label) accumulates
   ``cnt · ln(c_lw + 1)`` over the terms that label has seen. The
   smoothing denominator factors out exactly:

     score(d, l) = ln(n_l / n)                      (prior)
                 - |d| · ln(tot_l + V)              (map-side, broadcast)
                 + Σ_matched cnt_w · ln(c_lw + 1)   (the join)

   because every term contributes ``-ln(tot_l + V)`` whether seen or
   not — unseen terms need NO join row (add-1 smoothing's zero-count
   numerator is ln 1 = 0). Base rows and matched partials share one
   schema and reduce in a single doc-bucket shuffle (union + sum, no
   second join).

Scores are FLOOR-truncated at 1e-4 (same summation-order headroom as
lm.py). ``nb_predict`` argmaxes the floored scores with a
deterministic (score desc, label asc) tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import bindings_join, bucket_tag
from .lm import _doc_words

__all__ = ["nb_scores", "nb_predict", "logreg_train", "logreg_score"]


def _labeled_words(
    df: pd.DataFrame, label_col: str, text_col: str
) -> pd.DataFrame:
    w = _doc_words(df.rename(columns={label_col: "_lbl"}), "_lbl", text_col)
    return w.rename(columns={"_lbl": "label"})


def nb_scores(
    docs: "ray.data.Dataset",
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ Dataset (id, label, nb_score): add-1-smoothed multinomial NB
    log-posterior (up to the shared evidence term) of every document
    under EVERY label, FLOOR-truncated at 1e-4."""
    from ..shuffle import np_key_dtype

    # capture the id dtype: bindings_join widens it to object — the
    # matched partials and the base rows MUST land in the same bucket
    id_np = np_key_dtype(docs, id_col)

    # ---- pass 1: the model — (label, term) counts, term-bucketed ----
    def train_combine(df: pd.DataFrame) -> pd.DataFrame:
        w = _labeled_words(df, label_col, text_col)
        g = w.groupby(["label", "w"], as_index=False).size().rename(
            columns={"size": "c"}
        )
        g["c"] = g["c"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "w", num_buckets))

    def train_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["label", "w"], as_index=False)["c"].sum()

    model = (
        docs.map_batches(train_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(train_reduce, batch_format="pandas")
        .materialize()
    )

    # V: distinct terms of the model. Per-BLOCK nunique partials are NOT
    # safe (Ray splits large map_groups outputs into multiple blocks, so
    # a term's k label rows can straddle a split and double-count) — one
    # small extra shuffle over the model's distinct terms is exact at
    # any block size
    vocab_size = float(
        model.map_batches(
            lambda df: (lambda d: d.assign(
                _vb=bucket_tag(d, "w", num_buckets)
            ))(df[["w"]].drop_duplicates()),
            batch_format="pandas",
        )
        .groupby("_vb")
        .map_groups(
            lambda g: pd.DataFrame(
                {"n": [np.int64(g["w"].nunique())]}
            ),
            batch_format="pandas",
        )
        .to_pandas()["n"].sum()
    )

    # per-label token totals from the model (k × num_blocks partials)
    tot_rows = model.map_batches(
        lambda df: df.groupby("label", as_index=False)["c"].sum(),
        batch_format="pandas",
    ).to_pandas()
    tot_l = tot_rows.groupby("label")["c"].sum().to_dict()

    # per-label document counts (reads only the label column)
    n_rows = docs.map_batches(
        lambda df: df.groupby(label_col, as_index=False).size(),
        batch_format="pandas",
    ).to_pandas()
    n_l = n_rows.groupby(label_col)["size"].sum().to_dict()
    n_total = float(sum(n_l.values()))

    labels = sorted(n_l)
    prior = {l: float(np.log(n_l[l] / n_total)) for l in labels}
    dflt = {
        l: float(np.log(float(tot_l.get(l, 0)) + vocab_size))
        for l in labels
    }

    # ---- pass 2a: matched partials via the term join ----------------
    def doc_terms(df: pd.DataFrame) -> pd.DataFrame:
        w = _doc_words(df, id_col, text_col)
        g = w.groupby([id_col, "w"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    matched = bindings_join(
        docs.map_batches(doc_terms, batch_format="pandas"),
        model.map_batches(
            lambda df: df[["w", "label", "c"]], batch_format="pandas"
        ),
        on=["w"],
        num_buckets=num_buckets,
    )

    def partial_s(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df["cnt"].astype(np.float64).to_numpy()
        c = df["c"].astype(np.float64).to_numpy()
        g = pd.DataFrame(
            {
                id_col: df[id_col].astype(id_np).to_numpy(),
                "label": df["label"].to_numpy(),
                "val": cnt * np.log(c + 1.0),
            }
        )
        out = g.groupby([id_col, "label"], as_index=False)["val"].sum()
        return out.assign(_bucket=bucket_tag(out, id_col, num_buckets))

    # ---- pass 2b: base rows (prior − |d|·ln(tot_l + V)), map-side ---
    def base_rows(df: pd.DataFrame) -> pd.DataFrame:
        w = _doc_words(df, id_col, text_col)
        dl = (
            w.groupby(id_col).size()
            .reindex(df[id_col].to_numpy(), fill_value=0)
            .to_numpy(dtype=np.float64)
        )
        parts = [
            pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    "label": l,
                    "val": prior[l] - dl * dflt[l],
                }
            )
            for l in labels
        ]
        out = pd.concat(parts, ignore_index=True)
        return out.assign(_bucket=bucket_tag(out, id_col, num_buckets))

    both = docs.map_batches(base_rows, batch_format="pandas").union(
        matched.map_batches(partial_s, batch_format="pandas")
    )

    def reduce_score(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby([id_col, "label"], as_index=False)["val"].sum()
        return pd.DataFrame(
            {
                id_col: out[id_col],
                "label": out["label"],
                "nb_score": np.floor(out["val"].to_numpy() * 1e4) / 1e4,
            }
        )

    return both.groupby("_bucket").map_groups(
        reduce_score, batch_format="pandas"
    )


def nb_predict(
    scores: "ray.data.Dataset",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ Dataset (id, pred): argmax label per document over an
    ``nb_scores`` result, ties broken by label ascending. One doc-bucket
    shuffle (all of a doc's k rows meet in one group)."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_bucket=bucket_tag(df, id_col, num_buckets))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["nb_score", "label"], ascending=[False, True], kind="stable"
        )
        top = g.drop_duplicates(subset=[id_col], keep="first")
        return pd.DataFrame(
            {id_col: top[id_col], "pred": top["label"]}
        )

    return (
        scores.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pick, batch_format="pandas")
    )


def _dense_hash_features(
    df: pd.DataFrame, text_col: str, dim: int
) -> np.ndarray:
    """Dense signed-md5 hashing-trick features, L2-normalized — the
    same rule as vectorize.feature_hash_embed, built dense because the
    model is dim-sized by construction."""
    from .fasthash import hex_prefix_int, md5_hex

    x = np.zeros((len(df), dim), dtype=np.float64)
    words = df[text_col].fillna("").str.findall(r"\S+")
    ex = words.explode().dropna()
    if len(ex):
        uniq, inv = np.unique(
            ex.to_numpy(dtype=object), return_inverse=True
        )
        idx_u = (hex_prefix_int(md5_hex(uniq), 10) % dim).astype(np.int64)
        sgn_u = np.where(
            hex_prefix_int(
                md5_hex(np.array(["sgn:" + t for t in uniq], dtype=object)),
                10,
            ) % 2 == 0,
            1.0, -1.0,
        )
        pos_map = {k: i for i, k in enumerate(df.index)}
        rows = np.array(
            [pos_map[k] for k in ex.index.to_numpy()], dtype=np.int64
        )
        np.add.at(x, (rows, idx_u[inv]), sgn_u[inv])
    nrm = np.sqrt((x * x).sum(axis=1, keepdims=True))
    nrm[nrm == 0] = 1.0
    return x / nrm


def logreg_train(
    docs: "ray.data.Dataset",
    label_fn_col: str,
    dim: int = 64,
    iters: int = 20,
    lr: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> np.ndarray:
    """Distributed full-batch logistic regression over feature-hashed
    text (the trainable counterpart to ``nb_scores`` — the GPT-3-style
    quality classifier when Naive Bayes is too blunt). Returns the
    weight vector ``w`` of length ``dim + 1`` (bias last).

    ``label_fn_col`` is a 0/1 integer column on ``docs``. Features are
    the signed md5 hashing-trick vectors of ``feature_hash_embed``'s
    rule, built DENSE per batch (dim is small by construction — the
    whole model is dim+1 floats, so the broadcast is trivial).

    Scale shape: features are tokenized + hashed ONCE into a
    materialized (n × dim) float dataset; each GD iteration is then one
    cheap matmul pass producing (dim+1)-sized gradient partials per
    batch — the driver folds ≤ blocks × (dim+1) floats and updates w.
    Full-batch GD is exactly reproducible given fixed iteration count
    (no sampling, no racy SGD); partial-sum order only perturbs ulps."""
    if dim < 1 or iters < 1:
        raise ValueError(f"dim/iters must be ≥ 1: {dim}/{iters}")

    feat_cols = [f"_f{k}" for k in range(dim)]

    def featurize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            _dense_hash_features(df, text_col, dim), columns=feat_cols
        )
        out["_y"] = df[label_fn_col].to_numpy(dtype=np.float64)
        return out

    feats = docs.map_batches(
        featurize, batch_format="pandas"
    ).materialize()

    w = np.zeros(dim + 1, dtype=np.float64)

    for _ in range(iters):
        w_c = w.copy()

        def grad_partial(df: pd.DataFrame) -> pd.DataFrame:
            x = df[feat_cols].to_numpy(dtype=np.float64)
            xb = np.hstack([x, np.ones((len(df), 1))])
            y = df["_y"].to_numpy(dtype=np.float64)
            z = xb @ w_c
            p = 1.0 / (1.0 + np.exp(-z))
            g = xb.T @ (p - y)
            return pd.DataFrame(
                {"j": np.arange(dim + 1, dtype=np.int64), "g": g,
                 "n": np.int64(len(df))}
            )

        parts = feats.map_batches(
            grad_partial, batch_format="pandas"
        ).to_pandas()
        if "j" not in parts.columns:
            raise ValueError("logreg_train: no rows")
        # n is repeated across a batch's dim+1 rows — count it once
        n_total = float(parts.loc[parts["j"] == 0, "n"].sum()) or 1.0
        grad = parts.groupby("j")["g"].sum().to_numpy()
        w = w - lr * grad / n_total

    return w


def logreg_score(
    docs: "ray.data.Dataset",
    w: np.ndarray,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """→ Dataset (id, prob): sigmoid scores under a ``logreg_train``
    model — pure map-side, model broadcast by closure (dim+1 floats)."""
    dim = len(w) - 1

    def score(df: pd.DataFrame) -> pd.DataFrame:
        x = _dense_hash_features(df, text_col, dim)
        z = x @ w[:-1] + w[-1]
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "prob": 1.0 / (1.0 + np.exp(-z)),
            }
        )

    return docs.map_batches(score, batch_format="pandas")
