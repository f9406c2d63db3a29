"""Multinomial Naive Bayes (stages/classify) — scores checked against a
from-scratch sequential replay; prediction argmax + tie-break."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphforge_ray.stages.classify import nb_predict, nb_scores

DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "source": ["web", "web", "wiki", "wiki", "wiki", "web"],
        "text": [
            "buy cheap pills now",
            "cheap cheap deals now",
            "the history of rome",
            "history of ancient rome empire",
            "rome the empire",
            "",
        ],
    }
)


def _replay_scores(docs: pd.DataFrame):
    """Independent NB: full smoothed per-term loop, no factoring."""
    words = {
        r.doc_id: r.text.split() for r in docs.itertuples()
    }
    labels = sorted(docs["source"].unique())
    n_l = docs["source"].value_counts().to_dict()
    c_lw: dict = {}
    tot_l = {l: 0 for l in labels}
    vocab = set()
    for r in docs.itertuples():
        for w in r.text.split():
            c_lw[(r.source, w)] = c_lw.get((r.source, w), 0) + 1
            tot_l[r.source] += 1
            vocab.add(w)
    v = len(vocab)
    out = {}
    for doc_id, ws in words.items():
        for l in labels:
            s = math.log(n_l[l] / len(docs))
            for w in ws:
                s += math.log(
                    (c_lw.get((l, w), 0) + 1) / (tot_l[l] + v)
                )
            out[(doc_id, l)] = math.floor(s * 1e4) / 1e4
    return out


def _ds(df):
    return rd.from_pandas(df).repartition(3)


def test_nb_scores_match_sequential_replay(ray_session):
    got = nb_scores(_ds(DOCS)).to_pandas()
    want = _replay_scores(DOCS)
    assert len(got) == len(want)  # every doc × every label, once
    for r in got.itertuples():
        assert want[(r.doc_id, r.label)] == pytest.approx(
            r.nb_score, abs=2e-4
        ), (r.doc_id, r.label)


def test_nb_predict_separates_sources(ray_session):
    scores = nb_scores(_ds(DOCS))
    pred = nb_predict(scores).to_pandas().set_index("doc_id")["pred"]
    # spammy docs classify web, encyclopedic docs classify wiki
    assert pred[1] == "web" and pred[2] == "web"
    assert pred[3] == "wiki" and pred[4] == "wiki" and pred[5] == "wiki"


def test_nb_predict_tie_breaks_label_asc(ray_session):
    # two labels, perfectly symmetric corpora → equal scores everywhere;
    # the deterministic tie-break picks the lexicographically first label
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "source": ["b", "a"],
            "text": ["x", "x"],
        }
    )
    pred = nb_predict(nb_scores(_ds(docs))).to_pandas()
    assert set(pred["pred"]) == {"a"}


def test_nb_scores_empty_doc_gets_prior_only(ray_session):
    got = nb_scores(_ds(DOCS)).to_pandas()
    row = got[(got["doc_id"] == 6) & (got["label"] == "web")]
    assert row["nb_score"].iloc[0] == pytest.approx(
        math.floor(math.log(3 / 6) * 1e4) / 1e4, abs=1e-9
    )


def _np_replay_logreg(docs, dim, iters, lr):
    """Sequential numpy replay of the exact full-batch GD."""
    import hashlib

    def feats(texts):
        x = np.zeros((len(texts), dim))
        for r, t in enumerate(texts):
            for wd in (t or "").split():
                i = int(hashlib.md5(wd.encode()).hexdigest()[:10], 16) % dim
                s = (
                    1.0
                    if int(
                        hashlib.md5(("sgn:" + wd).encode()).hexdigest()[:10],
                        16,
                    )
                    % 2
                    == 0
                    else -1.0
                )
                x[r, i] += s
        n = np.sqrt((x * x).sum(axis=1, keepdims=True))
        n[n == 0] = 1.0
        return x / n

    x = feats(list(docs["text"]))
    xb = np.hstack([x, np.ones((len(x), 1))])
    y = docs["y"].to_numpy(dtype=float)
    w = np.zeros(dim + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(xb @ w)))
        w = w - lr * (xb.T @ (p - y)) / len(y)
    return w


def test_logreg_matches_numpy_replay_and_separates(ray_session):
    from graphforge_ray.stages.classify import logreg_score, logreg_train

    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "buy cheap pills", "cheap deals now", "win money fast",
                "cheap cheap cheap",
                "the history of rome", "ancient empire history",
                "rome and its empire", "history of the republic",
            ],
            "y": [1, 1, 1, 1, 0, 0, 0, 0],
        }
    )
    ds = rd.from_pandas(docs).repartition(3)
    w = logreg_train(ds, "y", dim=16, iters=30, lr=0.5)
    want = _np_replay_logreg(docs, 16, 30, 0.5)
    assert np.allclose(w, want, atol=1e-8)

    probs = (
        logreg_score(ds, w).to_pandas().set_index("doc_id")["prob"]
    )
    assert all(probs[i] > 0.5 for i in range(4))
    assert all(probs[i] < 0.5 for i in range(4, 8))


def test_logreg_bad_params(ray_session):
    from graphforge_ray.stages.classify import logreg_train

    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [1], "text": ["a"], "y": [1]})
    )
    with pytest.raises(ValueError):
        logreg_train(ds, "y", dim=0)
