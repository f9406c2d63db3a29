"""DSIR importance resampling (stages/dsir.py) vs an independent
sequential numpy replay of the hashed-bigram log-ratio model."""

import numpy as np
import pandas as pd
import pytest

from graphforge_ray.stages.dsir import dsir_select, dsir_weights
from graphforge_ray.stages.fasthash import hex_prefix_int, md5_hex

DIM = 32


def _replay_weights(df: pd.DataFrame, target_mask) -> np.ndarray:
    """Sequential reference: same formula, per-doc Python loop."""
    def feats(text):
        ws = str(text).split() if pd.notna(text) else []
        grams = [a + " " + b for a, b in zip(ws, ws[1:])]
        if not grams:
            return np.zeros(DIM, np.int64)
        f = hex_prefix_int(
            md5_hex(np.array(grams, dtype=object)), 10) % DIM
        return np.bincount(f, minlength=DIM).astype(np.int64)

    mat = np.stack([feats(t) for t in df["text"]])
    t = mat[np.asarray(target_mask, bool)].sum(axis=0).astype(float)
    r = mat.sum(axis=0).astype(float)
    llr = (np.log(t + 1) - np.log(t.sum() + DIM)
           - np.log(r + 1) + np.log(r.sum() + DIM))
    lq = np.floor(llr * 1e6).astype(np.int64)
    return mat @ lq


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    wiki_words = ["the", "of", "theory", "history", "century"]
    web_words = ["click", "buy", "now", "free", "deal", "the"]
    rows = []
    for i in range(60):
        words = wiki_words if i % 3 == 0 else web_words
        n = int(rng.integers(2, 12))
        rows.append((
            i,
            " ".join(words[rng.integers(len(words))] for _ in range(n)),
            "wiki" if i % 3 == 0 else "web",
        ))
    rows += [(60, "", "web"), (61, None, "web"), (62, "single", "web")]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    return df, rd.from_pandas(df).repartition(4)


def test_weights_match_sequential_replay(corpus):
    df, ds = corpus
    got = (dsir_weights(ds, "source == 'wiki'", dim=DIM)
           .to_pandas().sort_values("doc_id"))
    want = _replay_weights(df, df["source"] == "wiki")
    assert np.array_equal(got["w"].to_numpy(), want)


def test_short_docs_weigh_zero(corpus):
    df, ds = corpus
    got = dsir_weights(ds, "source == 'wiki'", dim=DIM).to_pandas()
    short = got[got["doc_id"].isin([60, 61, 62])]
    assert (short["w"] == 0).all()


def test_select_topk_deterministic(corpus):
    df, ds = corpus
    sel = dsir_select(ds, "source == 'wiki'", k=10, dim=DIM).to_pandas()
    want = pd.DataFrame({
        "doc_id": df["doc_id"], "w": _replay_weights(
            df, df["source"] == "wiki")
    }).sort_values(["w", "doc_id"], ascending=[False, True]).head(10)
    assert sel.sort_values(["w", "doc_id"],
                           ascending=[False, True]).reset_index(drop=True) \
        .equals(want.reset_index(drop=True))
    # target-heavy docs outrank web docs in this fixture
    assert (df.set_index("doc_id").loc[sel["doc_id"], "source"]
            == "wiki").mean() > 0.5


def test_sampled_selection_reproducible(corpus):
    _, ds = corpus
    a = dsir_select(ds, "source == 'wiki'", k=8, dim=DIM,
                    sample=True, seed=3).to_pandas()
    b = dsir_select(ds, "source == 'wiki'", k=8, dim=DIM,
                    sample=True, seed=3).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    c = dsir_select(ds, "source == 'wiki'", k=8, dim=DIM,
                    sample=True, seed=4).to_pandas()
    assert sorted(a["doc_id"]) != sorted(c["doc_id"])
