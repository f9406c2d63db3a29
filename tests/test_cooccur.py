"""Windowed co-occurrence + PMI (stages/cooccur) — exact vs a
sequential replay."""

from __future__ import annotations

import math

import pandas as pd
import pytest

import ray.data as rd

from graphforge_ray.stages.cooccur import cooccurrence_pmi


def _replay(docs, window, min_count):
    uni, pairs = {}, {}
    n = 0
    for t in docs:
        toks = t.split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
            n += 1
        for i, a in enumerate(toks):
            for off in range(1, window + 1):
                if i + off >= len(toks):
                    break
                b = toks[i + off]
                k = (min(a, b), max(a, b))
                pairs[k] = pairs.get(k, 0) + 1
    p = sum(pairs.values())
    out = {}
    for (x, y), c in pairs.items():
        if c >= min_count:
            pmi = (
                math.log(c / p)
                - math.log(uni[x] / n)
                - math.log(uni[y] / n)
            )
            out[(x, y)] = (c, math.floor(pmi * 1e4) / 1e4)
    return out


def test_cooccurrence_pmi_matches_replay(ray_session):
    texts = [
        "new york city in new york",
        "york city limits",
        "the city the city",
        "",
    ]
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).repartition(2)
    out = cooccurrence_pmi(ds, window=2, min_count=2).to_pandas()
    got = {
        (r.x, r.y): (r.c_xy, r.pmi) for r in out.itertuples()
    }
    want = _replay(texts, 2, 2)
    assert got == want
    assert ("city", "new") not in got or got[("city", "new")][0] >= 2
    assert ("new", "york") in got  # the collocation survives


def test_cooccurrence_pmi_bad_params(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a b"]}))
    with pytest.raises(ValueError):
        cooccurrence_pmi(ds, window=0)


def test_textrank_keywords_hub_word_wins(ray_session):
    import numpy as np
    import ray.data as rd

    from graphforge_ray.stages.cooccur import textrank_keywords

    # 'hub' co-occurs with everything; leaves only with 'hub' →
    # TextRank must rank 'hub' first
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["hub aa", "hub bb", "hub cc",
                 "hub aa", "hub bb", "hub cc"],
    })
    out = textrank_keywords(rd.from_pandas(docs).repartition(3),
                            window=2, min_count=2, num_iters=3, k=4)
    assert list(out.columns) == ["word", "rank"]
    assert out.iloc[0]["word"] == "hub"
    assert len(out) == 4
    # ranks sum to ~1 over the whole graph; top-4 here IS the graph
    assert abs(out["rank"].sum() - 1.0) < 1e-6


def test_textrank_keywords_numpy_replay(ray_session):
    """Exact replay: weighted PageRank over the pair graph computed
    sequentially in numpy must match the distributed ranks."""
    import numpy as np
    import ray.data as rd

    from graphforge_ray.stages.cooccur import textrank_keywords

    texts = ["a b c a b", "b c d", "d e a b", "c a b e"]
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})
    W = 2
    pairs = {}
    for t in texts:
        ws = t.split()
        for off in (1, 2):
            for i in range(len(ws) - off):
                x, y = sorted((ws[i], ws[i + off]))
                pairs[(x, y)] = pairs.get((x, y), 0) + 1
    pairs = {p: c for p, c in pairs.items() if c >= 2}
    nodes = sorted({w for p in pairs for w in p})
    idx = {w: i for i, w in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for (x, y), c in pairs.items():
        A[idx[x], idx[y]] += c
        A[idx[y], idx[x]] += c
    outw = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        r = (1 - 0.85) / n + 0.85 * (A / outw[:, None]).T @ r
    got = textrank_keywords(rd.from_pandas(docs), window=W,
                            min_count=2, num_iters=3, k=n)
    for _, row in got.iterrows():
        assert abs(row["rank"] - round(r[idx[row["word"]]], 8)) < 1e-8
