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
