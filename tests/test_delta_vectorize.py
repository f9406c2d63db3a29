"""KG snapshot delta (stages/delta) and feature-hashing vectorization
(stages/vectorize) — toy-exact semantics plus the md5 dim/sign rule the
driver oracle replays in SQL."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphforge_ray.stages.delta import kg_delta
from graphforge_ray.stages.vectorize import feature_hash_embed


def _triples(rows):
    return rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    ).repartition(2)


def test_kg_delta_basic(ray_session):
    old = _triples(
        [("a", "p", "1"), ("b", "p", "2"), ("c", "p", "3")]
    )
    new = _triples(
        [("b", "p", "2"), ("c", "p", "CHANGED"), ("d", "p", "4")]
    )
    out = kg_delta(old, new).to_pandas()
    got = set(map(tuple, out[["op", "subj", "pred", "obj"]].to_numpy()))
    assert got == {
        ("del", "a", "p", "1"),
        ("del", "c", "p", "3"),
        ("add", "c", "p", "CHANGED"),
        ("add", "d", "p", "4"),
    }


def test_kg_delta_set_semantics(ray_session):
    # duplicate triples within a snapshot collapse (ST1 set semantics):
    # a triple present 3x in old and 1x in new is UNCHANGED, not a del.
    old = _triples([("a", "p", "1")] * 3 + [("b", "p", "2")] * 2)
    new = _triples([("a", "p", "1")])
    out = kg_delta(old, new).to_pandas()
    got = set(map(tuple, out[["op", "subj", "pred", "obj"]].to_numpy()))
    assert got == {("del", "b", "p", "2")}


def test_kg_delta_identical_snapshots_empty(ray_session):
    rows = [("a", "p", "1"), ("b", "q", "2")]
    out = kg_delta(_triples(rows), _triples(rows)).to_pandas()
    assert len(out) == 0


def _ref_vector(text, dim=8, signed=True):
    """Independent per-doc replay of the documented md5 rule."""
    acc: dict[int, float] = {}
    for term in text.split():
        d = int(hashlib.md5(term.encode()).hexdigest()[:10], 16) % dim
        s = 1.0
        if signed:
            s = (
                1.0
                if int(
                    hashlib.md5(("sgn:" + term).encode()).hexdigest()[:10],
                    16,
                )
                % 2
                == 0
                else -1.0
            )
        acc[d] = acc.get(d, 0.0) + s
    acc = {k: v for k, v in acc.items() if v != 0.0}
    nrm = math.sqrt(sum(v * v for v in acc.values()))
    return {
        k: math.floor(v / nrm * 1e6) / 1e6 for k, v in acc.items()
    }


def test_feature_hash_matches_reference_rule(ray_session):
    texts = {
        1: "cat dog cat",
        2: "the quick brown fox jumps over the lazy dog",
        3: "x",
    }
    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": list(texts), "text": list(texts.values())}
        )
    ).repartition(2)
    out = feature_hash_embed(ds, dim=8).to_pandas()
    for doc_id, text in texts.items():
        want = _ref_vector(text, dim=8)
        got = dict(
            zip(
                out.loc[out["doc_id"] == doc_id, "dim_idx"],
                out.loc[out["doc_id"] == doc_id, "val"],
            )
        )
        assert got == want, (doc_id, got, want)


def test_feature_hash_unit_norm(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [1], "text": ["a b c d e f g h i j"]})
    )
    out = feature_hash_embed(ds, dim=64).to_pandas()
    # FLOOR truncation only shrinks: norm in (1 - 1e-4, 1]
    n = float(np.sqrt((out["val"] ** 2).sum()))
    assert 0.999 < n <= 1.0 + 1e-12


def test_feature_hash_empty_and_null_docs(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["", None, "ok"]})
    ).repartition(3)
    out = feature_hash_embed(ds, dim=4).to_pandas()
    assert set(out["doc_id"]) == {3}


def test_feature_hash_unsigned_counts(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [7], "text": ["w w w"]})
    )
    out = feature_hash_embed(
        ds, dim=16, signed=False, normalize=False
    ).to_pandas()
    assert len(out) == 1
    assert out["val"].iloc[0] == 3.0
    assert out["dim_idx"].dtype == np.int64


def _ref_project(vec, out_dim):
    import hashlib

    Q = float(1 << 20)
    y = []
    for j in range(out_dim):
        s = 0.0
        for i, v in enumerate(vec):
            sgn = (
                1.0
                if int(
                    hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()[:10],
                    16,
                )
                % 2
                == 0
                else -1.0
            )
            s += math.floor(float(v) * Q + 0.5) * sgn
        y.append(
            math.floor(s / Q / math.sqrt(out_dim) * 1e6) / 1e6
        )
    return y


def test_random_project_matches_reference_rule(ray_session):
    from graphforge_ray.stages.vectorize import random_project

    vecs = {
        1: [0.5, -1.25, 2.0, 0.125],
        2: [1.0, 1.0, 1.0, 1.0],
    }
    ds = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": list(vecs), "embedding": list(vecs.values())}
        )
    ).repartition(2)
    out = random_project(ds, out_dim=3).to_pandas()
    assert len(out) == 6
    for vid, vec in vecs.items():
        want = _ref_project(vec, 3)
        sub = out[out["vec_id"] == vid].sort_values("dim_idx")
        assert list(sub["val"]) == pytest.approx(want, abs=2e-6)
        assert list(sub["dim_idx"]) == [0, 1, 2]


def test_projection_matrix_deterministic_and_pm1(ray_session):
    from graphforge_ray.stages.vectorize import projection_matrix

    a = projection_matrix(8, 4)
    b = projection_matrix(8, 4)
    assert (a == b).all() and set(np.unique(a)) <= {-1.0, 1.0}
    # signs are balanced-ish (md5 uniformity sanity, not exact)
    assert 0.2 < (a == 1.0).mean() < 0.8


def test_negative_sample_matches_rule(ray_session):
    from graphforge_ray.stages.sampling import negative_sample

    rows = [
        ("a", "p", "b"),
        ("b", "p", "c"),
        ("c", "q", "a"),
    ]
    ds = _triples(rows)
    out = negative_sample(ds, k=2).to_pandas()
    # entities = {a, b, c}; replay the documented rule
    ents = sorted({r[0] for r in rows} | {r[2] for r in rows})
    ranked = sorted(
        ents,
        key=lambda e: (
            hashlib.md5(f"{e}:graft-negrank".encode()).hexdigest(),
            e,
        ),
    )
    want = set()
    for s, p, o in rows:
        for j in range(2):
            idx = (
                int(
                    hashlib.md5(f"{s}|{p}|{o}|{j}".encode()).hexdigest()[
                        :10
                    ],
                    16,
                )
                % len(ents)
            )
            want.add((s, p, ranked[idx], j))
    got = set(
        map(tuple, out[["subj", "pred", "neg_obj", "neg_id"]].to_numpy())
    )
    assert got == want
    assert len(out) == len(rows) * 2


def test_negative_sample_bad_k(ray_session):
    from graphforge_ray.stages.sampling import negative_sample

    with pytest.raises(ValueError):
        negative_sample(_triples([("a", "p", "b")]), k=0)
