"""Fuzzy entity-name join (stages/resolve) — exactness vs a brute-force
cross product, prefix-filter edge cases, id dtypes."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphforge_ray.stages.resolve import fuzzy_name_join, name_grams


def _brute(left, right, t):
    out = set()
    for lid, ln in left:
        for rid, rn in right:
            A, B = name_grams(ln), name_grams(rn)
            inter = len(A & B)
            sim = math.floor(inter / (len(A) + len(B) - inter) * 1e6) / 1e6
            if sim >= math.floor(t * 1e6) / 1e6:
                out.add((lid, rid, sim))
    return out


LEFT = [
    (1, "Acme Corp"),
    (2, "Acme Corporation"),
    (3, "Globex"),
    (4, "Initech LLC"),
    (5, "ab"),  # shorter than a trigram
]
RIGHT = [
    (10, "Acme Corp"),
    (11, "Acme Crop"),
    (12, "Globex Inc"),
    (13, "Umbrella"),
    (14, "ab"),
]


def _ds(rows, idc, nmc):
    return rd.from_pandas(
        pd.DataFrame(rows, columns=[idc, nmc])
    ).repartition(2)


@pytest.mark.parametrize("t", [0.25, 0.5, 0.75, 1.0])
def test_fuzzy_join_matches_brute_force(ray_session, t):
    got = fuzzy_name_join(
        _ds(LEFT, "lid", "l_name"),
        _ds(RIGHT, "rid", "r_name"),
        threshold=t,
    ).to_pandas()
    got_set = set(
        (int(r.lid), int(r.rid), r.sim) for r in got.itertuples()
    )
    assert got_set == _brute(LEFT, RIGHT, t)
    assert len(got) == len(got_set)  # no duplicate pairs


def test_fuzzy_join_exact_match_at_t1(ray_session):
    got = fuzzy_name_join(
        _ds(LEFT, "lid", "l_name"),
        _ds(RIGHT, "rid", "r_name"),
        threshold=1.0,
    ).to_pandas()
    pairs = set(zip(got["lid"], got["rid"]))
    assert pairs == {(1, 10), (5, 14)}
    assert (got["sim"] == 1.0).all()


def test_fuzzy_join_string_ids(ray_session):
    left = [("a", "red widget"), ("b", "blue widget")]
    right = [("x", "red widgets"), ("y", "unrelated thing")]
    got = fuzzy_name_join(
        _ds(left, "lid", "l_name"),
        _ds(right, "rid", "r_name"),
        threshold=0.5,
    ).to_pandas()
    got_set = set((r.lid, r.rid, r.sim) for r in got.itertuples())
    assert got_set == _brute(left, right, 0.5)
    assert ("a", "x") in {(a, b) for a, b, _ in got_set}


def test_fuzzy_join_bad_threshold(ray_session):
    with pytest.raises(ValueError):
        fuzzy_name_join(
            _ds(LEFT, "lid", "l_name"),
            _ds(RIGHT, "rid", "r_name"),
            threshold=0.0,
        )


def test_name_grams_short_strings():
    assert name_grams("ab") == {"ab"}
    assert name_grams("abc") == {"abc"}
    assert name_grams("abcd") == {"abc", "bcd"}
