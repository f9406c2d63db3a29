"""Bloom filter: bit-exact hashlib replay, membership, gram flags."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphforge_ray.stages.bloom import bloom_ngram_flags, build_bloom

M = 4096
K = 3


def _md5i(sx: str) -> int:
    return int(hashlib.md5(sx.encode()).hexdigest()[:10], 16)


def _member(bits: bytes, key: str) -> bool:
    arr = np.frombuffer(bits, np.uint8)
    return all(
        (arr[p // 8] >> (p % 8)) & 1
        for p in (_md5i(f"graft-bloom|{j}|{key}") % M for j in range(K))
    )


def test_build_bloom_replays_hashlib(ray_session):
    keys = [f"key-{i}" for i in range(200)]
    bits = build_bloom(
        rd.from_pandas(pd.DataFrame({"g": keys})).repartition(3),
        "g", m_bits=M, k=K)
    assert len(bits) == M // 8
    # every inserted key is positive; bits are exactly the replay's
    want = np.zeros(M // 8, np.uint8)
    for key in keys:
        for j in range(K):
            p = _md5i(f"graft-bloom|{j}|{key}") % M
            want[p // 8] |= 1 << (p % 8)
    assert bits == want.tobytes()
    assert all(_member(bits, key) for key in keys)
    with pytest.raises(ValueError, match="m_bits"):
        build_bloom(rd.from_pandas(pd.DataFrame({"g": keys})), "g",
                    m_bits=10)


def test_bloom_ngram_flags(ray_session):
    probe = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "clean words only here none of them match at all ok",
            "prefix " + probe + " suffix",   # contains probe 8-grams
            "short doc",                     # < 8 words → 0 grams
            None,
        ],
    })
    pw = probe.split()
    grams = [" ".join(pw[i:i + 8]) for i in range(len(pw) - 7)]
    bits = build_bloom(
        rd.from_pandas(pd.DataFrame({"g": grams})), "g",
        m_bits=M, k=K)
    got = bloom_ngram_flags(
        rd.from_pandas(docs).repartition(2), bits, n=8, m_bits=M, k=K
    ).to_pandas().set_index("doc_id").sort_index()
    assert got.loc[1, "contaminated"] == 1
    assert got.loc[1, "n_hit"] >= len(grams)  # all probe grams hit
    assert got.loc[2, "n_grams"] == 0
    assert got.loc[3, "n_grams"] == 0
    # doc 0: any flag must equal the hashlib replay (false positives
    # are deterministic, not wrong)
    w0 = docs.loc[0, "text"].split()
    g0 = {" ".join(w0[i:i + 8]) for i in range(len(w0) - 7)}
    want_hit = sum(_member(bits, g) for g in g0)
    assert got.loc[0, "n_hit"] == want_hit
    with pytest.raises(ValueError, match="bloom size"):
        bloom_ngram_flags(rd.from_pandas(docs), bits, m_bits=M * 2)
