"""BPE learn/tokenize vs an independent sequential reference
implementation (same public Sennrich algorithm, written directly on
dicts — no shared code with the distributed version)."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphforge_ray.stages.bpe import bpe_learn, bpe_tokenize

EOW = "</w>"


def seq_bpe_learn(texts: list[str], num_merges: int):
    """Reference: dict-based BPE learning, ties by (count desc, pair
    string asc)."""
    wc = Counter(w for t in texts if t for w in t.split())
    vocab = {" ".join(list(w) + [EOW]): n for w, n in wc.items()}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for seq, n in vocab.items():
            syms = seq.split(" ")
            for i in range(len(syms) - 1):
                pc[f"{syms[i]} {syms[i+1]}"] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        left, right = best[0].split(" ", 1)
        merges.append((left, right, best[1]))
        pat = re.compile(
            r"(?<!\S)" + re.escape(f"{left} {right}") + r"(?!\S)"
        )
        vocab = {
            pat.sub((left + right).replace("\\", "\\\\"), seq): n
            for seq, n in vocab.items()
        }
    return merges


@pytest.fixture
def corpus_texts():
    return [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider new new",
        None,
        "",
    ]


def test_learn_matches_sequential_reference(ray_session, corpus_texts):
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(corpus_texts)),
                      "text": corpus_texts})
    ).repartition(3)
    got = bpe_learn(ds, num_merges=12, num_buckets=4)
    want = seq_bpe_learn([t for t in corpus_texts if t], 12)
    assert list(zip(got["left"], got["right"], got["count"])) == want
    assert list(got["rank"]) == list(range(1, len(want) + 1))


def test_learn_block_layout_invariant(ray_session, corpus_texts):
    df = pd.DataFrame({"doc_id": range(len(corpus_texts)),
                       "text": corpus_texts})
    a = bpe_learn(rd.from_pandas(df).repartition(1), num_merges=6,
                  num_buckets=2)
    b = bpe_learn(rd.from_pandas(df).repartition(5), num_merges=6,
                  num_buckets=8)
    pd.testing.assert_frame_equal(a, b)


def test_learn_stops_when_dry(ray_session):
    # every word unique, every pair count 1 → zero merges
    ds = rd.from_pandas(pd.DataFrame({"text": ["ab cd", "ef gh"]}))
    got = bpe_learn(ds, num_merges=10, num_buckets=2)
    assert len(got) == 0


def test_consecutive_pairs_all_merge(ray_session):
    # 'a a a a' must become 'aa aa' in one round, not 'aa a a'
    ds = rd.from_pandas(pd.DataFrame({"text": ["aaaa aaaa aaaa"]}))
    got = bpe_learn(ds, num_merges=1, num_buckets=2)
    assert (got.iloc[0]["left"], got.iloc[0]["right"]) == ("a", "a")
    # count: 3 words × 3 adjacent (a,a) pairs = 9
    assert int(got.iloc[0]["count"]) == 9


def test_tokenize_roundtrip_and_counts(ray_session, corpus_texts):
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(corpus_texts)),
                      "text": corpus_texts})
    ).repartition(2)
    merges = bpe_learn(ds, num_merges=8, num_buckets=4)
    out = (
        bpe_tokenize(ds, merges).to_pandas()
        .set_index("doc_id").sort_index()
    )
    # detokenize: drop spaces, split on the end-of-word marker
    for i, t in enumerate(corpus_texts):
        toks = out.loc[i, "tokens"]
        rebuilt = [
            w for w in toks.replace(" ", "").split(EOW) if w
        ]
        assert rebuilt == (t.split() if t else [])
        assert out.loc[i, "n_words"] == len(rebuilt)
        n_syms = toks.count(" ") + 1 if toks else 0
        assert out.loc[i, "n_bpe_tokens"] == n_syms
    # trained tokens for 'newest' collapse well below char count
    row = out.loc[3]  # "wider wider new new"
    assert row["n_bpe_tokens"] < sum(len(w) + 1
                                     for w in "wider wider new new".split())


def test_tokenize_unseen_word_falls_back_to_chars(ray_session):
    train = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": ["aa aa aa bb bb"]}))
    merges = bpe_learn(train, num_merges=2, num_buckets=2)
    test = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["zq"]}))
    out = bpe_tokenize(test, merges).to_pandas()
    assert out.loc[0, "tokens"] == f"z q {EOW}"
