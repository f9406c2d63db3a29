"""Curation stages: repetition stats, decontamination, source quotas.

Oracles are brute-force pure-Python recomputations of the same
definitions (Counter-based bigram stats, substring scans, md5 ranks) —
independent of the vectorized/distributed kernels.
"""

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphforge_ray.stages.curation import (
    contamination_flags,
    per_source_quota,
    repetition_stats_batch,
)


def _rep_oracle(text):
    ws = text.split()
    n = len(ws)
    if n == 0:
        return 0, 0.0, 0.0
    dup = round(1.0 - len(set(ws)) / n, 6)
    if n < 2:
        return n, dup, 0.0
    grams = Counter(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    top_g = min(g for g, c in grams.items() if c == max(grams.values()))
    frac = round(
        grams[top_g] * (len(top_g) - 1) / sum(len(w) for w in ws), 6
    )
    return n, dup, frac


TEXTS = [
    "the cat sat on the cat mat the cat",     # repeated words + bigram
    "a b a b a b a b",                        # heavy bigram repetition
    "unique words only here now",             # no repetition
    "",                                       # empty
    "solo",                                   # single word
    "x y z x y z x y",                        # tie between 'x y' and 'y z'
    None,                                     # null text
]


def test_repetition_stats_matches_oracle():
    df = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    out = repetition_stats_batch(df)
    for i, t in enumerate(TEXTS):
        n, dup, frac = _rep_oracle(t or "")
        row = out.iloc[i]
        assert row["n_words"] == n, (i, t)
        assert row["dup_word_frac"] == pytest.approx(dup, abs=1e-9), (i, t)
        assert row["top_bigram_char_frac"] == pytest.approx(
            frac, abs=1e-9
        ), (i, t)


def test_repetition_tie_breaks_to_smallest_bigram():
    # 'aa b' and 'b c' both occur twice; the tie must go to the
    # lexicographically smaller 'aa b' (char mass 2×3), not 'b c'
    # (2×2) — same rule as the SQL oracle's ORDER BY cnt DESC, g ASC
    df = pd.DataFrame({"text": ["aa b c aa b c"]})
    out = repetition_stats_batch(df)
    assert out["top_bigram_char_frac"].iloc[0] == pytest.approx(
        round(2 * 3 / 8, 6)
    )


def test_repetition_all_empty_batch():
    df = pd.DataFrame({"text": ["", None, "  "]})
    out = repetition_stats_batch(df)
    assert (out["n_words"] == 0).all()
    assert (out["dup_word_frac"] == 0.0).all()
    assert (out["top_bigram_char_frac"] == 0.0).all()


def test_contamination_flags():
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox",
                "a clean document here",
                "contains the quick brown fox verbatim",
                None,
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(2)
    out = (
        contamination_flags(ds, ["quick brown", "zebra"])
        .to_pandas()
        .set_index("doc_id")["contaminated"]
    )
    assert out[1] == 1 and out[3] == 1
    assert out[2] == 0 and out[4] == 0
    # empty / all-blank probe list: nothing flagged
    out2 = contamination_flags(ds, ["", ""]).to_pandas()
    assert (out2["contaminated"] == 0).all()


def _quota_oracle(df, k, salt="graft-quota"):
    df = df.assign(
        _h=[
            hashlib.md5(f"{i}:{salt}".encode()).hexdigest()
            for i in df["doc_id"]
        ]
    )
    keep = (
        df.sort_values(["_h", "doc_id"]).groupby("source").head(k)
    )
    return set(keep["doc_id"])


def test_per_source_quota():
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(200),
            "source": [f"s{i}" for i in rng.integers(0, 7, 200)],
        }
    )
    ds = rd.from_pandas(df).repartition(5)
    out = per_source_quota(ds, k=4).to_pandas()
    assert set(out["doc_id"]) == _quota_oracle(df, 4)
    assert out.groupby("source").size().max() <= 4


def test_per_source_quota_under_k_keeps_all():
    df = pd.DataFrame({"doc_id": [1, 2, 3], "source": ["a", "a", "b"]})
    out = per_source_quota(rd.from_pandas(df), k=10).to_pandas()
    assert set(out["doc_id"]) == {1, 2, 3}


# ---------------------------------------------------------------------------
# exact distributed quantiles (stages/stats)
# ---------------------------------------------------------------------------

def test_group_quantiles_exact_percentile_disc():
    import math

    from graphforge_ray.stages.stats import group_quantiles

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 500),
            "v": rng.integers(0, 40, 500).astype("int64"),
        }
    )
    # sprinkle nulls — must be excluded like SQL aggregates do
    df.loc[df.index[:10], "v"] = pd.NA
    df["v"] = df["v"].astype("Int64")
    qs = (0.25, 0.5, 0.75, 0.9, 1.0)
    out = (
        group_quantiles(rd.from_pandas(df).repartition(4), "k", "v", qs)
        .to_pandas()
        .set_index(["k", "q_pct"])["value"]
    )

    for k, grp in df.dropna().groupby("k"):
        vals = np.sort(grp["v"].astype("int64").to_numpy())
        for q in qs:
            expect = vals[math.ceil(q * len(vals)) - 1]  # percentile_disc
            assert out.loc[(k, int(q * 100))] == expect, (k, q)


def test_group_quantiles_rejects_bad_q():
    from graphforge_ray.stages.stats import group_quantiles

    ds = rd.from_pandas(pd.DataFrame({"k": ["a"], "v": [1]}))
    with pytest.raises(ValueError):
        group_quantiles(ds, "k", "v", qs=(0.0,))
    with pytest.raises(ValueError):
        group_quantiles(ds, "k", "v", qs=())


def test_tfidf_topk_matches_brute_force():
    import math
    from collections import Counter

    from graphforge_ray.stages.curation import tfidf_topk

    texts = [
        "apple banana apple cherry",
        "banana banana date",
        "cherry date apple",
        "",                       # empty doc still counts toward N
        "eel eel eel eel",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (
        tfidf_topk(rd.from_pandas(df).repartition(3), k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )

    n = float(len(texts))
    dfreq = Counter()
    for t in texts:
        dfreq.update(set(t.split()))
    for doc_id, t in enumerate(texts):
        tf = Counter(t.split())
        scored = sorted(
            (
                (math.floor(c * math.log(n / dfreq[w]) * 1e6) / 1e6, w)
                for w, c in tf.items()
            ),
            key=lambda sw: (-sw[0], sw[1]),
        )[:2]
        got = out[out["doc_id"] == doc_id]
        assert len(got) == len(scored), doc_id
        for (escore, eterm), (_, row) in zip(scored, got.iterrows()):
            assert row["term"] == eterm, (doc_id, eterm)
            assert row["score"] == pytest.approx(escore, abs=1e-9)
    assert len(out[out["doc_id"] == 3]) == 0  # empty doc → no terms


def test_deterministic_shuffle_rank_is_total_md5_order():
    from graphforge_ray.stages.sampling import deterministic_shuffle

    ids = np.arange(300)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(5)
    out = (
        deterministic_shuffle(ds, num_shards=4)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    expect = sorted(
        ids, key=lambda i: (hashlib.md5(f"{i}:graft-shuffle".encode())
                            .hexdigest(), i)
    )
    assert out["doc_id"].tolist() == expect
    assert out["rank"].tolist() == list(range(300))  # dense, 0-based
    assert (out["shard"] == out["rank"] % 4).all()
    # reproducible across a re-run and a different block layout
    out2 = (
        deterministic_shuffle(
            rd.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(11),
            num_shards=4,
        )
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    assert out2["doc_id"].tolist() == expect


def test_pack_sequences_greedy_invariants():
    from graphforge_ray.stages.sampling import pack_sequences

    rng = np.random.default_rng(21)
    n = 120
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "shard": rng.integers(0, 3, n),
            "rank": np.arange(n),
            "n_tokens": rng.integers(1, 60, n).astype("int64"),
        }
    )
    # one oversized doc: must get a sequence alone
    df.loc[7, "n_tokens"] = 500
    cap = 100
    out = (
        pack_sequences(rd.from_pandas(df).repartition(4), capacity=cap)
        .to_pandas()
        .merge(df[["doc_id", "n_tokens", "rank"]], on="doc_id")
        .sort_values(["shard", "rank"])
    )
    assert len(out) == n
    for shard, g in out.groupby("shard"):
        # offsets restart at 0 per sequence and accumulate sizes
        for _, seq in g.groupby("seq_id"):
            sizes = seq["n_tokens"].to_numpy()
            offs = seq["offset"].to_numpy()
            assert offs[0] == 0
            assert (offs[1:] == np.cumsum(sizes)[:-1]).all()
            if len(seq) > 1:  # multi-doc sequences fit the capacity
                assert sizes.sum() <= cap
        # seq ids are dense and increase along the rank order
        sid = g["seq_id"].to_numpy()
        assert sid[0] == 0 and ((sid[1:] - sid[:-1]) <= 1).all()
        assert ((sid[1:] - sid[:-1]) >= 0).all()
        # greedy: a new sequence only opens when the doc did NOT fit
        fill = 0
        for _, row in g.iterrows():
            s = int(row["n_tokens"])
            if fill and fill + s > cap:
                assert row["offset"] == 0
                fill = 0
            assert row["offset"] == fill
            fill += s
    big = out[out["doc_id"] == 7]
    assert (out[(out["shard"] == big["shard"].iloc[0])
                & (out["seq_id"] == big["seq_id"].iloc[0])].shape[0] == 1)


def test_pack_sequences_rejects_bad_capacity():
    from graphforge_ray.stages.sampling import pack_sequences

    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1], "shard": [0], "rank": [0], "n_tokens": [5]}
    ))
    with pytest.raises(ValueError):
        pack_sequences(ds, capacity=0)


def test_bigram_lm_scores_match_brute_force():
    import math
    from collections import Counter

    from graphforge_ray.stages.lm import bigram_logprob_scores

    texts = [
        "the cat sat",
        "the cat ran",
        "dog",              # single word → no bigrams → 0.0
        "the cat sat on the mat",
        "",                 # empty → 0.0
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (
        bigram_logprob_scores(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("doc_id")["lm_score"]
    )
    assert len(out) == len(texts)

    uni = Counter(w for t in texts for w in t.split())
    bi = Counter(
        (a, b) for t in texts for a, b in zip(t.split(), t.split()[1:])
    )
    v = float(len(uni))
    for i, t in enumerate(texts):
        ws = t.split()
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            assert out[i] == 0.0
            continue
        lp = sum(
            math.log((bi[p] + 1.0) / (uni[p[0]] + v)) for p in pairs
        ) / len(pairs)
        assert out[i] == pytest.approx(math.floor(lp * 1e4) / 1e4,
                                       abs=1e-12), i
    # more in-corpus-typical docs score higher than rare sequences
    assert out[0] > out[2] - 10  # sanity: scores are finite/ordered


def _span_oracle(docs, window):
    """Pure-Python replay of span_dedup: spans = non-overlapping
    windows of `window` whitespace tokens (trailing partial kept);
    dup = span text in >= 2 distinct docs; kept_chars =
    len(' '.join(kept spans))."""
    spans = []  # (doc_id, span)
    for doc_id, text in docs:
        ws = (text or "").split()
        for i in range(0, len(ws), window):
            spans.append((doc_id, " ".join(ws[i : i + window])))
    by_span = {}
    for doc_id, s in spans:
        by_span.setdefault(s, set()).add(doc_id)
    out = {}
    for doc_id, s in spans:
        n, nd, kept = out.get(doc_id, (0, 0, []))
        dup = len(by_span[s]) >= 2
        out[doc_id] = (n + 1, nd + (1 if dup else 0),
                       kept + ([] if dup else [s]))
    return {
        d: (n, nd, len(" ".join(kept)))
        for d, (n, nd, kept) in out.items()
    }


def test_span_dedup_matches_oracle():
    from graphforge_ray.stages.curation import span_dedup

    docs = [
        (1, "a b c d e f g h"),          # spans: 'a b c','d e f','g h'
        (2, "a b c x y z"),              # shares 'a b c' with doc 1
        (3, "x y z a b c"),              # shares 'x y z' with doc 2
        (4, "q r s t u"),                # unique; partial tail 't u'
        (5, "a b c a b c"),              # internal repeat of a dup span
        (6, "one two"),                  # single partial span, unique
        (7, ""),                         # no tokens -> no output row
        (8, None),                       # null text -> no output row
    ]
    ds = rd.from_pandas(
        pd.DataFrame(docs, columns=["doc_id", "text"])
    ).repartition(3)
    got = (
        span_dedup(ds, window=3, num_buckets=4)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = _span_oracle(docs, 3)
    assert set(got["doc_id"]) == set(want)  # 7/8 dropped (no spans)
    for _, r in got.iterrows():
        n, nd, kept = want[r["doc_id"]]
        assert (r["n_spans"], r["n_dup_spans"], r["kept_chars"]) == (
            n, nd, kept,
        ), r["doc_id"]


def test_span_dedup_internal_repeat_not_cross_doc():
    from graphforge_ray.stages.curation import span_dedup

    # 'p q r' repeats inside ONE doc only -> cross-doc rule keeps it
    ds = rd.from_pandas(
        pd.DataFrame(
            [(1, "p q r p q r"), (2, "s t u")],
            columns=["doc_id", "text"],
        )
    )
    got = span_dedup(ds, window=3, num_buckets=2).to_pandas()
    got = got.set_index("doc_id")
    assert got.loc[1, "n_dup_spans"] == 0
    assert got.loc[1, "kept_chars"] == len("p q r p q r")


def test_budget_select_greedy_prefix():
    from graphforge_ray.stages.sampling import budget_select

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "score": [0.9, 0.8, 0.8, 0.5, 0.3, 0.1],
            "n_tok": [10, 20, 20, 30, 40, 50],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    # order: 1(10) 2(20) 3(20) 4(30)... budget 45 -> before-sums
    # 0,10,30,50 -> keep 1,2,3 (doc 3 overflows but started under)
    out = budget_select(
        ds, budget=45, score_col="score", size_col="n_tok",
        num_buckets=8,
    ).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]

    # ascending: order 6(50) -> budget 10 keeps just doc 6
    out2 = budget_select(
        ds, budget=10, score_col="score", size_col="n_tok",
        descending=False, num_buckets=8,
    ).to_pandas()
    assert sorted(out2["doc_id"]) == [6]

    # budget beyond the corpus keeps everything
    out3 = budget_select(
        ds, budget=10_000, score_col="score", size_col="n_tok",
        num_buckets=8,
    ).to_pandas()
    assert sorted(out3["doc_id"]) == [1, 2, 3, 4, 5, 6]


def test_budget_select_score_is_size():
    from graphforge_ray.stages.sampling import budget_select

    df = pd.DataFrame({"doc_id": [1, 2, 3], "n": [5, 7, 3]})
    out = budget_select(
        rd.from_pandas(df), budget=8, score_col="n", size_col="n",
        num_buckets=4,
    ).to_pandas()
    # order: 2(7) 1(5): before 0, 7 -> keep both; 3 starts at 12 >= 8
    assert sorted(out["doc_id"]) == [1, 2]
    assert list(out.columns) == ["doc_id", "n"]


def test_stratified_sample_thresholds_and_default():
    from graphforge_ray.stages.sampling import stratified_sample

    df = pd.DataFrame(
        {
            "doc_id": range(200),
            "lang": ["en", "fr", "de", "zh"] * 50,
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = stratified_sample(
        ds, {"fr": 100.0, "de": 0.0, "en": 50.0}, group_col="lang"
    ).to_pandas()
    got = out.groupby("lang").size().to_dict()
    assert got.get("fr") == 50          # 100% kept
    assert "de" not in got              # 0% kept
    assert "zh" not in got              # default_pct=0 drops
    assert 10 <= got.get("en", 0) <= 40  # ~50% of 50, hash-determined

    # reproducible: identical on a different partitioning
    out2 = stratified_sample(
        rd.from_pandas(df).repartition(7),
        {"fr": 100.0, "de": 0.0, "en": 50.0},
        group_col="lang",
    ).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_source_mixture_replication_and_determinism():
    from graphforge_ray.stages.sampling import source_mixture

    df = pd.DataFrame(
        {
            "doc_id": range(300),
            "source": ["a", "b", "c"] * 100,
            "text": ["t"] * 300,
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    weights = {"a": 2.5, "b": 0.4, "c": 0.0}
    out = source_mixture(ds, weights, default_weight=1.0).to_pandas()

    # per-row oracle: md5(str(id)+':graft-mix') 8-hex prefix threshold
    def copies(doc_id, src):
        w = weights.get(src, 1.0)
        base = int(np.floor(w))
        hx = hashlib.md5(f"{doc_id}:graft-mix".encode()).hexdigest()
        extra = int(hx[:8], 16) < int(np.floor((w - base) * (1 << 32)))
        return base + extra

    exp_counts = {
        (i, s): copies(i, s)
        for i, s in zip(df["doc_id"], df["source"])
        if copies(i, s) > 0
    }
    got_counts = (
        out.groupby(["doc_id", "source"]).size().to_dict()
    )
    assert got_counts == exp_counts
    # 'c' fully dropped; 'a' rows appear 2 or 3 times; epoch indexes
    # are exactly 0..copies-1 per doc
    assert not (out["source"] == "c").any()
    a_copies = out.loc[out["source"] == "a"].groupby("doc_id")["epoch"]
    for _, ep in a_copies:
        assert sorted(ep) == list(range(len(ep)))

    # reproducible across partitionings
    out2 = source_mixture(
        rd.from_pandas(df).repartition(9), weights, default_weight=1.0
    ).to_pandas()
    assert sorted(zip(out2["doc_id"], out2["epoch"])) == sorted(
        zip(out["doc_id"], out["epoch"])
    )


def test_source_mixture_negative_weight_raises():
    from graphforge_ray.stages.sampling import source_mixture

    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [1], "source": ["a"]})
    )
    with pytest.raises(ValueError, match="negative"):
        source_mixture(ds, {"a": -1.0})


# ---------------------------------------------------------------------------
# dup_kgram_spans / dup_kgram_stats (Lee-et-al-style exact substring dedup)
# ---------------------------------------------------------------------------

def _dup_kgram_oracle(docs: dict, k: int, min_count: int = 2):
    """Brute-force: count every stride-1 k-gram, mark starts whose gram
    occurs >= min_count corpus-wide, merge per-doc intervals (touching
    merge). Returns ({doc: [(s, e), ...]}, {doc: (n_grams, n_dup)})."""
    cnt = Counter()
    toks = {d: (t or "").split() for d, t in docs.items()}
    for w in toks.values():
        for i in range(len(w) - k + 1):
            cnt[" ".join(w[i : i + k])] += 1
    spans, stats = {}, {}
    for d, w in toks.items():
        ng = max(len(w) - k + 1, 0)
        starts = [
            i for i in range(ng) if cnt[" ".join(w[i : i + k])] >= min_count
        ]
        merged = []
        for i in starts:
            if merged and i <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], i + k)
            else:
                merged.append([i, i + k])
        if starts:
            spans[d] = [tuple(s) for s in merged]
            stats[d] = (ng, len(starts))
    return spans, stats


def test_dup_kgram_spans_matches_bruteforce():
    from graphforge_ray.stages.curation import dup_kgram_spans

    docs = {
        1: "the quick brown fox jumps over the lazy dog again and again ok",
        2: "intro words the quick brown fox jumps over the cliff end here",
        3: "totally unique content nothing shared with anyone else at all",
        4: "again and again ok again and again ok padding pad pad pad",
        5: "x y z the quick brown fox jumps over the lazy dog tail",
        6: "",
        7: None,
    }
    want, _ = _dup_kgram_oracle(docs, k=4)
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    ).repartition(3)
    out = dup_kgram_spans(ds, k=4).to_pandas().sort_values(
        ["doc_id", "tok_start"]
    )
    got = {}
    for _, r in out.iterrows():
        got.setdefault(int(r.doc_id), []).append(
            (int(r.tok_start), int(r.tok_end))
        )
    assert got == want


def test_dup_kgram_spans_intra_doc_repeat_counts():
    # a gram repeated only WITHIN one doc is duplicated (min_count is
    # corpus-wide occurrences, the Lee-et-al semantics)
    from graphforge_ray.stages.curation import dup_kgram_spans

    docs = {1: "p q r s junk p q r s", 2: "nothing in common here ok"}
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    )
    out = dup_kgram_spans(ds, k=4).to_pandas()
    assert set(zip(out.doc_id, out.tok_start, out.tok_end)) == {
        (1, 0, 4),
        (1, 5, 9),
    }


def test_dup_kgram_stats_random_corpus_matches_bruteforce():
    from graphforge_ray.stages.curation import dup_kgram_stats

    rng = np.random.RandomState(7)
    vocab = [f"w{j}" for j in range(30)]
    shared = "alpha beta gamma delta epsilon zeta"
    docs = {}
    for d in range(40):
        words = list(rng.choice(vocab, size=rng.randint(3, 25)))
        if d % 3 == 0:  # plant a shared run
            at = rng.randint(0, len(words) + 1)
            words[at:at] = shared.split()
        docs[d] = " ".join(words)
    k = 5
    want_spans, want_stats = _dup_kgram_oracle(docs, k=k)
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    ).repartition(5)
    st = dup_kgram_stats(ds, k=k).to_pandas().set_index("doc_id")
    assert set(st.index) == set(want_stats)
    for d, (ng, ndg) in want_stats.items():
        row = st.loc[d]
        assert row.n_grams == ng and row.n_dup_grams == ndg
        assert row.n_dup_spans == len(want_spans[d])
        assert row.n_dup_tokens == sum(e - s for s, e in want_spans[d])


def test_ngram_overlap_flags_exact_counts(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.curation import ngram_overlap_flags

    bench = "w1 w2 w3 w4 w5"          # 3 distinct 3-grams
    rows = [
        (0, bench),                    # full overlap: 3/3
        (1, "w1 w2 w3 x y z"),         # one hit gram of 4
        (2, "a b c d e f"),            # zero hits, 4 grams
        (3, "short"),                  # < n words → 0 grams, clean
        (4, None),                     # null-safe
        (5, "w1 w2 w3 w1 w2 w3 w4"),   # DISTINCT grams: 4 not 5
    ]
    ds = rd.from_pandas(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).repartition(3)
    got = (
        ngram_overlap_flags(
            ds, [bench], n=3, threshold_num=1, threshold_den=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_grams"].tolist() == [3, 4, 4, 0, 0, 4]
    # doc 5's distinct grams: 'w1 w2 w3' (hit), 'w2 w3 w1',
    # 'w3 w1 w2', 'w3 w4 ...'? → grams: w1w2w3, w2w3w1, w3w1w2,
    # w1w2w3(dup), w2w3w4 → 4 distinct, hits: w1w2w3 + w2w3w4? no —
    # bench grams are w1w2w3, w2w3w4, w3w4w5 → hits = 2
    assert got["n_hit"].tolist() == [3, 1, 0, 0, 0, 2]
    # threshold 1/4: contaminated iff 4*hits >= grams (and grams > 0)
    assert got["contaminated"].tolist() == [1, 1, 0, 0, 0, 1]


def test_ngram_overlap_rejects_bad_params(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.curation import ngram_overlap_flags

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["x"]}))
    with pytest.raises(ValueError, match="n must be"):
        ngram_overlap_flags(ds, ["p"], n=0)
    with pytest.raises(ValueError, match="bad threshold"):
        ngram_overlap_flags(ds, ["p"], threshold_den=0)


def test_weighted_sample_proportional_and_deterministic(ray_session):
    import ray.data as rd

    from graphforge_ray import metrics
    from graphforge_ray.stages.sampling import weighted_sample

    n = 400
    # half the ids carry 50x the weight → they should dominate the draw
    df = pd.DataFrame(
        {"doc_id": range(n),
         "w": [50.0 if i % 2 == 0 else 1.0 for i in range(n)]}
    )
    ds = rd.from_pandas(df).repartition(5)
    got = weighted_sample(ds, k=60, weight_col="w").to_pandas()
    assert len(got) == 60
    heavy = (got["doc_id"] % 2 == 0).sum()
    assert heavy >= 50  # weight-proportional, not uniform
    # deterministic + reshard-stable
    again = weighted_sample(
        rd.from_pandas(df).repartition(11), k=60, weight_col="w"
    ).to_pandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])

    # nonpositive / null weights can never be drawn — counted
    df2 = pd.DataFrame(
        {"doc_id": range(10),
         "w": [1.0] * 6 + [0.0, -1.0, np.nan, 2.0]}
    )
    before = metrics.snapshot()
    got2 = weighted_sample(
        rd.from_pandas(df2), k=10, weight_col="w"
    ).to_pandas()
    after = metrics.snapshot()
    assert len(got2) == 7
    assert not set(got2["doc_id"]) & {6, 7, 8}
    assert metrics.delta(before, after).get(
        "weighted_sample.nonpositive") == 3
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(rd.from_pandas(df2), k=0, weight_col="w")


def test_span_dedup_host_scoped_boilerplate():
    """scope_col: the SAME span in two DIFFERENT sources is not
    boilerplate; within one source it is once >= min_docs docs carry
    it."""
    from graphforge_ray.stages.curation import span_dedup

    docs = [
        # hostA: 'nav bar foo' repeats in 3 docs → boilerplate (min 3)
        (1, "nav bar foo body one x", "hostA"),
        (2, "nav bar foo body two y", "hostA"),
        (3, "nav bar foo body tri z", "hostA"),
        # hostB carries the same span once → NOT boilerplate there
        (4, "nav bar foo other text", "hostB"),
        # hostA span in only 2 docs → below min_docs, kept
        (5, "foot er!! twice only a", "hostA"),
        (6, "foot er!! twice only b", "hostA"),
    ]
    ds = rd.from_pandas(
        pd.DataFrame(docs, columns=["doc_id", "text", "source"])
    ).repartition(3)
    got = (
        span_dedup(ds, window=3, num_buckets=4,
                   scope_col="source", min_docs=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
        .set_index("doc_id")
    )
    # docs 1-3: first span flagged, second kept
    for d in (1, 2, 3):
        assert got.loc[d, "n_spans"] == 2 and got.loc[d, "n_dup_spans"] == 1
    # doc 4 (hostB) and docs 5-6 (< min_docs): nothing flagged
    for d in (4, 5, 6):
        assert got.loc[d, "n_dup_spans"] == 0, d
    assert got.loc[4, "kept_chars"] == len("nav bar foo other text")


def test_span_dedup_scoped_no_duplicates_guard():
    from graphforge_ray.stages.curation import span_dedup

    docs = [(1, "a b c", "h1"), (2, "d e f", "h2")]
    ds = rd.from_pandas(
        pd.DataFrame(docs, columns=["doc_id", "text", "source"])
    ).repartition(2)
    got = (
        span_dedup(ds, window=3, num_buckets=4,
                   scope_col="source", min_docs=2)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert list(got["n_dup_spans"]) == [0, 0]
    assert list(got["kept_chars"]) == [5, 5]
