"""Corpus sketches (heavy hitters, KMV distinct) and retrieval
(inverted index, BM25) — toy-exact semantics plus the SQL-parity rules
the driver oracles rely on."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphforge_ray.stages.index import bm25_topk, inverted_index
from graphforge_ray.stages.sketches import (
    approx_distinct_kmv,
    corpus_top_terms,
)


@pytest.fixture
def docs(ray_session):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "cat dog",
                    "dog dog bird",
                    "cat cat cat fish",
                    None,
                ],
            }
        )
    ).repartition(2)


def test_top_terms_exact_with_ties(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame(
            {"text": ["a b b c", "b c c   d", None, "", "a a a", "e b"]}
        )
    ).repartition(3)
    out = (
        corpus_top_terms(ds, k=3).to_pandas().sort_values("rank")
    )
    # a=4, b=4, c=3: count desc then term asc — a before b at the tie
    assert list(out["term"]) == ["a", "b", "c"]
    assert list(out["count"]) == [4, 4, 3]
    assert list(out["rank"]) == [1, 2, 3]


def test_top_terms_k_larger_than_vocab(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"text": ["x y", "y"]}))
    out = corpus_top_terms(ds, k=10).to_pandas()
    assert len(out) == 2  # never pads


def test_kmv_exact_below_k(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame({"v": [1, 2, 3, 2, 1, None]})
    )
    out = approx_distinct_kmv(ds, "v", k=64)
    assert int(out.loc[0, "est_distinct"]) == 3
    assert int(out.loc[0, "n_hashes"]) == 3


def test_kmv_estimator_branch_and_merge_invariance(ray_session):
    vals = list(range(1000)) + [5] * 500
    a = approx_distinct_kmv(
        rd.from_pandas(pd.DataFrame({"v": vals})).repartition(2), "v",
        k=64,
    )
    b = approx_distinct_kmv(
        rd.from_pandas(pd.DataFrame({"v": vals})).repartition(7), "v",
        k=64,
    )
    # estimate is a pure function of the value SET — block layout
    # cannot change it (mergeable-partial invariant)
    assert int(a.loc[0, "est_distinct"]) == int(b.loc[0, "est_distinct"])
    est = int(a.loc[0, "est_distinct"])
    # k=64 → ~12.7% std error; 2.5σ band around the true 1000
    assert 680 < est < 1320


def test_kmv_matches_python_replay(ray_session):
    # the exact KMV rule the SQL oracle replays
    import hashlib

    vals = [f"v{i}" for i in range(500)]
    k = 32
    out = approx_distinct_kmv(
        rd.from_pandas(pd.DataFrame({"v": vals})), "v", k=k
    )
    hx = sorted(hashlib.md5(v.encode()).hexdigest() for v in set(vals))
    vk = int(hx[k - 1][:10], 16)
    expect = int(np.floor((k - 1) / (vk / float(16**10))))
    assert int(out.loc[0, "est_distinct"]) == expect


def test_inverted_index_postings_and_df(docs):
    idx = inverted_index(docs, postings_cap=2).to_pandas()
    m = {r["term"]: (r["df"], r["postings"]) for _, r in idx.iterrows()}
    assert m["dog"] == (2, "1,2")
    assert m["cat"] == (2, "1,3")
    assert m["bird"] == (1, "2")
    assert m["fish"] == (1, "3")


def test_inverted_index_cap_truncates_postings_not_df(ray_session):
    from graphforge_ray import metrics

    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["x", "x", "x y"]})
    )
    before = metrics.snapshot().get("inverted_index_capped", 0)
    idx = inverted_index(ds, postings_cap=2).to_pandas()
    r = idx[idx["term"] == "x"].iloc[0]
    assert int(r["df"]) == 3  # df is never truncated
    assert r["postings"] == "1,2"  # smallest ids kept
    assert metrics.snapshot().get("inverted_index_capped", 0) == before + 1


def test_bm25_ranking_matches_sequential_replay(docs):
    out = bm25_topk(docs, ["cat", "fish"], k=3)
    texts = {1: "cat dog", 2: "dog dog bird", 3: "cat cat cat fish"}
    n, dls = 4.0, {1: 2, 2: 3, 3: 4, 4: 0}
    avgdl = sum(dls.values()) / n

    def score(i):
        s = 0.0
        for t in ("cat", "fish"):
            dfreq = sum(1 for x in texts.values() if t in x.split())
            idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1)
            tf = texts.get(i, "").split().count(t)
            if tf:
                s += idf * (tf * 2.2) / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * dls[i] / avgdl)
                )
        return math.floor(s * 1e6) / 1e6

    assert list(out["id"]) == [3, 1]  # doc 3 (cat×3+fish) then doc 1
    for _, row in out.iterrows():
        assert row["score"] == pytest.approx(score(int(row["id"])),
                                             abs=1e-12)


def test_bm25_empty_query_refused(docs):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(docs, [], k=3)


def test_hll_registers_replay_and_accuracy(ray_session):
    import hashlib

    import numpy as np
    import ray.data as rd

    from graphforge_ray.stages.sketches import approx_distinct_hll

    vals = [f"user-{i}" for i in range(3000)] * 2  # dups don't matter
    ds = rd.from_pandas(pd.DataFrame({"u": vals})).repartition(4)
    got = approx_distinct_hll(ds, "u", b=10)
    est = got["est"].iloc[0]
    assert abs(est - 3000) / 3000 < 0.15  # ~3% typical at m=1024

    # register-exact replay
    m, w = 1024, 30
    regs = np.zeros(m, np.int64)
    for v in set(vals):
        h = int(hashlib.md5(f"graft-hll|{v}".encode())
                .hexdigest()[:10], 16)
        idx, rem = h >> w, h & ((1 << w) - 1)
        rho = w + 1 if rem == 0 else w - int(np.floor(np.log2(rem)))
        regs[idx] = max(regs[idx], rho)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -regs.astype(float)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    assert est == float(np.floor(e * 1e4) / 1e4)
    with pytest.raises(ValueError, match="b must"):
        approx_distinct_hll(ds, "u", b=2)


def test_cms_exact_when_wide_and_merge_invariant(ray_session):
    from graphforge_ray.stages.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    vals = ["a"] * 7 + ["b"] * 3 + ["c"] * 5 + [None, None]
    df = pd.DataFrame({"v": vals})
    one = count_min_sketch(rd.from_pandas(df), "v", width=64, depth=3)
    many = count_min_sketch(
        rd.from_pandas(df).repartition(5), "v", width=64, depth=3
    )
    # additive counters → block layout can't change the merged sketch
    pd.testing.assert_frame_equal(one, many)
    est = cms_estimate(one, ["a", "b", "c", "zz"], width=64, depth=3)
    assert dict(zip(est["key"], est["est"])) == {
        "a": 7, "b": 3, "c": 5, "zz": 0
    }
    # total mass per sketch row = non-null row count
    assert (one.groupby("row")["count"].sum() == 15).all()


def test_cms_never_undercounts_and_collides_when_narrow(ray_session):
    from graphforge_ray.stages.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    rng = np.random.RandomState(7)
    keys = [f"k{i}" for i in range(20)]
    true = {k: int(rng.randint(1, 30)) for k in keys}
    rows = [k for k, n in true.items() for _ in range(n)]
    ds = rd.from_pandas(pd.DataFrame({"v": rows})).repartition(4)
    sk = count_min_sketch(ds, "v", width=4, depth=2)
    est = cms_estimate(sk, keys, width=4, depth=2)
    got = dict(zip(est["key"], est["est"]))
    # CM estimate is an upper bound, never under
    assert all(got[k] >= true[k] for k in keys)
    # 20 keys in 4 slots MUST collide somewhere → at least one inflated
    assert any(got[k] > true[k] for k in keys)


def test_cms_empty_input_contract(ray_session):
    from graphforge_ray.stages.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    ds = rd.from_pandas(pd.DataFrame({"v": [None, None]}))
    sk = count_min_sketch(ds, "v", width=8, depth=2)
    assert len(sk) == 0
    est = cms_estimate(sk, ["x"], width=8, depth=2)
    assert list(est["est"]) == [0]
    with pytest.raises(ValueError):
        count_min_sketch(ds, "v", width=1, depth=2)


def test_hll_grouped_matches_global_per_group(ray_session):
    """A single-group dataset must produce EXACTLY the global sketch's
    estimate (same registers, same estimator, same FLOOR parity), and
    a multi-group run must equal running the global form per slice."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from graphforge_ray.stages.sketches import (
        approx_distinct_hll,
        approx_distinct_hll_grouped,
    )

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b", "c"], [400, 250, 50]),
        "v": np.concatenate([
            rng.integers(0, 180, 400),      # ~180 distinct
            rng.integers(1000, 1090, 250),  # ~90 distinct
            np.arange(50),                  # exactly 50 distinct
        ]),
    })
    got = (
        approx_distinct_hll_grouped(
            rd.from_pandas(df).repartition(4), "g", "v", b=10)
        .to_pandas().set_index("g")
    )
    assert set(got.index) == {"a", "b", "c"}
    for g in ["a", "b", "c"]:
        sl = df.loc[df["g"] == g, ["v"]]
        want = approx_distinct_hll(rd.from_pandas(sl), "v", b=10)
        assert got.loc[g, "est"] == want["est"].iloc[0], g
        true = sl["v"].nunique()
        assert abs(got.loc[g, "est"] - true) / true < 0.15, g


def test_hll_grouped_null_rows_dropped(ray_session):
    import pandas as pd
    import ray.data as rd

    from graphforge_ray.stages.sketches import approx_distinct_hll_grouped

    df = pd.DataFrame({"g": ["x", "x", None, "y"],
                       "v": [1, None, 3, 4]})
    got = (
        approx_distinct_hll_grouped(rd.from_pandas(df), "g", "v")
        .to_pandas().set_index("g")
    )
    assert set(got.index) == {"x", "y"}
    assert got.loc["x", "est"] > 0 and got.loc["y", "est"] > 0
