"""Distributed byte-pair-encoding: vocab learning and tokenization.

Classic Sennrich-style BPE (Neural Machine Translation of Rare Words
with Subword Units, ACL 2016 — public algorithm) re-expressed in the
repo's shuffle idiom. The key scale observation: after the first word
count, every round operates on the DISTINCT-WORD vocabulary weighted by
frequency — corpus text is touched exactly once, and the per-round
shuffles move (pair, count) rows, never documents.

- ``bpe_learn``: word-count combiner → one word-bucket shuffle, then
  ``num_merges`` rounds of: vectorized adjacent-pair counting over the
  distributed vocab (explode + group-shift, no per-row Python), a
  (pair → count) bucket-sum shuffle, per-bucket top-1, and a driver
  argmax over ≤ num_buckets candidate rows (ties: count desc, pair
  asc — fully deterministic). The winning pair is applied map-side
  with the standard boundary-lookaround regex (non-overlapping,
  left-to-right, consecutive pairs both merge: ``a a a a`` →
  ``aa aa``). The driver sees one (pair, count) row per round.
- ``bpe_tokenize``: applies a learned merge list to a corpus, one
  batch-local distinct-word cache per batch (each unique word is
  encoded once per batch, then broadcast to its occurrences).

Iterated rounds snap lineage each round (``shuffle.snap_lineage``) —
same plan-replay fix as the label-propagation loops.

Symbols are space-joined (input words are ``\\S+`` tokens, so symbols
never contain whitespace); each word ends with the ``</w>`` end-of-word
marker, so merges never cross word boundaries.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..shuffle import bucket_tag, snap_lineage

__all__ = ["bpe_learn", "bpe_tokenize", "word_counts"]

_EOW = "</w>"


def _to_symbols(word: str) -> str:
    return " ".join(list(word) + [_EOW])


def word_counts(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distributed (word, n:int64) counts over whitespace tokens — the
    one corpus-text pass BPE needs."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[text_col].fillna("").str.findall(r"\S+").explode().dropna()
        if ex.empty:
            return pd.DataFrame(
                {"word": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "_bucket": pd.Series([], dtype="int32")}
            )
        g = (
            ex.to_frame("word").groupby("word", as_index=False).size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "word", num_buckets))

    return (
        docs.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.groupby("word", as_index=False)["n"].sum(),
            batch_format="pandas",
        )
    )


def _pair_counts(vocab_df: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    """Vectorized adjacent-symbol-pair counts of one vocab batch →
    (pair, c, _bucket). explode + level-0 shift — no per-word loop."""
    parts = vocab_df["sym_seq"].str.split(" ")
    ex = parts.explode()
    if ex.empty:
        return pd.DataFrame(
            {"pair": pd.Series([], dtype=object),
             "c": pd.Series([], dtype=np.int64),
             "_bucket": pd.Series([], dtype="int32")}
        )
    nxt = ex.groupby(level=0).shift(-1)
    mask = nxt.notna()
    pair = ex[mask] + " " + nxt[mask]
    w = vocab_df["n"].reindex(pair.index)
    g = (
        pd.DataFrame({"pair": pair.to_numpy(), "c": w.to_numpy(np.int64)})
        .groupby("pair", as_index=False)["c"].sum()
    )
    g["c"] = g["c"].astype(np.int64)
    return g.assign(_bucket=bucket_tag(g, "pair", num_buckets))


def _merge_pattern(left: str, right: str) -> "re.Pattern[str]":
    # lookarounds don't consume the boundary spaces, so consecutive
    # occurrences (a a a a) all merge in one left-to-right pass
    return re.compile(
        r"(?<!\S)" + re.escape(f"{left} {right}") + r"(?!\S)"
    )


def _select_compatible(
    top: pd.DataFrame, budget: int
) -> list[tuple[str, str, int]]:
    """Greedy batch selection over one round's candidate pairs (already
    count-desc, pair-asc sorted): take up to ``budget`` pairs that are
    pairwise SYMBOL-DISJOINT — no chosen pair shares a left/right symbol
    with another, and no chosen pair's merged symbol collides with
    another's symbols. Disjoint merges leave each other's occurrence
    counts exactly invariant (replacing ``a b``→``ab`` can neither
    create nor destroy a ``c d`` adjacency when {a,b,ab}∩{c,d,cd}=∅),
    so applying the batch in one pass equals applying its members
    sequentially in selection order."""
    chosen: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for pair, c in zip(top["pair"], top["c"]):
        if c < 2:
            break
        left, right = pair.split(" ", 1)
        merged = left + right
        if left in used or right in used or merged in used:
            continue
        chosen.append((left, right, int(c)))
        used.update((left, right, merged))
        if len(chosen) >= budget:
            break
    return chosen


def bpe_learn(
    docs: "ray.data.Dataset",
    num_merges: int = 50,
    text_col: str = "text",
    num_buckets: int = 16,
    merges_per_round: int = 1,
    return_rounds: bool = False,
) -> "pd.DataFrame | tuple[pd.DataFrame, int]":
    """Learn ``num_merges`` BPE merges → DataFrame (rank:int64, left,
    right, count:int64), rank in merge order. Stops early (fewer rows)
    when no pair occurs twice. Ties at a round's max count break by
    pair string asc — byte-deterministic across cluster layouts.

    ``merges_per_round`` (B) batches COMPATIBLE merges per distributed
    round (r4 verdict item #3 — a production 32k-merge vocab at B=1 is
    32k sequential executions): each round collects the top-B candidate
    pairs per bucket, greedily selects up to B pairwise symbol-disjoint
    pairs in (count desc, pair asc) order, and applies them in ONE
    map-side pass. B=1 reproduces the sequential algorithm exactly
    (byte-identical goldens). B>1 is the standard batched-training
    approximation: merges within a round are ranked by ROUND-START
    counts, so a batch may defer a just-created pair (e.g. ``x + ab``)
    that strict sequential greedy would have taken next; disjointness
    guarantees the counts it DOES use are exact.

    ``return_rounds=True`` additionally returns the number of
    distributed rounds executed."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be ≥ 1: {num_merges}")
    if merges_per_round < 1:
        raise ValueError(
            f"merges_per_round must be ≥ 1: {merges_per_round}"
        )

    vocab = snap_lineage(
        word_counts(docs, text_col=text_col, num_buckets=num_buckets)
        .map_batches(
            lambda d: pd.DataFrame(
                {"sym_seq": d["word"].map(_to_symbols), "n": d["n"]}
            ),
            batch_format="pandas",
        )
    )

    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < num_merges:
        budget = min(merges_per_round, num_merges - len(merges))
        top = (
            vocab.map_batches(
                lambda d, _b=num_buckets: _pair_counts(d, _b),
                batch_format="pandas",
            )
            .groupby("_bucket")
            .map_groups(
                lambda g, _k=budget:
                g.groupby("pair", as_index=False)["c"].sum()
                .sort_values(["c", "pair"], ascending=[False, True])
                .head(_k),
                batch_format="pandas",
            )
            .to_pandas()  # ≤ budget × num_buckets candidate rows
        )
        rounds += 1
        if top.empty:
            break
        top = top.sort_values(["c", "pair"], ascending=[False, True])
        batch = _select_compatible(top, budget)
        if not batch:
            break  # nothing left worth merging
        merges.extend(batch)

        # one map-side pass applies the whole batch (regex chain in
        # selection order — disjointness makes the order immaterial,
        # the fixed order keeps it deterministic anyway)
        pats = [
            (_merge_pattern(l, r), (l + r).replace("\\", "\\\\"))
            for l, r, _c in batch
        ]

        def apply_batch(d: pd.DataFrame, _ps=tuple(pats)) -> pd.DataFrame:
            s = d["sym_seq"]
            for p, rep in _ps:
                s = s.str.replace(p, rep, regex=True)
            return pd.DataFrame({"sym_seq": s, "n": d["n"]})

        vocab = snap_lineage(
            vocab.map_batches(apply_batch, batch_format="pandas")
        )

    out = pd.DataFrame(
        {
            "rank": np.arange(1, len(merges) + 1, dtype=np.int64),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "count": np.asarray([m[2] for m in merges], dtype=np.int64),
        }
    )
    return (out, rounds) if return_rounds else out


def _encode_word(word: str, merge_ranks: dict[tuple[str, str], int]):
    """Sequential BPE encode of ONE word (lowest-rank merge first —
    the standard greedy order). Used per DISTINCT word per batch."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = merge_ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # merge ALL non-overlapping occurrences of that pair, left→right
        pair = (syms[best], syms[best + 1])
        out, i = [], 0
        while i < len(syms):
            if (
                i < len(syms) - 1
                and (syms[i], syms[i + 1]) == pair
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_tokenize(
    docs: "ray.data.Dataset",
    merges: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Tokenize a corpus with a learned merge table → Dataset
    (id, n_words:int64, n_bpe_tokens:int64, tokens:str) with ``tokens``
    the space-joined BPE symbol stream. Map-side only (no shuffle): the
    merge table is broadcast in the task closure; each batch encodes
    its DISTINCT words once and maps occurrences through the cache."""
    ranks = {
        (l, r): i
        for i, (l, r) in enumerate(zip(merges["left"], merges["right"]))
    }

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        words = df[text_col].fillna("").str.findall(r"\S+")
        cache: dict[str, str] = {}

        def enc_list(ws: list) -> tuple[int, str]:
            toks: list[str] = []
            for w in ws:
                t = cache.get(w)
                if t is None:
                    t = " ".join(_encode_word(w, ranks))
                    cache[w] = t
                toks.append(t)
            return len(toks), " ".join(toks)

        pairs = [enc_list(ws) for ws in words]
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "n_words": np.asarray([p[0] for p in pairs], np.int64),
                "n_bpe_tokens": np.asarray(
                    [p[1].count(" ") + 1 if p[1] else 0 for p in pairs],
                    np.int64,
                ),
                "tokens": [p[1] for p in pairs],
            }
        )

    return docs.map_batches(encode, batch_format="pandas")
