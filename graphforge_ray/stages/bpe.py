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


def bpe_learn(
    docs: "ray.data.Dataset",
    num_merges: int = 50,
    text_col: str = "text",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges → DataFrame (rank:int64, left,
    right, count:int64), rank in merge order. Stops early (fewer rows)
    when no pair occurs twice. Ties at a round's max count break by
    pair string asc — byte-deterministic across cluster layouts."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be ≥ 1: {num_merges}")

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
    for _ in range(num_merges):
        top = (
            vocab.map_batches(
                lambda d, _b=num_buckets: _pair_counts(d, _b),
                batch_format="pandas",
            )
            .groupby("_bucket")
            .map_groups(
                lambda g: g.groupby("pair", as_index=False)["c"].sum()
                .sort_values(["c", "pair"], ascending=[False, True])
                .head(1),
                batch_format="pandas",
            )
            .to_pandas()  # ≤ num_buckets single-row candidates
        )
        if top.empty:
            break
        top = top.sort_values(["c", "pair"], ascending=[False, True])
        best_pair, best_c = top.iloc[0]["pair"], int(top.iloc[0]["c"])
        if best_c < 2:
            break  # nothing left worth merging
        left, right = best_pair.split(" ", 1)
        merges.append((left, right, best_c))

        pat = _merge_pattern(left, right)
        repl = (left + right).replace("\\", "\\\\")

        def apply_merge(d: pd.DataFrame, _p=pat, _r=repl) -> pd.DataFrame:
            return pd.DataFrame(
                {"sym_seq": d["sym_seq"].str.replace(_p, _r, regex=True),
                 "n": d["n"]}
            )

        vocab = snap_lineage(
            vocab.map_batches(apply_merge, batch_format="pandas")
        )

    return pd.DataFrame(
        {
            "rank": np.arange(1, len(merges) + 1, dtype=np.int64),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "count": np.asarray([m[2] for m in merges], dtype=np.int64),
        }
    )


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
