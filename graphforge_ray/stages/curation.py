"""Corpus-curation stages for LLM training-data pipelines.

Beyond-reference family (the reference constructs a KG from documents;
a 100-TB web corpus additionally needs curation before any KG/training
use — public recipes: Gopher/MassiveText repetition filters, benchmark
decontamination, per-domain quotas as in Common-Crawl pipelines).

All three operators are scale-shaped:

- repetition stats are a pure map (vectorized pandas explode/groupby —
  no per-document Python loop);
- decontamination broadcasts the (small, bounded) benchmark probe list
  once via ``ray.put`` and scans each batch vectorized — never a
  shuffle, never per-batch reshipping;
- per-source quotas use a map-side partial top-k combiner before the
  per-source shuffle, so the exchange moves at most k rows per
  (batch, source), never the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "repetition_stats_batch",
    "contamination_flags",
    "ngram_overlap_flags",
    "per_source_quota",
    "tfidf_topk",
    "span_dedup",
    "dup_kgram_spans",
    "dup_kgram_stats",
]


def repetition_stats_batch(
    df: pd.DataFrame, text_col: str = "text"
) -> pd.DataFrame:
    """Gopher/MassiveText-style repetition signals, word-level (the
    fixture corpus is single-line, so the line-level variants are
    degenerate here; the word/bigram forms are the load-bearing ones):

    - ``n_words``: whitespace-token count
    - ``dup_word_frac``: 1 − distinct_words / n_words (0 when empty)
    - ``top_bigram_char_frac``: characters covered by the most frequent
      word bigram — count × (len(w1)+len(w2)) over total word chars;
      ties break to the lexicographically smallest bigram; 0 when
      n_words < 2

    Entirely vectorized: one explode + three groupbys per batch, no
    per-document Python loop. Ratios rounded to 6 decimals (float
    parity rule for the SQL oracle)."""
    out = df.copy()
    words = df[text_col].fillna("").str.findall(r"\S+")
    n_words = words.str.len().astype("int64")
    out["n_words"] = n_words

    ex = words.explode().dropna()
    if ex.empty:
        out["dup_word_frac"] = np.float64(0.0)
        out["top_bigram_char_frac"] = np.float64(0.0)
        return out
    w = pd.DataFrame({"row": ex.index, "w": ex.to_numpy()})

    nuniq = w.groupby("row")["w"].nunique()
    dup = 1.0 - nuniq / n_words.reindex(nuniq.index)
    out["dup_word_frac"] = (
        dup.reindex(df.index, fill_value=0.0).astype("float64").round(6)
    )

    # bigrams: pair each word with the next word OF THE SAME ROW
    nxt = w["w"].shift(-1)
    same = w["row"].to_numpy() == np.roll(w["row"].to_numpy(), -1)
    same[-1] = False
    bg = pd.DataFrame(
        {
            "row": w.loc[same, "row"],
            "g": w.loc[same, "w"] + " " + nxt[same],
        }
    )
    word_chars = w.assign(n=w["w"].str.len()).groupby("row")["n"].sum()
    if bg.empty:
        out["top_bigram_char_frac"] = np.float64(0.0)
        return out
    cnt = bg.groupby(["row", "g"], as_index=False).size()
    # max count, tie → smallest gram: sort then first per row
    cnt = cnt.sort_values(
        ["row", "size", "g"], ascending=[True, False, True]
    ).drop_duplicates("row")
    frac = (
        cnt["size"].to_numpy()
        * (cnt["g"].str.len().to_numpy() - 1)
        / word_chars.reindex(cnt["row"]).to_numpy()
    )
    top = pd.Series(frac, index=cnt["row"].to_numpy())
    out["top_bigram_char_frac"] = (
        top.reindex(df.index, fill_value=0.0).astype("float64").round(6)
    )
    return out


def contamination_flags(
    docs: "ray.data.Dataset",
    probes: list[str],
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Benchmark decontamination: flag documents containing any probe
    string as a substring → adds ``contaminated`` (int64 0/1).

    The probe list (a benchmark/eval set — small and bounded by
    construction) is broadcast ONCE via ``ray.put`` and read inside
    each task; each batch is scanned with vectorized non-regex
    ``str.contains`` per probe (O(probes) vectorized passes). For very
    large probe sets, swap the scan for an Aho-Corasick automaton built
    once per actor — the broadcast/plumbing shape stays the same."""
    import ray as _ray

    ref = _ray.put([p for p in probes if p])

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        ps: list[str] = _ray.get(ref)
        text = df[text_col].fillna("")
        mask = np.zeros(len(df), dtype=bool)
        for p in ps:
            mask |= text.str.contains(p, regex=False).to_numpy()
        out = df.copy()
        out["contaminated"] = mask.astype(np.int64)
        return out

    return docs.map_batches(scan, batch_format="pandas")


def per_source_quota(
    docs: "ray.data.Dataset",
    k: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "graft-quota",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-source document quota: keep at most ``k`` documents per
    source, chosen by smallest ``md5(id:salt)`` (deterministic,
    reshard-stable — the Common-Crawl per-domain cap). Ties on the
    (improbable) equal digest break by id.

    Scale shape: a map-side combiner keeps the k smallest per
    (batch, source) so the shuffle moves ≤ k rows per batch per source;
    the per-source reduce is one vectorized sort+head per bucket. The
    md5 rank matches SQL ``md5(CAST(id AS VARCHAR) || ':salt')`` for
    oracle parity."""
    from ..shuffle import bucket_tag

    def rank_hash(ids: pd.Series):
        from .fasthash import md5_hex_keyed

        return md5_hex_keyed(ids, salt)  # vectorized (duckdb/numpy)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_h=rank_hash(df[id_col]))
        df = (
            df.sort_values(["_h", id_col])
            .groupby(source_col, as_index=False, sort=False)
            .head(k)
        )
        return df.assign(_bucket=bucket_tag(df, source_col, num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values(["_h", id_col])
            .groupby(source_col, as_index=False, sort=False)
            .head(k)
        )
        return g.drop(columns=["_h", "_bucket"])

    return (
        docs.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def span_dedup(
    docs: "ray.data.Dataset",
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    scope_col: str | None = None,
    min_docs: int = 2,
) -> "ray.data.Dataset":
    """Cross-document duplicate-span removal (the C4 / RefinedWeb
    line-dedup recipe generalized to fixed-width token spans — the
    fixture corpus is single-line, so "span" = ``window`` consecutive
    whitespace tokens, non-overlapping, trailing partial span kept).

    A span is a duplicate iff its exact text occurs in ≥ ``min_docs``
    DISTINCT documents — globally, or within each ``scope_col`` group
    when set (the CCNet per-domain boilerplate recipe: pass
    ``scope_col="source"`` and repeated within-host lines — nav bars,
    footers — are the ones marked). Every occurrence of a duplicate
    span is removed. Returns
    one row per document that has ≥ 1 span:
    ``(doc_id, n_spans, n_dup_spans, kept_chars)`` with ``kept_chars`` =
    ``len(' '.join(kept spans))``.

    Scale shape (nothing corpus-sized on the driver):
    1. spans per batch, fully vectorized: one explode + ``window − 1``
       shifted object-concat passes build the span strings (no per-span
       Python join); spans travel as 32-char md5 digests + char counts,
       never as text;
    2. duplicate marks: per-batch distinct ``(h, doc)`` combiner → one
       digest-bucketed groupby → emit ONLY the duplicate digests
       (narrow);
    3. marks join back onto the span rows with the acero-safe
       ``bindings_join`` (string digest key — the safe dtype path);
    4. per-doc rollup: map-side partial sums then one doc-bucketed
       groupby (the span rows were scattered by digest in step 3).
    """
    from ..shuffle import bindings_join, bucket_tag
    from .fasthash import md5_hex

    def spans_of(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series([], dtype=np.int64),
                "h": pd.Series([], dtype=object),
                "span_chars": pd.Series([], dtype=np.int64),
                **({"_scope": pd.Series([], dtype=object)}
                   if scope_col else {}),
            }
        )
        words = df[text_col].fillna("").str.findall(r"\S+")
        ex = words.explode().dropna()
        if ex.empty:
            return empty
        row = ex.index.to_numpy()
        w = ex.to_numpy(dtype=object)
        ids = df[id_col].reindex(row).to_numpy()
        scopes = (df[scope_col].astype(object).reindex(row).to_numpy()
                  if scope_col else None)
        pos = pd.Series(np.ones(len(w)), index=row).groupby(
            level=0
        ).cumcount().to_numpy()
        si = pos // window
        starts = np.ones(len(w), dtype=bool)
        starts[1:] = (row[1:] != row[:-1]) | (si[1:] != si[:-1])
        start = np.flatnonzero(starts)
        span = w[start].copy()
        for k in range(1, window):
            j = start + k
            ok = j < len(w)
            ok[ok] &= (row[j[ok]] == row[start[ok]]) & (
                si[j[ok]] == si[start[ok]]
            )
            sel = np.flatnonzero(ok)
            span[sel] = span[sel] + " " + w[start[sel] + k]
        s = pd.Series(span)
        out = pd.DataFrame(
            {
                id_col: ids[start].astype(np.int64),
                "h": md5_hex(span).astype(object),
                "span_chars": s.str.len().to_numpy(dtype=np.int64),
            }
        )
        if scope_col:
            out["_scope"] = scopes[start]
        return out

    # materialize: `spans` feeds BOTH the marks pipeline and the join
    # probe side below — without this the expensive tokenize+hash pass
    # over the whole corpus executes twice (lazy datasets re-run per
    # consumer). The span rows are narrow (id, 32-char digest, int);
    # the object store spills if they outgrow memory.
    spans = docs.map_batches(spans_of, batch_format="pandas").materialize()

    key = (["_scope", "h"] if scope_col else ["h"])

    def mark_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df[key + [id_col]].drop_duplicates()
        # bucketing on the digest alone keeps every scope of one span
        # in one bucket — correct for both keyings, no pair hash needed
        return g.assign(_bucket=bucket_tag(g, "h", num_buckets))

    def mark_reduce(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby(key)[id_col].nunique()
        dup = nd.index[nd.to_numpy() >= min_docs]
        out = pd.DataFrame(dup.to_frame(index=False) if scope_col
                           else {"h": dup.to_numpy(dtype=object)})
        out["dup"] = np.ones(len(out), dtype=np.int64)
        return out

    marks = (
        spans.map_batches(mark_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(mark_reduce, batch_format="pandas")
    ).materialize()

    if marks.schema(fetch_if_missing=True) is None:
        # zero duplicate spans anywhere → schema-less marks would break
        # the join (CLAUDE.md empty-Dataset guard): nothing is flagged
        flagged = spans.map_batches(
            lambda df: df.assign(dup=np.full(len(df), np.nan)),
            batch_format="pandas",
        )
    else:
        flagged = bindings_join(
            spans, marks, on=key, how="left_outer",
            num_buckets=num_buckets
        )

    def roll_combine(df: pd.DataFrame) -> pd.DataFrame:
        # bindings_join fills unmatched 'dup' with object NaN → re-cast
        isdup = pd.to_numeric(df["dup"], errors="coerce").fillna(0)
        isdup = (isdup.to_numpy() > 0)
        chars = pd.to_numeric(df["span_chars"]).to_numpy(dtype=np.int64)
        g = pd.DataFrame(
            {
                id_col: pd.to_numeric(df[id_col]).to_numpy(np.int64),
                "n_spans": np.ones(len(df), dtype=np.int64),
                "n_dup_spans": isdup.astype(np.int64),
                "_kept_chars": np.where(isdup, 0, chars).astype(np.int64),
            }
        ).groupby(id_col, as_index=False).sum()
        return g.assign(_bucket=bucket_tag(g, id_col, num_buckets))

    def roll_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="_bucket").groupby(
            id_col, as_index=False
        ).sum()
        kept_n = out["n_spans"] - out["n_dup_spans"]
        out["kept_chars"] = (
            out["_kept_chars"] + np.maximum(kept_n - 1, 0)
        ).astype(np.int64)
        return out[[id_col, "n_spans", "n_dup_spans", "kept_chars"]]

    return (
        flagged.map_batches(roll_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(roll_reduce, batch_format="pandas")
    )


def _kgram_rows(
    df: pd.DataFrame, k: int, id_col: str, text_col: str
) -> pd.DataFrame:
    """All stride-1 k-token-gram rows of a batch:
    ``(id, i, h)`` with ``i`` the 0-based start TOKEN index and ``h``
    the md5 of the space-joined gram. Fully vectorized: one explode +
    ``k − 1`` gathered-concat passes (the span_dedup construction with
    stride 1 instead of ``window``)."""
    from .fasthash import md5_hex

    empty = pd.DataFrame(
        {
            id_col: pd.Series([], dtype=np.int64),
            "i": pd.Series([], dtype=np.int64),
            "h": pd.Series([], dtype=object),
        }
    )
    words = df[text_col].fillna("").str.findall(r"\S+")
    ex = words.explode().dropna()
    if ex.empty:
        return empty
    row = ex.index.to_numpy()
    w = ex.to_numpy(dtype=object)
    ids = df[id_col].reindex(row).to_numpy()
    pos = (
        pd.Series(np.ones(len(w)), index=row).groupby(level=0).cumcount()
    ).to_numpy()
    n = len(w)
    idx = np.arange(n - k + 1) if n >= k else np.array([], dtype=np.int64)
    start = idx[row[idx + k - 1] == row[idx]] if len(idx) else idx
    if not len(start):
        return empty
    gram = w[start].copy()
    for t in range(1, k):
        gram = gram + " " + w[start + t]
    return pd.DataFrame(
        {
            id_col: ids[start].astype(np.int64),
            "i": pos[start].astype(np.int64),
            "h": md5_hex(gram).astype(object),
        }
    )


def _merge_token_intervals(
    doc: np.ndarray, s: np.ndarray, e: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge token intervals [s, e) per doc (rows pre-sorted by
    (doc, s)). Touching intervals merge (s == running end); strict gaps
    split — the rule an SQL lag() replay can express with fixed-width
    grams. Vectorized: cummax running end per doc + cumsum group ids."""
    if not len(doc):
        return doc, s, e
    # Segmented cummax of e via a per-doc int64 offset (token indices
    # ≪ 2^40, doc count per batch ≪ 2^23 — offsets can't collide):
    # accumulate globally on (e + seg·OFF), subtract the offset back.
    doc_change = np.ones(len(doc), dtype=bool)
    doc_change[1:] = doc[1:] != doc[:-1]
    seg = np.cumsum(doc_change) - 1
    OFF = np.int64(1) << 40
    lifted = e + seg * OFF
    run = np.maximum.accumulate(lifted) - seg * OFF
    new = np.ones(len(doc), dtype=bool)
    new[1:] = doc_change[1:] | (s[1:] > run[:-1])
    gs = s[new]
    ge = np.maximum.reduceat(lifted, np.flatnonzero(new)) - seg[new] * OFF
    gd = doc[new]
    return gd, gs, ge


def dup_kgram_spans(
    docs: "ray.data.Dataset",
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    min_count: int = 2,
) -> "ray.data.Dataset":
    """Exact duplicated-substring detection (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better" recipe,
    re-expressed with stride-1 k-gram hashing instead of a suffix
    array): a token span is duplicated iff its exact k-token window
    text occurs ≥ ``min_count`` times corpus-wide (intra- or
    cross-document). Stride 1 makes k-gram detection EXACT for
    "contains a duplicated run of ≥ k tokens": every such run yields
    all of its aligned k-grams, so the union of duplicated windows is
    precisely the duplicated region. Returns merged maximal spans
    ``(id, tok_start, tok_end)`` in token coordinates (end exclusive);
    touching spans merge.

    Scale shape: gram rows travel as md5 digests (never text); the
    duplicate marks are a per-batch (h → partial count) combiner + one
    digest-bucket groupby emitting ONLY hot digests; marks semi-join
    back via the acero-safe ``bindings_join``; interval merging is
    associative, so each post-join batch pre-merges its rows into
    intervals BEFORE the per-doc shuffle — the final exchange moves
    interval rows, not gram rows."""
    return _dup_intervals(
        docs, k, id_col, text_col, num_buckets, min_count
    )[1]


def _dup_intervals(docs, k, id_col, text_col, num_buckets, min_count):
    from ..shuffle import bindings_join, bucket_tag

    grams = docs.map_batches(
        lambda df: _kgram_rows(df, k, id_col, text_col),
        batch_format="pandas",
    ).materialize()  # feeds the marks pipeline AND the join probe side

    def mark_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", as_index=False).size().rename(
            columns={"size": "c"}
        )
        return g.assign(_bucket=bucket_tag(g, "h", num_buckets))

    def mark_reduce(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("h")["c"].sum()
        hot = tot.index[tot.to_numpy() >= min_count]
        return pd.DataFrame({"h": hot.to_numpy(dtype=object)})

    marks = (
        grams.map_batches(mark_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(mark_reduce, batch_format="pandas")
    )

    dup_rows = bindings_join(
        grams, marks, on=["h"], how="semi", num_buckets=num_buckets
    )

    def interval_combine(df: pd.DataFrame) -> pd.DataFrame:
        # bindings_join output: restore numeric dtypes FIRST (see
        # CLAUDE.md post-join dtype lesson), then pre-merge this
        # batch's duplicated windows into intervals.
        d = pd.to_numeric(df[id_col]).to_numpy(dtype=np.int64)
        i = pd.to_numeric(df["i"]).to_numpy(dtype=np.int64)
        order = np.lexsort((i, d))
        gd, gs, ge = _merge_token_intervals(d[order], i[order], i[order] + k)
        out = pd.DataFrame(
            {id_col: gd, "tok_start": gs, "tok_end": ge}
        )
        return out.assign(_bucket=bucket_tag(out, id_col, num_buckets))

    def interval_reduce(g: pd.DataFrame) -> pd.DataFrame:
        d = g[id_col].to_numpy(dtype=np.int64)
        s = g["tok_start"].to_numpy(dtype=np.int64)
        e = g["tok_end"].to_numpy(dtype=np.int64)
        order = np.lexsort((s, d))
        gd, gs, ge = _merge_token_intervals(d[order], s[order], e[order])
        return pd.DataFrame({id_col: gd, "tok_start": gs, "tok_end": ge})

    intervals = (
        dup_rows.map_batches(interval_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(interval_reduce, batch_format="pandas")
    )
    return grams, intervals, dup_rows


def dup_kgram_stats(
    docs: "ray.data.Dataset",
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    min_count: int = 2,
) -> "ray.data.Dataset":
    """Per-document duplicated-substring rollup over ``dup_kgram_spans``
    internals: ``(id, n_grams, n_dup_grams, n_dup_spans, n_dup_tokens)``
    for documents with ≥ 1 duplicated k-gram. ``n_dup_tokens`` is the
    union coverage of the merged spans — every rule here (stride-1
    grams, ≥ min_count marks, touching-merge) is SQL-replayable, which
    is the correctness contract for the operator family."""
    from ..shuffle import bucket_tag

    grams, intervals, dup_rows = _dup_intervals(
        docs, k, id_col, text_col, num_buckets, min_count
    )

    def gram_partials(df: pd.DataFrame) -> pd.DataFrame:
        # every doc's grams sit in one batch (grams are emitted per
        # input batch), so this per-doc count is already exact
        g = df.groupby(id_col, as_index=False).size()
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(dtype=np.int64),
                "n_grams": g["size"].to_numpy(dtype=np.int64),
                "n_dup_grams": np.zeros(len(g), dtype=np.int64),
                "n_dup_spans": np.zeros(len(g), dtype=np.int64),
                "n_dup_tokens": np.zeros(len(g), dtype=np.int64),
            }
        )

    def dup_partials(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.to_numeric(df[id_col]).to_numpy(dtype=np.int64)
        g = pd.DataFrame({id_col: d}).groupby(
            id_col, as_index=False
        ).size()
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(dtype=np.int64),
                "n_grams": np.zeros(len(g), dtype=np.int64),
                "n_dup_grams": g["size"].to_numpy(dtype=np.int64),
                "n_dup_spans": np.zeros(len(g), dtype=np.int64),
                "n_dup_tokens": np.zeros(len(g), dtype=np.int64),
            }
        )

    def span_partials(df: pd.DataFrame) -> pd.DataFrame:
        d = df[id_col].to_numpy(dtype=np.int64)
        cov = (
            df["tok_end"].to_numpy(dtype=np.int64)
            - df["tok_start"].to_numpy(dtype=np.int64)
        )
        g = pd.DataFrame(
            {id_col: d, "n_dup_spans": 1, "n_dup_tokens": cov}
        ).groupby(id_col, as_index=False).sum()
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(dtype=np.int64),
                "n_grams": np.zeros(len(g), dtype=np.int64),
                "n_dup_grams": np.zeros(len(g), dtype=np.int64),
                "n_dup_spans": g["n_dup_spans"].to_numpy(dtype=np.int64),
                "n_dup_tokens": g["n_dup_tokens"].to_numpy(dtype=np.int64),
            }
        )

    parts = (
        grams.map_batches(gram_partials, batch_format="pandas")
        .union(dup_rows.map_batches(dup_partials, batch_format="pandas"))
        .union(intervals.map_batches(span_partials, batch_format="pandas"))
    )

    def final_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, as_index=False).sum()
        return g.assign(_bucket=bucket_tag(g, id_col, num_buckets))

    def final_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="_bucket").groupby(id_col, as_index=False).sum()
        return out[out["n_dup_grams"] > 0].reset_index(drop=True)

    return (
        parts.map_batches(final_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final_reduce, batch_format="pandas")
    )


def tfidf_topk(
    docs: "ray.data.Dataset",
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Top-k TF-IDF terms per document → Dataset (id, rank, term,
    score). tf = term count in the doc; idf = ln(N / df) with N = total
    documents and df = documents containing the term; ties rank by
    (score desc, term asc) — fully deterministic, so an SQL oracle can
    replay it exactly.

    Everything stays distributed and vectorized:
    1. (doc, term, tf) via one explode + groupby per batch — each doc
       lives in one batch, so per-batch counts are already final;
    2. df via a term-bucketed count shuffle (map-side combiner);
    3. df joins back onto the term rows with the acero-safe
       ``bindings_join`` (term-hash buckets) — no vocabulary table ever
       lands on the driver, so web-scale vocabularies are fine;
    4. per-doc top-k with the same partial-top-k combiner as
       ``per_source_quota``: the final shuffle moves ≤ k rows per
       (batch, doc).

    Scores are FLOOR-truncated at 1e-6 (ROUND half-even vs half-away
    differs at boundaries; identical doubles floor identically)."""
    from ..shuffle import bindings_join, bucket_tag

    n_docs = float(docs.count())

    def doc_terms(df: pd.DataFrame) -> pd.DataFrame:
        words = df[text_col].fillna("").str.findall(r"\S+")
        ids = df[id_col]
        ex = words.explode().dropna()
        if ex.empty:
            return pd.DataFrame({id_col: [], "term": [], "tf": []})
        out = (
            pd.DataFrame(
                {id_col: ids.reindex(ex.index), "term": ex.to_numpy()}
            )
            .groupby([id_col, "term"], as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        out["tf"] = out["tf"].astype(np.int64)
        return out

    # snap: `terms` feeds BOTH the document-frequency aggregate and the
    # tf join — unsnapped, the corpus-wide term explode executes once
    # per consumer (same shared-sub-plan replay as lm.py's fix)
    from ..shuffle import snap_lineage

    terms = snap_lineage(docs.map_batches(doc_terms, batch_format="pandas"))

    def df_combine(t: pd.DataFrame) -> pd.DataFrame:
        g = t.groupby("term", as_index=False).size().rename(
            columns={"size": "df"}
        )
        g["df"] = g["df"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "term", num_buckets))

    doc_freq = (
        terms.map_batches(df_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.groupby("term", as_index=False)["df"].sum(),
            batch_format="pandas",
        )
    )

    joined = bindings_join(terms, doc_freq, on=["term"],
                           num_buckets=num_buckets)

    def score_and_partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # bindings_join widens int dtypes on the filled side — restore
        tf = df["tf"].astype(np.int64)
        dfreq = df["df"].astype(np.float64)
        df["score"] = np.floor(
            tf.to_numpy() * np.log(n_docs / dfreq.to_numpy()) * 1e6
        ) / 1e6
        df = (
            df.sort_values(["score", "term"], ascending=[False, True])
            .groupby(id_col, sort=False)
            .head(k)[[id_col, "term", "score"]]
        )
        return df.assign(_bucket=bucket_tag(df, id_col, num_buckets))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values(["score", "term"], ascending=[False, True])
            .groupby(id_col, sort=False)
            .head(k)
            .sort_values([id_col, "score", "term"],
                         ascending=[True, False, True])
        )
        g = g.copy()
        g["rank"] = g.groupby(id_col, sort=False).cumcount() + 1
        g["rank"] = g["rank"].astype(np.int64)
        return g[[id_col, "rank", "term", "score"]]

    return (
        joined.map_batches(score_and_partial_topk, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final_topk, batch_format="pandas")
    )


def ngram_overlap_flags(
    docs: "ray.data.Dataset",
    probes: list[str],
    n: int = 8,
    threshold_num: int = 1,
    threshold_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """N-gram-overlap decontamination — the published fraction form
    (GPT-3 appx. C uses 13-gram collision, Llama/FLAN report the
    fraction of a doc's n-grams found in the eval set): a document is
    contaminated when ≥ ``threshold_num/threshold_den`` of its DISTINCT
    word n-grams appear in the benchmark's n-gram set. The threshold is
    a cross-multiplied INTEGER comparison (den·hits ≥ num·grams), so an
    SQL oracle replays it with no float seam. Complements
    ``contamination_flags`` (exact-substring form).

    → adds columns n_grams, n_hit (int64) and ``contaminated`` (0/1;
    docs shorter than ``n`` words have 0 grams → clean by definition).
    The benchmark gram set is built ONCE on the driver (eval sets are
    small and bounded by construction — same contract as the probe
    broadcast above) and shipped via ``ray.put``; the corpus pass is
    map-side only."""
    if n < 1:
        raise ValueError(f"n must be ≥ 1: {n}")
    if threshold_num < 0 or threshold_den < 1:
        raise ValueError(
            f"bad threshold {threshold_num}/{threshold_den}"
        )
    import ray as _ray

    def grams_of(text: str) -> set:
        ws = text.split()
        return {
            " ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)
        }

    bench: set = set()
    for p in probes:
        if p:
            bench |= grams_of(p)
    ref = _ray.put(bench)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        bs: set = _ray.get(ref)
        out = df.copy()
        words = df[text_col].fillna("").str.split()
        lens = words.str.len().to_numpy(np.int64)
        n_grams = np.zeros(len(df), dtype=np.int64)
        n_hit = np.zeros(len(df), dtype=np.int64)
        if lens.sum() > 0:
            # flattened-corpus gram build (cooccur's shift-pair shape):
            # n-1 vectorized string concats over ALL words of the batch,
            # doc boundaries masked by position arithmetic — no per-row
            # Python
            flat = pd.Series(
                np.concatenate([np.asarray(w, dtype=object)
                                for w in words if len(w)]),
                dtype=object,
            )
            doc_idx = np.repeat(np.arange(len(df)), lens)
            gram = flat.copy()
            for k in range(1, n):
                gram = gram + " " + flat.shift(-k)
            ends = np.cumsum(lens)
            starts = ends - lens
            pos = np.arange(len(flat)) - np.repeat(starts, lens)
            valid = pos + n <= np.repeat(lens, lens)
            g = pd.DataFrame(
                {"d": doc_idx[valid],
                 "g": gram.to_numpy(object)[valid]}
            ).drop_duplicates()
            g["hit"] = g["g"].isin(bs)
            agg = g.groupby("d").agg(
                n_grams=("g", "size"), n_hit=("hit", "sum")
            )
            n_grams[agg.index.to_numpy()] = agg["n_grams"].to_numpy()
            n_hit[agg.index.to_numpy()] = agg["n_hit"].to_numpy()
        out["n_grams"] = n_grams
        out["n_hit"] = n_hit
        out["contaminated"] = (
            (threshold_den * n_hit >= threshold_num * n_grams)
            & (n_grams > 0)
        ).astype(np.int64)
        return out

    return docs.map_batches(scan, batch_format="pandas")
