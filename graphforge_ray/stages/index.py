"""Distributed text retrieval primitives: inverted index and BM25.

A corpus engine that curates training data also has to *find things in
it* — dedup verification, decontamination forensics, and eval-set
mining all start from "which documents contain these terms, ranked".
Two operators, both fully distributed and exactly SQL-replayable:

- ``inverted_index``: (term, df, postings) over the whitespace term
  model shared with ``curation.tfidf_topk``. Postings are doc-id lists
  CAPPED at ``postings_cap`` ids per term (web-scale stopword postings
  are corpus-sized; the cap keeps any single row bounded) — truncation
  is deterministic (smallest ids first) so SQL replays it, and the
  number of truncated terms is COUNTED in the ``inverted_index_capped``
  metric (no-silent-caps rule). ``df`` is always the exact full count.
- ``bm25_topk``: Okapi BM25 top-k documents for a term query. The
  query-side state is tiny (a handful of terms), so df lookup is a
  filtered aggregate and the per-doc scoring is one map-side pass;
  the only shuffle is the partial-top-k reduce (≤ k rows per batch).

Scale shape: the index build moves (doc, term) distinct pairs through
ONE term-bucketed shuffle; BM25 moves ≤ k rows per batch. Neither ever
materializes corpus text off-batch.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .. import metrics
from ..shuffle import bucket_tag

__all__ = ["inverted_index", "bm25_topk"]


def inverted_index(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_cap: int = 1000,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Build an inverted index → Dataset (term, df:int64, postings:str)
    where ``postings`` is the comma-joined ascending doc-id list,
    truncated to the ``postings_cap`` SMALLEST ids (deterministic, so
    the SQL oracle replays it with a rank window; truncated terms are
    counted in the ``inverted_index_capped`` metric). ``df`` is the
    exact distinct-document count, never truncated.

    One shuffle: per-batch distinct (doc, term) pairs (text never
    leaves the batch), bucket on term, vectorized sort + groupby-agg
    per bucket."""
    if postings_cap < 1:
        raise ValueError(f"postings_cap must be ≥ 1: {postings_cap}")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[text_col].fillna("").str.findall(r"\S+").explode().dropna()
        if ex.empty:
            return pd.DataFrame(
                {"term": pd.Series([], dtype=object),
                 "id": pd.Series([], dtype=object),
                 "_bucket": pd.Series([], dtype="int32")}
            )
        out = pd.DataFrame(
            {"term": ex.to_numpy(),
             "id": df[id_col].reindex(ex.index).to_numpy()}
        ).drop_duplicates()
        return out.assign(_bucket=bucket_tag(out, "term", num_buckets))

    def bucket_index(g: pd.DataFrame, _cap=postings_cap) -> pd.DataFrame:
        g = g[["term", "id"]].drop_duplicates().sort_values(["term", "id"])
        rank = g.groupby("term", sort=False).cumcount()
        capped = int((g.groupby("term", sort=False)["id"].size()
                      > _cap).sum()) if len(g) else 0
        if capped:
            metrics.incr("inverted_index_capped", capped)
        kept = g.loc[rank < _cap]
        post = kept.groupby("term", sort=False)["id"].agg(
            lambda s: ",".join(s.astype(str))
        )
        dfreq = g.groupby("term", sort=False)["id"].size()
        out = pd.DataFrame(
            {"term": post.index.to_numpy(), "df": dfreq.to_numpy(np.int64),
             "postings": post.to_numpy(dtype=object)}
        )
        return out

    return (
        docs.map_batches(pairs, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(bucket_index, batch_format="pandas")
    )


def bm25_topk(
    docs: "ray.data.Dataset",
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Okapi BM25 top-k → DataFrame (rank:int64, id, score:float64),
    ties broken by id asc. idf = ln((N − df + 0.5)/(df + 0.5) + 1)
    (the Lucene-style non-negative form); per-term score =
    idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with dl = doc
    whitespace-token count. Scores FLOOR-truncated at 1e-6 (same
    tie-safe rule as ``tfidf_topk``) so the SQL oracle replays exact
    doubles.

    Distribution: two tiny driver-side scalars (N, total token count →
    avgdl) and one ≤|query|-row df frame come from filtered aggregates;
    scoring is map-side against the broadcast df map; the global top-k
    is the partial-top-k combiner + one constant-key reduce (≤ k rows
    per batch move)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k < 1:
        raise ValueError(f"k must be ≥ 1: {k}")
    qset = sorted(set(query_terms))

    from ..shuffle import snap_lineage

    def stats(df: pd.DataFrame, _q=tuple(qset)) -> pd.DataFrame:
        words = df[text_col].fillna("").str.findall(r"\S+")
        dl = words.str.len().to_numpy(np.int64)
        out = {"id": df[id_col].to_numpy(), "dl": dl}
        for i, t in enumerate(_q):
            out[f"tf{i}"] = np.fromiter(
                (w.count(t) for w in words), np.int64, len(words)
            )
        return pd.DataFrame(out)

    # one corpus pass computes dl + per-query-term tf; snapped because
    # three consumers (N/avgdl aggregate, df aggregate, scoring) read it
    st = snap_lineage(docs.map_batches(stats, batch_format="pandas"))

    agg = st.map_batches(
        lambda d: pd.DataFrame(
            {"n": [np.int64(len(d))], "toks": [d["dl"].sum()],
             **{f"df{i}": [np.int64((d[f"tf{i}"] > 0).sum())]
                for i in range(len(qset))}}
        ),
        batch_format="pandas",
    ).to_pandas()
    # all-empty input never runs the UDF → frame keeps the input schema
    # (no 'n' column); guard BEFORE indexing (mirrors pearson_corr)
    if "n" not in agg.columns or float(agg["n"].sum()) == 0:
        return pd.DataFrame({"rank": [], "id": [], "score": []})
    n_docs = float(agg["n"].sum())
    avgdl = float(agg["toks"].sum()) / n_docs
    idf = {
        i: math.log((n_docs - float(agg[f"df{i}"].sum()) + 0.5)
                    / (float(agg[f"df{i}"].sum()) + 0.5) + 1.0)
        for i in range(len(qset))
    }

    def score_partial(d: pd.DataFrame, _idf=idf, _k1=k1, _b=b,
                      _avgdl=avgdl, _k=k) -> pd.DataFrame:
        dl = d["dl"].to_numpy(np.float64)
        denom_norm = _k1 * (1.0 - _b + _b * dl / _avgdl)
        s = np.zeros(len(d), np.float64)
        for i, w in _idf.items():
            tf = d[f"tf{i}"].to_numpy(np.float64)
            s += w * (tf * (_k1 + 1.0)) / (tf + denom_norm)
        s = np.floor(s * 1e6) / 1e6
        out = pd.DataFrame({"id": d["id"], "score": s})
        out = out[out["score"] > 0]
        out = out.sort_values(["score", "id"],
                              ascending=[False, True]).head(_k)
        return out.assign(_one=np.int8(0))

    def final(g: pd.DataFrame, _k=k) -> pd.DataFrame:
        g = (
            g.sort_values(["score", "id"], ascending=[False, True])
            .head(_k)
            .reset_index(drop=True)
        )
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["rank", "id", "score"]]

    out = (
        st.map_batches(score_partial, batch_format="pandas")
        .groupby("_one")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    out["rank"] = out["rank"].astype(np.int64)
    return out.sort_values("rank").reset_index(drop=True)
