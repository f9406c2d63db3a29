"""Column profiling: per-column row/null/exact-distinct counts.

The data-quality gate every ingest pipeline runs before anything else —
"did this crawl drop the lang column", "how many distinct sources
landed". One corpus pass for the row/null tallies (metric-sized
partials) plus ONE melt + (column, value)-bucket shuffle for the exact
distinct counts: a value moves once no matter how many columns are
profiled, and per-bucket distincts are globally exact because each
(column, value) pair lives in exactly one bucket.

Values are compared by their string form (injective for the
string/int/bool columns this is meant for — SQL's COUNT(DISTINCT) on a
float column may disagree with a stringified distinct; profile floats
via quantile/stat operators instead). Nulls are excluded from distinct,
matching SQL semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import pair_bucket_tag

__all__ = ["profile_columns", "characteristic_sets", "group_distinct_count", "group_mode", "predicate_profile"]


def profile_columns(
    ds: "ray.data.Dataset",
    columns: list[str] | None = None,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """→ pandas (column, n_rows, n_nulls, n_distinct), one row per
    profiled column, sorted by column name. The result is
    metric-sized (k rows); the corpus never lands on the driver."""
    if columns is None:
        columns = list(ds.schema().names)
    if not columns:
        raise ValueError("no columns to profile")
    cols = list(columns)

    # pass 1 partials: (column, rows, nulls) per batch — k rows/batch
    def tallies(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "column": cols,
                "rows": np.int64(len(df)),
                "nulls": [
                    np.int64(df[c].isna().sum()) for c in cols
                ],
            }
        )

    tally = (
        ds.map_batches(tallies, batch_format="pandas")
        .to_pandas()
        .groupby("column", as_index=False)[["rows", "nulls"]]
        .sum()
    )

    # melt + one (column, value) bucket shuffle for exact distincts;
    # per-batch drop_duplicates is the map-side combiner
    def melt(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for c in cols:
            s = df[c].dropna()
            if len(s):
                parts.append(
                    pd.DataFrame(
                        {"column": c, "v": s.astype(str)}
                    ).drop_duplicates()
                )
        if not parts:
            return pd.DataFrame(
                {"column": pd.Series([], dtype=object),
                 "v": pd.Series([], dtype=object),
                 "_bucket": pd.Series([], dtype="int32")}
            )
        out = pd.concat(parts, ignore_index=True)
        out["_bucket"] = pair_bucket_tag(out, ["column", "v"], num_buckets)
        return out

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(subset=["column", "v"])
        out = d.groupby("column", as_index=False).size().rename(
            columns={"size": "n_distinct"}
        )
        out["n_distinct"] = out["n_distinct"].astype(np.int64)
        return out

    dist = (
        ds.map_batches(melt, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(bucket_distinct, batch_format="pandas")
        .to_pandas()
    )
    if "column" not in dist.columns:  # every profiled value was null
        dist = pd.DataFrame(
            {"column": pd.Series([], dtype=object),
             "n_distinct": pd.Series([], dtype=np.int64)}
        )
    dist = dist.groupby("column", as_index=False)["n_distinct"].sum()

    out = tally.merge(dist, on="column", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype(np.int64)
    out = out.rename(columns={"rows": "n_rows", "nulls": "n_nulls"})
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["n_nulls"] = out["n_nulls"].astype(np.int64)
    return out[["column", "n_rows", "n_nulls", "n_distinct"]].sort_values(
        "column", ignore_index=True
    )


def characteristic_sets(
    triples: "ray.data.Dataset",
    subj_col: str = "subj",
    pred_col: str = "pred",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """→ Dataset (cs:str, n_subjects:int64): the KG's characteristic
    sets — each subject's sorted distinct predicate set joined with
    '|', counted (Neumann & Moerkotte, ICDE 2011: THE cardinality /
    schema-discovery statistic for RDF stores; the reference's
    query-planning analog).

    Two shuffles, both narrow: (subj, pred) distinct rows bucket by
    SUBJECT (a subject's predicates meet in one group → vectorized
    sort + per-subject join), then signatures bucket by the signature
    string for the global count. Predicate-set strings are
    signature-sized, never corpus-sized."""
    from ..shuffle import bucket_tag

    def sp(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[subj_col, pred_col]].drop_duplicates()
        return out.assign(
            _bucket=bucket_tag(out, subj_col, num_buckets)
        )

    def per_subject(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[subj_col, pred_col]).sort_values(
            [subj_col, pred_col], kind="stable"
        )
        cs = g.groupby(subj_col, sort=False)[pred_col].agg("|".join)
        out = cs.groupby(cs).size().rename("n").reset_index()
        out.columns = ["cs", "n"]
        out["n"] = out["n"].astype(np.int64)
        return out.assign(_bucket=bucket_tag(out, "cs", num_buckets))

    def reduce_cs(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cs", as_index=False)["n"].sum()
        out = out.rename(columns={"n": "n_subjects"})
        out["n_subjects"] = out["n_subjects"].astype(np.int64)
        return out

    return (
        triples.map_batches(sp, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_subject, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_cs, batch_format="pandas")
    )


def group_distinct_count(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact per-group COUNT(DISTINCT value) → (group, n_distinct) —
    "distinct users per event type", the cardinality audit Ray Data's
    built-in aggregates don't offer exactly. Nulls excluded (SQL
    semantics).

    One (group, value)-bucket shuffle with per-batch drop_duplicates
    combiners; each (group, value) pair lives in exactly one bucket, so
    per-bucket nunique partials sum exactly; the final per-group fold is
    a ≤ groups × buckets row frame reduced by one tiny group shuffle."""
    from ..shuffle import bucket_tag

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[group_col, value_col]].dropna().drop_duplicates()
        return out.assign(
            _bucket=pair_bucket_tag(out, [group_col, value_col],
                                    num_buckets)
        )

    def bucket_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(subset=[group_col, value_col])
        out = d.groupby(group_col, as_index=False).size().rename(
            columns={"size": "n"}
        )
        out["n"] = out["n"].astype(np.int64)
        return out.assign(_gb=bucket_tag(out, group_col, num_buckets))

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(group_col, as_index=False)["n"].sum().rename(
            columns={"n": "n_distinct"}
        )
        out["n_distinct"] = out["n_distinct"].astype(np.int64)
        return out

    return (
        ds.map_batches(melt, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(bucket_partial, batch_format="pandas")
        .groupby("_gb")
        .map_groups(reduce_group, batch_format="pandas")
    )


def group_mode(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Most frequent value per group → (group, mode, n:int64), ties
    broken by value ascending (a total order, so deterministic and
    SQL-replayable as ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY cnt
    DESC, v) = 1``). Nulls excluded. The categorical-summary sibling of
    ``group_quantiles``.

    (group, value) counts via map-side combiners → one pair-bucket
    reduce for exact counts (each pair in one bucket) → one tiny
    group-bucket argmax over the count rows (value-cardinality-sized,
    never the corpus)."""
    from ..shuffle import bucket_tag

    def count_combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df[[group_col, value_col]].dropna()
            .groupby([group_col, value_col], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["n"] = out["n"].astype(np.int64)
        return out.assign(
            _bucket=pair_bucket_tag(out, [group_col, value_col],
                                    num_buckets)
        )

    def count_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby([group_col, value_col], as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out.assign(_gb=bucket_tag(out, group_col, num_buckets))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", value_col], ascending=[False, True],
                          kind="stable")
        top = g.drop_duplicates(subset=[group_col], keep="first")
        return pd.DataFrame(
            {
                group_col: top[group_col].to_numpy(),
                "mode": top[value_col].to_numpy(),
                "n": top["n"].astype(np.int64).to_numpy(),
            }
        )

    return (
        ds.map_batches(count_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(count_reduce, batch_format="pandas")
        .groupby("_gb")
        .map_groups(pick, batch_format="pandas")
    )


def _pred_side_profile(
    triples: "ray.data.Dataset",
    key_col: str,
    n_keys_name: str,
    max_card_name: str,
    num_buckets: int,
) -> "ray.data.Dataset":
    """Per-predicate cardinality facts for ONE triple side → Dataset
    (pred, n_triples, <n_keys>, <max_card>). Exact: (pred, key) partial
    counts combine map-side, each pair lives in one bucket so per-pair
    totals are exact there, and the per-pred fold (distinct keys, max
    per-key count, triple count) reduces through one tiny pred
    shuffle."""
    from ..shuffle import bucket_tag

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[["pred", key_col]].dropna()
        g = m.groupby(["pred", key_col], as_index=False).size().rename(
            columns={"size": "n"}
        )
        g["n"] = g["n"].astype(np.int64)
        return g.assign(
            _bucket=pair_bucket_tag(g, ["pred", key_col], num_buckets)
        )

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["pred", key_col], as_index=False)["n"].sum()
        out = d.groupby("pred", as_index=False).agg(
            n_triples=("n", "sum"), _nk=(key_col, "nunique"),
            _mx=("n", "max"),
        )
        for c in ("n_triples", "_nk", "_mx"):
            out[c] = out[c].astype(np.int64)
        return out.assign(_gb=bucket_tag(out, "pred", num_buckets))

    def reduce_pred(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("pred", as_index=False).agg(
            n_triples=("n_triples", "sum"), _nk=("_nk", "sum"),
            _mx=("_mx", "max"),
        )
        out = out.rename(columns={"_nk": n_keys_name,
                                  "_mx": max_card_name})
        for c in ("n_triples", n_keys_name, max_card_name):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        triples.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .groupby("_gb")
        .map_groups(reduce_pred, batch_format="pandas")
    )


def predicate_profile(
    triples: "ray.data.Dataset",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Per-predicate cardinality profile — the KG schema-discovery
    statistic that detects FUNCTIONAL (≤1 value per subject, i.e.
    owl:FunctionalProperty candidates) and INVERSE-FUNCTIONAL (≤1
    subject per object — identifier-like) predicates, plus the
    subject/object distinct counts query optimizers need.

    → Dataset (pred, n_triples, n_subjects, n_objects, max_subj_card,
    max_obj_card, functional:int64, inverse_functional:int64). Exact;
    two (pred, key)-bucket shuffles (one per side) joined back on pred
    through one more bucket shuffle — per-pred rows only, nothing
    corpus-sized on the driver."""
    from ..shuffle import bindings_join

    subj_side = _pred_side_profile(
        triples, "subj", "n_subjects", "max_subj_card", num_buckets
    )
    obj_side = _pred_side_profile(
        triples, "obj", "n_objects", "max_obj_card", num_buckets
    ).map_batches(
        lambda df: df.drop(columns=["n_triples"]),
        batch_format="pandas",
    )

    joined = bindings_join(subj_side, obj_side, on=["pred"],
                           how="inner", num_buckets=16)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"pred": df["pred"]})
        for c in ("n_triples", "n_subjects", "n_objects",
                  "max_subj_card", "max_obj_card"):
            # bindings_join's union-fill widens numerics to object —
            # restore int64 (terminal columns, no further shuffle)
            out[c] = pd.to_numeric(df[c]).astype(np.int64)
        out["functional"] = (
            out["max_subj_card"] == 1).astype(np.int64)
        out["inverse_functional"] = (
            out["max_obj_card"] == 1).astype(np.int64)
        return out

    return joined.map_batches(finish, batch_format="pandas")
