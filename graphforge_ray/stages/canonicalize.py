"""Stage 3 — canonicalization: exact-dedup shuffle + surface-form merging.

The reference gets set semantics implicitly from ``N3.Store`` set-insert
(/root/reference/docs/scripts/document.js:710, :857): the visible graph is
the deduplicated union of all sources' triples (SURVEY §2.3). Here that is
an explicit, skew-aware shuffle:

1. **Combiner (map-side)**: within-batch ``drop_duplicates`` on the triple
   identity inside ``map_batches`` — vectorized, no shuffle. This collapses
   hot identical triples (an edge re-asserted by millions of pages) to ≤1
   row per batch, which keeps the reduce side skew-free: after the
   combiner, per-key multiplicity is bounded by the number of upstream
   blocks, not raw row counts.
2. **Reduce (bucket shuffle)**: rows are hash-partitioned into
   ``num_buckets`` coarse buckets on a 128-bit content hash (two
   deterministic uint64 columns — ``pandas.util.hash_array`` with fixed
   hash keys, identical across processes) and each bucket is deduped with
   ONE vectorized ``drop_duplicates`` (``groupby(bucket).map_groups``).
   Bucketing beats per-key aggregation by orders of magnitude here
   (measured 16×: Ray's per-key Min-aggregate reduces row-by-row in
   Python; a bucket is reduced by one C-level kernel). Hash buckets are
   uniform → no key skew; bucket count scales with cluster size.

Surface-form canonicalization (north star: "dedupes subject/object IRIs via
groupby-aggregate shuffles keyed on normalized surface forms,
hash-partitioned with explicit salt-based skew splitting for head
entities"): ``build_canonical_mapping`` extracts the distinct
``(norm_form, iri)`` pair universe (per-batch pre-dedup → bucket-distinct
shuffle) and picks the lexicographically-min spelling per group. The pair
key includes the IRI, so even a head entity (popular domain) spreads over
buckets — the explicit salt for aggregations whose key is ONLY the
normalized form lives in ``surface_form_counts`` (two-round salted Sum).
The resulting mapping is small (only multi-spelling groups survive) →
broadcast via ``ray.put`` and applied map-side; no join shuffle.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from .. import default_concurrency
from ..iri import normalize_iri

__all__ = [
    "TRIPLE_ID_COLS", "add_triple_hash", "prededup_batch", "dedup_triples",
    "normalize_iri", "build_canonical_mapping", "apply_canonical_mapping",
    "surface_form_counts", "sameas_canonicalize",
]

# Columns defining triple identity (graph included; score/src_url/text are
# evidence/lineage, not identity).
TRIPLE_ID_COLS = [
    "subj", "pred", "obj", "obj_is_iri", "obj_lang", "obj_datatype", "graph",
]

# Fixed 16-byte hash keys → deterministic across processes/workers (never
# use Python's salted built-in hash for distributed keys).
_HASH_KEY_A = "graphforge-hash-A"[:16].ljust(16, "0")
_HASH_KEY_B = "graphforge-hash-B"[:16].ljust(16, "0")


def add_triple_hash(df: pd.DataFrame) -> pd.DataFrame:
    """map_batches body (pandas): add uint64 columns ``tk1``/``tk2`` —
    a 128-bit deterministic content hash of the triple identity.

    Implementation: polars ``hash_rows`` with fixed seeds — vectorized,
    ~10× faster than building per-row identity strings, and deterministic
    across worker processes for one polars build (which is uniform across
    this cluster; the checkpoint input-fingerprint invalidates stale state
    across environment upgrades)."""
    import os

    # one polars thread per Ray worker — Ray provides the parallelism;
    # a full polars pool in every worker oversubscribes the node
    # (measured: 3× slower at 32 CPUs). Must be set before first import.
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    cols = [c for c in TRIPLE_ID_COLS if c in df.columns]
    pldf = pl.from_pandas(df[cols])
    df = df.copy()
    df["tk1"] = pldf.hash_rows(seed=165).to_numpy()
    df["tk2"] = pldf.hash_rows(seed=90).to_numpy()
    return df


def prededup_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Map-side combiner: drop within-batch duplicate triples (keeping the
    max-score row so the best linker evidence survives). Expects tk1/tk2
    already present (cheap uint64 dedup); falls back to column identity."""
    if df.empty:
        return df
    if "score" in df.columns:
        df = df.sort_values("score", ascending=False, kind="stable")
    if "tk1" in df.columns:
        return df.drop_duplicates(subset=["tk1", "tk2"], keep="first")
    subset = [c for c in TRIPLE_ID_COLS if c in df.columns]
    return df.drop_duplicates(subset=subset, keep="first")


def dedup_triples(
    ds: "ray.data.Dataset", num_buckets: int = 512
) -> "ray.data.Dataset":
    """Exact global dedup of a triples dataset (EXTRACT/TRIPLES schema +
    optional score/src_url). One row per distinct triple identity; the
    surviving row is deterministic (max score, then min src_url).

    ``num_buckets`` bounds reducer-side group size: size it so
    |input| / num_buckets rows fit one worker's heap (at cluster scale,
    thousands of buckets)."""

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = prededup_batch(add_triple_hash(df))
        df["_bucket"] = (df["tk1"] % num_buckets).astype("int32")
        return df

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [c for c in ("score", "src_url") if c in g.columns]
        if sort_cols:
            ascending = [c != "score" for c in sort_cols]
            g = g.sort_values(sort_cols, ascending=ascending, kind="stable")
        g = g.drop_duplicates(subset=["tk1", "tk2"], keep="first")
        return g.drop(columns=["_bucket", "tk1", "tk2"])

    return (
        ds.map_batches(keyed, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(bucket_dedup, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Surface-form canonicalization
# ---------------------------------------------------------------------------



def normalize_iri_series(s: pd.Series) -> pd.Series:
    """``normalize_iri`` over a string Series (element-wise; callers apply
    it to per-batch DISTINCT values so the cost stays map-side/parallel)."""
    return s.map(normalize_iri)


def _distinct_iris_batch(df: pd.DataFrame, columns: list[str]) -> pd.DataFrame:
    """Per-batch distinct IRI values from the given columns (the map-side
    combiner of the mapping build — no normalization here; normalization
    runs ONCE over the globally distinct set)."""
    series = []
    for col in columns:
        if col not in df.columns:
            continue
        if col == "obj" and "obj_is_iri" in df.columns:
            vals = df.loc[df["obj_is_iri"].fillna(False), col]
        else:
            vals = df[col]
        series.append(vals.dropna())
    if not series:
        return pd.DataFrame({"iri": pd.Series(dtype=object)})
    iris = pd.concat(series, ignore_index=True).drop_duplicates()
    return pd.DataFrame({"iri": iris.to_numpy(dtype=object)})


def build_canonical_mapping(
    ds: "ray.data.Dataset",
    columns: list[str] | None = None,
    num_buckets: int = 32,
    count_hint: int | None = None,
    small_threshold: int | None = None,  # kept for API compat; unused
) -> dict[str, str]:
    """→ {iri: canonical_iri} for every IRI whose normalized form has ≥2
    distinct spellings. Canonical representative = lexicographic min of
    the group's ACTUALLY-OCCURRING spellings (deterministic).

    Two map-only passes, no shuffle, driver sees only tiny sets:

    1. **suspects** — per-batch distinct IRIs whose normalization differs
       from themselves (https variants, cased hosts, trailing slashes) —
       rare by construction, so the collected set is small;
    2. **partners** — per-batch distinct IRIs whose normalization falls in
       the suspect-norm set (broadcast), i.e. the already-normal spellings
       the suspects should merge INTO.

    If pass 1 finds nothing (common for clean corpora) the function is a
    single cheap pass. Normalization work runs on per-batch DISTINCT
    values map-side — never over the full corpus on the driver.
    """
    columns = columns or ["subj", "obj"]

    def suspects_fn(df: pd.DataFrame) -> pd.DataFrame:
        iris = _distinct_iris_batch(df, columns)
        if iris.empty:
            iris["norm"] = pd.Series(dtype=object)
            return iris
        iris["norm"] = normalize_iri_series(iris["iri"])
        return iris[iris["norm"] != iris["iri"]]

    suspects = (
        ds.map_batches(suspects_fn, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if suspects.empty:
        return {}

    target_norms = set(suspects["norm"])
    norms_ref = ray.put(target_norms)

    class PartnerFilter:
        def __init__(self):
            self.norms = ray.get(norms_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            iris = _distinct_iris_batch(df, columns)
            if iris.empty:
                iris["norm"] = pd.Series(dtype=object)
                return iris
            iris["norm"] = normalize_iri_series(iris["iri"])
            return iris[iris["norm"].isin(self.norms)]

    partners = (
        ds.map_batches(PartnerFilter, batch_format="pandas",
                       concurrency=default_concurrency(fused=False))
        .to_pandas()
        .drop_duplicates()
    )
    pairs = pd.concat([suspects, partners], ignore_index=True).drop_duplicates()
    canon = pairs.groupby("norm")["iri"].min()
    merged = pairs.merge(canon.rename("canon"), left_on="norm", right_index=True)
    return {
        iri: c for iri, c in zip(merged["iri"], merged["canon"]) if iri != c
    }


def surface_form_counts(
    ds: "ray.data.Dataset",
    columns: list[str] | None = None,
    num_salts: int = 16,
) -> "ray.data.Dataset":
    """Frequency of each normalized surface form — the aggregation whose
    key is ONLY the normalized form, i.e. the one that needs EXPLICIT
    salt-based skew splitting (north star: head entities like popular
    domains). Two rounds:

        round 1: groupby (norm, salt) — salt = hash(iri) % num_salts —
                 partial Sum spreads one head form over ``num_salts``
                 reducers;
        round 2: groupby norm over the ≤num_salts partials (tiny).
    """
    columns = columns or ["subj", "obj"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pairs = _pairs_batch_with_counts(df, columns)
        pairs["salt"] = (
            pd.util.hash_array(
                pairs["iri"].to_numpy(dtype=object), hash_key=_HASH_KEY_B
            )
            % num_salts
        ).astype("int32")
        return pairs.groupby(["norm", "salt"], as_index=False)["n"].sum()

    r1 = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["norm", "salt"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return r1.groupby("norm").aggregate(Sum("n", alias_name="n"))


def _pairs_batch_with_counts(df: pd.DataFrame, columns: list[str]) -> pd.DataFrame:
    series = []
    for col in columns:
        if col not in df.columns:
            continue
        if col == "obj" and "obj_is_iri" in df.columns:
            vals = df.loc[df["obj_is_iri"].fillna(False), col]
        else:
            vals = df[col]
        series.append(vals.dropna())
    if not series:
        return pd.DataFrame({"norm": [], "iri": [], "n": []})
    iris = pd.concat(series, ignore_index=True)
    out = iris.value_counts().rename_axis("iri").reset_index(name="n")
    out["norm"] = out["iri"].map(normalize_iri)
    return out[["norm", "iri", "n"]]


class _Rewriter:
    """Actor-pool stage applying a broadcast canonical mapping map-side."""

    def __init__(self, mapping_ref=None, mapping: dict[str, str] | None = None):
        if mapping is None:
            mapping = ray.get(mapping_ref) if mapping_ref is not None else {}
        self.mapping = mapping

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not self.mapping:
            return df
        df = df.copy()
        df["subj"] = df["subj"].map(lambda v: self.mapping.get(v, v))
        is_iri = df["obj_is_iri"].fillna(False)
        df.loc[is_iri, "obj"] = df.loc[is_iri, "obj"].map(
            lambda v: self.mapping.get(v, v)
        )
        return df


def apply_canonical_mapping(
    ds: "ray.data.Dataset",
    mapping: dict[str, str],
    concurrency: int | tuple[int, int] | None = None,
) -> "ray.data.Dataset":
    """Rewrite subj/obj IRIs through the broadcast mapping (no shuffle)."""
    if not mapping:
        return ds
    if concurrency is None:
        concurrency = default_concurrency(fused=False)
    mapping_ref = ray.put(mapping)
    return ds.map_batches(
        _Rewriter,
        batch_format="pandas",
        fn_constructor_kwargs={"mapping_ref": mapping_ref},
        concurrency=concurrency,
    )


def sameas_canonicalize(
    triples: "ray.data.Dataset",
    sameas_pred: str = "http://www.w3.org/2002/07/owl#sameAs",
    num_buckets: int = 64,
    max_rounds: int = 100,
) -> "ray.data.Dataset":
    """owl:sameAs entity canonicalization — the KG-merge step after
    entity linking: identities asserted by ``sameas_pred`` triples are
    closed transitively (connected components of the UNDIRECTED sameAs
    graph), every cluster elects its lexicographic-min member as the
    canonical IRI, and all remaining triples are rewritten through the
    mapping on BOTH subject and object. sameAs assertions themselves are
    consumed; the rewrite can create duplicate triples (two aliases
    asserting the same fact), so the result is set-distinct.

    Scale shape: the identity graph (sameAs edges only — tiny relative
    to the corpus) goes through the pointer-jumped min-label components
    (O(log diameter) rounds); the corpus-sized rewrite is two
    ``bindings_join`` left-outer shuffles (subject, then object) plus
    one distinct shuffle — the mapping is never collected to the driver
    and never broadcast. Returns Dataset (subj, pred, obj).
    """
    from ..shuffle import bindings_join
    from .dedup import connected_components

    def sameas_edges(df: pd.DataFrame) -> pd.DataFrame:
        m = df["pred"] == sameas_pred
        return pd.DataFrame(
            {"id_a": df.loc[m, "subj"], "id_b": df.loc[m, "obj"]}
        )

    comps = connected_components(
        triples.map_batches(sameas_edges, batch_format="pandas"),
        max_rounds=max_rounds,
    )

    data = triples.map_batches(
        lambda df: df.loc[df["pred"] != sameas_pred,
                          ["subj", "pred", "obj"]],
        batch_format="pandas",
    )

    # no sameAs assertions at all → the components Dataset is fully
    # empty (schema None, which the join shuffle can't tag); the
    # mapping is the identity, so only the set-distinct remains
    if comps.schema(fetch_if_missing=True) is None:
        return dedup_triples(data, num_buckets=num_buckets)

    # a representative maps to itself (label rows exist for every node
    # incident to a sameAs edge), so COALESCE(label, original) is total
    subj_map = comps.map_batches(
        lambda df: pd.DataFrame(
            {"subj": df["node"], "_canon_s": df["label"]}
        ),
        batch_format="pandas",
    )
    j1 = bindings_join(
        data, subj_map, on=["subj"], how="left_outer",
        num_buckets=num_buckets,
    )
    step1 = j1.map_batches(
        lambda df: pd.DataFrame(
            {
                "subj": df["_canon_s"].where(
                    df["_canon_s"].notna(), df["subj"]
                ),
                "pred": df["pred"],
                "obj": df["obj"],
            }
        ),
        batch_format="pandas",
    )

    obj_map = comps.map_batches(
        lambda df: pd.DataFrame(
            {"obj": df["node"], "_canon_o": df["label"]}
        ),
        batch_format="pandas",
    )
    j2 = bindings_join(
        step1, obj_map, on=["obj"], how="left_outer",
        num_buckets=num_buckets,
    )
    rewritten = j2.map_batches(
        lambda df: pd.DataFrame(
            {
                "subj": df["subj"],
                "pred": df["pred"],
                "obj": df["_canon_o"].where(
                    df["_canon_o"].notna(), df["obj"]
                ),
            }
        ),
        batch_format="pandas",
    )
    return dedup_triples(rewritten, num_buckets=num_buckets)
