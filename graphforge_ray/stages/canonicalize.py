"""Stage 3 — canonicalization: exact-dedup shuffle + surface-form merging.

The reference gets set semantics implicitly from ``N3.Store`` set-insert
(/root/reference/docs/scripts/document.js:710, :857): the visible graph is
the deduplicated union of all sources' triples (SURVEY §2.3). Here that is
an explicit, skew-aware shuffle:

1. **Combiner (map-side)**: within-batch ``drop_duplicates`` on the triple
   identity inside ``map_batches`` — vectorized, no shuffle. This collapses
   hot identical triples (e.g. an edge re-asserted by millions of pages) to
   ≤1 row per batch, which is what keeps the reduce side skew-free: after
   the combiner, group sizes are bounded by the number of upstream blocks,
   not by raw row counts.
2. **Reduce (shuffle)**: ``groupby`` on a 128-bit content hash (two
   deterministic uint64 columns — ``pandas.util.hash_array`` with fixed
   hash keys, identical across processes) and per-group reduction. Hash
   keys are uniform → no key skew; narrow (16 bytes vs full triple
   strings) → small shuffle payload.

Surface-form canonicalization (north star: "dedupes subject/object IRIs via
groupby-aggregate shuffles keyed on normalized surface forms,
hash-partitioned with explicit salt-based skew splitting for head
entities"): ``build_canonical_mapping`` runs a two-round salted min
aggregation — round 1 groups on ``(norm_form, salt)`` where
``salt = hash(iri) % S`` so one head form (a popular domain) spreads over S
reducers; round 2 merges the S partials. The resulting mapping is small →
broadcast via ``ray.put`` and applied map-side (no join shuffle).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Max, Min

__all__ = [
    "TRIPLE_ID_COLS", "add_triple_hash", "prededup_batch", "dedup_triples",
    "normalize_iri", "build_canonical_mapping", "apply_canonical_mapping",
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


def _identity_series(df: pd.DataFrame) -> pd.Series:
    parts = [df[c].astype("string").fillna("") for c in TRIPLE_ID_COLS]
    out = parts[0]
    for p in parts[1:]:
        out = out + "\x1f" + p
    return out


def add_triple_hash(df: pd.DataFrame) -> pd.DataFrame:
    """map_batches body (pandas): add uint64 columns ``tk1``/``tk2`` —
    a 128-bit deterministic content hash of the triple identity."""
    ident = _identity_series(df).to_numpy(dtype=object)
    df = df.copy()
    df["tk1"] = pd.util.hash_array(ident, hash_key=_HASH_KEY_A)
    df["tk2"] = pd.util.hash_array(ident, hash_key=_HASH_KEY_B)
    return df


def prededup_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Map-side combiner: drop within-batch duplicate triples (keeping the
    max-score row so the best linker evidence survives)."""
    if df.empty:
        return df
    df = df.sort_values("score", ascending=False, kind="stable")
    return df.drop_duplicates(subset=TRIPLE_ID_COLS, keep="first")


def dedup_triples(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact global dedup of a triples dataset (EXTRACT/TRIPLES schema +
    optional score/src_url). Returns one row per distinct triple identity.

    Because all rows in a hash group are identical on the identity columns,
    per-group Min over them reconstructs the row exactly; Max(score) /
    Min(src_url) give deterministic evidence/lineage representatives.
    """
    keyed = ds.map_batches(
        lambda df: add_triple_hash(prededup_batch(df)),
        batch_format="pandas",
    )
    aggs = [Min(c, alias_name=c) for c in TRIPLE_ID_COLS]
    schema_names = ds.schema().names
    if "score" in schema_names:
        aggs.append(Max("score", alias_name="score"))
    if "src_url" in schema_names:
        aggs.append(Min("src_url", alias_name="src_url"))
    out = keyed.groupby(["tk1", "tk2"]).aggregate(*aggs)
    return out.drop_columns(["tk1", "tk2"])


# ---------------------------------------------------------------------------
# Surface-form canonicalization
# ---------------------------------------------------------------------------

def normalize_iri(iri: str) -> str:
    """Normalized surface form of an entity IRI: casefold, unify the
    http/https scheme, strip one trailing slash."""
    norm = iri.strip().casefold()
    if norm.startswith("https://"):
        norm = "http://" + norm[len("https://"):]
    if norm.endswith("/"):
        norm = norm[:-1]
    return norm


def _pairs_batch(df: pd.DataFrame, columns: list[str]) -> pd.DataFrame:
    """Emit pre-deduped (norm, iri) pairs from the given IRI columns."""
    frames = []
    for col in columns:
        mask = df["obj_is_iri"] if col == "obj" else pd.Series(True, index=df.index)
        vals = df.loc[mask, col].dropna()
        if vals.empty:
            continue
        frames.append(pd.DataFrame({"iri": vals.to_numpy(dtype=object)}))
    if not frames:
        return pd.DataFrame({"norm": pd.Series(dtype="string"),
                             "iri": pd.Series(dtype="string")})
    pairs = pd.concat(frames, ignore_index=True).drop_duplicates()
    pairs["norm"] = pairs["iri"].map(normalize_iri)
    return pairs[["norm", "iri"]].drop_duplicates()


def build_canonical_mapping(
    ds: "ray.data.Dataset",
    columns: list[str] | None = None,
    num_salts: int = 16,
) -> dict[str, str]:
    """Two-round salted aggregation → {iri: canonical_iri} for every IRI
    whose normalized form has ≥2 distinct spellings (identity mappings are
    omitted to keep the broadcast small). Canonical representative = the
    lexicographically smallest IRI of the group (deterministic)."""
    columns = columns or ["subj", "obj"]

    def salted_pairs(df: pd.DataFrame) -> pd.DataFrame:
        pairs = _pairs_batch(df, columns)
        if pairs.empty:
            pairs["salt"] = pd.Series(dtype="int64")
            return pairs
        pairs["salt"] = (
            pd.util.hash_array(
                pairs["iri"].to_numpy(dtype=object), hash_key=_HASH_KEY_A
            )
            % num_salts
        ).astype("int64")
        return pairs

    # round 1: (norm, salt) → min(iri); head forms spread over `num_salts`
    # reducers. round 2: norm → min over the ≤num_salts partials (small).
    partial = (
        ds.map_batches(salted_pairs, batch_format="pandas")
        .groupby(["norm", "salt"])
        .aggregate(Min("iri", alias_name="iri"))
    )
    final = partial.groupby("norm").aggregate(Min("iri", alias_name="canon"))

    # distinct (norm, iri) pairs joined to their canon — both sides are the
    # *distinct-IRI* universe (small relative to the corpus); resolve on the
    # driver and broadcast.
    pair_pdf = (
        ds.map_batches(salted_pairs, batch_format="pandas")
        .groupby(["norm", "iri"])
        .aggregate(Min("salt", alias_name="_s"))
        .drop_columns(["_s"])
        .to_pandas()
    )
    canon_pdf = final.to_pandas()
    if pair_pdf.empty or canon_pdf.empty or "norm" not in pair_pdf.columns:
        return {}
    merged = pair_pdf.merge(canon_pdf, on="norm", how="left")
    mapping = {
        iri: canon
        for iri, canon in zip(merged["iri"], merged["canon"])
        if isinstance(canon, str) and canon != iri
    }
    return mapping


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
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Rewrite subj/obj IRIs through the broadcast mapping (no shuffle)."""
    if not mapping:
        return ds
    mapping_ref = ray.put(mapping)
    return ds.map_batches(
        _Rewriter,
        batch_format="pandas",
        fn_constructor_kwargs={"mapping_ref": mapping_ref},
        concurrency=concurrency,
    )
