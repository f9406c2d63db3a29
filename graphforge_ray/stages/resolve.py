"""Fuzzy entity-name join (trigram-Jaccard similarity join).

Entity resolution is the step after canonicalization that surface-form
normalization can't do: "Acme Corp" / "Acme Corporation" / "Acme Crop"
(typo) need a SIMILARITY join, not an equality join. The similarity is
character-trigram Jaccard — ``grams(s) = {s[i:i+3]}`` (whole string
when ``len < 3``), ``sim = |A∩B| / |A∪B|`` — chosen because it is
set-algebraic (exact, no floats until one final division) and
SQL-replayable, unlike edit distance.

The join is EXACT (every pair with ``sim ≥ t`` is emitted) but never
computes the cross product — the classic prefix-filtering plan
(Chaudhuri et al., "A Primitive Operator for Similarity Joins", ICDE
2006; public):

1. gram rows per side, distinct per (id, gram);
2. one gram-bucket count pass → global document frequencies;
3. each name keeps only its PREFIX: the ``|A| − ⌈t·|A|⌉ + 1`` rarest
   grams (global (df, gram) order). Two names with ``sim ≥ t`` MUST
   share a prefix gram — rare-first ordering makes the blocking keys
   the UNCOMMON grams, so a hot gram ('the', '000') never becomes a
   quadratic bucket;
4. candidates = prefix-gram equi-join, deduped by pair;
5. verify: candidates pull both name strings (bindings_join), then one
   vectorized kernel re-shingles (cached per distinct name within the
   batch) and keeps ``sim ≥ t`` exactly.

Scale shape: shuffles move gram rows and candidate pairs, never the
cross product; the only driver state is nothing at all.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..shuffle import bindings_join, bucket_tag, pair_bucket_tag, snap_lineage

__all__ = ["fuzzy_name_join", "name_grams"]


def name_grams(name: str) -> set[str]:
    """Distinct character trigrams; whole string when len < 3."""
    n = max(len(name) - 2, 1)
    return {name[i:i + 3] for i in range(n)}


def _gram_rows(
    ds, id_col: str, name_col: str, out_id: str
) -> "ray.data.Dataset":
    def expand(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for i, nm in zip(df[id_col], df[name_col].fillna("")):
            gs = sorted(name_grams(nm)) if nm else []
            if gs:
                parts.append(
                    pd.DataFrame({out_id: i, "g": gs, "n": len(gs)})
                )
        if not parts:
            return pd.DataFrame(
                {out_id: pd.Series([], dtype=df[id_col].dtype),
                 "g": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)}
            )
        out = pd.concat(parts, ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    return ds.map_batches(expand, batch_format="pandas")


def fuzzy_name_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    threshold: float,
    left_id: str = "lid",
    left_name: str = "l_name",
    right_id: str = "rid",
    right_name: str = "r_name",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ Dataset (lid, rid, sim): every cross pair with trigram-Jaccard
    ``sim ≥ threshold`` (FLOOR-truncated at 1e-6 — one double division,
    identical on any engine). Exact via prefix filtering; no cross
    product is ever materialized."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    from ..shuffle import np_key_dtype

    # bindings_join widens key dtypes to object — every post-join
    # bucket/join on an id must see the RESTORED dtype (shuffle.py)
    lid_np = np_key_dtype(left, left_id)
    rid_np = np_key_dtype(right, right_id)
    _restore = {"_lid": lid_np, "_rid": rid_np}

    # snap each multi-consumer sub-plan: lg/rg feed BOTH the frequency
    # pass and the prefix joins, freq feeds both sides' prefixes — left
    # unsnapped, Ray re-executes the whole upstream plan once per
    # consumer, multiplicatively with depth (measured 192 s → ~13 s on
    # the 64-name contract query; same lesson as lm.py)
    lg = snap_lineage(_gram_rows(left, left_id, left_name, "_lid"))
    rg = snap_lineage(_gram_rows(right, right_id, right_name, "_rid"))

    # ---- global gram document frequencies (both sides) ---------------
    def df_combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("g", as_index=False).size().rename(
            columns={"size": "df"}
        )
        out["df"] = out["df"].astype(np.int64)
        return out.assign(_bucket=bucket_tag(out, "g", num_buckets))

    freq = snap_lineage(
        lg.union(rg.map_batches(
            lambda df: df.rename(columns={"_rid": "_lid"}),
            batch_format="pandas",
        ))
        .map_batches(df_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.groupby("g", as_index=False)["df"].sum(),
            batch_format="pandas",
        )
    )

    # ---- prefix selection: keep the |A| - ceil(t|A|) + 1 rarest grams
    def prefix(rows, idc):
        joined = bindings_join(rows, freq, on=["g"],
                               num_buckets=num_buckets)

        def tag_id(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["df"] = df["df"].astype(np.int64)
            df["n"] = df["n"].astype(np.int64)
            df[idc] = df[idc].astype(_restore[idc])
            return df.assign(_bucket=bucket_tag(df, idc, num_buckets))

        def take_prefix(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["df", "g"], kind="stable")
            n = g["n"].to_numpy()
            p = n - np.ceil(threshold * n - 1e-9).astype(np.int64) + 1
            keep = g.groupby(idc, sort=False).cumcount().to_numpy() < p
            return g.loc[keep, [idc, "g", "n"]]

        # snapped although single-consumer: the union downstream feeds a
        # 4-shuffle chain, and Ray's plan replay costs grow with total
        # plan depth (measured: unsnapped prefixes 236 s vs snapped 43 s
        # on the 64-name contract query under ambient load)
        return snap_lineage(
            joined.map_batches(tag_id, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(take_prefix, batch_format="pandas")
        )

    lp = prefix(lg, "_lid")
    rp = prefix(rg, "_rid")

    # ---- blocking: pairs sharing a prefix gram ------------------------
    # one shared schema for the union (object ids; the missing side is
    # None) — restored to the captured dtypes inside pair_up
    def tag_side(side, own, other):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "_lid": df[own] if side == 0 else None,
                    "_rid": df[own] if side == 1 else None,
                    "g": df["g"],
                    "_side": np.int8(side),
                }
            )
            out["_lid"] = out["_lid"].astype(object)
            out["_rid"] = out["_rid"].astype(object)
            return out.assign(_bucket=bucket_tag(out, "g", num_buckets))

        return fn

    both = lp.map_batches(
        tag_side(0, "_lid", "_rid"), batch_format="pandas"
    ).union(
        rp.map_batches(tag_side(1, "_rid", "_lid"), batch_format="pandas")
    )

    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0][["_lid", "g"]]
        r = g[g["_side"] == 1][["_rid", "g"]]
        if l.empty or r.empty:
            return pd.DataFrame(
                {"_lid": pd.Series([], dtype=lid_np),
                 "_rid": pd.Series([], dtype=rid_np)}
            )
        m = l.merge(r, on="g")[["_lid", "_rid"]].drop_duplicates()
        m["_lid"] = m["_lid"].astype(lid_np)
        m["_rid"] = m["_rid"].astype(rid_np)
        return m

    cands = snap_lineage(
        both.groupby("_bucket")
        .map_groups(pair_up, batch_format="pandas")
        .map_batches(
            lambda df: df.assign(
                _bucket=pair_bucket_tag(df, ["_lid", "_rid"], num_buckets)
            ),
            batch_format="pandas",
        )
        .groupby("_bucket")
        .map_groups(
            lambda g: g.drop_duplicates(subset=["_lid", "_rid"])[
                ["_lid", "_rid"]
            ],
            batch_format="pandas",
        )
    )

    # ---- verify: pull both names, exact set Jaccard -------------------
    lnames = left.map_batches(
        lambda df: df[[left_id, left_name]].rename(
            columns={left_id: "_lid", left_name: "_lnm"}
        ),
        batch_format="pandas",
    )
    rnames = right.map_batches(
        lambda df: df[[right_id, right_name]].rename(
            columns={right_id: "_rid", right_name: "_rnm"}
        ),
        batch_format="pandas",
    )
    with_l = bindings_join(cands, lnames, on=["_lid"],
                           num_buckets=num_buckets)
    # the first join widened _rid to object — restore before the second
    # join or its buckets miss (hash(object-int) != hash(int64))
    with_l = with_l.map_batches(
        lambda df: df.assign(_rid=df["_rid"].astype(rid_np)),
        batch_format="pandas",
    )
    with_r = bindings_join(with_l, rnames, on=["_rid"],
                           num_buckets=num_buckets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        cache: dict[str, set] = {}

        def gs(nm: str) -> set:
            s = cache.get(nm)
            if s is None:
                s = cache[nm] = name_grams(nm)
            return s

        sims = np.empty(len(df), dtype=np.float64)
        for k, (a, b) in enumerate(zip(df["_lnm"], df["_rnm"])):
            A, B = gs(a), gs(b)
            inter = len(A & B)
            sims[k] = inter / (len(A) + len(B) - inter)
        out = pd.DataFrame(
            {
                left_id: df["_lid"].astype(lid_np).to_numpy(),
                right_id: df["_rid"].astype(rid_np).to_numpy(),
                "sim": np.floor(sims * 1e6) / 1e6,
            }
        )
        return out[out["sim"] >= math.floor(threshold * 1e6) / 1e6]

    return with_r.map_batches(verify, batch_format="pandas")
