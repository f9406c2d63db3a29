"""OWL-RL property-axiom entailment (rules prp-inv, prp-symp, prp-trp)
and functional-property sameAs inference (prp-fp, prp-ifp).

The reference builds owl: graphs alongside rdfs: ones (its fixture
ontologies type properties with owl:Class / owl:oneOf — reference
document.js:720-821 walks them), and a KG constructor that closes under
RDFS but ignores owl:inverseOf / owl:TransitiveProperty leaves half the
usual ontology unused. This stage completes the property-axiom half;
compose with ``stages.rdfs.rdfs_entail`` for the class half.

Scale design mirrors rdfs_entail's **small-ontology broadcast**:

- The axiom set (inverseOf pairs + Symmetric/Transitive declarations)
  is ontology-sized. It is collected once and closed on the driver into
  a REWRITE MAP: for every asserted predicate p, the exact set of
  predicates its statements entail forward (x q y) and reverse (y q x)
  under the {inv, symp} fixpoint — a tiny driver-side iteration over
  predicate names, never instance data.
- Instance expansion is then ONE ``map_batches`` pass (vectorized
  merges against the broadcast map).
- prp-trp: edges of every transitive predicate are composite-keyed
  (``pred\\x1f node``) so ALL transitive predicates close in ONE
  ``closure_of_edges_ds`` execution (log-diameter path doubling on the
  distributed path) instead of one execution per predicate. New closure
  pairs re-enter the rewrite map once (inverse/symmetric images of
  closed edges), which reaches the {inv, symp, trp} fixpoint: the
  rewrite map is already closed under {inv, symp}, and the closure of a
  rewritten edge set equals the rewrite of the closure.
- Set semantics via the same composite-row-hash bucket shuffle as
  rdfs_entail (shuffle.pair_bucket_tag).

``functional_sameas`` derives owl:sameAs candidate pairs from
owl:FunctionalProperty (same subject+predicate → objects co-refer) and
owl:InverseFunctionalProperty (same predicate+object → subjects
co-refer). Within each key group the sorted values are CHAINED
(v1~v2, v2~v3), not all-paired — sameAs is transitive and the chain
generates the same equivalence classes in O(n) pairs instead of O(n²),
so a hub key (a shared default value) cannot go quadratic. Feed the
result to the sameAs canonicalizer (pipelines/driver_queries
kg_sameas_canonical machinery) to rewrite the graph.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..query.ops import closure_of_edges_ds
from ..shuffle import pair_bucket_tag

__all__ = ["owl_entail", "functional_sameas", "OWL_INVERSE_OF",
           "OWL_SYMMETRIC", "OWL_TRANSITIVE", "OWL_FUNCTIONAL",
           "OWL_INV_FUNCTIONAL", "OWL_SAMEAS"]

_OWL = "http://www.w3.org/2002/07/owl#"
OWL_INVERSE_OF = _OWL + "inverseOf"
OWL_SYMMETRIC = _OWL + "SymmetricProperty"
OWL_TRANSITIVE = _OWL + "TransitiveProperty"
OWL_FUNCTIONAL = _OWL + "FunctionalProperty"
OWL_INV_FUNCTIONAL = _OWL + "InverseFunctionalProperty"
OWL_SAMEAS = _OWL + "sameAs"

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_SEP = "\x1f"  # composite-key separator (never appears in IRIs)


def _build_rewrite_map(schema: pd.DataFrame,
                       cols: tuple[str, str, str]) -> dict:
    """Close the axioms into per-predicate rewrite sets.

    Returns
      fwd  (p, q) — x p y entails x q y   (q ∈ F(p))
      rev  (p, q) — x p y entails y q x   (q ∈ R(p))
      trans: frozenset of transitive predicate names
    F/R fixpoint rules (driver-side, ontology-sized):
      p ∈ F(p);
      q ∈ F(p), q inverseOf r (either direction) → r ∈ R(p);
      q ∈ R(p), q inverseOf r                   → r ∈ F(p);
      q ∈ F(p) ∪ R(p), q symmetric              → q ∈ F(p) ∩ R(p).
    """
    s, p, o = cols
    inv = schema.loc[schema[p] == OWL_INVERSE_OF, [s, o]]
    types = schema.loc[schema[p] == RDF_TYPE, [s, o]]
    sym = set(types.loc[types[o] == OWL_SYMMETRIC, s])
    trans = frozenset(types.loc[types[o] == OWL_TRANSITIVE, s])

    # inverse relation, symmetrized: q -> {r}, r -> {q}
    inv_of: dict[str, set] = {}
    for a, b in zip(inv[s], inv[o]):
        inv_of.setdefault(a, set()).add(b)
        inv_of.setdefault(b, set()).add(a)

    preds = (set(inv_of) | sym | set(trans))
    fwd: dict[str, set] = {q: {q} for q in preds}
    rev: dict[str, set] = {q: set() for q in preds}
    changed = True
    while changed:
        changed = False
        for base in preds:
            for q in list(fwd[base]):
                for r in inv_of.get(q, ()):
                    if r not in rev[base]:
                        rev[base].add(r)
                        changed = True
                if q in sym and q not in rev[base]:
                    rev[base].add(q)
                    changed = True
            for q in list(rev[base]):
                for r in inv_of.get(q, ()):
                    if r not in fwd[base]:
                        fwd[base].add(r)
                        changed = True
                if q in sym and q not in fwd[base]:
                    fwd[base].add(q)
                    changed = True

    def frame(d: dict[str, set]) -> pd.DataFrame:
        rows = [(k, v) for k, vs in d.items() for v in vs]
        return pd.DataFrame(rows, columns=["p", "q"], dtype=object)

    # drop the identity rows from fwd (the base triple is kept verbatim
    # by the expansion pass; re-emitting x p y via (p, p) is redundant)
    f = frame(fwd)
    f = f[f["p"] != f["q"]]
    return {"fwd": f.reset_index(drop=True), "rev": frame(rev),
            "trans": trans}


def _expand_batch(df: pd.DataFrame, m: dict,
                  cols: tuple[str, str, str]) -> pd.DataFrame:
    """base ∪ forward rewrites ∪ reverse rewrites of one batch."""
    s, p, o = cols
    base = df[[s, p, o]].astype(object)
    parts = [base]
    fwd = base.merge(m["fwd"].rename(columns={"p": p}), on=p)
    if len(fwd):
        parts.append(pd.DataFrame({s: fwd[s], p: fwd["q"], o: fwd[o]}))
    rev = base.merge(m["rev"].rename(columns={"p": p}), on=p)
    if len(rev):
        parts.append(pd.DataFrame({s: rev[o], p: rev["q"], o: rev[s]}))
    return (pd.concat(parts, ignore_index=True)
            if len(parts) > 1 else base)


def owl_entail(
    triples: "ray.data.Dataset",
    cols: tuple[str, str, str] = ("subj", "pred", "obj"),
    max_schema_rows: int = 2_000_000,
    num_buckets: int = 64,
    max_closure_iterations: int = 25,
) -> "ray.data.Dataset":
    """→ Dataset (subj, pred, obj): the input plus every triple entailed
    by the {prp-inv, prp-symp, prp-trp} fixpoint, set semantics. Axiom
    triples are the rows with predicate owl:inverseOf or rdf:type of
    owl:SymmetricProperty / owl:TransitiveProperty; they ride through
    unchanged (the output contains the input)."""
    import ray.data as rd

    s, p, o = cols

    def pick_schema(df: pd.DataFrame) -> pd.DataFrame:
        m = (df[p] == OWL_INVERSE_OF) | (
            (df[p] == RDF_TYPE)
            & df[o].isin((OWL_SYMMETRIC, OWL_TRANSITIVE))
        )
        return df.loc[m, [s, p, o]]

    schema_ds = triples.map_batches(
        pick_schema, batch_format="pandas"
    ).materialize()
    n_schema = schema_ds.count()
    if n_schema > max_schema_rows:
        raise ValueError(
            f"ontology too large to broadcast: {n_schema} axiom triples "
            f"> max_schema_rows={max_schema_rows}"
        )
    maps = _build_rewrite_map(
        schema_ds.to_pandas() if n_schema else
        pd.DataFrame({s: [], p: [], o: []}, dtype=object),
        cols,
    )
    maps_ref = ray.put(maps)
    trans = maps["trans"]

    expanded = triples.map_batches(
        lambda df: _expand_batch(df, ray.get(maps_ref), cols),
        batch_format="pandas",
    )

    parts = [expanded]
    if trans:
        exp_mat = expanded.materialize()
        parts = [exp_mat]

        def trans_edges(df: pd.DataFrame) -> pd.DataFrame:
            t = df.loc[df[p].isin(trans)]
            # composite key: every transitive predicate closes in the
            # SAME execution; joins can't cross predicates because the
            # predicate is embedded in both endpoints
            return pd.DataFrame({
                "s": t[p].astype(str) + _SEP + t[s].astype(str),
                "o": t[p].astype(str) + _SEP + t[o].astype(str),
            })

        closure_ds, _ = closure_of_edges_ds(
            exp_mat.map_batches(trans_edges, batch_format="pandas"),
            max_iterations=max_closure_iterations,
            include_reflexive=False,
        )

        def split_keys(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(
                    {s: [], p: [], o: []}, dtype=object)
            sp = df["s"].str.split(_SEP, n=1, expand=True)
            op = df["o"].str.split(_SEP, n=1, expand=True)
            return pd.DataFrame(
                {s: sp[1], p: sp[0], o: op[1]}).astype(object)

        closed = closure_ds.map_batches(split_keys, batch_format="pandas")
        # inverse/symmetric images of the CLOSED edges (the rewrite map
        # is {inv,symp}-closed, so one more pass reaches the fixpoint)
        parts.append(closed.map_batches(
            lambda df: _expand_batch(df, ray.get(maps_ref), cols),
            batch_format="pandas",
        ))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[s, p, o]].astype(object)
        out["_bucket"] = pair_bucket_tag(out, [s, p, o], num_buckets)
        return out

    unioned = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=[s, p, o])[[s, p, o]]

    return (unioned.map_batches(tag, batch_format="pandas")
            .groupby("_bucket").map_groups(distinct, batch_format="pandas"))


def functional_sameas(
    triples: "ray.data.Dataset",
    cols: tuple[str, str, str] = ("subj", "pred", "obj"),
    max_schema_rows: int = 2_000_000,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ Dataset (subj, pred=owl:sameAs, obj) of entailed co-reference
    pairs: prp-fp (x p y₁ ∧ x p y₂ → y₁ sameAs y₂ for functional p) and
    prp-ifp (x₁ p y ∧ x₂ p y → x₁ sameAs x₂ for inverse-functional p).

    Per (pred, key) group the sorted values are chained (v₁~v₂, v₂~v₃…),
    generating the same equivalence classes as all-pairs in linear
    output; pairs are normalized subj < obj and exactly deduped."""
    s, p, o = cols

    def pick_schema(df: pd.DataFrame) -> pd.DataFrame:
        m = (df[p] == RDF_TYPE) & df[o].isin(
            (OWL_FUNCTIONAL, OWL_INV_FUNCTIONAL))
        return df.loc[m, [s, o]]

    schema_ds = triples.map_batches(
        pick_schema, batch_format="pandas"
    ).materialize()
    n_schema = schema_ds.count()
    if n_schema > max_schema_rows:
        raise ValueError(
            f"ontology too large to broadcast: {n_schema} axiom triples "
            f"> max_schema_rows={max_schema_rows}"
        )
    schema = (schema_ds.to_pandas() if n_schema
              else pd.DataFrame({s: [], o: []}, dtype=object))
    fp = frozenset(schema.loc[schema[o] == OWL_FUNCTIONAL, s])
    ifp = frozenset(schema.loc[schema[o] == OWL_INV_FUNCTIONAL, s])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        f = df.loc[df[p].isin(fp)]
        if len(f):
            outs.append(pd.DataFrame({
                "k": f[p].astype(str) + _SEP + f[s].astype(str),
                "v": f[o].astype(str)}))
        i = df.loc[df[p].isin(ifp)]
        if len(i):
            outs.append(pd.DataFrame({
                "k": "~" + i[p].astype(str) + _SEP + i[o].astype(str),
                "v": i[s].astype(str)}))
        if not outs:
            return pd.DataFrame({"k": [], "v": []}, dtype=object)
        out = pd.concat(outs, ignore_index=True)
        out["_bucket"] = pair_bucket_tag(out, ["k"], num_buckets)
        return out

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["k", "v"]].drop_duplicates().sort_values(["k", "v"])
        prev = g.groupby("k")["v"].shift(1)
        m = prev.notna()
        return (pd.DataFrame({s: prev[m], p: OWL_SAMEAS, o: g.loc[m, "v"]})
                .drop_duplicates().astype(object))

    pairs = (triples.map_batches(keyed, batch_format="pandas")
             .groupby("_bucket").map_groups(chain, batch_format="pandas"))
    # distinct DIFFERENT key groups can chain the same pair (two orders
    # of one customer both pair its aliases) — one pair-level dedup
    from ..shuffle import dedup_pairs

    return dedup_pairs(pairs, cols=(s, o), num_buckets=num_buckets)
