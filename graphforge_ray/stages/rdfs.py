"""RDFS entailment materialization (rules rdfs2/3/5/7/9/11).

KG construction doesn't stop at extraction: consumers expect the graph
CLOSED under the ontology — `?x rdf:type ent:Agent` must match a
supplier even though only `cls:Supplier` was asserted. The reference
domain is exactly this shape (its fixture ontologies carry
`rdfs:subClassOf` chains, reference document.js builds owl/rdfs graphs;
fixtures.py:104,117 replicate them), so forward-chaining RDFS inference
is the natural next operator for the store.

Scale design — the **small-ontology broadcast** pattern:

- The schema (subClassOf / subPropertyOf / domain / range triples) is
  ontology-sized — thousands of rows against billions of instance
  triples. It is collected ONCE, closed transitively on the driver
  (vectorized semi-naïve, query/ops.transitive_closure) and broadcast
  via ``ray.put``; a guard raises loudly if the schema exceeds
  ``max_schema_rows`` (never a silent driver OOM).
- Instance entailment is then ONE ``map_batches`` pass: every rule
  becomes a vectorized pandas ``merge`` of the batch against a closed
  broadcast frame (property lift, domain types, range types, class
  lift). Domain/range classes are PRE-lifted through the subClassOf
  closure and property hierarchy at broadcast build time, so no rule
  needs a second pass — the fixpoint is reached in a single map because
  the schema closure is exact. (One documented corner is out of scope:
  an ontology declaring a property ``rdfs:subPropertyOf rdf:type``
  would create NEW type assertions at lift time; standard ontologies
  never do this.)
- Set semantics via one composite-row-hash bucket shuffle
  (shuffle.pair_bucket_tag), the same acero-safe idiom as kg_delta.

Moves each entailed triple once; nothing corpus-sized on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..query.ops import transitive_closure
from ..shuffle import pair_bucket_tag

__all__ = ["rdfs_entail", "RDF_TYPE", "RDFS_SUBCLASS", "RDFS_SUBPROP",
           "RDFS_DOMAIN", "RDFS_RANGE"]

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDFS_SUBCLASS = _RDFS + "subClassOf"
RDFS_SUBPROP = _RDFS + "subPropertyOf"
RDFS_DOMAIN = _RDFS + "domain"
RDFS_RANGE = _RDFS + "range"

_SCHEMA_PREDS = (RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE)


def _closure_frame(edges: pd.DataFrame) -> pd.DataFrame:
    """Non-reflexive transitive closure of (s, o) schema edges."""
    if edges.empty:
        return pd.DataFrame({"s": pd.Series(dtype=object),
                             "o": pd.Series(dtype=object)})
    out = transitive_closure(edges, max_iterations=200)
    return out[out["s"] != out["o"]]


def _build_schema_maps(schema: pd.DataFrame,
                       cols: tuple[str, str, str]) -> dict:
    """Close the ontology and pre-lift domain/range targets.

    Returns broadcastable frames:
      subp   (p, q)      — strict subPropertyOf closure (p ⊏ q)
      subc   (c, d)      — strict subClassOf closure (c ⊏ d)
      dom    (p, cls)    — rdfs2 targets, already lifted through BOTH
                           the property hierarchy (a domain on a
                           superproperty fires for the subproperty) and
                           the class hierarchy (rdfs9 on the result)
      rng    (p, cls)    — rdfs3 targets, same lifting
    """
    s, p, o = cols
    by = {pred: schema.loc[schema[p] == pred, [s, o]]
          .rename(columns={s: "s", o: "o"}).drop_duplicates()
          for pred in _SCHEMA_PREDS}
    subc = _closure_frame(by[RDFS_SUBCLASS])
    subp = _closure_frame(by[RDFS_SUBPROP])

    def lift(decl: pd.DataFrame) -> pd.DataFrame:
        # decl: (s=prop, o=class). Effective props: p plus every p with
        # p ⊏ q for a declared q (statements lift to q, q's domain
        # fires — equivalently the domain fires for p directly).
        eff = pd.concat(
            [decl.rename(columns={"s": "p", "o": "cls"}),
             subp.rename(columns={"s": "p", "o": "q"})
                 .merge(decl.rename(columns={"s": "q", "o": "cls"}),
                        on="q")[["p", "cls"]]],
            ignore_index=True,
        )
        # rdfs9 pre-lift: derived class plus its superclasses
        lifted = eff.merge(
            subc.rename(columns={"s": "cls", "o": "sup"}), on="cls",
            how="left",
        )
        up = lifted.dropna(subset=["sup"])[["p", "sup"]].rename(
            columns={"sup": "cls"})
        return pd.concat([eff[["p", "cls"]], up],
                         ignore_index=True).drop_duplicates()

    return {"subp": subp, "subc": subc,
            "dom": lift(by[RDFS_DOMAIN]), "rng": lift(by[RDFS_RANGE])}


def rdfs_entail(
    triples: "ray.data.Dataset",
    cols: tuple[str, str, str] = ("subj", "pred", "obj"),
    max_schema_rows: int = 2_000_000,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """→ Dataset (subj, pred, obj): the input plus every RDFS-entailed
    triple, set semantics (rules rdfs2 domain, rdfs3 range, rdfs5/7
    subPropertyOf transitivity + statement lift, rdfs9/11 subClassOf
    transitivity + type lift). Schema triples are the rows whose
    predicate is one of subClassOf/subPropertyOf/domain/range."""
    s, p, o = cols

    def pick_schema(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df[p].isin(_SCHEMA_PREDS), [s, p, o]]

    schema_ds = triples.map_batches(
        pick_schema, batch_format="pandas"
    ).materialize()
    n_schema = schema_ds.count()
    if n_schema > max_schema_rows:
        raise ValueError(
            f"ontology too large to broadcast: {n_schema} schema triples "
            f"> max_schema_rows={max_schema_rows}; raise the cap or close "
            "the schema with transitive_closure_distributed first"
        )
    maps = _build_schema_maps(
        schema_ds.to_pandas() if n_schema else
        pd.DataFrame({s: [], p: [], o: []}, dtype=object),
        cols,
    )
    # closed-schema triples (rdfs11 / rdfs5 materialized) ride along as
    # one tiny extra block rather than being re-emitted per batch
    closed = pd.concat(
        [maps["subc"].rename(columns={"s": s, "o": o}).assign(**{p: RDFS_SUBCLASS}),
         maps["subp"].rename(columns={"s": s, "o": o}).assign(**{p: RDFS_SUBPROP})],
        ignore_index=True,
    )[[s, p, o]].astype(object)
    maps_ref = ray.put(maps)

    def entail(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(maps_ref)
        base = df[[s, p, o]].astype(object)
        parts = [base]
        # rdfs7: statement lift through the property hierarchy
        lift = base.merge(
            m["subp"].rename(columns={"s": p, "o": "_q"}), on=p
        )
        if len(lift):
            parts.append(
                lift[[s, "_q", o]].rename(columns={"_q": p})
            )
        stmts = pd.concat(parts, ignore_index=True) if len(parts) > 1 else base
        out = [stmts]
        # rdfs2/9: domain types (pre-lifted through both hierarchies)
        dom = base.merge(m["dom"].rename(columns={"p": p}), on=p)
        if len(dom):
            out.append(pd.DataFrame(
                {s: dom[s], p: RDF_TYPE, o: dom["cls"]}))
        # rdfs3/9: range types
        rng = base.merge(m["rng"].rename(columns={"p": p}), on=p)
        if len(rng):
            out.append(pd.DataFrame(
                {s: rng[o], p: RDF_TYPE, o: rng["cls"]}))
        # rdfs9: lift explicit rdf:type assertions
        typ = base.loc[base[p] == RDF_TYPE].merge(
            m["subc"].rename(columns={"s": o, "o": "_d"}), on=o
        )
        if len(typ):
            out.append(pd.DataFrame(
                {s: typ[s], p: RDF_TYPE, o: typ["_d"]}))
        res = pd.concat(out, ignore_index=True)
        res["_bucket"] = pair_bucket_tag(res, [s, p, o], num_buckets)
        return res

    tagged_closed = closed.copy()
    if len(tagged_closed):
        tagged_closed["_bucket"] = pair_bucket_tag(
            tagged_closed, [s, p, o], num_buckets)
    else:
        tagged_closed["_bucket"] = pd.Series([], dtype="int32")

    entailed = triples.map_batches(entail, batch_format="pandas")
    if len(tagged_closed):
        entailed = entailed.union(ray.data.from_pandas(tagged_closed))

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=[s, p, o])[[s, p, o]]

    return entailed.groupby("_bucket").map_groups(
        distinct, batch_format="pandas"
    )
