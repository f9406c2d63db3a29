"""OWL-RL property-axiom entailment (stages/owl.py) vs a brute-force
fixpoint oracle, including the rule-interplay corners (inverse of a
transitive property, symmetric+transitive) and the functional-property
sameAs chaining contract."""

import numpy as np
import pandas as pd
import pytest

from graphforge_ray.stages.owl import (
    OWL_FUNCTIONAL,
    OWL_INV_FUNCTIONAL,
    OWL_INVERSE_OF,
    OWL_SAMEAS,
    OWL_SYMMETRIC,
    OWL_TRANSITIVE,
    RDF_TYPE,
    functional_sameas,
    owl_entail,
)


def _fixpoint(rows):
    """Brute-force {prp-inv, prp-symp, prp-trp} fixpoint."""
    inv, sym, trans = {}, set(), set()
    for s, p, o in rows:
        if p == OWL_INVERSE_OF:
            inv.setdefault(s, set()).add(o)
            inv.setdefault(o, set()).add(s)
        if p == RDF_TYPE and o == OWL_SYMMETRIC:
            sym.add(s)
        if p == RDF_TYPE and o == OWL_TRANSITIVE:
            trans.add(s)
    cur = set(rows)
    changed = True
    while changed:
        changed = False
        new = set()
        for s, p, o in cur:
            for q in inv.get(p, ()):
                new.add((o, q, s))
            if p in sym:
                new.add((o, p, s))
        for s, p, o in cur:
            if p in trans:
                for s2, p2, o2 in cur:
                    if p2 == p and s2 == o:
                        new.add((s, p, o2))
        if not new <= cur:
            cur |= new
            changed = True
    return cur


def _run(rows):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame(rows, columns=["subj", "pred", "obj"]))
    got = owl_entail(ds).to_pandas()
    return set(map(tuple, got[["subj", "pred", "obj"]].values))


def test_inverse_symmetric_transitive_mix(ray_session):
    rows = [
        ("p:hasChild", OWL_INVERSE_OF, "p:childOf"),
        ("p:ancestor", RDF_TYPE, OWL_TRANSITIVE),
        ("p:knows", RDF_TYPE, OWL_SYMMETRIC),
        ("a", "p:childOf", "b"),
        ("b", "p:childOf", "c"),
        ("a", "p:ancestor", "b"),
        ("b", "p:ancestor", "c"),
        ("c", "p:ancestor", "d"),
        ("x", "p:knows", "y"),
        ("q", "p:other", "r"),
    ]
    assert _run(rows) == _fixpoint([tuple(r) for r in rows])


def test_inverse_of_transitive_property(ray_session):
    # descendantOf = inverse of the TRANSITIVE ancestorOf: closure
    # pairs must be rewritten through the inverse (a 3-chain closes to
    # 3 extra pairs, each with its inverse image)
    rows = [
        ("p:anc", RDF_TYPE, OWL_TRANSITIVE),
        ("p:anc", OWL_INVERSE_OF, "p:desc"),
        ("a", "p:anc", "b"),
        ("b", "p:anc", "c"),
        ("c", "p:anc", "d"),
    ]
    got = _run(rows)
    want = _fixpoint([tuple(r) for r in rows])
    assert got == want
    assert ("d", "p:desc", "a") in got  # inverse of the closed edge


def test_inverse_feeds_transitive_edges(ray_session):
    # edges asserted only via the INVERSE predicate must contribute to
    # the transitive property's closure: b desc a, c desc b → a anc c
    rows = [
        ("p:anc", RDF_TYPE, OWL_TRANSITIVE),
        ("p:anc", OWL_INVERSE_OF, "p:desc"),
        ("b", "p:desc", "a"),
        ("c", "p:desc", "b"),
    ]
    got = _run(rows)
    want = _fixpoint([tuple(r) for r in rows])
    assert got == want
    assert ("a", "p:anc", "c") in got
    assert ("c", "p:desc", "a") in got


def test_symmetric_and_transitive_same_property(ray_session):
    # connectedTo is symmetric AND transitive: a chain becomes a full
    # clique (equivalence-class closure)
    rows = [
        ("p:conn", RDF_TYPE, OWL_SYMMETRIC),
        ("p:conn", RDF_TYPE, OWL_TRANSITIVE),
        ("a", "p:conn", "b"),
        ("b", "p:conn", "c"),
    ]
    got = _run(rows)
    want = _fixpoint([tuple(r) for r in rows])
    assert got == want
    nodes = {"a", "b", "c"}
    for x in nodes:
        for y in nodes - {x}:
            assert (x, "p:conn", y) in got


def test_randomized_graph_matches_fixpoint(ray_session):
    rng = np.random.default_rng(7)
    preds = ["p:t1", "p:t2", "p:s", "p:i", "p:j", "p:plain"]
    rows = [
        ("p:t1", RDF_TYPE, OWL_TRANSITIVE),
        ("p:t2", RDF_TYPE, OWL_TRANSITIVE),
        ("p:s", RDF_TYPE, OWL_SYMMETRIC),
        ("p:i", OWL_INVERSE_OF, "p:j"),
        ("p:t2", OWL_INVERSE_OF, "p:s"),  # inverse links sym + trans
    ]
    nodes = [f"n{i}" for i in range(12)]
    for _ in range(40):
        rows.append((
            nodes[rng.integers(len(nodes))],
            preds[rng.integers(len(preds))],
            nodes[rng.integers(len(nodes))],
        ))
    rows = list(dict.fromkeys(rows))
    assert _run(rows) == _fixpoint([tuple(r) for r in rows])


def test_no_axioms_is_identity(ray_session):
    rows = [("a", "p:x", "b"), ("b", "p:y", "c")]
    assert _run(rows) == set(rows)


def test_functional_sameas_chains(ray_session):
    import ray.data as rd

    rows = [
        ("p:billTo", RDF_TYPE, OWL_FUNCTIONAL),
        ("p:email", RDF_TYPE, OWL_INV_FUNCTIONAL),
        ("o1", "p:billTo", "cust:1"),
        ("o1", "p:billTo", "c/1"),
        ("o1", "p:billTo", "alias:1"),
        ("o2", "p:billTo", "cust:2"),
        ("u1", "p:email", "e@x"),
        ("u2", "p:email", "e@x"),
        ("u3", "p:email", "f@x"),
        ("q", "p:other", "r"),
    ]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["subj", "pred", "obj"]))
    same = functional_sameas(ds).to_pandas()
    got = sorted(map(tuple, same[["subj", "pred", "obj"]].values))
    # chained (sorted values), not all-pairs: 3 aliases → 2 pairs
    assert got == [
        ("alias:1", OWL_SAMEAS, "c/1"),
        ("c/1", OWL_SAMEAS, "cust:1"),
        ("u1", OWL_SAMEAS, "u2"),
    ]


def test_functional_sameas_dedups_across_blocks(ray_session):
    import ray.data as rd

    # the same (subject, objects) evidence repeated in many blocks must
    # yield each pair once (bucket-shuffle set semantics)
    base = pd.DataFrame(
        [("p:billTo", RDF_TYPE, OWL_FUNCTIONAL)]
        + [("o1", "p:billTo", "x1"), ("o1", "p:billTo", "x2")] * 50
        # DIFFERENT subjects chaining the SAME pair (cross-group dedup)
        + [("o2", "p:billTo", "x1"), ("o2", "p:billTo", "x2")],
        columns=["subj", "pred", "obj"],
    )
    ds = rd.from_pandas(base).repartition(8)
    same = functional_sameas(ds).to_pandas()
    assert sorted(map(tuple, same.values)) == [("x1", OWL_SAMEAS, "x2")]


def test_owl_entail_empty_input(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(
        pd.DataFrame({"subj": [], "pred": [], "obj": []}, dtype=object)
    )
    out = owl_entail(ds).to_pandas()
    assert len(out) == 0
