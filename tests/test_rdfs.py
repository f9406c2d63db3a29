"""RDFS entailment materialization — every rule (rdfs2/3/5/7/9/11)
exercised on a toy ontology, checked against an independent fixpoint
replay."""

from __future__ import annotations

import pandas as pd
import pytest

import ray.data as rd

from graphforge_ray.stages.rdfs import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    rdfs_entail,
)


def _ds(rows):
    return rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    ).repartition(2)


def _naive_fixpoint(rows):
    """Independent oracle: iterate all six rules to fixpoint."""
    triples = set(rows)
    while True:
        new = set()
        subc = {(s, o) for s, p, o in triples if p == RDFS_SUBCLASS}
        subp = {(s, o) for s, p, o in triples if p == RDFS_SUBPROP}
        dom = {(s, o) for s, p, o in triples if p == RDFS_DOMAIN}
        rng = {(s, o) for s, p, o in triples if p == RDFS_RANGE}
        for a, b in subc:
            for c, d in subc:
                if b == c:
                    new.add((a, RDFS_SUBCLASS, d))
        for a, b in subp:
            for c, d in subp:
                if b == c:
                    new.add((a, RDFS_SUBPROP, d))
        for s, p, o in triples:
            for a, b in subp:
                if p == a:
                    new.add((s, b, o))
            for a, c in dom:
                if p == a:
                    new.add((s, RDF_TYPE, c))
            for a, c in rng:
                if p == a:
                    new.add((o, RDF_TYPE, c))
            if p == RDF_TYPE:
                for a, b in subc:
                    if o == a:
                        new.add((s, RDF_TYPE, b))
        if new <= triples:
            return triples
        triples |= new


ONTOLOGY = [
    ("cls:Nation", RDFS_SUBCLASS, "cls:GeoRegion"),
    ("cls:GeoRegion", RDFS_SUBCLASS, "cls:Entity"),
    ("cls:Supplier", RDFS_SUBCLASS, "cls:Agent"),
    ("cls:Place", RDFS_SUBCLASS, "cls:Entity"),
    ("ex:basedIn", RDFS_SUBPROP, "ex:locatedIn"),
    ("ex:locatedIn", RDFS_SUBPROP, "ex:relatedTo"),
    ("ex:basedIn", RDFS_DOMAIN, "cls:Supplier"),
    ("ex:locatedIn", RDFS_RANGE, "cls:Place"),
]

INSTANCES = [
    ("sup:1", "ex:basedIn", "nat:7"),
    ("sup:2", "ex:basedIn", "nat:7"),
    ("sup:2", "ex:basedIn", "nat:9"),
    ("nat:7", RDF_TYPE, "cls:Nation"),
    ("nat:9", RDF_TYPE, "cls:Nation"),
    ("doc:1", "ex:cites", "doc:2"),  # no schema — passes through only
]


def test_rdfs_entail_matches_fixpoint(ray_session):
    got = rdfs_entail(_ds(ONTOLOGY + INSTANCES)).to_pandas()
    got_set = set(map(tuple, got[["subj", "pred", "obj"]].to_numpy()))
    assert got_set == _naive_fixpoint(ONTOLOGY + INSTANCES)
    # spot-check each rule fired
    assert ("sup:1", "ex:locatedIn", "nat:7") in got_set      # rdfs7
    assert ("sup:1", "ex:relatedTo", "nat:7") in got_set      # via closure
    assert ("sup:1", RDF_TYPE, "cls:Supplier") in got_set     # rdfs2
    assert ("sup:1", RDF_TYPE, "cls:Agent") in got_set        # rdfs2+9
    assert ("nat:7", RDF_TYPE, "cls:Place") in got_set        # rdfs3 (lifted prop)
    assert ("nat:7", RDF_TYPE, "cls:Entity") in got_set       # rdfs3+9
    assert ("nat:7", RDF_TYPE, "cls:GeoRegion") in got_set    # rdfs9
    assert ("cls:Nation", RDFS_SUBCLASS, "cls:Entity") in got_set  # rdfs11
    assert ("ex:basedIn", RDFS_SUBPROP, "ex:relatedTo") in got_set  # rdfs5
    # no duplicates (set semantics)
    assert len(got) == len(got_set)


def test_rdfs_entail_no_schema_is_distinct_identity(ray_session):
    rows = [("a", "p", "b"), ("a", "p", "b"), ("c", "q", "d")]
    got = rdfs_entail(_ds(rows)).to_pandas()
    got_set = set(map(tuple, got[["subj", "pred", "obj"]].to_numpy()))
    assert got_set == {("a", "p", "b"), ("c", "q", "d")}
    assert len(got) == 2


def test_rdfs_entail_schema_cap_raises(ray_session):
    ds = _ds(ONTOLOGY)
    with pytest.raises(ValueError, match="ontology too large"):
        rdfs_entail(ds, max_schema_rows=2)


def test_shacl_validate_all_violation_kinds(ray_session):
    # minCount via low count, minCount via ZERO count (outer-join null
    # side), maxCount, and a fully-satisfied shape emitting nothing
    import ray.data as rd

    from graphforge_ray.stages.shacl import shacl_validate

    rows = [
        ("s:1", "rdf:type", "s:T"),
        ("s:2", "rdf:type", "s:T"),
        ("s:3", "rdf:type", "s:T"),
        ("x:9", "p:val", "v"),          # not targeted: no type triple
        ("s:1", "p:val", "v1"),         # count 1 → minCount (needs 2)
        ("s:2", "p:val", "v1"),
        ("s:2", "p:val", "v2"),
        ("s:2", "p:val", "v3"),         # count 3 → maxCount (cap 2)
        # s:3 has ZERO p:val rows → minCount via the outer-join path
        ("s:1", "p:ok", "o1"),
        ("s:2", "p:ok", "o1"),
        ("s:3", "p:ok", "o1"),          # p:ok satisfied everywhere
    ]
    shapes = [
        {"shape_id": "sv", "target_class": "s:T", "pred": "p:val",
         "min_count": 2, "max_count": 2},
        {"shape_id": "so", "target_class": "s:T", "pred": "p:ok",
         "min_count": 1, "max_count": 1},
    ]
    ds = rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    ).repartition(3)
    got = (
        shacl_validate(ds, shapes)
        .to_pandas()
        .sort_values(["subj", "shape_id"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, got.to_numpy())) == [
        ("s:1", "sv", "p:val", 1, "minCount"),
        ("s:2", "sv", "p:val", 3, "maxCount"),
        ("s:3", "sv", "p:val", 0, "minCount"),
    ]


def test_shacl_validate_rejects_bad_shapes(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.shacl import shacl_validate

    ds = rd.from_pandas(
        pd.DataFrame({"subj": ["a"], "pred": ["p"], "obj": ["b"]})
    )
    with pytest.raises(ValueError, match="non-empty"):
        shacl_validate(ds, [])
    with pytest.raises(ValueError, match="missing"):
        shacl_validate(ds, [{"shape_id": "x"}])
    with pytest.raises(ValueError, match="duplicate"):
        shacl_validate(ds, [
            {"shape_id": "x", "target_class": "t", "pred": "p",
             "min_count": 1},
            {"shape_id": "x", "target_class": "t", "pred": "q",
             "min_count": 1},
        ])


def test_shacl_incremental_equals_full(ray_session):
    from graphforge_ray.stages.shacl import (
        shacl_validate,
        shacl_validate_incremental,
    )

    shapes = [{"shape_id": "sv", "target_class": "s:T",
               "pred": "p:v", "min_count": 1, "max_count": 2}]
    base_rows = [
        ("s:1", "rdf:type", "s:T"), ("s:2", "rdf:type", "s:T"),
        ("s:3", "rdf:type", "s:T"),
        ("s:1", "p:v", "a"),
        # s:2 has none → minCount in base
        ("s:3", "p:v", "a"), ("s:3", "p:v", "b"),
    ]
    # delta: s:2 gains a value (violation clears); s:3 gains a third
    # (new maxCount); s:1 untouched (verdict must carry over unchanged)
    new_rows = base_rows + [("s:2", "p:v", "x"), ("s:3", "p:v", "c")]
    base = rd.from_pandas(
        pd.DataFrame(base_rows, columns=["subj", "pred", "obj"])
    ).repartition(2)
    new = rd.from_pandas(
        pd.DataFrame(new_rows, columns=["subj", "pred", "obj"])
    ).repartition(3)
    prev = shacl_validate(base, shapes)
    affected = rd.from_pandas(pd.DataFrame({"subj": ["s:2", "s:3"]}))
    inc = (
        shacl_validate_incremental(new, shapes, affected, prev)
        .to_pandas()
        .sort_values(["subj", "shape_id"])
        .reset_index(drop=True)
    )
    full = (
        shacl_validate(new, shapes)
        .to_pandas()
        .sort_values(["subj", "shape_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(inc, full)
    assert list(inc["subj"]) == ["s:3"]
    assert inc.loc[0, "violation"] == "maxCount"


def test_shacl_incremental_empty_delta_keeps_prev(ray_session):
    from graphforge_ray.stages.shacl import (
        shacl_validate,
        shacl_validate_incremental,
    )

    shapes = [{"shape_id": "sv", "target_class": "s:T",
               "pred": "p:v", "min_count": 2}]
    rows = [("s:1", "rdf:type", "s:T"), ("s:1", "p:v", "a")]
    ds = rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    )
    prev = shacl_validate(ds, shapes)
    affected = rd.from_pandas(
        pd.DataFrame({"subj": pd.Series(dtype=object)})
    )
    inc = shacl_validate_incremental(
        ds, shapes, affected, prev
    ).to_pandas()
    assert len(inc) == 1 and inc.loc[0, "subj"] == "s:1"
    assert inc["n_values"].dtype == "int64"


def test_shacl_values_all_violation_kinds(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.shacl import shacl_validate_values

    rows = [
        ("c1", "rdf:type", "cls:Customer"),
        ("c2", "rdf:type", "cls:Customer"),
        ("c3", "rdf:type", "cls:Customer"),
        ("x1", "rdf:type", "cls:Other"),
        ("c1", "p:seg", "BUILDING"),
        ("c2", "p:seg", "furniture"),      # pattern + (not in set → in)
        ("c3", "p:seg", "MACHINERY"),      # in violation only
        ("x1", "p:seg", "zzz"),            # untargeted → ignored
        ("c1", "p:nation", "n1"),
        ("c2", "p:nation", "n2"),          # untyped → class
        ("c3", "p:nation", "n3"),          # typed wrong class → class
        ("n1", "rdf:type", "cls:Nation"),
        ("n3", "rdf:type", "cls:Region"),
        ("c1", "p:home", "http://ex/1"),
        ("c2", "p:home", "not-a-url"),     # nodeKind
    ]
    ds = rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    ).repartition(3)
    shapes = [
        {"shape_id": "s-pat", "target_class": "cls:Customer",
         "pred": "p:seg", "pattern": "[A-Z]+",
         "in_set": ["BUILDING", "furniture"]},
        {"shape_id": "s-cls", "target_class": "cls:Customer",
         "pred": "p:nation", "value_class": "cls:Nation"},
        {"shape_id": "s-iri", "target_class": "cls:Customer",
         "pred": "p:home", "node_kind_iri": True},
    ]
    out = shacl_validate_values(ds, shapes).to_pandas()
    got = set(zip(out["subj"], out["shape_id"], out["obj"],
                  out["violation"]))
    assert got == {
        ("c2", "s-pat", "furniture", "pattern"),
        ("c3", "s-pat", "MACHINERY", "in"),
        ("c2", "s-cls", "n2", "class"),
        ("c3", "s-cls", "n3", "class"),
        ("c2", "s-iri", "not-a-url", "nodeKind"),
    }


def test_shacl_values_multi_typed_value_satisfies(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.shacl import shacl_validate_values

    rows = [
        ("c1", "rdf:type", "cls:Customer"),
        ("c1", "p:nation", "n1"),
        ("n1", "rdf:type", "cls:Region"),   # extra type must not hurt
        ("n1", "rdf:type", "cls:Nation"),
    ]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["subj", "pred", "obj"]))
    out = shacl_validate_values(
        ds,
        [{"shape_id": "s", "target_class": "cls:Customer",
          "pred": "p:nation", "value_class": "cls:Nation"}],
    ).to_pandas()
    assert len(out) == 0


def test_shacl_values_rejects_constraintless_shape(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.shacl import shacl_validate_values

    ds = rd.from_pandas(pd.DataFrame(
        {"subj": ["a"], "pred": ["p"], "obj": ["b"]}))
    with pytest.raises(ValueError, match="no value constraint"):
        shacl_validate_values(
            ds, [{"shape_id": "s", "target_class": "c", "pred": "p"}]
        )
