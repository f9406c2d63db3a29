"""Query-layer conformance tests — the reference's three canned queries
(SPARQL.html test harness) re-expressed against the triples Dataset, plus
BGP/limit/top-k (FIXTURES.md §4)."""

import numpy as np
import pandas as pd
import pytest

from graphforge_ray.query import (
    bgp,
    count_by,
    limit,
    match_pattern,
    optional_join,
    property_path_closure,
    top_k,
)

EX = "http://ex.org/"


@pytest.fixture(scope="module")
def triples_ds(ray_session):
    import ray.data as rd

    rows = []

    def t(s, p, o):
        rows.append(
            {"subj": s, "pred": p, "obj": o, "obj_is_iri": o.startswith("http"),
             "obj_lang": "", "obj_datatype": "", "graph": "", "src_url": "u"}
        )

    # small class hierarchy: a -> B -> C -> D (subClassOf), typed instances
    t(f"{EX}a", "rdf:type", f"{EX}B")
    t(f"{EX}B", "rdfs:subClassOf", f"{EX}C")
    t(f"{EX}C", "rdfs:subClassOf", f"{EX}D")
    t(f"{EX}a", f"{EX}name", "Ann")
    t(f"{EX}b", "rdf:type", f"{EX}B")
    t(f"{EX}b", f"{EX}optionalProp", "opt-b")
    t(f"{EX}c", "rdf:type", f"{EX}C")
    return rd.from_pandas(pd.DataFrame(rows))


def test_match_pattern_constants_and_vars(triples_ds):
    out = match_pattern(triples_ds, "?s", "rdf:type", f"{EX}B").to_pandas()
    assert sorted(out["s"]) == [f"{EX}a", f"{EX}b"]
    assert list(out.columns) == ["s"]


def test_default_query_spo_limit(triples_ds):
    # reference default: SELECT ?s ?p ?o WHERE {?s ?p ?o} LIMIT 50
    out = limit(match_pattern(triples_ds, "?s", "?p", "?o"), 50).to_pandas()
    assert len(out) == 7
    assert set(out.columns) == {"s", "p", "o"}


def test_bgp_join(triples_ds):
    # instances of B with their names
    out = bgp(
        triples_ds,
        [("?s", "rdf:type", f"{EX}B"), ("?s", f"{EX}name", "?n")],
        num_partitions=2,
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["s"] == f"{EX}a"
    assert out.iloc[0]["n"] == "Ann"


def test_optional_left_join(triples_ds):
    # testOptionalQuery (SPARQL.html:241-254): all typed subjects, optional
    # optionalProp; subjects without it keep a null binding
    req = match_pattern(triples_ds, "?s", "rdf:type", "?t")
    opt = match_pattern(triples_ds, "?s", f"{EX}optionalProp", "?v")
    out = optional_join(req, opt, on=["s"], num_partitions=2).to_pandas()
    assert len(out) == 3
    vals = dict(zip(out["s"], out["v"]))
    assert vals[f"{EX}b"] == "opt-b"
    assert pd.isna(vals[f"{EX}a"])


def test_property_path_closure(triples_ds):
    # testPropertyPathQuery (SPARQL.html:256-267): (rdf:type|rdfs:subClassOf)*
    clo = property_path_closure(triples_ds, ["rdf:type", "rdfs:subClassOf"])
    pairs = set(zip(clo["s"], clo["o"]))
    assert (f"{EX}a", f"{EX}B") in pairs        # direct
    assert (f"{EX}a", f"{EX}D") in pairs        # transitive x3
    assert (f"{EX}B", f"{EX}D") in pairs        # transitive x2
    assert (f"{EX}a", f"{EX}a") in pairs        # reflexive (star)


def test_count_by_predicate(triples_ds):
    # testAggregationQuery (SPARQL.html:269-283)
    b = match_pattern(triples_ds, "?s", "?p", "?o")
    out = count_by(b, "p").to_pandas().set_index("p")["count"]
    assert out["rdf:type"] == 3
    assert out["rdfs:subClassOf"] == 2
    assert out[f"{EX}name"] == 1


def test_top_k(triples_ds):
    b = match_pattern(triples_ds, "?s", "?p", "?o")
    out = top_k(count_by(b, "p"), by="count", k=2).to_pandas()
    assert list(out["count"]) == [3, 2]
    assert out.iloc[0]["p"] == "rdf:type"


def test_transitive_closure_distributed_parity(ray_session):
    """Distributed path-doubling closure == driver semi-naïve closure on
    the part-hierarchy shape."""
    import ray.data as rd

    from graphforge_ray.query.ops import (
        transitive_closure,
        transitive_closure_distributed,
    )

    edges = pd.DataFrame({"s": np.arange(2, 500), "o": np.arange(2, 500) // 2})
    exp = transitive_closure(edges, max_iterations=64)
    got = (
        transitive_closure_distributed(rd.from_pandas(edges))
        .to_pandas()
        .sort_values(["s", "o"])
        .reset_index(drop=True)
    )
    assert got.equals(exp[["s", "o"]].reset_index(drop=True))
    # reflexive variant
    got_r = transitive_closure_distributed(
        rd.from_pandas(pd.DataFrame({"s": [1], "o": [2]})),
        include_reflexive=True,
    ).to_pandas()
    assert set(map(tuple, got_r[["s", "o"]].values.tolist())) == {
        (1, 1), (1, 2), (2, 2)
    }


def test_transitive_closure_distributed_million_edges(ray_session):
    """≥10⁶ synthetic edges complete WITHOUT a driver-side edge frame
    (VERDICT r1 item 5 done-criterion). Forest: parent(i) = i // 32,
    depth ≈ 4 → closure ≈ 3M pairs, all Dataset-resident."""
    import ray.data as rd

    N = 1_000_000

    def gen(batch):
        ids = np.asarray(batch["id"]) + 32
        return pd.DataFrame({"s": ids, "o": ids // 32})

    from graphforge_ray.query.ops import transitive_closure_distributed

    edges = rd.range(N, override_num_blocks=32).map_batches(
        gen, batch_format="numpy"
    )
    closure = transitive_closure_distributed(edges.materialize())
    assert closure.count() == 2_966_272  # edges + depth-2/3 ancestor pairs
    anc = closure.filter(expr=f"s == {N + 31}").to_pandas()
    assert sorted(anc["o"]) == [30, 976, 31250]


# ---------------------------------------------------------------------------
# shuffle.bindings_join: the robust bindings-frame join (round 3)
# ---------------------------------------------------------------------------


@pytest.fixture()
def join_sides(ray_session):
    import ray.data as rd

    left = rd.from_pandas(
        pd.DataFrame({"k": ["a", "b", "c", "c"], "lv": ["1", "2", "3", "4"]})
    ).repartition(3)
    right = rd.from_pandas(
        pd.DataFrame({"k": ["b", "c", "d"], "rv": ["x", "y", "z"]})
    ).repartition(2)
    return left, right


def test_bindings_join_inner(join_sides):
    from graphforge_ray.shuffle import bindings_join

    left, right = join_sides
    out = bindings_join(left, right, on=["k"]).to_pandas()
    got = sorted(zip(out["k"], out["lv"], out["rv"]))
    assert got == [("b", "2", "x"), ("c", "3", "y"), ("c", "4", "y")]


def test_bindings_join_left_outer(join_sides):
    from graphforge_ray.shuffle import bindings_join

    left, right = join_sides
    out = bindings_join(left, right, on=["k"], how="left_outer").to_pandas()
    assert len(out) == 4
    a_row = out.loc[out["k"] == "a"].iloc[0]
    assert pd.isna(a_row["rv"])


def test_bindings_join_semi_anti(join_sides):
    from graphforge_ray.shuffle import bindings_join

    left, right = join_sides
    semi = bindings_join(left, right, on=["k"], how="semi").to_pandas()
    assert list(semi.columns) == ["k", "lv"]  # left columns only
    assert sorted(semi["k"]) == ["b", "c", "c"]
    anti = bindings_join(left, right, on=["k"], how="anti").to_pandas()
    assert sorted(anti["k"]) == ["a"]


def test_bindings_join_full_outer(join_sides):
    from graphforge_ray.shuffle import bindings_join

    left, right = join_sides
    out = bindings_join(
        left, right, on=["k"], how="full_outer"
    ).to_pandas()
    # a: left-only, d: right-only, b/c: matched (c twice)
    assert len(out) == 5
    assert sorted(out["k"]) == ["a", "b", "c", "c", "d"]
    d_row = out.loc[out["k"] == "d"].iloc[0]
    assert pd.isna(d_row["lv"]) and d_row["rv"] == "z"
    a_row = out.loc[out["k"] == "a"].iloc[0]
    assert a_row["lv"] == "1" and pd.isna(a_row["rv"])


def test_bindings_join_rejects_unknown_how(join_sides):
    from graphforge_ray.shuffle import bindings_join

    left, right = join_sides
    with pytest.raises(ValueError, match="unsupported join how"):
        bindings_join(left, right, on=["k"], how="right_outer")


def test_bindings_join_overlapping_nonkey_rejected(join_sides):
    from graphforge_ray.shuffle import bindings_join

    left, _ = join_sides
    with pytest.raises(ValueError, match="non-key"):
        bindings_join(left, left, on=["k"])


def test_bindings_join_survives_stale_empty_blocks(ray_session):
    """The acero-killer scenario: a filtered map_batches leaves an empty
    block that SKIPPED the UDF and kept the pre-transform schema.
    Dataset.join dies with 'No match for FieldRef'; bindings_join must
    not (CLAUDE.md measured lesson)."""
    import ray.data as rd

    from graphforge_ray.shuffle import bindings_join

    base = rd.from_pandas(
        pd.DataFrame({"subj": ["s1", "s2"], "pred": ["p", "q"],
                      "obj": ["o1", "o2"]})
    ).repartition(4)  # several empty blocks

    def project(df):
        df = df[df["pred"] == "p"]
        return df.rename(columns={"subj": "k"})[["k"]].assign(side="L")

    left = base.map_batches(project, batch_format="pandas")
    right = rd.from_pandas(pd.DataFrame({"k": ["s1"], "rv": ["hit"]}))
    out = bindings_join(left, right, on=["k"]).to_pandas()
    assert sorted(out.columns) == ["k", "rv", "side"]
    assert list(out["k"]) == ["s1"]
