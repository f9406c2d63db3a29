"""SPARQL front-end tests: prepare_query regex parity + SELECT compiler
against the reference's conformance queries."""

import pandas as pd
import pytest

from graphforge_ray.query.sparql import compile_select, prepare_query, run_select

EX = "http://ex.org/"


def test_prepare_query_a_rule():
    # 'a' before CURIE/IRI → rdf:type (document.js:931); bare 'a' kept
    q = prepare_query("SELECT ?s WHERE { ?s a ex:Thing . ?s ex:letter 'a' }")
    assert "rdf:type ex:Thing" in q
    assert "'a'" in q


def test_prepare_query_iri_wrapping_and_prefixes():
    q = prepare_query(
        "PREFIX ex: <http://ex.org/>\n"
        "SELECT ?s WHERE { ?s ex:p http://ex.org/x }",
        prefixes={"g": "http://g.org/"},
    )
    assert "<http://ex.org/x>" in q
    # user PREFIX re-attached first, global prefix injected
    assert q.splitlines()[0] == "PREFIX ex: <http://ex.org/>"
    assert "PREFIX g: <http://g.org/>" in q


def test_prepare_query_keeps_bracketed_iris():
    q = prepare_query("SELECT ?s WHERE { ?s ?p <http://ex.org/x> }")
    assert "<<" not in q


@pytest.fixture(scope="module")
def triples_ds(ray_session):
    import ray.data as rd

    rows = []

    def t(s, p, o):
        rows.append(
            {"subj": s, "pred": p, "obj": o, "obj_is_iri": o.startswith("http"),
             "obj_lang": "", "obj_datatype": "", "graph": "", "src_url": "u"}
        )

    t(f"{EX}a", "rdf:type", f"{EX}B")
    t(f"{EX}b", "rdf:type", f"{EX}B")
    t(f"{EX}B", "rdfs:subClassOf", f"{EX}C")
    t(f"{EX}a", f"{EX}name", "Ann")
    t(f"{EX}b", f"{EX}optionalProp", "opt-b")
    return rd.from_pandas(pd.DataFrame(rows))


def test_select_spo_limit(triples_ds):
    out = run_select(triples_ds, "SELECT ?s ?p ?o WHERE { ?s ?p ?o } LIMIT 3")
    assert len(out) == 3
    assert list(out.columns) == ["s", "p", "o"]


def test_select_constant_pattern_with_a(triples_ds):
    out = run_select(
        triples_ds,
        "PREFIX ex: <http://ex.org/>\nSELECT ?s WHERE { ?s a ex:B }",
    )
    assert sorted(out["s"]) == [f"{EX}a", f"{EX}b"]


def test_select_bgp_join(triples_ds):
    out = run_select(
        triples_ds,
        "PREFIX ex: <http://ex.org/>\n"
        "SELECT ?s ?n WHERE { ?s a ex:B . ?s ex:name ?n }",
    )
    assert len(out) == 1 and out.iloc[0]["n"] == "Ann"


def test_select_optional(triples_ds):
    out = run_select(
        triples_ds,
        "PREFIX ex: <http://ex.org/>\n"
        "SELECT ?s ?v WHERE { ?s a ex:B . OPTIONAL { ?s ex:optionalProp ?v } }",
    )
    vals = dict(zip(out["s"], out["v"]))
    assert vals[f"{EX}b"] == "opt-b" and pd.isna(vals[f"{EX}a"])


def test_strfn_filter_drops_unbound_optional(triples_ds):
    # astype(str) turns unbound NaN into the literal 'nan'; SPARQL
    # semantics: a string function over an unbound var is a type error
    # and the row DROPS — for both plain and negated forms (r3 ADVICE:
    # CONTAINS(?v, "na") spuriously matched unbound rows)
    base = (
        "PREFIX ex: <http://ex.org/>\n"
        "SELECT ?s ?v WHERE { ?s a ex:B . "
        "OPTIONAL { ?s ex:optionalProp ?v } %s }"
    )
    out = run_select(triples_ds, base % 'FILTER(CONTAINS(?v, "na"))')
    assert len(out) == 0  # 'nan' must not match; only b binds ?v='opt-b'
    out = run_select(triples_ds, base % 'FILTER(CONTAINS(?v, "opt"))')
    assert list(out["s"]) == [f"{EX}b"]
    # negated form: unbound is an error, not "not containing"
    out = run_select(triples_ds, base % 'FILTER(!CONTAINS(?v, "zzz"))')
    assert list(out["s"]) == [f"{EX}b"]


def test_select_group_count(triples_ds):
    out = run_select(
        triples_ds,
        "SELECT (COUNT(?o) AS ?count) ?p WHERE { ?s ?p ?o } GROUP BY ?p",
    )
    counts = dict(zip(out["p"], out["count"]))
    assert counts["rdf:type"] == 2


def test_select_property_path(triples_ds):
    out = run_select(
        triples_ds,
        "SELECT ?s ?o WHERE { ?s (rdf:type|rdfs:subClassOf)* ?o }",
    )
    pairs = set(zip(out["s"], out["o"]))
    assert (f"{EX}a", f"{EX}C") in pairs   # transitive through B
    assert (f"{EX}a", f"{EX}a") in pairs   # reflexive star


# -- r2 extensions: FILTER / ORDER BY / path-joined-with-BGP / prefixes -----

@pytest.fixture(scope="module")
def score_triples(ray_session):
    import ray.data as rd

    rows = [
        ("e/A", "e/childOf", "e/B"), ("e/B", "e/childOf", "e/C"),
        ("e/A", "e/name", "alpha"), ("e/B", "e/name", "beta"),
        ("e/C", "e/name", "gamma"),
        ("e/A", "e/score", "10"), ("e/B", "e/score", "25"),
        ("e/C", "e/score", "7"), ("e/D", "e/score", "not-a-number"),
    ]
    return rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    )


def test_filter_numeric_coercion_drops_unparseable(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?v WHERE { ?s <e/score> ?v . FILTER (?v > 8) }",
    )
    assert sorted(out["s"]) == ["e/A", "e/B"]  # e/D row-skipped (P13)


def test_filter_string_equality(score_triples):
    out = run_select(
        score_triples,
        'SELECT ?s WHERE { ?s <e/name> ?n . FILTER (?n = "beta") }',
    )
    assert list(out["s"]) == ["e/B"]


def test_filter_var_var(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?n ?v WHERE { ?s <e/name> ?n . ?s <e/score> ?v . "
        "FILTER (?n != ?v) }",
    )
    assert len(out) == 3  # every bound pair differs


def test_order_by_numeric_value_not_lexical(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?v WHERE { ?s <e/score> ?v } ORDER BY DESC(?v) LIMIT 2",
    )
    assert out.values.tolist() == [["e/B", "25"], ["e/A", "10"]]
    asc = run_select(
        score_triples,
        "SELECT ?s ?v WHERE { ?s <e/score> ?v } ORDER BY ?v",
    )
    # numerics by value first, non-numeric strings last
    assert list(asc["v"]) == ["7", "10", "25", "not-a-number"]


def test_path_pattern_joined_with_bgp(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?a ?n WHERE { ?a (<e/childOf>)* ?b . ?b <e/name> ?n . "
        'FILTER (?n = "gamma") }',
    )
    assert sorted(map(tuple, out.values.tolist())) == [
        ("e/A", "gamma"), ("e/B", "gamma"), ("e/C", "gamma"),
    ]


def test_order_by_count_alias(score_triples):
    out = run_select(
        score_triples,
        "SELECT (COUNT(?o) AS ?c) ?p WHERE { ?s ?p ?o } GROUP BY ?p "
        "ORDER BY DESC(?c) ?p",
    )
    assert list(out["c"]) == [4, 3, 2]


def test_corpus_prefixes_reach_queries(ray_session):
    """A prefix declared ONLY inside a source document is usable at query
    time (reference document.js:706-715/:940-942)."""
    import ray.data as rd

    from graphforge_ray.fixtures import gen_pages_table
    from graphforge_ray.pipelines.forge import (
        collect_prefixes,
        extract_and_link,
        forge_triples,
    )

    pages = rd.from_arrow(gen_pages_table(16))
    pfx = collect_prefixes(extract_and_link(pages))
    assert pfx["ex"] == "http://graft.example/ont/"
    assert "rdfs" in pfx
    tri = forge_triples(pages)
    out = run_select(
        tri, "SELECT ?s ?o WHERE { ?s ex:contains ?o }", prefixes=pfx
    )
    assert len(out) > 0
    assert out["s"].str.startswith("http://graft.example/ont/order").all()


def test_union_groups(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { { ?s <e/childOf> ?o } UNION { ?s <e/name> ?o } }",
    )
    # childOf: A,B ; name: A,B,C → duplicates kept without DISTINCT
    assert sorted(out["s"]) == ["e/A", "e/A", "e/B", "e/B", "e/C"]


def test_union_distinct(score_triples):
    out = run_select(
        score_triples,
        "SELECT DISTINCT ?s WHERE { { ?s <e/childOf> ?o } UNION "
        "{ ?s <e/name> ?o } }",
    )
    assert sorted(out["s"]) == ["e/A", "e/B", "e/C"]


def test_distinct_applies_to_projection(score_triples):
    out = run_select(score_triples, "SELECT DISTINCT ?s WHERE { ?s ?p ?o }")
    assert sorted(out["s"]) == ["e/A", "e/B", "e/C", "e/D"]


def test_union_mismatched_vars_leaves_unbound(score_triples):
    # branches binding DIFFERENT variables union with the missing ones
    # unbound (NaN) — SPARQL union semantics (was an engine restriction)
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { { ?s <e/childOf> ?o } UNION { ?x <e/name> ?n } }",
    )
    assert len(out) == 5  # 2 childOf rows bind ?s, 3 name rows leave it
    assert sorted(out["s"].dropna()) == ["e/A", "e/B"]
    assert out["s"].isna().sum() == 3


def test_optional_inside_union_branch(score_triples):
    # branch-scoped OPTIONAL: the left join applies INSIDE its branch
    out = run_select(
        score_triples,
        "SELECT ?s ?n WHERE { "
        "{ ?s <e/childOf> ?y . OPTIONAL { ?s <e/name> ?n } } UNION "
        "{ ?s <e/score> ?v . OPTIONAL { ?s <e/name> ?n } } }",
    )
    got = sorted(zip(out["s"], out["n"].fillna("NULL")))
    # childOf branch: A→alpha, B→beta; score branch: A, B, C named, D not
    assert ("e/D", "NULL") in got
    assert ("e/A", "alpha") in got and ("e/B", "beta") in got


def test_pure_path_distinct_and_count(score_triples):
    """r2 review finding: pure property-path queries must flow through
    DISTINCT / COUNT / GROUP BY like any other bindings."""
    out = run_select(
        score_triples, "SELECT DISTINCT ?o WHERE { ?s (<e/childOf>)* ?o }"
    )
    assert sorted(out["o"]) == ["e/A", "e/B", "e/C"]
    cnt = run_select(
        score_triples,
        "SELECT (COUNT(?o) AS ?n) ?o WHERE { ?s (<e/childOf>)* ?o } "
        "GROUP BY ?o",
    )
    got = dict(zip(cnt["o"], cnt["n"]))
    assert got == {"e/A": 1, "e/B": 2, "e/C": 3}


def test_distinct_unbound_var_is_dropped(score_triples):
    out = run_select(
        score_triples, "SELECT DISTINCT ?s ?missing WHERE { ?s ?p ?o }"
    )
    assert list(out.columns) == ["s"]


def test_distinct_all_unbound_returns_empty(score_triples):
    out = run_select(
        score_triples, "SELECT DISTINCT ?missing WHERE { ?s ?p ?o }"
    )
    assert len(out) == 0


def test_predicate_list_semicolon(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?n ?v WHERE { ?s <e/name> ?n ; <e/score> ?v . "
        "FILTER (?v > 8) }",
    )
    assert sorted(map(tuple, out.values.tolist())) == [
        ("e/A", "alpha", "10"), ("e/B", "beta", "25"),
    ]


def test_semicolon_inside_iri_and_literal(score_triples):
    """';' inside <IRI> brackets must not split the pattern."""
    import ray.data as rd

    tri = pd.DataFrame(
        [("e/S", "http://ex/q?a=1;b=2", "e/O")],
        columns=["subj", "pred", "obj"],
    )
    out = run_select(
        rd.from_pandas(tri),
        "SELECT ?o WHERE { ?s <http://ex/q?a=1;b=2> ?o }",
    )
    assert list(out["o"]) == ["e/O"]


def test_filter_inside_optional_scopes_to_group(score_triples):
    """A FILTER inside OPTIONAL applies before the left join — subjects
    without a match keep their row with unbound optional vars."""
    out = run_select(
        score_triples,
        "SELECT ?s ?v WHERE { ?s <e/name> ?n . "
        "OPTIONAL { ?s <e/score> ?v . FILTER (?v > 20) } }",
    )
    by_s = out.set_index("s")["v"].to_dict()
    assert by_s["e/B"] == "25"            # passes the group filter
    assert pd.isna(by_s["e/A"])           # filtered out → unbound, row kept
    assert pd.isna(by_s["e/C"])


def test_optional_filter_outer_var_rejected_at_compile(score_triples):
    with pytest.raises(ValueError, match="not bound by the optional"):
        run_select(
            score_triples,
            "SELECT ?s WHERE { ?s <e/name> ?n . "
            "OPTIONAL { ?s <e/score> ?v . FILTER (?v > ?n) } }",
        )


# -- r3 extensions: aggregates beyond COUNT, string filters, union scoping --

def test_aggregates_sum_min_max_avg(score_triples):
    out = run_select(
        score_triples,
        "SELECT (SUM(?v) AS ?total) (MIN(?v) AS ?lo) (MAX(?v) AS ?hi) "
        "(AVG(?v) AS ?mean) (COUNT(?v) AS ?n) "
        "WHERE { ?s <e/score> ?v }",
    )
    row = out.iloc[0]
    # e/D's "not-a-number" row-skips (P13): 10 + 25 + 7
    assert row["total"] == 42.0
    assert row["lo"] == 7.0 and row["hi"] == 25.0
    assert row["mean"] == 14.0
    assert row["n"] == 3


def test_aggregates_group_by_multi_var(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?p ?o (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p ?o",
    )
    got = {(p, o): n for p, o, n in out.values.tolist()}
    assert got[("e/childOf", "e/B")] == 1
    assert got[("e/name", "alpha")] == 1
    assert len(got) == 9  # every (pred, obj) combination is its own group


def test_aggregate_sum_grouped(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?p (SUM(?o) AS ?total) WHERE { ?s ?p ?o } GROUP BY ?p",
    )
    got = dict(zip(out["p"], out["total"]))
    # only e/score has numeric objects; other groups vanish (all rows
    # dropped by coercion)
    assert got == {"e/score": 42.0}


def test_filter_contains_and_strstarts(score_triples):
    out = run_select(
        score_triples,
        'SELECT ?s ?n WHERE { ?s <e/name> ?n . FILTER(CONTAINS(?n, "am")) }',
    )
    assert list(out["s"]) == ["e/C"]  # gamma
    out = run_select(
        score_triples,
        'SELECT ?s WHERE { ?s <e/name> ?n . FILTER(STRSTARTS(?n, "b")) }',
    )
    assert list(out["s"]) == ["e/B"]


def test_filter_regex_and_negation(score_triples):
    out = run_select(
        score_triples,
        'SELECT ?n WHERE { ?s <e/name> ?n . FILTER(REGEX(?n, "^(ALPHA|BETA)$", "i")) }',
    )
    assert sorted(out["n"]) == ["alpha", "beta"]
    out = run_select(
        score_triples,
        'SELECT ?n WHERE { ?s <e/name> ?n . FILTER(!CONTAINS(?n, "a")) }',
    )
    assert len(out) == 0  # every name contains 'a'


def test_filter_inside_union_branch_rejected(score_triples):
    with pytest.raises(ValueError, match="UNION branch"):
        run_select(
            score_triples,
            "SELECT ?s WHERE { { ?s <e/name> ?o . FILTER (?o = \"beta\") } "
            "UNION { ?s <e/childOf> ?o } }",
        )


def test_filter_after_union_applies_to_all_branches(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?o WHERE { { ?s <e/childOf> ?o } UNION "
        '{ ?s <e/name> ?o } FILTER(CONTAINS(?o, "a")) }',
    )
    # childOf objects e/B, e/C have no 'a'; names alpha/beta/gamma all do
    assert sorted(out["o"]) == ["alpha", "beta", "gamma"]


def test_escaped_quote_in_literal_does_not_missplit():
    """A backslash-escaped quote inside a literal must not end the string
    for the '.'/';' statement splitter (it previously toggled in_str on
    EVERY '"' and mis-split the rest of the body)."""
    from graphforge_ray.query.sparql import _split_outside

    body = '?s ?p "a\\"; b. c" . ?s ?q ?o'
    parts = [p.strip() for p in _split_outside(body, ".")]
    assert parts == ['?s ?p "a\\"; b. c"', "?s ?q ?o"]
    assert _split_outside(body, ";")[0] == body  # ';' is inside the literal


# ---------------------------------------------------------------------------
# VALUES / BIND / COUNT DISTINCT / ASK / CONSTRUCT (round 3)
# ---------------------------------------------------------------------------


def test_values_single_var_restricts_bindings(score_triples):
    out = run_select(
        score_triples,
        'SELECT ?s ?n WHERE { ?s <e/name> ?n . VALUES ?n { "alpha" "gamma" } }',
    )
    assert sorted(out["s"]) == ["e/A", "e/C"]


def test_values_multi_var_rows(score_triples):
    # two-column VALUES joined on ?n: only matching (n, tag) rows survive
    out = run_select(
        score_triples,
        "SELECT ?s ?n ?tag WHERE { ?s <e/name> ?n . "
        'VALUES (?n ?tag) { ("alpha" "t1") ("beta" "t2") } }',
    )
    got = sorted(zip(out["s"], out["tag"]))
    assert got == [("e/A", "t1"), ("e/B", "t2")]


def test_values_disjoint_cross_product(score_triples):
    out = run_select(
        score_triples,
        'SELECT ?s ?x WHERE { ?s <e/name> ?n . VALUES ?x { "u" "v" } '
        'FILTER (?n = "beta") }',
    )
    assert sorted(out["x"]) == ["u", "v"]
    assert set(out["s"]) == {"e/B"}


def test_values_duplicate_rows_multiply(score_triples):
    # SPARQL join is multiset: a duplicated VALUES row duplicates matches
    out = run_select(
        score_triples,
        'SELECT ?s WHERE { ?s <e/name> ?n . VALUES ?n { "beta" "beta" } }',
    )
    assert list(out["s"]) == ["e/B", "e/B"]


def test_values_undef_rejected(score_triples):
    with pytest.raises(ValueError, match="UNDEF"):
        compile_select(
            "SELECT ?s WHERE { ?s <e/name> ?n . VALUES ?n { UNDEF } }"
        )


def test_bind_strlen_and_filter(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?n ?ln WHERE { ?s <e/name> ?n . "
        "BIND(STRLEN(?n) AS ?ln) . FILTER (?ln = 5) }",
    )
    assert sorted(out["n"]) == ["alpha", "gamma"]
    assert set(out["ln"]) == {5}


def test_bind_arithmetic_and_concat(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?double ?label WHERE { ?s <e/score> ?v . "
        "BIND(?v * 2 AS ?double) . "
        'BIND(CONCAT(?s, "#", ?v) AS ?label) . FILTER (?v > 8) }',
    )
    by_s = dict(zip(out["s"], out["double"]))
    assert by_s == {"e/A": 20.0, "e/B": 50.0}
    assert set(out["label"]) >= {"e/A#10", "e/B#25"}


def test_bind_parenthesized_left_assoc(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?r WHERE { ?s <e/score> ?v . "
        'BIND((?v + 1) * 2 AS ?r) . FILTER (?s = "e/C") }',
    )
    assert list(out["r"]) == [16.0]


def test_bind_ucase_lcase(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?n ?u WHERE { ?s <e/name> ?n . BIND(UCASE(?n) AS ?u) "
        'FILTER (?n = "beta") }',
    )
    assert list(out["u"]) == ["BETA"]


def test_count_distinct_grouped(score_triples):
    # graph where predicates repeat per subject: count distinct objects
    out = run_select(
        score_triples,
        "SELECT ?p (COUNT(DISTINCT ?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p",
    )
    got = dict(zip(out["p"], out["n"]))
    assert got["e/childOf"] == 2          # e/B, e/C
    assert got["e/name"] == 3
    assert got["e/score"] == 4


def test_count_distinct_global(score_triples):
    out = run_select(
        score_triples,
        "SELECT (COUNT(DISTINCT ?p) AS ?n) WHERE { ?s ?p ?o }",
    )
    assert list(out.columns) == ["n"]
    assert list(out["n"]) == [3]


def test_count_distinct_mixed_rejected(score_triples):
    with pytest.raises(ValueError, match="combined"):
        run_select(
            score_triples,
            "SELECT ?p (COUNT(DISTINCT ?o) AS ?n) (COUNT(?o) AS ?m) "
            "WHERE { ?s ?p ?o } GROUP BY ?p",
        )


def test_distinct_inside_sum_rejected(score_triples):
    with pytest.raises(ValueError, match="only supported inside COUNT"):
        compile_select(
            "SELECT (SUM(DISTINCT ?o) AS ?n) WHERE { ?s ?p ?o }"
        )


def test_ask_true_false(score_triples):
    from graphforge_ray.query.sparql import run_ask

    assert run_ask(
        score_triples, 'ASK { ?s <e/name> ?n . FILTER (?n = "beta") }'
    )
    assert not run_ask(
        score_triples, 'ASK { ?s <e/name> ?n . FILTER (?n = "omega") }'
    )


def test_construct_basic_dedup(score_triples):
    from graphforge_ray.query.sparql import run_construct

    out = (
        run_construct(
            score_triples,
            "CONSTRUCT { ?s <e/knows> ?o . ?s <e/tagged> <e/Node> } "
            "WHERE { ?s <e/childOf> ?o }",
        )
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["subj", "pred", "obj"]
    got = set(map(tuple, out.values))
    assert got == {
        ("e/A", "e/knows", "e/B"),
        ("e/B", "e/knows", "e/C"),
        ("e/A", "e/tagged", "e/Node"),
        ("e/B", "e/tagged", "e/Node"),
    }


def test_construct_is_a_set(score_triples):
    # two WHERE matches instantiate the SAME constant triple → one row
    from graphforge_ray.query.sparql import run_construct

    out = run_construct(
        score_triples,
        "CONSTRUCT { <e/G> <e/hasChild> <e/yes> } WHERE { ?s <e/childOf> ?o }",
    ).to_pandas()
    assert len(out) == 1


def test_construct_template_var_not_in_where_rejected(score_triples):
    from graphforge_ray.query.sparql import run_construct

    with pytest.raises(ValueError, match="never appear"):
        run_construct(
            score_triples,
            "CONSTRUCT { ?s <e/p> ?missing } WHERE { ?s <e/childOf> ?o }",
        )


# ---------------------------------------------------------------------------
# Property-path grammar: alternation / plus / sequence / inverse (round 3)
# ---------------------------------------------------------------------------


def test_alt_path_is_single_hop(score_triples):
    # (p1|p2) = ONE hop over either predicate — NOT a closure
    out = run_select(
        score_triples,
        "SELECT ?s ?o WHERE { ?s (<e/childOf>|<e/name>) ?o }",
    )
    got = set(zip(out["s"], out["o"]))
    assert ("e/A", "e/B") in got and ("e/A", "alpha") in got
    assert ("e/A", "e/C") not in got  # two-hop pair must NOT appear


def test_plus_path_excludes_reflexive(score_triples):
    out = run_select(
        score_triples,
        'SELECT ?o WHERE { ?s (<e/childOf>)+ ?o . FILTER (?s = "e/A") }',
    )
    assert sorted(out["o"]) == ["e/B", "e/C"]  # no e/A (reflexive)


def test_bare_iri_star_and_plus(score_triples):
    star = run_select(
        score_triples,
        'SELECT ?o WHERE { ?s <e/childOf>* ?o . FILTER (?s = "e/A") }',
    )
    assert sorted(star["o"]) == ["e/A", "e/B", "e/C"]
    plus = run_select(
        score_triples,
        'SELECT ?o WHERE { ?s <e/childOf>+ ?o . FILTER (?s = "e/A") }',
    )
    assert sorted(plus["o"]) == ["e/B", "e/C"]


def test_sequence_path(score_triples):
    # ?s childOf/name ?n : parent's name one hop away
    out = run_select(
        score_triples,
        "SELECT ?s ?n WHERE { ?s <e/childOf>/<e/name> ?n }",
    )
    assert sorted(zip(out["s"], out["n"])) == [
        ("e/A", "beta"), ("e/B", "gamma"),
    ]


def test_sequence_with_closure_segment(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?n WHERE { ?s (<e/childOf>)+/<e/name> ?n . "
        'FILTER (?s = "e/A") }',
    )
    assert sorted(out["n"]) == ["beta", "gamma"]


def test_inverse_path(score_triples):
    out = run_select(
        score_triples, "SELECT ?s ?o WHERE { ?s ^<e/childOf> ?o }"
    )
    # ?s ^childOf ?o  ≡  ?o childOf ?s
    assert sorted(zip(out["s"], out["o"])) == [
        ("e/B", "e/A"), ("e/C", "e/B"),
    ]


def test_sequence_iri_slash_not_split(score_triples):
    # '/' INSIDE an IRI is not a sequence separator
    out = run_select(
        score_triples, 'SELECT ?s WHERE { ?s <e/name> ?n . FILTER (?n = "beta") }'
    )
    assert list(out["s"]) == ["e/B"]


# ---------------------------------------------------------------------------
# Negation: FILTER [NOT] EXISTS / MINUS (round 3)
# ---------------------------------------------------------------------------


def test_filter_not_exists_anti_join(score_triples):
    # subjects with a name but NO outgoing childOf edge
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/name> ?n . "
        "FILTER NOT EXISTS { ?s <e/childOf> ?y } }",
    )
    assert sorted(out["s"]) == ["e/C"]


def test_filter_exists_semi_join(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/name> ?n . "
        "FILTER EXISTS { ?s <e/childOf> ?y } }",
    )
    assert sorted(out["s"]) == ["e/A", "e/B"]


def test_minus_shared_vars(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/name> ?n . MINUS { ?s <e/childOf> ?y } }",
    )
    assert sorted(out["s"]) == ["e/C"]


def test_minus_disjoint_is_noop(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/name> ?n . MINUS { ?a <e/childOf> ?b } }",
    )
    assert sorted(out["s"]) == ["e/A", "e/B", "e/C"]


def test_exists_disjoint_rejected(score_triples):
    with pytest.raises(ValueError, match="shares no variable"):
        run_select(
            score_triples,
            "SELECT ?s WHERE { ?s <e/name> ?n . "
            "FILTER EXISTS { ?a <e/childOf> ?b } }",
        )


def test_exists_with_union_rejected(score_triples):
    with pytest.raises(ValueError, match="inside a UNION branch"):
        compile_select(
            "SELECT ?s WHERE { { ?s <e/name> ?n . "
            "FILTER EXISTS { ?s <e/childOf> ?y } } UNION "
            "{ ?s <e/score> ?v } }"
        )


def test_having_filters_aggregate_rows(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } "
        "GROUP BY ?p HAVING (?n > 2)",
    )
    got = dict(zip(out["p"], out["n"]))
    assert got == {"e/name": 3, "e/score": 4}  # childOf (2) filtered out


def test_having_with_sum_and_order(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?p (SUM(?o) AS ?t) WHERE { ?s ?p ?o } "
        "GROUP BY ?p HAVING (?t > 20) ORDER BY DESC(?t)",
    )
    # only e/score rows parse as numbers: 10+25+7 = 42
    assert list(out["p"]) == ["e/score"]
    assert list(out["t"]) == [42.0]


def test_group_concat_with_separator(score_triples):
    out = run_select(
        score_triples,
        'SELECT ?s (GROUP_CONCAT(?o; SEPARATOR=",") AS ?objs) '
        "WHERE { ?s <e/childOf> ?o } GROUP BY ?s",
    )
    got = dict(zip(out["s"], out["objs"]))
    assert got == {"e/A": "e/B", "e/B": "e/C"}


def test_group_concat_sorted_deterministic(score_triples):
    out = run_select(
        score_triples,
        'SELECT ?p (GROUP_CONCAT(?s; SEPARATOR="|") AS ?subs) '
        "WHERE { ?s ?p ?o } GROUP BY ?p",
    )
    got = dict(zip(out["p"], out["subs"]))
    assert got["e/name"] == "e/A|e/B|e/C"  # sorted within group


def test_sample_is_deterministic_min(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?p (SAMPLE(?s) AS ?one) WHERE { ?s ?p ?o } GROUP BY ?p",
    )
    got = dict(zip(out["p"], out["one"]))
    assert got == {"e/childOf": "e/A", "e/name": "e/A", "e/score": "e/A"}


def test_group_concat_mixed_rejected(score_triples):
    with pytest.raises(ValueError, match="GROUP_CONCAT/SAMPLE"):
        run_select(
            score_triples,
            'SELECT ?p (GROUP_CONCAT(?s) AS ?a) (COUNT(?s) AS ?b) '
            "WHERE { ?s ?p ?o } GROUP BY ?p",
        )


def test_offset_with_order_and_limit(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?v WHERE { ?s <e/score> ?v } "
        "ORDER BY DESC(?v) LIMIT 2 OFFSET 1",
    )
    assert out.values.tolist() == [["e/A", "10"], ["e/C", "7"]]


def test_offset_without_limit(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?v WHERE { ?s <e/score> ?v } ORDER BY ?v OFFSET 3",
    )
    assert list(out["s"]) == ["e/D"]  # non-numeric sorts last


def test_group_concat_single_quoted_separator(score_triples):
    # SEPARATOR='…' (single quotes) is legal SPARQL and must parse as an
    # aggregate — previously it silently fell through to a plain SELECT
    q = compile_select(
        "SELECT ?s (GROUP_CONCAT(?o; SEPARATOR=';') AS ?objs) "
        "WHERE { ?s <e/childOf> ?o } GROUP BY ?s"
    )
    assert q.aggregates == [("GROUP_CONCAT", "o", "objs")]
    assert q.agg_params == {"objs": ";"}
    out = run_select(
        score_triples,
        "SELECT ?p (GROUP_CONCAT(?s; SEPARATOR=';') AS ?subs) "
        "WHERE { ?s ?p ?o } GROUP BY ?p",
    )
    got = dict(zip(out["p"], out["subs"]))
    assert got["e/name"] == "e/A;e/B;e/C"


def test_group_concat_skips_unbound_optional(score_triples):
    # rows where the OPTIONAL leaves ?c unbound carry NaN in the
    # bindings frame; they must be dropped, not serialized as 'nan'
    out = run_select(
        score_triples,
        "SELECT ?s (GROUP_CONCAT(?c) AS ?kids) WHERE "
        "{ ?s <e/name> ?n OPTIONAL { ?s <e/childOf> ?c } } GROUP BY ?s",
    )
    got = dict(zip(out["s"], out["kids"]))
    assert got == {"e/A": "e/B", "e/B": "e/C", "e/C": ""}


def test_sample_skips_unbound_optional(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s (SAMPLE(?c) AS ?one) WHERE "
        "{ ?s <e/name> ?n OPTIONAL { ?s <e/childOf> ?c } } GROUP BY ?s",
    )
    got = dict(zip(out["s"], out["one"]))
    assert got["e/A"] == "e/B" and got["e/B"] == "e/C"
    assert got["e/C"] is None or got["e/C"] != got["e/C"]  # unbound


def test_modifier_keywords_inside_string_literals_ignored(score_triples):
    # 'OFFSET 1' / 'LIMIT 2' inside a FILTER string literal are data,
    # not solution modifiers (tail-only modifier parsing)
    q = compile_select(
        'SELECT ?s WHERE { ?s <e/name> ?n '
        'FILTER(!CONTAINS(?n, "OFFSET 1")) }'
    )
    assert q.offset == 0 and q.limit is None
    out = run_select(
        score_triples,
        'SELECT ?s WHERE { ?s <e/name> ?n '
        'FILTER(!CONTAINS(?n, "LIMIT 2")) }',
    )
    assert len(out) == 3  # nothing dropped


def test_select_star_projects_all_bound_vars(score_triples):
    out = run_select(
        score_triples, "SELECT * WHERE { ?s <e/name> ?n }"
    )
    assert sorted(out.columns) == ["n", "s"]
    assert len(out) == 3


def test_filter_bound_and_not_bound(score_triples):
    # BOUND after an OPTIONAL: keep rows where the left join matched
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/name> ?n "
        "OPTIONAL { ?s <e/childOf> ?c } FILTER(BOUND(?c)) }",
    )
    assert sorted(out["s"]) == ["e/A", "e/B"]
    # !BOUND = the classic left-anti-join idiom
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/name> ?n "
        "OPTIONAL { ?s <e/childOf> ?c } FILTER(!BOUND(?c)) }",
    )
    assert list(out["s"]) == ["e/C"]


def test_filter_strlen(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?n WHERE { ?s <e/name> ?n FILTER(STRLEN(?n) >= 5) }",
    )
    assert sorted(out["n"]) == ["alpha", "gamma"]
    out = run_select(
        score_triples,
        "SELECT ?n WHERE { ?s <e/name> ?n FILTER(STRLEN(?n) = 4) }",
    )
    assert list(out["n"]) == ["beta"]


def test_filter_in_and_not_in(score_triples):
    out = run_select(
        score_triples,
        'SELECT ?s WHERE { ?s <e/name> ?n FILTER(?n IN ("alpha", "beta")) }',
    )
    assert sorted(out["s"]) == ["e/A", "e/B"]
    out = run_select(
        score_triples,
        'SELECT ?s WHERE { ?s <e/name> ?n '
        'FILTER(?n NOT IN ("alpha", "beta")) }',
    )
    assert list(out["s"]) == ["e/C"]
    # IRI terms resolve through _term like any pattern term
    out = run_select(
        score_triples,
        "SELECT ?n WHERE { ?s <e/name> ?n FILTER(?s IN (<e/C>)) }",
    )
    assert list(out["n"]) == ["gamma"]


def test_filter_bound_unknown_variable_raises(score_triples):
    with pytest.raises(ValueError, match="unbound"):
        run_select(
            score_triples,
            "SELECT ?s WHERE { ?s <e/name> ?n FILTER(BOUND(?zzz)) }",
        )


# ---------------------------------------------------------------------------
# '{ SELECT … }' subqueries
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def kin_triples(ray_session):
    import ray.data as rd

    rows = [
        ("e/A", "e/childOf", "e/B"), ("e/A", "e/childOf", "e/C"),
        ("e/B", "e/childOf", "e/C"), ("e/D", "e/childOf", "e/C"),
        ("e/A", "e/name", "alpha"), ("e/B", "e/name", "beta"),
        ("e/C", "e/name", "gamma"), ("e/D", "e/name", "delta"),
    ]
    return rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    )


def test_subselect_aggregate_joins_outer(kin_triples):
    # children per parent: C has 3 (A, B, D), B has 1 (A); the outer
    # pattern attaches the parent's name; the outer FILTER sees the
    # subselect's aggregate alias
    out = run_select(
        kin_triples,
        "SELECT ?nm ?n WHERE { "
        "{ SELECT ?p (COUNT(?c) AS ?n) WHERE { ?c <e/childOf> ?p } "
        "GROUP BY ?p } "
        "?p <e/name> ?nm FILTER(?n >= 2) }",
    )
    assert len(out) == 1
    assert out.iloc[0]["nm"] == "gamma" and int(out.iloc[0]["n"]) == 3


def test_subselect_projection_scoping(kin_triples):
    # ?c is NOT projected by the subselect — it must not leak into (or
    # constrain) the outer group, which binds its own ?c via e/name
    out = run_select(
        kin_triples,
        "SELECT ?p ?c WHERE { "
        "{ SELECT ?p WHERE { ?c <e/childOf> ?p } } "
        "?p <e/name> ?c }",
    )
    # subselect keeps duplicates (no DISTINCT): C appears 3x, B once
    assert sorted(out["c"]) == ["beta", "gamma", "gamma", "gamma"]


def test_subselect_limit_order(kin_triples):
    # top-1 parent by child count via subselect ORDER BY/LIMIT
    out = run_select(
        kin_triples,
        "SELECT ?nm WHERE { "
        "{ SELECT ?p (COUNT(?c) AS ?n) WHERE { ?c <e/childOf> ?p } "
        "GROUP BY ?p ORDER BY DESC(?n) LIMIT 1 } "
        "?p <e/name> ?nm }",
    )
    assert list(out["nm"]) == ["gamma"]


def test_subselect_only_body(kin_triples):
    out = run_select(
        kin_triples,
        "SELECT ?p ?n WHERE { "
        "{ SELECT ?p (COUNT(?c) AS ?n) WHERE { ?c <e/childOf> ?p } "
        "GROUP BY ?p } } ORDER BY ?p",
    )
    assert list(out["p"]) == ["e/B", "e/C"]
    assert [int(x) for x in out["n"]] == [1, 3]


def test_subselect_disjoint_cross_product(kin_triples):
    out = run_select(
        kin_triples,
        "SELECT ?nm ?total WHERE { "
        "{ SELECT (COUNT(?c) AS ?total) WHERE { ?c <e/childOf> ?p } } "
        "?x <e/name> ?nm }",
    )
    assert len(out) == 4  # 4 names × 1 aggregate row
    assert set(int(t) for t in out["total"]) == {4}


def test_subselect_inside_union_raises(kin_triples):
    with pytest.raises(ValueError, match="UNION"):
        run_select(
            kin_triples,
            "SELECT ?p WHERE { { ?p <e/name> ?nm } UNION "
            "{ { SELECT ?p WHERE { ?c <e/childOf> ?p } } } }",
        )


def test_filter_general_arithmetic_expression(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/score> ?v FILTER(?v * 2 > 18) }",
    )
    assert sorted(out["s"]) == ["e/A", "e/B"]  # 10*2, 25*2; 7*2=14 drops
    # unparseable values row-drop (P13): e/D 'not-a-number' never matches
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/score> ?v FILTER(?v - 7 >= 0) }",
    )
    assert sorted(out["s"]) == ["e/A", "e/B", "e/C"]


def test_filter_general_string_function_equality(score_triples):
    out = run_select(
        score_triples,
        'SELECT ?s WHERE { ?s <e/name> ?n FILTER(UCASE(?n) = "BETA") }',
    )
    assert list(out["s"]) == ["e/B"]
    out = run_select(
        score_triples,
        'SELECT ?s WHERE { ?s <e/name> ?n '
        'FILTER(CONCAT(?n, "!") != "alpha!") }',
    )
    assert sorted(out["s"]) == ["e/B", "e/C"]


def test_filter_general_two_sided_expression(score_triples):
    # expression on BOTH sides of the comparison
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/score> ?v "
        "FILTER(?v + 5 < ?v * 2) }",  # v > 5
    )
    assert sorted(out["s"]) == ["e/A", "e/B", "e/C"]


def test_filter_general_unbound_variable_raises(score_triples):
    with pytest.raises(ValueError, match="unbound"):
        run_select(
            score_triples,
            "SELECT ?s WHERE { ?s <e/score> ?v FILTER(?zz + 1 > 0) }",
        )


def test_filter_general_no_comparison_raises(score_triples):
    with pytest.raises(ValueError, match="comparison"):
        run_select(
            score_triples,
            "SELECT ?s WHERE { ?s <e/score> ?v FILTER(BOUND(?v) && ?v) }",
        )


def test_filter_boolean_connectives(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/score> ?v "
        "FILTER(?v > 8 && ?v < 20) }",
    )
    assert list(out["s"]) == ["e/A"]  # 10 only (25 fails <20, 7 fails >8)
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/score> ?v "
        "FILTER(?v < 8 || ?v > 20) }",
    )
    assert sorted(out["s"]) == ["e/B", "e/C"]  # 25 and 7
    # three-way OR with an expression side
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/score> ?v "
        "FILTER(?v = 7 || ?v = 10 || ?v + 0 = 25) }",
    )
    assert sorted(out["s"]) == ["e/A", "e/B", "e/C"]


def test_filter_mixed_connectives_raise(score_triples):
    with pytest.raises(ValueError, match="mixed"):
        run_select(
            score_triples,
            "SELECT ?s WHERE { ?s <e/score> ?v "
            "FILTER(?v > 1 && ?v < 9 || ?v = 25) }",
        )


def test_optional_scoped_expression_filter(score_triples):
    # expr FILTER inside OPTIONAL scopes to the optional group (applied
    # BEFORE the left join): non-matching rows stay, with ?v unbound
    out = run_select(
        score_triples,
        "SELECT ?s ?v WHERE { ?s <e/name> ?n "
        "OPTIONAL { ?s <e/score> ?v FILTER(?v * 1 > 8) } }",
    ).set_index("s")
    assert out.loc["e/A", "v"] == "10"
    assert out.loc["e/B", "v"] == "25"
    assert pd.isna(out.loc["e/C", "v"])  # 7 filtered pre-join → unbound
    # referencing an outer variable inside the OPTIONAL filter raises
    with pytest.raises(ValueError, match="not bound by the optional"):
        run_select(
            score_triples,
            "SELECT ?s WHERE { ?s <e/name> ?n "
            "OPTIONAL { ?s <e/score> ?v FILTER(?v > 1 && ?n = \"x\") } }",
        )


# -- r4 extensions: nested OPTIONAL / paths in OPTIONAL / zero-or-one /
# negated sets / LANG-DATATYPE / GRAPH / collect=False --------------------


def test_zero_or_one_path(score_triples):
    out = run_select(
        score_triples, "SELECT ?s ?o WHERE { ?s <e/childOf>? ?o }"
    )
    pairs = set(zip(out["s"], out["o"]))
    # reflexive over nodes incident to childOf edges + the single hops
    assert pairs == {
        ("e/A", "e/A"), ("e/B", "e/B"), ("e/C", "e/C"),
        ("e/A", "e/B"), ("e/B", "e/C"),
    }


def test_zero_or_one_path_with_constant(score_triples):
    out = run_select(
        score_triples, 'SELECT ?o WHERE { ?s <e/childOf>? ?o . '
        'FILTER(?s = "e/B") }'
    )
    assert sorted(out["o"]) == ["e/B", "e/C"]


def test_negated_property_set(score_triples):
    out = run_select(
        score_triples, "SELECT ?s ?o WHERE { ?s !(<e/childOf>) ?o }"
    )
    # everything except the 2 childOf edges: 4 names + 4 scores? no —
    # 3 names + 4 scores = 7 rows
    assert len(out) == 7
    assert "e/B" not in set(
        out.loc[out["s"] == "e/A", "o"]
    )  # A's childOf edge excluded


def test_negated_property_set_bare(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?o WHERE { ?s !<e/name> ?o . ?s <e/name> ?n }",
    )
    # joined with a BGP pattern: childOf + score rows of named nodes
    got = set(zip(out["s"], out["o"]))
    assert ("e/A", "e/B") in got and ("e/A", "10") in got
    assert ("e/A", "alpha") not in got


def test_neg_inverse_path(score_triples):
    # r5: !(^p) — REVERSE hop over any predicate not in the inverse set
    out = run_select(
        score_triples, "SELECT ?s ?o WHERE { ?s !(^<e/childOf>) ?o }"
    )
    got = set(zip(out["s"], out["o"]))
    # reverse of the 3 name + 4 score triples; childOf reversals excluded
    assert len(out) == 7
    assert ("alpha", "e/A") in got and ("10", "e/A") in got
    assert ("e/B", "e/A") not in got  # ^childOf member excluded


def test_neg_inverse_bare(score_triples):
    out = run_select(
        score_triples, "SELECT ?s ?o WHERE { ?s !^<e/childOf> ?o }"
    )
    assert len(out) == 7


def test_neg_mixed_property_set(score_triples):
    # !(name|^childOf): forward hop (pred ∉ {name}: 2 childOf + 4
    # score) ∪ reverse hop (pred ∉ {childOf}: 3 name + 4 score)
    out = run_select(
        score_triples,
        "SELECT ?s ?o WHERE { ?s !(<e/name>|^<e/childOf>) ?o }",
    )
    assert len(out) == 13
    got = set(zip(out["s"], out["o"]))
    assert ("e/A", "e/B") in got          # forward childOf hop kept
    assert ("alpha", "e/A") in got        # reverse name hop kept
    assert ("e/A", "alpha") not in got    # forward name excluded


def test_neg_path_compiles_to_pairs():
    from graphforge_ray.query.sparql import PathExpr, _term

    p = _term("!(^<e/p>)", {}, allow_path=True)
    assert isinstance(p, PathExpr) and p.op == "neg"
    assert p.preds == [("e/p", True)]
    p = _term("!^<e/p>", {}, allow_path=True)
    assert p.preds == [("e/p", True)]
    p = _term("!(<e/a>|^<e/b>)", {}, allow_path=True)
    assert p.preds == [("e/a", False), ("e/b", True)]
    p = _term("!<e/a>", {}, allow_path=True)
    assert p.preds == [("e/a", False)]


def test_nested_optional(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?c ?cn WHERE { ?s <e/name> ?n . "
        "OPTIONAL { ?s <e/childOf> ?c . OPTIONAL { ?c <e/name> ?cn } } }",
    ).set_index("s")
    assert out.loc["e/A", "c"] == "e/B" and out.loc["e/A", "cn"] == "beta"
    assert out.loc["e/B", "c"] == "e/C" and out.loc["e/B", "cn"] == "gamma"
    assert pd.isna(out.loc["e/C", "c"]) and pd.isna(out.loc["e/C", "cn"])


def test_optional_with_path_pattern(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?a WHERE { ?s <e/name> ?n . "
        "OPTIONAL { ?s <e/childOf>+ ?a } }",
    )
    got = {(s, a if isinstance(a, str) else None)
           for s, a in zip(out["s"], out["a"])}
    assert got == {
        ("e/A", "e/B"), ("e/A", "e/C"), ("e/B", "e/C"), ("e/C", None),
    }


def test_optional_scoped_constructs_refused(score_triples):
    for inner in (
        'VALUES ?v { "x" }',
        'BIND(1 AS ?z)',
        "FILTER EXISTS { ?s <e/score> ?w }",
        "MINUS { ?s <e/score> ?w }",
    ):
        with pytest.raises(ValueError, match="inside an OPTIONAL"):
            run_select(
                score_triples,
                "SELECT ?s WHERE { ?s <e/name> ?n . "
                "OPTIONAL { ?s <e/childOf> ?c . " + inner + " } }",
            )


@pytest.fixture(scope="module")
def lang_triples(ray_session):
    import ray.data as rd

    rows = [
        # (subj, pred, obj, is_iri, lang, datatype)
        ("e/a", "e/label", "cat", False, "en", ""),
        ("e/b", "e/label", "chat", False, "fr", ""),
        ("e/c", "e/label", "gato", False, "es", ""),
        ("e/d", "e/label", "plain", False, "", ""),
        ("e/e", "e/label", "e/thing", True, "", ""),   # IRI object
        ("e/a", "e/size", "5", False, "",
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("e/b", "e/size", "seven", False, "", ""),
    ]
    return rd.from_pandas(
        pd.DataFrame(
            rows,
            columns=["subj", "pred", "obj", "obj_is_iri", "obj_lang",
                     "obj_datatype"],
        ).assign(graph="")
    )


def test_lang_filter(lang_triples):
    out = run_select(
        lang_triples,
        'SELECT ?s ?v WHERE { ?s <e/label> ?v . FILTER(LANG(?v) = "en") }',
    )
    assert list(out["s"]) == ["e/a"] and list(out["v"]) == ["cat"]
    # != drops the matching lang AND the IRI row (type error), keeps
    # the untagged literal (LANG = "")
    out = run_select(
        lang_triples,
        'SELECT ?s WHERE { ?s <e/label> ?v . FILTER(LANG(?v) != "en") }',
    )
    assert sorted(out["s"]) == ["e/b", "e/c", "e/d"]


def test_lang_filter_over_alt_path(lang_triples):
    # r5: LANG() metadata rides through single-hop path forms — the
    # alternation binds ?v at object position with real metadata
    out = run_select(
        lang_triples,
        "SELECT ?s ?v WHERE { ?s (<e/label>|<e/size>) ?v . "
        'FILTER(LANG(?v) = "en") }',
    )
    assert list(out["s"]) == ["e/a"] and list(out["v"]) == ["cat"]


def test_datatype_filter_over_neg_path(lang_triples):
    # !(nope) matches every hop; DATATYPE filter keeps the integer one
    out = run_select(
        lang_triples,
        "SELECT ?s ?v WHERE { ?s !(<e/nope>) ?v . "
        "FILTER(DATATYPE(?v) = <http://www.w3.org/2001/XMLSchema#integer>)"
        " }",
    )
    assert list(out["s"]) == ["e/a"] and list(out["v"]) == ["5"]


def test_lang_filter_over_closure_path_refused(lang_triples):
    with pytest.raises(ValueError, match="closure-path-bound"):
        run_select(
            lang_triples,
            "SELECT ?s ?v WHERE { ?s <e/label>+ ?v . "
            'FILTER(LANG(?v) = "en") }',
        )


def test_datatype_filter(lang_triples):
    out = run_select(
        lang_triples,
        "SELECT ?s ?v WHERE { ?s <e/size> ?v . "
        "FILTER(DATATYPE(?v) = <http://www.w3.org/2001/XMLSchema#integer>)"
        " }",
    )
    assert list(out["s"]) == ["e/a"]
    # untyped literal defaults to xsd:string; lang-tagged → langString
    out = run_select(
        lang_triples,
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "SELECT ?s WHERE { ?s <e/label> ?v . "
        "FILTER(DATATYPE(?v) = xsd:string) }",
    )
    assert sorted(out["s"]) == ["e/d"]
    out = run_select(
        lang_triples,
        "SELECT ?s WHERE { ?s <e/label> ?v . FILTER(DATATYPE(?v) = "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>) }",
    )
    assert sorted(out["s"]) == ["e/a", "e/b", "e/c"]


def test_lang_filter_requires_metadata(score_triples):
    with pytest.raises(Exception, match="metadata"):
        run_select(
            score_triples,
            'SELECT ?s WHERE { ?s <e/name> ?v . FILTER(LANG(?v) = "en") }',
        )


def test_meta_columns_not_leaked(lang_triples):
    out = run_select(
        lang_triples,
        'SELECT * WHERE { ?s <e/label> ?v . FILTER(LANG(?v) = "en") }',
    )
    assert sorted(out.columns) == ["s", "v"]


@pytest.fixture(scope="module")
def quad_triples(ray_session):
    import ray.data as rd

    rows = [
        ("e/a", "e/p", "1", "g/one"),
        ("e/b", "e/p", "2", "g/one"),
        ("e/a", "e/p", "3", "g/two"),
        ("e/c", "e/q", "4", "g/two"),
        ("e/d", "e/p", "5", ""),      # default graph
    ]
    return rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj", "graph"])
    )


def test_graph_variable_binding(quad_triples):
    out = run_select(
        quad_triples,
        "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s <e/p> ?o } }",
    )
    got = set(zip(out["g"], out["s"], out["o"]))
    # GRAPH ?g ranges over NAMED graphs only (SPARQL semantics): the
    # default-graph row (graph="") must NOT appear
    assert got == {("g/one", "e/a", "1"), ("g/one", "e/b", "2"),
                   ("g/two", "e/a", "3")}


def test_graph_constant(quad_triples):
    out = run_select(
        quad_triples,
        "SELECT ?s ?o WHERE { GRAPH <g/one> { ?s <e/p> ?o } }",
    )
    assert set(zip(out["s"], out["o"])) == {("e/a", "1"), ("e/b", "2")}


def test_graph_joined_with_outer_pattern(quad_triples):
    out = run_select(
        quad_triples,
        "SELECT ?s ?o ?x WHERE { GRAPH <g/two> { ?s ?p ?x } . "
        "?s <e/p> ?o . FILTER(?o = \"1\") }",
    )
    assert set(zip(out["s"], out["o"], out["x"])) == {("e/a", "1", "3")}


def test_graph_group_filter_inside(quad_triples):
    # r5: FILTER composes inside GRAPH { } (scoped to the group)
    out = run_select(
        quad_triples,
        'SELECT ?g ?s WHERE { GRAPH ?g { ?s <e/p> ?o . '
        'FILTER(?o = "1") } }',
    )
    assert set(zip(out["g"], out["s"])) == {("g/one", "e/a")}


def test_graph_group_filter_inside_const(quad_triples):
    out = run_select(
        quad_triples,
        'SELECT ?s WHERE { GRAPH <g/two> { ?s <e/p> ?o . '
        "FILTER(?o > 2) } }",
    )
    assert set(out["s"]) == {"e/a"}


def test_graph_group_optional_inside(quad_triples):
    # OPTIONAL inside GRAPH evaluates in the SAME graph scope: e/a has
    # an e/q companion only in g/two via e/c? No — give g/one's e/a no
    # q-triple and g/two's subject a q-triple through pattern sharing.
    out = run_select(
        quad_triples,
        "SELECT ?g ?s ?o ?q WHERE { GRAPH ?g { ?s <e/p> ?o . "
        "OPTIONAL { ?c <e/q> ?q } } }",
    )
    # the OPTIONAL group shares only the graph var ?g: in g/two every
    # e/p row pairs with the q-value 4; in g/one ?q stays unbound
    rows = set(
        (g, s, o, None if pd.isna(q) else q)
        for g, s, o, q in zip(out["g"], out["s"], out["o"], out["q"])
    )
    assert rows == {
        ("g/one", "e/a", "1", None),
        ("g/one", "e/b", "2", None),
        ("g/two", "e/a", "3", "4"),
    }


def test_graph_group_minus_inside_var(quad_triples):
    # r5: MINUS inside GRAPH ?g — per-graph anti-join (the graph var is
    # itself a shared column): e/a has an e/p row in BOTH graphs but a
    # q-companion in neither; e/c's e/q row lives in g/two, so a minus
    # on ?s <e/q> ?x removes nothing here (no shared subject) …
    out = run_select(
        quad_triples,
        "SELECT ?g ?s WHERE { GRAPH ?g { ?s <e/p> ?o . "
        "MINUS { ?s <e/q> ?x } } }",
    )
    assert set(zip(out["g"], out["s"])) == {
        ("g/one", "e/a"), ("g/one", "e/b"), ("g/two", "e/a")
    }


def test_graph_group_minus_scoped_to_graph(quad_edges):
    # subjects linking to n/c: n/b in g/one, n/a in g/two. The minus
    # removes per (graph, subject): g/one keeps n/a→n/b (the n/a→n/c
    # edge is g/two-only — graph scoping), g/two keeps nothing, the
    # default-graph row never appears under GRAPH ?g.
    out = run_select(
        quad_edges,
        "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s <e/link> ?o . "
        "MINUS { ?s <e/link> \"n/c\" } } }",
    )
    got = set(zip(out["g"], out["s"], out["o"]))
    assert got == {("g/one", "n/a", "n/b")}


def test_graph_group_minus_const(quad_triples):
    out = run_select(
        quad_triples,
        "SELECT ?s WHERE { GRAPH <g/two> { ?s ?p ?o . "
        "MINUS { ?s <e/q> ?x } } }",
    )
    assert set(out["s"]) == {"e/a"}


def test_graph_group_minus_in_optional_refused(quad_triples):
    with pytest.raises(ValueError, match="MINUS inside an OPTIONAL"):
        run_select(
            quad_triples,
            "SELECT ?s WHERE { GRAPH ?g { ?s <e/p> ?o . "
            "OPTIONAL { ?s <e/q> ?x . MINUS { ?s <e/p> ?y } } } }",
        )


def test_graph_group_minus_nested_group_refused(quad_triples):
    # the global cross-scope guard fires first (OPTIONAL inside MINUS);
    # the graph-group parse's own body guard is the backstop
    with pytest.raises(ValueError, match="MINUS"):
        run_select(
            quad_triples,
            "SELECT ?s WHERE { GRAPH ?g { ?s <e/p> ?o . "
            "MINUS { ?s <e/q> ?x . OPTIONAL { ?s <e/p> ?y } } } }",
        )


def test_graph_group_refuses_bind_values(quad_triples):
    for frag in ('BIND("x" AS ?b)', 'VALUES ?o { "1" }'):
        with pytest.raises(ValueError, match="GRAPH"):
            run_select(
                quad_triples,
                "SELECT ?s WHERE { GRAPH ?g { ?s <e/p> ?o . "
                f"{frag} }} }}",
            )


@pytest.fixture(scope="module")
def quad_edges(ray_session):
    import ray.data as rd

    rows = [
        ("n/a", "e/link", "n/b", "g/one"),
        ("n/b", "e/link", "n/c", "g/one"),
        ("n/a", "e/link", "n/c", "g/two"),   # shortcut exists in g/two only
        ("n/x", "e/link", "n/y", ""),        # default graph must not leak
    ]
    return rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj", "graph"])
    )


def test_graph_const_closure_path(quad_edges):
    # r5: (p)+ inside GRAPH <const> — closure computed within the graph
    out = run_select(
        quad_edges,
        "SELECT ?s ?o WHERE { GRAPH <g/one> { ?s <e/link>+ ?o } }",
    )
    assert set(zip(out["s"], out["o"])) == {
        ("n/a", "n/b"), ("n/b", "n/c"), ("n/a", "n/c")
    }


def test_graph_var_closure_path(quad_edges):
    # (p)+ inside GRAPH ?g: per-graph closure, default graph excluded
    out = run_select(
        quad_edges,
        "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s <e/link>+ ?o } }",
    )
    assert set(zip(out["g"], out["s"], out["o"])) == {
        ("g/one", "n/a", "n/b"), ("g/one", "n/b", "n/c"),
        ("g/one", "n/a", "n/c"), ("g/two", "n/a", "n/c"),
    }


def test_graph_var_closure_path_distributed(quad_edges, monkeypatch):
    import graphforge_ray.query.sparql as sq

    monkeypatch.setattr(sq, "PATH_DISTRIBUTED_THRESHOLD", 0)
    out = run_select(
        quad_edges,
        "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s <e/link>+ ?o } }",
    )
    assert set(zip(out["g"], out["s"], out["o"])) == {
        ("g/one", "n/a", "n/b"), ("g/one", "n/b", "n/c"),
        ("g/one", "n/a", "n/c"), ("g/two", "n/a", "n/c"),
    }


def test_graph_var_zero_or_one_path(quad_edges):
    out = run_select(
        quad_edges,
        "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s <e/link>? ?o } }",
    )
    got = set(zip(out["g"], out["s"], out["o"]))
    # hops + reflexive pairs over each graph's incident nodes
    assert got == {
        ("g/one", "n/a", "n/b"), ("g/one", "n/b", "n/c"),
        ("g/one", "n/a", "n/a"), ("g/one", "n/b", "n/b"),
        ("g/one", "n/c", "n/c"),
        ("g/two", "n/a", "n/c"),
        ("g/two", "n/a", "n/a"), ("g/two", "n/c", "n/c"),
    }


def test_graph_const_star_path_joined(quad_edges):
    # (p)* inside constant GRAPH joined with an outer-scope filter var
    out = run_select(
        quad_edges,
        "SELECT ?o WHERE { GRAPH <g/one> { ?s <e/link>* ?o . "
        'FILTER(?s = "n/a") } }',
    )
    assert set(out["o"]) == {"n/a", "n/b", "n/c"}


def test_collect_false_returns_dataset(score_triples):
    import ray.data

    ds = run_select(
        score_triples,
        "SELECT ?s ?o WHERE { ?s <e/childOf>+ ?o }",
        collect=False,
    )
    assert isinstance(ds, ray.data.Dataset)
    got = ds.to_pandas()
    exp = run_select(
        score_triples, "SELECT ?s ?o WHERE { ?s <e/childOf>+ ?o }"
    )
    key = lambda df: sorted(map(tuple, df[["s", "o"]].to_numpy()))
    assert key(got) == key(exp)
    assert list(got.columns) == ["s", "o"]


def test_collect_false_distinct_and_limit(score_triples):
    ds = run_select(
        score_triples,
        "SELECT DISTINCT ?s WHERE { ?s <e/childOf>? ?o } LIMIT 2",
        collect=False,
    )
    assert ds.count() == 2


def test_collect_false_refuses_presentation_paths(score_triples):
    with pytest.raises(ValueError, match="collect"):
        run_select(
            score_triples,
            "SELECT ?s WHERE { ?s <e/name> ?o } LIMIT 5 OFFSET 2",
            collect=False,
        )


def test_collect_false_aggregate_order_by_dataset(score_triples):
    # r5: ORDER BY over the aggregated Dataset — sorted rows match the
    # collect=True frame exactly, LIMIT is the distributed top-k
    import ray.data

    q = ("SELECT ?p (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } "
         "GROUP BY ?p ORDER BY DESC(?n) ?p")
    ds = run_select(score_triples, q, collect=False)
    assert isinstance(ds, ray.data.Dataset)
    got = ds.to_pandas().reset_index(drop=True)
    exp = run_select(score_triples, q)
    pd.testing.assert_frame_equal(got[["p", "n"]], exp[["p", "n"]])
    top = run_select(score_triples, q + " LIMIT 1", collect=False)
    assert top.to_pandas()[["p", "n"]].equals(exp[["p", "n"]].head(1))


def test_collect_false_order_by_sorted_dataset(score_triples):
    # r5: plain ORDER BY returns the FULL sorted Dataset; with LIMIT it
    # is the distributed top-k — row ORDER must match collect=True
    import ray.data

    q = "SELECT ?s ?o WHERE { ?s <e/name> ?o } ORDER BY DESC(?o) ?s"
    ds = run_select(score_triples, q, collect=False)
    assert isinstance(ds, ray.data.Dataset)
    got = ds.to_pandas()
    exp = run_select(score_triples, q)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)

    top = run_select(score_triples, q + " LIMIT 2", collect=False)
    assert top.to_pandas().equals(exp.head(2))


def test_collect_false_group_aggregate_dataset(score_triples):
    # r5: GROUP BY aggregates return the aggregated Dataset — a
    # high-cardinality key result never lands on the driver
    import ray.data

    q = ("SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s")
    ds = run_select(score_triples, q, collect=False)
    assert isinstance(ds, ray.data.Dataset)
    got = ds.to_pandas()
    exp = run_select(score_triples, q)
    assert list(got.columns) == ["s", "n"]
    key = lambda df: sorted(map(tuple, df[["s", "n"]].to_numpy()))
    assert key(got) == key(exp)


def test_collect_false_aggregate_having_and_limit(score_triples):
    import ray.data

    q = ("SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s "
         "HAVING (?n > 1)")
    ds = run_select(score_triples, q, collect=False)
    assert isinstance(ds, ray.data.Dataset)
    got = ds.to_pandas()
    exp = run_select(score_triples, q)
    key = lambda df: sorted(map(tuple, df[["s", "n"]].to_numpy()))
    assert key(got) == key(exp)
    assert len(got) > 0


def test_collect_false_ungrouped_aggregate_one_row(score_triples):
    import ray.data

    ds = run_select(
        score_triples,
        "SELECT (COUNT(?s) AS ?n) WHERE { ?s <e/name> ?o }",
        collect=False,
    )
    assert isinstance(ds, ray.data.Dataset)
    got = ds.to_pandas()
    assert len(got) == 1 and int(got["n"].iloc[0]) == 3


def test_order_by_over_aggregate_alias_compiles_post_grouping(
        score_triples):
    # ADVICE r4 follow-up: the alias expression now compiles into a
    # POST-grouping bind instead of refusing (pre-grouping BIND would
    # see the alias unbound)
    q = compile_select(
        "SELECT ?p (COUNT(?s) AS ?c) WHERE { ?s ?p ?o } "
        "GROUP BY ?p ORDER BY DESC(?c + 1)"
    )
    assert len(q.post_order_binds) == 1
    assert q.order_by and q.order_by[0][1] is True  # descending helper
    # the helper is NOT a pre-grouping BIND
    assert not any(v.startswith("__ord_") for v, _ in q.binds)


def test_lone_question_mark_projection_refused():
    with pytest.raises(ValueError, match="projection"):
        compile_select("SELECT ? WHERE { ?s ?p ?o }")


def test_path_distributed_threshold_same_result(score_triples, monkeypatch):
    # force the Dataset-join closure path (no broadcast frame) and
    # check it binds identically to the small-frame fast path
    import graphforge_ray.query.sparql as sq

    q = ('SELECT ?s ?n WHERE { ?s <e/childOf>* ?o . ?o <e/name> ?n . '
         'FILTER (?o = "e/C") }')
    exp = run_select(score_triples, q)
    monkeypatch.setattr(sq, "PATH_DISTRIBUTED_THRESHOLD", 0)
    got = run_select(score_triples, q)
    key = lambda df: sorted(map(tuple, df.to_numpy()))
    assert key(got) == key(exp)


def test_grouped_sequence_path_closure(score_triples):
    # (childOf/childOf)+ = ancestors at even distance ≥ 2: A→C only
    out = run_select(
        score_triples,
        "SELECT ?s ?o WHERE { ?s (<e/childOf>/<e/childOf>)+ ?o }",
    )
    assert set(zip(out["s"], out["o"])) == {("e/A", "e/C")}


def test_grouped_sequence_path_star(score_triples):
    # (childOf/childOf)* adds reflexive pairs over the 2-hop nodes
    out = run_select(
        score_triples,
        "SELECT ?s ?o WHERE { ?s (<e/childOf>/<e/childOf>)* ?o }",
    )
    assert set(zip(out["s"], out["o"])) == {
        ("e/A", "e/C"), ("e/A", "e/A"), ("e/C", "e/C"),
    }


def test_grouped_inverse_path(score_triples):
    # (^childOf)+ = descendants: inverse edges closed transitively
    out = run_select(
        score_triples,
        "SELECT ?s ?o WHERE { ?s (^<e/childOf>)+ ?o }",
    )
    assert set(zip(out["s"], out["o"])) == {
        ("e/B", "e/A"), ("e/C", "e/B"), ("e/C", "e/A"),
    }


def test_grouped_mixed_alt_seq_path(score_triples):
    # (name|childOf/name)? — zero-or-one over a mixed alternation: a
    # simple pred alternative plus a 2-hop sequence alternative
    out = run_select(
        score_triples,
        "SELECT ?s ?o WHERE { ?s (<e/name>|<e/childOf>/<e/name>)? ?o }",
    )
    got = set(zip(out["s"], out["o"]))
    assert ("e/A", "alpha") in got          # direct name
    assert ("e/A", "beta") in got           # childOf/name
    assert ("e/A", "e/A") in got            # reflexive
    assert ("alpha", "alpha") in got        # object nodes reflexive too


def test_bare_grouped_sequence_without_modifier_raises(score_triples):
    with pytest.raises(ValueError, match="modifier"):
        run_select(
            score_triples,
            "SELECT ?s ?o WHERE { ?s (<e/childOf>/<e/name>) ?o }",
        )


# -- r4 extensions: SUBSTR/STRBEFORE/STRAFTER/REPLACE/COALESCE/IF ----------


def test_bind_substr_is_one_based(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?n ?p WHERE { ?s <e/name> ?n . "
        'BIND(SUBSTR(?n, 2, 3) AS ?p) . FILTER (?n = "gamma") }',
    )
    assert list(out["p"]) == ["amm"]


def test_bind_substr_no_length(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?n ?p WHERE { ?s <e/name> ?n . "
        'BIND(SUBSTR(?n, 3) AS ?p) . FILTER (?n = "beta") }',
    )
    assert list(out["p"]) == ["ta"]


def test_bind_strbefore_strafter(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?b ?a WHERE { ?s <e/name> ?n . "
        'BIND(STRBEFORE(?s, "/") AS ?b) . '
        'BIND(STRAFTER(?s, "/") AS ?a) . FILTER (?n = "alpha") }',
    )
    assert list(out["b"]) == ["e"] and list(out["a"]) == ["A"]


def test_strbefore_no_match_is_empty(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?n ?b WHERE { ?s <e/name> ?n . "
        'BIND(STRBEFORE(?n, "zz") AS ?b) . FILTER (?n = "beta") }',
    )
    assert list(out["b"]) == [""]


def test_bind_replace_with_backref(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?n ?r WHERE { ?s <e/name> ?n . "
        'BIND(REPLACE(?n, "a(l|m)", "<$1>") AS ?r) . '
        'FILTER (?n = "alpha") }',
    )
    assert list(out["r"]) == ["<l>pha"]


def test_bind_if_condition_and_coercion_failure(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?c WHERE { ?s <e/score> ?v . "
        'BIND(IF(?v > 8, "high", "low") AS ?c) }',
    )
    by_s = dict(zip(out["s"], out["c"]))
    # e/D score is 'not-a-number': coercion failure -> else branch
    assert by_s == {
        "e/A": "high", "e/B": "high", "e/C": "low", "e/D": "low",
    }


def test_bind_coalesce_prefers_bound(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s ?label WHERE { ?s <e/score> ?v . "
        "OPTIONAL { ?s <e/name> ?n } "
        'BIND(COALESCE(?n, "anon") AS ?label) }',
    )
    by_s = dict(zip(out["s"], out["label"]))
    assert by_s["e/D"] == "anon" and by_s["e/A"] == "alpha"


def test_filter_with_substr_expression(score_triples):
    out = run_select(
        score_triples,
        "SELECT ?s WHERE { ?s <e/name> ?n . "
        'FILTER (SUBSTR(?n, 1, 1) = "b") }',
    )
    assert list(out["s"]) == ["e/B"]


def test_substr_nonliteral_args_rejected(score_triples):
    # the ValueError is raised inside the Ray task -> RayTaskError wrap
    with pytest.raises(Exception, match="SUBSTR"):
        run_select(
            score_triples,
            "SELECT ?s WHERE { ?s <e/name> ?n . "
            "BIND(SUBSTR(?n, STRLEN(?n)) AS ?x) }",
        )


# -- r4: DESCRIBE ----------------------------------------------------------


def test_describe_constant_iri(score_triples):
    from graphforge_ray.query.sparql import run_describe

    out = run_describe(score_triples, "DESCRIBE <e/B>").to_pandas()
    got = set(zip(out["subj"], out["pred"], out["obj"]))
    assert got == {
        ("e/B", "e/childOf", "e/C"),
        ("e/B", "e/name", "beta"),
        ("e/B", "e/score", "25"),
    }


def test_describe_variable_with_where(score_triples):
    from graphforge_ray.query.sparql import run_describe

    out = run_describe(
        score_triples,
        'DESCRIBE ?x WHERE { ?x <e/name> "alpha" }',
    ).to_pandas()
    assert set(out["subj"]) == {"e/A"}
    assert len(out) == 3  # childOf + name + score


def test_describe_mixed_dedups(score_triples):
    from graphforge_ray.query.sparql import run_describe

    # constant <e/A> and a WHERE that also binds e/A: slice must not
    # duplicate
    out = run_describe(
        score_triples,
        'DESCRIBE <e/A> ?x WHERE { ?x <e/name> "alpha" }',
    ).to_pandas()
    assert len(out) == 3
    assert set(out["subj"]) == {"e/A"}


def test_describe_var_without_where_rejected(score_triples):
    from graphforge_ray.query.sparql import run_describe

    with pytest.raises(ValueError, match="WHERE"):
        run_describe(score_triples, "DESCRIBE ?x")


def test_describe_prefixed_where(score_triples):
    # regression: the synthesized SELECT must carry the query's PREFIX
    # declarations — without them e:name compiled as a constant string
    # and the variable form silently returned empty
    from graphforge_ray.query.sparql import run_describe

    out = run_describe(
        score_triples,
        'PREFIX e: <e/> DESCRIBE ?x WHERE { ?x e:name "alpha" }',
    ).to_pandas()
    assert set(out["subj"]) == {"e/A"}
    assert len(out) == 3


# -- r4: cross-nested scope guard -------------------------------------------


@pytest.mark.parametrize("query", [
    # GRAPH inside OPTIONAL: was silently hoisted to a mandatory
    # top-level join (left-join semantics lost)
    "SELECT * WHERE { ?s <p> ?v . OPTIONAL { ?s <q2> ?w . "
    "GRAPH ?g { ?s <q> ?o } } }",
    # OPTIONAL inside MINUS: the OPTIONAL cut flattened the MINUS body,
    # so the flat MINUS regex matched and the OPTIONAL escaped its scope
    "SELECT * WHERE { ?s <p> ?v . MINUS { ?s <r> ?x . "
    "OPTIONAL { ?x <t> ?y } } }",
    # same hoist through FILTER EXISTS
    "SELECT * WHERE { ?s <p> ?v . FILTER EXISTS { ?s <r> ?x . "
    "OPTIONAL { ?x <t> ?y } } }",
    # GRAPH nested inside a MINUS body (OPTIONAL and MINUS inside GRAPH
    # are scope-correct since r5 and compile)
    "SELECT * WHERE { ?s <p> ?v . MINUS { ?s <q> ?o . "
    "GRAPH ?g { ?s <z> ?w } } }",
])
def test_cross_scope_hoists_refused(query):
    from graphforge_ray.query.sparql import compile_select

    with pytest.raises(ValueError, match="not supported"):
        compile_select(query)


def test_cross_scope_guard_allows_siblings():
    # the same constructs as SIBLINGS (not nested) must still compile
    from graphforge_ray.query.sparql import compile_select

    compile_select(
        "SELECT * WHERE { ?s <p> ?v . MINUS { ?s <r> ?x } . "
        "GRAPH ?g { ?s <q> ?o } . OPTIONAL { ?s <q2> ?w . "
        "OPTIONAL { ?w <t> ?y } } }"
    )


# -- r4: term-test + LANGMATCHES filters -----------------------------------


@pytest.fixture(scope="module")
def termtest_triples(ray_session):
    import ray.data as rd

    rows = [
        # (subj, pred, obj, lang)
        ("http://ex/a", "http://ex/ref", "http://ex/b", ""),
        ("http://ex/a", "http://ex/label", "Anna", "en"),
        ("http://ex/b", "http://ex/label", "Anne", "en-US"),
        ("http://ex/c", "http://ex/label", "Ana", "es"),
        ("http://ex/d", "http://ex/label", "plain", ""),
        ("http://ex/a", "http://ex/ref", "_:blank1", ""),
    ]
    return rd.from_pandas(
        pd.DataFrame(
            rows, columns=["subj", "pred", "obj", "obj_lang"]
        ).assign(obj_is_iri=False, obj_datatype="", graph="")
    )


def test_filter_isiri_and_isliteral(termtest_triples):
    out = run_select(
        termtest_triples,
        "SELECT ?o WHERE { ?s <http://ex/ref> ?o . FILTER(isIRI(?o)) }",
    )
    assert list(out["o"]) == ["http://ex/b"]
    out = run_select(
        termtest_triples,
        "SELECT ?o WHERE { ?s ?p ?o . FILTER(isLiteral(?o)) }",
    )
    assert sorted(out["o"]) == ["Ana", "Anna", "Anne", "plain"]


def test_filter_isblank_and_negation(termtest_triples):
    out = run_select(
        termtest_triples,
        "SELECT ?o WHERE { ?s <http://ex/ref> ?o . FILTER(isBlank(?o)) }",
    )
    assert list(out["o"]) == ["_:blank1"]
    out = run_select(
        termtest_triples,
        "SELECT ?o WHERE { ?s <http://ex/ref> ?o . FILTER(!isBlank(?o)) }",
    )
    assert list(out["o"]) == ["http://ex/b"]


def test_filter_langmatches_primary_subtag(termtest_triples):
    out = run_select(
        termtest_triples,
        "SELECT ?o WHERE { ?s <http://ex/label> ?o . "
        'FILTER(LANGMATCHES(LANG(?o), "en")) }',
    )
    assert sorted(out["o"]) == ["Anna", "Anne"]  # en + en-US
    out = run_select(
        termtest_triples,
        "SELECT ?o WHERE { ?s <http://ex/label> ?o . "
        'FILTER(LANGMATCHES(LANG(?o), "*")) }',
    )
    assert sorted(out["o"]) == ["Ana", "Anna", "Anne"]  # untagged out


# --- SELECT expression / ORDER BY expression rewrite (r4) ------------

def test_select_expression_projection(triples_ds):
    out = run_select(
        triples_ds,
        f"SELECT ?s (STRLEN(?n) AS ?len) (CONCAT(?n, \"!\") AS ?x) "
        f"WHERE {{ ?s <{EX}name> ?n }}",
    )
    assert list(out.columns) == ["s", "len", "x"]
    assert list(out["len"]) == [3] and list(out["x"]) == ["Ann!"]


def test_aggregate_over_expression(triples_ds):
    out = run_select(
        triples_ds,
        "SELECT (SUM(STRLEN(?o)) AS ?t) (COUNT(?o) AS ?c) "
        "WHERE { ?s rdf:type ?o }",
    )
    # two rdf:type objects, both IRIs ending in 'B'
    assert list(out.columns) == ["t", "c"]
    assert out.loc[0, "c"] == 2 and out.loc[0, "t"] > 0


def test_order_by_expression_key(triples_ds):
    out = run_select(
        triples_ds,
        f"SELECT ?s ?n WHERE {{ ?s ?p ?n . "
        f"FILTER(?p = <{EX}name> || ?p = <{EX}optionalProp>) }} "
        "ORDER BY DESC(STRLEN(?n)) ?s",
    )
    # 'opt-b' (5 chars) before 'Ann' (3); helper column not projected
    assert list(out.columns) == ["s", "n"]
    assert list(out["n"]) == ["opt-b", "Ann"]


def test_unsupported_projection_refused_loudly(triples_ds):
    # pre-r4 these were silently dropped (wrong columns); now they must
    # raise, never return a frame with the wrong shape
    with pytest.raises(ValueError, match="projection"):
        compile_select("SELECT (?a + ) WHERE { ?s ?p ?a }")
    with pytest.raises(ValueError, match="DISTINCT over an expression"):
        compile_select(
            "SELECT (SUM(DISTINCT STRLEN(?a)) AS ?t) WHERE { ?s ?p ?a }"
        )


def test_explain_select_renders_plan():
    from graphforge_ray.query.sparql import explain_select

    plan = explain_select(
        "SELECT DISTINCT ?s WHERE { ?s <e/childOf>+ ?a . "
        "?s <e/name> ?o . OPTIONAL { ?s <e/alias> ?al } "
        "FILTER (?o > 3) MINUS { ?s <e/bad> ?x } } "
        "ORDER BY ?s LIMIT 5"
    )
    assert plan.startswith("SELECT DISTINCT s")
    assert "closure loop" in plan
    assert "bindings_join" in plan
    assert "OPTIONAL (left-outer bucket join):" in plan
    assert "MINUS (anti bucket join):" in plan
    assert "vectorized mask" in plan
    assert "distributed top-k" in plan
    # compile-time only: no ray session, no execution — this test runs
    # without the ray_session fixture on purpose


def test_explain_select_aggregate_and_graph():
    from graphforge_ray.query.sparql import explain_select

    plan = explain_select(
        "SELECT ?p (COUNT(?s) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } } "
        "GROUP BY ?p HAVING (?n > 2) ORDER BY DESC(?n)"
    )
    assert "GRAPH ?g" in plan
    assert "distributed groupby().aggregate()" in plan
    assert "post-aggregate filter" in plan
    assert "full Dataset.sort" in plan  # no LIMIT → full sort


def test_order_by_aggregate_alias_expression(triples_ds):
    # DESC(?c * 2) where ?c is an aggregate alias: the expression key
    # evaluates POST-grouping (pre-grouping BIND would see ?c unbound)
    out = run_select(
        triples_ds,
        "SELECT ?p (COUNT(?s) AS ?c) WHERE { ?s ?p ?o } "
        "GROUP BY ?p ORDER BY DESC(?c * 2) ?p",
    )
    assert list(out.columns) == ["p", "c"]
    assert out["c"].tolist() == sorted(out["c"].tolist(), reverse=True)
    assert out["c"].iloc[0] == 2  # rdf:type has two triples

    ds = run_select(
        triples_ds,
        "SELECT ?p (COUNT(?s) AS ?c) WHERE { ?s ?p ?o } "
        "GROUP BY ?p ORDER BY DESC(?c + 1) ?p",
        collect=False,
    )
    df = ds.to_pandas()
    assert list(df.columns) == ["p", "c"]
    assert df["c"].tolist() == out["c"].tolist()
    assert df["p"].tolist() == out["p"].tolist()
