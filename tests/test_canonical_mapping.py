"""Unit tests for the opt-in variant-merge operators:
build_canonical_mapping (suspects→partners), apply_canonical_mapping,
and forge_triples(variant_merge=True)."""

import pandas as pd
import pytest

from graphforge_ray.iri import normalize_iri
from graphforge_ray.stages.canonicalize import (
    apply_canonical_mapping,
    build_canonical_mapping,
)


def _triples_df():
    rows = [
        # three spellings of one entity; canonical = lexicographic min of
        # the occurring spellings
        ("http://a/E", "p", "https://A/E", True),
        ("http://a/E", "p", "https://a/E/", True),
        ("http://x/other", "q", "http://a/E", True),
        # literal obj — never touched
        ("http://x/other", "q", "https://a/E/", False),
        # unrelated clean IRI — no mapping entry
        ("http://clean/one", "p", "http://clean/two", True),
    ]
    return pd.DataFrame(
        rows, columns=["subj", "pred", "obj", "obj_is_iri"]
    )


def test_normalize_iri_rules():
    assert normalize_iri("HTTPS://Big.Example.COM/Path/") == \
        "http://big.example.com/Path"
    assert normalize_iri("http://x/CaseSensitivePath") == \
        "http://x/CaseSensitivePath"
    assert normalize_iri("no-scheme-string") == "no-scheme-string"


def test_build_and_apply_mapping(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(_triples_df())
    mapping = build_canonical_mapping(ds, columns=["subj", "obj"])
    # all variants map to the min occurring spelling 'http://a/E'
    assert mapping == {
        "https://A/E": "http://a/E",
        "https://a/E/": "http://a/E",
    }
    out = apply_canonical_mapping(ds, mapping).to_pandas()
    iri_objs = set(out[out["obj_is_iri"]]["obj"])
    assert "https://A/E" not in iri_objs and "https://a/E/" not in iri_objs
    assert "http://a/E" in iri_objs
    # literal untouched even though it looks like a variant
    assert "https://a/E/" in set(out[~out["obj_is_iri"]]["obj"])


def test_mapping_empty_for_clean_corpus(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        [("http://a/x", "p", "http://a/y", True)],
        columns=["subj", "pred", "obj", "obj_is_iri"],
    )
    assert build_canonical_mapping(rd.from_pandas(df)) == {}


def test_forge_variant_merge_flag(ray_session):
    import ray.data as rd

    from graphforge_ray.fixtures import gen_pages_table
    from graphforge_ray.pipelines.forge import forge_triples

    pages = rd.from_arrow(gen_pages_table(32))
    merged = forge_triples(pages, variant_merge=True).to_pandas()
    plain = forge_triples(pages).to_pandas()
    key = ["subj", "pred", "obj"]
    # emission-normalization already canonicalizes this corpus, so the
    # variant-merge pass must be a no-op on the triple set
    assert set(map(tuple, merged[key].to_numpy())) == \
        set(map(tuple, plain[key].to_numpy()))


def test_sameas_canonicalize_transitive_chain(ray_session):
    # b—a—c chain: all three collapse to the lexicographic-min member
    # 'a:1'; both SUBJECT and OBJECT positions are rewritten; sameAs
    # assertions are consumed; rewrite-created duplicates collapse
    import ray.data as rd

    from graphforge_ray.stages.canonicalize import sameas_canonicalize

    rows = [
        ("a:1", "owl:sameAs", "c:1"),
        ("b:1", "owl:sameAs", "a:1"),
        ("c:1", "p:city", "x:berlin"),
        ("b:1", "p:city", "x:berlin"),      # duplicate after rewrite
        ("y:2", "p:likes", "b:1"),          # object-position rewrite
        ("z:3", "p:free", "z:4"),           # untouched by any mapping
    ]
    ds = rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    ).repartition(3)
    got = (
        sameas_canonicalize(ds, sameas_pred="owl:sameAs")
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, got[["subj", "pred", "obj"]].to_numpy())) == [
        ("a:1", "p:city", "x:berlin"),
        ("y:2", "p:likes", "a:1"),
        ("z:3", "p:free", "z:4"),
    ]


def test_sameas_canonicalize_no_sameas_passthrough(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.canonicalize import sameas_canonicalize

    df = pd.DataFrame(
        {
            "subj": ["s:1", "s:2"],
            "pred": ["p:a", "p:b"],
            "obj": ["o:1", "o:2"],
        }
    )
    got = (
        sameas_canonicalize(rd.from_pandas(df), sameas_pred="owl:sameAs")
        .to_pandas()
        .sort_values("subj")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["subj", "pred", "obj"]], df)
