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
