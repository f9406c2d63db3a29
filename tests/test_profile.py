"""Column profiling (stages/profile) — exact tallies on a toy frame."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphforge_ray.stages.profile import profile_columns


def test_profile_columns_exact(ray_session):
    df = pd.DataFrame(
        {
            "lang": ["en", "en", None, "de", "fr", None],
            "source": ["a", "b", "a", "a", "b", "b"],
            "n": [1, 2, 2, 3, 3, 3],
        }
    )
    out = profile_columns(
        rd.from_pandas(df).repartition(3)
    ).set_index("column")
    assert list(out.index) == ["lang", "n", "source"]
    assert (out["n_rows"] == 6).all()
    assert out.loc["lang", "n_nulls"] == 2
    assert out.loc["lang", "n_distinct"] == 3
    assert out.loc["source", "n_nulls"] == 0
    assert out.loc["source", "n_distinct"] == 2
    assert out.loc["n", "n_distinct"] == 3
    assert str(out["n_distinct"].dtype) == "int64"


def test_profile_columns_subset_and_empty_col(ray_session):
    df = pd.DataFrame({"a": [None, None], "b": ["x", "y"]})
    out = profile_columns(
        rd.from_pandas(df), columns=["a"]
    ).set_index("column")
    assert out.loc["a", "n_distinct"] == 0
    assert out.loc["a", "n_nulls"] == 2


def test_profile_columns_no_columns_raises(ray_session):
    import pandas as pd

    ds = rd.from_pandas(pd.DataFrame({"a": [1]}))
    with pytest.raises(ValueError):
        profile_columns(ds, columns=[])


def test_characteristic_sets_exact(ray_session):
    from graphforge_ray.stages.profile import characteristic_sets

    rows = [
        ("s1", "p:a", "x"), ("s1", "p:b", "y"), ("s1", "p:a", "z"),
        ("s2", "p:b", "x"), ("s2", "p:a", "x"),
        ("s3", "p:a", "x"),
        ("s4", "p:c", "x"), ("s4", "p:a", "x"), ("s4", "p:b", "x"),
    ]
    ds = rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    ).repartition(3)
    out = characteristic_sets(ds).to_pandas()
    got = dict(zip(out["cs"], out["n_subjects"]))
    assert got == {"p:a|p:b": 2, "p:a": 1, "p:a|p:b|p:c": 1}
    assert str(out["n_subjects"].dtype) == "int64"


def test_chunk_documents_windows(ray_session):
    from graphforge_ray.stages.text_analysis import chunk_documents

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c d e f g", "x  y", None],
        }
    )
    out = (
        chunk_documents(
            rd.from_pandas(docs).repartition(2), size=4, stride=2
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d1 = out[out["doc_id"] == 1]
    assert list(d1["chunk_text"]) == [
        "a b c d", "c d e f", "e f g", "g"
    ]
    assert list(d1["n_tokens"]) == [4, 4, 3, 1]
    d2 = out[out["doc_id"] == 2]
    assert list(d2["chunk_text"]) == ["x y"]  # whitespace collapsed
    assert 3 not in set(out["doc_id"])  # null doc emits nothing
    assert str(out["chunk_id"].dtype) == "int64"


def test_chunk_documents_bad_params(ray_session):
    from graphforge_ray.stages.text_analysis import chunk_documents

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError):
        chunk_documents(ds, size=0)


def test_group_distinct_count_exact(ray_session):
    from graphforge_ray.stages.profile import group_distinct_count

    df = pd.DataFrame(
        {
            "t": ["a", "a", "a", "b", "b", "a"],
            "u": [1, 1, 2, 7, None, 3],
        }
    )
    out = (
        group_distinct_count(
            rd.from_pandas(df).repartition(3), "t", "u"
        )
        .to_pandas()
        .set_index("t")["n_distinct"]
    )
    assert out.to_dict() == {"a": 3, "b": 1}  # null excluded


def test_group_mode_with_ties(ray_session):
    from graphforge_ray.stages.profile import group_mode

    df = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 4,
            "v": ["x", "y", "x", "y", None, "q", "p", "q", "p"],
        }
    )
    out = (
        group_mode(rd.from_pandas(df).repartition(3), "g", "v")
        .to_pandas()
        .set_index("g")
    )
    # a: x=2, y=2 tie → 'x' (value asc); b: p=2, q=2 tie → 'p'
    assert out.loc["a", "mode"] == "x" and out.loc["a", "n"] == 2
    assert out.loc["b", "mode"] == "p" and out.loc["b", "n"] == 2


def test_predicate_profile_functionality_quadrants(ray_session):
    # the four functionality combinations, exact counts, multi-block
    import ray.data as rd

    from graphforge_ray.stages.profile import predicate_profile

    rows = [
        # p:one — functional AND inverse-functional (1:1)
        ("s:1", "p:one", "o:1"), ("s:2", "p:one", "o:2"),
        # p:fn — functional only (two subjects share one object)
        ("s:1", "p:fn", "o:x"), ("s:2", "p:fn", "o:x"),
        # p:inv — inverse-functional only (one subject, distinct objects)
        ("s:1", "p:inv", "o:a"), ("s:1", "p:inv", "o:b"),
        # p:many — neither (and a repeated triple counts twice)
        ("s:1", "p:many", "o:m"), ("s:1", "p:many", "o:m"),
        ("s:2", "p:many", "o:m"),
    ]
    ds = rd.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    ).repartition(4)
    got = (
        predicate_profile(ds)
        .to_pandas()
        .sort_values("pred")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        [
            ("p:fn", 2, 2, 1, 1, 2, 1, 0),
            ("p:inv", 2, 1, 2, 2, 1, 0, 1),
            ("p:many", 3, 2, 1, 2, 3, 0, 0),
            ("p:one", 2, 2, 2, 1, 1, 1, 1),
        ],
        columns=["pred", "n_triples", "n_subjects", "n_objects",
                 "max_subj_card", "max_obj_card", "functional",
                 "inverse_functional"],
    )
    for c in exp.columns[1:]:
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
