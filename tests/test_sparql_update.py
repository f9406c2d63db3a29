"""SPARQL 1.1 Update forms over an immutable store Dataset."""

import pandas as pd
import pytest
import ray.data as rd

from graphforge_ray.query.sparql import run_update

EX = "http://ex.org/"


def _store():
    rows = []
    for s, p, o in [
        (f"{EX}a", f"{EX}knows", f"{EX}b"),
        (f"{EX}b", f"{EX}knows", f"{EX}c"),
        (f"{EX}a", f"{EX}name", "Ann"),
        (f"{EX}b", f"{EX}name", "Bob"),
    ]:
        rows.append({"subj": s, "pred": p, "obj": o,
                     "obj_is_iri": o.startswith("http")})
    return rd.from_pandas(pd.DataFrame(rows)).repartition(2)


def _tset(ds):
    df = ds.to_pandas()
    return set(map(tuple, df[["subj", "pred", "obj"]]
                   .itertuples(index=False)))


def test_insert_data_dedups_and_fills_meta(ray_session):
    q = f"""INSERT DATA {{
        <{EX}a> <{EX}knows> <{EX}b> .
        <{EX}c> <{EX}name> "Cid" .
    }}"""
    out = run_update(_store(), q)
    df = out.to_pandas()
    assert len(df) == 5  # the existing triple did not duplicate
    got = _tset(out)
    assert (f"{EX}c", f"{EX}name", "Cid") in got
    meta = df[df["obj"] == "Cid"]["obj_is_iri"].iloc[0]
    assert meta == False  # noqa: E712 — synthesized P3 rule
    assert df[df["obj"] == f"{EX}b"]["obj_is_iri"].all()


def test_delete_data_exact_rows(ray_session):
    q = f"DELETE DATA {{ <{EX}a> <{EX}knows> <{EX}b> . }}"
    got = _tset(run_update(_store(), q))
    assert (f"{EX}a", f"{EX}knows", f"{EX}b") not in got
    assert len(got) == 3


def test_delete_where_pattern(ray_session):
    q = f"DELETE WHERE {{ ?s <{EX}knows> ?o }}"
    got = _tset(run_update(_store(), q))
    assert got == {(f"{EX}a", f"{EX}name", "Ann"),
                   (f"{EX}b", f"{EX}name", "Bob")}


def test_delete_insert_where_rename_predicate(ray_session):
    q = f"""DELETE {{ ?s <{EX}knows> ?o }}
            INSERT {{ ?s <{EX}met> ?o }}
            WHERE {{ ?s <{EX}knows> ?o }}"""
    out = run_update(_store(), q)
    got = _tset(out)
    assert (f"{EX}a", f"{EX}met", f"{EX}b") in got
    assert (f"{EX}a", f"{EX}knows", f"{EX}b") not in got
    assert len(got) == 4
    # inserted IRIs keep the P3 metadata rule
    df = out.to_pandas()
    assert df[df["pred"] == f"{EX}met"]["obj_is_iri"].all()


def test_insert_where_with_filter(ray_session):
    q = f"""INSERT {{ ?s <{EX}greeted> "yes" }}
            WHERE {{ ?s <{EX}name> ?n . FILTER(?n = "Ann") }}"""
    got = _tset(run_update(_store(), q))
    assert (f"{EX}a", f"{EX}greeted", "yes") in got
    assert len(got) == 5


def test_update_guards(ray_session):
    ds = _store()
    with pytest.raises(ValueError, match="ground"):
        run_update(ds, f'INSERT DATA {{ ?s <{EX}p> "x" . }}')
    with pytest.raises(ValueError, match="never appear"):
        run_update(
            ds,
            f'DELETE {{ ?zz <{EX}p> "x" }} WHERE {{ ?s <{EX}name> ?n }}')
    with pytest.raises(ValueError, match="unsupported UPDATE"):
        run_update(ds, "CLEAR GRAPH <http://ex.org/g>")
