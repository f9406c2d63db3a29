"""Incremental KG maintenance pipeline (pipelines/update): snapshot →
delta → optional RDFS closure → published add/del N-Triples, with
checkpoint-resume semantics."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

import ray
import ray.data as rd

from graphforge_ray.fixtures import write_pages_parquet
from graphforge_ray.pipelines.forge import run_forge_pipeline
from graphforge_ray.pipelines.update import run_update_pipeline


@pytest.fixture(scope="module")
def base_run(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("update")
    pages_v1 = write_pages_parquet(
        str(root / "pages_v1"), 40, rows_per_file=20
    )
    base = str(root / "kg_v1")
    run_forge_pipeline(pages_v1, base, write_nt=False)
    # v2 = one shard shared with v1, one new shard (seeded differently
    # via a different page range)
    pages_v2 = write_pages_parquet(
        str(root / "pages_v2"), 60, rows_per_file=20
    )
    return root, pages_v1, base, pages_v2


def _pq(d):
    import glob

    return sorted(
        glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
    )


def _nt_lines(d):
    out = []
    for dp, _, fs in os.walk(d):
        for f in fs:
            if f.endswith(".nt"):
                out.extend(
                    open(os.path.join(dp, f)).read().splitlines()
                )
    return set(out)


def test_update_delta_matches_canonical_sets(base_run):
    root, pages_v1, base, pages_v2 = base_run
    out = str(root / "kg_v2")
    runner = run_update_pipeline(pages_v2, base, out)

    m = json.load(open(os.path.join(out, "delta", "MANIFEST.json")))
    assert m["status"] == "done"

    TERM = ["subj", "pred", "obj", "obj_is_iri", "obj_lang",
            "obj_datatype", "graph"]

    def norm(df):
        for c in ("obj_lang", "obj_datatype", "graph"):
            df[c] = df[c].fillna("")
        df["obj_is_iri"] = df["obj_is_iri"].astype(bool)
        return df[TERM]

    old = norm(rd.read_parquet(_pq(os.path.join(base, "canonical"))).to_pandas())
    new = norm(
        rd.read_parquet(
            _pq(os.path.join(out, "snapshot", "canonical"))
        ).to_pandas()
    )
    old_s = set(map(tuple, old.to_numpy()))
    new_s = set(map(tuple, new.to_numpy()))

    d = rd.read_parquet(_pq(os.path.join(out, "delta"))).to_pandas()
    d["obj_is_iri"] = d["obj_is_iri"].astype(bool)
    adds = set(map(tuple, d[d["op"] == "add"][TERM].to_numpy()))
    dels = set(map(tuple, d[d["op"] == "del"][TERM].to_numpy()))
    assert adds == new_s - old_s
    assert dels == old_s - new_s
    assert m["extra"]["adds"] == len(adds)
    assert m["extra"]["dels"] == len(dels)
    # 60-page snapshot strictly extends the 40-page one → real adds
    assert len(adds) > 0

    # published N-Triples reflect the delta (subject IRIs of every add)
    pub_adds = _nt_lines(os.path.join(out, "publish", "adds"))
    assert len(pub_adds) == len(adds)


def test_update_is_checkpoint_resumable(base_run):
    root, pages_v1, base, pages_v2 = base_run
    out = str(root / "kg_v2")  # same dir as previous test — all done
    runner = run_update_pipeline(pages_v2, base, out)
    own = [l for l in runner.log if not l.startswith("snapshot:")]
    assert own and all(l.startswith("skip") for l in own)


def test_update_with_ontology_entailed_stage(base_run):
    root, pages_v1, base, pages_v2 = base_run
    from graphforge_ray.stages.rdfs import RDFS_SUBPROP

    out = str(root / "kg_v2_onto")
    # linksTo ⊑ relatedTo over the forged vocab
    onto = rd.from_pandas(
        pd.DataFrame(
            [
                (
                    "http://graft.example/vocab#linksTo",
                    RDFS_SUBPROP,
                    "http://graft.example/vocab#relatedTo",
                )
            ],
            columns=["subj", "pred", "obj"],
        )
    )
    run_update_pipeline(
        pages_v2, base, out, ontology=onto, ontology_fingerprint="v1"
    )
    closed = rd.read_parquet(_pq(os.path.join(out, "entailed"))).to_pandas()
    new = rd.read_parquet(
        _pq(os.path.join(out, "snapshot", "canonical"))
    ).to_pandas()
    links = new[new["pred"] == "http://graft.example/vocab#linksTo"]
    assert len(links) > 0
    rel = closed[
        closed["pred"] == "http://graft.example/vocab#relatedTo"
    ]
    got = set(map(tuple, rel[["subj", "obj"]].to_numpy()))
    want = set(map(tuple, links[["subj", "obj"]].to_numpy()))
    assert want <= got


def test_update_identical_snapshot_publishes_empty(base_run):
    root, pages_v1, base, pages_v2 = base_run
    out = str(root / "kg_v1_again")
    # same pages as the base run → delta is EMPTY; the no-change day
    # must publish empty add/del sets, not crash on read_parquet([])
    runner = run_update_pipeline(pages_v1, base, out)
    m = json.load(open(os.path.join(out, "delta", "MANIFEST.json")))
    assert m["extra"] == {"adds": 0, "dels": 0}
    p = json.load(open(os.path.join(out, "publish", "MANIFEST.json")))
    assert p["status"] == "done"
    assert p["extra"]["adds"] == 0 and p["extra"]["dels"] == 0
