"""End-to-end forge pipeline tests: dedup set-semantics, canonicalization,
checkpoint/resume, text byte-identity, lineage manifests."""

import json
import os

import pyarrow.parquet as pq
import pytest

from graphforge_ray.fixtures import ENTITY_BASE, gen_pages_table, write_pages_parquet
from graphforge_ray.pipelines.forge import forge_triples, run_forge_pipeline
from graphforge_ray.stages.canonicalize import dedup_triples
from graphforge_ray.stages.linker import PRED_MENTIONS


@pytest.fixture(scope="module")
def pages64(ray_session):
    import ray.data as rd

    return rd.from_arrow(gen_pages_table(64))


def test_forge_dedup_set_semantics(ray_session, pages64):
    """Duplicate injection → set invariance (N3.Store set-insert semantics,
    reference document.js:710)."""
    import ray.data as rd

    tri_once = forge_triples(pages64, canonicalize=False).to_pandas()
    doubled = rd.from_arrow(gen_pages_table(64)).union(
        rd.from_arrow(gen_pages_table(64))
    )
    tri_twice = forge_triples(doubled, canonicalize=False).to_pandas()
    key = ["subj", "pred", "obj", "obj_is_iri", "obj_lang", "obj_datatype", "graph"]
    set_once = set(map(tuple, tri_once[key].astype(str).to_numpy()))
    set_twice = set(map(tuple, tri_twice[key].astype(str).to_numpy()))
    assert set_once == set_twice
    assert len(tri_once) == len(set_once)  # already exact-deduped


def test_forge_canonicalizes_link_variants(ray_session, pages64):
    """https://…/Name/ anchor variants must merge into the canonical
    http://…/Name entity IRI (salted surface-form canonicalization)."""
    pdf = forge_triples(pages64).to_pandas()
    objs = set(pdf[pdf["obj_is_iri"]]["obj"])
    assert not any(o.startswith("https://graft.example/ont/") for o in objs)
    mention_objs = set(pdf[pdf["pred"] == PRED_MENTIONS]["obj"])
    assert any(o.startswith(ENTITY_BASE) for o in mention_objs)


def test_checkpoint_pipeline_and_resume(ray_session, tmp_path):
    input_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    paths = write_pages_parquet(input_dir, 48, rows_per_file=16)

    runner = run_forge_pipeline(paths, out_dir, write_nt=True)
    assert all(line.startswith("ran ") for line in runner.log)

    # per-shard extract manifests (per-partition lineage) + stage manifests
    shard_stages = [f"extract/shard-{i:05d}" for i in range(len(paths))]
    for stage in shard_stages + ["linked", "text", "canonical", "adjacency",
                                 "ntriples"]:
        mpath = os.path.join(out_dir, stage, "MANIFEST.json")
        assert os.path.exists(mpath), stage
        m = json.load(open(mpath))
        assert m["status"] == "done" and m["input_fingerprint"]
        assert m["output_files"]

    # resume: second run skips every stage and every shard
    runner2 = run_forge_pipeline(paths, out_dir, write_nt=True)
    assert all(line.startswith("skip ") for line in runner2.log), runner2.log


    # outputs readable + consistent
    canon = pq.read_table(
        [os.path.join(out_dir, "canonical", f)
         for f in os.listdir(os.path.join(out_dir, "canonical"))
         if f.endswith(".parquet")]
    )
    assert canon.num_rows > 0
    nt_files = sorted(
        f for f in os.listdir(os.path.join(out_dir, "ntriples"))
        if f.endswith(".nt")
    )
    n_lines = sum(
        1
        for f in nt_files
        for _ in open(os.path.join(out_dir, "ntriples", f))
    )
    assert n_lines == canon.num_rows

    # adjacency is hive-partitioned by subject hash
    adj = os.path.join(out_dir, "adjacency")
    assert any(d.startswith("part=") for d in os.listdir(adj))

    # crash-recovery: losing a mid-pipeline checkpoint re-runs only that
    # stage and its dependents; upstream stages stay skipped
    os.remove(os.path.join(out_dir, "canonical", "MANIFEST.json"))
    runner_crash = run_forge_pipeline(paths, out_dir, write_nt=True)
    ran = {l.split()[1].rstrip(":") for l in runner_crash.log
           if l.startswith("ran ")}
    assert "canonical" in ran
    assert not any(s.startswith("extract") or s == "linked" for s in ran)

    # incremental input: one new shard runs; finished shards skip
    from graphforge_ray.fixtures import write_pages_parquet as wpp

    more = wpp(input_dir, 64, rows_per_file=16)  # adds one new file
    runner3 = run_forge_pipeline(more, out_dir, write_nt=False)
    shard_lines = [l for l in runner3.log if "extract/shard" in l]
    assert sum(1 for l in shard_lines if l.startswith("ran ")) == 1
    assert sum(1 for l in shard_lines if l.startswith("skip ")) == len(paths)
    # downstream stages re-ran (their inputs changed)
    assert any(l.startswith("ran linked") for l in runner3.log)



def test_extracted_text_byte_identical(ray_session, tmp_path):
    """North-rule invariant: extracted text is byte-identical per url
    across independent runs."""
    import ray.data as rd

    from graphforge_ray.stages.extract import extract_pages_batch

    def text_map(n_blocks):
        ds = rd.from_arrow(gen_pages_table(40)).repartition(n_blocks)
        out = ds.map_batches(
            extract_pages_batch, batch_format="pyarrow", batch_size=7
        ).to_pandas()
        rows = out[out["pred"] == ""]
        return dict(zip(rows["src_url"], rows["text"]))

    a, b = text_map(2), text_map(5)  # different partitioning/batching
    assert a == b
    assert all(isinstance(v, str) and v for v in a.values())


def test_dedup_triples_keeps_best_score(ray_session):
    import pandas as pd
    import ray.data as rd

    df = pd.DataFrame(
        {
            "subj": ["s", "s"], "pred": ["p", "p"], "obj": ["o", "o"],
            "obj_is_iri": [True, True], "obj_lang": ["", ""],
            "obj_datatype": ["", ""], "graph": ["", ""],
            "src_url": ["u2", "u1"], "score": [0.5, 0.9],
        }
    )
    out = dedup_triples(rd.from_pandas(df)).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["score"] == 0.9
    assert out.iloc[0]["src_url"] == "u1"  # deterministic lineage rep
