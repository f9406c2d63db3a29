"""End-to-end curation pipeline: signals → filter/dedup → shards →
packed corpus, with checkpoint resume."""

import glob
import json

import duckdb
import pandas as pd
import pytest

from graphforge_ray.pipelines.curate import run_curation_pipeline

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curated(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated"))
    runner = run_curation_pipeline(
        f"{SF_DIR}/documents.parquet", out,
        per_source_cap=30, num_shards=4, pack_capacity=200,
    )
    return out, runner


def test_pipeline_stages_complete_and_resume(curated, ray_session):
    out, runner = curated
    assert all(l.startswith("ran ") for l in runner.log)
    for st in ("signals", "kept", "shards", "corpus"):
        m = json.load(open(f"{out}/{st}/MANIFEST.json"))
        assert m["status"] == "done", st
    r2 = run_curation_pipeline(
        f"{SF_DIR}/documents.parquet", out,
        per_source_cap=30, num_shards=4, pack_capacity=200,
    )
    assert all(l.startswith("skip") for l in r2.log), r2.log


def test_stage_runner_params_invalidate_checkpoint(tmp_path):
    # the checkpoint fingerprint mixes in the stage's behavioral params:
    # same inputs + changed threshold must RE-RUN, not silently skip
    from graphforge_ray.state.manifest import StageRunner

    inp = tmp_path / "in.txt"
    inp.write_text("data")
    runner = StageRunner(str(tmp_path / "out"))
    calls = []

    def build(tmp_dir):
        calls.append(1)
        return 1, {}

    runner.run("s", [str(inp)], build, params={"threshold": 0.5})
    runner.run("s", [str(inp)], build, params={"threshold": 0.5})
    assert len(calls) == 1  # identical params → checkpoint hit
    runner.run("s", [str(inp)], build, params={"threshold": 0.9})
    assert len(calls) == 2  # changed param → stage re-ran


def test_kept_respects_filters_and_dedup(curated):
    out, _ = curated
    con = duckdb.connect()
    sig = con.sql(
        f"SELECT * FROM read_parquet('{out}/signals/*.parquet')"
    ).df()
    kept = con.sql(
        f"SELECT * FROM read_parquet('{out}/kept/*.parquet')"
    ).df()
    assert len(sig) == 500
    s = sig.set_index("doc_id")
    for d in kept["doc_id"]:
        assert s.loc[d, "quality_score"] >= 0.35
        assert s.loc[d, "dup_word_frac"] <= 0.8
        assert s.loc[d, "contaminated"] == 0
    # per-source quota respected
    assert kept.groupby("source").size().max() <= 30
    # exact-dup victims are gone: recompute duplicates from the corpus
    docs = con.sql(
        f"SELECT doc_id, md5(text) h FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).df()
    h_kept = docs[docs["doc_id"].isin(kept["doc_id"])]
    assert not h_kept["h"].duplicated().any()


def test_corpus_shards_and_packing(curated):
    out, _ = curated
    con = duckdb.connect()
    corpus = con.sql(
        f"SELECT * FROM read_parquet('{out}/corpus/shard=*/*.parquet', "
        f"hive_partitioning=1)"
    ).df()
    kept = con.sql(
        f"SELECT doc_id FROM read_parquet('{out}/kept/*.parquet')"
    ).df()
    assert set(corpus["doc_id"]) == set(kept["doc_id"])
    assert len(glob.glob(f"{out}/corpus/shard=*")) == 4
    sig = con.sql(
        f"SELECT doc_id, n_words FROM "
        f"read_parquet('{out}/signals/*.parquet')"
    ).df().set_index("doc_id")["n_words"]
    plan = con.sql(
        f"SELECT * FROM read_parquet('{out}/shards/*.parquet')"
    ).df()
    # packing invariants per (shard, seq): offsets cumulative, capacity
    for (_, _), seq in plan.sort_values("offset").groupby(
        ["shard", "seq_id"]
    ):
        sizes = seq["doc_id"].map(sig).to_numpy()
        offs = seq["offset"].to_numpy()
        assert offs[0] == 0
        assert (offs[1:] == sizes.cumsum()[:-1]).all()
        if len(seq) > 1:
            assert sizes.sum() <= 200
    # text rides along into the packed corpus
    assert corpus["text"].str.len().gt(0).all()


def test_param_change_reruns_downstream_stages(curated, ray_session):
    # KEEP LAST: re-runs the pipeline into the shared out dir with a
    # changed per_source_cap — 'signals' (params unchanged) must skip,
    # 'kept' and everything downstream must re-run (r3 ADVICE:
    # parameter-blind checkpoints returned the stale corpus with exit 0)
    out, _ = curated
    r = run_curation_pipeline(
        f"{SF_DIR}/documents.parquet", out,
        per_source_cap=20, num_shards=4, pack_capacity=200,
    )
    steps = {l.split()[1].rstrip(":"): l.split()[0] for l in r.log}
    assert steps["signals"] == "skip"
    assert steps["kept"] == "ran"
    assert steps["shards"] == "ran"
    assert steps["corpus"] == "ran"
    # glob only the data files — the stage dir also holds MANIFEST.json
    kept = duckdb.sql(
        f"SELECT * FROM read_parquet('{out}/kept/*.parquet')"
    ).df()
    assert kept.groupby("source").size().max() <= 20
