"""Embedding pipeline E2E: checkpoints, resume, epoch parity, eval."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphforge_ray.pipelines.embed import run_embed_pipeline
from graphforge_ray.state.manifest import StageManifest

TRIPS = pd.DataFrame(
    {
        "subj": [f"e{i}" for i in range(24)],
        "pred": ["likes" if i % 2 else "knows" for i in range(24)],
        "obj": [f"e{(i * 7 + 3) % 24}" for i in range(24)],
    }
)


@pytest.fixture()
def trip_parquet(tmp_path):
    path = str(tmp_path / "triples.parquet")
    TRIPS.to_parquet(path, index=False)
    return path


def test_embed_pipeline_end_to_end(ray_session, tmp_path, trip_parquet):
    out = str(tmp_path / "embed")
    runner = run_embed_pipeline(
        trip_parquet, out, dim=6, epochs=2, lr=0.05, test_mod=3)
    for st in ("entities", "init", "epoch-0001", "epoch-0002", "eval"):
        m = StageManifest.read(os.path.join(out, st))
        assert m is not None and m.status == "done", st

    # embeddings are unit-norm lists, readable without the module
    ent = pd.read_parquet(os.path.join(out, "epoch-0002", "ent"))
    V = np.asarray(ent["embedding"].tolist(), np.float64)
    assert V.shape[1] == 6
    assert np.allclose(np.linalg.norm(V, axis=1), 1.0)

    ev = StageManifest.read(os.path.join(out, "eval"))
    assert 0.0 < ev.extra["mrr"] <= 1.0
    assert ev.rows_out > 0

    # resume: same args → every stage skips
    r2 = run_embed_pipeline(
        trip_parquet, out, dim=6, epochs=2, lr=0.05, test_mod=3)
    assert all(l.startswith("skip") for l in r2.log), r2.log

    # changed hyper-parameter invalidates training but not entities
    r3 = run_embed_pipeline(
        trip_parquet, out, dim=6, epochs=2, lr=0.02, test_mod=3)
    assert r3.log[0].startswith("skip entities")
    assert any(l.startswith("ran epoch-0001") for l in r3.log)


def test_embed_epoch_matches_direct_call(ray_session, tmp_path,
                                         trip_parquet):
    from graphforge_ray.stages.transe import (
        distinct_entities, init_embeddings, transe_epoch)

    out = str(tmp_path / "embed1")
    run_embed_pipeline(trip_parquet, out, dim=6, epochs=1, lr=0.05,
                       salt="graft-embed")
    got = pd.read_parquet(os.path.join(out, "epoch-0001", "ent"))
    gmap = {k: np.asarray(v, np.float64)
            for k, v in zip(got["ent"], got["embedding"])}

    trips = rd.from_pandas(TRIPS)
    e0 = init_embeddings(distinct_entities(trips), 6,
                         salt="graft-embed-e")
    r0 = init_embeddings(
        rd.from_pandas(pd.DataFrame({"pred": ["knows", "likes"]})),
        6, name_col="pred", salt="graft-embed-r", normalize=False,
    ).to_pandas()
    e1, _ = transe_epoch(trips, e0, r0, lr=0.05, margin=1.0)
    want = e1.to_pandas()
    wmap = {k: np.asarray(v, np.float64)
            for k, v in zip(want["ent"], want["embedding"])}
    assert set(gmap) == set(wmap)
    for k in wmap:
        assert np.allclose(gmap[k], wmap[k], atol=1e-12), k


def test_embed_bad_params(ray_session, tmp_path, trip_parquet):
    with pytest.raises(ValueError, match="epochs"):
        run_embed_pipeline(trip_parquet, str(tmp_path / "x"), epochs=0)
    with pytest.raises(ValueError, match="no input parquet"):
        run_embed_pipeline(str(tmp_path / "nope_dir"),
                           str(tmp_path / "y"))


def test_embed_warm_start(ray_session, tmp_path, trip_parquet):
    out1 = str(tmp_path / "run1")
    run_embed_pipeline(trip_parquet, out1, dim=6, epochs=1, lr=0.05)

    # day 2: same triples + a few new entities
    t2 = pd.concat([
        TRIPS,
        pd.DataFrame({"subj": ["nx1", "nx2"], "pred": ["likes"] * 2,
                      "obj": ["e0", "nx1"]}),
    ], ignore_index=True)
    p2 = str(tmp_path / "t2.parquet")
    t2.to_parquet(p2, index=False)
    out2 = str(tmp_path / "run2")
    runner = run_embed_pipeline(
        p2, out2, dim=6, epochs=1, lr=0.05,
        warm_start=os.path.join(out1, "epoch-0001"))
    assert any(l.startswith("ran init") for l in runner.log)

    prev = pd.read_parquet(os.path.join(out1, "epoch-0001", "ent"))
    init2 = pd.read_parquet(os.path.join(out2, "init", "ent"))
    pmap = {k: np.asarray(v) for k, v in
            zip(prev["ent"], prev["embedding"])}
    imap = {k: np.asarray(v) for k, v in
            zip(init2["ent"], init2["embedding"])}
    # old entities start from yesterday's trained vectors
    for k in pmap:
        assert np.allclose(imap[k], pmap[k]), k
    assert "nx1" in imap and "nx2" in imap
    with pytest.raises(ValueError, match="warm_start"):
        run_embed_pipeline(p2, str(tmp_path / "x"), dim=6, epochs=1,
                           warm_start=str(tmp_path / "nope"))


def test_embed_consumes_forge_output(ray_session, tmp_path):
    """E2E KG → embeddings: run_embed_pipeline reads the forge
    pipeline's canonical/ parquet directly (pruned to subj/pred/obj —
    the extras columns ride along untouched)."""
    from graphforge_ray.fixtures import write_pages_parquet
    from graphforge_ray.pipelines.forge import run_forge_pipeline

    pages = write_pages_parquet(str(tmp_path / "pages"), 64,
                                rows_per_file=32)
    fout = str(tmp_path / "kg")
    run_forge_pipeline(pages, fout)
    runner = run_embed_pipeline(
        os.path.join(fout, "canonical"), str(tmp_path / "emb"),
        dim=6, epochs=1, test_mod=10)
    assert all(" " not in l or l.split()[0] in ("ran", "skip")
               for l in runner.log)
    ent = pd.read_parquet(
        os.path.join(str(tmp_path / "emb"), "epoch-0001", "ent"))
    assert len(ent) > 50  # forged KG entities got vectors
    V = np.asarray(ent["embedding"].tolist())
    assert np.allclose(np.linalg.norm(V, axis=1), 1.0)
