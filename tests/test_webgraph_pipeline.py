"""E2E web-graph pipeline: pages → links → host graph → weighted
PageRank + anchor terms, checkpointed; resume probe."""

import glob

import pandas as pd
import pytest

from graphforge_ray.fixtures import write_pages_parquet
from graphforge_ray.pipelines.webgraph import run_webgraph_pipeline


@pytest.fixture(scope="module")
def webgraph_out(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("wg")
    paths = write_pages_parquet(str(root / "pages"), 48, rows_per_file=16)
    runner = run_webgraph_pipeline(paths, str(root / "out"),
                                   pagerank_iters=2, anchor_topk=3)
    return paths, str(root / "out"), runner


def _read(out_dir, stage):
    files = glob.glob(f"{out_dir}/{stage}/*.parquet")
    assert files, stage
    return pd.concat([pd.read_parquet(f) for f in files],
                     ignore_index=True)


def test_stages_publish_and_chain(webgraph_out):
    _, out_dir, runner = webgraph_out
    links = _read(out_dir, "links")
    assert set(links.columns) == {"src_url", "href", "anchor_text"}
    assert len(links) > 0

    hg = _read(out_dir, "host_graph")
    assert set(hg.columns) == {"src_domain", "dst_domain", "n_links"}
    assert (hg["n_links"] >= 1).all()

    ranks = _read(out_dir, "host_ranks")
    assert set(ranks.columns) == {"domain", "rank"}
    # ranks cover every domain incident to the host graph
    doms = set(hg["src_domain"]) | set(hg["dst_domain"])
    assert set(ranks["domain"]) == doms
    assert abs(ranks["rank"].sum() - 1.0) < 0.2  # PR mass ≈ 1

    terms = _read(out_dir, "anchor_terms")
    assert set(terms.columns) == {"dst_domain", "term", "n"}
    assert terms.groupby("dst_domain").size().max() <= 3


def test_resume_is_noop(webgraph_out):
    paths, out_dir, _ = webgraph_out
    r2 = run_webgraph_pipeline(paths, out_dir,
                               pagerank_iters=2, anchor_topk=3)
    assert all(line.startswith("skip") for line in r2.log), r2.log


def test_param_change_invalidates_only_its_stage(webgraph_out):
    paths, out_dir, _ = webgraph_out
    r3 = run_webgraph_pipeline(paths, out_dir,
                               pagerank_iters=1, anchor_topk=3)
    ran = [l for l in r3.log if l.startswith("ran")]
    assert len(ran) == 1 and "host_ranks" in ran[0], r3.log
