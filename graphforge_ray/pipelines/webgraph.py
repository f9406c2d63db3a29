"""Web-graph pipeline: pages parquet → link edges → host graph →
domain PageRank + anchor-text top-k, every stage checkpointed.

The crawl-analytics sibling of the forge pipeline: where forge turns
pages into the CONTENT graph (triples), this turns the same pages into
the WEB graph — (src_domain, dst_domain, n_links) edges, weighted
domain authority, and the per-domain anchor-term profile (what the rest
of the web calls each site). All four stages are StageRunner stages
(skip-if-done, atomic publish), so a failed run resumes where it
stopped and re-running is a no-op.

Stage outputs under ``<out_dir>/``:

- ``links/``        — (src_url, href, anchor_text) rows from the forge
  anchor walk (extract/html_text.py, byte-identical contract);
- ``host_graph/``   — (src_domain, dst_domain, n_links);
- ``host_ranks/``   — (domain, rank): PageRank over the host graph,
  weighted by n_links (stages/graph.pagerank weight_col path);
- ``anchor_terms/`` — (dst_domain, term, n): top-k anchor terms per
  destination domain (stages/weblinks.anchor_term_topk).
"""

from __future__ import annotations

import os

import pandas as pd

import ray

from ..state.manifest import StageRunner

__all__ = ["run_webgraph_pipeline"]


def _parquet_files(d: str) -> list:
    return sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    )


def run_webgraph_pipeline(
    input_paths: list,
    out_dir: str,
    pagerank_iters: int = 3,
    anchor_topk: int = 5,
    num_buckets: int = 32,
) -> StageRunner:
    """pages parquet (url, html) → the four web-graph stages. Returns
    the StageRunner (per-stage manifests carry row counts)."""
    from ..stages.graph import pagerank
    from ..stages.weblinks import (
        anchor_term_topk,
        host_link_graph,
        page_link_edges,
    )

    runner = StageRunner(out_dir)

    def build_links(tmp_dir):
        pages = ray.data.read_parquet(input_paths)
        edges = page_link_edges(pages)
        edges.write_parquet(tmp_dir)
        return -1, {}

    runner.run("links", list(input_paths), build_links)
    links_files = _parquet_files(runner.stage_dir("links"))

    def build_host_graph(tmp_dir):
        # schema-only debris (a links run over an all-poison corpus)
        # still publishes a valid empty stage
        edges = ray.data.read_parquet(links_files)
        hg = host_link_graph(edges, num_buckets=num_buckets)
        hg.write_parquet(tmp_dir)
        return -1, {}

    runner.run("host_graph", links_files, build_host_graph)
    hg_files = _parquet_files(runner.stage_dir("host_graph"))

    def build_ranks(tmp_dir):
        hg = ray.data.read_parquet(hg_files)
        pe = hg.map_batches(
            lambda df: pd.DataFrame({
                "s": df["src_domain"], "o": df["dst_domain"],
                "w": df["n_links"].astype("float64")}),
            batch_format="pandas")
        ranks = pagerank(pe, num_iters=pagerank_iters, weight_col="w")
        ranks.map_batches(
            lambda df: pd.DataFrame({"domain": df["node"],
                                     "rank": df["rank"]}),
            batch_format="pandas",
        ).write_parquet(tmp_dir)
        return -1, {}

    runner.run("host_ranks", hg_files, build_ranks,
               params={"pagerank_iters": pagerank_iters})

    def build_anchor_terms(tmp_dir):
        edges = ray.data.read_parquet(links_files)
        terms = anchor_term_topk(edges, k=anchor_topk,
                                 num_buckets=num_buckets)
        terms.write_parquet(tmp_dir)
        return -1, {}

    runner.run("anchor_terms", links_files, build_anchor_terms,
               params={"anchor_topk": anchor_topk})
    return runner
