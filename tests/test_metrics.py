"""Bucket-drop observability: capped stages must count what they drop
(no-silent-caps rule), and StageRunner manifests must carry the deltas."""

import pandas as pd
import pytest

from graphforge_ray import metrics
from graphforge_ray.stages.dedup import (
    minhash_lsh_candidates,
    simhash_neardup_candidates,
)


@pytest.fixture()
def degenerate_docs(ray_session):
    """201 identical docs — every LSH band bucket exceeds the 200-id
    degenerate cap, forcing the drop path."""
    import ray.data as rd

    n = 201
    return rd.from_pandas(
        pd.DataFrame(
            {"doc_id": range(n), "text": ["same text for everyone here"] * n}
        )
    )


def test_minhash_drop_counted(degenerate_docs):
    before = metrics.snapshot()
    out = minhash_lsh_candidates(degenerate_docs)
    assert len(out) == 0  # capped — and the cap is visible:
    d = metrics.delta(before, metrics.snapshot())
    assert d.get("minhash_lsh.dropped_buckets", 0) > 0
    assert d.get("minhash_lsh.dropped_ids", 0) >= 201


def test_simhash_drop_counted(degenerate_docs):
    before = metrics.snapshot()
    out = simhash_neardup_candidates(degenerate_docs).to_pandas()
    assert len(out) == 0
    d = metrics.delta(before, metrics.snapshot())
    assert d.get("simhash_candidates.dropped_buckets", 0) > 0
    assert d.get("simhash_candidates.dropped_ids", 0) >= 201


def test_stage_manifest_records_counters(degenerate_docs, tmp_path):
    from graphforge_ray.state.manifest import StageManifest, StageRunner

    runner = StageRunner(str(tmp_path))

    def build(tmp_dir):
        n = len(minhash_lsh_candidates(degenerate_docs))
        return n, {}

    runner.run("cand", [], build)
    m = StageManifest.read(str(tmp_path / "cand"))
    assert m is not None and m.status == "done"
    assert m.extra["counters"]["minhash_lsh.dropped_buckets"] > 0


def test_clean_corpus_has_no_drops(ray_session):
    import ray.data as rd

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": range(8),
                "text": [f"unique document number {i} body text" for i in range(8)],
            }
        )
    )
    before = metrics.snapshot()
    minhash_lsh_candidates(docs)
    d = metrics.delta(before, metrics.snapshot())
    assert d.get("minhash_lsh.dropped_buckets", 0) == 0
