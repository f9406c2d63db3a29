"""Parquet small-file compaction (pipelines/compact)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

import ray.data as rd

from graphforge_ray.pipelines.compact import compact_parquet


def _pq(d):
    return sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    )


def test_compact_preserves_rows_and_shrinks_files(ray_session, tmp_path):
    src = str(tmp_path / "many")
    os.makedirs(src)
    # 20 tiny files, 50 rows each
    for i in range(20):
        pd.DataFrame(
            {"k": range(i * 50, (i + 1) * 50), "v": [f"r{i}"] * 50}
        ).to_parquet(os.path.join(src, f"part-{i:03d}.parquet"))
    out = str(tmp_path / "compacted")
    runner = compact_parquet(src, out, target_rows_per_file=400)

    m = json.load(open(os.path.join(out, "compact", "MANIFEST.json")))
    assert m["rows_out"] == 1000
    assert m["extra"]["files_in"] == 20
    assert m["extra"]["files_out"] <= 4  # ceil(1000/400) = 3 (+slack)

    before = rd.read_parquet(_pq(src)).to_pandas()
    after = rd.read_parquet(_pq(os.path.join(out, "compact"))).to_pandas()
    assert sorted(map(tuple, before.to_numpy())) == sorted(
        map(tuple, after.to_numpy())
    )

    # checkpoint: re-run is a no-op
    r2 = compact_parquet(src, out, target_rows_per_file=400)
    assert any(l.startswith("skip") for l in r2.log)
    # parameter change invalidates
    r3 = compact_parquet(src, out, target_rows_per_file=100)
    assert any(l.startswith("ran") for l in r3.log)


def test_compact_empty_dir_raises(ray_session, tmp_path):
    with pytest.raises(ValueError, match="no parquet"):
        compact_parquet(str(tmp_path), str(tmp_path / "o"))
