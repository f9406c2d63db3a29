"""Small-file compaction for parquet output directories.

A 100 TB pipeline's failure mode nobody designs for: thousands of tiny
parquet files per partition (every incremental run, every retried task
adds more), until metadata handling dominates read time. ``compact_parquet``
rewrites a directory to ~``target_rows_per_file`` files in one streaming
execution, atomically (same StageRunner tmp-dir + rename + manifest as
every other stage — a killed compaction leaves the input untouched, a
re-run with the same inputs is a no-op).

Row-preserving, order-agnostic: the output holds exactly the input's
row multiset (verified in tests), no columns are touched.
"""

from __future__ import annotations

import math
import os

import ray

from ..state.manifest import StageRunner

__all__ = ["compact_parquet"]


def compact_parquet(
    in_dir: str,
    out_dir: str,
    target_rows_per_file: int = 500_000,
    stage: str = "compact",
) -> StageRunner:
    """Compact every ``*.parquet`` under ``in_dir`` into
    ``<out_dir>/<stage>/`` with ~``target_rows_per_file`` rows per
    output file. Returns the runner (manifest carries files_in /
    files_out / rows)."""
    if target_rows_per_file < 1:
        raise ValueError(
            f"target_rows_per_file must be ≥ 1: {target_rows_per_file}"
        )
    files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(in_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"no parquet files under {in_dir}")
    runner = StageRunner(out_dir)

    def build(tmp_dir):
        ds = ray.data.read_parquet(files)
        n = ds.count()  # parquet metadata, no execution
        num_files = max(1, math.ceil(n / target_rows_per_file))
        # zero-row debris (schema-only files) compacts to an empty dir;
        # Ray rejects min_rows_per_file=0
        ds.repartition(num_files).write_parquet(
            tmp_dir,
            min_rows_per_file=max(1, min(n, target_rows_per_file)),
        )
        files_out = sum(
            1 for _, _, fs in os.walk(tmp_dir)
            for f in fs if f.endswith(".parquet")
        )
        return n, {"files_in": len(files), "files_out": files_out}

    runner.run(stage, files, build,
               params={"target_rows_per_file": target_rows_per_file})
    return runner
