"""Cluster job entrypoint for parquet small-file compaction.

    ray job submit --working-dir . -- \
        python jobs/compact_job.py --input /data/kg/canonical \
            --out /data/kg_compacted --target-rows 500000

or locally:

    python jobs/compact_job.py --input /tmp/out/canonical \
        --out /tmp/compacted --num-cpus 8

Atomic + checkpoint-resumable like every stage (re-running with the
same inputs and target is a no-op; changing --target-rows re-runs).
One JSON metrics line on stdout; exit 0 iff the stage manifest is done.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="directory tree containing *.parquet to compact")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--target-rows", type=int, default=500_000,
                    help="target rows per output file")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        address = os.environ.get("RAY_ADDRESS", "local")
        if address == "local" and args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=address, **kwargs)

    from graphforge_ray.pipelines.compact import compact_parquet
    from graphforge_ray.state.manifest import StageManifest

    runner = compact_parquet(
        args.input, args.out, target_rows_per_file=args.target_rows
    )
    m = StageManifest.read(runner.stage_dir("compact"))
    ok = m is not None and m.status == "done"
    print(json.dumps({
        "job": "compact", "ok": ok, "log": runner.log,
        "rows": m.rows_out if m else None,
        **({k: v for k, v in (m.extra or {}).items()} if m else {}),
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
