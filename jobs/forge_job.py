"""Cluster job entrypoint for the forge pipeline.

Submit to a running Ray cluster (this is the production form the north
rule's ``ray job submit`` clause refers to; the sandbox runs it locally):

    ray job submit --working-dir . -- \
        python jobs/forge_job.py --input /data/pages --out /data/kg

or locally:

    python jobs/forge_job.py --input /tmp/pages --out /tmp/kg --num-cpus 8

The job is checkpoint-resumable: re-submitting with the same --out skips
completed stages/shards via their lineage manifests (state/manifest.py),
so a preempted job continues where it stopped. Exit code 0 iff every
stage manifest reports done; per-stage metrics print as one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

# the repo root is the import root whether launched as
# `python jobs/forge_job.py` or via `ray job submit --working-dir .`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="pages parquet file/dir/glob (url, html columns)")
    ap.add_argument("--out", required=True, help="pipeline output root")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU cap (ignored on a real cluster)")
    ap.add_argument("--no-ntriples", action="store_true",
                    help="skip the N-Triples sink stage")
    args = ap.parse_args()

    import ray

    # On a cluster, `ray job submit` provides the session (RAY_ADDRESS);
    # standalone runs init locally. Never re-init inside the library.
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        address = os.environ.get("RAY_ADDRESS", "local")
        # num_cpus is only legal when WE start the local session;
        # ray.init(address=<cluster>, num_cpus=N) raises ValueError
        if args.num_cpus and address == "local":
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=address, **kwargs)

    import graphforge_ray

    graphforge_ray.tune_data_context()
    from graphforge_ray.pipelines.forge import run_forge_pipeline

    if os.path.isdir(args.input):
        paths = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    else:
        paths = sorted(glob.glob(args.input)) or [args.input]
    if not paths:
        print(f"no input parquet under {args.input!r}", file=sys.stderr)
        return 2

    runner = run_forge_pipeline(
        paths, args.out, write_nt=not args.no_ntriples
    )

    stages = {}
    ok = True
    for mpath in sorted(
        glob.glob(os.path.join(args.out, "**", "MANIFEST.json"),
                  recursive=True)
    ):
        m = json.load(open(mpath))
        stages[m["stage"]] = m.get("status")
        ok &= m.get("status") == "done"
    print(json.dumps({
        "job": "forge",
        "input_shards": len(paths),
        "stages_done": sum(1 for s in stages.values() if s == "done"),
        "stages_total": len(stages),
        "log": runner.log[-6:],
        "ok": ok,
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
