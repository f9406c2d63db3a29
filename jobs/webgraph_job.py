"""Cluster job entrypoint for the web-graph pipeline.

    ray job submit --working-dir . -- \
        python jobs/webgraph_job.py --input /data/pages --out /data/webgraph

or locally:

    python jobs/webgraph_job.py --input /tmp/pages --out /tmp/webgraph \
        --num-cpus 8

pages parquet (url, html) → links/ host_graph/ host_ranks/
anchor_terms/ — every stage checkpoint-resumable and atomically
published (re-running with the same inputs is a no-op). One JSON
metrics line on stdout; exit 0 iff every stage manifest is done.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_STAGES = ["links", "host_graph", "host_ranks", "anchor_terms"]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="directory of pages parquet (url, html)")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--pagerank-iters", type=int, default=3)
    ap.add_argument("--anchor-topk", type=int, default=5)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        address = os.environ.get("RAY_ADDRESS", "local")
        if address == "local" and args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=address, **kwargs)

    from graphforge_ray.pipelines.webgraph import run_webgraph_pipeline
    from graphforge_ray.state.manifest import StageManifest

    files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(args.input)
        for f in fs
        if f.endswith(".parquet")
    )
    if not files:
        print(json.dumps({"job": "webgraph", "ok": False,
                          "error": f"no parquet under {args.input}"}))
        return 1

    runner = run_webgraph_pipeline(
        files, args.out,
        pagerank_iters=args.pagerank_iters,
        anchor_topk=args.anchor_topk,
    )
    manifests = {
        st: StageManifest.read(runner.stage_dir(st)) for st in _STAGES
    }
    ok = all(m is not None and m.status == "done"
             for m in manifests.values())
    print(json.dumps({"job": "webgraph", "ok": ok, "log": runner.log}))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
